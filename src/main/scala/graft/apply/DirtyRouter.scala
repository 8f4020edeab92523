package graft.apply

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Dirty-record routing + error limits — the engine-level version of the
 * reference's dirty-data machinery: plugins call
 * `collectDirtyRecord(record, e)` and counters feed `errorLimit.record`
 * (absolute, checked during the run) / `errorLimit.percentage` (checked
 * at job end) (DataX `core/.../util/ErrorRecordChecker.java:18-82`,
 * collector contract `dataxPluginDev.md:426-440`).
 *
 * Spark-first shape: validity is a Column predicate evaluated inside the
 * scan (no row-at-a-time salvage); the batch splits into a clean side
 * that proceeds to the MERGE and a dirty side appended to a quarantine
 * parquet with a reason column. Counts come from the split aggregation
 * (they are exact, not sampled), and [[ErrorLimit]] turns them into the
 * reference's fail-the-job semantics.
 *
 * Scale notes: the split is one pass (filter + negated filter over the
 * same scan, both pushed into the batch plan); quarantine writes are
 * append-only per batch (tiny unless the pipeline is broken, in which
 * case failing fast is the point).
 */
object DirtyRouter {

  /** errorLimit config: `record` = max absolute dirty rows per batch
    * (-1 = unlimited), `percentage` = max dirty fraction per batch
    * (NaN = unchecked). DataX defaults: both unset = only counted. */
  final case class ErrorLimit(record: Long = -1L, percentage: Double = Double.NaN)

  final class ErrorLimitExceeded(msg: String) extends RuntimeException(msg)

  /** Validity rules for a change-event batch (the CDC analog of the
    * CSV column-spec conversion errors,
    * `UnstructuredStorageReaderUtil.java:343-470`): key/op/lsn present
    * and well-formed, token payload consistent with op and n_tok. */
  def invalidReason(): Column = {
    val badKey = col("doc_id").isNull || length(col("doc_id")) === 0
    val badOp = !col("op").isin("I", "U", "D")
    val badLsn = col("lsn").isNull || col("lsn") < 0
    val badPayload = (col("op") =!= "D") &&
      (col("tokens").isNull || col("n_tok").isNull || size(col("tokens")) =!= col("n_tok"))
    when(badKey, "null_or_empty_doc_id")
      .when(badOp, "unknown_op")
      .when(badLsn, "bad_lsn")
      .when(badPayload, "token_payload_mismatch")
      .otherwise(lit(null))
  }

  final case class Split(clean: DataFrame, dirty: DataFrame, cleanRows: Long, dirtyRows: Long)

  /** Split a batch into clean/dirty by [[invalidReason]]; append the
    * dirty side (with `_reason`, `_batch_id`) to `quarantineDir` if set;
    * enforce `limit`. One aggregation computes the exact counts. */
  def route(batch: DataFrame, batchId: Long, quarantineDir: Option[String],
      limit: ErrorLimit = ErrorLimit()): Split = {
    val tagged = batch.withColumn("_reason", invalidReason())
    val counts = tagged.groupBy(col("_reason").isNull.as("ok")).count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val cleanRows = counts.getOrElse(true, 0L)
    val dirtyRows = counts.getOrElse(false, 0L)

    val dirty = tagged.filter(col("_reason").isNotNull)
      .withColumn("_batch_id", lit(batchId))
    if (dirtyRows > 0) quarantineDir.foreach { dir =>
      dirty.write.mode("append").parquet(dir)
    }

    if (limit.record >= 0 && dirtyRows > limit.record)
      throw new ErrorLimitExceeded(
        s"dirty records $dirtyRows > errorLimit.record ${limit.record} (batch $batchId)")
    val total = cleanRows + dirtyRows
    if (!limit.percentage.isNaN && total > 0 &&
        dirtyRows.toDouble / total > limit.percentage)
      throw new ErrorLimitExceeded(
        f"dirty fraction ${dirtyRows.toDouble / total}%.4f > errorLimit.percentage ${limit.percentage}%.4f (batch $batchId)")

    Split(tagged.filter(col("_reason").isNull).drop("_reason"), dirty, cleanRows, dirtyRows)
  }
}
