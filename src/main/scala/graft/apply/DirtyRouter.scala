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
 * Scale notes: the tagged batch is persisted for the duration of the
 * routing pass, so the count aggregation, the quarantine write and the
 * clean side all read ONE materialization of the micro-batch (not three
 * re-evaluations of the source scan + transform chain) — the caller
 * releases it after the MERGE consumes the clean side. Quarantine writes
 * go to a batch-scoped partition directory with overwrite, which makes a
 * foreachBatch RETRY of the same batch replace (never duplicate) its
 * quarantine output.
 */
object DirtyRouter {

  /** errorLimit config, matching the reference's two-phase semantics
    * (`ErrorRecordChecker.java:18-82` + the final check at
    * `JobContainer.java:962-966`): `record` = max absolute dirty rows,
    * checked DURING the run per batch (-1 = unlimited); `percentage` =
    * max dirty fraction of the WHOLE JOB, checked at job END (NaN =
    * unchecked) — an early batch with transient dirt does not fail a
    * job whose overall ratio is fine. DataX defaults: both unset =
    * only counted. */
  final case class ErrorLimit(record: Long = -1L, percentage: Double = Double.NaN)

  final class ErrorLimitExceeded(msg: String) extends RuntimeException(msg)

  /** Validity rules for a change-event batch (the CDC analog of the
    * CSV column-spec conversion errors,
    * `UnstructuredStorageReaderUtil.java:343-470`): key/op/lsn present
    * and well-formed, token payload consistent with op and n_tok. */
  def invalidReason(): Column = {
    val badKey = col("doc_id").isNull || length(col("doc_id")) === 0
    // isNull first: `!isin` is NULL (not true) for a null op, and a
    // null op is exactly what the envelope codec emits for an unknown
    // wire op code — it must land in quarantine, not slip through
    val badOp = col("op").isNull || !col("op").isin("I", "U", "D")
    val badLsn = col("lsn").isNull || col("lsn") < 0
    val badPayload = (col("op") =!= "D") &&
      (col("tokens").isNull || col("n_tok").isNull || size(col("tokens")) =!= col("n_tok"))
    when(badKey, "null_or_empty_doc_id")
      .when(badOp, "unknown_op")
      .when(badLsn, "bad_lsn")
      .when(badPayload, "token_payload_mismatch")
      .otherwise(lit(null))
  }

  final case class Split(clean: DataFrame, dirty: DataFrame, cleanRows: Long, dirtyRows: Long,
      private val cached: Option[DataFrame] = None) {
    /** Release the persisted micro-batch once the MERGE has consumed the
      * clean side. */
    def release(): Unit = cached.foreach(_.unpersist(false))
  }

  /** Split a batch into clean/dirty by [[invalidReason]]; write the
    * dirty side (with `_reason`) under `quarantineDir/batch_id=<id>` if
    * set (overwrite — idempotent under batch retry); enforce `limit`.
    * The tagged batch is persisted so counts, quarantine rows and the
    * clean side come from one evaluation — call [[Split.release]] when
    * done with the clean side. */
  def route(batch: DataFrame, batchId: Long, quarantineDir: Option[String],
      limit: ErrorLimit = ErrorLimit()): Split = {
    val tagged = batch.withColumn("_reason", invalidReason())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val counts = tagged.groupBy(col("_reason").isNull.as("ok")).count()
        .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      val cleanRows = counts.getOrElse(true, 0L)
      val dirtyRows = counts.getOrElse(false, 0L)

      val dirty = tagged.filter(col("_reason").isNotNull)
      if (dirtyRows > 0) quarantineDir.foreach { dir =>
        // batch-scoped partition dir + overwrite: a retried batch
        // REPLACES its own quarantine output instead of appending a
        // duplicate copy; readers of `dir` see batch_id as a partition
        // column via standard parquet partition discovery
        dirty.write.mode("overwrite").parquet(s"$dir/batch_id=$batchId")
      }

      // in-run check: the absolute record limit only. The percentage is
      // a JOB-END check (reference JobContainer.java:962-966) enforced
      // by the caller over cumulative counts — see Replay.replay.
      if (limit.record >= 0 && dirtyRows > limit.record)
        throw new ErrorLimitExceeded(
          s"dirty records $dirtyRows > errorLimit.record ${limit.record} (batch $batchId)")

      Split(tagged.filter(col("_reason").isNull).drop("_reason"), dirty, cleanRows, dirtyRows,
        cached = Some(tagged))
    } catch {
      case e: Throwable => tagged.unpersist(false); throw e
    }
  }

  /** Job-END percentage check over the run's cumulative clean/dirty
    * counts — the analog of the reference's final
    * `errorLimit.checkPercentageLimit` (`JobContainer.java:962-966`).
    * Called by the replay once the stream has drained. */
  def checkFinal(cleanTotal: Long, dirtyTotal: Long, limit: ErrorLimit): Unit = {
    val total = cleanTotal + dirtyTotal
    if (!limit.percentage.isNaN && total > 0 &&
        dirtyTotal.toDouble / total > limit.percentage)
      throw new ErrorLimitExceeded(
        f"job dirty fraction ${dirtyTotal.toDouble / total}%.4f > errorLimit.percentage " +
          f"${limit.percentage}%.4f ($dirtyTotal of $total records)")
  }
}
