package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Per-key ordered change history — the row-level audit surface of the
 * reference's multi-version mode, which renders EVERY stored version of
 * a row rather than just the latest (`otsstreamreader/.../core/
 * MultiVerModeRecordSender.java:11-133`; the reader's `maxVersions`
 * config asks OTS for all versions of each cell). Where
 * [[graft.apply.BatchApply.canonicalize]] keeps only the max-lsn winner
 * per key, this keeps the full lsn-ordered version list per key.
 *
 * Skew note (axis B) — this is the aggregate where salting genuinely
 * earns its keep. `collect_list` is non-algebraic: map-side partials
 * cannot shrink a hot key below its event count, so one reducer
 * receives every version of the hottest key (contrast canonicalize's
 * `max_by`, whose partials collapse a hot key to one row per map task
 * — measured salted == unsalted there at 0/30/80% single-key share).
 * With `saltBuckets > 1` the hot key's versions are RANGE-salted on
 * the sequence column: phase 1 builds per-salt lists (parallel across
 * `saltBuckets` reducers) and sorts each, phase 2 concatenates the
 * chunks in salt order — contiguous ranges mean the final merge is a
 * pure array concat, no elementwise re-sort. Measured at 4M events /
 * 80% single-key share: 3.3x faster than the unsalted plan; at zero
 * skew the extra shuffle costs ~2x, so salt only known-hot feeds.
 *
 * Scale: output rows = distinct keys; the history array of a key is
 * that key's full version count — callers bound it upstream (retention
 * / lsn-range filter) exactly as the reference bounds multi-version
 * reads with maxVersions + time range.
 */
object ChangeHistory {

  /** Collect each key's full ordered version history.
    *
    * @param df          change rows
    * @param key         grouping key (doc_id analog)
    * @param seq         total-order sequence column (lsn analog), numeric
    * @param payload     per-version payload (any struct-able column)
    * @param saltBuckets >1 enables two-phase range-salted collection
    * @return (key, n_changes, history: array<struct<seq, payload>>)
    *         with history ascending by (seq, payload)
    */
  def history(df: DataFrame, key: Column, seq: Column, payload: Column,
      saltBuckets: Int = 1): DataFrame = {
    val base = df.select(key.as("key"), seq.cast("long").as("_seq"), payload.as("_p"))
    val collected =
      if (saltBuckets <= 1)
        base.groupBy(col("key"))
          .agg(sort_array(collect_list(struct(col("_seq").as("seq"), col("_p").as("p"))))
            .as("history"))
      else {
        // range salt: one cheap map-side-aggregated pass for the seq
        // bounds, then salt = the seq's position in [lo, hi] scaled to
        // saltBuckets contiguous chunks
        val Array(lo, hi) = base.agg(min(col("_seq")), max(col("_seq"))).head() match {
          case r if r.isNullAt(0) => Array(0L, 0L)
          case r => Array(r.getLong(0), r.getLong(1))
        }
        val span = math.max(1L, hi - lo + 1)
        val salt = ((col("_seq") - lit(lo)) * lit(saltBuckets.toLong) / lit(span)).cast("int")
        base
          .groupBy(col("key"), salt.as("_salt"))
          .agg(sort_array(collect_list(struct(col("_seq").as("seq"), col("_p").as("p"))))
            .as("h"))
          .groupBy(col("key"))
          // per-salt chunks are disjoint contiguous seq ranges: sorting
          // the (salt, chunk) structs and flattening yields the globally
          // ordered history without re-sorting elements
          .agg(flatten(transform(sort_array(collect_list(struct(col("_salt"), col("h")))),
            x => x.getField("h"))).as("history"))
      }
    collected.select(col("key"), size(col("history")).as("n_changes"), col("history"))
  }

  /** History rendered as one CSV string per key ("seq:payload,...") —
    * the cross-engine-comparable form (array cells don't survive the
    * driver's pandas sort). */
  def historyCsv(df: DataFrame, key: Column, seq: Column, payload: Column,
      saltBuckets: Int = 1): DataFrame =
    history(df, key, seq, payload, saltBuckets)
      .select(col("key"), col("n_changes"),
        concat_ws(",", transform(col("history"),
          x => concat(x.getField("seq"), lit(":"), x.getField("p")))).as("history"))
}
