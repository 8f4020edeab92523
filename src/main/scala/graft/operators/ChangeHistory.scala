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
 * pure array concat, no elementwise re-sort.
 *
 * MEASURED HONESTLY (bench `skew_hist_*` rungs, 4M events / 80%
 * single-key share, best-of-3): the salted MERGED form is ~equal to
 * the unsalted plan, not faster — it removes the single-reducer sort
 * but pays a second full shuffle of the collected chunks plus a final
 * single-task concat that still holds the hot key's whole array, so
 * the savings and the new costs cancel. The form that actually scales
 * is [[historyChunks]]: stop after phase 1 and emit the per-salt
 * chunks as ROWS. No stage ever holds the hot key's full version list
 * (the merged forms bound per-task memory by the hot key's total size;
 * chunked bounds it by size/saltBuckets), and a consumer reading
 * chunks in (key, chunk_idx) order sees exactly the merged history
 * (spec-asserted). Salt only known-hot feeds: at zero skew the salt
 * column just fragments every key's list for nothing.
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

  /** The scalable packaging of [[history]]: each key's version list as
    * `saltBuckets` contiguous, internally sorted CHUNKS — one row per
    * (key, chunk_idx) with `chunk` ascending by (seq, payload) and
    * chunk ranges ascending with chunk_idx, so concatenating a key's
    * chunks in chunk_idx order reproduces `history(...)` exactly.
    *
    * This is the 10^10-scale form: the whole plan is ONE exchange on
    * (key, chunk_idx) and per-task state is bounded by the hot key's
    * size / saltBuckets — there is no stage that materializes a
    * monster key's full list (the merged form's final concat is that
    * stage). The chunk id is integer-exact: floor((seq-lo)*S/span)
    * over one map-side-aggregated bounds pass, so the same rows always
    * land in the same chunk (re-run- and oracle-stable). */
  def historyChunks(df: DataFrame, key: Column, seq: Column, payload: Column,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets=$saltBuckets")
    val base = df.select(key.as("key"), seq.cast("long").as("_seq"), payload.as("_p"))
    val Array(lo, hi) = base.agg(min(col("_seq")), max(col("_seq"))).head() match {
      case r if r.isNullAt(0) => Array(0L, 0L)
      case r => Array(r.getLong(0), r.getLong(1))
    }
    val span = math.max(1L, hi - lo + 1)
    // floor over an exact product (both factors < 2^31 in any sane salt
    // count): IEEE-identical across engines, so a DuckDB oracle can
    // mirror it with integer `//`
    val chunk = floor((col("_seq") - lit(lo)) * lit(saltBuckets.toLong) / lit(span)).cast("int")
    base.groupBy(col("key"), chunk.as("chunk_idx"))
      .agg(sort_array(collect_list(struct(col("_seq").as("seq"), col("_p").as("p"))))
        .as("chunk"))
      .select(col("key"), col("chunk_idx"),
        size(col("chunk")).cast("long").as("n_in_chunk"), col("chunk"))
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
