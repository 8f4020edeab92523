package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators the reference cannot express at all (SURVEY
 * §2.8: DataX has no joins) and stock Spark executes poorly: an as-of
 * join and a point-in-interval range join. Both are re-expressed as
 * single keyed shuffles / equi-joins so they survive 100 TB — the plans
 * Spark would otherwise pick (a per-probe sort or a
 * BroadcastNestedLoopJoin over an inequality predicate) are quadratic
 * or single-task.
 *
 * [[asofJoin]]: for every left row, the payload of the LATEST right row
 * of the same key with `right.ts <= left.ts` — the standard
 * market-data/feature-backfill join (DuckDB `ASOF JOIN`, kdb `aj`,
 * pandas `merge_asof`). Implemented as union → ONE hash shuffle on the
 * key → running `last(payload, ignoreNulls)` window ordered by
 * (ts, side): no row explosion, no per-probe scan, state is one payload
 * struct per partition-order position. Right rows sort BEFORE left rows
 * at equal ts, so an exactly-simultaneous right row is visible (the
 * `>=` convention, matching DuckDB).
 *
 * [[rangeJoinBinned]]: `point ∈ [start, end)` pairs via fixed-width bin
 * decomposition — intervals explode to the bins they cover, points map
 * to exactly ONE bin, the match becomes a bin equi-join + exact
 * predicate verify. Work ∝ points + Σ(interval length)/binWidth, never
 * |points| × |intervals|; because a point owns a single bin, a pair can
 * only meet in that bin and no post-join dedup shuffle exists.
 * `binWidth` is the scale knob: ~the median interval length keeps the
 * fan-out per interval at a handful of rows.
 */
object Joins {

  /** As-of join. `left` keeps all its columns plus `right`'s payload
    * columns (null when no right row precedes). `right` must be unique
    * per (key, ts) — pre-aggregate it otherwise (an ambiguous as-of
    * value is a data bug, not a tie to break silently). Payload columns
    * ride in ONE struct through the window so a match contributes all
    * its fields consistently, and a right row whose payload fields are
    * themselves null still counts as a match (the struct is non-null).
    *
    * Scale: one Exchange on `key` + one in-partition sort. A single
    * pathologically hot key serializes within its partition — for a
    * keyless/global as-of, range-partition on ts instead (not needed by
    * any reference workload). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asofJoin: empty payload column list")
    val leftCols = left.columns.toSeq
    require(!leftCols.contains("_asof_side") && payload.forall(!leftCols.contains(_)),
      "asofJoin: column-name collision with left side")
    val l = left.withColumn("_asof_side", lit(0))
      .withColumn("_asof_payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(payload.map(col): _*).schema.fields)))
    val r = right.select(
      Seq(col(key), col(ts), lit(1).as("_asof_side"),
        struct(payload.map(col): _*).as("_asof_payload")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_asof_side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = unioned
      .withColumn("_asof_match", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 0)
    joined.select(leftCols.map(col) ++
      payload.map(p => col(s"_asof_match.$p").as(p)): _*)
  }

  /** Point-in-interval range join: rows of `points` paired with every
    * row of `intervals` whose `[startCol, endCol)` contains `pointCol`.
    * All three columns must be the same numeric domain (e.g. epoch
    * micros). Output = points.* ++ intervals.* for matching pairs
    * (caller projects; column names must not collide). Empty/inverted
    * intervals (end <= start) match nothing. */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"rangeJoinBinned: binWidth=$binWidth")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "rangeJoinBinned: column-name collision between sides")
    val bw = lit(binWidth)
    // interval covers bins floor(start/bw) .. floor((end-1)/bw); the
    // Generate runs inside the scan task (no shuffle to fan out)
    val binned = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_rj_bin",
        explode(sequence(floor(col(startCol) / bw).cast("long"),
          floor((col(endCol) - 1) / bw).cast("long"))))
    val probed = points.withColumn("_rj_bin", floor(col(pointCol) / bw).cast("long"))
    probed.join(binned, Seq("_rj_bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_rj_bin")
  }
}
