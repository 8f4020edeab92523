package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Split planners — the reference's table-split machinery re-expressed as
 * distributed plans (DataX `plugin-rdbms-util/.../RangeSplitUtil.java` +
 * `SingleTableSplitUtil.java`).
 *
 * [[exactNtile]] replaces the naive global-window `ntile()` (a
 * single-partition sort: Spark warns "Moving all data to a single
 * partition") with a two-stage exact quantile split in the spirit of the
 * reference's Oracle sampling splitter
 * (`SingleTableSplitUtil.genSplitSqlForOracle:294-389`) but exact:
 *   1. bucket rows into `coarseRanges` contiguous key ranges whose
 *      bounds come from `approxQuantile` (so ranges stay balanced even
 *      under clustered key domains);
 *   2. count per range (one map-side-combined aggregation, `coarseRanges`
 *      rows to the driver) → cumulative offsets;
 *   3. rank WITHIN each range (window partitioned by range — parallel),
 *      global rank = range offset + local rank, tile from the closed-form
 *      ntile formula.
 * Every shuffle is keyed; no stage ever sees more than one range's rows.
 *
 * [[stringRangeSplit]] is the radix-128 string split
 * (`RangeSplitUtil.java:105-171`, `doAsciiStringSplit`): strip the
 * common prefix of min/max, interpret the next `chars` characters as
 * base-128 digits, then even-width range split over that numeric domain —
 * how a JDBC reader splits a string primary key into WHERE ranges.
 */
object Split {

  /** Exact distributed ntile over a unique numeric key. Returns the
    * input projected to (k = key, tile ∈ 1..tiles).
    *
    * Coarse ranges are seeded from `approxQuantile` (not even widths
    * over [min,max]): a pathologically clustered key domain would
    * collapse even-width ranges into one, funneling the per-range
    * ranking window through a single task — quantile bounds keep every
    * range ≈ |rows|/coarseRanges regardless of the distribution. The
    * range id is a monotone count of bounds ≤ k (a short chain of
    * integer comparisons — no floating-point division anywhere near a
    * range boundary). Any integral key type is accepted (cast to long
    * up front); empty input fails fast. */
  def exactNtile(df: DataFrame, key: Column, tiles: Int, coarseRanges: Int = 64): DataFrame = {
    val keyed = df.select(key.cast("long").as("k"))
    val probs = (0 to coarseRanges).map(_.toDouble / coarseRanges).toArray
    val qs = keyed.stat.approxQuantile("k", probs, 0.001)
    require(qs.nonEmpty, "exactNtile: empty input")
    // inner bounds only; duplicates (clustered keys) just leave ranges empty
    val bounds = qs.slice(1, coarseRanges).map(_.toLong).distinct.sorted
    val ranged = keyed.withColumn("range_id",
      bounds.map(b => (col("k") >= b).cast("long")).reduceOption(_ + _).getOrElse(lit(0L)))

    // per-range counts -> cumulative start offsets (driver: <= coarseRanges rows)
    val counts = ranged.groupBy(col("range_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    require(total >= tiles, s"exactNtile: $total rows < $tiles tiles")
    var acc = 0L
    val offsets = counts.keys.toSeq.sorted.map { id => val o = acc; acc += counts(id); id -> o }
    val offMap = map(offsets.flatMap { case (id, o) => Seq(lit(id), lit(o)) }: _*)

    // closed-form ntile over the 0-based global rank r:
    //   first `rem` tiles hold base+1 rows, the rest hold base rows
    // (the divisions below are over RANKS — row counts, always far
    // below 2^53 — never over raw key values, so double arithmetic is
    // exact here)
    val base = total / tiles
    val rem = total % tiles
    val w = Window.partitionBy(col("range_id")).orderBy(col("k"))
    val rank0 = element_at(offMap, col("range_id")) + row_number().over(w) - 1
    val tile = when(lit(rem) > 0 && rank0 < rem * (base + 1),
        floor(rank0 / (base + 1)).cast("int") + 1)
      .otherwise(lit(rem.toInt) + floor((rank0 - rem * (base + 1)) / base).cast("int") + 1)
    ranged.withColumn("tile", tile).select(col("k"), col("tile"))
  }

  /** SIZE-BOUNDED CHUNK SPLIT — the mongoreader splitVector analog
    * (reference `mongodbreader/.../CollectionSplitUtil.java:40-129`
    * asks mongos for chunk boundaries at every `maxChunkSize` bytes of
    * key-ordered data; here the boundaries are computed exactly from a
    * byte-size column): each UNIQUE key gets
    * `chunk_id = floor(cumulativeBytesBefore(key) / maxChunkBytes)` —
    * contiguous key ranges, every chunk's payload ≤ maxChunkBytes plus
    * at most the one row that crosses the boundary (splitVector's own
    * contract), an oversized single row gets its own chunk.
    *
    * The cumulative sum uses NO global window (the single-task sort
    * trap) — the [[exactNtile]] discipline: approxQuantile-seeded
    * coarse ranges keep every range balanced under clustered domains;
    * per-range byte totals fold to driver offsets (≤ coarseRanges
    * rows); the running sum windows WITHIN each range in parallel and
    * adds the range's offset. Returns (k = key, bytes, chunk_id). */
  def byteChunkSplit(df: DataFrame, key: Column, bytes: Column, maxChunkBytes: Long,
      coarseRanges: Int = 64): DataFrame = {
    require(maxChunkBytes > 0, "byteChunkSplit: maxChunkBytes must be positive")
    val keyed = df.select(key.cast("long").as("k"), bytes.cast("long").as("bytes"))
    val probs = (0 to coarseRanges).map(_.toDouble / coarseRanges).toArray
    val qs = keyed.stat.approxQuantile("k", probs, 0.001)
    require(qs.nonEmpty, "byteChunkSplit: empty input")
    val bounds = qs.slice(1, coarseRanges).map(_.toLong).distinct.sorted
    val ranged = keyed.withColumn("range_id",
      bounds.map(b => (col("k") >= b).cast("long")).reduceOption(_ + _).getOrElse(lit(0L)))

    // per-range byte totals -> cumulative offsets (driver: <= coarseRanges rows)
    val totals = ranged.groupBy(col("range_id")).agg(sum(col("bytes")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets = totals.keys.toSeq.sorted.map { id => val o = acc; acc += totals(id); id -> o }
    val offMap = map(offsets.flatMap { case (id, o) => Seq(lit(id), lit(o)) }: _*)

    // running bytes BEFORE each key = range offset + inclusive running
    // sum - own bytes; floor of a double division over byte totals
    // (far below 2^53) == integer division, matching the oracle's `//`
    val w = Window.partitionBy(col("range_id")).orderBy(col("k"))
    val cumBefore = element_at(offMap, col("range_id")) +
      sum(col("bytes")).over(w) - col("bytes")
    ranged
      .withColumn("chunk_id", floor(cumBefore / lit(maxChunkBytes.toDouble)).cast("long"))
      .select(col("k"), col("bytes"), col("chunk_id"))
  }

  /** Base-128 positional value of the `chars` characters following a
    * fixed prefix of length `prefixLen` (1-based positions prefixLen+1..
    * prefixLen+chars). Characters past end-of-string contribute 0
    * (`ascii('') = 0` in both engines); codepoints above 127 clamp. */
  def stringPrefixValue(key: Column, prefixLen: Int, chars: Int): Column =
    (1 to chars).map { i =>
      least(ascii(substring(key, prefixLen + i, 1)), lit(127)).cast("long") *
        lit(1L << (7 * (chars - i)))
    }.reduce(_ + _)

  /** DuckDB SQL for [[stringPrefixValue]] with a prefix-length expression
    * `lExpr` (BIGINT) in scope. */
  def stringPrefixValueSql(e: String, lExpr: String, chars: Int): String =
    (1 to chars).map { i =>
      s"least(ascii(substr($e, CAST($lExpr + $i AS INT), 1)), 127)::BIGINT * ${1L << (7 * (chars - i))}"
    }.mkString("(", " + ", ")")

  /** Radix-128 string range split: per-range row counts for `k` even
    * ranges of the post-common-prefix character domain. Returns
    * (range_id, n_rows). Mirrors `RangeSplitUtil.doAsciiStringSplit`.
    *
    * Two base-table scans total: one min/max over the key strings (the
    * common prefix length must be known before the radix value exists),
    * then ONE `groupBy(pv)` count. The radix-value bounds — of the
    * MAPPED values, not pv(min-string)/pv(max-string): the >127 clamp
    * makes the value non-monotonic in string order for non-ASCII keys,
    * so string-derived bounds could invert — derive from that same
    * grouped frame via a broadcast self-aggregate; the grouped exchange
    * is planned once and reused (ReuseExchange), so the bounds pass
    * costs no extra base scan. The per-pv frame is bounded by the
    * distinct post-prefix character prefixes (≤ 128^chars), orders of
    * magnitude below row count at any scale, and the final range_id
    * re-aggregate runs over it, not the base data. */
  def stringRangeSplit(df: DataFrame, key: Column, k: Int, chars: Int = 4): DataFrame = {
    val b = df.agg(min(key).as("mn"), max(key).as("mx")).head()
    val (mn, mx) = (b.getString(0), b.getString(1))
    val maxL = math.min(mn.length, mx.length)
    var l = 0
    while (l < maxL && mn.charAt(l) == mx.charAt(l)) l += 1
    val pv = stringPrefixValue(key, l, chars)
    val grouped = df.groupBy(pv.as("pv")).agg(count(lit(1)).as("n"))
    val bounds = grouped.agg(min(col("pv")).as("lo"), max(col("pv")).as("hi"))
    grouped.crossJoin(broadcast(bounds))
      // width >= 1 (hi >= lo by construction); floor of a double division
      // over longs < 2^53 == integer division, matching the driver-side
      // `(hi - lo + k) / k` this replaces and the DuckDB oracle
      .withColumn("width", floor((col("hi") - col("lo") + lit(k.toLong)) / lit(k.toLong)))
      .select(least(floor((col("pv") - col("lo")) / col("width")).cast("long"),
        lit(k - 1L)).as("range_id"), col("n"))
      .groupBy(col("range_id")).agg(sum(col("n")).as("n_rows"))
  }

  /** The full [[stringRangeSplit]] as one DuckDB statement over table
    * `tbl`, key column `keyCol` — common prefix length, radix bounds and
    * width all derived IN SQL so the oracle is self-contained. */
  def stringRangeSplitSql(tbl: String, keyCol: String, k: Int, chars: Int = 4): String = {
    val pvData = stringPrefixValueSql(s"$tbl.$keyCol", "p.l", chars)
    val pvKey = stringPrefixValueSql(s"$tbl.$keyCol", "w.l", chars)
    s"""WITH b AS (SELECT min($keyCol) AS mn, max($keyCol) AS mx FROM $tbl),
       |p AS (SELECT
       |  list_max(list_filter(range(0, least(length(mn), length(mx)) + 1),
       |    i -> substr(mn, 1, CAST(i AS INT)) = substr(mx, 1, CAST(i AS INT)))) AS l FROM b),
       |v AS (SELECT p.l, min($pvData) AS lo, max($pvData) AS hi FROM $tbl, p GROUP BY p.l),
       |w AS (SELECT l, lo, CAST(floor((hi - lo + $k) / $k.0) AS BIGINT) AS width FROM v)
       |SELECT least(CAST(floor(($pvKey - w.lo)::DOUBLE / w.width) AS BIGINT), ${k - 1}) AS range_id,
       |count(*) AS n_rows FROM $tbl, w GROUP BY 1""".stripMargin
  }
}
