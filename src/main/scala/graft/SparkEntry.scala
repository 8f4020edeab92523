package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * Each `queries` entry is one operator from SURVEY.md §2 re-expressed
 * Spark-first over the driver's parquet tables; `oracleSql` carries the
 * equivalent ANSI SQL the driver runs in DuckDB over the same tables.
 * Column names/aliases are kept identical on both sides (the driver
 * hashes values after sorting columns by name).
 */
object SparkEntry {

  /** Flagship: the CDC engine end-to-end at test scale — generate a
    * deterministic change log, MERGE-replay it into a LakeTable, return
    * the final doc store state. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.apply.BatchApply
    import graft.gen.ChangeLogGen
    import graft.model.GenConfig
    import graft.stream.Replay
    val dir = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val cfg = GenConfig(nEvents = 5000, nDocs = 800, nShards = 4,
      avgTokens = 8, evolveAtLsn = 3000)
    val table = Replay.createTable(spark, s"$dir/table", nBuckets = 8)
    BatchApply.apply(table, ChangeLogGen.events(spark, cfg), batchId = 0)
    table.read()
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.2 scan + §4.1/4.2 pushdown & pruning (reader column/where lists)
    "q01_scan_filter" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp") && col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        .limit(1000)),

    // §2.8 aggregation (TPC-H q1-shaped; map-side partial agg)
    "q02_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))),

    // §2.8 join: small dim broadcast (orders x customer)
    "q03_join_broadcast" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_price"))
    }),

    // §2.8 large shuffle join lineitem x orders
    "q04_join_shuffle" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // CDC last-wins per key (the engine's canonicalize step, §7.2) over
    // the events stream: latest event per user by (ts, event_id)
    "q05_cdc_lastwins" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"))
    }),

    // §2.1 RangeSplitUtil analog: contiguous range partitioning of a key
    // domain + per-range counts (the JDBC pk-split planner as a query)
    "q06_range_split" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val bounds = l.agg(min(col("l_orderkey")).as("lo"), max(col("l_orderkey")).as("hi")).head()
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      val k = 8L
      val width = (hi - lo + k) / k // ceil
      l.select(least(floor((col("l_orderkey") - lo) / width).cast("long"), lit(k - 1)).as("range_id"))
        .groupBy(col("range_id")).agg(count(lit(1)).as("n_rows"))
    }),

    // §2.4 dx_substr + dx_pad + dx_replace transformer chain
    "q07_transform_chain" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          substring(col("text"), 1, 20).as("sub20"),
          lpad(col("lang"), 5, "_").as("lang_pad"),
          concat(substring(col("text"), 1, 3), lit("***"),
            substring(col("text"), 10, 2147483000).as("rest")).as("spliced"))
        .orderBy(col("doc_id"))),

    // §2.4 dx_filter transformer (predicate drop semantics)
    "q08_filter_transform" -> ((s, dir) =>
      t(s, dir, "events")
        .filter(!(col("event_type") === "error") && col("value") >= 1.0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))),

    // §2.6 dirty-record routing: try_cast split of a messy projection
    // (props is a JSON string; k is numeric-or-garbage)
    "q09_dirty_split" -> ((s, dir) =>
      t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").as("k_raw"))
        .select(expr("try_cast(k_raw AS int)").as("k"))
        .groupBy(col("k").isNull.as("is_dirty"))
        .agg(count(lit(1)).as("n"))),

    // §2.1 time x metric split (tsdbreader): hourly windows per type
    "q10_time_window" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))),

    // exact dedup (training-data op): documents by content hash
    "q11_dedup_exact" -> ((s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
        .select(col("keep_id"), col("dup_count"))),

    // token counting (training-data op): whitespace tokenization
    "q12_token_count" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"),
          length(col("text")).as("n_chars_calc"))),

    // quality scoring (training-data op): stopword/length ratios
    "q13_quality_score" -> ((s, dir) => {
      val words = split(trim(col("text")), "\\s+")
      val stop = array(lit("the"), lit("a"), lit("of"), lit("and"), lit("to"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(words).as("n_words"),
          size(filter(words, w => array_contains(stop, w))).as("n_stop"))
        .withColumn("stop_ratio", round(col("n_stop") / col("n_words"), 6))
    })
  )

  /** DuckDB-runnable ANSI SQL oracles (column names matched 1:1). */
  def oracleSql: Map[String, String] = Map(
    "q01_scan_filter" ->
      """SELECT l_orderkey, l_quantity, l_extendedprice FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_quantity, l_extendedprice LIMIT 1000""".stripMargin,
    "q02_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |count(*) AS n_rows FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q03_join_broadcast" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |round(sum(o_totalprice), 2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey""".stripMargin,
    "q04_join_shuffle" ->
      """SELECT o_orderstatus,
        |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin,
    "q05_cdc_lastwins" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1""".stripMargin,
    "q06_range_split" ->
      """WITH b AS (SELECT min(l_orderkey) AS lo, max(l_orderkey) AS hi FROM lineitem),
        |w AS (SELECT lo, CAST(floor((hi - lo + 8) / 8.0) AS BIGINT) AS width FROM b)
        |SELECT least(CAST(floor((l_orderkey - w.lo)::DOUBLE / w.width) AS BIGINT), 7) AS range_id,
        |count(*) AS n_rows FROM lineitem, w GROUP BY 1""".stripMargin,
    "q07_transform_chain" ->
      """SELECT doc_id, substr(text, 1, 20) AS sub20, lpad(lang, 5, '_') AS lang_pad,
        |substr(text, 1, 3) || '***' || substr(text, 10) AS spliced
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q08_filter_transform" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events WHERE NOT (event_type = 'error') AND value >= 1.0
        |GROUP BY event_type""".stripMargin,
    "q09_dirty_split" ->
      """SELECT (TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NULL) AS is_dirty,
        |count(*) AS n FROM events GROUP BY 1""".stripMargin,
    "q10_time_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |round(avg(value), 4) AS avg_value FROM events GROUP BY 1, 2""".stripMargin,
    "q11_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY text""".stripMargin,
    "q12_token_count" ->
      """SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
        |length(text) AS n_chars_calc FROM documents""".stripMargin,
    "q13_quality_score" ->
      """SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
        |len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    w -> list_contains(['the','a','of','and','to'], w))) AS n_stop,
        |round(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |    w -> list_contains(['the','a','of','and','to'], w)))::DOUBLE
        |  / len(regexp_split_to_array(trim(text), '\s+')), 6) AS stop_ratio
        |FROM documents""".stripMargin
  )
}
