package graft.gen

import graft.model.{ChangeLog, GenConfig}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic synthetic change-log ("binlog") generator.
 *
 * Spark-first analog of the reference's synthetic source
 * (`streamreader/.../StreamReader.java:96-167` — typed constant/random
 * rows per task) upgraded for CDC: every event is a pure function of
 * (seed, event index), derived with `xxhash64` draws — no `rand()`, no
 * wall clock — so the same `GenConfig` always produces a byte-identical
 * log. Keys are shard-sticky (shard = hash(doc_id) % nShards) and `lsn`
 * is the global event index, hence strictly increasing within every
 * shard and every key — the analog of DataX's per-shard sequence id
 * (`SingleVerAndUpOnlyModeRecordSender.java:94-100`).
 *
 * The log is written as `nSegments` flat parquet files under `logDir`
 * (seg-00000.parquet, ...). Segment = replay micro-batch granularity
 * (`maxFilesPerTrigger` on the streaming side), mirroring the reference's
 * time-bounded per-shard iterator pages (`RecordProcessor.java:106-247`).
 */
object ChangeLogGen {

  /** The log as a lazy DataFrame covering event indices [lo, hi). */
  def events(spark: SparkSession, cfg: GenConfig, lo: Long, hi: Long): DataFrame = {
    val df = spark.range(lo, hi).toDF("i")
    val h = (salt: Int) => xxhash64(lit(cfg.seed), lit(salt), col("i"))

    val hot = pmod(h(1), lit(1000)) < lit(cfg.hotPerMille)
    val docIdx = when(hot, pmod(h(2), lit(cfg.nHotDocs.toLong)))
      .otherwise(pmod(h(2), lit(cfg.nDocs)))
    val docId = format_string("doc%012d", docIdx)

    val opDraw = pmod(h(3), lit(100))
    val op = when(opDraw < cfg.pctInsert, lit("I"))
      .when(opDraw < cfg.pctInsert + cfg.pctUpdate, lit("U"))
      .otherwise(lit("D"))

    val len = (lit(1) + pmod(h(4), lit(2L * cfg.avgTokens))).cast("int")
    val toks = transform(
      sequence(lit(0), len - 1),
      j => pmod(xxhash64(lit(cfg.seed), docId, col("i"), j), lit(cfg.tokenVocab.toLong)).cast("int"))
    val tokens = when(op === "D", lit(null)).otherwise(toks)

    val sources = array(lit("cc"), lit("wiki"), lit("code"), lit("books"))
    val langs = array(lit("en"), lit("de"), lit("fr"), lit("zh"))

    df.select(
      pmod(xxhash64(docId), lit(cfg.nShards.toLong)).cast("int").as("shard"),
      col("i").as("lsn"),
      op.as("op"),
      docId.as("doc_id"),
      tokens.as("tokens"),
      when(op === "D", lit(null)).otherwise(size(toks).cast("long")).as("n_tok"),
      when(op === "D", lit(null)).otherwise(element_at(sources, (pmod(h(5), lit(4)) + 1).cast("int"))).as("source"),
      when(op === "D" || col("i") < cfg.evolveAtLsn, lit(null))
        .otherwise(element_at(langs, (pmod(h(6), lit(4)) + 1).cast("int"))).as("lang"))
  }

  def events(spark: SparkSession, cfg: GenConfig): DataFrame =
    events(spark, cfg, 0L, cfg.nEvents)

  /** Materialize the log as ordered flat segment files under `logDir`.
    * Sequential per-segment writes => file modification times follow lsn
    * order, so the file stream source replays segments in log order
    * (correctness does NOT depend on this — the sink's per-row lsn guard
    * tolerates any batch order — but in-order replay minimizes COW churn). */
  def write(spark: SparkSession, cfg: GenConfig, logDir: String): Unit = {
    val fs = FileSystem.get(new java.net.URI(logDir), spark.sparkContext.hadoopConfiguration)
    val root = new Path(logDir)
    if (fs.exists(root)) fs.delete(root, true)
    fs.mkdirs(root)
    val segSize = math.max(1L, (cfg.nEvents + cfg.nSegments - 1) / cfg.nSegments)
    var seg = 0
    var lo = 0L
    while (lo < cfg.nEvents) {
      val hi = math.min(cfg.nEvents, lo + segSize)
      val tmp = new Path(root, s".tmp-seg-$seg")
      events(spark, cfg, lo, hi).write.mode("overwrite").parquet(tmp.toString)
      // flatten: move part files up as seg-XXXXX-pYY.parquet (atomic renames)
      val parts = fs.listStatus(tmp).map(_.getPath)
        .filter(p => p.getName.startsWith("part-")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (p, i) =>
        fs.rename(p, new Path(root, f"seg-$seg%05d-p$i%02d.parquet"))
      }
      fs.delete(tmp, true)
      seg += 1
      lo = hi
    }
  }
}
