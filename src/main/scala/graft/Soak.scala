package graft

import graft.gen.ChangeLogGen
import graft.model.GenConfig
import graft.stream.Replay
import org.apache.spark.sql.SparkSession

/**
 * Steady-state soak — the SURVEY §7.3 M4 measurement as a reproducible
 * main: generate a large synthetic binlog (default 10^8 events, 25M
 * distinct keys, 32 shards) and replay it end-to-end through the full
 * streaming pipeline in a handful of micro-batches, reporting sustained
 * change-events/sec and the final table shape. This is the number that
 * exercises the COW/MOR merge against an already-large table (each
 * micro-batch rewrites its touched buckets), unlike the bench ladder's
 * single-table-build replay — and, since round 3, the O(batch-files)
 * manifest commit path under a growing live file set.
 *
 * Env knobs: SPARK_GRAFT_SOAK_EVENTS (default 100,000,000),
 * SPARK_GRAFT_SOAK_FEED ("off" default | "changelog" | "preimages" —
 * replay with the change feed / the signed pre-image delta feed on,
 * and in feed modes ALSO measure the IVM consumer at soak scale:
 * view init = the full aggregate a non-incremental consumer pays,
 * then a ~0.1%-of-docs delta batch followed by one incremental sync —
 * the regime where the pure-feed sync's ~constant cost meets a
 * full-refresh cost that grew with the table),
 * SPARK_GRAFT_SOAK_BATCHES (default 4), SPARK_GRAFT_SOAK_BUCKETS
 * (table bucket count — an integer, or "auto" to let
 * [[graft.lake.LakeTable.suggestBuckets]] size it from the expected
 * final row count; default 64; shuffle.partitions follows it so the
 * write-side shuffle elision stays aligned), SPARK_GRAFT_SOAK_WORK
 * (default under /dev/shm when present — the metric is engine
 * throughput, not disk writeback).
 *
 * SPARK_GRAFT_SOAK_BUCKET_LADDER ("16,64,256,...") switches to ladder
 * mode: generate the log ONCE, then replay it once per bucket count
 * into a fresh table (fresh checkpoint, fresh SparkSession so
 * shuffle.partitions tracks the bucket count and the write-side
 * shuffle elision stays aligned at every rung). This measures the
 * bucket count's two opposing cost terms on the SAME input — fewer
 * buckets = each sparse batch rewrites a larger fraction of the table
 * (COW write amplification), more buckets = more files/commit overhead
 * per batch — and documents where the knee sits for a given table
 * size, which is what [[graft.lake.LakeTable.suggestBuckets]] encodes.
 * Emits one JSON line per rung plus a summary line.
 */
object Soak {

  private def newSession(nBuckets: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-soak")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", nBuckets.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val events = sys.env.getOrElse("SPARK_GRAFT_SOAK_EVENTS", "100000000").toLong
    val batches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "4").toInt
    val nBuckets = sys.env.getOrElse("SPARK_GRAFT_SOAK_BUCKETS", "64") match {
      // expected live rows ≈ distinct keys ≈ events/4 (the generator's
      // nDocs), minus deletes — the estimate only has to land the
      // right power of two
      case "auto" => graft.lake.LakeTable.suggestBuckets(events / 4, parallelism = 32)
      case n => n.toInt
    }
    val ladder = sys.env.get("SPARK_GRAFT_SOAK_BUCKET_LADDER")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq.empty)
    val workRoot = sys.env.get("SPARK_GRAFT_SOAK_WORK").map(java.nio.file.Paths.get(_))
      .getOrElse(if (new java.io.File("/dev/shm").isDirectory)
        java.nio.file.Paths.get("/dev/shm") else java.nio.file.Paths.get("/tmp"))
    val work = java.nio.file.Files.createTempDirectory(workRoot, "graft-soak").toString
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))))

    val cfg = GenConfig(
      nEvents = events, nDocs = events / 4, nShards = 32, avgTokens = 32,
      hotPerMille = 50, nSegments = batches, evolveAtLsn = Long.MaxValue)
    System.err.println(s"[soak] generating $events events under $work")
    val genSession = newSession(if (ladder.nonEmpty) ladder.head else nBuckets)
    ChangeLogGen.write(genSession, cfg, s"$work/log")
    val nFiles = new java.io.File(s"$work/log").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val perTrigger = math.max(1, (nFiles + batches - 1) / batches)

    val feedMode = sys.env.getOrElse("SPARK_GRAFT_SOAK_FEED", "off")
    require(Seq("off", "changelog", "preimages").contains(feedMode), s"feed=$feedMode")

    def runOnce(spark: SparkSession, buckets: Int, tag: String): Double = {
      System.err.println(s"[soak] replaying ($nFiles files, $perTrigger per trigger, " +
        s"$buckets buckets, feed=$feedMode)")
      val t0 = System.nanoTime()
      val table = Replay.replay(spark, s"$work/log", s"$work/table-$tag", s"$work/cp-$tag",
        nBuckets = buckets, maxFilesPerTrigger = perTrigger,
        changelog = feedMode != "off", preimages = feedMode == "preimages")
      val sec = (System.nanoTime() - t0) / 1e9
      val snap = table.current
      val rows = snap.files.filterNot(_.delta).map(_.rows).sum
      val ivmJson = if (feedMode == "off") "" else {
        import org.apache.spark.sql.functions._
        def t2[A](body: => A): (A, Double) = {
          val s0 = System.nanoTime(); val r = body; (r, (System.nanoTime() - s0) / 1e9)
        }
        // what a NON-incremental consumer pays per refresh at this size
        // (the wide view: sum over the tokens payload, unprunable)
        val wide = "aggregate(tokens, 0L, (a, x) -> a + x)"
        val (_, fullSec) = t2(table.read().groupBy(col("source"))
          .agg(count(lit(1)), sum(expr(wide).cast("long"))).collect())
        val (_, initSec) = t2(graft.lake.Ivm.sync(table, s"$work/agg-$tag", sumCol = wide))
        // ~0.1%-of-docs delta, then ONE incremental sync
        val maxLsn = snap.watermarks.values.max
        val delta = table.read().select(col("doc_id"), col("source"))
          .limit(math.max(100, (cfg.nDocs / 1000).toInt))
          .select(pmod(xxhash64(col("doc_id")), lit(32)).cast("int").as("shard"),
            (lit(maxLsn + 1000000L) + monotonically_increasing_id()).as("lsn"),
            lit("U").as("op"), col("doc_id"),
            array(lit(1), lit(2), lit(3)).as("tokens"), lit(3L).as("n_tok"),
            col("source"), lit(null).cast("string").as("lang"))
        graft.apply.BatchApply.apply(table, delta, batchId = snap.batchId + 1,
          changelog = true, preimages = feedMode == "preimages")
        val (_, syncSec) = t2(graft.lake.Ivm.sync(table, s"$work/agg-$tag", sumCol = wide))
        f""","ivm_wide_full_agg_sec":$fullSec%.2f,"ivm_init_sec":$initSec%.2f,""" +
          f""""ivm_sync_sec":$syncSec%.2f,"ivm_sync_mode":"${
            if (feedMode == "preimages") "pure-feed" else "snapshot-diff"}""""
      }
      println(f"""{"soak_events":$events,"batches":$batches,"buckets":$buckets,"sec":$sec%.1f,""" +
        f""""events_per_sec":${events / sec}%.0f,"table_rows":$rows,""" +
        s""""files":${snap.files.size},"manifests":${snap.manifests.size},""" +
        s""""versions":${table.listVersions.size},"feed":"$feedMode"$ivmJson}""")
      Seq(s"$work/table-$tag", s"$work/cp-$tag", s"$work/agg-$tag").foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
      sec
    }

    if (ladder.isEmpty) {
      runOnce(genSession, nBuckets, "solo")
      genSession.stop()
    } else {
      genSession.stop()
      // fresh session per rung: shuffle.partitions must equal the rung's
      // bucket count or the write-side shuffle elision goes away and the
      // rung measures an extra exchange instead of the bucket cost
      val secs = ladder.map { b =>
        val s = newSession(b)
        try b -> runOnce(s, b, s"b$b") finally s.stop()
      }
      val summary = secs.map { case (b, s) => s""""$b":${f"$s%.1f"}""" }.mkString(",")
      println(s"""{"bucket_ladder_sec":{$summary},"events":$events,"suggest":${
        graft.lake.LakeTable.suggestBuckets(events / 4, parallelism = 32)}}""")
    }
  }
}
