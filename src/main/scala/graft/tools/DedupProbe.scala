package graft.tools

import graft.gen.ChangeLogGen
import graft.model.GenConfig
import graft.stream.Replay
import org.apache.spark.sql.SparkSession

/** Scratch probe (not shipped): dedup-admission overhead at the bench's
  * 1M-event rung, mirroring Bench.scala's dedupReplay exactly. */
object DedupProbe {
  def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"),
      "graft-dedup-probe").toString
    val dedupEvents = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dxCfg = GenConfig(
      nEvents = dedupEvents, nDocs = math.max(1000L, dedupEvents / 4),
      nShards = 32, avgTokens = 32, nSegments = 4,
      hotPerMille = 0, evolveAtLsn = Long.MaxValue)
    val sDx = SparkSession.builder()
      .master("local[32]").appName("graft-dedup-probe")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    sDx.sparkContext.setLogLevel("WARN")
    ChangeLogGen.write(sDx, dxCfg, s"$work/dxlog")
    val dxFiles = new java.io.File(s"$work/dxlog").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val dxPerTrigger = math.max(1, (dxFiles + 3) / 4)
    def dedupReplay(tag: String, dedup: Option[graft.model.DedupSpec]): (Double, Long) = {
      val m = new graft.stream.ReplayMetrics
      val sec = time(Replay.replay(sDx, s"$work/dxlog",
        s"$work/dx-table-$tag", s"$work/dx-cp-$tag",
        nBuckets = 64, maxFilesPerTrigger = dxPerTrigger,
        dedup = dedup, metrics = Some(m)))
      Seq(s"$work/dx-table-$tag", s"$work/dx-cp-$tag", s"$work/dx-index-$tag").foreach(p =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
      (sec, m.dedupDroppedDocs.get)
    }
    val offs = scala.collection.mutable.ArrayBuffer[Double]()
    val ons = scala.collection.mutable.ArrayBuffer[Double]()
    for (i <- 1 to 3) {
      val (offSec, _) = dedupReplay(s"off$i", None)
      val (onSec, dropped) = dedupReplay(s"on$i",
        Some(graft.model.DedupSpec(s"$work/dx-index-on$i", threshold = 0.8,
          n = 3, k = 16, bands = 4, maxBucketSize = 1000)))
      offs += offSec; ons += onSec
      println(f"RESULT attempt=$i off=$offSec%.2f on=$onSec%.2f ratio=${onSec / offSec}%.2f dropped=$dropped")
    }
    println(f"BEST off=${offs.min}%.2f on=${ons.min}%.2f ratio=${ons.min / offs.min}%.2f")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    sDx.stop()
  }
}
