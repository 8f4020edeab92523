package graft

import graft.apply.BatchApply
import graft.gen.ChangeLogGen
import graft.model.{ChangeEvent, GenConfig}
import graft.stream.Replay
import graft.verify.Oracle
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Merge-on-read delta path: sparse-change batches append overlay files
  * instead of copy-on-writing whole buckets; readers resolve, COW and
  * compaction fold chains, and everything still matches the oracle. */
class MergeOnReadSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .master("local[8]")
    .appName("graft-mor")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def sparseUpdates(rnd: Random, lsnFrom: Long, n: Int, docSpace: Long): Seq[ChangeEvent] =
    (0 until n).map { i =>
      val doc = f"doc${rnd.nextLong(docSpace)}%012d"
      val toks = Array.fill(4)(rnd.nextInt(1000))
      ChangeEvent(math.abs(doc.hashCode) % 4, lsnFrom + i, "U", doc,
        toks, java.lang.Long.valueOf(4L), "wiki", null)
    }

  private def toDF(evts: Seq[ChangeEvent]): DataFrame = {
    import spark.implicits._
    evts.toDF()
  }

  test("sparse batch lands as delta files; dense batch COWs; both match oracle") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = tmpDir("graft-mor1")
    // base: 20k docs inserted (dense -> COW)
    val baseCfg = GenConfig(nEvents = 20000, nDocs = 5000, nShards = 4,
      pctInsert = 100, pctUpdate = 0, avgTokens = 8)
    val base = ChangeLogGen.events(spark, baseCfg).cache()
    val table = Replay.createTable(spark, s"$dir/t", nBuckets = 16)
    BatchApply.apply(table, base, batchId = 0)
    assert(table.current.files.forall(!_.delta))

    // sparse update batch: 60 changed keys over ~5000 base rows (~1.2%)
    val upd = sparseUpdates(new Random(5), lsnFrom = 100000, n = 60, docSpace = baseCfg.nDocs)
    BatchApply.apply(table, toDF(upd), batchId = 1)
    val snap = table.current
    assert(snap.files.exists(_.delta), "sparse batch should produce delta files")

    // read path resolves: final state equals the sequential oracle
    val all = base.unionByName(toDF(upd))
    val mism = Oracle.diff(Oracle.expectedState(spark, all), table.read())
    assert(mism.isEmpty, mism.mkString("; "))
    base.unpersist()
  }

  test("delta chain is bounded: after maxDeltaChain sparse batches a COW folds it") {
    val dir = tmpDir("graft-mor2")
    val baseCfg = GenConfig(nEvents = 20000, nDocs = 5000, nShards = 4,
      pctInsert = 100, pctUpdate = 0, avgTokens = 8)
    val base = ChangeLogGen.events(spark, baseCfg).cache()
    val table = Replay.createTable(spark, s"$dir/t", nBuckets = 4) // few buckets -> chains build fast
    BatchApply.apply(table, base, batchId = 0)
    var lsn = 200000L
    val rnd = new Random(9)
    var events = Seq.empty[ChangeEvent]
    (1 to 7).foreach { b =>
      val upd = sparseUpdates(rnd, lsn, n = 40, docSpace = baseCfg.nDocs)
      events ++= upd
      lsn += 1000
      BatchApply.apply(table, toDF(upd), batchId = b)
    }
    val chains = table.current.files.filter(_.delta).groupBy(_.bucket).map(_._2.size)
    assert(chains.nonEmpty && chains.max <= BatchApply.DefaultMaxDeltaChain,
      s"chain lengths: $chains")
    val all = base.unionByName(toDF(events))
    val mism = Oracle.diff(Oracle.expectedState(spark, all), table.read())
    assert(mism.isEmpty, mism.mkString("; "))
    base.unpersist()
  }

  test("compaction folds deltas into base files without changing visible state") {
    val dir = tmpDir("graft-mor3")
    val baseCfg = GenConfig(nEvents = 10000, nDocs = 3000, nShards = 4,
      pctInsert = 100, pctUpdate = 0, avgTokens = 8)
    val base = ChangeLogGen.events(spark, baseCfg).cache()
    val table = Replay.createTable(spark, s"$dir/t", nBuckets = 8)
    BatchApply.apply(table, base, batchId = 0)
    val upd = sparseUpdates(new Random(3), 50000, n = 30, docSpace = baseCfg.nDocs)
    BatchApply.apply(table, toDF(upd), batchId = 1)
    assert(table.current.files.exists(_.delta))
    val before = table.read().orderBy("doc_id").collect()
    table.compact()
    assert(table.current.files.forall(!_.delta))
    assert(table.read().orderBy("doc_id").collect().sameElements(before))
  }
}
