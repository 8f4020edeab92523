package graft

import graft.apply.BatchApply
import graft.lake.{Ivm, LakeTable}
import graft.model.ChangeEvent
import graft.stream.Replay
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental view maintenance over the change feed: every sync lands
  * the maintained aggregate exactly on the direct groupBy of the
  * table's current state, through inserts, source-moving updates,
  * deletes, group extinction, and crash-heal of the store swap. */
class IvmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .master("local[8]")
    .appName("graft-ivm")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ev(lsn: Long, op: String, doc: String, nTok: Int, src: String): ChangeEvent =
    ChangeEvent((math.abs(doc.hashCode) % 4).toInt, lsn, op, doc,
      if (op == "D") null else Array.tabulate(nTok)(identity),
      if (op == "D") null else java.lang.Long.valueOf(nTok.toLong),
      if (op == "D") null else src, null)

  private def toDF(evts: Seq[ChangeEvent]): DataFrame = {
    import spark.implicits._
    evts.toDF()
  }

  private def direct(table: LakeTable): Set[(String, Long, Long)] =
    table.read().groupBy("source")
      .agg(count(lit(1)).as("cnt"), sum(col("n_tok").cast("long")).as("sum_val"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def served(df: DataFrame): Set[(String, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("init + incremental syncs track the direct aggregate exactly (point-lookup regime)") {
    trackExactly(tmpDir("ivm1"), keyLookupMax = Ivm.DefaultKeyLookupMax)
  }

  test("join regime (changed keys over the lookup bound) tracks identically") {
    trackExactly(tmpDir("ivm1j"), keyLookupMax = 0)
  }

  private def trackExactly(dir: String, keyLookupMax: Int): Unit = {
    val table = Replay.createTable(spark, s"$dir/t", nBuckets = 8)
    val agg = s"$dir/agg"
    def syncNow(): DataFrame =
      Ivm.sync(table, agg, keyLookupMax = keyLookupMax)

    // batch 0: 60 inserts across three sources
    val b0 = (0 until 60).map(i => ev(i + 1, "I", f"d$i%04d", 2 + i % 5, s"s${i % 3}"))
    BatchApply.apply(table, toDF(b0), batchId = 0, changelog = true)
    assert(served(syncNow()) == direct(table), "full init diverged")
    assert(Ivm.syncedBatchId(spark, agg) == 0L)

    // batch 1: updates that MOVE docs between groups, deletes, inserts
    val b1 =
      (0 until 10).map(i => ev(1000 + i, "U", f"d$i%04d", 10, "s0")) ++ // s1/s2 -> s0
      (20 until 25).map(i => ev(1100 + i, "D", f"d$i%04d", 0, null)) ++
      (0 until 8).map(i => ev(1200 + i, "I", f"n$i%04d", 7, "s3"))      // new group
    BatchApply.apply(table, toDF(b1), batchId = 1, changelog = true)
    assert(served(syncNow()) == direct(table), "incremental sync diverged")
    assert(Ivm.syncedBatchId(spark, agg) == 1L)

    // batch 2: drive group s3 extinct, flip a doc back and forth
    val b2 =
      (0 until 8).map(i => ev(2000 + i, "D", f"n$i%04d", 0, null)) ++
      Seq(ev(2100, "U", "d0000", 3, "s2"), ev(2101, "U", "d0000", 4, "s1"))
    BatchApply.apply(table, toDF(b2), batchId = 2, changelog = true)
    val after2 = syncNow()
    assert(served(after2) == direct(table), "delete/extinction sync diverged")
    assert(!served(after2).exists(_._1 == "s3"), "extinct group must drop out")

    // no-op sync: nothing new, result unchanged
    assert(served(syncNow()) == direct(table))
    assert(Ivm.syncedBatchId(spark, agg) == 2L)
  }

  test("sumCol accepts an expression over the wide payload column") {
    val dir = tmpDir("ivm-wide")
    val table = Replay.createTable(spark, s"$dir/t", nBuckets = 4)
    val agg = s"$dir/agg"
    val wide = "aggregate(tokens, 0L, (a, x) -> a + x)"
    def directWide(): Set[(String, Long, Long)] =
      table.read().groupBy("source")
        .agg(count(lit(1)).as("cnt"), sum(expr(wide).cast("long")).as("sum_val"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b0 = (0 until 30).map(i => ev(i + 1, "I", f"w$i%04d", 3 + i % 4, s"s${i % 2}"))
    BatchApply.apply(table, toDF(b0), batchId = 0, changelog = true)
    assert(served(Ivm.sync(table, agg, sumCol = wide)) == directWide())
    // incremental: updates change token contents, a delete, an insert
    val b1 = Seq(ev(100, "U", "w0000", 9, "s1"), ev(101, "D", "w0001", 0, null),
      ev(102, "I", "w9999", 5, "s0"))
    BatchApply.apply(table, toDF(b1), batchId = 1, changelog = true)
    assert(served(Ivm.sync(table, agg, sumCol = wide)) == directWide())
  }

  test("crash heal: a torn store swap is recovered on next access") {
    val dir = tmpDir("ivm2")
    val table = Replay.createTable(spark, s"$dir/t", nBuckets = 4)
    val agg = s"$dir/agg"
    val b0 = (0 until 20).map(i => ev(i + 1, "I", f"x$i%04d", 3, s"s${i % 2}"))
    BatchApply.apply(table, toDF(b0), batchId = 0, changelog = true)
    val want = served(Ivm.sync(table, agg))

    // simulate the crash window: live renamed away, second rename lost
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(agg), spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$agg/state"),
      new org.apache.hadoop.fs.Path(s"$agg/state.old")))
    assert(served(Ivm.readAgg(spark, agg)) == want, "heal must restore the store")
    // and a sync after heal still tracks
    val b1 = Seq(ev(100, "I", "y0001", 9, "s9"))
    BatchApply.apply(table, toDF(b1), batchId = 1, changelog = true)
    assert(served(Ivm.sync(table, agg)) == direct(table))
  }
}
