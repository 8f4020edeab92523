package graft

import graft.apply.BatchApply
import graft.model.ChangeEvent
import graft.stream.Replay
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-style convergence tests (seeded, deterministic): whatever
  * order events arrive in — shuffled within a batch, split into
  * arbitrary batches, batches applied out of order, events duplicated —
  * the final table state must equal the sequential oracle. This is the
  * executable statement of the north rule's "byte-identical to a
  * reference sequential apply" under redelivery and reordering
  * (the reference gets this implicitly from per-key sequential channel
  * order; we get it from the per-row lsn guard + lsn-carrying
  * tombstones). */
class ConvergenceProps extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .master("local[8]")
    .appName("graft-props")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Random event list over a small key space: lots of per-key collisions. */
  private def randomEvents(rnd: Random, n: Int, keys: Int): Seq[ChangeEvent] =
    (0 until n).map { i =>
      val doc = s"doc${rnd.nextInt(keys)}"
      val op = rnd.nextInt(10) match {
        case x if x < 5 => "I"
        case x if x < 8 => "U"
        case _ => "D"
      }
      val toks = if (op == "D") null else Array.fill(1 + rnd.nextInt(5))(rnd.nextInt(1000))
      ChangeEvent(
        shard = math.abs(doc.hashCode) % 4,
        lsn = i.toLong,
        op = op,
        doc_id = doc,
        tokens = toks,
        n_tok = if (toks == null) null else java.lang.Long.valueOf(toks.length.toLong),
        source = if (op == "D") null else Seq("cc", "wiki")(rnd.nextInt(2)),
        lang = null)
    }

  private def toDF(evts: Seq[ChangeEvent]): DataFrame = {
    import spark.implicits._
    evts.toDF()
  }

  private def assertConverged(evts: Seq[ChangeEvent], table: graft.lake.LakeTable): Unit = {
    val mism = graft.verify.Oracle.diff(
      graft.verify.Oracle.expectedState(spark, toDF(evts)), table.read())
    assert(mism.isEmpty, mism.mkString("; "))
  }

  test("P1: shuffled events, arbitrary batch splits, out-of-order batch apply -> oracle state") {
    spark.sparkContext.setLogLevel("WARN")
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val evts = randomEvents(rnd, n = 400, keys = 40)
      val shuffled = rnd.shuffle(evts)
      val nSplits = 1 + rnd.nextInt(4)
      val batches = shuffled.grouped(math.max(1, shuffled.size / nSplits)).toSeq
      val order = rnd.shuffle(batches.indices.toList)
      val table = Replay.createTable(spark, s"${tmpDir(s"prop1-$seed")}/t", nBuckets = 8)
      order.zipWithIndex.foreach { case (bi, applyIdx) =>
        // batchId must advance for the fence; data order is adversarial
        BatchApply.apply(table, toDF(batches(bi)), batchId = applyIdx)
      }
      assertConverged(evts, table)
    }
  }

  test("P2: duplicated delivery (same events re-applied under new batch ids) is a no-op") {
    for (seed <- 10 to 12) {
      val rnd = new Random(seed)
      val evts = randomEvents(rnd, n = 300, keys = 30)
      val table = Replay.createTable(spark, s"${tmpDir(s"prop2-$seed")}/t", nBuckets = 8)
      BatchApply.apply(table, toDF(evts), batchId = 0)
      val v = table.currentVersion
      // redeliver a random subset twice more under fresh batch ids
      BatchApply.apply(table, toDF(rnd.shuffle(evts).take(150)), batchId = 1)
      BatchApply.apply(table, toDF(evts), batchId = 2)
      assert(table.currentVersion >= v)
      assertConverged(evts, table)
    }
  }

  test("P3: interleaved duplicate LSNs across batches cannot corrupt state") {
    val rnd = new Random(99)
    val evts = randomEvents(rnd, n = 200, keys = 10)
    // two overlapping halves: [0, 150) and [100, 200) — 50 events arrive twice
    val b1 = evts.slice(0, 150)
    val b2 = evts.slice(100, 200)
    val table = Replay.createTable(spark, s"${tmpDir("prop3")}/t", nBuckets = 8)
    BatchApply.apply(table, toDF(b1), batchId = 0)
    BatchApply.apply(table, toDF(b2), batchId = 1)
    BatchApply.apply(table, toDF(b1), batchId = 2) // stale redelivery last
    assertConverged(evts, table)
  }

  test("P4: pre-evolution rows stay readable after add-column + int widening") {
    import spark.implicits._
    val pre = randomEvents(new Random(7), n = 120, keys = 15)
    val table = Replay.createTable(spark, s"${tmpDir("prop4")}/t", nBuckets = 8)
    BatchApply.apply(table, toDF(pre), batchId = 0)
    // post-evolution batch: lang set, DISJOINT key space so pre-evolution
    // rows survive and must read back through the evolved schema
    val post = randomEvents(new Random(8), n = 120, keys = 15).map { e =>
      e.copy(doc_id = s"p_${e.doc_id}", lsn = e.lsn + 200,
        lang = if (e.op == "D") null else "en")
    }
    BatchApply.apply(table, toDF(post), batchId = 1)
    val sch = table.current.schema
    assert(sch.fieldNames.contains("lang"))
    assert(sch("n_tok").dataType == org.apache.spark.sql.types.LongType)
    // old rows surface with null lang; all rows readable
    assertConverged(pre ++ post, table)
    val nullLang = table.read().filter(col("lang").isNull).count()
    assert(nullLang > 0)
  }
}
