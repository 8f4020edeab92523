package graft

import graft.lake.{FencedWriterException, WriterLease}
import graft.model.ChangeEvent
import graft.operators.{AnnIndex, LshIndex}
import graft.stream.Replay
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-writer epoch fencing for the persisted index stores: a newer
  * acquisition fences every older writer at its next mutation boundary,
  * a fenced mutation fails loudly and leaves the store byte-identical,
  * and a store that never opted in keeps its zero-overhead
  * single-writer behavior. */
class WriterLeaseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .master("local[8]")
    .appName("graft-lease")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docs(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map { i =>
      (f"doc$i%05d", s"alpha bravo charlie delta echo foxtrot golf hotel token$i end$i")
    }.toDF("doc_id", "text")
  }

  test("acquire is monotone; guard enforces current-epoch-or-bust") {
    val dir = tmpDir("lease-acq")
    assert(WriterLease.currentEpoch(spark, dir).isEmpty)
    WriterLease.guard(spark, dir, None) // unfenced store: lease-less OK
    val a = WriterLease.acquire(spark, dir, "a")
    assert(a.epoch == 1L)
    val b = WriterLease.acquire(spark, dir, "b")
    assert(b.epoch == 2L)
    assert(WriterLease.currentEpoch(spark, dir).contains(2L))
    // stale lease and missing lease both refused once fenced
    intercept[FencedWriterException](WriterLease.guard(spark, dir, Some(a)))
    intercept[FencedWriterException](WriterLease.guard(spark, dir, None))
    WriterLease.guard(spark, dir, Some(b)) // current holder passes
    intercept[FencedWriterException](a.check(spark))
    b.check(spark)
    // lease for one store cannot guard another
    intercept[IllegalArgumentException](
      WriterLease.guard(spark, tmpDir("lease-other"), Some(b)))
    // releasing a superseded lease tidies its marker, never un-fences
    a.release(spark)
    assert(WriterLease.currentEpoch(spark, dir).contains(2L))
    b.release(spark) // max marker: release is a no-op
    assert(WriterLease.currentEpoch(spark, dir).contains(2L))
  }

  test("LSH index: newer writer fences older; fenced mutation leaves store intact") {
    val dir = s"${tmpDir("lease-lsh")}/idx"
    LshIndex.build(docs(0 until 40), dir, n = 3, k = 12, bands = 4)
    // un-fenced store: legacy lease-less append still works
    LshIndex.append(docs(40 until 50), dir)

    val a = WriterLease.acquire(spark, dir, "writer-a")
    LshIndex.append(docs(50 until 60), dir, lease = Some(a))
    val filesBefore = LshIndex.dataFileCount(spark, dir)
    val rowsBefore =
      LshIndex.probe(docs(50 until 52), dir, threshold = 0.5).collect().toSet

    val b = WriterLease.acquire(spark, dir, "writer-b")
    // every mutator refuses the stale lease — and the lease-less path
    // is refused too, now that the store is fenced
    intercept[FencedWriterException](
      LshIndex.append(docs(60 until 70), dir, lease = Some(a)))
    intercept[FencedWriterException](LshIndex.append(docs(60 until 70), dir))
    intercept[FencedWriterException](LshIndex.compact(spark, dir, lease = Some(a)))
    intercept[FencedWriterException](LshIndex.compact(spark, dir))
    assert(LshIndex.dataFileCount(spark, dir) == filesBefore,
      "fenced mutations must not touch the store")
    assert(LshIndex.probe(docs(50 until 52), dir, threshold = 0.5)
      .collect().toSet == rowsBefore)

    // the new owner proceeds: append + compact under the live lease
    LshIndex.append(docs(60 until 70), dir, lease = Some(b))
    LshIndex.compact(spark, dir, lease = Some(b))
    val all = LshIndex.indexedDocs(spark, dir).collect().map(_.getString(0)).toSet
    assert(all == (0 until 70).map(i => f"doc$i%05d").toSet)
  }

  test("ANN index: append/delete/compact honor the fence") {
    import spark.implicits._
    val dir = s"${tmpDir("lease-ann")}/ann"
    val dim = 8
    val emb = (0L until 64L).map { i =>
      (i, Array.tabulate(dim)(d => math.sin(i * 31 + d).toFloat))
    }.toDF("vec_id", "embedding")
    AnnIndex.build(emb, dir, cells = 4, m = 4, ksub = 8, dim = dim, vbBuckets = 4)
    val a = WriterLease.acquire(spark, dir, "ann-a")
    AnnIndex.delete(Seq(3L).toDF("vec_id"), dir, lease = Some(a))
    val b = WriterLease.acquire(spark, dir, "ann-b")
    intercept[FencedWriterException](
      AnnIndex.append(emb.filter($"vec_id" > 100), dir, lease = Some(a)))
    intercept[FencedWriterException](
      AnnIndex.delete(Seq(4L).toDF("vec_id"), dir, lease = Some(a)))
    intercept[FencedWriterException](AnnIndex.compact(spark, dir, lease = Some(a)))
    intercept[FencedWriterException](AnnIndex.compact(spark, dir))
    AnnIndex.compact(spark, dir, lease = Some(b))
    // tombstoned id is gone, the rest still served under the new owner
    val served = AnnIndex.probe(emb.filter($"vec_id" === 0L), dir,
        k = 10, shortlist = 20, nProbe = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(!served.contains(3L) && served.nonEmpty)
  }

  test("replay with dedup.lease fences the index per run; hand-off works") {
    import spark.implicits._
    val dir = tmpDir("lease-replay")
    def ev(lsn: Long, doc: String, toks: Array[Int]): ChangeEvent =
      ChangeEvent(0, lsn, "I", doc, toks, java.lang.Long.valueOf(toks.length.toLong),
        "s0", null)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    def writeSeg(i: Int, rows: Seq[ChangeEvent]): Unit = {
      rows.toDF().coalesce(1).write.parquet(s"$dir/stage$i")
      val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/stage$i"))
        .map(_.getPath).filter(_.getName.startsWith("part-")).head
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/log"))
      fs.rename(part, new org.apache.hadoop.fs.Path(f"$dir/log/seg-$i%05d.parquet"))
    }
    writeSeg(0, Seq(ev(1, "A", (1 to 12).toArray), ev(2, "B", (20 to 33).toArray)))
    val dx = graft.model.DedupSpec(s"$dir/idx", threshold = 0.8, lease = true)
    Replay.replay(spark, s"$dir/log", s"$dir/table", s"$dir/cp1",
      nBuckets = 4, dedup = Some(dx))
    // the run fenced the index
    val e1 = WriterLease.currentEpoch(spark, s"$dir/idx")
    assert(e1.exists(_ >= 1L))
    // lease-less foreign mutation is now refused
    intercept[FencedWriterException](
      LshIndex.append(Seq(("Z", "zulu yankee xray")).toDF("doc_id", "text"), s"$dir/idx"))
    // a successor replay resumes the same checkpoint, takes over with a
    // fresh epoch, and applies the new segment
    writeSeg(1, Seq(ev(3, "C", (40 to 55).toArray)))
    Replay.replay(spark, s"$dir/log", s"$dir/table", s"$dir/cp1",
      nBuckets = 4, dedup = Some(dx))
    assert(WriterLease.currentEpoch(spark, s"$dir/idx").get > e1.get)
    val table = graft.lake.LakeTable.load(spark, s"$dir/table")
    assert(table.read().select("doc_id").collect().map(_.getString(0)).toSet ==
      Set("A", "B", "C"))
    // dedup.lease parses from job JSON
    val parsed = graft.model.JobSpec.parse(
      s"""{"reader":{"logDir":"$dir/log"},
         | "writer":{"tableDir":"$dir/table","checkpointDir":"$dir/cp3"},
         | "dedup":{"indexDir":"$dir/idx","lease":true}}""".stripMargin)
    assert(parsed.dedup.exists(_.lease))
  }
}
