package graft.lake

import graft.apply.BatchApply
import graft.gen.ChangeLogGen
import graft.model.GenConfig
import graft.stream.Replay
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The lake table's concurrent-commit safety (the complement of the
  * index stores' [[WriterLease]] epoch fence): two writers over one
  * table must never silently interleave — the loser fails LOUDLY on
  * one of the commit CAS's two arms, and the table stays serviceable. */
class CommitCasSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .master("local[8]")
    .appName("graft-cas")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("concurrent commit loses loudly on both CAS arms; table stays serviceable") {
    val root = s"${tmpDir("graft-cas")}/t"
    val a = Replay.createTable(spark, root, nBuckets = 4)
    ChangeLogGen.write(spark, GenConfig(nEvents = 500, nDocs = 100, nShards = 2,
      nSegments = 1, evolveAtLsn = Long.MaxValue), s"${root}-log")
    BatchApply.apply(a, spark.read.parquet(s"${root}-log"), batchId = 0)

    // two handles over one table — the two-replays-one-table scenario
    val b = LakeTable.load(spark, root)
    val v = a.currentVersion
    // arm 1: the stale-expectedVersion check. A commits v+1; B, still
    // expecting v, must fail loudly instead of forking history
    a.commit(Nil, Set.empty, batchId = 1, Map.empty, Nil, v)
    val e1 = intercept[IllegalStateException](
      b.commit(Nil, Set.empty, batchId = 2, Map.empty, Nil, v))
    assert(e1.getMessage.contains("concurrent commit"))

    // arm 2: the rename race INSIDE the check window. Both handles pass
    // the version check concurrently; the descriptor's create-exclusive
    // rename makes exactly one win — simulate the loser by planting the
    // target descriptor (the winner's rename) and driving writeSnapshot
    // directly: it must refuse (false), never clobber
    val v2 = a.currentVersion
    val cur = a.snapshotAt(v2)
    val next = new org.apache.hadoop.fs.Path(root, f"snapshots/v${v2 + 1}%08d.json")
    val fs = next.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(next, false)
    out.write("PLANTED".getBytes("UTF-8")); out.close()
    val won = a.writeSnapshot(cur.copy(version = v2 + 1, parent = v2))
    assert(!won, "writeSnapshot must lose the rename race, not clobber")
    val in = fs.open(next)
    val kept = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    assert(kept == "PLANTED", "the racing winner's descriptor must survive intact")
    fs.delete(next, false)

    // both refusals left a consistent, serviceable table
    val reloaded = LakeTable.load(spark, root)
    assert(reloaded.currentVersion == v2)
    assert(reloaded.read().count() > 0)
  }
}
