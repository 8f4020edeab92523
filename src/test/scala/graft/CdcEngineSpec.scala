package graft

import graft.apply.BatchApply
import graft.gen.ChangeLogGen
import graft.lake.LakeTable
import graft.model.GenConfig
import graft.stream.Replay
import graft.verify.Oracle
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcEngineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .master("local[8]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  val cfg = GenConfig(nEvents = 20000, nDocs = 3000, nShards = 4,
    hotPerMille = 100, nHotDocs = 4, avgTokens = 16, nSegments = 8,
    evolveAtLsn = 12000)

  test("generator is deterministic and shard-sticky") {
    spark.sparkContext.setLogLevel("WARN")
    val a = ChangeLogGen.events(spark, cfg)
    val b = ChangeLogGen.events(spark, cfg)
    val ha = a.agg(bit_xor(xxhash64(struct(a.columns.map(col): _*)))).head.getLong(0)
    val hb = b.agg(bit_xor(xxhash64(struct(b.columns.map(col): _*)))).head.getLong(0)
    assert(ha == hb)
    // doc_id -> shard is a function (shard-sticky keys)
    val multiShard = a.groupBy("doc_id").agg(countDistinct("shard").as("n"))
      .filter(col("n") > 1).count()
    assert(multiShard == 0)
    // lsn dense & unique
    assert(a.select("lsn").distinct().count() == cfg.nEvents)
  }

  test("single-batch MERGE matches the sequential oracle") {
    val log = ChangeLogGen.events(spark, cfg).cache()
    val dir = tmpDir("graft-batch")
    val table = Replay.createTable(spark, s"$dir/table", nBuckets = 16)
    BatchApply.apply(table, log, batchId = 0)
    val expected = Oracle.expectedState(spark, log)
    val mismatches = Oracle.diff(expected, table.read())
    assert(mismatches.isEmpty, mismatches.mkString("; "))
    // schema evolved mid-log => lang present, n_tok widened
    val sch = table.current.schema
    assert(sch.fieldNames.contains("lang"))
    assert(sch("n_tok").dataType == org.apache.spark.sql.types.LongType)
    log.unpersist()
  }

  test("re-applying a committed batch is a no-op (idempotent MERGE)") {
    val log = ChangeLogGen.events(spark, cfg).cache()
    val dir = tmpDir("graft-idem")
    val table = Replay.createTable(spark, s"$dir/table", nBuckets = 16)
    BatchApply.apply(table, log, batchId = 0)
    val v1 = table.currentVersion
    // batch-id fence: same batchId skipped outright
    BatchApply.apply(table, log, batchId = 0)
    assert(table.currentVersion == v1)
    // per-row lsn guard: same DATA under a new batchId still converges
    BatchApply.apply(table, log, batchId = 1)
    val mismatches = Oracle.diff(Oracle.expectedState(spark, log), table.read())
    assert(mismatches.isEmpty, mismatches.mkString("; "))
    log.unpersist()
  }

  test("streaming replay (multi-batch) matches oracle; lineage + watermarks recorded") {
    val dir = tmpDir("graft-stream")
    ChangeLogGen.write(spark, cfg, s"$dir/log")
    val table = Replay.replay(spark, s"$dir/log", s"$dir/table", s"$dir/cp",
      nBuckets = 16, maxFilesPerTrigger = 2)
    val log = spark.read.schema(graft.model.ChangeLog.schema).parquet(s"$dir/log")
    val mismatches = Oracle.diff(Oracle.expectedState(spark, log), table.read())
    assert(mismatches.isEmpty, mismatches.mkString("; "))
    val snap = table.current
    assert(snap.watermarks.values.max == cfg.nEvents - 1 ||
      snap.watermarks.nonEmpty) // per-shard high watermarks advanced
    assert(snap.lineage.nonEmpty) // offset range -> snapshot lineage present
    assert(snap.batchId >= 0)
  }

  test("kill mid-replay, resume from checkpoint: no duplicates, no loss") {
    val dir = tmpDir("graft-resume")
    ChangeLogGen.write(spark, cfg, s"$dir/log")
    // crash after 2 committed batches (commit lands, checkpoint may not)
    Replay.replay(spark, s"$dir/log", s"$dir/table", s"$dir/cp",
      nBuckets = 16, maxFilesPerTrigger = 1, stopAfterBatches = 2)
    val t1 = LakeTable.load(spark, s"$dir/table")
    assert(t1.current.batchId >= 0 && t1.read().count() > 0)
    // resume: the in-flight batch is replayed with the same batchId and fenced
    val table = Replay.replay(spark, s"$dir/log", s"$dir/table", s"$dir/cp",
      nBuckets = 16, maxFilesPerTrigger = 1)
    val log = spark.read.schema(graft.model.ChangeLog.schema).parquet(s"$dir/log")
    val mismatches = Oracle.diff(Oracle.expectedState(spark, log), table.read())
    assert(mismatches.isEmpty, mismatches.mkString("; "))
  }

  test("partition checksums match between engine state and oracle") {
    val log = ChangeLogGen.events(spark, cfg.copy(nEvents = 5000)).cache()
    val dir = tmpDir("graft-cksum")
    val table = Replay.createTable(spark, s"$dir/table", nBuckets = 16)
    BatchApply.apply(table, log, batchId = 0)
    val a = Oracle.partitionChecksums(table.read(), 16).orderBy("bucket").collect()
    val b = Oracle.partitionChecksums(Oracle.expectedState(spark, log), 16).orderBy("bucket").collect()
    assert(a.sameElements(b))
    log.unpersist()
  }

  test("compaction purges tombstones without changing the visible state") {
    val log = ChangeLogGen.events(spark, cfg.copy(nEvents = 5000)).cache()
    val dir = tmpDir("graft-compact")
    val table = Replay.createTable(spark, s"$dir/table", nBuckets = 16)
    BatchApply.apply(table, log, batchId = 0)
    val before = table.read().count()
    val tombBefore = table.readPhysical().filter(col(LakeTable.DeletedCol)).count()
    assert(tombBefore > 0)
    table.compact()
    assert(table.readPhysical().filter(col(LakeTable.DeletedCol)).count() == 0)
    assert(table.read().count() == before)
    val mismatches = Oracle.diff(Oracle.expectedState(spark, log), table.read())
    assert(mismatches.isEmpty, mismatches.mkString("; "))
    log.unpersist()
  }

  test("schema evolution rejects non-additive changes") {
    val dir = tmpDir("graft-evolve")
    val table = Replay.createTable(spark, s"$dir/table", nBuckets = 4)
    val bad = org.apache.spark.sql.types.StructType(
      table.current.schema.fields.filterNot(_.name == "source"))
    intercept[IllegalArgumentException](table.evolveSchema(bad))
  }

  test("change-data feed: readChanges = canonical batch changes; fenced + replayable") {
    val log = ChangeLogGen.events(spark, cfg).cache()
    val dir = tmpDir("graft-cdf")
    val table = Replay.createTable(spark, s"$dir/table", nBuckets = 16)
    val mid = cfg.nEvents / 2
    val b1 = log.filter(col("lsn") <= mid)
    val b2 = log.filter(col("lsn") > mid)
    BatchApply.apply(table, b1, batchId = 0, changelog = true)
    BatchApply.apply(table, b2, batchId = 1, changelog = true)

    // incremental read of batch 1 == its canonical last-wins changes
    val feed1 = table.readChanges(sinceBatchId = 0)
    assert(feed1.select("batch_id").distinct().collect().map(_.getInt(0)).toSeq == Seq(1))
    val expect = BatchApply.canonicalize(b2).select("doc_id", "lsn", "op")
    assert(feed1.count() == expect.count())
    assert(feed1.select("doc_id", "lsn", "op").exceptAll(expect).count() == 0)

    // a fenced retry of the committed batch does NOT rewrite an
    // existing feed partition (mtime unchanged)
    val part = new org.apache.hadoop.fs.Path(
      s"$dir/table/${LakeTable.ChangelogDir}/batch_id=1")
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stamp = fs.listStatus(part).map(_.getModificationTime).max
    val before = stamp
    BatchApply.apply(table, b2, batchId = 1, changelog = true)
    assert(stamp == before)

    // crash window heal: the feed is STAGED before the commit and
    // PUBLISHED (atomic rename) after it. Simulate "commit landed,
    // publish didn't" by un-publishing the partition back to its
    // staged name; the fenced retry re-runs the rename — a metadata
    // op over the exact content the committed run staged.
    val staged = new org.apache.hadoop.fs.Path(
      BatchApply.stagedChangelog(table, 1))
    assert(fs.rename(part, staged))
    assert(table.readChanges(sinceBatchId = 0).count() == 0) // staged dir invisible
    BatchApply.apply(table, b2, batchId = 1, changelog = true)
    assert(fs.exists(part) && !fs.exists(staged))
    val refilled = table.readChanges(sinceBatchId = 0)
    assert(refilled.count() == expect.count())
    assert(refilled.select("doc_id", "lsn", "op").exceptAll(expect).count() == 0)

    // an uncommitted feed partition (crash between feed write and
    // snapshot commit) is invisible: upper fence batch_id <= snapshot's
    b2.limit(10)
      .select(col("doc_id"), col("op"), col("lsn"), col("tokens"), col("n_tok"),
        col("source"), col("lang"), col("shard"))
      .write.parquet(s"$dir/table/${LakeTable.ChangelogDir}/batch_id=7")
    assert(table.readChanges(sinceBatchId = -1)
      .filter(col("batch_id") === 7).count() == 0)

    // replaying the full feed into a second table reproduces the state
    // (the feed is a complete, canonical change stream)
    val t2 = Replay.createTable(spark, s"$dir/table2", nBuckets = 8)
    BatchApply.apply(t2, table.readChanges(sinceBatchId = -1).drop("batch_id"), batchId = 0)
    val a = table.read()
    val b = t2.read()
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)

    // feed retention: vacuum expires partitions past the window
    // (cutoff = current.batchId - retain), keeps the recent ones
    table.vacuum(retainLast = 1, changelogRetainBatches = 1)
    val clDir = new org.apache.hadoop.fs.Path(s"$dir/table/${LakeTable.ChangelogDir}")
    val names = fs.listStatus(clDir).map(_.getPath.getName).toSet
    assert(!names.contains("batch_id=0") && names.contains("batch_id=1"))
    assert(table.readChanges(sinceBatchId = 0).count() == expect.count())
    log.unpersist()
  }

  test("vacuum heals (never deletes) a committed-but-unpublished staged feed partition") {
    val log = ChangeLogGen.events(spark, cfg.copy(nEvents = 3000)).cache()
    val dir = tmpDir("graft-vacheal")
    val table = Replay.createTable(spark, s"$dir/table", nBuckets = 8)
    val b1 = log.filter(col("lsn") <= 1500)
    val b2 = log.filter(col("lsn") > 1500)
    BatchApply.apply(table, b1, batchId = 0, changelog = true)
    BatchApply.apply(table, b2, batchId = 1, changelog = true)
    val expect = table.readChanges(sinceBatchId = 0).select("doc_id", "lsn", "op")
      .collect().toSet
    // simulate the commit-landed/publish-missing crash window on the
    // CURRENT batch: un-publish batch 1 back to its staged name
    val part = new org.apache.hadoop.fs.Path(
      s"$dir/table/${LakeTable.ChangelogDir}/batch_id=1")
    val staged = new org.apache.hadoop.fs.Path(BatchApply.stagedChangelog(table, 1))
    val fs = part.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(part, staged))
    // vacuum with retention BEFORE any fenced retry ran: the staged dir
    // is the only copy of batch 1's changes — it must be PUBLISHED, not
    // deleted (deleting would leave a permanent hole in the feed)
    table.vacuum(retainLast = 1, changelogRetainBatches = 10)
    assert(fs.exists(part) && !fs.exists(staged))
    assert(table.readChanges(sinceBatchId = 0).select("doc_id", "lsn", "op")
      .collect().toSet == expect)
    // a staged dir whose FINAL partition exists is debris: deleted
    val junk = new org.apache.hadoop.fs.Path(BatchApply.stagedChangelog(table, 1))
    fs.mkdirs(junk)
    table.vacuum(retainLast = 1, changelogRetainBatches = 10)
    assert(fs.exists(part) && !fs.exists(junk))
    // a staged dir past the retention cutoff is expired with its batch
    // (cutoff = applied(1) - 1 = 0: batch 0 expires, batch 1 stays)
    val old = new org.apache.hadoop.fs.Path(BatchApply.stagedChangelog(table, 0))
    fs.mkdirs(old)
    table.vacuum(retainLast = 1, changelogRetainBatches = 1)
    assert(!fs.exists(old) && fs.exists(part))
    log.unpersist()
  }

  test("feed compaction: identical rows, one ranged store, retention stays row-exact") {
    val log = ChangeLogGen.events(spark, cfg.copy(nEvents = 5000)).cache()
    val dir = tmpDir("graft-feedcompact")
    val table = Replay.createTable(spark, s"$dir/table", nBuckets = 8)
    (0 until 4).foreach { b =>
      BatchApply.apply(table,
        log.filter(col("lsn") > b * 1000 && col("lsn") <= (b + 1) * 1000),
        batchId = b, changelog = true)
    }
    def feed(since: Long): Set[(String, String, Long, Int)] =
      table.readChanges(since).select(col("doc_id").cast("string"), col("op"),
        col("lsn"), col("batch_id").cast("int"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    val clDir = new org.apache.hadoop.fs.Path(s"$dir/table/${LakeTable.ChangelogDir}")
    val fs = clDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dirNames() = fs.listStatus(clDir).map(_.getPath.getName).toSet
    val before = feed(-1)
    val beforeSince = feed(1)
    table.compactChangelog(retainRecent = 1)
    // batches 0..2 compacted into ONE ranged store; batch 3 (live tail)
    // stays a per-batch partition; a tailer sees identical rows, and
    // since-filters still prune correctly through the ranged store
    assert(dirNames().count(_.startsWith("batch_id=")) == 1)
    assert(dirNames().count(_.startsWith(LakeTable.RangedFeedPrefix)) == 1)
    assert(feed(-1) == before)
    assert(feed(1) == beforeSince)
    // a second run with nothing new eligible is a no-op
    val snap1 = dirNames()
    table.compactChangelog(retainRecent = 1)
    assert(dirNames() == snap1)
    // more batches, compact again: the prior ranged store is subsumed —
    // still exactly one ranged store, rows still identical
    BatchApply.apply(table, log.filter(col("lsn") > 4000), batchId = 4, changelog = true)
    val before5 = feed(-1)
    table.compactChangelog(retainRecent = 1)
    assert(dirNames().count(_.startsWith(LakeTable.RangedFeedPrefix)) == 1)
    assert(feed(-1) == before5)
    // retention cutoff INSIDE the ranged store: vacuum rewrites it
    // row-exactly (batches <= applied-2 = 2 expire, 3..4 remain)
    table.vacuum(retainLast = 1, changelogRetainBatches = 2)
    assert(feed(-1) == before5.filter(_._4 > 2))
    // stream-tailing a compacted feed still works end-to-end
    val down = Replay.createTable(spark, s"$dir/down", nBuckets = 8)
    BatchApply.apply(down, table.readChanges(2).drop("batch_id"), batchId = 0)
    assert(down.read().count() > 0)
    log.unpersist()
  }

  test("readChanges on a feed with no published partition yet returns an empty typed frame") {
    val dir = tmpDir("graft-emptyfeed")
    val table = Replay.createTable(spark, s"$dir/table", nBuckets = 4)
    val clDir = new org.apache.hadoop.fs.Path(s"$dir/table/${LakeTable.ChangelogDir}")
    val fs = clDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash-after-staging-before-first-commit: only a dot-dir exists
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$clDir/.staged-batch_id=0"))
    val feed = table.readChanges()
    assert(feed.schema == LakeTable.changeFeedSchema)
    assert(feed.count() == 0)
  }

  test("feed-replay equivalence: any batch partitioning reconstructs the table from its feed") {
    // the change feed is a COMPLETE canonical change stream: however
    // the replay happened to be micro-batched, replaying the feed into
    // a fresh table (even with a different bucket count) reproduces
    // the exact state — 3 seeded random batch partitionings
    val n = 4000L
    val log = ChangeLogGen.events(spark, cfg.copy(nEvents = n)).cache()
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val cuts = (Seq(0L, n) ++ Seq.fill(3)(rnd.nextInt(n.toInt).toLong)).distinct.sorted
      val dir = tmpDir(s"graft-feedprop-$seed")
      val t1 = Replay.createTable(spark, s"$dir/t1", nBuckets = 8)
      cuts.sliding(2).zipWithIndex.foreach {
        case (Seq(lo, hi), i) =>
          BatchApply.apply(t1, log.filter(col("lsn") > lo && col("lsn") <= hi),
            batchId = i, changelog = true)
        case _ => ()
      }
      val t2 = Replay.createTable(spark, s"$dir/t2", nBuckets = 4)
      BatchApply.apply(t2, t1.readChanges(sinceBatchId = -1).drop("batch_id"), batchId = 0)
      val (x, y) = (t1.read(), t2.read())
      assert(x.count() == y.count(), s"seed $seed row count")
      assert(x.exceptAll(y).count() == 0 && y.exceptAll(x).count() == 0, s"seed $seed state")
    }
    log.unpersist()
  }

  test("pipeline chaining: a downstream table STREAM-tails the upstream's change feed") {
    // CDC out -> CDC in with ZERO new machinery: the feed rows carry the
    // ChangeLog schema, so the ordinary Replay file source points at
    // `<tableA>/changelog` exactly as it points at a binlog directory —
    // the otsstreamreader composability story (a job tailing another
    // job's output table)
    val dir = tmpDir("graft-chain")
    val small = cfg.copy(nEvents = 6000, nSegments = 4)
    ChangeLogGen.write(spark, small, s"$dir/log")
    val a = Replay.replay(spark, s"$dir/log", s"$dir/ta", s"$dir/cpa",
      nBuckets = 8, maxFilesPerTrigger = 1, changelog = true)
    val b = Replay.replay(spark, s"$dir/ta/${LakeTable.ChangelogDir}", s"$dir/tb", s"$dir/cpb",
      nBuckets = 8, maxFilesPerTrigger = 2)
    val x = a.read()
    val y = b.read()
    assert(x.count() > 0 && x.count() == y.count())
    assert(x.exceptAll(y).count() == 0 && y.exceptAll(x).count() == 0)
  }
}
