package graft

import graft.apply.BatchApply
import graft.functions.TableExpand
import graft.gen.ChangeLogGen
import graft.lake.LakeTable
import graft.model.GenConfig
import graft.stream.Replay
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Commit-protocol robustness + source-format parity tests. */
class RobustnessSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .master("local[8]")
    .appName("graft-robustness")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("concurrent snapshot commit: the rename-race loser fails, state stays consistent") {
    spark.sparkContext.setLogLevel("WARN")
    val dir = tmpDir("graft-race")
    val table = Replay.createTable(spark, s"$dir/t", nBuckets = 8)
    val log = ChangeLogGen.events(spark, GenConfig(nEvents = 2000, nDocs = 400, nShards = 2))
    val snap = BatchApply.apply(table, log, batchId = 0)
    // a second writer that thinks it's at the same expected version must
    // lose: either the pre-check or the descriptor rename race
    intercept[IllegalStateException] {
      table.commit(Nil, Set.empty, batchId = 99, Map.empty, Nil,
        expectedVersion = snap.version - 1)
    }
    assert(table.current.batchId == 0) // winner's state intact
  }

  test("crash debris: orphan tmp + unreferenced data files are invisible and vacuumable") {
    val dir = tmpDir("graft-debris")
    val table = Replay.createTable(spark, s"$dir/t", nBuckets = 8)
    val log = ChangeLogGen.events(spark, GenConfig(nEvents = 2000, nDocs = 400, nShards = 2))
    BatchApply.apply(table, log, batchId = 0)
    val before = table.read().count()
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    // simulate a crash mid-commit: stray snapshot tmp + orphan data file
    val strayTmp = new Path(s"$dir/t/snapshots/.tmp-crashed")
    val o1 = fs.create(strayTmp, true); o1.write("{}".getBytes); o1.close()
    val orphan = new Path(s"$dir/t/data/bucket=0/orphan-not-committed.parquet")
    val o2 = fs.create(orphan, true); o2.write(Array[Byte](1, 2, 3)); o2.close()
    // readers see only committed state (orphan never referenced)
    assert(table.read().count() == before)
    assert(table.currentVersion == 1)
    // vacuum removes the orphan data file
    table.vacuum()
    assert(!fs.exists(orphan))
    assert(table.read().count() == before)
  }

  test("hdfsreader parity: ORC round-trip matches the parquet source") {
    val dir = tmpDir("graft-orc")
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").orc(s"$dir/events_orc")
    val orc = spark.read.orc(s"$dir/events_orc")
    val a = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("user_id").as("su")).orderBy("event_type").collect()
    val b = orc.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("user_id").as("su")).orderBy("event_type").collect()
    assert(a.sameElements(b))
  }

  test("bucket-count evolution: rebucket preserves state; later batches use the new count") {
    val dir = tmpDir("graft-rebucket")
    val table = Replay.createTable(spark, s"$dir/t", nBuckets = 8)
    val cfg = GenConfig(nEvents = 4000, nDocs = 800, nShards = 4)
    val log = ChangeLogGen.events(spark, cfg)
    BatchApply.apply(table, log, batchId = 0)
    val before = table.read().orderBy("doc_id").collect()

    val snap = table.rebucket(32)
    assert(snap.nBuckets == 32 && table.current.nBuckets == 32)
    assert(table.current.files.forall(f => f.bucket >= 0 && f.bucket < 32))
    val after = table.read().orderBy("doc_id").collect()
    assert(before.sameElements(after), "visible state changed across rebucket")

    // a batch applied AFTER the rebucket must land in the new layout and
    // stay oracle-correct over the whole log
    val more = ChangeLogGen.events(spark, cfg.copy(nEvents = 6000), lo = 4000, hi = 6000)
    BatchApply.apply(table, more, batchId = 1)
    val full = ChangeLogGen.events(spark, cfg.copy(nEvents = 6000))
    val mism = graft.verify.Oracle.diff(
      graft.verify.Oracle.expectedState(spark, full), table.read())
    assert(mism.isEmpty, mism.mkString("; "))
    assert(table.current.files.forall(f => f.bucket >= 0 && f.bucket < 32))

    // maintenance still works on the new layout
    table.vacuum()
    table.compact()
    val mism2 = graft.verify.Oracle.diff(
      graft.verify.Oracle.expectedState(spark, full), table.read())
    assert(mism2.isEmpty, mism2.mkString("; "))
  }

  test("divisible rebucket is shuffle-free; non-divisible falls back to a repartition") {
    // bucket = pmod(hash(doc_id), n): when oldN | newN (or newN | oldN)
    // the rescale is a pure refinement/coarsening — every scan task
    // already holds complete rows of the new buckets it writes, so the
    // rewrite must execute with ZERO shuffle-written records. At 10^10
    // scale this is "rescale = one pass", not "shuffle the table".
    val dir = tmpDir("graft-rebucket-sf")
    val table = Replay.createTable(spark, s"$dir/t", nBuckets = 4)
    val log = ChangeLogGen.events(spark, GenConfig(nEvents = 3000, nDocs = 600, nShards = 4))
    BatchApply.apply(table, log, batchId = 0)
    val before = table.read().orderBy("doc_id").collect()

    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong
    val lastEvent = new java.util.concurrent.atomic.AtomicLong(System.nanoTime)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        lastEvent.set(System.nanoTime)
      }
    }
    // the listener bus is async: after the action returns, wait for the
    // event stream to go quiet before reading the counter
    def drainAndRead(): Long = {
      val deadline = System.nanoTime + 15L * 1000 * 1000 * 1000
      while (System.nanoTime - lastEvent.get < 500L * 1000 * 1000 &&
             System.nanoTime < deadline) Thread.sleep(50)
      shuffleRecords.get
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // the read-back checks below shuffle too (orderBy): always drain
      // the bus and reset the counter BETWEEN a check and the next
      // measured rebucket
      def checkStateAndReset(): Unit = {
        assert(table.read().orderBy("doc_id").collect().sameElements(before))
        drainAndRead(); shuffleRecords.set(0)
      }

      // doubling (4 -> 16): refinement, no exchange anywhere in the job
      table.rebucket(16)
      val doubled = drainAndRead()
      assert(doubled == 0L, s"divisible rebucket shuffled $doubled records")
      checkStateAndReset()

      // coarsening (16 -> 8): each old bucket maps wholly into one new
      // bucket — still shuffle-free
      table.rebucket(8)
      val halved = drainAndRead()
      assert(halved == 0L, s"coarsening rebucket shuffled $halved records")
      checkStateAndReset()

      // non-divisible control (8 -> 6): the fallback repartition keeps
      // file count ~newN and MUST shuffle — proves the listener measures
      table.rebucket(6)
      val control = drainAndRead()
      assert(control > 0L, "non-divisible rebucket should repartition")
      assert(table.read().orderBy("doc_id").collect().sameElements(before))
      assert(table.current.nBuckets == 6)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("point lookup scans only the keys' buckets and matches the full read") {
    // readKeys = manifest bucket pruning + a typed pushed IN filter:
    // fetching k keys must read files of at most k buckets, never the
    // table. Asserted on df.inputFiles (the actual scanned file set).
    val dir = tmpDir("graft-pointlookup")
    val table = Replay.createTable(spark, s"$dir/t", nBuckets = 64)
    val log = ChangeLogGen.events(spark, GenConfig(nEvents = 6000, nDocs = 2000, nShards = 4))
    BatchApply.apply(table, log, batchId = 0)
    val keys = table.read().select("doc_id").orderBy("doc_id").limit(3)
      .collect().map(_.getString(0)).toSeq
    val df = table.readKeys(keys)

    val expect = table.read().filter(col("doc_id").isin(keys: _*))
      .orderBy("doc_id").collect()
    assert(expect.length == 3)
    assert(df.orderBy("doc_id").collect().sameElements(expect))

    import spark.implicits._
    val wantBuckets = keys.toDF("doc_id")
      .select(LakeTable.bucketExpr(col("doc_id"), table.current.nBuckets))
      .collect().map(_.getInt(0)).toSet
    def bucketOf(path: String): Int =
      path.split('/').find(_.startsWith("bucket=")).get.stripPrefix("bucket=").toInt
    val scanned = df.inputFiles.map(bucketOf).toSet
    assert(scanned.nonEmpty && scanned.subsetOf(wantBuckets),
      s"scanned buckets $scanned not within $wantBuckets")
    // and it genuinely pruned: the table holds many more buckets' files
    val allBuckets = table.current.files.map(_.bucket).toSet
    assert(allBuckets.size > wantBuckets.size)

    // a key written as the WRONG TYPE must still hash to the right
    // bucket (readKeys casts to the table's key type first): an Int for
    // a numeric-string key would silently miss without the cast — here
    // the key type is string, so pass one key as a raw Any
    val mixed = table.readKeys(Seq[Any](keys.head)).orderBy("doc_id").collect()
    assert(mixed.sameElements(expect.take(1)))
  }

  test("readUpdatedSince zone-map-prunes cold buckets and matches the unpruned filter") {
    // incremental state export: per-file (minLsn, maxLsn) manifest stats
    // bound each bucket's _lsn domain, so buckets untouched since the
    // threshold are skipped without touching storage (asserted on
    // df.inputFiles); hot buckets resolve last-wins in full.
    val dir = tmpDir("graft-updsince")
    val table = Replay.createTable(spark, s"$dir/t", nBuckets = 32)
    val cfg = GenConfig(nEvents = 6000, nDocs = 2000, nShards = 4)
    BatchApply.apply(table, ChangeLogGen.events(spark, cfg, 0, 5000), batchId = 0)
    // batch 1: a narrow slice of keys (few buckets touched)
    BatchApply.apply(table,
      ChangeLogGen.events(spark, cfg, 5000, 6000)
        .filter(pmod(xxhash64(col("doc_id")), lit(50)) === 0),
      batchId = 1)
    val since = 5000L

    val got = table.readUpdatedSince(since)
    val expect = table.readResolved(None, None)
      .filter(col(LakeTable.LsnCol) >= since && !col(LakeTable.DeletedCol))
      .withColumnRenamed(LakeTable.LsnCol, "last_lsn").drop(LakeTable.DeletedCol)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    assert(got.count() > 0)
    // every returned row's watermark respects the threshold
    assert(got.filter(col("last_lsn") < since).count() == 0)

    // pruning: only buckets holding a file with maxLsn >= since are read
    val hot = table.current.files.filter(_.maxLsn >= since).map(_.bucket).toSet
    val all = table.current.files.map(_.bucket).toSet
    assert(hot.size < all.size, s"fixture defect: batch 1 touched all ${all.size} buckets")
    def bucketOf(path: String): Int =
      path.split('/').find(_.startsWith("bucket=")).get.stripPrefix("bucket=").toInt
    val scanned = got.inputFiles.map(bucketOf).toSet
    assert(scanned.nonEmpty && scanned.subsetOf(hot),
      s"scanned buckets $scanned not within hot set $hot")

    // checkpoint contract: exporting from (prevMax + 1) yields nothing new
    val prevMax = got.agg(max(col("last_lsn"))).head().getLong(0)
    assert(table.readUpdatedSince(prevMax + 1).count() == 0)
  }

  test("compressed CSV reads (full codec family) match the uncompressed source") {
    // UnstructuredStorageReaderUtil.java:117-160 decompresses zip, gzip,
    // bzip2, lzo, lzo_deflate, hadoop-snappy and framing-snappy streams.
    // Spark's CSV reader decodes by file extension through the Hadoop
    // codec registry; this sandbox's jars cover gzip, bzip2, deflate,
    // snappy (Hadoop block format — the reference's "hadoop-snappy")
    // and lz4. NOT covered and documented as such: zstd for TEXT
    // formats (this container's Hadoop build lists it unavailable —
    // parquet zstd is a separate, parquet-native path and works; the
    // reference never supported zstd at all), zip (no Hadoop codec;
    // the reference unpacks it in-process — a Spark user pre-extracts
    // or uses binaryFile + an archive lib) and lzo/lzo_deflate (GPL
    // codec, never bundled with Spark). Same aggregate must come back
    // from every codec.
    val dir = tmpDir("graft-csv-codec")
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("event_id", "user_id", "event_type")
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("user_id").as("su"), max("event_id").as("mx"))
        .orderBy("event_type").collect()
    val expected = agg(events)
    val exts = Map("gzip" -> ".gz", "bzip2" -> ".bz2", "deflate" -> ".deflate",
      "snappy" -> ".snappy", "lz4" -> ".lz4")
    for ((codec, ext) <- exts) {
      events.write.mode("overwrite").option("header", "true")
        .option("compression", codec).csv(s"$dir/$codec")
      val fs = new java.io.File(s"$dir/$codec").listFiles()
      assert(fs.exists(_.getName.endsWith(s".csv$ext")), s"no $ext files written")
      val back = spark.read.option("header", "true")
        .schema("event_id LONG, user_id LONG, event_type STRING")
        .csv(s"$dir/$codec")
      assert(agg(back).sameElements(expected), s"codec $codec round-trip mismatch")
    }
  }

  test("sharded-table expansion (TableExpandUtil parity)") {
    assert(TableExpand.expand("db.tab[0-3]_x") ==
      Seq("db.tab0_x", "db.tab1_x", "db.tab2_x", "db.tab3_x"))
    assert(TableExpand.expand("plain_table") == Seq("plain_table"))
    assert(TableExpand.expandAll("a[1-2], b") == Seq("a1", "a2", "b"))
  }

  test("preSql/postSql parse from the job spec") {
    val spec = graft.model.JobSpec.parse(
      """{"reader": {"logDir": "/x"},
        | "writer": {"tableDir": "/y", "checkpointDir": "/z",
        |   "preSql": ["SELECT 1"], "postSql": ["SELECT 2", "SELECT 3"]}}""".stripMargin)
    assert(spec.preSql == Seq("SELECT 1"))
    assert(spec.postSql == Seq("SELECT 2", "SELECT 3"))
  }
}
