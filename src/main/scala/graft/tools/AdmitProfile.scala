package graft.operators

import graft.gen.ChangeLogGen
import graft.model.GenConfig
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (not shipped): per-stage timing of LSH dedup admission
  * at the bench's per-batch size. */
object AdmitProfile {
  def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"STAGE $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("/dev/shm"), "graft-admit-prof").toString
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-admit-profile")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = GenConfig(nEvents = 250000L, nDocs = 250000L, nShards = 32,
      avgTokens = 32, nSegments = 1, hotPerMille = 0, evolveAtLsn = Long.MaxValue)
    val b1 = ChangeLogGen.events(spark, cfg, 0, 250000L).cache(); b1.count()
    val b2 = ChangeLogGen.events(spark, cfg.copy(), 250000L, 500000L).cache(); b2.count()
    val idx = s"$work/index"

    def docsOf(b: org.apache.spark.sql.DataFrame) = b
      .filter(col("op") =!= "D" && col("tokens").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tokens")).as("text"))
      .dropDuplicates("doc_id")

    // batch 1: build, decomposed (mirrors buildFromStaged)
    val d1 = docsOf(b1)
    locally {
      val m = LshIndex.Meta(3, 16, 4, 32, 64)
      val staged = time("build.stage")({
        val h = Mat.materializeIterReleasable(Dedup.sigAndGrams(d1.dropDuplicates("doc_id"), 3, 16))
        h.df.count(); h
      })
      time("build.grams-write")(
        staged.df.select(col("doc_id"), col("grams"))
          .withColumn("gb", pmod(hash(col("doc_id")), lit(64)))
          .repartition(col("gb")).sortWithinPartitions("doc_id")
          .write.partitionBy("gb").parquet(s"$idx-x/grams"))
      time("grams-write-sorted-gb")(
        staged.df.select(col("doc_id"), col("grams"))
          .withColumn("gb", pmod(hash(col("doc_id")), lit(64)))
          .repartition(col("gb")).sortWithinPartitions("gb", "doc_id")
          .write.partitionBy("gb").parquet(s"$idx-x2/grams"))
      time("grams-write-hashed")(
        staged.df.select(col("doc_id"),
            transform(col("grams"), g => xxhash64(g)).as("grams"))
          .withColumn("gb", pmod(hash(col("doc_id")), lit(64)))
          .repartition(col("gb")).sortWithinPartitions("gb", "doc_id")
          .write.partitionBy("gb").parquet(s"$idx-x3/grams"))
      time("grams-write-hashed-flat")(
        staged.df.select(col("doc_id"),
            transform(col("grams"), g => xxhash64(g)).as("grams"))
          .withColumn("gb", pmod(hash(col("doc_id")), lit(64)))
          .coalesce(8)
          .write.parquet(s"$idx-x4/grams"))
      staged.release()
      Seq("-x", "-x2", "-x3", "-x4").foreach(sfx =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$idx$sfx")))
      time("batch1-build")(LshIndex.build(d1, idx, n = 3, k = 16, bands = 4))
    }

    // batch 2: probe decomposed
    val d2 = docsOf(b2)
    locally {
      val probed = time("probe.plan+stage") {
        val p = LshIndex.probeStaged(d2, idx, 0.8, 1000)
        p.staged.df.count(); p
      }
      time("probe.pairs-collect")(probed.pairs.limit(8193).collect())
      time("probe.pairs-collect-again")(probed.pairs.limit(8193).collect())
      probed.release()
    }
    // decompose the probe internals over the same staged frame
    // (format v2: grams staged as sorted 60-bit hashes)
    locally {
      val st = time("d2.stage") {
        val h = Mat.materializeIterReleasable(
          d2.select(col("doc_id"),
            call_function("graft_sig_hgrams", col("text"), lit(3), lit(16)).as("sg"))
            .select(col("doc_id"), col("sg.sig").as("sig"), col("sg.hgrams").as("grams"))
            .repartition(col("doc_id")))
        h.df.count(); h
      }
      val m = LshIndex.Meta(3, 16, 4, 32, 64)
      val probeBands = st.df.select(col("doc_id"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band_idx"), xxhash64(slice(col("sig"), b * 4 + 1, 4)).as("band_key"))
        }: _*)).as("band"))
        .select(col("doc_id"), col("band.band_idx"), col("band.band_key"))
      val occ = spark.read.parquet(s"$idx/occ")
      time("occ.agg+filter")(occ.groupBy(col("band_idx"), col("band_key"))
        .agg(sum(col("cnt")).as("n")).filter(col("n") > 1000).count())
      val capped = probeBands // no over-cap keys in this synthetic corpus
      val probeB = broadcast(capped.withColumn("kb", pmod(hash(col("band_key")), lit(32))))
      val cand = probeB.as("a")
        .join(spark.read.parquet(s"$idx/bands").as("b"),
          col("a.band_idx") === col("b.band_idx") && col("a.kb") === col("b.kb") &&
            col("a.band_key") === col("b.band_key"))
        .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("dup_of"))
      time("cand.join+distinct")(cand.distinct().count())
      val candG = broadcast(cand.distinct()
        .withColumn("gb", pmod(hash(col("dup_of")), lit(64))).as("c")
        .join(st.df.as("ga"), col("c.doc_id") === col("ga.doc_id"))
        .select(col("c.doc_id").as("doc_id"), col("c.dup_of").as("dup_of"),
          col("c.gb").as("gb"), col("ga.grams").as("grams_a")))
      time("verify.join+jaccard")(candG.as("cg")
        .join(spark.read.parquet(s"$idx/grams").as("gi"),
          col("cg.gb") === col("gi.gb") && col("cg.dup_of") === col("gi.doc_id"))
        .withColumn("j", round(call_function("graft_jaccard_sorted",
          col("cg.grams_a"), col("gi.grams")), 6))
        .filter(col("j") >= 0.8).count())
      st.release()
      val _ = m
    }

    val canonical2 = graft.apply.BatchApply.canonicalize(b2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    canonical2.count()
    val a = time("batch2-admit(probe+collect+audit)")(
      LshIndex.admitCanonical(canonical2, idx, threshold = 0.8,
        maxBucketSize = 1000, batchId = 1, n = 3, k = 16))
    println(s"dropped=${a.droppedDocs}")
    time("batch2-indexAdmitted(append)")(
      LshIndex.indexAdmitted(a, idx, n = 3, k = 16, bands = 4))
    a.release()

    // decompose: how long is staging alone? (fresh, no reuse)
    val staged = time("staging-only(sigAndGrams materialize)") {
      val h = Mat.materializeIterReleasable(
        Dedup.sigAndGrams(d2, 3, 16, shuffled = false))
      h.df.count(); h
    }
    staged.release()
    val _ = d1
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
