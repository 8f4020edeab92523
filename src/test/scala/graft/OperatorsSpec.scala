package graft

import graft.functions.Portable
import graft.operators.{AnnIndex, Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the training-data operators (dedup / similarity /
  * text analysis / multimodal plumbing) over the driver's read-only
  * sf0.001 fixture tables. Value-level parity with DuckDB is
  * covered by the driver's oracle (SparkEntry.oracleSql); these tests
  * pin semantic invariants. */
class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-operators-test")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val dataDir = "/root/testdata/sf0.001"
  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
  private def docs: DataFrame = spark.read.parquet(s"$dataDir/documents.parquet")
  private def emb: DataFrame = spark.read.parquet(s"$dataDir/embeddings.parquet")

  test("portable hash32 matches the JVM-side derivation") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "Zürich")
    val got = inputs.toDF("s").select(Portable.hash32(col("s"))).as[Long].collect()
    val exp = inputs.map { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.take(8).foldLeft(0L)((a, c) => a * 16 + Character.digit(c, 16))
    }
    assert(got.toSeq == exp)
  }

  test("minhash LSH finds the planted near-duplicates and nothing below threshold") {
    val pairs = Dedup.minhashLshPairs(docs, n = 3, k = 12, bands = 4, threshold = 0.5).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getDouble(2) >= 0.5))
    // symmetric canonical order
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("incremental near-dup: only incoming-vs-existing pairs, consistent with the self-join") {
    val incoming = col("doc_id") % 5 === 0
    val inc = Dedup.incrementalNearDup(docs, incoming, n = 3, k = 12, bands = 4,
      threshold = 0.5).collect()
    assert(inc.forall(r => r.getLong(0) % 5 == 0 && r.getLong(1) % 5 != 0),
      "pair with a non-incoming doc_id or an incoming dup_of")
    // every incremental pair is also found by the full self-join (same
    // bands, same cap over the same occupancy), as an unordered pair
    val full = Dedup.minhashLshPairs(docs, n = 3, k = 12, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc.forall { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      full.contains((math.min(a, b), math.max(a, b)))
    })
  }

  test("sequence packing: token-conserving, per-source, overflow-to-next policy") {
    val seqLen = 256
    val manifest = TextAnalysis.packSequences(docs, seqLen).collect()
    val totalFromPacks = manifest.map(_.getLong(3)).sum
    val docsFromPacks = manifest.map(_.getLong(2)).sum
    val nTok = docs.select(sum(size(regexp_extract_all(col("text"),
      lit(TextAnalysis.BpePattern), lit(0))).cast("long"))).head.getLong(0)
    assert(totalFromPacks == nTok, "packing must conserve tokens")
    assert(docsFromPacks == docs.count(), "packing must conserve documents")
    // every source starts at pack 0, and (source, pack_id) is unique
    val bySource = manifest.groupBy(_.getString(0))
    assert(bySource.values.forall(_.exists(_.getLong(1) == 0L)))
    assert(manifest.map(r => (r.getString(0), r.getLong(1))).distinct.length == manifest.length)
  }

  test("vocab top-k: k-bounded, count-descending, counts exact") {
    val top = TextAnalysis.vocabTopK(docs, k = 10).collect()
    assert(top.length <= 10)
    assert(top.map(_.getLong(1)).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // spot-check the head count against a direct aggregation
    val head = top.head
    val direct = docs.select(explode(regexp_extract_all(lower(col("text")),
      lit(TextAnalysis.BpePattern), lit(0))).as("t"))
      .filter(col("t") === head.getString(0)).count()
    assert(direct == head.getLong(1))
    // the plan must be a bounded top-k, not a global sort
    val plan = TextAnalysis.vocabTopK(docs, k = 10).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("LSH index: probe matches the single-frame incremental variant; append extends it") {
    import graft.operators.LshIndex
    val path = java.nio.file.Files.createTempDirectory("lshidx").toString
    val incoming = col("doc_id") % 5 === 0
    LshIndex.build(docs.filter(!incoming), path, n = 3, k = 12, bands = 4)
    val viaIndex = LshIndex.probe(docs.filter(incoming), path, threshold = 0.5,
      maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = Dedup.incrementalNearDup(docs, incoming, n = 3, k = 12, bands = 4,
      threshold = 0.5, maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaIndex == direct,
      s"index probe must equal the single-frame variant; only-in-index=${viaIndex -- direct}, " +
        s"only-in-direct=${direct -- viaIndex}")
    // after appending the batch, a re-probed batch doc finds ITSELF at jaccard 1.0
    LshIndex.append(docs.filter(incoming), path)
    val someId = docs.filter(incoming).select("doc_id").head().getLong(0)
    val self = LshIndex.probe(docs.filter(col("doc_id") === someId), path, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(self.contains((someId, someId, 1.0)), s"appended doc must match itself: ${self.toSeq}")
  }

  test("LSH index compaction: bounded file count, identical probe results, crash-heal") {
    import graft.operators.LshIndex
    val path = java.nio.file.Files.createTempDirectory("lshidx-compact").toString
    val slice = (i: Int) => docs.filter(col("doc_id") % 7 === i)
    LshIndex.build(slice(0), path, n = 3, k = 12, bands = 4)
    // several per-batch appends accrete one file set per touched dir each
    (1 to 4).foreach(i => LshIndex.append(slice(i), path))
    val probeBatch = slice(6)
    val before = LshIndex.probe(probeBatch, path, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    LshIndex.compact(spark, path)
    // compaction folds the LSM tail away entirely; the compacted base is
    // one file per populated partition dir (+occ) — a function of the
    // DIR SET, independent of how many batches were ever appended. (At
    // this tiny scale the flat tail can hold fewer files than the
    // per-dir layout it folds into, so "strictly fewer files" is not
    // the invariant; boundedness under repeated append+compact is.)
    val fsC = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    assert(!fsC.exists(new org.apache.hadoop.fs.Path(s"$path/tail")),
      "compact must delete the folded tail")
    val filesAfter = LshIndex.dataFileCount(spark, path)
    val after = LshIndex.probe(probeBatch, path, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(after == before, s"probe must be unchanged by compaction; " +
      s"only-before=${before -- after}, only-after=${after -- before}")
    // appends after compaction keep working; re-appending the SAME
    // batches plus one new slice and re-compacting dedups on the store
    // key — the file count lands on the new dir set's bound, and a
    // further duplicate-only cycle returns the IDENTICAL count
    (1 to 4).foreach(i => LshIndex.append(slice(i), path))
    LshIndex.append(slice(5), path)
    LshIndex.compact(spark, path)
    val filesStable = LshIndex.dataFileCount(spark, path)
    val afterAppend = LshIndex.probe(probeBatch, path, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(afterAppend.size >= before.size)
    LshIndex.append(slice(5), path) // pure duplicates
    LshIndex.compact(spark, path)
    assert(LshIndex.dataFileCount(spark, path) == filesStable,
      s"append+compact of duplicate docs must not grow the store past $filesStable")
    assert(filesAfter <= filesStable,
      s"dir-set growth only: $filesAfter -> $filesStable")
    // crash-heal: a store left swapped-out (live missing, .old present —
    // the window between compact's two renames) is recovered on rerun
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$path/grams")
    val old = new org.apache.hadoop.fs.Path(s"$path/grams.old")
    assert(fs.rename(live, old))
    LshIndex.compact(spark, path)
    assert(fs.exists(live) && !fs.exists(old))
    assert(LshIndex.probe(probeBatch, path, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet == afterAppend)
  }

  test("LSH index: over-bound sticky dropped set stays off the driver, suppression exact") {
    import graft.operators.LshIndex
    import spark.implicits._
    val path = tmpDir("lshidx-dropped")
    val corpus = docs.limit(50)
      .select(concat(lit("d"), col("doc_id")).as("doc_id"), col("text"))
    LshIndex.build(corpus, path, n = 3, k = 12, bands = 4)
    // plant an over-bound accumulated dropped set (what a long replay
    // over a high-dup corpus accretes) plus one known sentinel id
    val planted = (1 to (LshIndex.PointLookupMax + 64)).map(i => s"planted-$i")
    (planted :+ "sticky-victim").toDF("doc_id")
      .repartition(4).write.mode("append").parquet(s"$path/dropped_ids")
    // canonical batch: an UPDATE for the sticky victim (must stay
    // suppressed — its doc was dropped before this restart) and a
    // fresh unrelated insert (must be admitted)
    val events = Seq(
      ("sticky-victim", 100L, "U", Seq(1, 2, 3), 3, "web", null.asInstanceOf[String], 0),
      ("fresh-doc", 101L, "I", Seq(900001, 900002, 900003, 900004, 900005, 900006), 6,
        "web", null.asInstanceOf[String], 0))
      .toDF("doc_id", "lsn", "op", "tokens", "n_tok", "source", "lang", "shard")
    val a = LshIndex.admitCanonical(graft.apply.BatchApply.canonicalize(events), path,
      threshold = 0.9, maxBucketSize = 1000, batchId = 7, n = 3, k = 12)
    val admitted = a.admitted.select("doc_id").as[String].collect().toSet
    a.release()
    assert(!admitted.contains("sticky-victim"),
      "update to a dropped doc must stay suppressed through the distributed anti-join")
    assert(admitted.contains("fresh-doc"), "unrelated insert must be admitted")
    // the load probe saw > PointLookupMax accumulated ids: the sticky
    // set must NOT be driver-resident (overflow -> anti-join mode)
    assert(LshIndex.droppedDriverResident(path).isEmpty,
      s"sticky dropped set materialized on the driver: ${LshIndex.droppedDriverResident(path)}")
  }

  test("corpus mix: deterministic, stratified, shuffle-free, correct weights") {
    val rates = Map("src0" -> 900000, "src1" -> 50000)
    val run = () => TextAnalysis.mixSample(docs, rates, defaultPpm = 200000).collect()
    val (a, b) = (run(), run())
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq,
      "hash-threshold sampling must be reproducible")
    val bySrc = a.groupBy(_.getString(1))
    assert(bySrc.getOrElse("src0", Array.empty).length >
      bySrc.getOrElse("src1", Array.empty).length, "src0 at 90% must beat src1 at 5%")
    assert(a.forall { r =>
      val ppm = rates.getOrElse(r.getString(1), 200000)
      math.abs(r.getDouble(2) - 1000000.0 / ppm) < 1e-6
    }, "weight must be 1e6/ppm (6-decimal rounded)")
    val plan = TextAnalysis.mixSample(docs, rates, 200000).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("decontaminate: only non-eval docs flagged, hit counts match direct intersection") {
    val evalPred = col("doc_id") % 7 === 0
    val hits = Dedup.decontaminate(docs, evalPred, n = 3).collect()
    assert(hits.nonEmpty, "fixture should produce at least one overlap at n=3")
    assert(hits.forall(r => r.getLong(0) % 7 != 0), "eval docs must never be flagged")
    assert(hits.forall(_.getLong(1) >= 1))
    // direct recomputation for the most-hit doc
    val top = hits.maxBy(_.getLong(1))
    val gramsOf = (pred: org.apache.spark.sql.Column) => docs.filter(pred)
      .select(explode(array_distinct(Portable.shingles(col("text"), 3))).as("g"))
      .collect().map(_.getString(0)).toSet
    val evalGrams = gramsOf(evalPred)
    val docGrams = gramsOf(col("doc_id") === top.getLong(0))
    assert(docGrams.intersect(evalGrams).size.toLong == top.getLong(1))
  }

  test("simhash: identical docs share signatures; 64 bits are actually populated") {
    import spark.implicits._
    val two = Seq("the quick brown fox", "the quick brown fox", "totally different words here")
      .toDF("text")
    val sigs = two.select(Dedup.simhash64(col("text"))).as[Long].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    // the corpus exercises the high 32 bits (a 32-bit sig could not)
    val anyHigh = docs.select(Dedup.simhash64(col("text")).as("s"))
      .filter(col("s") < 0 || col("s") >= (1L << 32)).count()
    assert(anyHigh > 0, "no signature used bits 32..63")
  }

  test("jaccard: identical sets -> 1, disjoint sets -> 0") {
    import spark.implicits._
    val df = Seq((Seq("a", "b"), Seq("a", "b")), (Seq("a"), Seq("b"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).as[Double].collect()
    assert(j.toSeq == Seq(1.0, 0.0))
  }

  test("brute-force ANN: top-1 of an anchor against itself-free corpus is its true NN") {
    val topk = Similarity.bruteForceTopK(emb, col("vec_id") % 100 === 0, k = 3)
    val rows = topk.collect()
    assert(rows.nonEmpty)
    // ranks are dense 1..k per anchor
    val byAnchor = rows.groupBy(_.getLong(0))
    byAnchor.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      // sims non-increasing with rank
      val sorted = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN results are a subset-consistent approximation of brute force") {
    val brute = Similarity.bruteForceTopK(emb, col("vec_id") % 100 === 0, k = 5)
      .select("anchor_id", "neighbor_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(emb, col("vec_id") % 100 === 0, k = 5, bits = 4, dim = 64)
      .select("anchor_id", "neighbor_id", "sim").collect()
    assert(lsh.nonEmpty)
    // any (anchor, neighbor) also present in brute force has the same sim
    lsh.foreach { r =>
      brute.get((r.getLong(0), r.getLong(1))).foreach(s => assert(s == r.getDouble(2)))
    }
  }

  test("near-dup pairs: every reported pair clears the threshold, canonical order") {
    val pairs = Similarity.nearDupPairs(emb, threshold = 0.35, bits = 4, dim = 64).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.35)
    }
  }

  test("simhash banded near-dup: identical docs pair at hamming 0; bound respected") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely unrelated set of words without overlap whatsoever")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDup(df, bands = 4, maxHamming = 3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(2) == 0))
    assert(pairs.forall(r => r.getInt(2) <= 3 && r.getLong(0) < r.getLong(1)))
  }

  test("ivf ann: cells partition the corpus; probing all cells recovers exact top-k") {
    val postings = emb.select(col("vec_id"),
      Similarity.ivfCell(col("embedding").cast("array<double>"), 16, 64).as("cell"))
    // every vector lands in exactly one cell in [0, 16)
    assert(postings.filter(col("cell") < 0 || col("cell") >= 16).count() == 0)
    assert(postings.count() == emb.count())
    // nProbe = cells means every candidate is considered -> identical to brute force
    val full = Similarity.ivfTopK(emb, col("vec_id") % 100 === 0, k = 3, cells = 16, dim = 64,
      nProbe = 16).collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(emb, col("vec_id") % 100 === 0, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(full == brute)
  }

  test("kmeans centroids: deterministic, objective-improving, probe-all == exact") {
    import graft.operators.Similarity
    val c1 = Similarity.kmeansCentroids(emb, cells = 16, dim = 64, iters = 3)
    val c2 = Similarity.kmeansCentroids(emb, cells = 16, dim = 64, iters = 3)
    // scaled-integer sums make the whole procedure a pure function of
    // the data: bit-identical across runs
    assert(c1.flatten.toSeq == c2.flatten.toSeq)
    // Lloyd rounds cannot worsen the spherical objective vs the fixed
    // (normalized) init directions
    def objective(cent: Array[Array[Double]]): Double = {
      val dots = cent.map(w => graft.operators.Similarity.cosine(
        col("embedding"), typedlit(w.toSeq)))
      emb.select(avg(greatest(dots.toIndexedSeq: _*))).head.getDouble(0)
    }
    val fixedNorm = Similarity.centroidWeights(16, 64)
    assert(objective(c1) >= objective(fixedNorm) - 1e-6)
    // probing every cell is exact regardless of the centroids (cells
    // are a disjoint cover)
    val all = Similarity.ivfTopKWith(emb, col("vec_id") % 100 === 0, k = 3, c1, nProbe = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(emb, col("vec_id") % 100 === 0, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(all == brute)
    // measured recall of the learned-centroid path at nProbe=4
    val r = Similarity.ivfRecallAtK(emb, col("vec_id") % 100 === 0, k = 5, c1, nProbe = 4).head
    val recall = r.getDouble(1)
    assert(recall >= 0.0 && recall <= 1.0)
    info(f"kmeans-IVF recall@5 (nProbe=4/16) = $recall%.3f")
  }

  test("ann recall: measured recall in [0,1]; more tables/probes never lowers it") {
    val low = Similarity.recallAtK(emb, col("vec_id") % 100 === 0, k = 5, bits = 8, dim = 64,
      probe = 0, tables = 1).head()
    val high = Similarity.recallAtK(emb, col("vec_id") % 100 === 0, k = 5, bits = 8, dim = 64,
      probe = 2, tables = 4).head()
    val (rLow, rHigh) = (low.getDouble(1), high.getDouble(1))
    assert(rLow >= 0.0 && rHigh <= 1.0)
    assert(rHigh >= rLow) // candidate sets are supersets -> recall monotone
  }

  test("langId predicts the marker language; ties go to the alphabetical first") {
    import spark.implicits._
    val df = Seq(
      "the cat of the house and a dog", // en markers
      "der hund und die katze ist da",  // de markers
      "no markers here whatsoever").toDF("text")
    val got = df.select(TextAnalysis.langId(col("text"))).as[String].collect()
    assert(got(0) == "en")
    assert(got(1) == "de")
    assert(got(2) == "de") // 0 hits everywhere -> alphabetical first
  }

  test("fingerprint is order-sensitive (anagram texts differ)") {
    import spark.implicits._
    val df = Seq("ab cd", "cd ab").toDF("text")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).as[Long].collect()
    assert(fps(0) != fps(1))
    // production variant: same invariants, codegen'd single hash
    val fast = df.select(TextAnalysis.fingerprintFast(col("text"))).as[Long].collect()
    assert(fast(0) != fast(1))
    assert(df.select(TextAnalysis.fingerprintFast(col("text"))).as[Long].collect()
      .sameElements(fast)) // deterministic
  }

  test("native rolling-hash expression is value-identical to the portable HOF fingerprint") {
    import spark.implicits._
    assert(spark.catalog.functionExists("graft_rolling_hash"), "GraftExtensions not installed")
    // edge cases + real docs, evaluated through whole-stage codegen
    val edge = Seq("", "a", "ab cd", "Zürich ☃ snow", "x" * 5000).toDF("text")
    for (df <- Seq(edge, docs.select(col("text")))) {
      val both = df.select(
        TextAnalysis.fingerprint(col("text")).as("hof"),
        TextAnalysis.fingerprintNative(col("text")).as("native")).collect()
      both.foreach(r => assert(r.getLong(0) == r.getLong(1), s"mismatch on ${r}"))
    }
    // null stays null
    assert(Seq(Option.empty[String]).toDF("text")
      .select(TextAnalysis.fingerprintNative(col("text"))).head.isNullAt(0))
  }

  test("connected components: transitive chains collapse to min keep-id") {
    import spark.implicits._
    // chain 1-2-3 (1~2, 2~3 but NOT 1~3 directly), separate pair 5-6,
    // and a 4-cycle 10-11-12-13
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L))
  }

  test("connected components: empty pairs -> empty result; a long chain converges") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).count() == 0)
    // a 20-hop path exercises multi-round propagation to the far end
    val chain = (1L until 20L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(chain).collect().map(_.getLong(1)).distinct
    assert(labels.toSeq == Seq(1L))
  }

  test("simhash bucket cap engages on a boilerplate-heavy corpus") {
    import spark.implicits._
    // 50 identical docs: every band bucket holds all 50 -> 1225 pairs
    // uncapped, quadratic in one task; the cap drops the mega-buckets
    val boiler = (1L to 50L).map(i => (i, "same boilerplate text repeated everywhere"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.simhashNearDup(boiler, bands = 4, maxHamming = 3).count()
    val capped = Dedup.simhashNearDup(boiler, bands = 4, maxHamming = 3,
      maxBucketSize = 10).count()
    assert(uncapped == 50L * 49 / 2)
    assert(capped == 0)
  }

  test("minhash LSH mega-bucket cap drops oversized buckets, keeps results at normal sizes") {
    // cap big enough: identical result as uncapped at this corpus size
    val normal = Dedup.minhashLshPairs(docs, n = 3, k = 12, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap of 1: EVERY bucket with a colliding pair exceeds it -> no pairs
    val capped = Dedup.minhashLshPairs(docs, n = 3, k = 12, bands = 4, threshold = 0.5,
      maxBucketSize = 1).collect()
    assert(capped.isEmpty && normal.nonEmpty)
  }

  test("native shingles/minhash/simhash64 expressions are value-identical to the portable HOFs") {
    import spark.implicits._
    for (fn <- Seq("graft_shingles", "graft_minhash", "graft_simhash64"))
      assert(spark.catalog.functionExists(fn), s"$fn not registered")
    val edge = Seq("", "a", "one two", "one two three four five", "Zürich ☃ snow  padded",
      // edge whitespace: Spark/DuckDB trim strips SPACES only, so a
      // leading \n/\t survives and split yields a leading empty token —
      // the native path must reproduce that exactly (not String.trim)
      "\nleading newline doc", "\ttab lead", "trailing newline\n", " \n mixed \t ")
      .toDF("text")
    for (df <- Seq(edge, docs.select(col("text")))) {
      val rows = df.select(
        array_distinct(Portable.shingles(col("text"), 3)).as("p_sh"),
        array_distinct(call_function("graft_shingles", col("text"), lit(3))).as("n_sh"),
        Dedup.minhashSig(col("text"), 3, 12).as("p_mh"),
        call_function("graft_minhash", col("text"), lit(3), lit(12)).as("n_mh"),
        Dedup.simhash64(col("text")).as("p_sim"),
        call_function("graft_simhash64", col("text")).as("n_sim")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"shingles mismatch: $r")
        assert(r.getSeq[Long](2) == r.getSeq[Long](3), s"minhash mismatch: $r")
        assert(r.getLong(4) == r.getLong(5), s"simhash mismatch: $r")
      }
    }
    // null stays null
    val nulls = Seq(Option.empty[String]).toDF("text").select(
      call_function("graft_shingles", col("text"), lit(2)),
      call_function("graft_minhash", col("text"), lit(2), lit(4)),
      call_function("graft_simhash64", col("text"))).head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.isNullAt(2))
  }

  test("native sig_hgrams/jaccard_sorted are value-identical to the portable forms") {
    import spark.implicits._
    for (fn <- Seq("graft_sig_hgrams", "graft_jaccard_sorted"))
      assert(spark.catalog.functionExists(fn), s"$fn not registered")
    val edge = Seq("", "a", "one two", "one two three four five",
      "\nleading newline doc", " \n mixed \t ", "dup dup dup dup dup")
      .toDF("text")
    for (df <- Seq(edge, docs.select(col("text")))) {
      val rows = df.select(
        call_function("graft_sig_hgrams", col("text"), lit(3), lit(12)).as("sg"),
        call_function("graft_minhash", col("text"), lit(3), lit(12)).as("mh"),
        array_sort(transform(
          array_distinct(call_function("graft_shingles", col("text"), lit(3))),
          g => Portable.hash60(g))).as("p_hg")).collect()
      rows.foreach { r =>
        val sg = r.getStruct(0)
        assert(sg.getSeq[Long](0) == r.getSeq[Long](1), s"sig mismatch: $r")
        assert(sg.getSeq[Long](1) == r.getSeq[Long](2), s"hgrams mismatch: $r")
      }
    }
    // jaccard_sorted == generic set jaccard on sorted-distinct arrays,
    // including the empty/empty -> 1.0 convention
    val pairs = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(5L), Seq.empty[Long]),
      (Seq(1L, 7L, 9L, 11L), Seq(1L, 7L, 9L, 11L))).toDF("a", "b")
    val jrows = pairs.select(
      call_function("graft_jaccard_sorted", col("a"), col("b")).as("n"),
      Dedup.jaccard(col("a"), col("b")).as("p")).collect()
    jrows.foreach(r => assert(r.getDouble(0) == r.getDouble(1), s"jaccard mismatch: $r"))
  }

  test("minhash LSH pairs identical with native expressions on and off") {
    val native = Dedup.minhashLshPairs(docs, n = 3, k = 12, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    spark.conf.set("spark.graft.nativeText", "false")
    val portable = try Dedup.minhashLshPairs(docs, n = 3, k = 12, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    finally spark.conf.unset("spark.graft.nativeText")
    assert(native.nonEmpty && native == portable)
  }

  test("native graft_topk aggregate is value-identical to the portable two-level top-k") {
    assert(spark.catalog.functionExists("graft_topk"), "GraftExtensions not installed")
    def run(): Seq[(Long, Int, Long, Double)] =
      Similarity.bruteForceTopK(emb, col("vec_id") % 50 === 0, k = 4).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq.sorted
    val native = run()
    spark.conf.set("spark.graft.nativeTopK", "false")
    val fallback = try run() finally spark.conf.unset("spark.graft.nativeTopK")
    assert(native.nonEmpty && native == fallback)
  }

  test("multimodal: typed mapPartitions decode matches the SQL-expressible metadata") {
    implicit val s: SparkSession = spark
    val assets = Multimodal.attachPayload(docs)
    val decoded = Multimodal.decode(assets).toDF()
      .select("doc_id", "media_type", "byte_len", "width", "height", "n_frames")
    val viaSql = Multimodal.decodedMetadata(docs)
      .select("doc_id", "media_type", "byte_len", "width", "height", "n_frames")
    assert(decoded.exceptAll(viaSql).isEmpty && viaSql.exceptAll(decoded).isEmpty)
  }

  test("frame offsets stride the payload") {
    val fo = Multimodal.frameOffsets(Multimodal.attachPayload(docs), step = 16)
      .select(col("doc_id"), col("frame_offsets")).collect()
    fo.foreach { r =>
      val offs = r.getSeq[Int](1)
      assert(offs.head == 0)
      assert(offs.zip(offs.tail).forall { case (a, b) => b - a == 16 })
    }
  }

  test("frame index: one row per video frame, timestamps and offsets in range") {
    val meta = Multimodal.decodedMetadata(docs)
    val idx = Multimodal.frameIndex(meta)
    val perDoc = idx.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = meta.filter(col("media_type") === "video").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_frames").toLong).toMap
    assert(perDoc == expected && expected.nonEmpty)
    val rows = idx.collect()
    assert(rows.forall { r =>
      val (fn, ts, off) = (r.getInt(1), r.getLong(2), r.getLong(3))
      fn >= 0 && ts == fn.toLong * 1000 / Multimodal.Fps && off >= 0
    })
  }

  test("PII redaction: counts and placeholders on planted PII, identity on clean text") {
    import spark.implicits._
    val in = Seq(
      (1L, "reach me at jane.doe+spam@mail-host.org or 192.168.1.200, cell 4155550123"),
      (2L, "two mails a@b.io c@d.co and short digits 123456 stay"),
      (3L, "perfectly clean prose with no contact information at all")).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(in).collect().map(r =>
      r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(1L) == ((1, 1, 1, "reach me at <EMAIL> or <IP>, cell <PHONE>")))
    // 123456 is 6 digits — below the 7-digit phone floor
    assert(out(2L) == ((2, 0, 0, "two mails <EMAIL> <EMAIL> and short digits 123456 stay")))
    assert(out(3L) == ((0, 0, 0, "perfectly clean prose with no contact information at all")))
  }

  test("repetition stats: degenerate text scores high, unique text scores zero") {
    import spark.implicits._
    val in = Seq(
      (1L, "spam spam spam spam"), // 4 words, 1 distinct; 3 bigrams, 1 distinct
      (2L, "all words here are distinct ones"),
      (3L, "ab ab cd cd")) // 4 words, 2 distinct; bigrams: [ab ab, ab cd, cd cd] distinct 3
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(in).collect().map(r =>
      r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getDouble(5), r.getDouble(6))).toMap
    assert(out(1L) == ((4, 1, 3, 1, 0.75, 0.666667))) // round(1 - 1/3, 6)
    assert(out(2L) == ((6, 6, 5, 5, 0.0, 0.0)))
    assert(out(3L) == ((4, 2, 3, 3, 0.5, 0.0)))
  }

  test("asof join: latest preceding right row per key, >= at equal ts, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), // before any right row -> null
      (1L, 20L, 101L), // exactly at right ts=20 -> that row (>= convention)
      (1L, 35L, 102L), // between 30 and 50 -> ts=30
      (1L, 99L, 103L), // after all -> ts=50
      (2L, 5L, 200L)   // key with no right rows at all -> null
    ).toDF("user_id", "t", "event_id").select(col("event_id"), col("user_id"),
      col("t").cast("timestamp").as("ts"))
    val right = Seq((1L, 20L, 2.5, "a"), (1L, 30L, 3.5, "b"), (1L, 50L, 5.5, "c"))
      .toDF("user_id", "t", "v", "tag").select(col("user_id"),
        col("t").cast("timestamp").as("ts"), col("v"), col("tag"))
    val out = graft.operators.Joins.asofJoin(left, right,
        key = "user_id", ts = "ts", payload = Seq("v", "tag"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]), Option(r.getString(4)))).toMap
    assert(out == Map(
      100L -> ((None, None)), 101L -> ((Some(2.5), Some("a"))),
      102L -> ((Some(3.5), Some("b"))), 103L -> ((Some(5.5), Some("c"))),
      200L -> ((None, None))))
    // payload fields ride one struct: a matched right row with a null
    // field still counts as the match (no fall-through to an older row)
    val rightNull = Seq((1L, 20L, Option.empty[Double], "x"), (1L, 10L, Option(9.9), "y"))
      .toDF("user_id", "t", "v", "tag").select(col("user_id"),
        col("t").cast("timestamp").as("ts"), col("v"), col("tag"))
    val probe = Seq((1L, 25L, 1L)).toDF("user_id", "t", "event_id")
      .select(col("event_id"), col("user_id"), col("t").cast("timestamp").as("ts"))
    val got = graft.operators.Joins.asofJoin(probe, rightNull,
      key = "user_id", ts = "ts", payload = Seq("v", "tag")).collect().head
    assert(got.isNullAt(3) && got.getString(4) == "x")
  }

  test("range join: binned equi-join equals the naive cross filter, no nested-loop join") {
    import spark.implicits._
    val points = Seq((1L, 0L), (2L, 100L), (3L, 999L), (4L, 1000L), (5L, 2500L))
      .toDF("pid", "p")
    val intervals = Seq(
      (10L, 0L, 1000L),    // spans bins 0-9 at bw=100; matches p=0,100,999 (end exclusive)
      (11L, 999L, 1001L),  // matches 999, 1000
      (12L, 2000L, 2000L), // empty interval -> nothing
      (13L, 2600L, 2400L)  // inverted -> nothing
    ).toDF("iid", "s", "e")
    val out = graft.operators.Joins.rangeJoinBinned(points, intervals,
      pointCol = "p", startCol = "s", endCol = "e", binWidth = 100L)
    val got = out.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .filter(col("p") >= col("s") && col("p") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L), (4L, 11L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested-loop plan:\n$plan")
  }

  test("dup spans: positional cross-doc n-gram duplication fraction per doc") {
    import spark.implicits._
    // a/b share word 3-grams "x y z" and "y z w" (positions 1, 2 of 3)
    val docs = Seq(
      ("a", "x y z w q"),
      ("b", "x y z w r"),
      ("c", "completely different words here now")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.dupSpans(docs, n = 3, minDf = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      "a" -> ((3L, 2L, 0.666667)),
      "b" -> ((3L, 2L, 0.666667)),
      "c" -> ((3L, 0L, 0.0))))
    // a doc of <= n words contributes its whole text as ONE gram at pos 1
    // (same degenerate-shingle convention as the rest of the dedup suite);
    // a within-doc repeat alone is NOT a duplicated span (minDf counts
    // DISTINCT docs)
    val short = Seq(("s1", "x y"), ("s2", "x y"), ("s3", "x z x z")).toDF("doc_id", "text")
    val out2 = graft.operators.Dedup.dupSpans(short, n = 3, minDf = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out2 == Map("s1" -> 1L, "s2" -> 1L, "s3" -> 0L))
  }

  test("chunk sequences: overlapping windows cover every word, trailing chunk short") {
    import spark.implicits._
    val docs = Seq(("a", "w1 w2 w3 w4 w5 w6 w7"), ("b", "x1 x2")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.chunkSequences(docs, chunkLen = 4, stride = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> ((r.getString(2), r.getInt(3))))
      .toMap
    assert(out == Map(
      ("a", 0) -> (("w1 w2 w3 w4", 4)),
      ("a", 1) -> (("w3 w4 w5 w6", 4)),
      ("a", 2) -> (("w5 w6 w7", 3)),
      ("a", 3) -> (("w7", 1)),
      ("b", 0) -> (("x1 x2", 2))))
    // chunk k is a pure function of (text, k): identical across repartitioning
    val re = graft.operators.TextAnalysis.chunkSequences(docs.repartition(7), 4, 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> ((r.getString(2), r.getInt(3))))
      .toMap
    assert(re == out)
  }

  test("split assign: disjoint+exhaustive, reshard-stable, shuffle-free") {
    import spark.implicits._
    val docs = (1L to 400L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val splits = Seq("train" -> 900000, "val" -> 50000, "test" -> 50000)
    val out = graft.operators.TextAnalysis.splitAssign(docs, splits)
    val rows = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // exhaustive: every doc labeled exactly once, labels from the spec
    assert(rows.size == 400 && rows.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(rows.values.count(_ == "train") > 300) // 90% rate dominates
    // deterministic under resharding (the property randomSplit loses)
    val re = graft.operators.TextAnalysis.splitAssign(docs.repartition(13), splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(re == rows)
    // one fused projection, no exchange
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"splitAssign shuffled:\n$plan")
    // ppm must sum to 1e6
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.splitAssign(docs, Seq("a" -> 1, "b" -> 2))
    }
  }

  test("quantize int8: exact codes, scale, max error; zero-vector guard") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.quantizeInt8(emb)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getString(3), r.getDouble(4)))).toMap
    // scale = 1/127; q = floor(x*127 + 0.5): 127, -63, 32, 0
    val (n1, s1, q1, e1) = out(1L)
    assert(n1 == 4 && q1 == "127,-63,32,0")
    assert(math.abs(s1 - 1.0 / 127) < 1e-9)
    // worst component is x=-0.5 -> |-0.5 - (-63/127)| = 0.003937...
    assert(math.abs(e1 - (0.5 - 63.0 / 127)) < 1e-6)
    // zero vector: scale falls back to 1, all codes 0, zero error
    assert(out(2L) == ((4, 1.0, "0,0,0,0", 0.0)))
  }

  test("quantized recall: int8 reconstruction preserves well-separated top-k") {
    import spark.implicits._
    // anchor 0 plus two tight clusters far apart: quantization noise
    // (~scale/2 per dim) cannot flip the ranking
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Seq(0.8f, 0.2f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val r = graft.operators.Similarity.quantRecallAtK(emb, col("vec_id") === 0, k = 2)
      .collect().head
    assert(r.getLong(0) == 1 && r.getDouble(1) == 1.0)
  }

  test("semantic dedup: drops exactly the lower-id-neighbor vectors, keeps first-seen") {
    val survivors = Similarity.semanticDedup(emb, threshold = 0.3, cells = 16, dim = 64)
    val kept = survivors.select("vec_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    assert(kept.nonEmpty && kept.size < emb.count())
    // reference check vs the all-pairs definition restricted to cells:
    // a vector survives iff no lower-id vector in its SAME cell has
    // cosine >= threshold (within-cell brute force at test scale)
    val cent = Similarity.centroidWeights(16, 64)
    val assigned = Similarity.semanticDedupWith(emb, threshold = 2.0, cent) // tau>1: no drops, reuse cell assign
      .withColumnRenamed("vec_id", "id")
    val cells = assigned.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells.size == emb.count()) // tau>1 drops nothing
    val vecs = emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def sim(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      math.floor(r * 1e6 + 0.5) / 1e6 // same 6-dp rounding as the operator
    }
    val expectedKept = vecs.keys.filter { id =>
      !vecs.keys.exists(o => o < id && cells(o) == cells(id) && sim(vecs(o), vecs(id)) >= 0.3)
    }.toSet
    assert(kept == expectedKept)
  }

  test("semantic dedup with learned centroids runs and keeps a superset-of-none invariant") {
    val cent = Similarity.kmeansCentroids(emb, cells = 8, dim = 64, iters = 2)
    val survivors = Similarity.semanticDedupWith(emb, threshold = 0.3, cent)
    val n = survivors.count()
    assert(n > 0 && n <= emb.count())
    // deterministic: second run identical
    val again = Similarity.semanticDedupWith(emb, threshold = 0.3, cent)
    assert(survivors.exceptAll(again).isEmpty && again.exceptAll(survivors).isEmpty)
  }

  test("tfidf top-k: ranks bounded, scores consistent, rare term outranks common term") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta beta zzz"),
      (2L, "alpha beta gamma"),
      (3L, "alpha delta epsilon")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(d, k = 2).collect()
    // every doc has <= k rows, ranks 1..k contiguous
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.values.forall(rs => rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length)))
    // doc 1: beta tf=2 df=2 -> score 3.0; zzz tf=1 df=1 -> score 3.0;
    // alpha tf=1 df=3 -> 1.0. Tie at 3.0 breaks by term asc: beta rank 1.
    val d1 = byDoc(1L).sortBy(_.getInt(1)).map(r => (r.getString(2), r.getDouble(5)))
    assert(d1.toSeq == Seq("beta" -> 3.0, "zzz" -> 3.0))
    // score = tf * N / df exactly
    assert(out.forall(r => r.getDouble(5) ==
      (r.getLong(3) * 3).toDouble / r.getLong(4)))
  }

  test("paragraph dedup: keep-first across docs, text rebuilt in order, fully-duped doc empties") {
    import spark.implicits._
    // paraLen=2 -> paragraphs are disjoint word pairs
    val d = Seq(
      (1L, "a b c d"),        // paras: "a b", "c d"
      (2L, "a b e f"),        // "a b" duplicates doc 1's first para
      (3L, "a b c d")         // both paras duplicate doc 1 -> empties
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(d, paraLen = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1).getLong(2) == 2 && out(1).getString(4) == "a b c d") // all kept
    assert(out(2).getLong(2) == 1 && out(2).getString(4) == "e f")    // first para removed
    assert(out(3).getLong(2) == 0 && out(3).getString(4) == "")       // fully deduped
    assert(out(3).getDouble(3) == 0.0 && out(1).getDouble(3) == 1.0)
  }

  test("unigram surprisal: rarer terms carry more bits, sums integer-exact") {
    import spark.implicits._
    // corpus: "x" appears 6 times, "q" once; total 7 terms
    val d = Seq((1L, "x x x q"), (2L, "x x x")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    // bits(x) = len(bin(7 DIV 6)) = len("1") = 1; bits(q) = len(bin(7)) = len("111") = 3
    assert(out(1).getLong(1) == 4 && out(1).getLong(2) == 3 * 1 + 1 * 3) // 6 bits
    assert(out(2).getLong(1) == 3 && out(2).getLong(2) == 3)
    assert(out(1).getDouble(3) == 1.5) // 6/4
  }

  test("quality filter: per-rule booleans explain each drop, conjunction keeps") {
    import spark.implicits._
    val good = ((1 to 25).map(i => s"w$i") ++ Seq("the", "a", "of")).mkString(" ")
    val stuffed = (Seq.fill(30)("buy") :+ "the").mkString(" ")
    val puncty = good + " " + Seq.fill(2)((1 to 10).map(_ => "!#$").mkString(" ")).mkString(" ")
    val d = Seq((1L, good), (2L, "the a"), (3L, stuffed), (4L, puncty))
      .toDF("doc_id", "text")
    val out = TextAnalysis.qualityFilter(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1).getAs[Boolean]("keep"))
    assert(!out(2).getAs[Boolean]("r_len") && !out(2).getAs[Boolean]("keep"))
    assert(!out(3).getAs[Boolean]("r_dup") && out(3).getAs[Boolean]("r_stop")
      && !out(3).getAs[Boolean]("keep"))
    assert(!out(4).getAs[Boolean]("r_punct") && out(4).getAs[Boolean]("r_len")
      && !out(4).getAs[Boolean]("keep"))
  }

  test("image patches tile exactly; audio segments cover the duration without gaps") {
    val patches = Multimodal.imagePatches(Multimodal.decodedMetadata(docs), patch = 256)
    val meta = Multimodal.decodedMetadata(docs).filter(col("media_type") === "image")
    // Σ patch_w·patch_h per image == width·height (exact tiling, no
    // overlap, no spill past the edge)
    val bad = patches.groupBy("doc_id")
      .agg(sum(col("patch_w").cast("long") * col("patch_h")).as("area"))
      .join(meta, "doc_id")
      .filter(col("area") =!= col("width").cast("long") * col("height")).count()
    assert(bad == 0)
    assert(patches.filter(col("patch_w") <= 0 || col("patch_h") <= 0).count() == 0)
    // audio: first segment starts at 0, last ends at duration, stride
    // steps are uniform, every end > start
    val segs = Multimodal.audioSegments(
      Multimodal.audioMetadata(docs), segMs = 30000L, strideMs = 25000L)
    assert(segs.filter(col("end_ms") <= col("start_ms")).count() == 0)
    val perDoc = segs.groupBy("doc_id").agg(
      min("start_ms").as("first"), max("end_ms").as("last"), max("seg_no").as("k"))
      .join(Multimodal.audioMetadata(docs), "doc_id")
    assert(perDoc.filter(col("first") =!= 0L || col("last") =!= col("duration_ms")).count() == 0)
    // coverage: the last window must start at or before duration-1
    assert(perDoc.filter(col("k").cast("long") * 25000L >= col("duration_ms")).count() == 0)
  }

  test("exif metadata: nested parquet round-trip schema-prunes to the selected leaves") {
    val dir = tmpDir("graft-exif-spec")
    Multimodal.exifMetadata(docs).write.mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .select(col("meta.capture.device").as("device"),
        col("meta.pixels.width").as("width"))
      .groupBy("device").agg(sum("width").as("sum_w"))
    // nested-schema pruning: the scan's required schema carries ONLY the
    // selected leaves — geo/ts_ms/orientation/height never leave parquet
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    val read = scan.substring(scan.indexOf("ReadSchema:"))
    assert(read.contains("device") && read.contains("width"), read)
    assert(!read.contains("geo") && !read.contains("ts_ms")
      && !read.contains("orientation") && !read.contains("height"), read)
    // values: device vocabulary closed, orientation ∈ {1,3,6,8}, geo in range
    val full = spark.read.parquet(dir)
    assert(full.filter(!col("meta.capture.orientation").isin(1, 3, 6, 8)).count() == 0)
    assert(full.filter(col("meta.geo.lat_e7") < -900000000L
      || col("meta.geo.lat_e7") >= 900000000L).count() == 0)
    assert(full.filter(col("meta.capture.ts_ms") < Multimodal.EpochMs).count() == 0)
    assert(pruned.count() > 0 && pruned.count() <= 5)
  }

  test("shuffle shards: disjoint+exhaustive, contiguous per-shard positions, reshard-stable") {
    val out = TextAnalysis.shuffleShards(docs, nShards = 4)
    val n = docs.count()
    assert(out.count() == n)
    assert(out.select("doc_id").distinct().count() == n) // exactly one shard per doc
    // positions are 1..count(shard) within every shard
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n")).count()
    assert(bad == 0)
    // identical assignment under a different input partitioning
    val again = TextAnalysis.shuffleShards(docs.repartition(17), nShards = 4)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("change history: salted two-phase plan == unsalted plan on a skewed log") {
    import graft.operators.ChangeHistory
    // 10k events, 70% on one hot key, the rest over 500 keys; seq is a
    // permuted (not monotone-by-key) order so salting actually splits
    val ev = spark.range(10000).select(
      when(pmod(col("id") * 7919L, lit(10L)) < 7, lit("hot"))
        .otherwise(concat(lit("k"), pmod(col("id") * 104729L, lit(500L)))).as("k"),
      pmod(col("id") * 999983L, lit(1000000L)).as("seq"),
      concat(lit("p"), pmod(col("id"), lit(3L))).as("payload"))
    def csv(salt: Int) =
      ChangeHistory.historyCsv(ev, col("k"), col("seq"), col("payload"), salt)
    val unsalted = csv(1)
    for (salt <- Seq(2, 8, 32)) {
      val salted = csv(salt)
      assert(unsalted.exceptAll(salted).isEmpty && salted.exceptAll(unsalted).isEmpty,
        s"salted($salt) history differs from unsalted")
    }
    // histories really are seq-ascending and complete
    val h = ChangeHistory.history(ev, col("k"), col("seq"), col("payload"), 8)
    assert(h.agg(sum("n_changes")).head.getLong(0) == 10000L)
    val notSorted = h.filter(
      exists(zip_with(col("history"), slice(col("history"), 2, 1000000),
        (a, b) => a.getField("seq") > b.getField("seq")), x => x)).count()
    assert(notSorted == 0)

    // CHUNKED packaging: concatenating a key's chunks in chunk_idx
    // order must reproduce the merged history exactly — the contract
    // that lets a consumer read the scalable form as if it were merged
    val fromChunks = ChangeHistory.historyChunks(ev, col("k"), col("seq"), col("payload"), 8)
      .groupBy(col("key"))
      .agg(flatten(transform(sort_array(collect_list(struct(col("chunk_idx"), col("chunk")))),
        x => x.getField("chunk"))).as("history"))
      .select(col("key"), size(col("history")).cast("long").as("n_changes"), col("history"))
    val merged = h.select(col("key"), col("n_changes").cast("long").as("n_changes"), col("history"))
    assert(merged.exceptAll(fromChunks).isEmpty && fromChunks.exceptAll(merged).isEmpty,
      "chunked history does not reassemble into the merged history")
    // chunk granularity: the hot key's versions really spread over >1 chunk
    val hotChunks = ChangeHistory.historyChunks(ev, col("k"), col("seq"), col("payload"), 8)
      .filter(col("key") === "hot").count()
    assert(hotChunks > 1, s"hot key landed in $hotChunks chunk(s)")
  }

  test("pq: on-grid vectors encode with zero quantization error; recall well-formed") {
    import spark.implicits._
    val (m, ksub, dim) = (8, 8, 64)
    val dsub = dim / m
    val books = Similarity.pqCodebooks(m, ksub, dsub)
    // vectors that ARE concatenations of codebook centroids: whatever
    // centroid the encoder picks must sit at L2 distance 0, so the
    // reconstruction from the codes equals the input exactly
    val grid = Seq(0, 3, 7).zipWithIndex.map { case (j, id) =>
      (id.toLong, (0 until m).flatMap(s => books(s)((j + s) % ksub)).map(_.toFloat).toArray)
    }
    val df = grid.toDF("vec_id", "embedding")
    val enc = Similarity.pqEncode(df, m, ksub, dim)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    grid.foreach { case (id, v) =>
      val codes = enc(id)
      assert(codes.length == m && codes.forall(c => c >= 0 && c < ksub))
      val recon = (0 until m).flatMap(s => books(s)(codes(s))).map(_.toFloat)
      assert(recon == v.toSeq, s"vec $id: PQ reconstruction of an on-grid vector is not exact")
    }
    // off-grid corpus: recall number well-formed, anchors all counted
    val r = Similarity.pqRecallAtK(emb, col("vec_id") % 100 === 0, k = 5,
      m = m, ksub = ksub, dim = dim).head()
    assert(r.getLong(0) == 5)
    val rec = r.getDouble(1)
    assert(rec >= 0.0 && rec <= 1.0, s"recall $rec out of range")
  }

  test("pq learned codebooks: training never increases distortion; encode parity") {
    val (m, ksub, dim) = (8, 8, 64)
    val dsub = dim / m
    // driver-side mirror of the encoder's convention (ns = |c|^2/2 - <x,c>
    // left-fold, first-min tiebreak) over the collected corpus
    def encodeLocal(books: Array[Array[Array[Double]]], v: Array[Double]): Array[Int] =
      Array.tabulate(m) { s =>
        val sub = v.slice(s * dsub, s * dsub + dsub)
        val ns = books(s).map { c =>
          c.map(x => x * x).sum / 2 - sub.zip(c).foldLeft(0.0)((a, p) => a + p._1 * p._2)
        }
        ns.indices.minBy(j => (ns(j), j))
      }
    def distortion(books: Array[Array[Array[Double]]], vs: Seq[Array[Double]]): Double =
      vs.map { v =>
        val codes = encodeLocal(books, v)
        (0 until m).map { s =>
          val sub = v.slice(s * dsub, s * dsub + dsub)
          sub.zip(books(s)(codes(s))).map { case (x, c) => (x - c) * (x - c) }.sum
        }.sum
      }.sum / vs.size
    val vs = emb.select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray).toSeq
    val fixed = Similarity.pqCodebooks(m, ksub, dsub)
    val learned = Similarity.pqTrainCodebooks(emb, m, ksub, dim, iters = 4)
    // Lloyd monotonicity from the fixed-book seed (epsilon absorbs the
    // scaled-long sum quantization)
    val (df0, dl) = (distortion(fixed, vs), distortion(learned, vs))
    assert(dl <= df0 + 1e-6, s"learned distortion $dl > fixed $df0")
    // the distributed encoder agrees with the driver-side mirror on the
    // learned (arbitrary-double) books, not just the ternary ones
    val got = Similarity.pqEncodeWith(emb, learned, dim)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val ids = emb.select(col("vec_id"), col("embedding").cast("array<double>")).collect()
    ids.foreach { r =>
      val want = encodeLocal(learned, r.getSeq[Double](1).toArray)
      assert(got(r.getLong(0)).sameElements(want), s"encode parity broke for vec ${r.getLong(0)}")
    }
  }

  test("ivfpq: probing all cells degenerates to the pure PQ rerank path; pruning only shrinks") {
    val pred = col("vec_id") % 50 === 0
    val (m, ksub, dim, k, shortlist, cells) = (8, 8, 64, 5, 20, 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    // nProbe == cells: the cell restriction is vacuous (cells are
    // disjoint, every posting matched exactly once), so the composed
    // index must return EXACTLY the pqRerankTopK result
    val full = rows(Similarity.ivfPqTopK(emb, pred, k, shortlist,
      cells, nProbe = cells, m = m, ksub = ksub, dim = dim)
      .select(col("anchor_id"), col("rank"), col("neighbor_id")))
    val pure = rows(Similarity.pqRerankTopK(emb, pred, k, shortlist, m, ksub, dim)
      .select(col("anchor_id"), col("rank"), col("neighbor_id")))
    assert(full.sameElements(pure), "nProbe=cells must equal the un-pruned PQ rerank path")
    // pruned probe: per-anchor candidates only from probed cells ->
    // result sets stay well-formed (<= k per anchor, ranks contiguous)
    val pruned = Similarity.ivfPqTopK(emb, pred, k, shortlist,
      cells, nProbe = 2, m = m, ksub = ksub, dim = dim)
    val byAnchor = pruned.groupBy(col("anchor_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx")).collect()
    byAnchor.foreach { r =>
      assert(r.getLong(1) <= k && r.getInt(2) == r.getLong(1),
        s"anchor ${r.get(0)}: ranks not contiguous or > k")
    }
    val rec = Similarity.ivfPqRecallAtK(emb, pred, k, shortlist,
      cells, nProbe = 2, m = m, ksub = ksub, dim = dim).head().getDouble(1)
    assert(rec >= 0.0 && rec <= 1.0, s"recall $rec out of range")
  }

  test("ivfpq learned end-to-end: kmeans cells + trained books through the composed index") {
    // the production path: centroids from kmeansCentroids, codebooks
    // from pqTrainCodebooks, both fed to ivfPqTopKWith — deterministic
    // on this fixture, so the measured recall is a stable regression
    // gate rather than a flaky threshold
    val pred = col("vec_id") % 50 === 0
    val (m, ksub, dim, k, shortlist, cells, nProbe) = (8, 8, 64, 5, 20, 8, 2)
    val cents = Similarity.kmeansCentroids(emb, cells, dim, iters = 3)
    val books = Similarity.pqTrainCodebooks(emb, m, ksub, dim, iters = 3)
    val approx = Similarity.ivfPqTopKWith(emb, pred, k, shortlist,
      cents, nProbe, books, dim)
    val exact = Similarity.bruteForceTopK(emb, pred, k)
    val learned = Similarity.recallOf(exact, approx, k).head()
    assert(learned.getLong(0) > 0)
    val recLearned = learned.getDouble(1)
    // fixed-everything baseline at the same knobs
    val recFixed = Similarity.ivfPqRecallAtK(emb, pred, k, shortlist,
      cells, nProbe, m, ksub, dim).head().getDouble(1)
    assert(recLearned >= 0.0 && recLearned <= 1.0)
    // learned cells+books should not be WORSE than the untrained ±1/
    // ternary defaults on this corpus (both deterministic, so this is
    // an equality-stable assertion, not a statistical one)
    assert(recLearned >= recFixed,
      s"learned recall $recLearned < fixed-book recall $recFixed")
  }

  test("ann index: persisted probe == in-memory operator; append == rebuild; compact bounds files") {
    val pred = col("vec_id") % 50 === 0
    val (m, ksub, dim, k, shortlist, cells, nProbe) = (8, 8, 64, 5, 20, 8, 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(x => (x._1, x._2))
    val dir = java.nio.file.Files.createTempDirectory("annidx-spec").toString
    AnnIndex.build(emb, dir, cells, m, ksub, dim)
    val anchors = emb.filter(pred)
    // 1. the served rows equal the oracle-checked in-memory operator
    val served = rows(AnnIndex.probe(anchors, dir, k, shortlist, nProbe))
    val memory = rows(Similarity.ivfPqTopK(emb, pred, k, shortlist,
      cells, nProbe, m, ksub, dim))
    assert(served.sameElements(memory), "persisted probe diverged from the in-memory plan")
    // 2. build(half) + append(half) serves the same rows as build(all)
    val dir2 = java.nio.file.Files.createTempDirectory("annidx-spec2").toString
    AnnIndex.build(emb.filter(col("vec_id") % 2 === 0), dir2, cells, m, ksub, dim)
    AnnIndex.append(emb.filter(col("vec_id") % 2 =!= 0), dir2)
    val incremental = rows(AnnIndex.probe(anchors, dir2, k, shortlist, nProbe))
    assert(incremental.sameElements(served), "append path diverged from full rebuild")
    // 3. compaction: a further append accretes files; compact shrinks
    //    the file count and the SAME index serves identical rows
    //    before and after (fresh-id vectors so dedup can't mask bugs)
    AnnIndex.append(emb.filter(col("vec_id") % 7 === 3)
      .withColumn("vec_id", col("vec_id") + 1000000L), dir2)
    val preCompact = rows(AnnIndex.probe(anchors, dir2, k, shortlist, nProbe))
    val before = AnnIndex.dataFileCount(spark, dir2)
    AnnIndex.compact(spark, dir2)
    val after = AnnIndex.dataFileCount(spark, dir2)
    assert(after < before, s"compact did not shrink file count ($before -> $after)")
    val postCompact = rows(AnnIndex.probe(anchors, dir2, k, shortlist, nProbe))
    assert(postCompact.sameElements(preCompact), "compact changed served rows")
  }

  test("ann index: deletes tombstone-pruned, reclaimed at compact, id reusable after") {
    val (m, ksub, dim, k, shortlist, cells, nProbe) = (8, 8, 64, 5, 20, 8, 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(x => (x._1, x._2))
    val deadPred = col("vec_id") % 7 === 3
    val anchors = emb.filter(col("vec_id") % 50 === 0 && !deadPred)
    val dir = java.nio.file.Files.createTempDirectory("annidx-del").toString
    AnnIndex.build(emb, dir, cells, m, ksub, dim)
    AnnIndex.delete(emb.filter(deadPred).select("vec_id"), dir)
    val served = rows(AnnIndex.probe(anchors, dir, k, shortlist, nProbe))
    // 1. a deleted id is never served — not even as a shortlist crowd-out
    assert(served.nonEmpty && served.forall(_._3 % 7 != 3))
    // 2. tombstone pruning is EXACT: row-for-row equal to an index that
    //    never contained the deleted vectors (same fixed books)
    val dir2 = java.nio.file.Files.createTempDirectory("annidx-del2").toString
    AnnIndex.build(emb.filter(!deadPred), dir2, cells, m, ksub, dim)
    assert(rows(AnnIndex.probe(anchors, dir2, k, shortlist, nProbe)).sameElements(served),
      "tombstone-pruned probe diverged from the rebuilt-without index")
    // 3. compact physically reclaims: markers gone, served rows unchanged
    AnnIndex.compact(spark, dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/tombstones")),
      "compact must clear the tombstone markers")
    assert(rows(AnnIndex.probe(anchors, dir, k, shortlist, nProbe)).sameElements(served),
      "compact changed served rows")
    // 4. after reclamation a deleted id may re-enter as a fresh vector
    val backId = emb.filter(deadPred).agg(min(col("vec_id"))).head().getLong(0)
    AnnIndex.append(emb.filter(col("vec_id") === backId), dir)
    val withBack = rows(AnnIndex.probe(anchors, dir, k, shortlist, nProbe))
    val dir3 = java.nio.file.Files.createTempDirectory("annidx-del3").toString
    AnnIndex.build(emb.filter(!deadPred || col("vec_id") === backId), dir3,
      cells, m, ksub, dim)
    assert(rows(AnnIndex.probe(anchors, dir3, k, shortlist, nProbe)).sameElements(withBack),
      "re-appended id after compact diverged from rebuild")
  }

  test("ann index: learned centroids/books round-trip through meta exactly") {
    // build(learn=true) persists TRAINED centroids+codebooks in meta/;
    // a probe must equal the in-memory operator run with the same
    // training — any precision loss in the JSON round-trip (or a drift
    // between stored and training determinism) breaks row equality
    val pred = col("vec_id") % 50 === 0
    val (m, ksub, dim, k, shortlist, cells, nProbe) = (8, 8, 64, 5, 20, 8, 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(x => (x._1, x._2))
    val dir = java.nio.file.Files.createTempDirectory("annidx-learn").toString
    AnnIndex.build(emb, dir, cells, m, ksub, dim, learn = true, iters = 2)
    val served = rows(AnnIndex.probe(emb.filter(pred), dir, k, shortlist, nProbe))
    val cents = Similarity.kmeansCentroids(emb, cells, dim, 2)
    val books = Similarity.pqTrainCodebooks(emb, m, ksub, dim, 2)
    val memory = rows(Similarity.ivfPqTopKWith(emb, pred, k, shortlist,
      cents, nProbe, books, dim))
    assert(served.sameElements(memory),
      "learned-book probe diverged from in-memory training (meta round-trip lossy?)")
  }

  test("bpeEncode: scan-fused, lossless segmentation, re-shard stable, ids in range") {
    val merges = Seq("e" -> "r", "i" -> "n", "s" -> "t", "a" -> "t")
    val alpha = "abcdefghijklmnopqrstuvwy".map(_.toString)
    val out = TextAnalysis.bpeEncode(docs, merges, alpha, oovBuckets = 32)
    // the whole merge walk + id lookup is one scan-task projection
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bpe encode must not shuffle:\n$plan")
    val a = out.orderBy("doc_id").collect()
    val b = TextAnalysis.bpeEncode(docs.repartition(5), merges, alpha, 32)
      .orderBy("doc_id").collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)), "ids moved under re-shard")
    val base = alpha.size + merges.size
    val ids = a.flatMap(_.getSeq[Int](1))
    assert(ids.forall(i => i >= 0 && i < base + 32))
    assert(ids.exists(i => i >= alpha.size && i < base), "no merge symbol ever produced")
    // lossless segmentation: concatenating each doc's symbols restores
    // its text minus spaces (no char lost, no merge across a boundary)
    val vocab = TextAnalysis.bpeVocab(merges, alpha).map(_.swap).toMap
    val texts = docs.orderBy("doc_id").select("text").collect().map(_.getString(0))
    a.map(_.getSeq[Int](1).map(vocab).mkString).zip(texts).foreach { case (joined, t) =>
      assert(joined == t.replace(" ", ""), s"lossy segmentation for: $t")
    }
  }

  test("bpeTrain: deterministic, merges reduce token count, encode stays oracle-shaped") {
    val m1 = TextAnalysis.bpeTrain(docs, nMerges = 4)
    val m2 = TextAnalysis.bpeTrain(docs, nMerges = 4)
    assert(m1 == m2, "training must be deterministic")
    assert(m1.size == 4)
    val alpha = TextAnalysis.bpeAlphabet(docs)
    def total(ms: Seq[(String, String)]): Long =
      TextAnalysis.bpeEncode(docs, ms, alpha, 32)
        .select(sum(size(col("tokens")))).head().getLong(0)
    // each learned merge collapses >= 1 occurrence, and greedy top-pair
    // training must never increase the corpus token count
    val (chars, merged) = (total(Nil), total(m1))
    assert(merged < chars, s"merges did not reduce tokens: $chars -> $merged")
  }

  test("byteChunkSplit: exact boundaries, contiguous ranges, oversized row isolated") {
    import spark.implicits._
    // clustered key domain (stresses the approxQuantile-seeded coarse
    // ranges) + one oversized row that must take a chunk of its own
    val rows = ((1L to 400L).map(k => (k, 50L + k % 7)) ++
      (100000L to 100400L).map(k => (k, if (k == 100200L) 9999L else 60L))).toSeq
    val df = rows.toDF("key", "sz").repartition(7)
    val out = graft.operators.Split.byteChunkSplit(
      df, col("key"), col("sz"), maxChunkBytes = 1000).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: single-threaded running sum in key order
    var cum = 0L
    val ref = rows.sortBy(_._1).map { case (k, b) =>
      val c = cum / 1000; cum += b; (k, b, c)
    }
    assert(out.sortBy(_._1).toSeq == ref, "chunk ids diverge from the sequential reference")
    // contract shape: chunks cover contiguous, non-overlapping key ranges
    val extents = out.groupBy(_._3).map { case (c, rs) =>
      (c, rs.map(_._1).min, rs.map(_._1).max)
    }.toSeq.sortBy(_._1)
    assert(extents.sliding(2).forall {
      case Seq((_, _, hi), (_, lo, _)) => hi < lo
      case _ => true
    })
    // the oversized row fills ~10 chunk budgets on its own: the next
    // key's chunk jumps past all of them (no chunk splits a row)
    val bigChunk = out.find(_._1 == 100200L).get._3
    val nextChunk = out.find(_._1 == 100201L).get._3
    assert(nextChunk >= bigChunk + 9, s"expected jump, got $bigChunk -> $nextChunk")
  }

  test("tokenize: scan-fused encode (no shuffle), ids stable across re-shards, OOV in range") {
    val out = TextAnalysis.tokenize(docs, vocabSize = 16, oovBuckets = 32)
    // the ENCODE stage is one projection riding the scan — the only
    // exchange in the whole op lives in the (bounded, collected) vocab agg
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"tokenize encode must not shuffle:\n$plan")
    val a = out.orderBy("doc_id").collect()
    // a doc's ids are a pure function of (text, vocab): re-sharding the
    // input must not move a single id (what makes the op resumable and
    // cluster-size-independent at 10^10 docs)
    val b = TextAnalysis.tokenize(docs.repartition(7), 16, 32).orderBy("doc_id").collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    // every id in [0, 16 + 32); both arms exercised on this corpus
    val ids = a.flatMap(_.getSeq[Int](1))
    assert(ids.forall(i => i >= 0 && i < 48))
    assert(ids.exists(_ < 16) && ids.exists(_ >= 16),
      "fixture must exercise both the vocab and the OOV arm")
    // token counts conserve the word counts
    assert(ids.length == docs.select(sum(size(split(col("text"), " ")))).head().getLong(0))
  }
}
