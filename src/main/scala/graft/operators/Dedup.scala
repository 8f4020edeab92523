package graft.operators

import graft.functions.Portable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large-scale training-data pipelines.
 *
 * Four families (exact, MinHash+LSH, SimHash, n-gram Jaccard), all
 * expressed as declarative DataFrame plans so Catalyst keeps predicate
 * pushdown / partial aggregation, and all built on [[Portable]] hashes so
 * the DuckDB oracle checks them value-for-value.
 *
 * Scale design (the 100 TB story):
 *  - Exact dedup is one hash-shuffle `groupBy(text-hash)`; map-side
 *    partial agg collapses per-partition duplicates before the shuffle.
 *  - MinHash/LSH never goes near O(n²): docs shuffle by (band-id,
 *    band-hash) — each LSH bucket holds only colliding docs, and the
 *    candidate-pair join is per-bucket. The only quadratic term is within
 *    a bucket, which the banding parameters keep tiny; a pathological
 *    mega-bucket would be visible in the bucket-size histogram and can be
 *    salted/capped (same skew treatment as the CDC hot keys).
 *  - SimHash emits one 32-bit signature per doc (a narrow projection);
 *    near-dup candidates = equal signatures (or equal bands of it),
 *    again a hash shuffle, never a cross join.
 *  - n-gram Jaccard IS quadratic by nature, so the operator only accepts
 *    an anchor predicate (small left side) and broadcasts the anchors.
 */
object Dedup {

  /** Exact duplicate groups by content hash (here: the text itself as the
    * key — at scale you'd group by `xxhash64(text)` to shrink shuffle
    * rows; md5 keeps the oracle portable). */
  def exactGroups(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Universal-hash family for minhash: k deterministic (a_j, b_j)
    * pairs derived from md5 of the constant strings "mh_a_j"/"mh_b_j"
    * at PLAN time (same values are inlined into the DuckDB oracle SQL).
    * a_j odd and < 2^30 so a*h+b never overflows a signed 64-bit. */
  val MinhashP = 2147483647L // 2^31 - 1 (prime)

  def uhashParams(k: Int): IndexedSeq[(Long, Long)] =
    graft.functions.NativeText.params(k).toIndexedSeq.map(a => (a(0), a(1)))

  /** Native codegen'd expression available and not opted out? The
    * native [[graft.functions.NativeText]] forms are value-identical
    * to the portable ones (spec'd by OperatorsSpec), so operators
    * prefer them; `spark.graft.nativeText=false` forces the portable
    * path (and sessions without GraftExtensions get it implicitly). */
  def nativeOk(s: org.apache.spark.sql.SparkSession, fn: String): Boolean =
    s.conf.getOption("spark.graft.nativeText").forall(_ != "false") &&
      s.catalog.functionExists(fn)

  private def nativeOk(df: DataFrame, fn: String): Boolean = nativeOk(df.sparkSession, fn)

  /** MinHash signature column: ONE md5-derived 32-bit hash per shingle
    * ([[Portable.hash32]]), then k cheap universal hashes
    * `(a_j * h + b_j) mod P` — the classic single-hash minhash that
    * avoids k full digests per shingle (12x less hashing than salted
    * md5s; the hash32 projection is kept in its own Project so codegen
    * evaluates it once, not once per permutation). */
  def shingleHashes(text: Column, n: Int): Column =
    transform(Portable.shingles(text, n), s => Portable.hash32(s))

  def sigFromHashes(hs: Column, k: Int): Column =
    array(uhashParams(k).map { case (a, b) =>
      array_min(transform(hs, h => pmod(h * lit(a) + lit(b), lit(MinhashP))))
    }: _*)

  def minhashSig(text: Column, n: Int, k: Int): Column =
    sigFromHashes(shingleHashes(text, n), k)

  /** DuckDB SQL for the per-shingle hash list over a grams expression. */
  def shingleHashListSql(gramsE: String): String =
    s"list_transform($gramsE, s -> ${Portable.hash32Sql("s")})"

  /** DuckDB SQL list literal of the k minhashes over a column named
    * `hs` (the output of [[shingleHashListSql]] in a prior CTE). */
  def minhashSigSql(k: Int): String =
    uhashParams(k).map { case (a, b) =>
      s"list_min(list_transform(hs, h -> (h * $a + $b) % $MinhashP))"
    }.mkString("[", ", ", "]")

  /** LSH candidate pairs: docs agreeing on at least one band of their
    * minhash signature (bands of `r` rows each), verified with exact
    * shingle-set Jaccard >= `threshold`.
    *
    * Plan shape: docs -> (band_idx, band_key) explode -> hash shuffle on
    * the band key -> per-bucket self-join -> distinct pairs -> exact
    * Jaccard verify. Returns (doc_a, doc_b, jaccard), doc_a < doc_b.
    *
    * `maxBucketSize` caps pathological mega-buckets (a band value shared
    * by boilerplate-heavy corpora would otherwise go quadratic in one
    * task): buckets above the cap are DROPPED before the self-join — the
    * standard LSH treatment, since a bucket that large carries no
    * near-dup signal (its members agree on one band by mass, not
    * similarity) and any true pair inside it still has bands-1 other
    * chances to collide. The count is a window over the band key (same
    * shuffle key as the join — no extra exchange). */
  /** The banded-signature table shared by the self-join pair finder
    * and the incremental (batch-vs-corpus) variant: (doc_id, band_idx,
    * band_key) with mega-buckets already dropped, materialized
    * (persist-with-lineage by default — see [[Mat]]). Narrow by
    * construction: text never ships through the downstream join
    * shuffles. Two-step projection keeps the per-shingle md5 in its
    * own Project (evaluated once, not k times — CollapseProject won't
    * duplicate non-cheap exprs). repartition first: a single-file
    * input would otherwise run the whole (per-row-expensive) shingle
    * pipeline in ONE task. The signature comes from the native
    * codegen'd graft_minhash when the extension is present (one
    * generated call per row), else from the staged portable
    * projections (words -> shingles -> hashes in separate Projects so
    * each interpreted HOF evaluates once) — value-identical. */
  private[operators] def bandedRaw(docs: DataFrame, n: Int, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val r = k / bands
    val base = docs.select(col("doc_id"), col("text")).repartition(col("doc_id"))
    val sigDf =
      if (nativeOk(docs, "graft_minhash"))
        base.select(col("doc_id"),
          call_function("graft_minhash", col("text"), lit(n), lit(k)).as("sig"))
      else base
        .select(col("doc_id"), Portable.words(col("text")).as("ws"))
        .select(col("doc_id"), Portable.shinglesFromWords(col("ws"), n).as("sh"))
        .select(col("doc_id"), transform(col("sh"), s => Portable.hash32(s)).as("hs"))
        .select(col("doc_id"), sigFromHashes(col("hs"), k).as("sig"))
    sigDf
      .select(col("doc_id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band_idx"),
            md5(concat_ws("|", slice(col("sig"), b * r + 1, r))).as("band_key"))
        }: _*)).as("band"))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_key"))
  }

  /** Drop mega-buckets above `maxBucketSize` (count window on the same
    * shuffle key as the downstream join — no extra exchange); skipped
    * entirely when the cap is Int.MaxValue. */
  private def capBuckets(banded: DataFrame, maxBucketSize: Int): DataFrame =
    if (maxBucketSize == Int.MaxValue) banded
    else banded
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band_idx"), col("band_key"))))
      .filter(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")

  private def bandedOf(docs: DataFrame, n: Int, k: Int, bands: Int,
      maxBucketSize: Int): DataFrame =
    Mat.materialize(capBuckets(bandedRaw(docs, n, k, bands), maxBucketSize))

  def minhashLshPairs(docs: DataFrame, n: Int, k: Int, bands: Int, threshold: Double,
      maxBucketSize: Int = 1000): DataFrame = {
    val banded = bandedOf(docs, n, k, bands, maxBucketSize)
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    // exact verify only the (tiny) candidate set: join it back to the
    // shingle sets — AQE broadcasts the candidate side automatically.
    // grams is joined twice (doc_a, doc_b) -> materialize once.
    val grams = Mat.materialize(gramsOf(docs, n))
    cand.join(grams.as("ga"), col("doc_a") === col("ga.doc_id"))
      .join(grams.as("gb"), col("doc_b") === col("gb.doc_id"))
      .withColumn("jaccard", round(jaccard(col("ga.grams"), col("gb.grams")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** INCREMENTAL near-dup — the dedup-on-ingest shape: for each
    * incoming document (rows matching `incomingPred`), find its
    * near-duplicates among the EXISTING corpus (the complement). This
    * is the query a training-data pipeline runs per ingest batch ("is
    * this new crawl page a near-copy of something we already have?"):
    * candidates come from an equi-join of the incoming band rows
    * against the existing band rows — never incoming×incoming or
    * existing×existing, so per-batch cost scales with the BATCH, not
    * the corpus. At production scale the existing side's band table is
    * a PRECOMPUTED, persisted LSH index (exactly [[bandedOf]]'s output
    * bucketed by band key on disk) that each batch joins against and
    * appends to; here both sides derive from one corpus frame so the
    * result is oracle-checkable. The mega-bucket cap is computed over
    * the FULL occupancy (incoming + existing), matching what the
    * index-maintenance path sees. Output: (doc_id, dup_of, jaccard) —
    * one row per verified (incoming, existing) near-dup pair. */
  def incrementalNearDup(docs: DataFrame, incomingPred: Column, n: Int, k: Int,
      bands: Int, threshold: Double, maxBucketSize: Int = 1000): DataFrame = {
    val banded = bandedOf(docs, n, k, bands, maxBucketSize)
    // narrow (doc_id, inc) side table: the predicate may reference any
    // docs column (text, source, ...), which the band table deliberately
    // no longer carries
    val flags = docs.select(col("doc_id"), incomingPred.as("inc"))
    val flagged = banded.join(flags, "doc_id")
    val cand = flagged.filter(col("inc")).as("a")
      .join(flagged.filter(!col("inc")).as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("dup_of"))
      .distinct()
    val grams = Mat.materialize(gramsOf(docs, n))
    cand.as("c").join(grams.as("ga"), col("c.doc_id") === col("ga.doc_id"))
      .join(grams.as("gb"), col("c.dup_of") === col("gb.doc_id"))
      .withColumn("jaccard", round(jaccard(col("ga.grams"), col("gb.grams")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("c.doc_id").as("doc_id"), col("c.dup_of").as("dup_of"), col("jaccard"))
  }

  /** The [[minhashLshPairs]] computation as a DuckDB CTE chain ending in
    * `mhpairs(doc_a, doc_b, jaccard)` — shared by the q14 oracle and the
    * cluster-resolution oracle that consumes the same pairs. */
  /** The sh/sig/banded CTE prefix shared by the self-join and
    * incremental oracle formulations (mirrors [[bandedOf]]). */
  private def bandedCtesSql(tbl: String, n: Int, k: Int, bands: Int,
      maxBucketSize: Int): String = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val r = k / bands
    val shN = Portable.shinglesSql("text", n)
    s"""sh AS (
       |  SELECT doc_id, text, list_distinct($shN) AS grams FROM $tbl),
       |hsrc AS (
       |  SELECT doc_id, ${shingleHashListSql("grams")} AS hs FROM sh),
       |sig AS (
       |  SELECT doc_id, ${minhashSigSql(k)} AS sig FROM hsrc),
       |banded0 AS (
       |  SELECT doc_id, b.band_idx,
       |    md5(array_to_string(list_slice(sig, band_idx*$r + 1, band_idx*$r + $r), '|')) AS band_key
       |  FROM sig CROSS JOIN (SELECT unnest(range($bands)) AS band_idx) b),
       |banded AS (
       |  SELECT doc_id, band_idx, band_key FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band_idx, band_key) AS bucket_n FROM banded0)
       |  WHERE bucket_n <= $maxBucketSize)""".stripMargin
  }

  def minhashPairsCtesSql(tbl: String, n: Int, k: Int, bands: Int, threshold: Double,
      maxBucketSize: Int = 1000): String = {
    s"""${bandedCtesSql(tbl, n, k, bands, maxBucketSize)},
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
       |  FROM banded a JOIN banded b2
       |    ON a.band_idx = b2.band_idx AND a.band_key = b2.band_key AND a.doc_id < b2.doc_id),
       |mhpairs AS (
       |  SELECT doc_a, doc_b, jaccard FROM (
       |    SELECT c.doc_a, c.doc_b,
       |      round(len(list_distinct(list_intersect(ga.grams, gb.grams)))::DOUBLE
       |        / (len(ga.grams) + len(gb.grams)
       |           - len(list_distinct(list_intersect(ga.grams, gb.grams)))), 6) AS jaccard
       |    FROM cand c JOIN sh ga ON ga.doc_id = c.doc_a JOIN sh gb ON gb.doc_id = c.doc_b)
       |  WHERE jaccard >= $threshold)""".stripMargin
  }

  /** DuckDB oracle for [[incrementalNearDup]]: same banded prefix, but
    * candidates join incoming band rows (per `incomingSql`, a boolean
    * SQL expression over `$tbl` columns) against existing ones. */
  def incrementalNearDupSql(tbl: String, incomingSql: String, n: Int, k: Int,
      bands: Int, threshold: Double, maxBucketSize: Int = 1000): String =
    s"""WITH ${bandedCtesSql(tbl, n, k, bands, maxBucketSize)},
       |flags AS (
       |  SELECT doc_id, ($incomingSql) AS inc FROM $tbl),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_id, b2.doc_id AS dup_of
       |  FROM banded a JOIN flags fa ON fa.doc_id = a.doc_id AND fa.inc
       |  JOIN banded b2 ON a.band_idx = b2.band_idx AND a.band_key = b2.band_key
       |  JOIN flags fb ON fb.doc_id = b2.doc_id AND NOT fb.inc)
       |SELECT doc_id, dup_of, jaccard FROM (
       |  SELECT c.doc_id, c.dup_of,
       |    round(len(list_distinct(list_intersect(ga.grams, gb.grams)))::DOUBLE
       |      / (len(ga.grams) + len(gb.grams)
       |         - len(list_distinct(list_intersect(ga.grams, gb.grams)))), 6) AS jaccard
       |  FROM cand c JOIN sh ga ON ga.doc_id = c.doc_id JOIN sh gb ON gb.doc_id = c.dup_of)
       |WHERE jaccard >= $threshold""".stripMargin

  /** TEST-SET DECONTAMINATION — flag training documents sharing any
    * word n-gram with a held-out evaluation set (rows matching
    * `evalPred`): the standard benchmark-leakage sweep a training-data
    * pipeline runs before every release. Output: one row per
    * contaminated training doc with its distinct-overlapping-gram count
    * — (doc_id, n_hits).
    *
    * Scale shape: the eval side collapses to a DISTINCT gram set that
    * is tiny relative to the corpus (benchmarks are KBs, corpora are
    * TBs), so the probe is a broadcast/equi-join of training grams
    * against it — work ∝ corpus gram count, never corpus × eval; the
    * count rides a map-side-combined groupBy on doc_id. `n` is the
    * usual knob (8-13-grams in production; the structure is
    * n-independent). Grams come from the shared [[gramsOf]] (native
    * codegen'd expression when registered). */
  def decontaminate(docs: DataFrame, evalPred: Column, n: Int): DataFrame = {
    val flags = docs.select(col("doc_id"), evalPred.as("ev"))
    // referenced twice (eval-gram set + training probe) -> materialize
    // so the per-row-expensive shingle pipeline runs once, not per side
    val exploded = Mat.materialize(gramsOf(docs, n).join(flags, "doc_id")
      .select(col("doc_id"), col("ev"), explode(col("grams")).as("gram")))
    val evalGrams = exploded.filter(col("ev")).select(col("gram")).distinct()
    exploded.filter(!col("ev")).as("t")
      .join(evalGrams.as("e"), col("t.gram") === col("e.gram"))
      .groupBy(col("t.doc_id").as("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** DuckDB oracle for [[decontaminate]] (per-doc grams are distinct,
    * so plain count(*) after the gram join counts distinct hits). */
  def decontaminateSql(tbl: String, evalSql: String, n: Int): String =
    s"""WITH sh AS (
       |  SELECT doc_id, list_distinct(${Portable.shinglesSql("text", n)}) AS grams FROM $tbl),
       |flags AS (SELECT doc_id, ($evalSql) AS ev FROM $tbl),
       |ex AS (SELECT s.doc_id, f.ev, unnest(s.grams) AS gram
       |  FROM sh s JOIN flags f ON s.doc_id = f.doc_id),
       |eg AS (SELECT DISTINCT gram FROM ex WHERE ev)
       |SELECT t.doc_id, count(*)::BIGINT AS n_hits
       |FROM ex t JOIN eg ON t.gram = eg.gram WHERE NOT t.ev GROUP BY t.doc_id""".stripMargin

  /** Near-dup CLUSTER RESOLUTION — the step after pair generation that a
    * real dedup pipeline actually runs: near-dup pairs are transitive in
    * intent (A~B and B~C must dedup A, B, C together), so pairs fold
    * into connected components and each doc maps to its component's
    * canonical keep-id (the minimum doc_id — deterministic).
    *
    * Iterative hash-min label propagation in DataFrames: every round
    * each node takes the min label over {itself} ∪ neighbors ∪ {its
    * label's label} (pointer doubling). Each round is TWO equi-joins
    * (edges ⋈ labels on the neighbor id; labels ⋈ labels for the path
    * halving) + ONE min-aggregation — no graph library, no cross join,
    * no driver-side adjacency — and the pointer-doubling term turns
    * O(diameter) convergence into O(log diameter) rounds, so even
    * adversarially long chains converge fast. Intermediates are
    * rebased per round ([[Mat.materializeIter]]) so the logical plan
    * does NOT grow with iterations (each round references the previous
    * twice — without truncation the plan doubles per round), and the
    * convergence check (count of changed labels) doubles as the
    * materialization barrier. At 100 TB every round is shuffle-bound
    * on |edges|, the same cost class as the pair join that produced
    * the input.
    *
    * Input: (doc_a, doc_b, ...) pairs. Output: (doc_id, cluster_id),
    * one row per doc that appears in at least one pair; singleton docs
    * are their own cluster by definition (callers left-join the corpus
    * if they need them listed). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = Mat.materialize(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))))
    // materializeIter is load-bearing: each round references `labels`
    // twice (union + join), so without the plan-truncating rebase the
    // logical plan doubles per round and Catalyst re-analysis goes
    // exponential long before the data does
    var labels = Mat.materializeIterReleasable(
      edges.select(col("src").as("id")).distinct().withColumn("label", col("id")))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      iter += 1
      val viaNeighbors = edges.join(labels.df, edges("dst") === labels.df("id"))
        .select(edges("src").as("id"), col("label"))
      // pointer doubling (path halving): also adopt the label OF the
      // current label, turning O(diameter) convergence into O(log
      // diameter) rounds — one extra equi-join on the same small table
      val viaParent = labels.df.as("x").join(labels.df.as("y"), col("x.label") === col("y.id"))
        .select(col("x.id").as("id"), col("y.label").as("label"))
      val next = Mat.materializeIterReleasable(
        labels.df.union(viaNeighbors).union(viaParent)
          .groupBy(col("id")).agg(min(col("label")).as("label")))
      // convergence check forces `next`, then the superseded round's
      // cache is released eagerly — over 50 rounds the old label
      // tables would otherwise accumulate in the CacheManager
      changed = next.df.as("n").join(labels.df.as("o"), "id")
        .filter(col("n.label") =!= col("o.label")).count()
      labels.release()
      labels = next
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    val out = labels.df.select(col("id").as("doc_id"), col("label").as("cluster_id"))
    edges.unpersist(blocking = false) // rounds are done; result lineage survives
    out
  }

  /** DuckDB oracle for [[connectedComponents]] over the pairs produced
    * by `ctes` (a chain ending in `mhpairs` — see
    * [[minhashPairsCtesSql]]): a recursive CTE enumerates every
    * (node, reachable node) pair, and min(reachable) per node is the
    * component's canonical keep-id. */
  def connectedComponentsSql(ctes: String): String =
    s"""WITH RECURSIVE $ctes,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM mhpairs
       |  UNION SELECT doc_b, doc_a FROM mhpairs),
       |walk(id, label) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.src, w.label FROM edges e JOIN walk w ON e.dst = w.id)
       |SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id""".stripMargin

  /** (doc_id, grams) — distinct word n-gram shingles per doc, via the
    * native graft_shingles when available (one generated call per row)
    * else the staged portable projections; value-identical. */
  private[operators] def gramsOf(docs: DataFrame, n: Int): DataFrame = {
    val base = docs.select(col("doc_id"), col("text")).repartition(col("doc_id"))
    if (nativeOk(docs, "graft_shingles"))
      base.select(col("doc_id"),
        array_distinct(call_function("graft_shingles", col("text"), lit(n))).as("grams"))
    else base
      .select(col("doc_id"), Portable.words(col("text")).as("ws"))
      .select(col("doc_id"), array_distinct(Portable.shinglesFromWords(col("ws"), n)).as("grams"))
  }

  /** (doc_id, sig, grams) in ONE pass — the fused form of
    * [[bandedRaw]]'s signature stage + [[gramsOf]] for callers that
    * need both (the LSH index probes with the signature AND verifies/
    * appends with the gram sets): one repartition, one persistable
    * frame, the per-row shingle pipeline run once per doc instead of
    * twice. `shuffled = true` skips the parallelism repartition when
    * the caller already hash-partitioned by doc_id (e.g. a
    * dropDuplicates directly upstream — same key, so no second
    * exchange). */
  private[operators] def sigAndGrams(docs: DataFrame, n: Int, k: Int,
      shuffled: Boolean = false): DataFrame = {
    val base0 = docs.select(col("doc_id"), col("text"))
    val base = if (shuffled) base0 else base0.repartition(col("doc_id"))
    if (nativeOk(docs, "graft_minhash") && nativeOk(docs, "graft_shingles"))
      base.select(col("doc_id"),
        call_function("graft_minhash", col("text"), lit(n), lit(k)).as("sig"),
        array_distinct(call_function("graft_shingles", col("text"), lit(n))).as("grams"))
    else base
      .select(col("doc_id"), Portable.words(col("text")).as("ws"))
      .select(col("doc_id"), Portable.shinglesFromWords(col("ws"), n).as("sh"))
      // minhash over the multiset == over the set (min ignores dups),
      // so hashing the raw shingles matches bandedRaw exactly
      .select(col("doc_id"), transform(col("sh"), s => Portable.hash32(s)).as("hs"),
        array_distinct(col("sh")).as("grams"))
      .select(col("doc_id"), sigFromHashes(col("hs"), k).as("sig"), col("grams"))
  }

  /** |A ∩ B| / |A ∪ B| over two array columns (callers pass distinct'd
    * arrays). Integer set sizes => the double division is IEEE-exact and
    * identical across engines. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0d, lit(1d)).otherwise(inter / union)
  }

  /** Hex digits whose nibble value has bit k set (k = 0 is the LSB):
    * bit b of a word's 64-bit sign vector reads bit (b mod 4) of md5
    * nibble (b div 4). Shared between the Spark expression and the
    * DuckDB SQL so both extract identical coins. */
  private[operators] val NibbleBitSet =
    Array("13579bdf", "2367abef", "4567cdef", "89abcdef")

  /** 64-bit SimHash of the word multiset of `text`: bit b is set when
    * Σ_words sign_b(word) >= 0. All 64 signs of a word come from ONE
    * md5 digest — sign_b tests bit (b mod 4) of hex nibble (b div 4)
    * (each md5 bit is an unbiased coin), so 16 nibbles yield 64 coins
    * with zero extra hashing. 64 bits (vs the round-2 32) keeps the
    * signature space from saturating with coincidental collisions
    * beyond ~10⁵ docs and gives the banded join 16-bit band values
    * (65 536 shuffle keys per band instead of 256) — the scale
    * parameterization, not a toy one. Pure array expressions — no
    * explode, no UDF.
    *
    * HOF-interpretation trap avoided: the inner
    * `transform(array(md5(w)), m => ...)` binds the digest to a lambda
    * VARIABLE, so the 64 nibble reads reference `m` cheaply instead of
    * re-hashing per bit (interpreted lambdas have no subexpression
    * elimination — see [[graft.functions.Portable]] notes). */
  def simhash64(text: Column): Column = {
    // per word: one digest -> a 64-element ±1 sign vector
    val signVecs = transform(Portable.words(text), w =>
      element_at(
        transform(array(md5(w)), m =>
          array((0 until 64).map { b =>
            val nib = m.substr(lit(b / 4 + 1), lit(1))
            when(lit(NibbleBitSet(b % 4)).contains(nib), lit(1)).otherwise(lit(-1))
          }: _*)),
        1))
    // element-wise sum of sign vectors, then positional bit weights.
    // Bit 63's weight is Long.MinValue (two's complement sign bit); the
    // mathematical sum of any weight subset stays within long range, so
    // no intermediate overflow exists under ANSI arithmetic.
    val zeros = typedlit(Seq.fill(64)(0))
    val sums = aggregate(signVecs, zeros, (acc, v) => zip_with(acc, v, (a, b) => a + b))
    val powers = typedlit((0 until 64).map(b => 1L << b)) // 1L<<63 == Long.MinValue
    aggregate(zip_with(sums, powers, (s, p) => when(s >= 0, p).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
  }

  /** DuckDB SQL computing `simhash64` per doc_id over table `tbl` —
    * the unnest/group-by formulation of the same function. DuckDB sums
    * BIGINT into HUGEINT, so the bit-63 weight is spelled as the exact
    * BIGINT literal and the total (always in long range) casts back. */
  def simhash64Sql(tbl: String): String = {
    val nibbleSet = "CASE (b.bit % 4) WHEN 0 THEN '13579bdf' WHEN 1 THEN '2367abef' " +
      "WHEN 2 THEN '4567cdef' ELSE '89abcdef' END"
    s"""WITH w AS (
       |  SELECT doc_id, unnest(${Portable.wordsSql("text")}) AS word FROM $tbl
       |), m AS (SELECT doc_id, md5(word) AS m FROM w
       |), bits AS (
       |  SELECT m.doc_id, b.bit,
       |    sum(CASE WHEN contains($nibbleSet, substr(m.m, CAST(b.bit // 4 + 1 AS INT), 1))
       |        THEN 1 ELSE -1 END) AS s
       |  FROM m CROSS JOIN (SELECT unnest(range(64)) AS bit) b
       |  GROUP BY m.doc_id, b.bit
       |)
       |SELECT doc_id, sum(CASE WHEN s >= 0 THEN
       |    (CASE WHEN bit = 63 THEN -9223372036854775807 - 1 ELSE (1::BIGINT << bit) END)
       |  ELSE 0 END)::BIGINT AS simhash
       |FROM bits GROUP BY doc_id""".stripMargin
  }

  /** SimHash near-duplicate pairs via BANDED candidate generation: the
    * 64-bit signature splits into `bands` equal bit-bands; two docs
    * within Hamming distance `maxHamming < bands` MUST share at least
    * one band (pigeonhole), so the candidate join is a hash shuffle on
    * (band_idx, band_bits) — never an all-pairs comparison — and is
    * LOSSLESS for the verified distance. Verification is a cheap
    * `bit_count(xor)` on the candidate set.
    *
    * `maxBucketSize` is the same mega-bucket cap as
    * [[minhashLshPairs]]: a band value shared by a boilerplate-heavy
    * corpus would otherwise go quadratic in one task, so buckets above
    * the cap are dropped before the self-join (a bucket that large
    * carries mass, not similarity, and a true near-dup pair still has
    * bands-1 other chances to collide). The count rides a window over
    * the same shuffle key as the join — no extra exchange. With the
    * default 4 bands the band values are 16-bit (65 536 keys per
    * band), so cap engagement at healthy corpora is rare.
    * Returns (doc_a, doc_b, hamming), doc_a < doc_b. */
  def simhashNearDup(docs: DataFrame, bands: Int = 4, maxHamming: Int = 3,
      maxBucketSize: Int = 1000): DataFrame = {
    require(64 % bands == 0, s"bands=$bands must divide 64")
    require(maxHamming < bands,
      s"maxHamming=$maxHamming needs > $maxHamming bands for lossless banding (got $bands)")
    val bandBits = 64 / bands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    // repartition a possibly-single-file input, then cut to the narrow
    // (doc_id, sig) table the self-join ships; the signature is the
    // native codegen'd graft_simhash64 when available, else the
    // portable HOF formulation — value-identical
    val sigExpr =
      if (nativeOk(docs, "graft_simhash64")) call_function("graft_simhash64", col("text"))
      else simhash64(col("text"))
    val sig = Mat.materialize(docs
      .select(col("doc_id"), col("text")).repartition(col("doc_id"))
      .select(col("doc_id"), sigExpr.as("sig")))
    // shiftright is arithmetic, but the mask strips any sign extension
    val banded = sig.select(col("doc_id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band_idx"),
          shiftright(col("sig"), b * bandBits).bitwiseAND(lit(mask)).as("band_val"))
      }: _*)).as("band"))
      .select(col("doc_id"), col("sig"), col("band.band_idx"), col("band.band_val"))
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band_idx"), col("band_val"))))
      .filter(col("bucket_n") <= maxBucketSize)
      .drop("bucket_n")
    banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** DuckDB SQL for [[simhashNearDup]] — the banding is lossless for
    * `maxHamming < bands`, so the oracle can verify against the direct
    * all-pairs formulation (exact same result set; the bucket cap
    * cannot engage at oracle scale, where no band bucket can reach the
    * default 1000). */
  def simhashNearDupSql(tbl: String, maxHamming: Int): String =
    s"""WITH s AS (${simhash64Sql(tbl)})
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  bit_count(xor(a.simhash, b.simhash)) AS hamming
       |FROM s a JOIN s b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming""".stripMargin

  /** n-gram Jaccard of a small anchor set vs the corpus, as an INVERTED
    * INDEX join (the scalable sparse-similarity shape): explode shingles
    * on both sides, equi-join on the shingle (anchors broadcast), count
    * matches per pair, then jaccard from |A|+|B|-|A∩B|. Never builds a
    * pair×array intersection — work is proportional to the number of
    * shared shingle occurrences, and the join is a hash lookup per
    * shingle. Pairs with zero overlap never materialize (they can't
    * clear any threshold > 0).
    * Returns (anchor_id, doc_id, jaccard) for jaccard >= threshold. */
  def anchorJaccard(docs: DataFrame, anchorPred: Column, n: Int, threshold: Double): DataFrame = {
    require(threshold > 0, "inverted-index jaccard needs threshold > 0")
    // repartition a possibly-single-file input, materialize the grams
    // once: both the anchor side and the exploded corpus derive from it
    // (shingling re-evaluation dominates otherwise)
    val corpus = Mat.materialize(gramsOf(docs, n))
    val anchors = corpus.filter(anchorPred)
      .select(col("doc_id").as("anchor_id"), size(col("grams")).as("alen"),
        explode(col("grams")).as("gram"))
    val exploded = corpus.select(col("doc_id"), size(col("grams")).as("len"),
      explode(col("grams")).as("gram"))
    exploded.join(broadcast(anchors), "gram")
      .filter(col("anchor_id") < col("doc_id"))
      .groupBy(col("anchor_id"), col("doc_id"), col("alen"), col("len"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("alen") + col("len") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("anchor_id"), col("doc_id"), col("jaccard"))
  }

  /** EXACT DUPLICATED-SPAN detection — the positional complement of the
    * whole-document near-dup family (the "exact substring dedup" pass of
    * LLM data pipelines, cf. Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better"): a word n-gram occurring at a
    * position in ≥ `minDf` DISTINCT documents marks that position as a
    * cross-corpus duplicated span (boilerplate headers, license blocks,
    * quoted chain mail — text MinHash under-weights because the rest of
    * the doc is unique). Output per doc: total gram positions, how many
    * sit inside a duplicated span, and the duplicated fraction — the
    * signal used either to filter whole docs or to drive span excision.
    *
    * Scale shape: positional grams come from ONE `posexplode` generator
    * per doc (the words array is staged once and never rides the
    * exploded rows); the doc-frequency table is a two-level aggregate
    * (distinct (gram, doc_id) with map-side partial, then a count) and
    * the join back is a plain equi-join — work ∝ corpus gram positions,
    * never corpus². At 100 TB the gram STRING is the shuffle weight:
    * swap the join key to `xxhash64(gram)` (8 bytes, collision odds
    * ~n²/2⁶⁴ — fine for a filter signal) or the codegen'd
    * `graft_shingles`; kept as the string here so DuckDB verifies the
    * values exactly. */
  def dupSpans(docs: DataFrame, n: Int, minDf: Int): DataFrame = {
    require(n >= 1 && minDf >= 2, s"dupSpans(n=$n, minDf=$minDf)")
    val staged = docs
      .select(col("doc_id"), Portable.words(col("text")).as("ws"))
      .select(col("doc_id"), Portable.shinglesFromWords(col("ws"), n).as("grams"))
    // (doc_id, pos, gram) — one generator, nothing wide on exploded rows
    val positions = Mat.materialize(staged.select(col("doc_id"),
      posexplode(col("grams")).as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("gram")))
    val dupGrams = positions.select(col("gram"), col("doc_id")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select(col("gram"))
    val hits = positions.join(dupGrams, Seq("gram"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_positions"))
    positions.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_dup_positions"), lit(0L)).as("n_dup_positions"))
      .withColumn("dup_fraction",
        round(col("n_dup_positions").cast("double") / col("n_grams"), 6))
  }

  /** PARAGRAPH-LEVEL keep-first dedup — the C4/RefinedWeb "line dedup"
    * pass: every paragraph occurring more than once in the corpus is
    * kept only at its FIRST occurrence (min (doc_id, position)) and
    * removed everywhere else, then each document is rewritten from its
    * surviving paragraphs. Complements [[dupSpans]] (which *scores*
    * positional duplication) by actually performing the edit with
    * global keep-first semantics. The corpus here has no newline
    * structure, so paragraphs are disjoint `paraLen`-word windows; a
    * real corpus passes its own boundary (split on '\n') — everything
    * downstream of the explode is boundary-agnostic.
    *
    * Scale shape: ONE generator explodes paragraphs in the scan task;
    * the keeper per paragraph is `min(struct(doc_id, pos))` — an
    * AGGREGATE with map-side partials, not a window, so a boilerplate
    * paragraph shared by millions of docs partial-aggregates inside
    * each input partition instead of funneling into one window task;
    * the equi-join back on the paragraph string is the only other
    * shuffle. Rewritten text is assembled per doc from the kept
    * paragraphs in position order (array_sort over (pos, para) structs
    * — no second window). At 100 TB, join on `xxhash64(para)` instead
    * of the string to cut shuffle weight (kept as the string so DuckDB
    * verifies values).
    *
    * Output: (doc_id, n_paras, n_kept, kept_fraction, dedup_text). */
  def paragraphDedup(docs: DataFrame, paraLen: Int): DataFrame = {
    require(paraLen >= 1, s"paraLen=$paraLen")
    val paras = Mat.materialize(docs
      .select(col("doc_id"), Portable.words(col("text")).as("ws"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, (size(ws) - 1) DIV $paraLen),
           |  k -> concat_ws(' ', slice(ws, CAST(k * $paraLen + 1 AS INT), $paraLen)))"""
          .stripMargin)).as(Seq("pos", "para"))))
    val keepers = paras.groupBy(col("para"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("k"))
    paras.join(keepers, Seq("para"))
      .withColumn("keep", col("doc_id") === col("k.doc_id") && col("pos") === col("k.pos"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_paras"),
        sum(col("keep").cast("long")).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("keep"), struct(col("pos"), col("para"))))),
          s => s.getField("para")), " ").as("dedup_text"))
      .withColumn("kept_fraction",
        round(col("n_kept").cast("double") / col("n_paras"), 6))
      .select(col("doc_id"), col("n_paras"), col("n_kept"), col("kept_fraction"),
        col("dedup_text"))
  }

  /** DuckDB oracle for [[paragraphDedup]] (keep-first = row_number 1
    * over (doc_id, pos) per paragraph — identical to the min-struct
    * keeper; string_agg with ORDER BY rebuilds the text; coalesce
    * matches Spark's '' for fully-deduped docs). */
  def paragraphDedupSql(tbl: String, paraLen: Int): String = {
    val ws = Portable.wordsSql("text")
    s"""WITH p AS (
       |  SELECT doc_id, k::INT AS pos,
       |    array_to_string(list_slice(ws, k * $paraLen + 1, k * $paraLen + $paraLen), ' ')
       |      AS para
       |  FROM (SELECT doc_id, ws, unnest(range(0, (len(ws) - 1) // $paraLen + 1)) AS k
       |        FROM (SELECT doc_id, $ws AS ws FROM $tbl))),
       |m AS (SELECT *, row_number() OVER (
       |        PARTITION BY para ORDER BY doc_id, pos) = 1 AS keep FROM p)
       |SELECT doc_id, count(*)::BIGINT AS n_paras,
       |  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       |  round(sum(CASE WHEN keep THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS kept_fraction,
       |  coalesce(string_agg(para, ' ' ORDER BY pos) FILTER (WHERE keep), '') AS dedup_text
       |FROM m GROUP BY doc_id""".stripMargin
  }

  /** DuckDB oracle for [[dupSpans]] over table/CTE `tbl`. */
  def dupSpansSql(tbl: String, n: Int, minDf: Int): String =
    s"""WITH g AS (
       |  SELECT doc_id, ${Portable.shinglesSql("text", n)} AS grams FROM $tbl),
       |pos AS (
       |  SELECT doc_id, unnest(range(1, len(grams) + 1)) AS pos,
       |         unnest(grams) AS gram FROM g),
       |dup AS (
       |  SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM pos)
       |  GROUP BY gram HAVING count(*) >= $minDf),
       |hits AS (
       |  SELECT p.doc_id AS doc_id, count(*)::BIGINT AS n_dup_positions
       |  FROM pos p JOIN dup d ON p.gram = d.gram GROUP BY p.doc_id)
       |SELECT p.doc_id AS doc_id, count(*)::BIGINT AS n_grams,
       |  coalesce(any_value(h.n_dup_positions), 0)::BIGINT AS n_dup_positions,
       |  round(coalesce(any_value(h.n_dup_positions), 0)::DOUBLE / count(*), 6)
       |    AS dup_fraction
       |FROM pos p LEFT JOIN hits h ON p.doc_id = h.doc_id
       |GROUP BY p.doc_id""".stripMargin
}
