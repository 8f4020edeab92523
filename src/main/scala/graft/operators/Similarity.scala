package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Two paths, mirroring how a 100 TB pipeline would run them:
 *  - [[bruteForceTopK]] — exact cosine top-k of a SMALL anchor set
 *    against the full corpus: anchors broadcast (one row per anchor per
 *    executor), the corpus is streamed through a single narrow pass, and
 *    the per-anchor top-k is a PARTIAL-AGGREGATE top-k: each input
 *    partition keeps only its own k best per anchor (bounded state),
 *    then ≤ k·partitions rows merge per anchor — never a global
 *    per-anchor sort of the full anchor×corpus score set (the windowed
 *    `row_number` formulation funnels all N scores of an anchor through
 *    one task; this one funnels k·partitions).
 *  - [[lshTopK]] — random-hyperplane signatures: each vector gets a
 *    `bits`-bit bucket id (sign of <w_j, v> for fixed deterministic
 *    hyperplanes w_j); candidates come from the anchor's bucket plus all
 *    buckets within Hamming distance `probe` (multi-probe: recovers the
 *    recall that more bits cost, without more tables). The join stays a
 *    hash shuffle on the bucket id; the quadratic term is bounded by
 *    bucket occupancy (corpus/2^bits on average), and `bits` is the
 *    scale knob — 2^bits buckets must comfortably exceed the cluster's
 *    task count.
 *  - [[nearDupPairs]] — L independent `bits`-bit tables (standard LSH
 *    OR-amplification): a pair is a candidate when ANY table buckets it
 *    together, then exact cosine verifies. Each table is an equi-join;
 *    recall is tunable by L without touching the plan shape.
 *  - [[recallAtK]] — measured recall of the approximate path against
 *    the exact baseline, the number that justifies the approximation.
 *
 * Hyperplane weights are ±1 coins drawn from md5 of the constant string
 * "j_d" (hyperplane j, dimension d) at PLAN time — the Spark plan and
 * the DuckDB oracle SQL inline the same literal weights, so results are
 * verifiable value-for-value. All dot products run in double precision
 * and similarities are rounded to 6 dp before ranking, with vec_id as
 * the deterministic tiebreak (IEEE summation-order differences between
 * engines live far below 1e-6).
 */
object Similarity {

  /** Deterministic ±1 hyperplane weights: sign from the first hex digit
    * of md5("j_d") — same derivation as [[graft.functions.Portable.sign]]
    * but evaluated at plan time over constants. */
  def planeWeights(bits: Int, dim: Int): Array[Array[Double]] = {
    val mdt = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(bits, dim) { (j, d) =>
      val hex = mdt.digest(s"${j}_$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (hex.charAt(0) < '8') 1.0 else -1.0
    }
  }

  /** <v, w> for a literal weight vector, as a left-fold in double. */
  private def dotLit(v: Column, w: Array[Double]): Column =
    aggregate(
      zip_with(v, typedlit(w.toSeq), (x, y) => x.cast("double") * y),
      lit(0.0), (acc, x) => acc + x)

  /** Left-fold dot product of two double-array columns. */
  def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Project (vec_id, emb: array<double>, nrm) — norms computed ONCE per
    * vector instead of once per compared pair (the second select keeps
    * the cast array out of triple evaluation via CollapseProject's
    * non-cheap-expression rule). */
  private[operators] def withNorm(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"), col("emb"), sqrt(dot(col("emb"), col("emb"))).as("nrm"))

  /** `bits`-bit LSH bucket id of an embedding column, planes
    * `planeOffset until planeOffset+bits` (the offset gives independent
    * tables for OR-amplification). */
  def lshBucket(v: Column, bits: Int, dim: Int, planeOffset: Int = 0): Column = {
    val w = planeWeights(planeOffset + bits, dim)
    (0 until bits).map { j =>
      when(dotLit(v, w(planeOffset + j)) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** DuckDB SQL for the same bucket id over expression `e` (a DOUBLE[]
    * of length `dim`). */
  def lshBucketSql(e: String, bits: Int, dim: Int, planeOffset: Int = 0): String = {
    val w = planeWeights(planeOffset + bits, dim)
    (0 until bits).map { j =>
      val lits = w(planeOffset + j).map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"(CASE WHEN list_sum(list_transform(range(1, ${dim + 1}), i -> ($e)[i] * ($lits::DOUBLE[])[i])) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** Rounded similarity from pre-normed sides: dot/(nrmA*nrmB). */
  private[operators] def simExpr(aEmb: Column, bEmb: Column, aNrm: Column, bNrm: Column): Column =
    round(dot(aEmb, bEmb) / (aNrm * bNrm), 6)

  /** DuckDB SQL: 6-dp rounded cosine of two DOUBLE[] expressions. */
  def simSql(x: String, y: String): String =
    s"""round(list_sum(list_transform(range(1, len($x)+1), i -> ($x)[i] * ($y)[i]))
       |      / (sqrt(list_sum(list_transform(range(1, len($x)+1), i -> ($x)[i]*($x)[i])))
       |       * sqrt(list_sum(list_transform(range(1, len($y)+1), i -> ($y)[i]*($y)[i])))), 6)""".stripMargin

  /** DuckDB CTE chain (prefix `p` for uniqueness) mirroring [[lshTopK]]'s
    * candidate generation + ranking over a CTE `e(vec_id, emb)`:
    * `<p>rk(anchor_id, neighbor_id, sim, rank)`. Multi-table/multi-probe
    * collapses to `OR_t bit_count(xor(bucket_t(a), bucket_t(c))) <= probe`
    * — the exact same candidate set, pairs naturally deduped. */
  def lshRankCtesSql(p: String, anchorWhere: String, bits: Int, dim: Int,
      probe: Int, tables: Int): String = {
    val bdefs = (0 until tables)
      .map(t => s"${lshBucketSql("emb", bits, dim, planeOffset = t * bits)} AS b$t")
      .mkString(", ")
    val cond = (0 until tables)
      .map(t => s"bit_count(xor(a.b$t, c.b$t)) <= $probe").mkString("(", " OR ", ")")
    s"""${p}bkt AS (SELECT vec_id, emb, $bdefs FROM e),
       |${p}anc AS (SELECT * FROM ${p}bkt WHERE $anchorWhere),
       |${p}sc AS (SELECT a.vec_id AS anchor_id, c.vec_id AS neighbor_id,
       |    ${simSql("a.emb", "c.emb")} AS sim
       |  FROM ${p}bkt c JOIN ${p}anc a ON $cond AND c.vec_id <> a.vec_id),
       |${p}rk AS (SELECT anchor_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY anchor_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM ${p}sc)""".stripMargin
  }

  /** Distributed top-k of `scored` (anchor_id, neighbor_id, sim) rows
    * per anchor. Returns (anchor_id, rank, neighbor_id, sim) ordered
    * by sim desc with neighbor_id as the deterministic tiebreak.
    *
    * Preferred plan: ONE `groupBy(anchor).agg(graft_topk(entry, k))` on
    * the native k-bounded heap aggregate ([[graft.functions
    * .BoundedTopK]], registered by GraftExtensions) — per-group state
    * is k entries at BOTH the map-side partial and the final merge, so
    * a huge or skewed partition cannot blow an aggregation buffer.
    * Fallback (extension absent, or `spark.graft.nativeTopK=false`):
    * the portable two-level collect_list formulation — per-partition
    * k-truncation then a ≤ k·partitions merge per anchor; its level-1
    * buffers are (anchor × partition)-sized before the slice, which is
    * bounded in the usual case but not by k. Both plans are
    * value-identical (same (negSim, neighbor_id) total order). */
  private[operators] def partialTopK(scored: DataFrame, k: Int): DataFrame = {
    // NaN sims (zero-norm vectors) must rank FIRST to match `ORDER BY
    // sim DESC` in both Spark's window ordering and the DuckDB oracle
    // (both treat NaN as greater than any number) — but -NaN is still
    // NaN and would sort LAST in the ascending struct sort, so map it
    // to -Infinity explicitly
    val negSim = when(isnan(col("sim")), lit(Double.NegativeInfinity)).otherwise(-col("sim"))
    val entry = struct(negSim.as("negSim"),
      col("neighbor_id").cast("long").as("neighbor_id"), col("sim").as("sim"))
    val spark = scored.sparkSession
    val useNative = spark.conf.getOption("spark.graft.nativeTopK").forall(_ != "false") &&
      spark.catalog.functionExists("graft_topk")
    val topPerAnchor =
      if (useNative)
        scored.groupBy(col("anchor_id"))
          .agg(call_function("graft_topk", entry, lit(k)).as("top"))
      else {
        val local = scored
          .groupBy(col("anchor_id"), spark_partition_id().as("_p"))
          .agg(slice(array_sort(collect_list(entry)), 1, k).as("top"))
        local.select(col("anchor_id"), explode(col("top")).as("t"))
          .select(col("anchor_id"), col("t.negSim").as("negSim"),
            col("t.neighbor_id").as("neighbor_id"), col("t.sim").as("sim"))
          .groupBy(col("anchor_id"))
          .agg(slice(array_sort(collect_list(struct(col("negSim"), col("neighbor_id"), col("sim")))),
            1, k).as("top"))
      }
    topPerAnchor
      .select(col("anchor_id"), posexplode(col("top")))
      .select(col("anchor_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.neighbor_id").as("neighbor_id"), col("col.sim").as("sim"))
  }

  /** Exact top-k: anchors (rows matching `anchorPred`) vs full corpus.
    * Returns (anchor_id, rank, neighbor_id, sim). */
  def bruteForceTopK(emb: DataFrame, anchorPred: Column, k: Int): DataFrame = {
    val corpus = withNorm(emb)
    val anchors = corpus.filter(anchorPred)
      .select(col("vec_id").as("anchor_id"), col("emb").as("aemb"), col("nrm").as("anrm"))
    val scored = corpus.join(broadcast(anchors), col("anchor_id") =!= col("vec_id"))
      .select(col("anchor_id"), col("vec_id").as("neighbor_id"),
        simExpr(col("aemb"), col("emb"), col("anrm"), col("nrm")).as("sim"))
    partialTopK(scored, k)
  }

  /** Probe buckets within Hamming distance `probe` (0..2) of `bucket`. */
  private def probeSet(bucket: Column, bits: Int, probe: Int): Seq[Column] = {
    require(probe >= 0 && probe <= 2, "probe: 0 (exact), 1 (±1 bit), or 2 (±2 bits)")
    val flips1 = (0 until bits).map(i => bucket.bitwiseXOR(lit(1L << i)))
    val flips2 = for (i <- 0 until bits; j <- i + 1 until bits)
      yield bucket.bitwiseXOR(lit((1L << i) | (1L << j)))
    probe match {
      case 0 => Seq(bucket)
      case 1 => bucket +: flips1
      case 2 => (bucket +: flips1) ++ flips2
    }
  }

  /** Approximate top-k: candidates = vectors sharing a bucket with the
    * anchor in ANY of `tables` independent `bits`-bit LSH tables, where
    * the anchor probes all buckets within Hamming distance `probe`
    * (multi-probe). Tables × probes buy recall; `bits` bounds bucket
    * occupancy (the scale knob). Candidate IDs are dedup'd BEFORE
    * scoring, so each (anchor, neighbor) pair is scored once no matter
    * how many tables/probes it collided in. Same output shape as
    * [[bruteForceTopK]]. */
  def lshTopK(emb: DataFrame, anchorPred: Column, k: Int, bits: Int, dim: Int,
      probe: Int = 1, tables: Int = 1): DataFrame = {
    val base = withNorm(emb)
    def tableBuckets(): Column = explode(array((0 until tables).map { t =>
      struct(lit(t).as("table_id"),
        lshBucket(col("emb"), bits, dim, planeOffset = t * bits).as("bucket"))
    }: _*))
    // narrow (vec_id, table_id, bucket) postings — embeddings don't ride
    // through the candidate join
    val corpusBuckets = base.select(col("vec_id"), tableBuckets().as("tb"))
      .select(col("vec_id"), col("tb.table_id").as("table_id"), col("tb.bucket").as("bucket"))
    val anchorProbes = base.filter(anchorPred)
      .select(col("vec_id").as("anchor_id"), tableBuckets().as("tb"))
      .select(col("anchor_id"), col("tb.table_id").as("table_id"),
        explode(array(probeSet(col("tb.bucket"), bits, probe): _*)).as("bucket"))
    val cand = corpusBuckets.join(broadcast(anchorProbes), Seq("table_id", "bucket"))
      .filter(col("anchor_id") =!= col("vec_id"))
      .select(col("anchor_id"), col("vec_id").as("neighbor_id"))
      .distinct()
    val anchorEmb = base.filter(anchorPred)
      .select(col("vec_id").as("anchor_id"), col("emb").as("aemb"), col("nrm").as("anrm"))
    val scored = cand.join(base, col("neighbor_id") === col("vec_id"))
      .join(broadcast(anchorEmb), Seq("anchor_id"))
      .select(col("anchor_id"), col("neighbor_id"),
        simExpr(col("aemb"), col("emb"), col("anrm"), col("nrm")).as("sim"))
    partialTopK(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs: candidates share a bucket
    * in ANY of `tables` independent `bits`-bit LSH tables
    * (OR-amplification), verified by cosine >= threshold. Returns
    * (vec_a, vec_b, sim), vec_a < vec_b. Each table's candidate join is
    * a hash shuffle; `bits` bounds bucket occupancy, `tables` buys
    * recall. */
  def nearDupPairs(emb: DataFrame, threshold: Double, bits: Int, dim: Int,
      tables: Int = 2): DataFrame = {
    val bucketed = withNorm(emb).select(col("vec_id"), col("emb"), col("nrm"),
      explode(array((0 until tables).map { t =>
        struct(lit(t).as("table_id"),
          lshBucket(col("emb"), bits, dim, planeOffset = t * bits).as("bucket"))
      }: _*)).as("tb"))
      .select(col("vec_id"), col("emb"), col("nrm"),
        col("tb.table_id").as("table_id"), col("tb.bucket").as("bucket"))
    val a = bucketed.as("a")
    val b = bucketed.as("b")
    // distinct BEFORE scoring: a pair colliding in several tables is
    // scored once, and the (tiny) candidate id-set dedups cheaply
    val cand = a.join(b,
        col("a.table_id") === col("b.table_id") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    val sides = withNorm(emb)
    cand.join(sides.as("x"), col("vec_a") === col("x.vec_id"))
      .join(sides.as("y"), col("vec_b") === col("y.vec_id"))
      .select(col("vec_a"), col("vec_b"),
        simExpr(col("x.emb"), col("y.emb"), col("x.nrm"), col("y.nrm")).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Deterministic ±1 centroid directions for the IVF cells — a
    * different md5 salt family ("c<j>_<d>") than the LSH planes so the
    * two structures are independent. */
  def centroidWeights(cells: Int, dim: Int): Array[Array[Double]] = {
    val mdt = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(cells, dim) { (j, d) =>
      val hex = mdt.digest(s"c${j}_$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (hex.charAt(0) < '8') 1.0 else -1.0
    }
  }

  /** (-dot, cellId) structs for every centroid — ascending sort order =
    * dot descending with first-cell tiebreak. */
  private[operators] def centroidDotStructsW(v: Column, w: Array[Array[Double]]): Column =
    array(w.indices.map { j =>
      struct((-dotLit(v, w(j))).as("nd"), lit(j).as("cid"))
    }: _*)

  private def centroidDotStructs(v: Column, cells: Int, dim: Int): Column =
    centroidDotStructsW(v, centroidWeights(cells, dim))

  /** Spherical k-means over the corpus — the "sampled k-means at scale"
    * the fixed-direction IVF scaladoc promises: `iters` Lloyd rounds,
    * each ONE assignment projection + ONE aggregation shuffle of
    * n·dim (sampled) rows, with the k×dim result collected to the
    * driver (tiny). Seeded from the deterministic ±1 directions, so the
    * whole procedure is a pure function of the data.
    *
    * Determinism trick: per-dimension sums accumulate as SCALED LONGS
    * (`floor(v · 2^20)`) — integer addition is associative, so the
    * result is independent of Spark's partial-aggregation merge order,
    * unlike double summation (whose low-order bits vary run to run and
    * can flip near-tie assignments downstream). Centroids are unit-
    * normalized; a cell that captures no vectors keeps its previous
    * centroid. At 10^9+ vectors pass `sampleFraction` < 1 — k-means
    * needs a sample, not the corpus (the sample is seeded, still
    * deterministic). */
  def kmeansCentroids(emb: DataFrame, cells: Int, dim: Int, iters: Int = 5,
      sampleFraction: Double = 1.0): Array[Array[Double]] = {
    val vecs0 = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val vecs = Mat.materialize(
      if (sampleFraction >= 1.0) vecs0 else vecs0.sample(withReplacement = false, sampleFraction, seed = 7L))
    try kmeansLoop(vecs, cells, dim, iters)
    // the result is a driver-side array — the cached sample serves
    // nothing after return, so release it instead of leaking one
    // persisted table per call
    finally vecs.unpersist()
  }

  private def kmeansLoop(vecs: DataFrame, cells: Int, dim: Int, iters: Int): Array[Array[Double]] = {
    val Scale = 1L << 20
    var cent = centroidWeights(cells, dim).map(normalize)
    var it = 0
    while (it < iters) {
      it += 1
      // two selects: a generator (posexplode) in the same projection as
      // the struct-field extraction breaks alias resolution inside the
      // argmax struct (fields degrade to col1/col2)
      val assigned = vecs
        .select(assignCell(col("emb"), cent).as("cell"), col("emb"))
        .select(col("cell"), posexplode(col("emb")).as(Seq("pos", "x")))
      val rows = assigned.groupBy(col("cell"), col("pos"))
        .agg(sum(floor(col("x") * Scale).cast("long")).as("s"), count(lit(1)).as("n"))
        .collect() // <= cells*dim rows
      val sums = Array.fill(cells, dim)(0.0)
      val counts = new Array[Long](cells)
      rows.foreach { r =>
        val c = r.getInt(0); val p = r.getInt(1)
        sums(c)(p) = r.getLong(2).toDouble / Scale
        counts(c) = r.getLong(3)
      }
      cent = Array.tabulate(cells) { c =>
        if (counts(c) == 0) cent(c) // empty cell keeps its centroid
        else normalize(sums(c).map(_ / counts(c)))
      }
    }
    cent
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** IVF cell id of a vector: argmax_j <v, c_j> over `cells` fixed
    * spherical centroid directions (first max wins on ties — matched by
    * the oracle's `list_position(l, list_max(l))`). Implemented as an
    * array-sort argmax: a when/otherwise fold would reference its
    * accumulator twice per step and blow up exponentially in tree size.
    * Scale-invariant (no normalization needed for argmax). At 100 TB the
    * centroids would come from a sampled k-means; fixed deterministic
    * directions keep the oracle value-checkable and the plan identical. */
  def ivfCell(v: Column, cells: Int, dim: Int): Column =
    assignCell(v, centroidWeights(cells, dim))

  /** The ONE encoding of the cell-assignment convention (negated-dot
    * ascending sort, 1-based element_at, cid tiebreak) shared by
    * [[ivfCell]], [[ivfTopKWith]]'s postings, and the k-means
    * assignment step — postings and probes must agree on it or recall
    * silently drops. */
  private[operators] def assignCell(v: Column, centroids: Array[Array[Double]]): Column =
    element_at(array_sort(centroidDotStructsW(v, centroids)), 1).getField("cid")

  /** DuckDB SQL list literal of the `cells` centroid dot products over
    * DOUBLE[] expression `e`. */
  def ivfDotsSql(e: String, cells: Int, dim: Int): String = {
    val w = centroidWeights(cells, dim)
    (0 until cells).map { j =>
      val lits = w(j).map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> ($e)[i] * ($lits::DOUBLE[])[i]))"
    }.mkString("[", ", ", "]")
  }

  /** [[ivfDotsSql]] with EXPLICIT centroids: each double rendered via
    * `Double.toString` (shortest round-trip decimal), which DuckDB
    * parses back to the bit-identical double — so the oracle evaluates
    * the exact same dot products as the Spark plan. */
  def ivfDotsSqlW(e: String, w: Array[Array[Double]]): String = {
    val dim = w.head.length
    w.map { c =>
      val lits = c.map(_.toString).mkString("[", ",", "]")
      s"list_sum(list_transform(range(1, ${dim + 1}), i -> ($e)[i] * ($lits::DOUBLE[])[i]))"
    }.mkString("[", ", ", "]")
  }

  /** DuckDB SQL for [[ivfTopKWith]] under EXPLICIT (e.g. frozen
    * learned) centroids — the oracle for an IVF index whose centroid
    * directions were trained once and pinned as literals (the frozen-
    * model discipline: the query is then value-exact at every SF even
    * though training was data-dependent). Same CTE chain as
    * [[ivfTopKSql]], dots from [[ivfDotsSqlW]]. */
  def ivfTopKWithSql(anchorWhere: String, k: Int, w: Array[Array[Double]],
      nProbe: Int): String = {
    val cells = w.length
    val dots = ivfDotsSqlW("emb", w)
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |d AS (SELECT vec_id, emb, $dots AS dl FROM e),
       |post AS (SELECT vec_id, emb, list_position(dl, list_max(dl)) - 1 AS cell FROM d),
       |aprobe AS (SELECT anchor_id, cid AS cell FROM (
       |  SELECT d.vec_id AS anchor_id, j.j AS cid,
       |    row_number() OVER (PARTITION BY d.vec_id ORDER BY (d.dl)[j.j + 1] DESC, j.j ASC) AS r
       |  FROM d CROSS JOIN (SELECT unnest(range($cells)) AS j) j WHERE $anchorWhere)
       |  WHERE r <= $nProbe),
       |aemb AS (SELECT vec_id AS anchor_id, emb AS aemb FROM e WHERE $anchorWhere),
       |sc AS (SELECT p.anchor_id, c.vec_id AS neighbor_id, ${simSql("a.aemb", "c.emb")} AS sim
       |  FROM post c JOIN aprobe p ON c.cell = p.cell AND c.vec_id <> p.anchor_id
       |  JOIN aemb a ON a.anchor_id = p.anchor_id),
       |rk AS (SELECT anchor_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY anchor_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sc)
       |SELECT anchor_id, rank, neighbor_id, sim FROM rk WHERE rank <= $k""".stripMargin
  }

  /** IVF approximate top-k: the corpus is partitioned into `cells`
    * disjoint spherical cells (an inverted file); each anchor probes its
    * `nProbe` best cells. The candidate join is an equi-join on the cell
    * id — and because cells are DISJOINT, probing several cells can
    * never produce a duplicate (anchor, neighbor) pair, so no dedup
    * shuffle exists at all. Same output shape as [[bruteForceTopK]].
    * This is the second approximate-ANN family next to [[lshTopK]]:
    * IVF bounds work per probe by cell occupancy (corpus/cells expected)
    * and recall by nProbe; at 10^9+ vectors you raise `cells` so the
    * posting lists stay executor-sized. */
  def ivfTopK(emb: DataFrame, anchorPred: Column, k: Int, cells: Int, dim: Int,
      nProbe: Int): DataFrame =
    ivfTopKWith(emb, anchorPred, k, centroidWeights(cells, dim), nProbe)

  /** [[ivfTopK]] with EXPLICIT centroid directions — the production
    * entry point once [[kmeansCentroids]] has learned them (the fixed
    * ±1 directions remain the oracle-checkable default). Same plan
    * shape: disjoint cells, equi-join, no dedup shuffle. */
  def ivfTopKWith(emb: DataFrame, anchorPred: Column, k: Int,
      centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    val cells = centroids.length
    require(nProbe >= 1 && nProbe <= cells, s"nProbe=$nProbe of $cells cells")
    val base = withNorm(emb)
    // narrow postings: (vec_id, cell)
    val postings = base.select(col("vec_id"),
      assignCell(col("emb"), centroids).as("cell"))
    // anchor probe list: top-nProbe cells by dot (dot desc, cell id asc)
    val dotStructs = centroidDotStructsW(col("emb"), centroids)
    val probes = base.filter(anchorPred)
      .select(col("vec_id").as("anchor_id"),
        explode(transform(slice(array_sort(dotStructs), 1, nProbe), s => s.getField("cid")))
          .as("cell"))
    val cand = postings.join(broadcast(probes), Seq("cell"))
      .filter(col("anchor_id") =!= col("vec_id"))
      .select(col("anchor_id"), col("vec_id").as("neighbor_id"))
    val anchorEmb = base.filter(anchorPred)
      .select(col("vec_id").as("anchor_id"), col("emb").as("aemb"), col("nrm").as("anrm"))
    val scored = cand.join(base, col("neighbor_id") === col("vec_id"))
      .join(broadcast(anchorEmb), Seq("anchor_id"))
      .select(col("anchor_id"), col("neighbor_id"),
        simExpr(col("aemb"), col("emb"), col("anrm"), col("nrm")).as("sim"))
    partialTopK(scored, k)
  }

  /** DuckDB SQL for [[ivfTopK]] over table `embeddings` with anchors
    * `anchorWhere`: cell = first-max index of the dot list
    * (`list_position(l, list_max(l))`), probes = rank over the unnested
    * dot list. */
  def ivfTopKSql(anchorWhere: String, k: Int, cells: Int, dim: Int, nProbe: Int): String = {
    val dots = ivfDotsSql("emb", cells, dim)
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |d AS (SELECT vec_id, emb, $dots AS dl FROM e),
       |post AS (SELECT vec_id, emb, list_position(dl, list_max(dl)) - 1 AS cell FROM d),
       |aprobe AS (SELECT anchor_id, cid AS cell FROM (
       |  SELECT d.vec_id AS anchor_id, j.j AS cid,
       |    row_number() OVER (PARTITION BY d.vec_id ORDER BY (d.dl)[j.j + 1] DESC, j.j ASC) AS r
       |  FROM d CROSS JOIN (SELECT unnest(range($cells)) AS j) j WHERE $anchorWhere)
       |  WHERE r <= $nProbe),
       |aemb AS (SELECT vec_id AS anchor_id, emb AS aemb FROM e WHERE $anchorWhere),
       |sc AS (SELECT p.anchor_id, c.vec_id AS neighbor_id, ${simSql("a.aemb", "c.emb")} AS sim
       |  FROM post c JOIN aprobe p ON c.cell = p.cell AND c.vec_id <> p.anchor_id
       |  JOIN aemb a ON a.anchor_id = p.anchor_id),
       |rk AS (SELECT anchor_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY anchor_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sc)
       |SELECT anchor_id, rank, neighbor_id, sim FROM rk WHERE rank <= $k""".stripMargin
  }

  /** Measured recall@k of the LSH path against the exact baseline:
    * |topk_lsh ∩ topk_exact| / k averaged over anchors — the number
    * that justifies shipping the approximation. One row:
    * (n_anchors, avg_recall). */
  def recallAtK(emb: DataFrame, anchorPred: Column, k: Int, bits: Int, dim: Int,
      probe: Int = 1, tables: Int = 1): DataFrame =
    recallOf(bruteForceTopK(emb, anchorPred, k),
      lshTopK(emb, anchorPred, k, bits, dim, probe, tables), k)

  /** Measured recall@k of the IVF path (typically with
    * [[kmeansCentroids]]-learned directions) vs the exact baseline. */
  def ivfRecallAtK(emb: DataFrame, anchorPred: Column, k: Int,
      centroids: Array[Array[Double]], nProbe: Int): DataFrame =
    recallOf(bruteForceTopK(emb, anchorPred, k),
      ivfTopKWith(emb, anchorPred, k, centroids, nProbe), k)

  // ---------------------------------------------------------- quantization

  /** Per-vector symmetric INT8 quantization — the storage/shuffle
    * compression pass of a 100 TB embedding pipeline: `scale =
    * max|x|/127`, `q_d = floor(x_d/scale + 0.5)` ∈ [-127, 127] (the max
    * component maps to ±127 exactly, so no clipping branch exists).
    * A float32 corpus drops 4× in bytes — which is 4× less shuffle
    * weight for every ANN/near-dup join downstream — at a reconstruction
    * error bounded by scale/2 per component, measured here per vector.
    *
    * Output: (vec_id, n_dims, scale_r, q_csv, max_abs_err_r). The
    * quantized codes ride as a CSV string so the DuckDB oracle verifies
    * them element-exact; a production sink would keep `array<byte>`.
    * All rounding is `floor(x·10^9 + 0.5)/10^9` — pure IEEE arithmetic,
    * bit-identical across engines (Java's BigDecimal HALF_UP vs C
    * half-even disagree on exact ties). Plan shape: ONE codegen-staged
    * projection pair (max_abs staged first so the interpreted HOF
    * lambdas do not recompute it per element), zero shuffles. */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    def r9(c: Column): Column = floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    val x = (c: Column) => c.cast("double")
    emb
      .select(col("vec_id"), col("embedding").as("v"),
        array_max(transform(col("embedding"), e => abs(x(e)))).as("max_abs"))
      // zero vector: scale 1 quantizes every component to 0 (no 0/0)
      .select(col("vec_id"), col("v"),
        when(col("max_abs") === 0d, lit(1d)).otherwise(col("max_abs") / 127d).as("scale"))
      .select(
        col("vec_id"),
        size(col("v")).as("n_dims"),
        r9(col("scale")).as("scale_r"),
        concat_ws(",", transform(col("v"),
          e => floor(x(e) / col("scale") + 0.5).cast("int").cast("string"))).as("q_csv"),
        r9(array_max(transform(col("v"),
          e => abs(x(e) - floor(x(e) / col("scale") + 0.5) * col("scale"))))).as("max_abs_err_r"))
  }

  /** DuckDB oracle for [[quantizeInt8]] over table `tbl` with columns
    * (vec_id, embedding: FLOAT[]). */
  def quantizeInt8Sql(tbl: String): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $tbl),
       |m AS (SELECT vec_id, v,
       |        list_max(list_transform(v, x -> abs(x))) AS max_abs FROM e),
       |s AS (SELECT vec_id, v,
       |        CASE WHEN max_abs = 0 THEN 1.0 ELSE max_abs / 127 END AS scale FROM m)
       |SELECT vec_id, len(v)::INT AS n_dims,
       |  floor(scale * 1e9 + 0.5) / 1e9 AS scale_r,
       |  array_to_string(list_transform(v,
       |    x -> CAST(CAST(floor(x / scale + 0.5) AS INT) AS VARCHAR)), ',') AS q_csv,
       |  floor(list_max(list_transform(v,
       |    x -> abs(x - floor(x / scale + 0.5) * scale))) * 1e9 + 0.5) / 1e9 AS max_abs_err_r
       |FROM s""".stripMargin

  /** Measured recall@k of exact top-k run over the INT8-RECONSTRUCTED
    * vectors (`q_d · scale`) against the float baseline — the fidelity
    * number that justifies shipping quantized embeddings, exactly as
    * [[recallAtK]] justifies the LSH approximation. */
  def quantRecallAtK(emb: DataFrame, anchorPred: Column, k: Int): DataFrame = {
    val x = (c: Column) => c.cast("double")
    val recon = emb
      .select(col("vec_id"), col("embedding"),
        array_max(transform(col("embedding"), e => abs(x(e)))).as("max_abs"))
      .select(col("vec_id"), col("embedding"),
        when(col("max_abs") === 0d, lit(1d)).otherwise(col("max_abs") / 127d).as("scale"))
      .select(col("vec_id"),
        transform(col("embedding"),
          e => floor(x(e) / col("scale") + 0.5) * col("scale")).as("embedding"))
    recallOf(bruteForceTopK(emb, anchorPred, k),
      bruteForceTopK(recon, anchorPred, k), k)
  }

  private[graft] def recallOf(exactTopK: DataFrame, approxTopK: DataFrame, k: Int): DataFrame = {
    // the exact side is referenced twice below (hit join + anchor pad):
    // materialize once instead of re-running the anchor×corpus scoring
    // (persist-with-lineage by default — see [[graft.operators.Mat]])
    val exact = Mat.materialize(exactTopK.select(col("anchor_id"), col("neighbor_id")))
    val approx = approxTopK.select(col("anchor_id"), col("neighbor_id"))
    exact.join(approx, Seq("anchor_id", "neighbor_id"), "left_semi")
      .groupBy(col("anchor_id")).agg(count(lit(1)).as("hits"))
      // right-pad with 0-hit anchors via a left join from the exact side
      .join(exact.select(col("anchor_id")).distinct(), Seq("anchor_id"), "right_outer")
      .select(col("anchor_id"), coalesce(col("hits"), lit(0L)).as("hits"))
      .agg(count(lit(1)).as("n_anchors"),
        round(avg(col("hits").cast("double") / k), 6).as("avg_recall"))
  }

  // ------------------------------------------------- product quantization

  /** Deterministic ternary PQ codebooks: `m` subspaces × `ksub`
    * centroids × `dsub` components in {-1, 0, 1} (md5("pq<s>_<j>_<d>")
    * mod 3 — a salt family independent of the LSH planes and IVF
    * directions). Like [[centroidWeights]], these are PLAN-TIME
    * literals embedded identically on the Spark and DuckDB sides, which
    * is what keeps the encode value-checkable; a production deployment
    * would train each subspace's codebook with k-means over a sample
    * (same discipline as [[kmeansCentroids]] for IVF) and ship the
    * learned array here — every plan below takes the codebook as data. */
  def pqCodebooks(m: Int, ksub: Int, dsub: Int): Array[Array[Array[Double]]] = {
    val mdt = java.security.MessageDigest.getInstance("MD5")
    // entries scaled to 1/8 — the component magnitude of a unit-norm
    // 64-dim vector (1/sqrt(64)); ±1 entries would dwarf the data and
    // collapse every assignment onto the low-norm centroids. 2^-3 is
    // exact in binary AND decimal, so the oracle literal is exact too.
    Array.tabulate(m, ksub, dsub) { (s, j, d) =>
      val hex = mdt.digest(s"pq${s}_${j}_$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (Integer.parseInt(hex.substring(0, 2), 16) % 3 - 1).toDouble * 0.125
    }
  }

  /** (‖c_j‖²/2 − <x, c_j>, j) structs for one subspace — ascending sort
    * = L2 distance ascending (argmin L2² == argmax(<x,c> − ‖c‖²/2); the
    * ‖x‖² term is constant per vector) with first-centroid tiebreak,
    * the same convention as [[assignCell]]. */
  private def pqNegScoreStructs(sub: Column, book: Array[Array[Double]]): Column =
    array(book.indices.map { j =>
      val half = book(j).map(x => x * x).sum / 2
      struct((lit(half) - dotLit(sub, book(j))).as("ns"), lit(j).as("cid"))
    }: _*)

  /** Product-quantize a float-embedding corpus: split each `dim`-vector
    * into `m` contiguous subvectors of dim/m, encode each as the id of
    * its L2-nearest subspace centroid. Output (vec_id, nrm, codes:
    * array<int> of length m) — `m·log2(ksub)` bits of code plus one
    * float norm per vector.
    *
    * THIS is what makes 10^10-vector ANN memory-feasible: at m=8,
    * ksub=256 a 64-dim float32 corpus drops 256 B → 8 B + norm
    * (~21×), so 10^10 vectors fit in ~120 GB of executor memory
    * cluster-wide instead of 2.6 TB — the codes table broadcasts/
    * co-partitions where the float table cannot. Encode is ONE
    * codegen-staged projection over the scan (zero shuffles); work
    * per vector = m·ksub·dsub = dim·ksub multiply-adds. */
  def pqEncode(emb: DataFrame, m: Int, ksub: Int, dim: Int): DataFrame =
    pqEncodeWith(emb, pqCodebooks(m, ksub, dim / m), dim)

  /** [[pqEncode]] with EXPLICIT codebooks — the production entry point
    * once [[pqTrainCodebooks]] has learned them. */
  def pqEncodeWith(emb: DataFrame, books: Array[Array[Array[Double]]],
      dim: Int): DataFrame = {
    require(dim % books.length == 0, s"m=${books.length} must divide dim=$dim")
    withNorm(emb).select(col("vec_id"), col("nrm"),
      pqCodesCol(col("emb"), books, dim).as("codes"))
  }

  /** L2 k-means PER SUBSPACE over (a sample of) the corpus — the
    * learned codebooks a production PQ deployment ships ([[pqEncode]]'s
    * fixed ternary books exist to keep the oracle value-checkable).
    * One aggregation per Lloyd round covers ALL m subspaces at once
    * (rows = n·m subvectors keyed by (subspace, cell)); the collected
    * state is ≤ m·ksub·dsub rows per round. Deterministic exactly as
    * [[kmeansCentroids]]: seeded sample, per-dimension sums accumulate
    * as scaled longs (merge-order-independent), seeded from the fixed
    * ternary books — so Lloyd monotonicity guarantees the learned books
    * never have HIGHER training distortion than the fixed ones (the
    * spec asserts this). Subspace k-means is plain L2 (no
    * normalization — PQ quantizes subvectors, not directions). */
  def pqTrainCodebooks(emb: DataFrame, m: Int, ksub: Int, dim: Int,
      iters: Int = 5, sampleFraction: Double = 1.0): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val Scale = 1L << 20
    val vecs0 = emb.select(col("embedding").cast("array<double>").as("emb"))
    val sampled = if (sampleFraction >= 1.0) vecs0
      else vecs0.sample(withReplacement = false, sampleFraction, seed = 7L)
    val subs = Mat.materialize(sampled.select(posexplode(
      array((0 until m).map(s => slice(col("emb"), s * dsub + 1, dsub)): _*))
      .as(Seq("s", "sub"))))
    var books = pqCodebooks(m, ksub, dsub)
    try {
      var it = 0
      while (it < iters) {
        it += 1
        // per-subspace assignment as a when-chain over s: each branch's
        // argmin expression appears ONCE (no accumulator re-reference,
        // so the tree stays linear in m·ksub)
        def assignExpr(s: Int): Column =
          element_at(array_sort(pqNegScoreStructs(col("sub"), books(s))), 1)
            .getField("cid")
        val cell = (1 until m).foldLeft(when(col("s") === 0, assignExpr(0))) {
          (acc, s) => acc.when(col("s") === s, assignExpr(s))
        }
        // two selects: a generator in the same projection as the
        // struct-field extraction degrades the argmin struct's field
        // names (same pitfall as kmeansLoop's assignment step)
        val rows = subs.select(col("s"), cell.as("cell"), col("sub"))
          .select(col("s"), col("cell"), posexplode(col("sub")).as(Seq("pos", "x")))
          .groupBy(col("s"), col("cell"), col("pos"))
          .agg(sum(floor(col("x") * Scale).cast("long")).as("sm"), count(lit(1)).as("n"))
          .collect() // <= m*ksub*dsub rows
        val sums = Array.fill(m, ksub, dsub)(0.0)
        val counts = Array.fill(m, ksub)(0L)
        rows.foreach { r =>
          val s = r.getInt(0); val c = r.getInt(1); val p = r.getInt(2)
          sums(s)(c)(p) = r.getLong(3).toDouble / Scale
          counts(s)(c) = r.getLong(4)
        }
        books = Array.tabulate(m, ksub) { (s, c) =>
          if (counts(s)(c) == 0) books(s)(c) // empty cell keeps its centroid
          else sums(s)(c).map(_ / counts(s)(c))
        }
      }
      books
    } finally subs.unpersist()
  }

  /** DuckDB oracle for [[pqEncode]] over table `tbl` (vec_id,
    * embedding FLOAT[]): codes rendered as CSV, norm fixed-point-rounded
    * (`floor(x·1e9+0.5)` — IEEE-portable). */
  def pqEncodeSql(tbl: String, m: Int, ksub: Int, dim: Int): String = {
    val dsub = dim / m
    val books = pqCodebooks(m, ksub, dsub)
    def scoreList(s: Int): String = books(s).map { c =>
      val half = c.map(x => x * x).sum / 2
      val lits = c.map(_.toString).mkString("[", ",", "]")
      s"($half::DOUBLE - list_sum(list_transform(range(1, ${dsub + 1}), i -> emb[${s * dsub} + i] * ($lits::DOUBLE[])[i])))"
    }.mkString("[", ", ", "]")
    val lsCols = (0 until m).map(s => s"${scoreList(s)} AS ls$s").mkString(",\n  ")
    val codeExprs = (0 until m)
      .map(s => s"CAST(list_position(ls$s, list_min(ls$s)) - 1 AS VARCHAR)")
      .mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM $tbl),
       |ls AS (SELECT vec_id, emb,
       |  $lsCols
       |  FROM e)
       |SELECT vec_id,
       |  array_to_string($codeExprs, ',') AS codes_csv,
       |  floor(sqrt(list_sum(list_transform(emb, x -> x * x))) * 1e9 + 0.5) / 1e9 AS nrm_r
       |FROM ls""".stripMargin
  }

  /** Approximate top-k by ASYMMETRIC DISTANCE COMPUTATION over the PQ
    * codes: anchors stay full-precision and precompute a lookup table
    * `lut[s·ksub + j] = <anchor_sub_s, c_{s,j}>` (m·ksub dots per
    * anchor, m·ksub·dsub = dim·ksub flops); every corpus vector is then
    * scored with just m array lookups + adds over its codes — the scan
    * reads m smallint codes + one norm per vector instead of dim
    * floats. Cosine uses the stored true norm (the standard
    * codes+norm layout). Plan: codes projection (zero shuffles) joined
    * to broadcast anchors-with-lut, then the same k-bounded
    * [[partialTopK]] as every other ANN path. Recall is bounded by
    * codebook fidelity — measure it with [[pqRecallAtK]] before
    * shipping, exactly as [[recallAtK]] gates the LSH path. */
  def pqTopK(emb: DataFrame, anchorPred: Column, k: Int, m: Int, ksub: Int,
      dim: Int): DataFrame =
    pqTopKWith(emb, anchorPred, k, pqCodebooks(m, ksub, dim / m), dim)

  /** [[pqTopK]] with EXPLICIT (typically learned) codebooks. */
  def pqTopKWith(emb: DataFrame, anchorPred: Column, k: Int,
      books: Array[Array[Array[Double]]], dim: Int): DataFrame = {
    val m = books.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val ksub = books(0).length
    val dsub = dim / m
    val codes = pqEncodeWith(emb, books, dim)
    val lut = array((for (s <- 0 until m; j <- 0 until ksub)
      yield dotLit(slice(col("emb"), s * dsub + 1, dsub), books(s)(j))): _*)
    val anchors = withNorm(emb).filter(anchorPred)
      .select(col("vec_id").as("anchor_id"), lut.as("lut"), col("nrm").as("anrm"))
    // left-assoc sum of the m LUT lookups — the oracle mirrors the same
    // association (sd0 + sd1 + ...), keeping the doubles bit-identical
    val adc = (0 until m).map { s =>
      element_at(col("lut"), lit(s * ksub) + element_at(col("codes"), s + 1) + 1)
    }.reduce(_ + _)
    val scored = codes.join(broadcast(anchors), col("anchor_id") =!= col("vec_id"))
      .select(col("anchor_id"), col("vec_id").as("neighbor_id"),
        round(adc / (col("anrm") * col("nrm")), 6).as("sim"))
    partialTopK(scored, k)
  }

  /** Measured recall@k of the PQ/ADC path against the exact float
    * baseline — the fidelity number that decides m/ksub (compression
    * vs recall), as [[quantRecallAtK]] does for int8. */
  def pqRecallAtK(emb: DataFrame, anchorPred: Column, k: Int, m: Int,
      ksub: Int, dim: Int): DataFrame =
    recallOf(bruteForceTopK(emb, anchorPred, k),
      pqTopK(emb, anchorPred, k, m, ksub, dim), k)

  /** Measured recall@k of the ADC path under EXPLICIT (learned)
    * codebooks vs the exact float baseline. */
  def pqRecallAtKWith(emb: DataFrame, anchorPred: Column, k: Int,
      books: Array[Array[Array[Double]]], dim: Int): DataFrame =
    recallOf(bruteForceTopK(emb, anchorPred, k),
      pqTopKWith(emb, anchorPred, k, books, dim), k)

  /** PQ the way production ANN actually ships it: the ADC scan RANKS A
    * SHORTLIST (top-`shortlist` per anchor over the 16-byte codes), and
    * only the shortlist's float vectors are touched for an exact cosine
    * re-rank to top-k. Per anchor the float corpus is read
    * `shortlist/n` as often as brute force — at 10^10 vectors the codes
    * fit in cluster memory and the floats are only fetched for the
    * ~50-candidate rerank join (an equi-join on neighbor_id, never a
    * second corpus scan). Recall is measured by [[pqRerankRecallAtK]];
    * the rerank recovers most of what raw ADC ordering loses (q74 vs
    * q75 quantify exactly that gap). */
  def pqRerankTopK(emb: DataFrame, anchorPred: Column, k: Int, shortlist: Int,
      m: Int, ksub: Int, dim: Int): DataFrame = {
    require(shortlist >= k, s"shortlist=$shortlist < k=$k")
    val cand = pqTopK(emb, anchorPred, shortlist, m, ksub, dim)
      .select(col("anchor_id"), col("neighbor_id"))
    val base = withNorm(emb)
    val anchors = base.filter(anchorPred)
      .select(col("vec_id").as("anchor_id"), col("emb").as("aemb"), col("nrm").as("anrm"))
    val scored = cand.join(base, col("neighbor_id") === col("vec_id"))
      .join(broadcast(anchors), Seq("anchor_id"))
      .select(col("anchor_id"), col("neighbor_id"),
        simExpr(col("aemb"), col("emb"), col("anrm"), col("nrm")).as("sim"))
    partialTopK(scored, k)
  }

  /** Measured recall@k of ADC-shortlist + exact-rerank vs the float
    * baseline — the number that sizes `shortlist` (recall vs float
    * fetches per anchor). */
  def pqRerankRecallAtK(emb: DataFrame, anchorPred: Column, k: Int,
      shortlist: Int, m: Int, ksub: Int, dim: Int): DataFrame =
    recallOf(bruteForceTopK(emb, anchorPred, k),
      pqRerankTopK(emb, anchorPred, k, shortlist, m, ksub, dim), k)

  // ------------------------------------------------------------- IVF + PQ

  /** The COMPOSED billion-scale ANN index (the FAISS IVFPQ+refine
    * shape): the inverted file bounds how much of the corpus each
    * anchor touches (nProbe cells of corpus/cells expected occupancy),
    * PQ codes bound the bytes per touched vector (~17 B vs 256 B
    * floats), and the exact-cosine rerank of the ADC shortlist buys the
    * recall back. Postings are ONE narrow projection (vec_id, cell,
    * codes, nrm) — the scan never carries floats past it; candidates
    * come from an equi-join on the DISJOINT cell id (no dedup shuffle
    * can exist); ADC scores m array lookups per candidate against the
    * broadcast per-anchor LUT; floats are fetched only for the
    * shortlist ids via an equi-join. At 10^10 vectors: postings
    * ~170 GB cluster-wide (memory-resident), per-anchor work ∝
    * nProbe·corpus/cells, float reads ∝ shortlist — every term is a
    * knob, none is the corpus. */
  def ivfPqTopK(emb: DataFrame, anchorPred: Column, k: Int, shortlist: Int,
      cells: Int, nProbe: Int, m: Int, ksub: Int, dim: Int): DataFrame =
    ivfPqTopKWith(emb, anchorPred, k, shortlist, centroidWeights(cells, dim),
      nProbe, pqCodebooks(m, ksub, dim / m), dim)

  /** PQ codes array for a double-array column `v` under `books` — the
    * ONE encoding of the code convention (neg-score ascending sort,
    * first-centroid tiebreak), shared by [[pqEncodeWith]],
    * [[ivfPqTopKWith]]'s postings and [[AnnIndex]]'s stored postings —
    * an index written with one and probed with another would silently
    * mis-rank. */
  private[operators] def pqCodesCol(v: Column, books: Array[Array[Array[Double]]],
      dim: Int): Column = {
    val m = books.length
    val dsub = dim / m
    array((0 until m).map { s =>
      element_at(array_sort(
        pqNegScoreStructs(slice(v, s * dsub + 1, dsub), books(s))), 1)
        .getField("cid")
    }: _*)
  }

  /** Per-anchor ADC lookup table: lut[s·ksub + j] = <anchor_sub_s, c_{s,j}>. */
  private[operators] def pqLutCol(v: Column, books: Array[Array[Array[Double]]],
      dim: Int): Column = {
    val m = books.length
    val ksub = books(0).length
    val dsub = dim / m
    array((for (s <- 0 until m; j <- 0 until ksub)
      yield dotLit(slice(v, s * dsub + 1, dsub), books(s)(j))): _*)
  }

  /** ADC dot from a `lut` column and a `codes` column: m lookups summed
    * left-to-right (the oracle mirrors the same association). */
  private[operators] def adcDotCol(lut: Column, codes: Column, m: Int, ksub: Int): Column =
    (0 until m).map { s =>
      element_at(lut, lit(s * ksub) + element_at(codes, s + 1) + 1)
    }.reduce(_ + _)

  /** Per-anchor probe rows (anchor_id, cell×nProbe exploded, lut, anrm)
    * from a normed anchor frame — shared by [[ivfPqTopKWith]] and
    * [[AnnIndex.probe]]. */
  private[operators] def ivfPqProbes(anchors: DataFrame, centroids: Array[Array[Double]],
      nProbe: Int, books: Array[Array[Array[Double]]], dim: Int): DataFrame = {
    val dotStructs = centroidDotStructsW(col("emb"), centroids)
    anchors.select(
      col("vec_id").as("anchor_id"),
      explode(transform(slice(array_sort(dotStructs), 1, nProbe), s => s.getField("cid")))
        .as("cell"),
      pqLutCol(col("emb"), books, dim).as("lut"), col("nrm").as("anrm"))
  }

  /** ADC shortlist over prepared frames: `postings` (vec_id, cell,
    * codes, nrm), `probes` ([[ivfPqProbes]] output). Returns the
    * (anchor_id, neighbor_id) candidate pairs of the top-`shortlist`
    * ADC-ranked neighbors per anchor — deterministic (ties broken by
    * neighbor_id in [[partialTopK]]). Shared by [[ivfPqTopKWith]] and
    * [[AnnIndex.probe]]. */
  private[operators] def adcShortlist(postings: DataFrame, probes: DataFrame,
      shortlist: Int, m: Int, ksub: Int): DataFrame = {
    val adc = adcDotCol(col("lut"), col("codes"), m, ksub)
    val scored = postings.join(broadcast(probes), Seq("cell"))
      .filter(col("anchor_id") =!= col("vec_id"))
      .select(col("anchor_id"), col("vec_id").as("neighbor_id"),
        round(adc / (col("anrm") * col("nrm")), 6).as("sim"))
    partialTopK(scored, shortlist)
      .select(col("anchor_id"), col("neighbor_id"))
  }

  /** Exact-cosine rerank of shortlist pairs `cand` (anchor_id,
    * neighbor_id) against `floats` (vec_id, emb, nrm) and `anchors`
    * (anchor_id, aemb, anrm); the final top-k. Shared by
    * [[ivfPqTopKWith]] and [[AnnIndex.probe]] — the persisted path
    * cannot drift from the oracle-checked one. */
  private[operators] def rerankTopK(cand: DataFrame, floats: DataFrame,
      anchors: DataFrame, k: Int): DataFrame = {
    val rescored = cand.join(floats, col("neighbor_id") === col("vec_id"))
      .join(broadcast(anchors), Seq("anchor_id"))
      .select(col("anchor_id"), col("neighbor_id"),
        simExpr(col("aemb"), col("emb"), col("anrm"), col("nrm")).as("sim"))
    partialTopK(rescored, k)
  }

  /** [[ivfPqTopK]] with EXPLICIT centroids and codebooks — the
    * production entry point once [[kmeansCentroids]] and
    * [[pqTrainCodebooks]] have learned them. */
  def ivfPqTopKWith(emb: DataFrame, anchorPred: Column, k: Int, shortlist: Int,
      centroids: Array[Array[Double]], nProbe: Int,
      books: Array[Array[Array[Double]]], dim: Int): DataFrame = {
    val cells = centroids.length
    val m = books.length
    val ksub = books(0).length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    require(shortlist >= k, s"shortlist=$shortlist < k=$k")
    require(nProbe >= 1 && nProbe <= cells, s"nProbe=$nProbe of $cells cells")
    val base = withNorm(emb)
    // the index: cell + codes + norm, floats dropped at the scan
    val postings = base.select(col("vec_id"),
      assignCell(col("emb"), centroids).as("cell"),
      pqCodesCol(col("emb"), books, dim).as("codes"), col("nrm"))
    // per-anchor probe rows carry the ADC LUT (m·ksub doubles, repeated
    // nProbe times in the broadcast — anchors are tiny by contract)
    val probes = ivfPqProbes(base.filter(anchorPred), centroids, nProbe, books, dim)
    val anchors = base.filter(anchorPred)
      .select(col("vec_id").as("anchor_id"), col("emb").as("aemb"), col("nrm").as("anrm"))
    rerankTopK(adcShortlist(postings, probes, shortlist, m, ksub), base, anchors, k)
  }

  /** Measured recall@k of the full IVF+PQ+rerank stack vs the exact
    * float baseline — the one number that sizes all three knobs
    * (cells/nProbe vs m/ksub vs shortlist) together. */
  def ivfPqRecallAtK(emb: DataFrame, anchorPred: Column, k: Int, shortlist: Int,
      cells: Int, nProbe: Int, m: Int, ksub: Int, dim: Int): DataFrame =
    recallOf(bruteForceTopK(emb, anchorPred, k),
      ivfPqTopK(emb, anchorPred, k, shortlist, cells, nProbe, m, ksub, dim), k)

  /** DuckDB oracle for [[pqRecallAtK]] over `embeddings` with anchors
    * `anchorWhere`: exact ranking (same CTEs as the q55 oracle) vs the
    * ADC ranking recomputed from the encode CTEs. The per-pair ADC sim
    * mirrors the Spark association exactly: per-subspace sub-dots
    * (code selected by CASE) summed left-to-right, divided by the two
    * norms, rounded to 6 dp. */
  def pqRecallSql(anchorWhere: String, k: Int, m: Int, ksub: Int, dim: Int): String =
    s"""WITH ${pqRecallCtes(anchorWhere, k, m, ksub, dim)},
       |ap AS (SELECT anchor_id, neighbor_id FROM rq WHERE rank <= $k),
       |${pqHitsSql(k)}""".stripMargin

  /** DuckDB oracle for [[pqRerankRecallAtK]]: the ADC CTEs rank a
    * `shortlist`-deep candidate set, exact cosine re-ranks it to k. */
  def pqRerankRecallSql(anchorWhere: String, k: Int, shortlist: Int,
      m: Int, ksub: Int, dim: Int): String =
    s"""WITH ${pqRecallCtes(anchorWhere, k, m, ksub, dim)},
       |cand AS (SELECT anchor_id, neighbor_id FROM rq WHERE rank <= $shortlist),
       |sr AS (SELECT c.anchor_id, c.neighbor_id, ${simSql("a.aemb", "e.emb")} AS sim
       |  FROM cand c JOIN e0 e ON e.vec_id = c.neighbor_id
       |  JOIN ax a ON a.anchor_id = c.anchor_id),
       |rr AS (SELECT anchor_id, neighbor_id,
       |    row_number() OVER (PARTITION BY anchor_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sr),
       |ap AS (SELECT anchor_id, neighbor_id FROM rr WHERE rank <= $k),
       |${pqHitsSql(k)}""".stripMargin

  /** Shared CTE chain: exact ranking `ex` (same shape as the q55
    * oracle) + ADC ranking `rq` recomputed from the encode CTEs. The
    * per-pair ADC sim mirrors the Spark association exactly:
    * per-subspace sub-dots (code selected by CASE) summed
    * left-to-right, divided by the two norms, rounded to 6 dp.
    * With `ivf = Some((cells, nProbe))` the ADC candidate set is
    * additionally restricted to cell-matched (posting, probe) pairs —
    * the oracle mirror of [[ivfPqTopK]]'s inverted-file pruning,
    * rendered with the same cell/probe conventions as [[ivfTopKSql]]. */
  private def pqRecallCtes(anchorWhere: String, k: Int, m: Int, ksub: Int, dim: Int,
      ivf: Option[(Int, Int)] = None, corpusWhere: String = "TRUE"): String = {
    val dsub = dim / m
    val books = pqCodebooks(m, ksub, dsub)
    def scoreList(s: Int): String = books(s).map { c =>
      val half = c.map(x => x * x).sum / 2
      val lits = c.map(_.toString).mkString("[", ",", "]")
      s"($half::DOUBLE - list_sum(list_transform(range(1, ${dsub + 1}), i -> emb[${s * dsub} + i] * ($lits::DOUBLE[])[i])))"
    }.mkString("[", ", ", "]")
    val lsCols = (0 until m).map(s => s"${scoreList(s)} AS ls$s").mkString(",\n  ")
    val codeCols = (0 until m)
      .map(s => s"list_position(ls$s, list_min(ls$s)) - 1 AS code$s").mkString(", ")
    def subDot(s: Int): String = {
      val cases = (0 until ksub).map { j =>
        val lits = books(s)(j).map(_.toString).mkString("[", ",", "]")
        s"WHEN $j THEN list_sum(list_transform(range(1, ${dsub + 1}), i -> a.aemb[${s * dsub} + i] * ($lits::DOUBLE[])[i]))"
      }.mkString(" ")
      s"(CASE c.code$s $cases END)"
    }
    val adc = (0 until m).map(subDot).mkString(" + ")
    val simF = simSql("a.aemb", "e.emb")
    // IVF restriction: posting cells + per-anchor probe lists, and the
    // ADC candidate join threads through them (disjoint cells -> no
    // dedup needed, exactly as on the Spark side)
    val ivfCtes = ivf.map { case (cells, nProbe) =>
      val dots = ivfDotsSql("emb", cells, dim)
      s"""dl0 AS (SELECT vec_id, emb, $dots AS dl FROM e0),
         |cl AS (SELECT vec_id, list_position(dl, list_max(dl)) - 1 AS cell FROM dl0),
         |aprobe AS (SELECT anchor_id, cid AS cell FROM (
         |  SELECT d.vec_id AS anchor_id, j.j AS cid,
         |    row_number() OVER (PARTITION BY d.vec_id ORDER BY (d.dl)[j.j + 1] DESC, j.j ASC) AS r
         |  FROM dl0 d CROSS JOIN (SELECT unnest(range($cells)) AS j) j WHERE $anchorWhere)
         |  WHERE r <= $nProbe),
         |""".stripMargin
    }.getOrElse("")
    val sqFrom = if (ivf.isDefined)
      s"""FROM cd c JOIN cl pc ON pc.vec_id = c.vec_id
         |  JOIN aprobe p ON pc.cell = p.cell
         |  JOIN ax a ON a.anchor_id = p.anchor_id AND c.vec_id <> a.anchor_id""".stripMargin
    else "FROM cd c JOIN ax a ON c.vec_id <> a.anchor_id"
    s"""e0 AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE $corpusWhere),
       |ax AS (SELECT vec_id AS anchor_id, emb AS aemb,
       |    sqrt(list_sum(list_transform(emb, x -> x * x))) AS anrm
       |  FROM e0 WHERE $anchorWhere),
       |sx AS (SELECT a.anchor_id, e.vec_id AS neighbor_id, $simF AS sim
       |  FROM ax a JOIN e0 e ON e.vec_id <> a.anchor_id),
       |rx AS (SELECT anchor_id, neighbor_id,
       |    row_number() OVER (PARTITION BY anchor_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sx),
       |ex AS (SELECT anchor_id, neighbor_id FROM rx WHERE rank <= $k),
       |${ivfCtes}ls AS (SELECT vec_id, emb,
       |  $lsCols
       |  FROM e0),
       |cd AS (SELECT vec_id,
       |    sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm,
       |    $codeCols
       |  FROM ls),
       |sq AS (SELECT a.anchor_id, c.vec_id AS neighbor_id,
       |    round(($adc) / (a.anrm * c.nrm), 6) AS sim
       |  $sqFrom),
       |rq AS (SELECT anchor_id, neighbor_id,
       |    row_number() OVER (PARTITION BY anchor_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sq)""".stripMargin
  }

  /** DuckDB oracle for [[ivfPqRecallAtK]]: the cell-restricted ADC CTEs
    * rank a `shortlist`-deep candidate set inside the probed cells,
    * exact cosine re-ranks it to k — [[pqRerankRecallSql]] plus the
    * inverted-file pruning. */
  def ivfPqRecallSql(anchorWhere: String, k: Int, shortlist: Int, cells: Int,
      nProbe: Int, m: Int, ksub: Int, dim: Int): String =
    s"""WITH ${pqRecallCtes(anchorWhere, k, m, ksub, dim, Some((cells, nProbe)))},
       |cand AS (SELECT anchor_id, neighbor_id FROM rq WHERE rank <= $shortlist),
       |sr AS (SELECT c.anchor_id, c.neighbor_id, ${simSql("a.aemb", "e.emb")} AS sim
       |  FROM cand c JOIN e0 e ON e.vec_id = c.neighbor_id
       |  JOIN ax a ON a.anchor_id = c.anchor_id),
       |rr AS (SELECT anchor_id, neighbor_id,
       |    row_number() OVER (PARTITION BY anchor_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sr),
       |ap AS (SELECT anchor_id, neighbor_id FROM rr WHERE rank <= $k),
       |${pqHitsSql(k)}""".stripMargin

  /** DuckDB oracle for the IVF+PQ TOP-K ROWS themselves (not the recall
    * aggregate) — what [[AnnIndex.probe]] returns, so the persisted
    * index is value-checkable row-for-row. Same CTE chain as
    * [[ivfPqRecallSql]]; the exact-baseline CTEs it inherits are
    * unreferenced and pruned by the engine. */
  def ivfPqTopKSql(anchorWhere: String, k: Int, shortlist: Int, cells: Int,
      nProbe: Int, m: Int, ksub: Int, dim: Int,
      corpusWhere: String = "TRUE"): String =
    s"""WITH ${pqRecallCtes(anchorWhere, k, m, ksub, dim, Some((cells, nProbe)), corpusWhere)},
       |cand AS (SELECT anchor_id, neighbor_id FROM rq WHERE rank <= $shortlist),
       |sr AS (SELECT c.anchor_id, c.neighbor_id, ${simSql("a.aemb", "e.emb")} AS sim
       |  FROM cand c JOIN e0 e ON e.vec_id = c.neighbor_id
       |  JOIN ax a ON a.anchor_id = c.anchor_id),
       |rr AS (SELECT anchor_id, neighbor_id, sim,
       |    row_number() OVER (PARTITION BY anchor_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM sr)
       |SELECT anchor_id, rank, neighbor_id, sim FROM rr WHERE rank <= $k""".stripMargin

  private def pqHitsSql(k: Int): String =
    s"""hits AS (SELECT ex.anchor_id, count(ap.neighbor_id) AS hits
       |  FROM ex LEFT JOIN ap ON ex.anchor_id = ap.anchor_id AND ex.neighbor_id = ap.neighbor_id
       |  GROUP BY ex.anchor_id)
       |SELECT count(*)::BIGINT AS n_anchors,
       |  round(avg(hits::DOUBLE / $k), 6) AS avg_recall FROM hits""".stripMargin

  // ------------------------------------------------------ semantic dedup

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023): partition
    * the corpus into disjoint spherical cells, and within each cell drop
    * every vector that has a LOWER-id neighbor with cosine >= threshold
    * ("keep the earliest of any near pair" — a deterministic, order-free
    * keep rule; ids are ingest order, so this keeps first-seen). This is
    * the embedding-space complement of [[graft.operators.Dedup]]'s
    * lexical passes: it removes paraphrases and re-renderings that share
    * no n-grams at all. Returns the SURVIVORS as (vec_id, cell).
    *
    * Plan shape at scale: one narrow cell-assign projection, a self
    * equi-join ON THE CELL ID (never all-pairs — the quadratic term is
    * bounded by cell occupancy, corpus/cells expected; `cells` is the
    * scale knob exactly as in [[ivfTopK]], raised until cells are
    * executor-sized), a distinct on dropped ids, and a left_anti join
    * back. At production scale the cells come from
    * [[kmeansCentroids]] via [[semanticDedupWith]] (tighter cells = both
    * fewer false merges and smaller joins); the fixed ±1 directions
    * remain the oracle-checkable default. */
  def semanticDedup(emb: DataFrame, threshold: Double, cells: Int, dim: Int): DataFrame =
    semanticDedupWith(emb, threshold, centroidWeights(cells, dim))

  /** [[semanticDedup]] with explicit (e.g. learned) centroid directions. */
  def semanticDedupWith(emb: DataFrame, threshold: Double,
      centroids: Array[Array[Double]]): DataFrame = {
    // consumed three times (both join sides + the anti-join base), and
    // the cell-assign projection is an interpreted HOF over cells×dim
    // products — materialize once ([[Mat]], persist-with-lineage)
    val assigned = Mat.materialize(withNorm(emb).select(col("vec_id"), col("emb"), col("nrm"),
      assignCell(col("emb"), centroids).cast("int").as("cell")))
    val keep = assigned.select(col("cell"), col("vec_id").as("keep_id"),
      col("emb").as("kemb"), col("nrm").as("knrm"))
    val cand = assigned.select(col("cell"), col("vec_id").as("cand_id"),
      col("emb").as("cemb"), col("nrm").as("cnrm"))
    val dropped = cand.join(keep, Seq("cell"))
      .filter(col("keep_id") < col("cand_id") &&
        simExpr(col("kemb"), col("cemb"), col("knrm"), col("cnrm")) >= threshold)
      .select(col("cand_id").as("vec_id")).distinct()
    assigned.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }

  /** DuckDB oracle for [[semanticDedup]] over table `embeddings`. */
  def semanticDedupSql(threshold: Double, cells: Int, dim: Int): String = {
    val dots = ivfDotsSql("emb", cells, dim)
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |d AS (SELECT vec_id, emb, $dots AS dl FROM e),
       |post AS (SELECT vec_id, emb, (list_position(dl, list_max(dl)) - 1)::INT AS cell FROM d),
       |dropped AS (SELECT DISTINCT c.vec_id
       |  FROM post c JOIN post k ON k.cell = c.cell AND k.vec_id < c.vec_id
       |  WHERE ${simSql("k.emb", "c.emb")} >= $threshold)
       |SELECT p.vec_id, p.cell FROM post p
       |WHERE p.vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin
  }
}
