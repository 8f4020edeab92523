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
 *    the per-anchor top-k is a windowed rank over (anchor × corpus) —
 *    never an all-pairs product. This is the exact baseline you'd use to
 *    measure recall of the approximate path.
 *  - [[lshTopK]] / LSH bucketing — random-hyperplane signatures: each
 *    vector gets a `bits`-bit bucket id (sign of <w_j, v> for fixed
 *    deterministic hyperplanes w_j); candidates are same-bucket pairs, so
 *    the join is a hash shuffle on the bucket id and the quadratic term
 *    is bounded by bucket occupancy (corpus/2^bits on average). At scale
 *    you'd add multi-probe or repeat with independent hyperplane sets to
 *    recover recall; the plan shape is unchanged.
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
  private def withNorm(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"), col("emb"), sqrt(dot(col("emb"), col("emb"))).as("nrm"))

  /** `bits`-bit LSH bucket id of an embedding column. */
  def lshBucket(v: Column, bits: Int, dim: Int): Column = {
    val w = planeWeights(bits, dim)
    (0 until bits).map { j =>
      when(dotLit(v, w(j)) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** DuckDB SQL for the same bucket id over expression `e` (a DOUBLE[]
    * of length `dim`). */
  def lshBucketSql(e: String, bits: Int, dim: Int): String = {
    val w = planeWeights(bits, dim)
    (0 until bits).map { j =>
      val lits = w(j).map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"(CASE WHEN list_sum(list_transform(range(1, ${dim + 1}), i -> ($e)[i] * ($lits::DOUBLE[])[i])) >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** Rounded similarity from pre-normed sides: dot/(nrmA*nrmB). */
  private def simExpr(aEmb: Column, bEmb: Column, aNrm: Column, bNrm: Column): Column =
    round(dot(aEmb, bEmb) / (aNrm * bNrm), 6)

  /** Exact top-k: anchors (rows matching `anchorPred`) vs full corpus.
    * Returns (anchor_id, rank, neighbor_id, sim). */
  def bruteForceTopK(emb: DataFrame, anchorPred: Column, k: Int): DataFrame = {
    val corpus = withNorm(emb)
    val anchors = corpus.filter(anchorPred)
      .select(col("vec_id").as("anchor_id"), col("emb").as("aemb"), col("nrm").as("anrm"))
    val scored = corpus.join(broadcast(anchors), col("anchor_id") =!= col("vec_id"))
      .select(col("anchor_id"), col("vec_id").as("neighbor_id"),
        simExpr(col("aemb"), col("emb"), col("anrm"), col("nrm")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("anchor_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Approximate top-k: candidates restricted to the anchor's LSH bucket.
    * Same output shape as [[bruteForceTopK]]. */
  def lshTopK(emb: DataFrame, anchorPred: Column, k: Int, bits: Int, dim: Int): DataFrame = {
    val bucketed = withNorm(emb)
      .withColumn("bucket", lshBucket(col("emb"), bits, dim))
    val anchors = bucketed.filter(anchorPred)
      .select(col("vec_id").as("anchor_id"), col("emb").as("aemb"),
        col("nrm").as("anrm"), col("bucket"))
    val scored = bucketed.join(broadcast(anchors), Seq("bucket"))
      .filter(col("anchor_id") =!= col("vec_id"))
      .select(col("anchor_id"), col("vec_id").as("neighbor_id"),
        simExpr(col("aemb"), col("emb"), col("anrm"), col("nrm")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("anchor_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs: same LSH bucket AND
    * cosine >= threshold. Returns (vec_a, vec_b, sim), vec_a < vec_b.
    * The bucket equi-join keeps this a hash shuffle, not O(n²). */
  def nearDupPairs(emb: DataFrame, threshold: Double, bits: Int, dim: Int): DataFrame = {
    val bucketed = withNorm(emb)
      .withColumn("bucket", lshBucket(col("emb"), bits, dim))
    val a = bucketed.as("a")
    val b = bucketed.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        simExpr(col("a.emb"), col("b.emb"), col("a.nrm"), col("b.nrm")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
