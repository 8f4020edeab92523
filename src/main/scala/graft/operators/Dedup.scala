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

  /** MinHash signature column: array of `k` salted-md5 minima over the
    * word `n`-gram shingles of `text`. Lexicographic min of equal-length
    * hex digests = numeric min, so this is a standard minhash. */
  def minhashSig(text: Column, n: Int, k: Int): Column = {
    val sh = Portable.shingles(text, n)
    array((0 until k).map { j =>
      array_min(transform(sh, s => Portable.saltedMd5(s, j)))
    }: _*)
  }

  /** LSH candidate pairs: docs agreeing on at least one band of their
    * minhash signature (bands of `r` rows each), verified with exact
    * shingle-set Jaccard >= `threshold`.
    *
    * Plan shape: docs -> (band_idx, band_key) explode -> hash shuffle on
    * the band key -> per-bucket self-join -> distinct pairs -> exact
    * Jaccard verify. Returns (doc_a, doc_b, jaccard), doc_a < doc_b. */
  def minhashLshPairs(docs: DataFrame, n: Int, k: Int, bands: Int, threshold: Double): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val r = k / bands
    val withSig = docs.select(col("doc_id"), col("text"), minhashSig(col("text"), n, k).as("sig"))
    val banded = withSig.select(
      col("doc_id"), col("text"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band_idx"),
          md5(concat_ws("|", slice(col("sig"), b * r + 1, r))).as("band_key"))
      }: _*)).as("band"))
      .select(col("doc_id"), col("text"), col("band.band_idx"), col("band.band_key"))

    val a = banded.as("a")
    val b = banded.as("b")
    val cand = a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.text").as("text_a"), col("b.text").as("text_b"))
      .distinct()

    cand.withColumn("jaccard", round(jaccard(
        array_distinct(Portable.shingles(col("text_a"), n)),
        array_distinct(Portable.shingles(col("text_b"), n))), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** |A ∩ B| / |A ∪ B| over two array columns (callers pass distinct'd
    * arrays). Integer set sizes => the double division is IEEE-exact and
    * identical across engines. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0d, lit(1d)).otherwise(inter / union)
  }

  /** 32-bit SimHash of the word multiset of `text`: bit b is set when
    * Σ_words sign_b(word) >= 0, with sign_b a salted-md5 coin
    * ([[Portable.sign]]). Pure array expressions — no explode, no UDF. */
  def simhash32(text: Column): Column = {
    val ws = Portable.words(text)
    val bitVals = transform(sequence(lit(0), lit(31)), b =>
      when(aggregate(ws, lit(0), (acc, w) => acc + Portable.sign(w, b)) >= 0,
        pow(lit(2.0), b).cast("long")).otherwise(lit(0L)))
    aggregate(bitVals, lit(0L), (acc, v) => acc + v)
  }

  /** DuckDB SQL computing `simhash32` per doc_id over table `tbl` —
    * the unnest/group-by formulation of the same function. */
  def simhash32Sql(tbl: String): String =
    s"""WITH w AS (
       |  SELECT doc_id, unnest(${Portable.wordsSql("text")}) AS word FROM $tbl
       |), bits AS (
       |  SELECT w.doc_id, b.bit, sum(${Portable.signSql("w.word", "b.bit")}) AS s
       |  FROM w CROSS JOIN (SELECT unnest(range(32)) AS bit) b
       |  GROUP BY w.doc_id, b.bit
       |)
       |SELECT doc_id, sum(CASE WHEN s >= 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
       |FROM bits GROUP BY doc_id""".stripMargin

  /** n-gram (character-level unigram-word here: word set) Jaccard of a
    * small anchor set vs the corpus — anchors broadcast, corpus streamed.
    * Returns (anchor_id, doc_id, jaccard) for jaccard >= threshold. */
  def anchorJaccard(docs: DataFrame, anchorPred: Column, n: Int, threshold: Double): DataFrame = {
    val grams = array_distinct(Portable.shingles(col("text"), n))
    val corpus = docs.select(col("doc_id"), grams.as("grams"))
    val anchors = corpus.filter(anchorPred)
      .select(col("doc_id").as("anchor_id"), col("grams").as("agrams"))
    corpus.join(broadcast(anchors), col("anchor_id") < col("doc_id"))
      .withColumn("jaccard", round(jaccard(col("agrams"), col("grams")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("anchor_id"), col("doc_id"), col("jaccard"))
  }
}
