package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted MinHash-LSH INDEX — the production form of dedup-on-ingest.
 *
 * [[Dedup.incrementalNearDup]] demonstrates the batch-vs-corpus query
 * over one in-memory frame; at 10^10-document scale the existing
 * corpus's band table cannot be recomputed per ingest batch (that would
 * re-shingle the whole corpus every batch). This object materializes it
 * once as an on-disk index and keeps it current incrementally:
 *
 *   - `build(corpus, path)`  — full scan once: band rows + distinct
 *     shingle sets, written as parquet (bands/ partitioned by band_idx,
 *     grams/ keyed by doc_id) plus a meta descriptor pinning (n, k,
 *     bands) so a probe with mismatched parameters fails loudly instead
 *     of silently finding nothing.
 *   - `probe(batch, path)`   — per ingest batch: the batch's band rows
 *     equi-join the INDEX band rows only (never batch x batch), exact
 *     Jaccard verify against the STORED gram sets. Per-batch cost is
 *     O(batch shingles + candidate pairs); the corpus is touched only
 *     through the band-key join and the candidate-id gram lookups.
 *   - `append(batch, path)`  — after a batch is admitted, its band rows
 *     and gram sets append to the index (plain parquet appends, no
 *     rewrite), so the next batch dedups against it too. Build/append
 *     dedup their input by doc_id defensively (an at-least-once
 *     upstream can redeliver; double band rows would double candidate
 *     counts, not correctness, but cheap to prevent).
 *
 * Mega-bucket treatment at probe time: index-side bucket occupancy is a
 * partial-aggregated `groupBy(band_idx, band_key).count` (NOT a row-
 * inflating window), and keys above `maxBucketSize` are dropped from
 * the join — same policy and rationale as [[Dedup.minhashLshPairs]]. At
 * scale this count table would be maintained incrementally next to the
 * index; recomputing it is one cheap aggregate over the (narrow) band
 * table, not over the corpus text.
 *
 * Reference analog: this is the LSH equivalent of the reference's
 * incremental-sync bookkeeping (otsstreamreader keeps per-shard
 * checkpoints so each run reads only new changes —
 * `otsstreamreader/.../core/CheckpointTimeTracker.java`); here the
 * persisted state is the dedup index rather than stream offsets.
 */
object LshIndex {

  private case class Meta(n: Int, k: Int, bands: Int)

  /** Build the index at `path` from scratch (overwrites). */
  def build(corpus: DataFrame, path: String, n: Int, k: Int, bands: Int): Unit = {
    val spark = corpus.sparkSession
    val docs = corpus.dropDuplicates("doc_id")
    Dedup.bandedRaw(docs, n, k, bands)
      .write.mode(SaveMode.Overwrite).partitionBy("band_idx").parquet(s"$path/bands")
    Dedup.gramsOf(docs, n)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/grams")
    import spark.implicits._
    Seq((n, k, bands)).toDF("n", "k", "bands")
      .coalesce(1).write.mode(SaveMode.Overwrite).json(s"$path/meta")
  }

  /** Append an admitted batch's band rows + gram sets to the index. */
  def append(batch: DataFrame, path: String): Unit = {
    val m = readMeta(batch.sparkSession, path)
    val docs = batch.dropDuplicates("doc_id")
    Dedup.bandedRaw(docs, m.n, m.k, m.bands)
      .write.mode(SaveMode.Append).partitionBy("band_idx").parquet(s"$path/bands")
    Dedup.gramsOf(docs, m.n)
      .write.mode(SaveMode.Append).parquet(s"$path/grams")
  }

  /** Near-duplicates of each batch doc among the indexed corpus:
    * (doc_id, dup_of, jaccard), one row per verified pair. Band
    * parameters come from the index's meta descriptor. */
  def probe(batch: DataFrame, path: String, threshold: Double,
      maxBucketSize: Int = 1000): DataFrame = {
    val spark = batch.sparkSession
    val m = readMeta(spark, path)
    val docs = batch.dropDuplicates("doc_id")
    val idxBands = spark.read.parquet(s"$path/bands")
    // cap on index-side occupancy, skipped entirely at Int.MaxValue
    // (same short-circuit as Dedup.capBuckets — no point scanning the
    // whole index for an aggregate that can never drop a key)
    val idxCapped =
      if (maxBucketSize == Int.MaxValue) idxBands
      else {
        val bigBuckets = idxBands.groupBy(col("band_idx"), col("band_key"))
          .agg(count(lit(1)).as("bucket_n")).filter(col("bucket_n") > maxBucketSize)
          .select(col("band_idx"), col("band_key"))
        idxBands.join(bigBuckets, Seq("band_idx", "band_key"), "left_anti")
      }
    val probeBands = Dedup.bandedRaw(docs, m.n, m.k, m.bands)
    val cand = probeBands.as("a")
      .join(idxCapped.as("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.band_key") === col("b.band_key"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("dup_of"))
      .distinct()
    val batchGrams = Mat.materialize(Dedup.gramsOf(docs, m.n))
    val idxGrams = spark.read.parquet(s"$path/grams")
    cand.as("c").join(batchGrams.as("ga"), col("c.doc_id") === col("ga.doc_id"))
      .join(idxGrams.as("gb"), col("c.dup_of") === col("gb.doc_id"))
      .withColumn("jaccard", round(Dedup.jaccard(col("ga.grams"), col("gb.grams")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("c.doc_id").as("doc_id"), col("c.dup_of").as("dup_of"), col("jaccard"))
  }

  private def readMeta(spark: SparkSession, path: String): Meta = {
    val row = spark.read.json(s"$path/meta").select("n", "k", "bands").head()
    Meta(row.getLong(0).toInt, row.getLong(1).toInt, row.getLong(2).toInt)
  }
}
