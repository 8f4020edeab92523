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
      maxBucketSize: Int = 1000): DataFrame =
    probeReleasable(batch, path, threshold, maxBucketSize)._1

  /** [[probe]] plus an explicit release of the cached batch-gram
    * intermediate — per-micro-batch callers ([[admit]]) must release
    * once the result is consumed, or a long replay accumulates one
    * persisted table per batch in the CacheManager. */
  private[operators] def probeReleasable(batch: DataFrame, path: String,
      threshold: Double, maxBucketSize: Int): (DataFrame, () => Unit) = {
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
    val batchGrams = Mat.materializeIterReleasable(Dedup.gramsOf(docs, m.n))
    val idxGrams = spark.read.parquet(s"$path/grams")
    val out = cand.as("c").join(batchGrams.df.as("ga"), col("c.doc_id") === col("ga.doc_id"))
      .join(idxGrams.as("gb"), col("c.dup_of") === col("gb.doc_id"))
      .withColumn("jaccard", round(Dedup.jaccard(col("ga.grams"), col("gb.grams")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("c.doc_id").as("doc_id"), col("c.dup_of").as("dup_of"), col("jaccard"))
    (out, batchGrams.release)
  }

  private def readMeta(spark: SparkSession, path: String): Meta = {
    val row = spark.read.json(s"$path/meta").select("n", "k", "bands").head()
    Meta(row.getLong(0).toInt, row.getLong(1).toInt, row.getLong(2).toInt)
  }

  /** Does an index (its meta descriptor) exist at `path`? */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/meta")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Human-readable index parameters, for preCheck reporting. Fails
    * loudly if the descriptor is unreadable. */
  def describe(spark: SparkSession, path: String): String = {
    val m = readMeta(spark, path)
    s"n=${m.n} k=${m.k} bands=${m.bands}"
  }

  /** Result of [[admit]]: the batch with every event of a near-dup doc
    * removed, the admitted docs' (doc_id, text) side (for the
    * post-commit [[indexAdmitted]]), the dropped-doc count, and a
    * release for the cached candidate pairs. */
  final case class Admission(
      admitted: org.apache.spark.sql.DataFrame,
      admittedDocs: org.apache.spark.sql.DataFrame,
      droppedDocs: Long,
      release: () => Unit)

  /** Streaming-ingest admission — dedup-on-ingest as a replay step.
    *
    * The batch's insert/update docs (text = the token sequence rendered
    * as space-joined ids, so shingles are token n-grams) [[probe]] the
    * index; every event of a doc that near-duplicates a DIFFERENT
    * already-indexed doc is dropped from the batch (a doc re-matching
    * itself — an update to an admitted doc — is explicitly excluded).
    * Dropped (doc_id, dup_of, jaccard) rows land under
    * `indexDir/dropped/batch_id=N/` as the audit trail (idempotent
    * overwrite per retried batch, same layout rule as the quarantine).
    *
    * Granularity disclosure: admission is batch-vs-corpus — near-dup
    * pairs WITHIN one micro-batch are both admitted (and both indexed;
    * later dups of either are caught). That is the standard streaming
    * dedup unit; tightening it is one [[Dedup.minhashLshPairs]] call
    * over the batch if a job wants it.
    *
    * With no index at `indexDir` yet, everything is admitted and the
    * caller's [[indexAdmitted]] builds the index from the first batch
    * (spec params); thereafter probe parameters always come from the
    * index's own meta descriptor. */
  def admit(batch: DataFrame, indexDir: String, threshold: Double,
      maxBucketSize: Int, batchId: Long): Admission = {
    val spark = batch.sparkSession
    val docs = batch
      .filter(col("op") =!= "D" && col("tokens").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tokens")).as("text"))
      .dropDuplicates("doc_id")
    if (!exists(spark, indexDir))
      return Admission(batch, docs, 0L, () => ())
    val (rawPairs, releaseGrams) = probeReleasable(docs, indexDir, threshold, maxBucketSize)
    val pairs = rawPairs.filter(col("doc_id") =!= col("dup_of"))
    val h = Mat.materializeIterReleasable(pairs)
    h.df.write.mode(SaveMode.Overwrite).parquet(s"$indexDir/dropped/batch_id=$batchId")
    releaseGrams() // pairs are materialized by the write; grams done
    val dupIds = h.df.select("doc_id").distinct()
    val dropped = dupIds.count() // dupIds is small (verified pairs only)
    Admission(
      admitted = batch.join(dupIds, Seq("doc_id"), "left_anti"),
      admittedDocs = docs.join(dupIds, Seq("doc_id"), "left_anti"),
      droppedDocs = dropped,
      release = h.release)
  }

  /** Index the admitted docs of a committed batch: first batch builds
    * the index (spec params), later batches append. Callers run this
    * AFTER the lake commit: a crash in between loses only index
    * entries (later dups of them get admitted — degraded dedup recall),
    * never table rows; the reverse order could drop data on a
    * foreachBatch retry. */
  def indexAdmitted(admittedDocs: DataFrame, indexDir: String,
      n: Int, k: Int, bands: Int): Unit =
    if (exists(admittedDocs.sparkSession, indexDir)) append(admittedDocs, indexDir)
    else build(admittedDocs, indexDir, n, k, bands)
}
