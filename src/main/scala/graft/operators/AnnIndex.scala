package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted IVF+PQ ANN INDEX — the servable form of [[Similarity]]'s
 * composed index, with the same store discipline as [[LshIndex]].
 *
 * [[Similarity.ivfPqTopK]] demonstrates the query over one in-memory
 * frame; at 10^10-vector scale the corpus cannot be re-encoded per
 * query (encode is dim·ksub multiply-adds per vector). This object
 * materializes the two stores once and keeps them current by append:
 *
 *   - `postings/` — (vec_id, codes, nrm) PARTITIONED BY the IVF cell:
 *     a probe's cell equi-join carries the partition column with the
 *     anchor side broadcast, so dynamic partition pruning reads ONLY
 *     the probed cells' directories (nProbe/cells of the index).
 *   - `vecs/`     — the float vectors PARTITIONED BY
 *     vb = pmod(hash(vec_id), vbBuckets): the exact rerank fetches the
 *     shortlist ids with STATIC partition pruning — the shortlist
 *     pairs are collected (bounded by |anchors|·shortlist, the serving
 *     contract) with their vb computed in the same job, and the float
 *     read filters `vb IN (buckets) AND vec_id IN (ids)`, so the file
 *     index prunes to the shortlist's bucket dirs at PLANNING time and
 *     the id filter pushes into parquet row-groups. The floats are
 *     never scanned, only fetched (the [[graft.lake.LakeTable
 *     .readKeys]] discipline). A single-plan DPP formulation was tried
 *     and rejected: Catalyst inserts the vb pruning filter, but its
 *     build plan nests the postings' cell-DPP, which defeats
 *     broadcast-exchange reuse, and the planner drops non-reusable DPP
 *     filters under `dynamicPartitionPruning.reuseBroadcastOnly`
 *     (verified against the optimizer's plan-change log).
 *   - `meta/`     — one JSON row pinning (dim, cells, m, ksub, vb) AND
 *     the centroid/codebook arrays themselves: an index is only
 *     rankable under the books that encoded it, so they live WITH the
 *     data, not in code (learned books from [[Similarity.kmeansCentroids]]
 *     / [[Similarity.pqTrainCodebooks]] round-trip through here).
 *
 * `probe` executes the SAME stages as the in-memory operator — both
 * call [[Similarity.adcShortlist]] + [[Similarity.rerankTopK]] over
 * [[Similarity.pqCodesCol]]-encoded postings — so the persisted path
 * cannot drift from the oracle-checked one (the spec asserts row
 * equality; q77 oracle-checks the probe end-to-end). `compact` bounds
 * small-file accretion from per-batch appends via
 * [[LshIndex.swapRewrite]]'s crash-healing store swap. Single-writer
 * per index path, as for [[LshIndex]].
 *
 * Reference analog: the reference ships data to purpose-built serving
 * stores and keeps them current incrementally (e.g. elasticsearchwriter
 * bulk-by-id upserts); here the serving store is an ANN index the
 * engine itself owns, maintained with the same append+compact
 * bookkeeping as its dedup index.
 */
object AnnIndex {

  private[operators] case class Meta(dim: Int, cells: Int, m: Int, ksub: Int, vb: Int,
      centroids: Array[Array[Double]], books: Array[Array[Array[Double]]])

  private val metaCache = new java.util.concurrent.ConcurrentHashMap[String, Meta]()

  /** Build the index over `emb` (vec_id, embedding). With
    * `learn = true`, centroids and codebooks are trained on the corpus
    * (deterministically — see [[Similarity.kmeansCentroids]] /
    * [[Similarity.pqTrainCodebooks]]); otherwise the fixed
    * oracle-checkable defaults are pinned. */
  def build(emb: DataFrame, path: String, cells: Int, m: Int, ksub: Int, dim: Int,
      vbBuckets: Int = 32, learn: Boolean = false, iters: Int = 3,
      lease: Option[graft.lake.WriterLease] = None): Unit = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    graft.lake.WriterLease.guard(emb.sparkSession, path, lease)
    val centroids =
      if (learn) Similarity.kmeansCentroids(emb, cells, dim, iters)
      else Similarity.centroidWeights(cells, dim)
    val books =
      if (learn) Similarity.pqTrainCodebooks(emb, m, ksub, dim, iters)
      else Similarity.pqCodebooks(m, ksub, dim / m)
    val meta = Meta(dim, cells, m, ksub, vbBuckets, centroids, books)
    writeMeta(emb.sparkSession, path, meta)
    writeStores(emb, path, meta, SaveMode.Overwrite)
  }

  /** Append a batch of new vectors under the STORED centroids/books
    * (an index is only rankable under the books that encoded it —
    * re-training would orphan every stored code). Plain partitioned
    * parquet appends; [[compact]] bounds the file count. Input deduped
    * by vec_id defensively, as in [[LshIndex.append]]. CONTRACT: ids
    * must be NEW to the index (the insert-only analog of the engine's
    * CDC appends) — appending an existing id leaves two live postings
    * rows for it, and a probe would rank both; re-embedding is a
    * rebuild concern, not an append. */
  def append(emb: DataFrame, path: String,
      lease: Option[graft.lake.WriterLease] = None): Unit = {
    graft.lake.WriterLease.guard(emb.sparkSession, path, lease)
    val meta = readMeta(emb.sparkSession, path)
    writeStores(emb.dropDuplicates("vec_id"), path, meta, SaveMode.Append)
  }

  /** Live tombstones between compactions must stay driver-collectable:
    * the probe prunes them with a static NOT-IN filter pushed into the
    * postings scan (a tombstone ANTI-JOIN was rejected — an extra join
    * above the postings scan risks the same DPP fragility the vb
    * formulation hit, while a pushed filter provably keeps the probe
    * plan shape). Churn past this bound means [[compact]] is overdue. */
  val MaxLiveTombstones = 100000

  /** DELETE vectors from the index — the churn half of index
    * maintenance (the LSM discipline: deletes are MARKERS, reclaimed at
    * [[compact]]): `ids` (vec_id) rows append to a `tombstones/` store;
    * every probe excludes tombstoned ids from the candidate postings
    * until compaction physically drops their postings/vecs rows and
    * clears the markers. CONTRACT (mirrors append's insert-only rule):
    * a deleted id stays dead until the next compact — re-appending it
    * earlier leaves the marker in force; after compact the id is free
    * to re-enter as a fresh vector (spec-asserted). Single-writer per
    * index path, as for append/compact. */
  def delete(ids: DataFrame, path: String,
      lease: Option[graft.lake.WriterLease] = None): Unit = {
    graft.lake.WriterLease.guard(ids.sparkSession, path, lease)
    ids.select(col("vec_id")).dropDuplicates("vec_id")
      .write.mode(SaveMode.Append).parquet(s"$path/tombstones")
  }

  /** The live tombstone id set (empty when none) — bounded collect,
    * cap-guarded by [[MaxLiveTombstones]]. */
  private def liveTombstones(spark: SparkSession, path: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val rows = spark.read.parquet(p.toString)
      .select(col("vec_id")).dropDuplicates("vec_id")
      .limit(MaxLiveTombstones + 1).collect()
    require(rows.length <= MaxLiveTombstones,
      s"index at $path holds > $MaxLiveTombstones live tombstones — run compact " +
        "before further probes (the probe prunes tombstones driver-side)")
    rows.map(_.getLong(0)).toIndexedSeq
  }

  private def writeStores(emb: DataFrame, path: String, meta: Meta,
      mode: SaveMode): Unit = {
    val base = Similarity.withNorm(emb)
    base.select(col("vec_id"),
        Similarity.assignCell(col("emb"), meta.centroids).as("cell"),
        Similarity.pqCodesCol(col("emb"), meta.books, meta.dim).as("codes"),
        col("nrm"))
      .write.mode(mode).partitionBy("cell").parquet(s"$path/postings")
    emb.select(col("vec_id"), col("embedding"),
        pmod(hash(col("vec_id")), lit(meta.vb)).as("vb"))
      .write.mode(mode).partitionBy("vb").parquet(s"$path/vecs")
  }

  /** Top-k neighbors of each anchor (vec_id, embedding) row against the
    * INDEX: ADC over the DPP-pruned probed cells' postings to a
    * `shortlist`, exact-cosine rerank over only the shortlist's floats.
    * EAGER: the shortlist job runs at call time and its pairs come to
    * the driver (≤ |anchors|·shortlist rows — anchors are small by the
    * serving contract, as for the broadcast probes) so the float fetch
    * can be statically pruned to the shortlist's vb buckets. Anchors
    * that are themselves indexed are excluded as their own neighbors,
    * as in [[Similarity.ivfPqTopK]]. Returns (anchor_id, rank,
    * neighbor_id, sim). */
  def probe(anchors: DataFrame, path: String, k: Int, shortlist: Int,
      nProbe: Int): DataFrame = {
    val spark = anchors.sparkSession
    import spark.implicits._
    val meta = readMeta(spark, path)
    require(nProbe >= 1 && nProbe <= meta.cells, s"nProbe=$nProbe of ${meta.cells} cells")
    require(shortlist >= k, s"shortlist=$shortlist < k=$k")
    val a = Similarity.withNorm(anchors)
    val probes = Similarity.ivfPqProbes(a, meta.centroids, nProbe, meta.books, meta.dim)
    // tombstone pruning: a static pushed filter on the postings scan
    // (bounded id set — see MaxLiveTombstones), so deleted vectors can
    // never crowd the ADC shortlist, and the plan shape (cell DPP +
    // broadcast probes) is untouched
    val dead = liveTombstones(spark, path)
    val postings0 = spark.read.parquet(s"$path/postings")
      .select(col("vec_id"), col("cell"), col("codes"), col("nrm"))
    val postings =
      if (dead.isEmpty) postings0
      else postings0.filter(!col("vec_id").isInCollection(dead))
    // phase 1: ADC shortlist, vb computed in the same job (the hash
    // MUST be the store's writer hash — computing it engine-side, not
    // driver-side, keeps the two definitionally identical)
    val pairs = Similarity.adcShortlist(postings, probes, shortlist, meta.m, meta.ksub)
      .select(col("anchor_id"), col("neighbor_id"),
        pmod(hash(col("neighbor_id")), lit(meta.vb)).cast("int").as("nvb"))
      .collect()
    if (pairs.isEmpty)
      return Seq.empty[(Long, Int, Long, Double)]
        .toDF("anchor_id", "rank", "neighbor_id", "sim")
    val buckets = pairs.map(_.getInt(2)).distinct.toIndexedSeq
    val ids = pairs.map(_.getLong(1)).distinct.toIndexedSeq
    val cand = pairs.map(r => (r.getLong(0), r.getLong(1))).toIndexedSeq
      .toDF("anchor_id", "neighbor_id")
    // phase 2: fetch ONLY the shortlist's buckets (file-index pruning)
    // and ids (parquet row-group pushdown), then exact rerank
    val floats = spark.read.parquet(s"$path/vecs")
      .filter(col("vb").isInCollection(buckets))
      .filter(col("vec_id").isInCollection(ids))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"), col("emb"),
        sqrt(Similarity.dot(col("emb"), col("emb"))).as("nrm"))
    val anchorSide = a.select(col("vec_id").as("anchor_id"),
      col("emb").as("aemb"), col("nrm").as("anrm"))
    Similarity.rerankTopK(broadcast(cand), floats, anchorSide, k)
  }

  /** Offline maintenance: rewrite both stores to ~one file per
    * partition dir (per-batch appends add one file set per touched dir
    * per batch), physically dropping tombstoned ids, then clear the
    * tombstone markers. Crash-safe ordering: the store swaps land
    * first ([[LshIndex.swapRewrite]] crash-heals), the marker clear
    * last — a crash in between leaves markers whose rows are already
    * gone, and the probe's NOT-IN prune is idempotent over them. Not
    * concurrent-safe with probe/append on the same index. */
  def compact(spark: SparkSession, path: String,
      lease: Option[graft.lake.WriterLease] = None): Unit = {
    graft.lake.WriterLease.guard(spark, path, lease)
    val preSwap: () => Unit = () => graft.lake.WriterLease.guard(spark, path, lease)
    val dead = liveTombstones(spark, path)
    def dropDead(df: DataFrame): DataFrame =
      if (dead.isEmpty) df else df.filter(!col("vec_id").isInCollection(dead))
    LshIndex.swapRewrite(spark, s"$path/postings", preSwap) { df =>
      dropDead(df.get).dropDuplicates("vec_id")
        .repartition(col("cell")).sortWithinPartitions("cell", "vec_id")
        .write.mode(SaveMode.Overwrite).partitionBy("cell")
    }
    LshIndex.swapRewrite(spark, s"$path/vecs", preSwap) { df =>
      dropDead(df.get).dropDuplicates("vec_id")
        .repartition(col("vb")).sortWithinPartitions("vb", "vec_id")
        .write.mode(SaveMode.Overwrite).partitionBy("vb")
    }
    val t = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(t)) fs.delete(t, true)
  }

  /** Data-file count across both stores (driver walk of the index dir
    * only) — the observable compaction bounds. */
  def dataFileCount(spark: SparkSession, path: String): Long = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("postings", "vecs").map { store =>
      val p = new org.apache.hadoop.fs.Path(root, store)
      if (!fs.exists(p)) 0L
      else {
        val it = fs.listFiles(p, true)
        var n = 0L
        while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
        n
      }
    }.sum
  }

  /** Auto-compaction hook for ingest loops (the ANN analog of the job
    * spec's `dedup.compactEvery`): compact when the persisted store's
    * data-file count exceeds `maxDataFiles`, no-op below it. Call it
    * between appends from the store's single writer — the same
    * serial-mutation window [[compact]] requires. Returns whether a
    * compaction ran. */
  def compactIfOver(spark: SparkSession, path: String, maxDataFiles: Long,
      lease: Option[graft.lake.WriterLease] = None): Boolean =
    if (dataFileCount(spark, path) > maxDataFiles) {
      compact(spark, path, lease); true
    } else false

  private def writeMeta(spark: SparkSession, path: String, m: Meta): Unit = {
    import spark.implicits._
    // arrays flattened row-major with their dims pinned alongside —
    // exact double round-trip through Spark's JSON (17 sig digits)
    Seq((m.dim, m.cells, m.m, m.ksub, m.vb,
        m.centroids.flatten.toSeq, m.books.flatten.flatten.toSeq))
      .toDF("dim", "cells", "m", "ksub", "vb", "centroids", "books")
      .coalesce(1).write.mode(SaveMode.Overwrite).json(s"$path/meta")
    metaCache.put(path, m)
  }

  private def readMeta(spark: SparkSession, path: String): Meta = {
    val cached = metaCache.get(path)
    if (cached != null) return cached
    val r = spark.read.json(s"$path/meta").head()
    def i(n: String) = r.getLong(r.fieldIndex(n)).toInt
    val (dim, cells, m, ksub, vb) = (i("dim"), i("cells"), i("m"), i("ksub"), i("vb"))
    val cFlat = r.getSeq[Double](r.fieldIndex("centroids"))
    val bFlat = r.getSeq[Double](r.fieldIndex("books"))
    require(cFlat.size == cells * dim && bFlat.size == m * ksub * (dim / m),
      s"index meta at $path is inconsistent (centroids=${cFlat.size}, books=${bFlat.size})")
    val meta = Meta(dim, cells, m, ksub, vb,
      cFlat.grouped(dim).map(_.toArray).toArray,
      bFlat.grouped(ksub * (dim / m)).map(_.grouped(dim / m).map(_.toArray).toArray).toArray)
    metaCache.put(path, meta)
    meta
  }
}
