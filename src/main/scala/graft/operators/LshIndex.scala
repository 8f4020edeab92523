package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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
 *     shingle sets, written as parquet plus a meta descriptor pinning
 *     (n, k, bands, kb, gb) so a probe with mismatched parameters fails
 *     loudly instead of silently finding nothing.
 *   - `probe(batch, path)`   — per ingest batch: the batch's band rows
 *     equi-join the INDEX band rows only (never batch x batch), exact
 *     Jaccard verify against the STORED gram sets.
 *   - `append(batch, path)`  — after a batch is admitted, its band rows
 *     and gram sets append to the index (plain parquet appends, no
 *     rewrite), so the next batch dedups against it too. Build/append
 *     dedup their input by doc_id defensively (an at-least-once
 *     upstream can redeliver; double band rows would double candidate
 *     counts, not correctness, but cheap to prevent).
 *   - `compact(path)`        — offline maintenance: per-batch appends
 *     accrete one small file set per batch; compaction rewrites each
 *     store to ~one file per partition dir and collapses the occupancy
 *     partials. NOT concurrent-safe with probe/append — run it between
 *     replays (the analog discipline of the reference's checkpoint
 *     -table upkeep, `otsstreamreader/.../core/CheckpointTimeTracker.java`).
 *
 * Per-batch cost shape (the 100 TB contract) — what keeps admission
 * O(batch + candidates), never O(index):
 *
 *   1. ONE fused scan stages (doc_id, sig, grams) per batch
 *      ([[Dedup.sigAndGrams]]): one shuffle, one persisted frame,
 *      reused by the candidate join, the verify, AND the post-commit
 *      append — the batch is never re-shingled.
 *   2. Band keys are 8-byte longs (xxhash64 of the signature slice),
 *      so the per-batch broadcast and the stored band table stay
 *      narrow. `bands/` is partitioned by (band_idx, kb =
 *      pmod(hash(band_key), kb buckets)); the candidate join carries
 *      both partition columns with the probe side broadcast, so
 *      dynamic partition pruning reads only touched key-buckets.
 *   3. The exact-Jaccard verify broadcasts the (candidates-only) left
 *      side carrying gb = pmod(hash(doc_id), gb buckets), so the
 *      `grams/` read DPP-prunes to the buckets holding candidate docs
 *      — never the full corpus gram table. The whole probe is ONE lazy
 *      plan; [[admit]] materializes it with a single bounded action
 *      (see there), so per-batch driver round-trips stay constant.
 *   4. Band-bucket occupancy (the mega-bucket cap input) is maintained
 *      INCREMENTALLY: `occ/` holds per-append partial counts
 *      (band_idx, band_key, cnt); the probe sums the partials —
 *      O(distinct keys), independent of corpus row count — instead of
 *      aggregating the full band table. The cap is applied by
 *      anti-joining the PROBE side against the (tiny, broadcast)
 *      over-cap key set, result-identical to filtering the index side
 *      of the inner candidate join.
 *
 * Mega-bucket policy (what the cap means) is unchanged from
 * [[Dedup.minhashLshPairs]]: keys whose INDEX-side occupancy exceeds
 * `maxBucketSize` are excluded from candidate generation.
 *
 * Reference analog: this is the LSH equivalent of the reference's
 * incremental-sync bookkeeping (otsstreamreader keeps per-shard
 * checkpoints so each run reads only new changes —
 * `otsstreamreader/.../core/CheckpointTimeTracker.java`); here the
 * persisted state is the dedup index rather than stream offsets.
 */
object LshIndex {

  private[operators] case class Meta(n: Int, k: Int, bands: Int, kb: Int, gb: Int)

  /** Default hash-bucket counts for the two partitioned stores. More
    * buckets = finer pruning per probe but more partition dirs per
    * append (bounded by [[compact]]). */
  val DefaultKeyBuckets = 32
  val DefaultGramBuckets = 64

  /** Above this many VERIFIED pairs per batch, [[admit]] falls back
    * from the driver-collected steady path (one bounded collect; audit
    * write and drop filters become driver-local) to the fully
    * distributed path — this bounds the only driver-side
    * materialization in admission. */
  val PointLookupMax = 8192

  /** Index parameters are immutable once built (build overwrites the
    * descriptor and refreshes this), so per-batch probes skip the
    * repeated driver-side json read. Single-writer per index path is
    * assumed (one replay owns its index), as everywhere in this file. */
  private val metaCache = new java.util.concurrent.ConcurrentHashMap[String, Meta]()

  private def kbCol(m: Meta): Column = pmod(hash(col("band_key")), lit(m.kb))
  private def gbCol(id: Column, m: Meta): Column = pmod(hash(id), lit(m.gb))

  /** Band rows (doc_id, band_idx, band_key) from a staged
    * (doc_id, sig, grams) frame. band_key = xxhash64 of the signature
    * slice — an 8-byte key (vs [[Dedup.bandedRaw]]'s hex md5, kept
    * there for oracle parity): two docs share a bucket iff their
    * slices match, identically to the md5 keying, but the stored band
    * table, the occupancy table, and the per-batch broadcast all stay
    * 4x narrower. */
  private def bandRows(staged: DataFrame, m: Meta): DataFrame = {
    val r = m.k / m.bands
    staged.select(col("doc_id"),
      explode(array((0 until m.bands).map { b =>
        struct(lit(b).as("band_idx"),
          xxhash64(slice(col("sig"), b * r + 1, r)).as("band_key"))
      }: _*)).as("band"))
      .select(col("doc_id"), col("band.band_idx"), col("band.band_key"))
  }

  /** Build the index at `path` from scratch (overwrites). */
  def build(corpus: DataFrame, path: String, n: Int, k: Int, bands: Int,
      keyBuckets: Int = DefaultKeyBuckets, gramBuckets: Int = DefaultGramBuckets): Unit = {
    val m = Meta(n, k, bands, keyBuckets, gramBuckets)
    val staged = Mat.materializeIterReleasable(
      Dedup.sigAndGrams(corpus.dropDuplicates("doc_id"), n, k))
    buildFromStaged(staged.df, path, m)
    staged.release()
  }

  /** The build tail over an already-staged (doc_id, sig, grams) frame
    * (callers pass a materialized frame — it is consumed three times).
    * Write order: grams, bands, occupancy, meta LAST — meta is the
    * existence marker, so a crashed build never leaves a readable
    * index (and a band row without its gram set can never exist). */
  private def buildFromStaged(staged: DataFrame, path: String, m: Meta): Unit = {
    val spark = staged.sparkSession
    staged.select(col("doc_id"), col("grams"))
      .withColumn("gb", gbCol(col("doc_id"), m))
      .repartition(col("gb")).sortWithinPartitions("doc_id")
      .write.mode(SaveMode.Overwrite).partitionBy("gb").parquet(s"$path/grams")
    val banded = bandRows(staged, m).withColumn("kb", kbCol(m))
    // spread each (band_idx, kb) dir across tasks by band_key so a
    // large corpus build is not bottlenecked on one task per dir
    banded.repartition(col("band_idx"), col("kb"), col("band_key"))
      .write.mode(SaveMode.Overwrite).partitionBy("band_idx", "kb").parquet(s"$path/bands")
    banded.groupBy(col("band_idx"), col("band_key")).agg(count(lit(1)).as("cnt"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/occ")
    import spark.implicits._
    Seq((m.n, m.k, m.bands, m.kb, m.gb)).toDF("n", "k", "bands", "kb", "gb")
      .coalesce(1).write.mode(SaveMode.Overwrite).json(s"$path/meta")
    metaCache.put(path, m)
  }

  /** Append an admitted batch's band rows + gram sets to the index
    * (the recompute path — [[indexAdmitted]] reuses the probe's staged
    * frame instead when admission ran). */
  def append(batch: DataFrame, path: String): Unit = {
    val m = readMeta(batch.sparkSession, path)
    val staged = Mat.materializeIterReleasable(
      Dedup.sigAndGrams(batch.dropDuplicates("doc_id"), m.n, m.k))
    appendFrames(staged.df, path, m)
    staged.release()
  }

  /** The shared append tail over a staged (doc_id, sig, grams) frame.
    * Crash ordering — grams BEFORE bands (a band row whose gram set is
    * missing would silently drop its verified pairs; the reverse
    * merely stores unreachable grams), occupancy after bands (an
    * undercount only delays the mega-bucket cap). Any partial append
    * degrades dedup RECALL for that batch, never table correctness —
    * same contract as the post-commit ordering note on
    * [[indexAdmitted]]. */
  private def appendFrames(staged: DataFrame, path: String, m: Meta): Unit = {
    // repartition by the partition dirs: one file per touched dir per
    // batch (otherwise every task writes a sliver into every dir);
    // grams sorted by doc_id inside each bucket so the point-lookup
    // verify's IN pushdown skips pages
    staged.select(col("doc_id"), col("grams"))
      .withColumn("gb", gbCol(col("doc_id"), m))
      .repartition(col("gb")).sortWithinPartitions("doc_id")
      .write.mode(SaveMode.Append).partitionBy("gb").parquet(s"$path/grams")
    val banded = bandRows(staged, m)
    banded.withColumn("kb", kbCol(m))
      .repartition(col("band_idx"), col("kb"))
      .write.mode(SaveMode.Append).partitionBy("band_idx", "kb").parquet(s"$path/bands")
    banded.groupBy(col("band_idx"), col("band_key")).agg(count(lit(1)).as("cnt"))
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(s"$path/occ")
  }

  /** Near-duplicates of each batch doc among the indexed corpus:
    * (doc_id, dup_of, jaccard), one row per verified pair. Band
    * parameters come from the index's meta descriptor. */
  def probe(batch: DataFrame, path: String, threshold: Double,
      maxBucketSize: Int = 1000): DataFrame =
    probeStaged(batch, path, threshold, maxBucketSize).pairs

  /** [[probe]]'s working set: the pair result plus the batch's
    * materialized staged frame (reused by [[indexAdmitted]] so the
    * post-commit append never re-shingles). Callers that consume per
    * micro-batch ([[admit]]) must release, or a long replay
    * accumulates persisted tables in the CacheManager. */
  private[operators] final case class Probed(
      pairs: DataFrame, staged: Mat.Handle) {
    def release(): Unit = staged.release()
  }

  /** The probe is ONE lazy plan (a single Spark action materializes
    * staged scan + cap + candidate join + verify together — per-batch
    * driver round-trips are the dominant admission cost at micro-batch
    * sizes, so nothing here forces an action):
    *
    *   staged(doc_id, sig, grams)                 [persisted, reused]
    *     -> band rows -> anti-join over-cap keys  [occ partial sums]
    *     -> BROADCAST -> join bands/ on (band_idx, kb, band_key)
    *                                              [DPP to touched kb]
    *     -> distinct candidates + batch grams
    *     -> BROADCAST -> join grams/ on (gb, doc_id)
    *                                              [DPP to touched gb]
    *     -> exact Jaccard >= threshold
    */
  private[operators] def probeStaged(batch: DataFrame, path: String,
      threshold: Double, maxBucketSize: Int, dedupe: Boolean = true): Probed = {
    val spark = batch.sparkSession
    val m = readMeta(spark, path)
    // either this dropDuplicates or the caller's ([[admit]]) leaves the
    // frame hash-partitioned by doc_id, so the staged scan skips its
    // parallelism repartition in both cases
    val docs = if (dedupe) batch.dropDuplicates("doc_id") else batch
    val staged = Mat.materializeIterReleasable(
      Dedup.sigAndGrams(docs, m.n, m.k, shuffled = true))
    val probeBands = bandRows(staged.df, m)
    // mega-bucket cap from the INCREMENTAL occupancy partials (sum per
    // key — O(distinct keys), never the corpus band table), applied to
    // the probe side: an inner equi-join makes that result-identical
    // to filtering the index side, the over-cap key set is tiny (so it
    // broadcasts), and the index scan stays free to DPP-prune. Skipped
    // entirely at Int.MaxValue (same short-circuit as Dedup.capBuckets).
    val probeCapped =
      if (maxBucketSize == Int.MaxValue) probeBands
      else {
        val bigBuckets = spark.read.parquet(s"$path/occ")
          .groupBy(col("band_idx"), col("band_key")).agg(sum(col("cnt")).as("bucket_n"))
          .filter(col("bucket_n") > maxBucketSize)
          .select(col("band_idx"), col("band_key"))
        probeBands.join(bigBuckets, Seq("band_idx", "band_key"), "left_anti")
      }
    val idxBands = spark.read.parquet(s"$path/bands")
    val cand = broadcast(probeCapped.withColumn("kb", kbCol(m))).as("a")
      .join(idxBands.as("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.kb") === col("b.kb") &&
          col("a.band_key") === col("b.band_key"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("dup_of"))
      .distinct()
    val idxGrams = spark.read.parquet(s"$path/grams")
    val candWithGrams = cand.withColumn("gb", gbCol(col("dup_of"), m)).as("c")
      .join(staged.df.as("ga"), col("c.doc_id") === col("ga.doc_id"))
      .select(col("c.doc_id").as("doc_id"), col("c.dup_of").as("dup_of"),
        col("c.gb").as("gb"), col("ga.grams").as("grams_a"))
    val out = broadcast(candWithGrams).as("cg")
      .join(idxGrams.as("gi"),
        col("cg.gb") === col("gi.gb") && col("cg.dup_of") === col("gi.doc_id"))
      .withColumn("jaccard", round(Dedup.jaccard(col("cg.grams_a"), col("gi.grams")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("cg.doc_id").as("doc_id"), col("cg.dup_of").as("dup_of"), col("jaccard"))
    Probed(out, staged)
  }

  private def readMeta(spark: SparkSession, path: String): Meta = {
    val cached = metaCache.get(path)
    if (cached != null) return cached
    val row = spark.read.json(s"$path/meta").select("n", "k", "bands", "kb", "gb").head()
    val m = Meta(row.getLong(0).toInt, row.getLong(1).toInt, row.getLong(2).toInt,
      row.getLong(3).toInt, row.getLong(4).toInt)
    metaCache.put(path, m)
    m
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
    s"n=${m.n} k=${m.k} bands=${m.bands} keyBuckets=${m.kb} gramBuckets=${m.gb}"
  }

  /** Offline index maintenance: rewrite `bands/` and `grams/` to ~one
    * file per partition dir and collapse `occ/` partials to one
    * aggregated file, so file count stays bounded over long replays
    * (per-batch appends add one file set per touched dir per batch).
    * Each store swaps via rename (new written beside, old moved away,
    * new moved in); a crash mid-swap leaves either the old or the new
    * store findable under `<store>` or `<store>.old` — re-running
    * compact heals it. Must not run concurrently with probe/append on
    * the same index. */
  def compact(spark: SparkSession, path: String): Unit = {
    val m = readMeta(spark, path)
    swapRewrite(spark, s"$path/bands") { df =>
      df.repartition(col("band_idx"), col("kb"))
        .write.mode(SaveMode.Overwrite).partitionBy("band_idx", "kb")
    }
    swapRewrite(spark, s"$path/grams") { df =>
      df.repartition(col("gb")).sortWithinPartitions("doc_id")
        .write.mode(SaveMode.Overwrite).partitionBy("gb")
    }
    swapRewrite(spark, s"$path/occ") { df =>
      df.groupBy(col("band_idx"), col("band_key")).agg(sum(col("cnt")).as("cnt"))
        .coalesce(1)
        .write.mode(SaveMode.Overwrite)
    }
    val _ = m // parameters pinned; compaction never changes them
  }

  /** Rewrite a parquet store in place: read `store`, write per `plan`
    * to `store.tmp`, swap with renames, delete the old copy. A leftover
    * `store.old` from a previous crash is healed first (the swap's
    * second rename never ran, so `store` is absent and `.old` IS the
    * live copy). */
  private def swapRewrite(spark: SparkSession, store: String)(
      plan: DataFrame => org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(store)
    val tmp = new org.apache.hadoop.fs.Path(store + ".tmp")
    val old = new org.apache.hadoop.fs.Path(store + ".old")
    if (!fs.exists(live) && fs.exists(old)) {
      if (!fs.rename(old, live))
        throw new IllegalStateException(s"compact: crash-heal rename failed for $store")
    }
    fs.delete(tmp, true)
    fs.delete(old, true)
    plan(spark.read.parquet(store)).parquet(tmp.toString)
    if (!fs.rename(live, old) || !fs.rename(tmp, live))
      throw new IllegalStateException(s"compact: store swap failed for $store")
    fs.delete(old, true)
  }

  /** Total data-file count across the index's three stores (bounded-
    * size driver walk over the index dir only) — the compaction
    * observable specs and operators monitor to decide when to run
    * [[compact]]. */
  def dataFileCount(spark: SparkSession, path: String): Long = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("bands", "grams", "occ").map { store =>
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

  /** Result of [[admit]]: the batch with every event of a near-dup doc
    * removed, the admitted docs' (doc_id, text) side, the dropped-doc
    * count, the probe's staged (doc_id, sig, grams) frame + the
    * dropped-doc filter over it (so [[indexAdmitted]] builds/appends
    * WITHOUT re-shingling), and a release for all cached
    * intermediates — callers release AFTER [[indexAdmitted]]. */
  final case class Admission(
      admitted: DataFrame,
      admittedDocs: DataFrame,
      droppedDocs: Long,
      release: () => Unit,
      private[operators] val staged: Option[DataFrame] = None,
      private[operators] val admittedOf: DataFrame => DataFrame = identity)

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
    * batch is STILL staged (with the spec's n/k) so the caller's
    * [[indexAdmitted]] builds the index from the staged frame without
    * re-shingling; thereafter probe parameters always come from the
    * index's own meta descriptor. */
  def admit(batch: DataFrame, indexDir: String, threshold: Double,
      maxBucketSize: Int, batchId: Long, n: Int, k: Int): Admission = {
    val spark = batch.sparkSession
    val docs = batch
      .filter(col("op") =!= "D" && col("tokens").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tokens")).as("text"))
      .dropDuplicates("doc_id")
    if (!exists(spark, indexDir)) {
      val staged = Mat.materializeIterReleasable(
        Dedup.sigAndGrams(docs, n, k, shuffled = true))
      return Admission(batch, docs, 0L, staged.release, Some(staged.df))
    }
    val probed = probeStaged(docs, indexDir, threshold, maxBucketSize, dedupe = false)
    val pairs = probed.pairs.filter(col("doc_id") =!= col("dup_of"))
    val droppedDir = s"$indexDir/dropped/batch_id=$batchId"
    // steady state: ONE bounded action runs the whole probe plan and
    // lands the (tiny) verified pairs on the driver — the audit write
    // becomes a local single-task job and the batch/staged filters
    // become codegen'd IN-set predicates instead of per-batch joins.
    // The limit+1 collect detects overflow; above the bound the rare
    // dup-storm batch falls back to the fully distributed path.
    val local = pairs.limit(PointLookupMax + 1).collect()
    if (local.length <= PointLookupMax) {
      spark.createDataFrame(java.util.Arrays.asList(local: _*), pairs.schema)
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(droppedDir)
      val ids = local.map(_.get(0)).distinct
      val keep =
        if (ids.isEmpty) lit(true)
        else !col("doc_id").isin(ids.toIndexedSeq: _*)
      Admission(
        admitted = if (ids.isEmpty) batch else batch.filter(keep),
        admittedDocs = if (ids.isEmpty) docs else docs.filter(keep),
        droppedDocs = ids.length.toLong,
        release = probed.release,
        staged = Some(probed.staged.df),
        admittedOf = st => if (ids.isEmpty) st else st.filter(keep))
    } else {
      val h = Mat.materializeIterReleasable(pairs)
      h.df.write.mode(SaveMode.Overwrite).parquet(droppedDir)
      val dupIds = h.df.select("doc_id").distinct()
      val dropped = dupIds.count() // dupIds is small (verified pairs only)
      Admission(
        admitted = batch.join(dupIds, Seq("doc_id"), "left_anti"),
        admittedDocs = docs.join(dupIds, Seq("doc_id"), "left_anti"),
        droppedDocs = dropped,
        release = () => { h.release(); probed.release() },
        staged = Some(probed.staged.df),
        admittedOf = st => st.join(dupIds, Seq("doc_id"), "left_anti"))
    }
  }

  /** Index the admitted docs of a committed batch: first batch builds
    * the index (spec params), later batches append — reusing the
    * probe's staged (doc_id, sig, grams) frame (anti-joined against
    * the dropped ids) so the batch is never re-shingled. Callers run
    * this AFTER the lake commit: a crash in between loses only index
    * entries (later dups of them get admitted — degraded dedup
    * recall), never table rows; the reverse order could drop data on a
    * foreachBatch retry. */
  def indexAdmitted(a: Admission, indexDir: String,
      n: Int, k: Int, bands: Int): Unit = {
    val spark = a.admittedDocs.sparkSession
    if (!exists(spark, indexDir)) a.staged match {
      case Some(st) => buildFromStaged(a.admittedOf(st), indexDir,
        Meta(n, k, bands, DefaultKeyBuckets, DefaultGramBuckets))
      case None => build(a.admittedDocs, indexDir, n, k, bands)
    } else a.staged match {
      case Some(st) => appendFrames(a.admittedOf(st), indexDir,
        readMeta(spark, indexDir))
      case None => append(a.admittedDocs, indexDir)
    }
  }
}
