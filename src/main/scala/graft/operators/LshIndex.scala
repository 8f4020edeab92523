package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.WriterLease

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
 *   4. Band-bucket occupancy (the mega-bucket cap input) costs ZERO per
 *      steady-state batch: `occ/` is a full per-key aggregate rewritten
 *      only by build/compact, and the over-cap key set is driver-cached
 *      against the store's mtime. Keys crossing the cap inside the
 *      uncompacted tail window are capped at the next compact
 *      (disclosed staleness — the cap guards candidate volume, not
 *      correctness). The cap is applied by anti-joining the PROBE side
 *      against the (tiny, broadcast) over-cap key set, result-identical
 *      to filtering the index side of the inner candidate join.
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

  /** Index format version. 2 = gram sets stored as SORTED-DISTINCT
    * 60-bit hashes (array<bigint>, [[graft.functions.Portable.hash60]])
    * instead of the gram strings: ~3x narrower on disk and in the
    * verify broadcast, and the exact-Jaccard verify becomes a merge
    * scan (`graft_jaccard_sorted`). Jaccard over the hashed sets equals
    * Jaccard over the string sets (cardinalities preserved; a 60-bit
    * collision within one compared pair's union is ~2^-60 per gram
    * pair — disclosed, not defended against). A probe against an index
    * whose descriptor lacks this version fails loudly. */
  private val FormatVersion = 2

  /** (doc_id, sig, grams) staging for the index stores — grams already
    * hashed, sorted, distinct. Native: ONE `graft_sig_hgrams` call per
    * doc (one md5 per shingle feeds both the signature and the gram
    * hash). Portable fallback: [[Dedup.sigAndGrams]] + an interpreted
    * hash60 transform — value-identical (spec-asserted), so an
    * extension-less session can still probe/append a native-built
    * index, just slower. */
  private def stageHashed(docs: DataFrame, n: Int, k: Int,
      shuffled: Boolean = false): DataFrame = {
    val base0 = docs.select(col("doc_id"), col("text"))
    val base = if (shuffled) base0 else base0.repartition(col("doc_id"))
    if (Dedup.nativeOk(docs.sparkSession, "graft_sig_hgrams"))
      base.select(col("doc_id"),
        call_function("graft_sig_hgrams", col("text"), lit(n), lit(k)).as("sg"))
        .select(col("doc_id"), col("sg.sig").as("sig"), col("sg.hgrams").as("grams"))
    else
      Dedup.sigAndGrams(base, n, k, shuffled = true)
        .select(col("doc_id"), col("sig"),
          array_sort(transform(col("grams"),
            g => graft.functions.Portable.hash60(g))).as("grams"))
  }

  /** Exact-Jaccard column over two staged gram columns (sorted-distinct
    * long arrays): native merge scan when the extension is live, the
    * generic set intersection otherwise — same values. */
  private def jaccardCol(sessionOf: DataFrame, a: Column, b: Column): Column =
    if (Dedup.nativeOk(sessionOf.sparkSession, "graft_jaccard_sorted"))
      call_function("graft_jaccard_sorted", a, b)
    else Dedup.jaccard(a, b)

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

  /** Build the index at `path` from scratch (overwrites). Mutators all
    * take an optional [[WriterLease]] — required once any writer has
    * fenced the store (see [[graft.lake.WriterLease]]). */
  def build(corpus: DataFrame, path: String, n: Int, k: Int, bands: Int,
      keyBuckets: Int = DefaultKeyBuckets, gramBuckets: Int = DefaultGramBuckets,
      lease: Option[WriterLease] = None): Unit = {
    WriterLease.guard(corpus.sparkSession, path, lease)
    val m = Meta(n, k, bands, keyBuckets, gramBuckets)
    val staged = Mat.materializeIterReleasable(
      stageHashed(corpus.dropDuplicates("doc_id"), n, k))
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
      .repartition(col("gb")).sortWithinPartitions("gb", "doc_id")
      .write.mode(SaveMode.Overwrite).partitionBy("gb").parquet(s"$path/grams")
    val banded = bandRows(staged, m).withColumn("kb", kbCol(m))
    // one task per (band_idx, kb) dir => one file per dir. Write
    // parallelism = bands x keyBuckets (128 at defaults) — at corpus
    // scale raise keyBuckets, never the per-dir task count: spreading a
    // dir across tasks multiplies file count by the task count (measured
    // 8k files at one bench build; every later probe paid the listing)
    banded.repartition(col("band_idx"), col("kb"))
      .sortWithinPartitions("band_idx", "kb")
      .write.mode(SaveMode.Overwrite).partitionBy("band_idx", "kb").parquet(s"$path/bands")
    banded.groupBy(col("band_idx"), col("band_key")).agg(count(lit(1)).as("cnt"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/occ")
    writeMeta(spark, path, m)
  }

  private def writeMeta(spark: SparkSession, path: String, m: Meta): Unit = {
    import spark.implicits._
    Seq((m.n, m.k, m.bands, m.kb, m.gb, FormatVersion))
      .toDF("n", "k", "bands", "kb", "gb", "fmt")
      .coalesce(1).write.mode(SaveMode.Overwrite).json(s"$path/meta")
    metaCache.put(path, m)
  }

  /** Append an admitted batch's docs to the index
    * (the recompute path — [[indexAdmitted]] reuses the probe's staged
    * frame instead when admission ran). */
  def append(batch: DataFrame, path: String,
      lease: Option[WriterLease] = None): Unit = {
    val spark = batch.sparkSession
    WriterLease.guard(spark, path, lease)
    val m = readMeta(spark, path)
    val staged = Mat.materializeIterReleasable(
      stageHashed(batch.dropDuplicates("doc_id"), m.n, m.k))
    WriterLease.guard(spark, path, lease) // staging may be long; re-check at publish
    appendTail(staged.df, path, m)
    staged.release()
  }

  /** Per-batch appends land in the LSM TAIL: one flat parquet append of
    * one nested row per doc — (doc_id, gb, grams, bands array). ONE
    * write job per batch (measured: the previous per-batch writes into
    * the partitioned base stores cost ~4 s/batch at 150k docs, ~80% of
    * it dynamic-partition-dir overhead for 192 dirs; this is ~0.7 s).
    * Probes read base (DPP-pruned) UNION tail (scanned fully — small
    * between compactions); [[compact]] folds the tail into the base.
    * A torn append is impossible (one atomic job); a LOST append (crash
    * before it) degrades dedup recall for that batch, never table
    * correctness — same contract as the ordering note on
    * [[indexAdmitted]]. */
  private def appendTail(staged: DataFrame, path: String, m: Meta): Unit =
    tailRows(staged, m)
      .coalesce(4)
      .write.mode(SaveMode.Append).parquet(s"$path/tail")

  /** Staged frame -> tail layout (doc_id, gb, grams, bands). */
  private def tailRows(staged: DataFrame, m: Meta): DataFrame = {
    val r = m.k / m.bands
    staged.select(col("doc_id"), gbCol(col("doc_id"), m).as("gb"), col("grams"),
      array((0 until m.bands).map { b =>
        val bk = xxhash64(slice(col("sig"), b * r + 1, r))
        struct(lit(b).as("band_idx"), bk.as("band_key"),
          pmod(hash(bk), lit(m.kb)).as("kb"))
      }: _*).as("bands"))
  }

  /** The tail store, if any rows have been appended since the last
    * [[compact]]. */
  private def readTail(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tail")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
    if (hasData) Some(spark.read.parquet(s"$path/tail")) else None
  }

  /** Tail rows rendered in the base `bands/` layout. */
  private def tailBandsOf(tail: DataFrame): DataFrame =
    tail.select(col("doc_id"), explode(col("bands")).as("b"))
      .select(col("doc_id"), col("b.band_idx").as("band_idx"),
        col("b.band_key").as("band_key"), col("b.kb").as("kb"))

  /** Tail rows rendered in the base `grams/` layout. */
  private def tailGramsOf(tail: DataFrame): DataFrame =
    tail.select(col("doc_id"), col("grams"), col("gb"))

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
    *     -> band rows -> anti-join over-cap keys  [occ partials + tail]
    *     -> BROADCAST -> join bands/ on (band_idx, kb, band_key)
    *                     and tail bands            [base DPP to touched kb]
    *     -> distinct candidates + batch grams
    *     -> BROADCAST -> join grams/ on (gb, doc_id) and tail grams
    *                                              [base DPP to touched gb]
    *     -> exact Jaccard >= threshold
    *
    * Base and tail are joined SEPARATELY and unioned (not a union of
    * scans under one join) so dynamic partition pruning stays attached
    * to the partitioned base scans; the tail is flat and small between
    * compactions, so its unpruned scan is O(recent batches). */
  private[operators] def probeStaged(batch: DataFrame, path: String,
      threshold: Double, maxBucketSize: Int, dedupe: Boolean = true): Probed = {
    val spark = batch.sparkSession
    val m = readMeta(spark, path)
    // either this dropDuplicates or the caller's ([[admitCanonical]])
    // leaves the frame hash-partitioned by doc_id, so the staged scan
    // skips its parallelism repartition in both cases
    val docs = if (dedupe) batch.dropDuplicates("doc_id") else batch
    val staged = Mat.materializeIterReleasable(
      stageHashed(docs, m.n, m.k, shuffled = true))
    val tail = readTail(spark, path)
    val probeBands = bandRows(staged.df, m)
    // mega-bucket cap from the BASE occupancy table, cached on the
    // driver per (path, cap) and invalidated by the occ store's mtime —
    // the base changes only at build/compact, so steady-state batches
    // pay ZERO occupancy work (the previous per-batch sum of partials +
    // tail counts was a fixed ~0.7 s/batch). Keys crossing the cap
    // inside the uncompacted tail window are capped at the next
    // compact — disclosed staleness, bounded by the compaction
    // interval; the cap is a candidate-volume guard, not a correctness
    // gate. Applied to the probe side: an inner equi-join makes that
    // result-identical to filtering the index side, the over-cap key
    // set is tiny, and the index scan stays free to DPP-prune. Skipped
    // entirely at Int.MaxValue (same short-circuit as Dedup.capBuckets).
    val probeCapped =
      if (maxBucketSize == Int.MaxValue) probeBands
      else {
        val over = overCapKeys(spark, path, maxBucketSize)
        if (over.isEmpty) probeBands
        else {
          import spark.implicits._
          probeBands.join(
            broadcast(over.toSeq.toDF("band_idx", "band_key")),
            Seq("band_idx", "band_key"), "left_anti")
        }
      }
    val probeB = broadcast(probeCapped.withColumn("kb", kbCol(m)))
    def candAgainst(idxBands: DataFrame): DataFrame = probeB.as("a")
      .join(idxBands.as("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.kb") === col("b.kb") &&
          col("a.band_key") === col("b.band_key"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("dup_of"))
    // the partitioned base is absent until the first compact when the
    // index was bootstrapped from a replay batch (tail-only level-0)
    val base = if (hasBase(spark, path)) Some(spark.read.parquet(s"$path/bands")) else None
    val candParts = base.map(candAgainst).toSeq ++ tail.map(t => candAgainst(tailBandsOf(t)))
    val cand = candParts.reduceOption(_ unionByName _)
      .getOrElse(probeB.select(col("doc_id"), col("doc_id").as("dup_of")).limit(0))
      .distinct()
    val candWithGrams = cand.withColumn("gb", gbCol(col("dup_of"), m)).as("c")
      .join(staged.df.as("ga"), col("c.doc_id") === col("ga.doc_id"))
      .select(col("c.doc_id").as("doc_id"), col("c.dup_of").as("dup_of"),
        col("c.gb").as("gb"), col("ga.grams").as("grams_a"))
    val candB = broadcast(candWithGrams)
    def verifyAgainst(idxGrams: DataFrame): DataFrame = candB.as("cg")
      .join(idxGrams.as("gi"),
        col("cg.gb") === col("gi.gb") && col("cg.dup_of") === col("gi.doc_id"))
      .withColumn("jaccard",
        round(jaccardCol(batch, col("cg.grams_a"), col("gi.grams")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("cg.doc_id").as("doc_id"), col("cg.dup_of").as("dup_of"), col("jaccard"))
    val outParts = base.map(_ => verifyAgainst(spark.read.parquet(s"$path/grams"))).toSeq ++
      tail.map(t => verifyAgainst(tailGramsOf(t)))
    val out = outParts.reduceOption(_ unionByName _)
      .getOrElse(candB.select(col("doc_id"), col("dup_of"), lit(0d).as("jaccard")).limit(0))
    Probed(out, staged)
  }

  private def hasBase(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/bands")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def readMeta(spark: SparkSession, path: String): Meta = {
    val cached = metaCache.get(path)
    if (cached != null) return cached
    val metaDf = spark.read.json(s"$path/meta")
    require(metaDf.columns.contains("fmt") &&
      metaDf.select("fmt").head().getLong(0) == FormatVersion,
      s"LSH index at $path has an unsupported format (need fmt=$FormatVersion, " +
        "grams stored as sorted 60-bit hashes) — rebuild it with LshIndex.build")
    val row = metaDf.select("n", "k", "bands", "kb", "gb").head()
    val m = Meta(row.getLong(0).toInt, row.getLong(1).toInt, row.getLong(2).toInt,
      row.getLong(3).toInt, row.getLong(4).toInt)
    metaCache.put(path, m)
    m
  }

  /** Over-cap band keys from the base `occ/` store, driver-cached per
    * (path, cap) and keyed by the store's mtime (occ is rewritten only
    * by build/compact — see the cap note in [[probeStaged]]). */
  private val capCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), (Long, Array[(Int, Long)])]()

  private def overCapKeys(spark: SparkSession, path: String,
      maxBucketSize: Int): Array[(Int, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/occ")
    val pfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!pfs.exists(p)) return Array.empty // tail-only bootstrap: cap inert until first compact
    val stamp = pfs.getFileStatus(p).getModificationTime
    val key = (path, maxBucketSize)
    val cached = capCache.get(key)
    if (cached != null && cached._1 == stamp) return cached._2
    val keys = spark.read.parquet(s"$path/occ")
      .filter(col("cnt") > maxBucketSize)
      .select(col("band_idx"), col("band_key"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    capCache.put(key, (stamp, keys))
    keys
  }

  /** The sticky dropped-doc set, driver-cached per index path with a
    * HARD BOUND: `Some(set)` while the accumulated `dropped_ids/`
    * store holds at most [[PointLookupMax]] distinct ids (loaded once
    * with a limit+1 probe — never an unbounded collect — then
    * maintained in memory as [[admitCanonical]] appends; disk stays
    * the durable copy for restarts); `None` once the store overflows
    * the bound, after which suppression runs as a distributed
    * anti-join against the store itself and the driver holds nothing.
    * On a 10^10-doc corpus with a high dup rate the dropped set is
    * O(corpus) — the pre-bound full collect was a driver OOM waiting
    * at index-reload time. */
  private val droppedIdsCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[java.util.Set[String]]]()

  /** Every ever-dropped doc id as a distinct one-column frame, None if
    * nothing was ever dropped. The durable source is the per-batch
    * AUDIT store `dropped/batch_id=N` (the ids are its doc_id column,
    * column-pruned at read) — admission stopped writing a separate
    * `dropped_ids/` store; one legacy store is still unioned in so
    * pre-existing indexes keep their history. */
  private def droppedStore(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val conf = spark.sparkContext.hadoopConfiguration
    def existing(sub: String, marker: String => Boolean): Option[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$indexDir/$sub")
      val fs = p.getFileSystem(conf)
      if (fs.exists(p) && fs.listStatus(p).exists(st => marker(st.getPath.getName)))
        Some(p.toString) else None
    }
    val legacy = existing("dropped_ids", _.endsWith(".parquet"))
      .map(spark.read.parquet(_).select(col("doc_id")))
    val audit = existing("dropped", _.startsWith("batch_id="))
      .map(spark.read.parquet(_).select(col("doc_id")))
    (legacy.toSeq ++ audit).reduceOption(_ unionByName _).map(_.distinct())
  }

  private def stickyDropped(spark: SparkSession,
      indexDir: String): Option[java.util.Set[String]] =
    droppedIdsCache.computeIfAbsent(indexDir, _ =>
      droppedStore(spark, indexDir) match {
        case None => Some(java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
        case Some(df) =>
          val probe = df.limit(PointLookupMax + 1).collect()
          if (probe.length > PointLookupMax) None
          else {
            val s = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
            probe.foreach(r => s.add(r.get(0).toString))
            Some(s)
          }
      })

  /** Test hook: Some(size) when the index's sticky dropped set is
    * driver-resident (bounded mode), None when it overflowed to the
    * distributed anti-join (or was never loaded). */
  private[graft] def droppedDriverResident(indexDir: String): Option[Int] =
    Option(droppedIdsCache.get(indexDir)).flatten.map(_.size)

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
  def compact(spark: SparkSession, path: String,
      lease: Option[WriterLease] = None): Unit = {
    WriterLease.guard(spark, path, lease)
    // each store swap re-checks the fence after its (long) tmp write,
    // right before the publishing renames
    val preSwap: () => Unit = () => WriterLease.guard(spark, path, lease)
    val m = readMeta(spark, path)
    val tail = readTail(spark, path)
    if (!hasBase(spark, path) && tail.isEmpty) return // nothing folded yet
    // fold the tail into each base store (creating the base when the
    // index was bootstrapped tail-only); dropDuplicates on the store
    // key makes a re-run after a mid-compact crash idempotent (the
    // tail is deleted LAST, so a partial fold re-folds the same rows)
    def folded(base: Option[DataFrame], t: Option[DataFrame]): DataFrame =
      (base.toSeq ++ t).reduce(_ unionByName _)
    swapRewrite(spark, s"$path/bands", preSwap) { df =>
      folded(df, tail.map(tailBandsOf))
        .dropDuplicates("doc_id", "band_idx")
        .repartition(col("band_idx"), col("kb"))
        .sortWithinPartitions("band_idx", "kb")
        .write.mode(SaveMode.Overwrite).partitionBy("band_idx", "kb")
    }
    swapRewrite(spark, s"$path/grams", preSwap) { df =>
      folded(df, tail.map(tailGramsOf))
        .dropDuplicates("doc_id")
        .repartition(col("gb")).sortWithinPartitions("gb", "doc_id")
        .write.mode(SaveMode.Overwrite).partitionBy("gb")
    }
    // occupancy is recomputed exactly from the POST-fold bands store
    // (never summed with the tail's counts: a crash between the bands
    // swap and here would double-count the tail on the re-run)
    swapRewrite(spark, s"$path/occ", preSwap) { _ =>
      spark.read.parquet(s"$path/bands")
        .groupBy(col("band_idx"), col("band_key")).agg(count(lit(1)).as("cnt"))
        .coalesce(1)
        .write.mode(SaveMode.Overwrite)
    }
    val tailPath = new org.apache.hadoop.fs.Path(s"$path/tail")
    tailPath.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(tailPath, true)
    val _ = m // parameters pinned; compaction never changes them
  }

  /** Rewrite a parquet store in place: read `store` (None when it does
    * not exist yet — the tail-only bootstrap), write per `plan` to
    * `store.tmp`, swap with renames, delete the old copy. A leftover
    * `store.old` from a previous crash is healed first (the swap's
    * second rename never ran, so `store` is absent and `.old` IS the
    * live copy). */
  private[operators] def swapRewrite(spark: SparkSession, store: String,
      preSwap: () => Unit = () => ())(
      plan: Option[DataFrame] => org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]): Unit = {
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
    val src = if (fs.exists(live)) Some(spark.read.parquet(store)) else None
    plan(src).parquet(tmp.toString)
    preSwap() // last fence check before the publishing renames
    if (fs.exists(live) && !fs.rename(live, old))
      throw new IllegalStateException(s"compact: store swap failed for $store")
    if (!fs.rename(tmp, live))
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
    Seq("bands", "grams", "occ", "tail").map { store =>
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

  /** Distinct doc_ids the index currently holds (base + tail) — the
    * public observable for specs and maintenance tooling. */
  def indexedDocs(spark: SparkSession, path: String): DataFrame = {
    val base =
      if (hasBase(spark, path)) Some(spark.read.parquet(s"$path/grams").select("doc_id"))
      else None
    val parts = base.toSeq ++ readTail(spark, path).map(_.select("doc_id"))
    require(parts.nonEmpty, s"LSH index at $path holds no documents yet")
    parts.reduce(_ unionByName _).distinct()
  }

  /** Result of [[admitCanonical]]: the canonical batch with every
    * dropped doc's row removed, the dropped-doc count, the probe's
    * staged (doc_id, sig, grams) frame + the dropped-doc filter over it
    * (so [[indexAdmitted]] builds/appends WITHOUT re-shingling), and a
    * release for all cached intermediates — callers release AFTER
    * [[indexAdmitted]]. */
  final case class Admission(
      admitted: DataFrame,
      droppedDocs: Long,
      release: () => Unit,
      private[operators] val staged: Option[DataFrame] = None,
      private[operators] val admittedOf: DataFrame => DataFrame = identity)

  /** Streaming-ingest admission — dedup-on-ingest as a replay step,
    * fed the CANONICAL batch ([[graft.apply.BatchApply.prepare]]'s
    * output: one row per doc, already hash-partitioned by doc_id — so
    * admission rides the batch's existing shuffle and never re-groups
    * the raw events).
    *
    * Gate: only docs whose batch carried an INSERT (`has_insert`) probe
    * the index — a first-seen doc pays shingle+minhash+probe exactly
    * once, and UPDATE traffic to already-admitted docs flows through at
    * zero admission cost (it also never re-appends to the index, so the
    * index holds ONE gram set per doc — first version — rather than one
    * per update). Docs that were DROPPED as dups stay dropped: their
    * later updates are suppressed by the sticky dropped-ids set
    * (the `dropped/` audit store's doc_id column — a codegen'd IN
    * filter while it fits
    * the driver bound, a distributed anti-join against the store once
    * it overflows [[PointLookupMax]]) — a doc re-enters only via a
    * fresh insert, which re-probes. Two disclosed
    * consequences: (1) an update that rewrites an ADMITTED doc into a
    * near-dup of another doc is not re-checked (offline cluster dedup
    * owns that case); (2) a doc whose first-ever event arrives as an
    * UPDATE (out-of-order CDC start) bypasses admission and is not
    * indexed.
    *
    * The probed docs' text = the token sequence rendered as
    * space-joined ids, so shingles are token n-grams. Every doc
    * verifying as a near-dup of a DIFFERENT indexed doc is dropped;
    * (doc_id, dup_of, jaccard) rows land under
    * `indexDir/dropped/batch_id=N/` as the audit trail (idempotent
    * overwrite per retried batch; skipped entirely for a batch with no
    * drops) — the audit store doubles as the durable sticky dropped-id
    * set (its doc_id column, read with distinct semantics), so
    * admission pays exactly ONE small write per dropping batch and
    * zero per clean batch.
    *
    * Granularity disclosure: admission is batch-vs-corpus — near-dup
    * pairs WITHIN one micro-batch are both admitted (and both indexed;
    * later dups of either are caught). That is the standard streaming
    * dedup unit; tightening it is one [[Dedup.minhashLshPairs]] call
    * over the batch if a job wants it.
    *
    * With no index at `indexDir` yet, everything is admitted and the
    * batch's inserts are STILL staged (with the spec's n/k) so the
    * caller's [[indexAdmitted]] builds the index from the staged frame
    * without re-shingling; thereafter probe parameters always come from
    * the index's own meta descriptor. */
  def admitCanonical(canonical: DataFrame, indexDir: String, threshold: Double,
      maxBucketSize: Int, batchId: Long, n: Int, k: Int,
      lease: Option[WriterLease] = None): Admission = {
    val spark = canonical.sparkSession
    WriterLease.guard(spark, indexDir, lease) // admission writes dropped/
    val docs = canonical
      .filter(col("has_insert") === 1 && col("op") =!= "D" && col("tokens").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tokens")).as("text"))
    if (!exists(spark, indexDir)) {
      val staged = Mat.materializeIterReleasable(
        stageHashed(docs, n, k, shuffled = true))
      return Admission(canonical, 0L, staged.release, Some(staged.df))
    }
    val probed = probeStaged(docs, indexDir, threshold, maxBucketSize, dedupe = false)
    val pairs = probed.pairs.filter(col("doc_id") =!= col("dup_of"))
    val droppedDir = s"$indexDir/dropped/batch_id=$batchId"
    // the sticky dropped set — driver-cached in bounded mode (≤
    // PointLookupMax ids), or None once the accumulated store
    // overflowed the bound (suppression then anti-joins the store).
    val sticky = stickyDropped(spark, indexDir)
    val stickyIds: Array[String] =
      sticky.map(_.toArray(Array.empty[String])).getOrElse(Array.empty)
    // steady state: ONE bounded action runs the whole probe plan and
    // lands the (tiny) verified pairs on the driver — the audit write
    // becomes a local single-task job and the canonical/staged filters
    // become codegen'd IN-set predicates instead of per-batch joins.
    // The limit+1 collect detects overflow; above the bound the rare
    // dup-storm batch falls back to the fully distributed path.
    val local = pairs.limit(PointLookupMax + 1).collect()
    if (local.length <= PointLookupMax) {
      // audit write = the ONLY admission write (the dropped-ids store
      // is its doc_id column) — and a clean batch (no verified dups,
      // the steady state of low-dup traffic) writes NOTHING
      if (local.nonEmpty)
        spark.createDataFrame(java.util.Arrays.asList(local: _*), pairs.schema)
          .coalesce(1).write.mode(SaveMode.Overwrite).parquet(droppedDir)
      val ids = local.map(_.get(0)).distinct
      if (ids.nonEmpty) {
        sticky.foreach { set =>
          ids.foreach(i => set.add(i.toString))
          // bounded-mode set just crossed the bound: demote to the
          // distributed form — the next batch's reload probe sees the
          // (now larger) store and stays in anti-join mode
          if (set.size > PointLookupMax) droppedIdsCache.put(indexDir, None)
        }
      }
      // IN-set predicate while the drop set is driver-resident (the
      // common case — stays in codegen); an overflowed sticky store
      // never lands on the driver: suppression is a distributed
      // anti-join against dropped_ids/ itself (this batch's ids were
      // appended above, so one scan covers both)
      val allDropIds = (ids ++ stickyIds).distinct
      def dropFiltered(df: DataFrame): DataFrame = sticky match {
        case Some(_) if allDropIds.isEmpty => df
        case Some(_) if allDropIds.length <= PointLookupMax =>
          df.filter(!col("doc_id").isin(allDropIds.toIndexedSeq: _*))
        case Some(_) =>
          import spark.implicits._
          df.join(broadcast(allDropIds.map(_.toString).toSeq.toDF("doc_id")),
            Seq("doc_id"), "left_anti")
        case None =>
          df.join(droppedStore(spark, indexDir).get, Seq("doc_id"), "left_anti")
      }
      val keepNew =
        if (ids.isEmpty) lit(true) else !col("doc_id").isin(ids.toIndexedSeq: _*)
      Admission(
        admitted = dropFiltered(canonical),
        droppedDocs = ids.length.toLong,
        release = probed.release,
        staged = Some(probed.staged.df),
        // the staged frame holds only this batch's insert docs — sticky
        // ids from past batches cannot appear in it
        admittedOf = st => if (ids.isEmpty) st else st.filter(keepNew))
    } else {
      val h = Mat.materializeIterReleasable(pairs)
      h.df.write.mode(SaveMode.Overwrite).parquet(droppedDir)
      val dupIds = h.df.select("doc_id").distinct()
      // the audit write above IS the durable dropped-ids record; the
      // big set never lands on the driver — drop the cached copy so
      // the next batch reloads from disk (the bounded limit+1 probe)
      droppedIdsCache.remove(indexDir)
      val dropped = dupIds.count() // dupIds is small (verified pairs only)
      val stickyFiltered = sticky match {
        case Some(_) if stickyIds.isEmpty => canonical
        case Some(_) => canonical.filter(!col("doc_id").isin(stickyIds.toIndexedSeq: _*))
        case None =>
          canonical.join(droppedStore(spark, indexDir).get, Seq("doc_id"), "left_anti")
      }
      Admission(
        admitted = stickyFiltered.join(dupIds, Seq("doc_id"), "left_anti"),
        droppedDocs = dropped,
        release = () => { h.release(); probed.release() },
        staged = Some(probed.staged.df),
        admittedOf = st => st.join(dupIds, Seq("doc_id"), "left_anti"))
    }
  }

  /** Index the admitted insert docs of a committed batch: first batch
    * builds the index (spec params), later batches append ONE tail file
    * set — reusing the probe's staged (doc_id, sig, grams) frame
    * (filtered by the dropped ids) so the batch is never re-shingled.
    * Callers run this AFTER the lake commit: a crash in between loses
    * only index entries (later dups of them get admitted — degraded
    * dedup recall), never table rows; the reverse order could drop data
    * on a foreachBatch retry. */
  def indexAdmitted(a: Admission, indexDir: String,
      n: Int, k: Int, bands: Int,
      lease: Option[WriterLease] = None): Unit = {
    val st = a.staged.getOrElse(throw new IllegalStateException(
      "indexAdmitted requires the admission's staged frame"))
    val spark = st.sparkSession
    WriterLease.guard(spark, indexDir, lease)
    if (!exists(spark, indexDir)) {
      // LSM level-0 bootstrap: the first batch lands as ONE flat tail
      // append + the meta marker — O(batch), same as every later batch
      // (the previous full partitioned build here cost ~7 s at 150k
      // docs, a third of the 4-batch bench rung's admission overhead);
      // the partitioned base materializes at the first [[compact]].
      // Meta is written LAST: a crash in between leaves orphan tail
      // rows that the re-bootstrapped batch re-appends — duplicate tail
      // rows only ever duplicate CANDIDATES (distinct'd in the probe)
      // and are folded by compact's dropDuplicates, never correctness.
      val m = Meta(n, k, bands, DefaultKeyBuckets, DefaultGramBuckets)
      appendTail(a.admittedOf(st), indexDir, m)
      writeMeta(spark, indexDir, m)
    } else
      appendTail(a.admittedOf(st), indexDir, readMeta(spark, indexDir))
  }
}
