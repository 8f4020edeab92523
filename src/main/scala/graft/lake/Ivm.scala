package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental view maintenance (IVM) — a CDC CONSUMER that keeps a
 * downstream grouped aggregate (`GROUP BY grp: count(*), sum(sumCol)`)
 * in sync with a lake table WITHOUT re-aggregating the table: each
 * `sync` advances the aggregate from the table's change feed in work
 * proportional to the CHANGED keys, not the table.
 *
 * This is the materialized-view half of the change-data-feed story
 * (q62 produces the feed; this consumes it): at 10^10 rows where a day
 * touches 2% of keys, the nightly roll-up costs ~2% of buckets, not a
 * full pass.
 *
 * How a delta is computed exactly (no pre-images in the feed needed):
 *
 *   1. `K` = distinct changed keys since the last sync, from
 *      `readChanges(syncedBatchId)` — the feed partitions are
 *      batch-id-pruned, so this reads only the new batches.
 *   2. old contribution = rows of K at the SYNCED snapshot;
 *      new contribution = rows of K at the CURRENT snapshot (pinned at
 *      entry — concurrent commits shift neither side). Two regimes by
 *      |K| (the readKeys / LshIndex.PointLookupMax discipline):
 *      bounded K (≤ `keyLookupMax`) collects the keys and reads via
 *      [[LakeTable.readKeys]] — manifest bucket pruning + pushed
 *      `In(doc_id,…)` + row-group skipping on the doc_id-SORTED data
 *      files, so cost ∝ changed row groups even when hash-scattered
 *      keys touch every bucket; unbounded K keeps the keys
 *      distributed — both reads are pruned to K's bucket set
 *      (`readResolved(buckets)`; only the ≤ nBuckets-int bucket SET is
 *      collected) and K rides a join.
 *   3. delta per group = sum(new) − sum(old); merged into the stored
 *      aggregate with a null-safe full-outer join; groups whose count
 *      reaches zero are dropped.
 *
 * A key changed then changed back contributes zero; a key changed in a
 * batch AFTER the pinned snapshot may enter K (the feed is re-listed
 * live) but contributes zero too — both sides read it at pinned
 * versions. So `sync` always lands the aggregate exactly at the pinned
 * snapshot's state (spec-asserted against a direct groupBy).
 *
 * Store: `aggDir/state/` parquet + `_meta.json` INSIDE the same dir
 * (underscore-prefixed — invisible to the parquet scan), so one atomic
 * dir rename publishes rows and watermark together; a crash mid-swap
 * leaves `state` or `state.old` findable and the next access heals it
 * (the [[graft.operators.LshIndex.swapRewrite]] discipline).
 *
 * Contracts: the table must be replayed with `changelog=true`
 * (readChanges raises otherwise, its own curated error), and syncs
 * must happen within the feed's retention window
 * (`changelogRetainBatches` vacuum) — the standard CDC-consumer lag
 * contract; past it, drop the store and re-init (full aggregate).
 * `grp` may be null-valued (null-safe merge join); `sumCol` must be
 * castable to long and must exist at the synced-from schema (additive
 * evolution that ADDS either column needs a re-init, since the old
 * snapshot cannot serve it).
 *
 * Reference analog: DataX has no incremental consumers — each job is a
 * full copy; this is what its users script around with `where`
 * windows (`mysqlreader/doc/mysqlreader.md` querySql incremental
 * pattern), done exactly instead.
 */
object Ivm {

  private case class SyncMeta(version: Long, batchId: Long)

  /** Changed-key count up to which the sync collects the key set and
    * takes the readKeys point-lookup path (pushed In + row-group
    * skipping); above it the keys stay distributed and ride a join. */
  val DefaultKeyLookupMax = 65536

  /** Advance `aggDir` to the table's current snapshot and return the
    * aggregate rows (grp, cnt, sum_val). First call does the one full
    * aggregate (the view's initialization); later calls are
    * incremental; a call with nothing new is a no-op read. */
  def sync(table: LakeTable, aggDir: String,
      grp: String = "source", sumCol: String = "n_tok",
      keyLookupMax: Int = DefaultKeyLookupMax): DataFrame = {
    val spark = table.spark
    val cur = table.current
    heal(spark, aggDir)
    readMeta(spark, aggDir) match {
      case Some(m) if m.version >= cur.version =>
        readAgg(spark, aggDir)
      case None =>
        val full = contrib(table.read(Some(cur)), grp, sumCol)
          .groupBy(col(grp))
          .agg(sum(col("s")).as("cnt"), sum(col("s") * col("v")).as("sum_val"))
        publish(spark, aggDir, full, SyncMeta(cur.version, cur.batchId))
        readAgg(spark, aggDir)
      case Some(m) =>
        val oldSnap = table.snapshotAt(m.version)
        // persisted: consumed by two bucket-set aggregates + two joins
        val changed = table.readChanges(m.batchId).select(col("doc_id")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // bounded-|K| probe: limit+1 detects overflow without counting
        val localKeys = changed.limit(keyLookupMax + 1).collect().map(_.get(0))
        // rows of the changed keys at one pinned snapshot. Point-lookup
        // regime: readKeys = manifest bucket pruning + pushed In +
        // row-group skipping on the doc_id-sorted files (cost ∝ changed
        // row groups even when hash-scattered keys touch every bucket).
        // Join regime (|K| over the bound): bucket-set pruning only —
        // K's BUCKET SET (≤ nBuckets ints) is all that lands driver-side
        def rowsAt(s: LakeTable.Snapshot, sign: Long): DataFrame = {
          val rows = if (localKeys.length <= keyLookupMax) {
            if (localKeys.isEmpty) table.read(Some(s)).limit(0)
            else table.readKeys(localKeys.toIndexedSeq, Some(s))
          } else {
            val bs = changed
              .select(LakeTable.bucketExpr(col("doc_id"), s.nBuckets).as("b"))
              .distinct().collect().map(_.getInt(0)).toSet
            if (bs.isEmpty)
              table.read(Some(s)).limit(0)
            else
              table.readResolved(Some(bs), Some(s))
                .filter(!col(LakeTable.DeletedCol))
                .join(changed, Seq("doc_id"))
          }
          contrib(rows, grp, sumCol, sign)
        }
        val delta = rowsAt(cur, 1L).unionByName(rowsAt(oldSnap, -1L))
          .groupBy(col(grp))
          .agg(sum(col("s")).as("dcnt"), sum(col("s") * col("v")).as("dsum"))
        val stored = readAgg(spark, aggDir)
        val merged = stored.as("a")
          .join(delta.as("d"), col(s"a.$grp") <=> col(s"d.$grp"), "full_outer")
          .select(
            coalesce(col(s"a.$grp"), col(s"d.$grp")).as(grp),
            (coalesce(col("a.cnt"), lit(0L)) + coalesce(col("d.dcnt"), lit(0L))).as("cnt"),
            (coalesce(col("a.sum_val"), lit(0L)) + coalesce(col("d.dsum"), lit(0L))).as("sum_val"))
          .filter(col("cnt") > 0)
        try publish(spark, aggDir, merged, SyncMeta(cur.version, cur.batchId))
        finally changed.unpersist()
        readAgg(spark, aggDir)
    }
  }

  /** Per-row contribution: group value, sign, summed value. `sumCol`
    * is any SQL EXPRESSION castable to long — a plain column
    * (`"n_tok"`) or a computation over wide payload columns
    * (`"aggregate(tokens, 0L, (a, x) -> a + x)"`); the expression is
    * evaluated identically at both pinned snapshots, so the delta
    * algebra is unchanged. `s*v` is null when it evaluates null —
    * sum() skips it on both sides identically. */
  private def contrib(rows: DataFrame, grp: String, sumCol: String,
      sign: Long = 1L): DataFrame =
    rows.select(col(grp), lit(sign).as("s"), expr(sumCol).cast("long").as("v"))

  /** The maintained aggregate (grp, cnt, sum_val) as last published. */
  def readAgg(spark: SparkSession, aggDir: String): DataFrame = {
    heal(spark, aggDir)
    val live = new Path(aggDir, "state")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(live), s"no IVM state under $aggDir — run sync first")
    spark.read.parquet(live.toString)
  }

  /** The batch id the store is synced through (-1 = never synced) —
    * what a monitoring job compares against `table.current.batchId`
    * to measure consumer lag. */
  def syncedBatchId(spark: SparkSession, aggDir: String): Long = {
    heal(spark, aggDir)
    readMeta(spark, aggDir).map(_.batchId).getOrElse(-1L)
  }

  // ----------------------------------------------------------- store I/O

  private def metaPath(dir: Path) = new Path(dir, "_meta.json")

  private def readMeta(spark: SparkSession, aggDir: String): Option[SyncMeta] = {
    val live = new Path(aggDir, "state")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaPath(live))) return None
    val in = fs.open(metaPath(live))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val j = org.json4s.jackson.JsonMethods.parse(txt)
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    Some(SyncMeta(
      (j \ "version").extract[Long],
      (j \ "batchId").extract[Long]))
  }

  /** Write rows + meta to `state.tmp`, publish with the two-rename
    * swap ([[heal]] closes the crash window). */
  private def publish(spark: SparkSession, aggDir: String,
      rows: DataFrame, m: SyncMeta): Unit = {
    val fs = new Path(aggDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(aggDir, "state")
    val tmp = new Path(aggDir, "state.tmp")
    val old = new Path(aggDir, "state.old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    rows.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val out = fs.create(metaPath(tmp), true)
    out.write(s"""{"version":${m.version},"batchId":${m.batchId}}""".getBytes("UTF-8"))
    out.close()
    if (fs.exists(live) && !fs.rename(live, old))
      throw new IllegalStateException(s"ivm: store swap failed for $live")
    if (!fs.rename(tmp, live))
      throw new IllegalStateException(s"ivm: store swap failed for $live")
    fs.delete(old, true)
  }

  /** Crash heal: `state` missing but `state.old` present means the
    * swap's second rename never ran — `.old` IS the live store. */
  private def heal(spark: SparkSession, aggDir: String): Unit = {
    val fs = new Path(aggDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new Path(aggDir, "state")
    val old = new Path(aggDir, "state.old")
    if (!fs.exists(live) && fs.exists(old)) {
      if (!fs.rename(old, live))
        throw new IllegalStateException(s"ivm: crash-heal rename failed for $live")
    }
  }
}
