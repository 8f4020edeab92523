package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Materialization policy for operator intermediates that are consumed
 * more than once (self-joins, verify passes, exact-vs-approx compares).
 *
 * Default is `persist(MEMORY_AND_DISK)`: the blocks keep their lineage,
 * so losing an executor mid-job recomputes the lost partitions instead
 * of failing the query — the production-safe behavior on a real
 * cluster. `localCheckpoint` (which truncates lineage and stores blocks
 * only on executors — faster, but a lost executor kills the query)
 * remains available as an explicit opt-in via the session conf
 * `spark.graft.materialize=localCheckpoint`, which is the right trade
 * on a single-box run where "executor loss" cannot happen (the bench
 * ladder does not set it; the tax is negligible there).
 *
 * Persisted intermediates are unpinned by Spark's LRU block eviction;
 * operators do not unpersist explicitly because the returned plans
 * still reference the blocks lazily (callers may execute the returned
 * DataFrame any number of times).
 */
object Mat {

  val ConfKey = "spark.graft.materialize"

  /** Materialize `df` for multi-consumer reuse per the session policy. */
  def materialize(df: DataFrame): DataFrame =
    df.sparkSession.conf.getOption(ConfKey) match {
      case Some("localCheckpoint") => df.localCheckpoint(true)
      case _ => df.persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** Materialize for ITERATIVE algorithms: persist like [[materialize]]
    * and additionally REBASE the frame onto its own RDD so the logical
    * plan collapses to a single leaf. An iterative plan that references
    * its previous round twice (label propagation does: `union(labels,
    * edges ⋈ labels)`) otherwise DOUBLES in size every round —
    * caching stores the data but Catalyst still re-analyzes the whole
    * exponentially-growing tree each iteration. The rebased frame's
    * blocks are persisted AND recomputable: the underlying RDD keeps
    * its lineage back through the cache into the original plan, so an
    * executor loss recomputes lost partitions (the property
    * `localCheckpoint` gives up). */
  def materializeIter(df: DataFrame): DataFrame = {
    val p = materialize(df)
    p.sparkSession.createDataFrame(p.rdd, p.schema)
  }

  /** A materialized frame plus an explicit release of its cached
    * blocks. Iterative algorithms MUST use this for per-round
    * intermediates: unlike GC'd localCheckpoint RDDs, persisted
    * DataFrames stay registered in Spark's CacheManager until
    * unpersisted — over many rounds the superseded tables fill local
    * disk (disk-spilled blocks are not LRU-evicted) and the
    * CacheManager's linear plan matching slows every later query.
    * Releasing a superseded round is safe mid-algorithm: the next
    * round's rebased RDD keeps lineage through it, so a lost block
    * recomputes down the (unpersisted) chain instead of failing. */
  final case class Handle(df: DataFrame, release: () => Unit)

  /** [[materializeIter]] with an explicit release handle. */
  def materializeIterReleasable(df: DataFrame): Handle =
    df.sparkSession.conf.getOption(ConfKey) match {
      case Some("localCheckpoint") =>
        // blocks are reclaimed by the ContextCleaner once the RDD is
        // unreachable; nothing to do eagerly
        Handle(df.localCheckpoint(true), () => ())
      case _ =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        Handle(p.sparkSession.createDataFrame(p.rdd, p.schema),
          () => { p.unpersist(blocking = false); () })
    }
}
