package graft.stream

import graft.apply.BatchApply
import graft.lake.LakeTable
import graft.model.ChangeLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}

/**
 * Replay — the Structured Streaming pipeline that tails the ordered
 * change log and applies it to the lake table.
 *
 * This replaces the reference's whole job model (Reader -> Channel ->
 * Writer, `core/.../job/JobContainer.java:96-182`) with:
 *
 *   readStream(file source over log segments, maxFilesPerTrigger)
 *     -> foreachBatch(BatchApply)  with checkpointLocation
 *
 * Resume semantics (north rule + reference `otsstreamreader` §3.3):
 * Spark's checkpoint persists source offsets (which segment files each
 * batch covered — the analog of DataX's per-shard (iterator, skipCount)
 * checkpoints, `RecordProcessor.java:186-239`); the lake snapshot
 * persists the last applied batchId + per-shard lsn watermarks (the
 * analog of DataX's stream-job `version` fencing,
 * `OTSStreamReaderSlaveProxy.java:270-285`). Killing the query at any
 * point and restarting with the same checkpoint re-plans the in-flight
 * batch with the same batchId; BatchApply's fence skips it if the commit
 * already landed — no duplicates, no loss.
 *
 * Rate limiting: `maxFilesPerTrigger` bounds the events per micro-batch,
 * the declarative analog of DataX's channel byte/record flow control
 * (`core/.../channel/Channel.java:176-239`).
 */
object Replay {

  /** Initial (pre-evolution) user schema of the doc store. */
  val initialSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("tokens", ArrayType(IntegerType, containsNull = false), nullable = true),
    StructField("n_tok", IntegerType, nullable = true),
    StructField("source", StringType, nullable = true)))

  /** Thrown to simulate a mid-replay crash in kill/resume tests. */
  final class SimulatedKill extends RuntimeException("graft-simulated-kill")

  def createTable(spark: SparkSession, tableDir: String, nBuckets: Int): LakeTable =
    LakeTable.create(spark, tableDir, initialSchema, nBuckets)

  /** Replay everything currently in `logDir` into `tableDir`, resuming
    * from `checkpointDir` if it exists. Blocks until the log is drained
    * (Trigger.AvailableNow). `stopAfterBatches` kills the query (after
    * the sink commit, before the checkpoint advances) to exercise the
    * crash/resume path. Optional hooks mirror the reference job model:
    * `transform` = the dx_* transformer chain, `quarantineDir` +
    * `errorLimit` = dirty-record routing (§2.6), `metrics` = the
    * counter tap (§2.9). */
  def replay(
      spark: SparkSession,
      logDir: String,
      tableDir: String,
      checkpointDir: String,
      nBuckets: Int = 64,
      maxFilesPerTrigger: Int = Int.MaxValue,
      saltBuckets: Int = 1,
      deltaThreshold: Double = graft.apply.BatchApply.DefaultDeltaThreshold,
      maxDeltaChain: Int = graft.apply.BatchApply.DefaultMaxDeltaChain,
      stopAfterBatches: Int = Int.MaxValue,
      transform: DataFrame => DataFrame = identity,
      quarantineDir: Option[String] = None,
      errorLimit: graft.apply.DirtyRouter.ErrorLimit = graft.apply.DirtyRouter.ErrorLimit(),
      metrics: Option[ReplayMetrics] = None): LakeTable = {

    val table =
      if (LakeTable.exists(spark, tableDir)) LakeTable.load(spark, tableDir)
      else createTable(spark, tableDir, nBuckets)

    val routeDirty = quarantineDir.isDefined ||
      errorLimit.record >= 0 || !errorLimit.percentage.isNaN

    val listener = metrics.map { m =>
      val l = new ReplayListener(m)
      spark.streams.addListener(l)
      l
    }

    val stream = spark.readStream
      .schema(ChangeLog.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(logDir)

    var batches = 0
    val query = stream.writeStream
      .queryName("graft-replay")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (raw: DataFrame, batchId: Long) =>
        val transformed = transform(raw)
        val batch =
          if (!routeDirty) transformed
          else {
            val split = graft.apply.DirtyRouter.route(
              transformed, batchId, quarantineDir, errorLimit)
            metrics.foreach { m =>
              m.readRecords.addAndGet(split.cleanRows + split.dirtyRows)
              m.dirtyRecords.addAndGet(split.dirtyRows)
              m.writeRecords.addAndGet(split.cleanRows)
            }
            split.clean
          }
        val before = table.current.batchId
        BatchApply.apply(table, batch, batchId, saltBuckets,
          deltaThreshold = deltaThreshold, maxDeltaChain = maxDeltaChain)
        metrics.foreach { m =>
          m.batches.incrementAndGet()
          if (batchId <= before) m.fencedBatches.incrementAndGet()
          if (!routeDirty) () // writeRecords counted by the router when on
        }
        batches += 1
        // crash AFTER the lake commit but BEFORE the streaming checkpoint
        // records completion — the worst-case window for duplicates
        if (batches >= stopAfterBatches) throw new SimulatedKill
        ()
      }
      .start()
    try query.awaitTermination()
    catch {
      case e: StreamingQueryException
        if causeChain(e).exists(_.isInstanceOf[SimulatedKill]) => () // expected
    } finally listener.foreach(spark.streams.removeListener)
    table
  }

  private def causeChain(t: Throwable): Iterator[Throwable] =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
}
