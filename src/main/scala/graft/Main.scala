package graft

import graft.model.JobSpec
import graft.stream.{Replay, ReplayMetrics}
import org.apache.spark.sql.SparkSession

/**
 * spark-submit entrypoint — the analog of `python datax.py job.json`
 * (reference `core/src/main/bin/datax.py` -> `Engine.main`,
 * `core/.../Engine.java:122-172`):
 *
 *   spark-submit --class graft.Main dataxspark.jar job.json
 *
 * Parses the [[JobSpec]], runs the streaming replay (resuming from the
 * job's checkpoint if present), prints the DataX-style final report
 * (counters + rec/s, `JobContainer.logStatistics:575-647` analog) and
 * writes it next to the table. The SparkSession comes from spark-submit
 * (master/cores/memory are cluster-submit concerns, not job-spec
 * concerns — same split as DataX's core.json vs job.json).
 */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: graft.Main <job.json> [runTag]")
    val spec = JobSpec.parse(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0))), "UTF-8"))
    val tag = if (args.length > 1) args(1) else "run"

    // master comes from spark-submit; GRAFT_MASTER is a convenience for
    // driving the jar without it (tests / local smoke)
    val builder = SparkSession.builder()
      .appName("graft-cdc-replay")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.env.get("GRAFT_MASTER")
      .fold(builder)(m => builder.master(m)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spec.preSql.foreach(spark.sql(_).collect()) // DataX preSql analog

    // jdbc-reader jobs take the BATCH path (the classic DataX table
    // copy): load -> transformer chain -> jdbc sink or parquet tableDir
    if (spec.jdbcReader.isDefined) {
      val r = spec.jdbcReader.get
      val df = spec.transformFn(r.load(spark))
      spec.jdbcWriter match {
        case Some(w) => w.save(df)
        case None =>
          require(spec.tableDir.nonEmpty,
            "jdbc reader without jdbc writer needs writer.tableDir (parquet sink)")
          df.write.mode("append").parquet(spec.tableDir)
      }
      spec.postSql.foreach(spark.sql(_).collect())
      println(s"graft jdbc job done: ${r.options("url")} -> " +
        spec.jdbcWriter.map(_.options("url")).getOrElse(spec.tableDir))
      spark.stop()
      return
    }
    require(spec.logDir.nonEmpty && spec.tableDir.nonEmpty && spec.checkpointDir.nonEmpty,
      "replay jobs need reader.logDir + writer.tableDir + writer.checkpointDir")

    val metrics = new ReplayMetrics
    val table = Replay.replay(
      spark, spec.logDir, spec.tableDir, spec.checkpointDir,
      nBuckets = spec.nBuckets,
      maxFilesPerTrigger = spec.maxFilesPerTrigger,
      maxBytesPerTrigger = spec.maxBytesPerTrigger,
      eventsPerSecond = spec.eventsPerSecond,
      saltBuckets = spec.saltBuckets,
      assumeOrdered = spec.assumeOrdered,
      deltaThreshold = spec.deltaThreshold,
      maxDeltaChain = spec.maxDeltaChain,
      transform = spec.transformFn,
      quarantineDir = spec.quarantineDir,
      errorLimit = graft.apply.DirtyRouter.ErrorLimit(spec.errorRecordLimit, spec.errorPercentageLimit),
      metrics = Some(metrics))

    spec.postSql.foreach(spark.sql(_).collect()) // DataX postSql analog

    // post-replay maintenance: rebucket folds deltas too, so compact
    // after it is cheap; vacuum last removes everything superseded
    if (spec.rebucketTo > 0) table.rebucket(spec.rebucketTo)
    if (spec.compactAfter) table.compact()
    if (spec.vacuumAfter) table.vacuum()

    metrics.report(spark, spec.tableDir, tag)
    val snap = table.current
    println(s"graft job done: ${metrics.toJson}")
    // base rows only: delta-overlay rows REPLACE base rows at read time,
    // so summing every file would double-count merge-on-read buckets
    val baseRows = snap.files.filterNot(_.delta).map(_.rows).sum
    val deltaRows = snap.files.filter(_.delta).map(_.rows).sum
    println(s"table ${spec.tableDir} v${snap.version} batchId=${snap.batchId} " +
      s"baseRows=$baseRows deltaOverlayRows=$deltaRows files=${snap.files.size} " +
      s"watermarks=${snap.watermarks.toSeq.sortBy(_._1).mkString(",")}")
    spark.stop()
  }
}
