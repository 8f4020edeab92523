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

  /** dryRun / preCheck (the reference's `JobContainer.preCheck`,
    * `core/.../job/JobContainer.java:100-107`): validate everything
    * validatable WITHOUT writing a byte — spec shape (already parsed),
    * reader source existence + schema compatibility with the change-log
    * contract, target table loadability (descriptor format/bucketFn
    * stamp), and transformer-chain resolvability (plan-time analysis
    * over the source schema; reflective load of custom classes).
    * Returns the list of passed checks; throws on the first failure. */
  def preCheck(spark: SparkSession, spec: JobSpec): Seq[String] = {
    val passed = scala.collection.mutable.ArrayBuffer[String]()
    // None = source schema unknowable without a live connection (jdbc):
    // transformer EXPRESSION analysis is skipped (a chain valid against
    // the actual table would wrongly fail against any guessed schema,
    // and vice versa); class-loading checks still run
    val srcSchema: Option[org.apache.spark.sql.types.StructType] =
      if (spec.jdbcReader.isDefined) {
        passed += s"reader.jdbc: options validated (no live DB probe in dryRun)"
        None
      } else if (spec.logFormat == "debezium") {
        // envelope logs are self-describing JSON; schema is fixed by the
        // codec, so the dryRun validates existence only (decoding a
        // sample would be a data read, which dryRun promises not to do)
        val logPath = new org.apache.hadoop.fs.Path(spec.logDir)
        val fs = logPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        require(fs.exists(logPath), s"reader.logDir does not exist: ${spec.logDir}")
        passed += s"reader.logDir: exists (debezium envelope lines, codec-fixed schema)"
        Some(graft.model.ChangeLog.schema)
      } else Some {
        val logPath = new org.apache.hadoop.fs.Path(spec.logDir)
        val fs = logPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        require(fs.exists(logPath), s"reader.logDir does not exist: ${spec.logDir}")
        val got = spark.read.parquet(spec.logDir).schema // footer metadata only
        val gotByName = got.fields.map(f => f.name -> f.dataType).toMap
        graft.model.ChangeLog.schema.fields.foreach { f =>
          // catalogString comparison: nullability-insensitive (parquet
          // round-trips array element nullability differently)
          require(gotByName.get(f.name).map(_.catalogString).contains(f.dataType.catalogString),
            s"reader.logDir schema incompatible: expected ${f.name}: ${f.dataType.catalogString}, " +
              s"found ${gotByName.get(f.name).map(_.catalogString).getOrElse("<absent>")}")
        }
        passed += s"reader.logDir: exists, schema matches ChangeLog.schema"
        got
      }
    if (spec.tableDir.nonEmpty && graft.lake.LakeTable.exists(spark, spec.tableDir)) {
      val snap = graft.lake.LakeTable.load(spark, spec.tableDir).current // validates fv/bucketFn
      passed += s"writer.tableDir: loadable (v${snap.version}, ${snap.nBuckets} buckets)"
    } else if (spec.tableDir.nonEmpty) {
      passed += "writer.tableDir: absent (will be created on first run)"
    }
    // transformer chain: plan-time analysis resolves every expression
    // and reflectively loads custom classes — nothing executes. With an
    // unknowable source schema (jdbc) only the class-loading half runs.
    srcSchema match {
      case Some(schema) =>
        val empty = spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
        val outSchema = spec.transformFn(empty).schema
        passed += s"transformers: ${spec.transformers.size} resolved " +
          s"(output schema: ${outSchema.fieldNames.mkString(", ")})"
      case None =>
        // schema-independent checks still run: name dispatch, required
        // params, numeric parses, custom-class loadability — only the
        // column-reference analysis needs the (unavailable) schema
        spec.transformers.foreach(_.preValidate())
        passed += s"transformers: ${spec.transformers.size} pre-validated " +
          "(expression analysis skipped: jdbc source schema unknown without a live connection)"
    }
    spec.fileWriter.foreach { fw =>
      fw.saveMode // validates writeMode
      passed += s"writer.file: mode '${fw.writeMode}' valid for ${fw.path}"
    }
    spec.dedup.foreach { dx =>
      require(dx.k % dx.bands == 0, s"dedup: k=${dx.k} must be divisible by bands=${dx.bands}")
      if (graft.operators.LshIndex.exists(spark, dx.indexDir))
        passed += s"dedup: index at ${dx.indexDir} loadable " +
          s"(${graft.operators.LshIndex.describe(spark, dx.indexDir)}; probes follow the index)"
      else
        passed += s"dedup: no index at ${dx.indexDir} (first batch builds it " +
          s"with n=${dx.n} k=${dx.k} bands=${dx.bands})"
    }
    passed.toSeq
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: graft.Main <job.json> [runTag] [--dryRun]")
    val specJson =
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0))), "UTF-8")
    val spec = JobSpec.parse(specJson)
    val tag = args.drop(1).find(!_.startsWith("--")).getOrElse("run")
    val dryRun = spec.dryRun || args.contains("--dryRun")

    // master comes from spark-submit; GRAFT_MASTER is a convenience for
    // driving the jar without it (tests / local smoke)
    val builder = SparkSession.builder()
      .appName("graft-cdc-replay")
      .config("spark.sql.session.timeZone", "UTC")
    val spark = sys.env.get("GRAFT_MASTER")
      .fold(builder)(m => builder.master(m)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // anything printed about the spec is masked (Engine.java:110-120
    // analog): *password*/*accessKey*/*secret*/*token* values never log
    println(s"graft job spec ($tag):\n${JobSpec.maskSensitive(specJson)}")

    if (dryRun) {
      val checks = preCheck(spark, spec)
      println(s"graft preCheck passed (dryRun — nothing written):")
      checks.foreach(c => println(s"  - $c"))
      spark.stop()
      return
    }

    spec.preSql.foreach(spark.sql(_).collect()) // DataX preSql analog

    // jdbc-reader / file-writer jobs take the BATCH path (the classic
    // DataX table copy): load -> transformer chain -> jdbc/file/parquet
    if (spec.jdbcReader.isDefined || spec.fileWriter.isDefined) {
      val src = spec.jdbcReader match {
        case Some(r) => r.load(spark)
        case None => spark.read.parquet(spec.logDir)
      }
      val df = spec.transformFn(src)
      (spec.jdbcWriter, spec.fileWriter) match {
        case (Some(w), _) => w.save(df)
        case (None, Some(fw)) => fw.save(df)
        case (None, None) =>
          require(spec.tableDir.nonEmpty,
            "jdbc reader without jdbc/file writer needs writer.tableDir (parquet sink)")
          df.write.mode("append").parquet(spec.tableDir)
      }
      spec.postSql.foreach(spark.sql(_).collect())
      println(s"graft batch job done: " +
        spec.jdbcReader.map(_.options("url")).getOrElse(spec.logDir) + " -> " +
        spec.jdbcWriter.map(_.options("url"))
          .orElse(spec.fileWriter.map(_.path)).getOrElse(spec.tableDir))
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
      changelog = spec.changelog,
      preimages = spec.preimages,
      transform = spec.transformFn,
      quarantineDir = spec.quarantineDir,
      errorLimit = graft.apply.DirtyRouter.ErrorLimit(spec.errorRecordLimit, spec.errorPercentageLimit),
      dedup = spec.dedup,
      metrics = Some(metrics),
      logFormat = spec.logFormat)

    spec.postSql.foreach(spark.sql(_).collect()) // DataX postSql analog

    // maintained view sync runs BEFORE maintenance: vacuum's feed
    // retention must never trim batches this sync still needs
    spec.ivm.foreach { iv =>
      val lease =
        if (iv.lease) Some(graft.lake.WriterLease.acquire(spark, iv.aggDir, s"job:$tag"))
        else None
      val agg = graft.lake.Ivm.sync(table, iv.aggDir, iv.grp, iv.sum,
        stateBuckets = iv.stateBuckets, lease = lease)
      println(s"ivm view ${iv.aggDir}: ${agg.count()} groups, synced through " +
        s"batch ${graft.lake.Ivm.syncedBatchId(spark, iv.aggDir)}")
    }

    // post-replay maintenance: rebucket folds deltas too, so compact
    // after it is cheap; vacuum last removes everything superseded.
    // "auto" sizes the bucket count from the live row count — the
    // growth path when ingest has outpaced the create-time choice
    if (spec.rebucketTo == JobSpec.RebucketAuto) {
      val snap0 = table.current
      val liveRows = snap0.files.filterNot(_.delta).map(_.rows).sum
      val target = graft.lake.LakeTable.suggestBuckets(liveRows,
        parallelism = spark.sparkContext.defaultParallelism)
      if (target != snap0.nBuckets) {
        println(s"maintenance: auto-rebucket ${snap0.nBuckets} -> $target ($liveRows live rows)")
        table.rebucket(target)
      }
    } else if (spec.rebucketTo > 0) table.rebucket(spec.rebucketTo)
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
