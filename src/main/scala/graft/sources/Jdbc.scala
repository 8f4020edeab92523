package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * JDBC reader/writer configuration surface — the engine's mapping of the
 * reference's most-used connector family (DataX
 * `plugin-rdbms-util/.../reader/CommonRdbmsReader.java:172-224` scan +
 * type map, `writer/CommonRdbmsWriter.java:262-309` batched load, conf
 * pretreatment `OriginalConfPretreatmentUtil.java:131-182`) onto Spark's
 * built-in JDBC source (`spark.read/write.format("jdbc")`).
 *
 * What maps where:
 *  - `jdbcUrl`/`username`/`password`/`driver` -> the same-named options;
 *  - `column` list -> post-load projection (Spark pushes the pruned
 *    column set into the generated SELECT);
 *  - `where` -> a filter Column (pushed down into the JDBC query);
 *  - `querySql` -> the `query` option (table-less mode, like the
 *    reference's querySql which disables splitting);
 *  - `splitPk` + channel count -> EITHER Spark's native
 *    partitionColumn/lowerBound/upperBound/numPartitions (even numeric
 *    ranges — exactly `RangeSplitUtil.doLongSplit`) OR explicit
 *    [[JdbcReader.splitPredicates]] WHERE ranges fed to
 *    `spark.read.jdbc(url, table, predicates, ...)` for custom split
 *    points (the quantile-split path, `SingleTableSplitUtil:294-389` —
 *    bounds from [[graft.operators.Split]]);
 *  - writer `batchSize` -> `batchsize`; `writeMode=insert` -> append,
 *    `writeMode=replace` -> overwrite+truncate. `writeMode=update`
 *    (keyed upsert) has no plain-JDBC equivalent in Spark — that
 *    semantics IS the engine's MERGE path ([[graft.apply.BatchApply]]);
 *    route updates through the lake table, not this sink.
 *
 * NOTE: no database ships in this sandbox, so these specs are exercised
 * at the option/plan level only (see JobSpecSuite) — documented as
 * untested against a live DB. The option names are Spark's public JDBC
 * contract, so against a real URL the path is `spec.load(spark)`.
 */
object Jdbc {

  final case class JdbcReaderSpec(
      url: String,
      table: Option[String],
      querySql: Option[String],
      user: Option[String],
      password: Option[String],
      driver: Option[String],
      columns: Seq[String],
      where: Option[String],
      splitPk: Option[String],
      lowerBound: Option[Long],
      upperBound: Option[Long],
      numPartitions: Int,
      fetchSize: Int) {
    require(table.isDefined ^ querySql.isDefined,
      "exactly one of reader.jdbc.table / reader.jdbc.querySql")
    require(querySql.isEmpty || splitPk.isEmpty,
      "querySql disables splitPk (same rule as the reference: querySql mode is unsplit)")

    /** The option map handed to `spark.read.format("jdbc")` — the
      * testable surface. */
    def options: Map[String, String] = {
      val base = Map("url" -> url, "fetchsize" -> fetchSize.toString)
      val src = table.map("dbtable" -> _).toMap ++ querySql.map("query" -> _).toMap
      val auth = user.map("user" -> _).toMap ++ password.map("password" -> _).toMap ++
        driver.map("driver" -> _).toMap
      val split = (splitPk, lowerBound, upperBound) match {
        case (Some(pk), Some(lo), Some(hi)) => Map(
          "partitionColumn" -> pk, "lowerBound" -> lo.toString,
          "upperBound" -> hi.toString, "numPartitions" -> numPartitions.toString)
        case _ => Map.empty[String, String]
      }
      base ++ src ++ auth ++ split
    }

    def reader(spark: SparkSession): DataFrameReader =
      options.foldLeft(spark.read.format("jdbc")) { case (r, (k, v)) => r.option(k, v) }

    /** Full load: relation + column pruning + where pushdown. Requires a
      * live database. */
    def load(spark: SparkSession): DataFrame = {
      val df = reader(spark).load()
      val projected = if (columns.isEmpty) df else df.select(columns.map(col): _*)
      where.fold(projected)(projected.filter)
    }
  }

  /** Even numeric WHERE ranges over [lo, hi] for `spark.read.jdbc(url,
    * table, predicates, props)` — one JDBC partition per predicate, the
    * reference's `RangeSplitUtil.doLongSplit` + null-slice
    * (`SingleTableSplitUtil.splitSingleTable:72-95` appends the
    * `pk IS NULL` task). Callers with skewed keys pass exact quantile
    * bounds from [[graft.operators.Split.exactNtile]] instead. */
  def splitPredicates(pk: String, lo: Long, hi: Long, k: Int,
      includeNullSlice: Boolean = true): Seq[String] = {
    require(k >= 1 && hi >= lo, s"bad split domain [$lo,$hi] x $k")
    val width = math.max(1L, (hi - lo + k) / k)
    val ranges = (0 until k).map { i =>
      val a = lo + i * width
      if (i == k - 1) s"$pk >= $a AND $pk <= $hi"
      else s"$pk >= $a AND $pk < ${a + width}"
    }
    if (includeNullSlice) ranges :+ s"$pk IS NULL" else ranges
  }

  /** WHERE ranges from explicit ascending bounds (quantile split):
    * bounds b0..bn give n ranges [b_i, b_i+1). */
  def boundsPredicates(pk: String, bounds: Seq[Long],
      includeNullSlice: Boolean = true): Seq[String] = {
    require(bounds.size >= 2 && bounds == bounds.sorted, "need >= 2 ascending bounds")
    val ranges = bounds.sliding(2).zipWithIndex.map { case (Seq(a, b), i) =>
      if (i == bounds.size - 2) s"$pk >= $a AND $pk <= $b"
      else s"$pk >= $a AND $pk < $b"
    }.toSeq
    if (includeNullSlice) ranges :+ s"$pk IS NULL" else ranges
  }

  final case class JdbcWriterSpec(
      url: String,
      table: String,
      user: Option[String],
      password: Option[String],
      driver: Option[String],
      writeMode: String, // insert | replace (update -> BatchApply MERGE, not here)
      batchSize: Int) {
    require(Set("insert", "replace").contains(writeMode),
      s"writeMode '$writeMode' not supported on the plain JDBC sink; " +
        "'update' (keyed upsert) is the lake MERGE path (graft.apply.BatchApply)")

    def options: Map[String, String] = {
      val base = Map("url" -> url, "dbtable" -> table, "batchsize" -> batchSize.toString)
      val auth = user.map("user" -> _).toMap ++ password.map("password" -> _).toMap ++
        driver.map("driver" -> _).toMap
      // replace = overwrite into the EXISTING table shape: truncate, not
      // drop/recreate (the reference issues `TRUNCATE TABLE`/delete
      // pre-statements for replace mode, WriterUtil.java:122-168)
      val mode = if (writeMode == "replace") Map("truncate" -> "true") else Map.empty
      base ++ auth ++ mode
    }

    def saveMode: org.apache.spark.sql.SaveMode =
      if (writeMode == "replace") org.apache.spark.sql.SaveMode.Overwrite
      else org.apache.spark.sql.SaveMode.Append

    /** Requires a live database. */
    def save(df: DataFrame): Unit =
      options.foldLeft(df.write.format("jdbc")) { case (w, (k, v)) => w.option(k, v) }
        .mode(saveMode).save()
  }
}
