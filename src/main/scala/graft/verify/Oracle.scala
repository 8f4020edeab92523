package graft.verify

import graft.model.ChangeEvent
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/**
 * Sequential reference apply — the correctness oracle.
 *
 * Mirrors the reference's de-facto validation pattern: run the job
 * single-channel and compare (DataX docs benchmark 1-channel runs as the
 * baseline, `mysqlreader/doc/mysqlreader.md:302,331`; the smoke job
 * `core/src/main/job/job.json` asserts read==write counters). Here: pull
 * the whole log to the driver, sort by lsn, apply one event at a time to
 * a HashMap — deliberately the *dumbest possible* implementation, sharing
 * no code path with the engine. Test-scale only.
 */
object Oracle {

  final case class FinalRow(doc_id: String, tokens: Seq[Int], n_tok: Option[Long],
      source: Option[String], lang: Option[String], lsn: Long)

  /** Sequentially apply `log` (any order — sorted internally by lsn). */
  def applySequential(log: DataFrame): Seq[FinalRow] = {
    val rows = log.collect().sortBy(_.getAs[Long]("lsn"))
    val state = mutable.LinkedHashMap[String, FinalRow]()
    rows.foreach { r =>
      val id = r.getAs[String]("doc_id")
      r.getAs[String]("op") match {
        case "D" => state.remove(id)
        case _ =>
          state(id) = FinalRow(
            id,
            r.getAs[scala.collection.Seq[Int]]("tokens").toSeq,
            Option(r.getAs[java.lang.Long]("n_tok")).map(_.longValue),
            Option(r.getAs[String]("source")),
            Option(r.getAs[String]("lang")),
            r.getAs[Long]("lsn"))
      }
    }
    state.values.toSeq
  }

  /** Oracle final state as a DataFrame in the evolved user schema (+lsn),
    * for set-difference comparison against the engine's table. */
  def expectedState(spark: SparkSession, log: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", StringType, nullable = false),
      StructField("tokens", ArrayType(IntegerType, containsNull = false)),
      StructField("n_tok", LongType),
      StructField("source", StringType),
      StructField("lang", StringType),
      StructField("lsn", LongType, nullable = false)))
    val data = applySequential(log).map(f => Row(
      f.doc_id, f.tokens, f.n_tok.map(Long.box).orNull, f.source.orNull, f.lang.orNull, f.lsn))
    spark.createDataFrame(spark.sparkContext.parallelize(data, 4), schema)
  }

  /** North-rule comparison: per-row token-array equality + row counts +
    * order-insensitive checksums. Returns a human-readable mismatch
    * report; empty = byte-identical final state. */
  def diff(expected: DataFrame, actual: DataFrame): Seq[String] = {
    val cols = Seq("doc_id", "tokens", "n_tok", "source", "lang")
    // n_tok cast to long on both sides: pre-evolution tables are int32
    def norm(df: DataFrame): DataFrame = align(df, cols)
      .select(col("doc_id"), col("tokens"), col("n_tok").cast("long").as("n_tok"),
        col("source"), col("lang"))
    val e = norm(expected)
    val a = norm(actual)
    val out = mutable.ArrayBuffer[String]()
    val (ec, ac) = (e.count(), a.count())
    if (ec != ac) out += s"row count mismatch: expected=$ec actual=$ac"
    val onlyE = e.exceptAll(a).count()
    val onlyA = a.exceptAll(e).count()
    if (onlyE > 0) out += s"$onlyE rows only in expected"
    if (onlyA > 0) out += s"$onlyA rows only in actual"
    out.toSeq
  }

  /** If the table never evolved, pre-evolution columns like `lang` are
    * absent but the oracle's are all-null — align by adding nulls. */
  private def align(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast(StringType))
    }

  /** Order-insensitive per-partition checksum of a final state: one row
    * per hash-bucket with count + sum/xor of row hashes. The sum is taken
    * mod a prime to stay overflow-free under ANSI arithmetic. */
  def partitionChecksums(df: DataFrame, nBuckets: Int): DataFrame = {
    val d = align(df, Seq("doc_id", "tokens", "n_tok", "source", "lang"))
    val rowHash = xxhash64(col("doc_id"), col("tokens"), col("n_tok").cast("long"),
      col("source"), col("lang"))
    d.withColumn("bucket", pmod(xxhash64(col("doc_id")), lit(nBuckets.toLong)).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("rows"),
        sum(pmod(rowHash, lit(1000000007L))).as("hash_sum"),
        bit_xor(rowHash).as("hash_xor"))
  }
}
