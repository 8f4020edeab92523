package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (not shipped): measure salted vs unsalted at varying
  * single-key hot shares for (a) canonicalize's algebraic max_by and
  * (b) a non-algebraic per-key history collect. */
object SkewProbe {
  def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("skew-probe")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 4000000L
    def mkEvents(hotShare: Double): DataFrame = {
      // deterministic: row i is hot iff (i * 2654435761 mod 1000) < hotShare*1000
      spark.range(n).select(
        when(pmod(col("id") * 2654435761L, lit(1000L)) < lit((hotShare * 1000).toLong),
          lit("hot-doc"))
          .otherwise(concat(lit("doc-"), pmod(col("id") * 40503L, lit(250000L))))
          .as("doc_id"),
        col("id").as("lsn"),
        when(pmod(col("id"), lit(10L)) === 0, lit("D")).otherwise(lit("U")).as("op"),
        sequence(lit(0), lit(31)).as("tokens"),
        lit(32).as("n_tok"),
        lit("web").as("source"),
        lit(null).cast("string").as("lang"),
        pmod(col("id"), lit(32L)).cast("int").as("shard"))
    }

    // force every computed column: bit_xor of a hash that references them,
    // so ColumnPruning cannot drop the aggregate's payload
    def forceCanon(df: DataFrame): Long =
      df.select(bit_xor(xxhash64(col("lsn"), col("n_events"), col("min_lsn")))).as[Long].head()
    def forceHist(df: DataFrame): Long =
      df.select(bit_xor(xxhash64(col("doc_id"), col("n"), col("h0")))).as[Long].head()

    if (args.headOption.contains("hist")) {
      val ev = mkEvents(0.8).persist(); ev.count()
      def histUnsalted = ev.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("lsn"), col("op"), col("n_tok")))).as("history"))
        .select(col("doc_id"), size(col("history")).as("n"),
          element_at(col("history"), 1).getField("lsn").as("h0"))
      // range salt: per-salt lists are contiguous lsn ranges; phase-2
      // flatten of salt-ordered sorted chunks needs NO elementwise sort
      def histRangeSalted = ev
        .groupBy(col("doc_id"), (col("lsn") * lit(32L) / lit(n)).cast("int").as("_salt"))
        .agg(sort_array(collect_list(struct(col("lsn"), col("op"), col("n_tok")))).as("h"))
        .groupBy(col("doc_id"))
        .agg(flatten(transform(sort_array(collect_list(struct(col("_salt"), col("h")))),
          x => x.getField("h"))).as("history"))
        .select(col("doc_id"), size(col("history")).as("n"),
          element_at(col("history"), 1).getField("lsn").as("h0"))
      forceHist(histUnsalted); forceHist(histRangeSalted)
      for (i <- 1 to 4) println(f"attempt $i unsalted: ${time(forceHist(histUnsalted))}%.2f")
      for (i <- 1 to 4) println(f"attempt $i rangesalted: ${time(forceHist(histRangeSalted))}%.2f")
      spark.stop(); return
    }

    if (args.headOption.contains("canon0")) {
      val ev = mkEvents(0.0).persist(); ev.count()
      graft.apply.BatchApply.canonicalize(ev, 1).explain("formatted")
      for (i <- 1 to 5) {
        val t = time(forceCanon(graft.apply.BatchApply.canonicalize(ev, 1)))
        println(f"attempt $i unsalted: $t%.2f")
      }
      for (i <- 1 to 5) {
        val t = time(forceCanon(graft.apply.BatchApply.canonicalize(ev, 8)))
        println(f"attempt $i salted: $t%.2f")
      }
      spark.stop(); return
    }

    for (hot <- Seq(0.0, 0.3, 0.8)) {
      val ev = mkEvents(hot).persist()
      ev.count()
      // warmup both paths
      forceCanon(graft.apply.BatchApply.canonicalize(ev, 1))
      // (a) canonicalize: algebraic max_by
      val cu = (1 to 3).map(_ => time(forceCanon(graft.apply.BatchApply.canonicalize(ev, 1)))).min
      val cs = (1 to 3).map(_ => time(forceCanon(graft.apply.BatchApply.canonicalize(ev, 8)))).min
      // (b) history: non-algebraic collect_list
      def histUnsalted = ev.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("lsn"), col("op"), col("n_tok")))).as("history"))
        .select(col("doc_id"), size(col("history")).as("n"),
          element_at(col("history"), 1).getField("lsn").as("h0"))
      def histSalted = ev
        .groupBy(col("doc_id"), pmod(col("lsn"), lit(32L)).as("_salt"))
        .agg(collect_list(struct(col("lsn"), col("op"), col("n_tok"))).as("h"))
        .groupBy(col("doc_id"))
        .agg(sort_array(flatten(collect_list(col("h")))).as("history"))
        .select(col("doc_id"), size(col("history")).as("n"),
          element_at(col("history"), 1).getField("lsn").as("h0"))
      forceHist(histUnsalted)
      val hu = (1 to 3).map(_ => time(forceHist(histUnsalted))).min
      val hs = (1 to 3).map(_ => time(forceHist(histSalted))).min
      println(f"RESULT hot=$hot%.1f canon_unsalted=$cu%.2f canon_salted=$cs%.2f hist_unsalted=$hu%.2f hist_salted=$hs%.2f")
      ev.unpersist()
    }
    spark.stop()
  }
}
