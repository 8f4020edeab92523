package graft
import org.apache.spark.sql.execution.ExplainMode
object TmpExplain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions").config("spark.ui.enabled", "false").getOrCreate()
    
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q67_orc_source", "q68_change_history", "q69_exif_prune")) {
      val df = SparkEntry.queries(q)(spark, dir)
      println(s"===== $q =====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
