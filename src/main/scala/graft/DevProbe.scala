package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: dumps formatted physical plans for PLANS.md. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val names = Seq("q01_agg","q02_filter_project","q03_join_agg","q04_broadcast_join",
      "q05_sort_limit","ts02_latest_by_key","ts03_asof_join","dd02_minhash_lsh","ss01_brute_topk")
    names.foreach { n =>
      println(s"\n## $n\n")
      println("```")
      val df = SparkEntry.queries(n)(spark, d)
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
      println("```")
    }
  }
}
