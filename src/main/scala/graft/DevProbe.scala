package graft
import org.apache.spark.sql.SparkSession
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0); val d = args(1)
    val df = SparkEntry.queries(name)(spark, d)
    if (args.length > 2) df.explain("formatted")
    val t0 = System.nanoTime()
    println("COUNT=" + df.count() + " in " + (System.nanoTime()-t0)/1e9 + "s")
  }
}
