package graft
import org.apache.spark.sql.SparkSession
/** Dev-only scratch main for probing Spark behaviors locally. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df.printSchema()
    df.orderBy("event_id").show(3, false)
  }
}
