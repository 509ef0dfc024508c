package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .withColumn("price_c", round(col("o_totalprice")*100).cast("long"))
      .groupBy(col("o_orderpriority"))
      .agg(expr("percentile(price_c, 0.25)").as("p25"),
           expr("percentile(price_c, 0.5)").as("p50"),
           expr("percentile(price_c, 0.75)").as("p75"))
      .orderBy(col("o_orderpriority"))
      .collect().foreach(println)
  }
}
