package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions","16")
      .config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    spark.range(100000).selectExpr("sum(id)").collect()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime()-t0)/1e9}%8.2f s  $label rows=$r")
    }
    val base = spark.read.parquet(s"$d/documents.parquet").repartition()
      .select(col("doc_id"), tokens(col("text")).as("words"))
      .select(col("doc_id"), shingles(col("words"), 3).as("sh"))
    val hof = base.select(col("doc_id"),
        transform(col("sh"), s => md5(s)).as("h0"),
        transform(col("sh"), s => md5(concat(lit("x"), s))).as("h1"))
      .select(col("doc_id"),
        array((0 until 8).map { p =>
          val src = if (p < 4) col("h0") else col("h1")
          array_min(transform(src, h => substring(h, 1 + 8 * (p % 4), 8)))
        }: _*).as("sig"))
    val native = base.select(col("doc_id"),
      org.apache.spark.sql.graft.bridge.column(
        graft.plans.MinHashSigExpr(
          org.apache.spark.sql.graft.bridge.expression(col("sh")))).as("sig"))
    for (_ <- 1 to 2) {
      time("hof   ")(hof.select(sum(length(element_at(col("sig"),1)))).collect().head.getLong(0))
      time("native")(native.select(sum(length(element_at(col("sig"),1)))).collect().head.getLong(0))
    }
  }
}
