package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Metadata-only table statistics — the counterpart of the
  * reference's catalog-served table stats (a production catalog
  * answers COUNT-class questions from its manifest, not a scan).
  *
  * Parquet footers record per-file row counts, so the total row count
  * of a file/topic is a driver-side metadata walk: O(files) small
  * footer reads, never a cluster job over the data. Operators that
  * only need `n` to SIZE something (dd05's adaptive LSH band width)
  * use this instead of spending a full corpus pass — at 100 TB the
  * difference is a scan of the table vs a listing of it.
  */
object Stats {

  /** Total rows across every parquet file under `path` (recursive,
    * so hive-bucketed topic layouts count correctly). None when the
    * path is missing, holds no parquet, or any footer fails to read —
    * callers fall back to a real count(). */
  def parquetRowCount(spark: SparkSession, path: String): Option[Long] = {
    try {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) return None
      def walk(q: Path): Seq[Path] =
        fs.listStatus(q).toSeq.flatMap { st =>
          if (st.isDirectory) walk(st.getPath)
          else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
          else Seq.empty
        }
      val files = walk(p)
      if (files.isEmpty) return None
      Some(files.map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try r.getRecordCount finally r.close()
      }.sum)
    } catch { case _: Exception => None }
  }
}
