package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-column shard clustering.
  *
  * Lexicographic `clusterBy` sorting gives perfect min/max pruning on
  * the FIRST sort column and almost none on the rest; interleaving the
  * bits of all clustering columns gives every column a share of the
  * locality, so a shard's footer [min,max] box is tight in EVERY
  * clustered dimension — the standard multi-dimensional layout trick
  * (Delta/Iceberg `OPTIMIZE ZORDER`) and the Spark-native counterpart
  * of the reference's shard clustering knob. Pruning win is measured,
  * not asserted, in StorageSpec (z-ordered shards touch strictly fewer
  * files than lexicographic for a 2-D box probe).
  *
  * `zvalue` expects each column already normalized to [0,1] doubles
  * (bucket-local min/max normalization — the caller knows the range;
  * compact() computes it per bucket in its maintenance pass). Each
  * column quantizes to 16 bits and the bits interleave column-major
  * into one long: bit b of column c lands at position b*ncols + c.
  * Up to 4 columns fit the 64-bit budget. Pure closed-form column
  * arithmetic — codegen'd, no UDF.
  */
object ZOrder {
  val BitsPerCol = 16

  def zvalue(normalized: Seq[Column]): Column = {
    require(normalized.nonEmpty && normalized.size <= 4,
      s"zvalue interleaves 1-4 columns, got ${normalized.size}")
    val n = normalized.size
    val quant = normalized.map { x =>
      least(greatest(floor(x * lit(1 << BitsPerCol)), lit(0.0)), lit((1 << BitsPerCol) - 1.0))
        .cast("long")
    }
    (0 until BitsPerCol).flatMap { b =>
      quant.zipWithIndex.map { case (q, c) =>
        shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * n + c)
      }
    }.reduce(_ + _) // bit positions are disjoint, so + is OR
  }
}
