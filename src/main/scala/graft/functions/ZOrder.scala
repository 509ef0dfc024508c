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
  * column quantizes to up to 16 bits and the bits interleave
  * column-major into one long: bit b of column c lands at position
  * b*ncols + c. The top interleaved bit is capped below position 63 —
  * with 4 columns at 16 bits, bit 15 of column 3 would land ON the
  * long's sign bit and signed ordering on _z would invert there — so
  * per-column width shrinks to 15 bits when ncols=4 (resolution 32768
  * cells/dim instead of 65536; locality is unaffected). Pure
  * closed-form column arithmetic — codegen'd, no UDF.
  */
object ZOrder {
  val BitsPerCol = 16

  /** Per-column bit width for `n` interleaved columns: highest used
    * bit position (bits-1)*n + (n-1) must stay <= 62. */
  def bitsFor(n: Int): Int = math.min(BitsPerCol, 63 / n)

  def zvalue(normalized: Seq[Column]): Column = {
    require(normalized.nonEmpty && normalized.size <= 4,
      s"zvalue interleaves 1-4 columns, got ${normalized.size}")
    val n = normalized.size
    val bits = bitsFor(n)
    val quant = normalized.map { x =>
      least(greatest(floor(x * lit(1 << bits)), lit(0.0)), lit((1 << bits) - 1.0))
        .cast("long")
    }
    (0 until bits).flatMap { b =>
      quant.zipWithIndex.map { case (q, c) =>
        shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * n + c)
      }
    }.reduce(_ + _) // bit positions are disjoint, so + is OR
  }
}
