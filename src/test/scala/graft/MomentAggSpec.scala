package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM property test of the MomentAgg invariants ss20 and the
  * streaming embed-drift monitor rely on: the buffer is an exact
  * integer summary, so ANY partition cut and ANY merge order must
  * produce the bit-identical result of a single sequential pass —
  * exactly the freedom Spark's partial-agg schedule exercises between
  * runs (and what makes stream==batch hold across micro-batch splits). */
class MomentAggSpec extends AnyFunSuite {

  private val agg = graft.functions.MomentAgg

  private def quant(x: Float): Long = math.floor(x.toDouble * 1000 + 0.5).toLong

  test("moments are identical for every partition cut and merge order") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 20) {
      val d = 1 + rnd.nextInt(12)
      val n = 50 + rnd.nextInt(300)
      val vecs = Array.fill(n)(Array.fill(d)((rnd.nextGaussian() * 2).toFloat))
      val sequential = vecs.foldLeft(agg.zero)(agg.reduce)
      val chunks = vecs.grouped(1 + rnd.nextInt(40)).toVector
      val partials = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
      var bufs = rnd.shuffle(partials)
      while (bufs.size > 1) {
        val i = rnd.nextInt(bufs.size - 1)
        bufs = bufs.patch(i, Seq(agg.merge(bufs(i), bufs(i + 1))), 2)
      }
      val merged = agg.finish(bufs.head)
      assert(merged.sameElements(sequential),
        s"trial $trial: merge-order dependence (d=$d n=$n)")
      // the buffer IS the exact summary: spot-check against direct sums
      assert(merged(0) == d && merged(1) == n)
      for (i <- 0 until d) {
        assert(merged(2 + i) == vecs.map(v => quant(v(i))).sum, s"S_$i")
        for (j <- 0 until d)
          assert(merged(2 + d + i * d + j) ==
            vecs.map(v => quant(v(i)) * quant(v(j))).sum, s"S_${i}_$j")
      }
    }
  }

  test("null rows and dimension-mismatched vectors are skipped, never corrupt the buffer") {
    val good = Array(Array(1f, 2f), Array(3f, 4f))
    val expected = good.foldLeft(agg.zero)(agg.reduce)
    // null and wrong-dim rows interleaved: reduce must skip them
    val withBad = agg.reduce(agg.reduce(agg.reduce(agg.reduce(
      agg.zero, good(0)), null), Array(9f, 9f, 9f)), good(1))
    assert(withBad.sameElements(expected), "bad rows must contribute nothing")
    // merging a mismatched-dimension buffer keeps the left side intact
    val other = agg.reduce(agg.zero, Array(5f, 6f, 7f))
    val kept = agg.merge(withBad.clone(), other)
    assert(kept.sameElements(expected), "dim-mismatched merge must be a no-op")
    // empty buffers merge transparently from either side
    assert(agg.merge(agg.zero, expected.clone()).sameElements(expected))
    assert(agg.merge(expected.clone(), agg.zero).sameElements(expected))
  }
}
