package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM property test of the Misra-Gries guarantees — the
  * invariants tx15 gates on, checked under the adversarial conditions
  * the cluster actually produces: arbitrary partition cuts and
  * arbitrary (random) merge trees, exactly what Spark's partial-agg
  * schedule does between runs. */
class MisraGriesSpec extends AnyFunSuite {

  test("MG guarantees hold for every partition cut and merge order") {
    val k = 8
    val agg = new graft.functions.MisraGriesAgg(k)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val n = 500 + rnd.nextInt(1500)
      // skewed synthetic stream (a few heavy terms over a long tail)
      val stream = Array.fill(n)(
        math.min(29, (math.pow(rnd.nextDouble(), 3) * 30).toInt).toString)
      val chunks = stream.grouped(1 + rnd.nextInt(200)).toVector
      val partials = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
      var bufs = rnd.shuffle(partials)
      while (bufs.size > 1) {
        val i = rnd.nextInt(bufs.size - 1)
        bufs = bufs.patch(i, Seq(agg.merge(bufs(i), bufs(i + 1))), 2)
      }
      val sk = agg.finish(bufs.head)
      assert(sk.size <= k, s"summary exceeded capacity: ${sk.size} > $k")
      val exact = stream.groupBy(identity).map { case (t, a) => t -> a.length.toLong }
      val bound = n.toDouble / (k + 1)
      exact.foreach { case (t, c) =>
        val est = sk.getOrElse(t, 0L)
        assert(est <= c, s"MG must never overcount: $t est $est > exact $c")
        assert(c - est <= bound,
          s"undercount bound violated for $t: exact $c, est $est, bound $bound (n=$n)")
        if (c > bound)
          assert(sk.contains(t), s"heavy hitter $t (cnt $c > $bound) missing from summary")
      }
      // no phantom terms: everything reported was actually seen
      sk.keys.foreach(t => assert(exact.contains(t), s"phantom term $t"))
    }
  }
}
