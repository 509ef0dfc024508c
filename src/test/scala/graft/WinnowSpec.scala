package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._

/** The native winnowing kernel (plans/WinnowSelectExpr) against a
  * naive quadratic reference: per window take the min digest with the
  * RIGHTMOST position on ties, distinct selected values. Randomized
  * token streams (fixed seed) drive both; any deque-maintenance slip
  * (tie direction, eviction boundary, short-array clip) diverges. */
class WinnowSpec extends SparkSpec {

  private def md5hex(s: String): String = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes)
    d.map(b => f"$b%02x").mkString
  }

  /** Naive robust winnowing over already-formed shingle strings. */
  private def naive(sh: Seq[String], w: Int): Set[String] = {
    val hs = sh.map(md5hex)
    val n = hs.length
    if (n == 0) return Set.empty
    val winW = math.min(w, n)
    (0 to n - winW).map { t =>
      val win = hs.slice(t, t + winW).zipWithIndex
      // min value; tie -> rightmost position
      win.minBy { case (h, i) => (h, -i) }._1
    }.toSet
  }

  private def shingles3(tokens: Seq[String]): Seq[String] =
    if (tokens.length >= 3) tokens.sliding(3).map(_.mkString(" ")).toSeq
    else Seq(tokens.mkString(" "))

  // gh is a 16-byte binary digest since r13 (a bijection of the hex
  // form); hex it here so the naive reference stays readable
  private def kernel(texts: Seq[(Long, String)], w: Int): Map[Long, Set[String]] =
    graft.operators.Dedup
      .winnowFingerprints(spark.createDataFrame(texts).toDF("doc_id", "text"), 3, w)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).map(b => f"$b%02x").mkString))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }

  test("kernel equals the naive reference on randomized token streams") {
    val rnd = new scala.util.Random(42)
    // Small alphabets force heavy hash ties and repeated grams — the
    // regime where the tie rule and deque eviction actually matter.
    val docs = (0 until 40).map { id =>
      val alpha = 2 + rnd.nextInt(5)
      val len = 1 + rnd.nextInt(30)
      (id.toLong, Seq.fill(len)(s"t${rnd.nextInt(alpha)}").mkString(" "))
    }
    for (w <- Seq(1, 2, 4, 7)) {
      val got = kernel(docs, w)
      docs.foreach { case (id, text) =>
        val want = naive(shingles3(text.split(" ").toSeq), w)
        assert(got.getOrElse(id, Set.empty) == want,
          s"doc $id w=$w: kernel ${got.getOrElse(id, Set.empty)} != naive $want")
      }
    }
  }

  test("kernel edge cases: short docs, identical grams, window of one") {
    // n_grams < w degenerates to one whole-array window
    val short = kernel(Seq((1L, "a b")), 4) // single degenerate shingle
    assert(short(1L) == Set(md5hex("a b")))
    // all-identical grams: every window selects the same value once
    val same = kernel(Seq((2L, "x x x x x x x x")), 4)
    assert(same(2L) == Set(md5hex("x x x")))
    // w=1 selects every distinct gram (every window is a singleton)
    val all = kernel(Seq((3L, "p q r s")), 1)
    assert(all(3L) == Set(md5hex("p q r"), md5hex("q r s")))
  }
}
