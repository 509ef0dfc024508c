package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed Aggregator — the
  * bounded-memory frequent-terms primitive.
  *
  * The exact alternative (groupBy term → count) shuffles the DISTINCT
  * TERM DOMAIN — at 100 TB of text that domain is billions of rows and
  * the shuffle is the cost driver (tx12's vocab pass pays it, bounded
  * only by its top-k). A Misra-Gries summary instead keeps AT MOST `k`
  * counters per partial aggregate, merges associatively (Agarwal et
  * al. 2013, "Mergeable summaries": combine counters, subtract the
  * (k+1)-th largest, drop non-positives), and ships one ≤k-entry map
  * per (group × partition) across the wire — wire cost is O(k), not
  * O(vocabulary).
  *
  * Guarantees (hold for EVERY partial/merge order, which is what makes
  * the summary usable under Spark's nondeterministic partial-agg
  * schedule): for true total count n, every counter undercounts its
  * term by at most n/(k+1); therefore every term with frequency
  * > n/(k+1) is PRESENT in the final summary. The summary CONTENT
  * (which sub-threshold terms appear, residual counts) legitimately
  * varies with merge order — callers must consume it through the
  * guarantee, not as exact counts. tx15 does exactly that: its output
  * is the exact heavy-hitter twin plus per-term booleans certifying
  * the guarantee held, never the raw residuals.
  */
object MisraGriesAgg {
  /** The aggregator as a DataFrame-usable function (hoisted here
    * because value classes — graft.api's ops wrapper — cannot
    * instantiate nested classes). */
  def udafFor(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MisraGriesAgg(k))
}

class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "MisraGries needs a positive capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], term: String): Map[String, Long] = {
    if (term == null) buf
    else buf.get(term) match {
      case Some(c) => buf.updated(term, c + 1)
      case None if buf.size < k => buf.updated(term, 1L)
      // Decrement-all: one unit leaves every counter AND the arriving
      // term — k+1 units of total count per decrement event, which is
      // where the n/(k+1) undercount bound comes from.
      case None =>
        buf.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) }
    if (sum.size <= k) sum
    else {
      // Subtract the (k+1)-th largest counter from everyone: at most k
      // counters stay strictly positive, and the subtraction is
      // charged against distinct input items exactly like reduce's
      // decrement, preserving the n/(k+1) bound (mergeable-summaries
      // argument).
      val d = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      sum.collect { case (t, c) if c > d => t -> (c - d) }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  // ExpressionEncoder keeps the buffer/output as a real
  // map<string,bigint> column (kryo would make it opaque binary).
  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
