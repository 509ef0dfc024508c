package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared token-scan machinery for the lexicon kernels: walk the
  * whitespace tokens of a UTF8String's bytes (exactly as
  * `split(text, " ")` emits them — 0x20 separators, empty tokens kept
  * but unmatchable) and hand each (start, len) slice to a callback. */
private[plans] object TokenScan {
  @inline def forEachToken(bytes: Array[Byte])(f: (Int, Int) => Unit): Unit = {
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        f(start, i - start)
        start = i + 1
      }
      i += 1
    }
  }

  @inline def sliceEquals(bytes: Array[Byte], start: Int, len: Int,
                          w: Array[Byte]): Boolean = {
    if (w.length != len) return false
    var j = 0
    while (j < len && bytes(start + j) == w(j)) j += 1
    j == len
  }
}

/** Hit counts of a document's whitespace tokens against N fixed
  * lexicons in ONE byte pass (array<int>, aligned with `lexicons`) —
  * the tx01/tx34 scorer without the machinery: the composed form runs
  * one interpreted ArrayFilter + array_contains over EVERY token PER
  * LEXICON (five passes for langid) over a split array that exists
  * only to be scanned. Value-exact with
  * `lexiconHits(split(text, " "), lex)` per lexicon: a token counts
  * once per lexicon containing it, byte equality. CodegenFallback:
  * one interpreted call per row is noise next to the per-token
  * interpreted lambda evals it removes (the CdcCutsExpr precedent).
  */
case class LexiconCountsExpr(child: Expression, lexicons: Seq[Seq[String]])
    extends UnaryExpression with CodegenFallback {

  require(lexicons.nonEmpty && lexicons.forall(_.nonEmpty),
    "graft_lexicon_counts needs at least one non-empty lexicon")

  private lazy val lexBytes: Array[Array[Array[Byte]]] =
    lexicons.map(_.map(_.getBytes("UTF-8")).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_lexicon_counts expects string, got $t")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val counts = new Array[Int](lexBytes.length)
    TokenScan.forEachToken(bytes) { (start, len) =>
      if (len > 0) {
        var l = 0
        while (l < lexBytes.length) {
          val lex = lexBytes(l)
          var k = 0
          var hit = false
          while (!hit && k < lex.length) {
            hit = TokenScan.sliceEquals(bytes, start, len, lex(k))
            k += 1
          }
          if (hit) counts(l) += 1
          l += 1
        }
      }
    }
    new GenericArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconCountsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_lexicon_counts"
}

/** The quality scorer's three token statistics in ONE byte pass —
  * struct(n_words, n_stop, n_uniq), value-exact with
  * `size(toks)` / `lexiconHits(toks, lex)` /
  * `size(array_distinct(toks))` over `toks = split(text, " ")`:
  * n_words counts every token (empties included, = 0x20 count + 1),
  * n_stop counts tokens byte-equal to a lexicon word, n_uniq counts
  * byte-distinct tokens (the empty token is a token and counts once
  * when present, exactly as array_distinct keeps one "").
  * Distinctness via an open-addressing table of (hash, start, len)
  * slices over the row's own bytes — exact byte-compare on collision,
  * no string allocation. CodegenFallback: per-row call overhead is
  * noise next to the split array + two interpreted passes + the
  * array_distinct it replaces.
  */
case class TokenStatsExpr(child: Expression, lexicon: Seq[String])
    extends UnaryExpression with CodegenFallback {

  require(lexicon.nonEmpty, "graft_token_stats needs a non-empty lexicon")

  private lazy val lexBytes: Array[Array[Byte]] =
    lexicon.map(_.getBytes("UTF-8")).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_token_stats expects string, got $t")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_uniq", IntegerType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var nWords = 0
    var nStop = 0
    var nUniq = 0
    // open addressing over (start, len) slices; -1 = empty slot
    var cap = 64
    var starts = Array.fill(cap)(-1)
    var lens = new Array[Int](cap)
    var filled = 0
    def hashSlice(start: Int, len: Int): Int = {
      var h = 1
      var j = 0
      while (j < len) { h = h * 31 + bytes(start + j); j += 1 }
      h
    }
    def grow(): Unit = {
      val os = starts; val ol = lens
      cap *= 2
      starts = Array.fill(cap)(-1)
      lens = new Array[Int](cap)
      filled = 0 // reinsertion re-counts occupancy
      var i = 0
      while (i < os.length) {
        if (os(i) >= 0) insert(os(i), ol(i), countNew = false)
        i += 1
      }
    }
    def insert(start: Int, len: Int, countNew: Boolean): Unit = {
      var idx = (hashSlice(start, len) & 0x7FFFFFFF) % cap
      var done = false
      while (!done) {
        if (starts(idx) < 0) {
          starts(idx) = start; lens(idx) = len; filled += 1
          if (countNew) nUniq += 1
          done = true
        } else if (lens(idx) == len && {
          var j = 0
          val s0 = starts(idx)
          while (j < len && bytes(s0 + j) == bytes(start + j)) j += 1
          j == len
        }) {
          done = true // already present
        } else {
          idx += 1; if (idx == cap) idx = 0
        }
      }
      if (filled * 2 > cap) grow()
    }
    TokenScan.forEachToken(bytes) { (start, len) =>
      nWords += 1
      if (len > 0) {
        var k = 0
        var hit = false
        while (!hit && k < lexBytes.length) {
          hit = TokenScan.sliceEquals(bytes, start, len, lexBytes(k))
          k += 1
        }
        if (hit) nStop += 1
      }
      insert(start, len, countNew = true)
    }
    InternalRow(nWords, nStop, nUniq)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_token_stats"
}
