package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders: tokenization, shingling, ratio
  * metrics, fingerprints. All codegen-friendly built-in expressions —
  * no UDFs — so they inline into whole-stage codegen and push work to
  * the scan at any scale.
  *
  * Integer-unit outputs (milli-ratios via integer division) keep
  * results exact and engine-independent (SURVEY.md §5).
  */
object TextFunctions {
  /** Whitespace tokens (testdata is single-space separated ASCII). */
  def tokens(text: Column): Column = split(text, " ")

  /** `size(split(text, " "))` as a zero-allocation byte scan — exact
    * for any string because split keeps empty tokens, so the count is
    * (number of 0x20 bytes) + 1 ([[graft.plans.WordCountExpr]]). Use
    * wherever the token array exists ONLY to be counted. */
  def wordCount(text: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.WordCountExpr(org.apache.spark.sql.graft.bridge.expression(text)))

  /** 16-bit SimHash of a document — native single-pass kernel
    * ([[graft.plans.SimHashSigExpr]]): per-token md5 bit votes with
    * zero explode/shuffle, bit-identical to the composed vote
    * aggregation. */
  def simhashSig(text: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.SimHashSigExpr(org.apache.spark.sql.graft.bridge.expression(text)))

  /** 64-bit SimHash of a document as its four 16-bit pigeonhole bands
    * (array<int>, band 0 = low bits) — the production-scale form with
    * the complete hamming<=3 recall guarantee
    * ([[graft.plans.SimHashBandsExpr]]). */
  def simhashBands(text: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.SimHashBandsExpr(org.apache.spark.sql.graft.bridge.expression(text)))

  /** 128-bit SimHash as four 32-bit pigeonhole bands (array<long>,
    * values < 2^32) — the WIDE form whose band keys do not saturate
    * until ~10^9 docs ([[graft.plans.SimHashWideExpr]]). */
  def simhashWide(text: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.SimHashWideExpr(org.apache.spark.sql.graft.bridge.expression(text)))

  /** Distinct character bigrams of a document with occurrence counts
    * (array<struct<bg, c>>, Σc = len−1) — native single-pass kernel
    * ([[graft.plans.BigramCountsExpr]], the tx08 census): zero
    * allocation per position where the composed transform+explode
    * form allocates one 2-char string per character. */
  def bigramCounts(text: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.BigramCountsExpr(org.apache.spark.sql.graft.bridge.expression(text)))

  /** Content-defined chunk CUT POSITIONS (array<int>, 1-based) — the
    * dd22 boundary rule as a native single-pass rolling hash
    * ([[graft.plans.CdcCutsExpr]]): one multiply/subtract/mod per
    * position, zero allocation, where the composed form md5'd an
    * 8-char substring per character. */
  def cdcCuts(text: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.CdcCutsExpr(org.apache.spark.sql.graft.bridge.expression(text)))

  /** The whole CDC chunking — boundary rule + per-chunk md5 — in one
    * byte pass (array<struct<digest: binary, clen: long>>,
    * [[graft.plans.CdcChunksExpr]]): digests are a bijection of the
    * composed `md5(substr(..))` hex strings (binary16 instead of
    * 32-char hex), so chunk-domain group-bys/joins are value-identical
    * while the exchanges carry half the key bytes. */
  def cdcChunks(text: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.CdcChunksExpr(org.apache.spark.sql.graft.bridge.expression(text)))

  /** xxhash64 of every word k-gram window, hashed straight from the
    * word bytes ([[graft.plans.WordGramHashesExpr]]) — value-exact
    * with `transform(grams5(words), g => xxhash64(g))` but the gram
    * string never exists. Docs shorter than k words yield an empty
    * array (the grams5 guard). */
  def gramHashes(words: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.WordGramHashesExpr(
        org.apache.spark.sql.graft.bridge.expression(words), k))

  /** Per-row frequencies of a fixed term list over the whitespace
    * tokens of `text` (array<int> aligned with `terms`) in one byte
    * pass ([[graft.plans.TermCountsExpr]]) — the tf scan of tx22/tx23
    * without the split/filter/explode/agg machinery. Pass the
    * already-lowered text to match `split(lower(text), " ")`. */
  def termCounts(text: Column, terms: Seq[String]): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.TermCountsExpr(
        org.apache.spark.sql.graft.bridge.expression(text), terms))

  /** Hit counts of the whitespace tokens against N fixed lexicons in
    * one byte pass (array<int> aligned with `lexicons`,
    * [[graft.plans.LexiconCountsExpr]]) — value-exact with
    * `lexiconHits(tokens(text), lex)` per lexicon, no split array, no
    * per-token interpreted filter. */
  def lexiconCounts(text: Column, lexicons: Seq[Seq[String]]): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.LexiconCountsExpr(
        org.apache.spark.sql.graft.bridge.expression(text), lexicons))

  /** struct(n_words, n_stop, n_uniq, top_cnt, top_word, n_bigrams,
    * n_uniq_bigrams) of the whitespace tokens in one byte pass
    * ([[graft.plans.TokenProfileExpr]]) — value-exact with the
    * composed split/filter/array_distinct/modal-window/bigram-join
    * forms across qualityScored, gopherAgg, tx10 and px03. */
  def tokenProfile(text: Column, lexicon: Seq[String]): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.TokenProfileExpr(
        org.apache.spark.sql.graft.bridge.expression(text), lexicon))

  /** 16-byte md5 digests of every word k-gram window, hashed straight
    * from the text bytes ([[graft.plans.WordGramMd5Expr]]) — a
    * BIJECTION of `md5(explode(shingles(tokens(text), k)))` (same md5,
    * binary instead of hex; same whole-document degenerate gram), so
    * distinct/group-by/count structure downstream is value-identical
    * while the words array, the interpreted shingle transform and the
    * per-window gram/hex strings never exist. */
  def gramMd5(text: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.WordGramMd5Expr(org.apache.spark.sql.graft.bridge.expression(text), k))

  /** xxhash64 of every word k-gram window hashed straight from the
    * text bytes, INCLUDING the whole-document degenerate gram
    * ([[graft.plans.WordGramXxhTextExpr]]) — value-exact with
    * `transform(shingles(tokens(text), k), xxhash64)`; set sizes on
    * the longs equal the string-set sizes up to the documented
    * P ~ n²/2^65 collision trade. */
  def gramXxh(text: Column, k: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.plans.WordGramXxhTextExpr(org.apache.spark.sql.graft.bridge.expression(text), k))

  /** Word k-shingles joined by single spaces; documents shorter than k
    * words degenerate to one whole-document shingle (keeps the result
    * total, so no emptiness filter — and no filter means Catalyst never
    * re-inlines this expression into a pushed-down predicate, which
    * would double the per-row work). 1-based indexing matches DuckDB.
    */
  def shingles(words: Column, k: Int): Column =
    when(size(words) >= k,
      transform(sequence(lit(1), size(words) - lit(k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(words, i + lit(j))): _*)))
      .otherwise(array(concat_ws(" ", words)))

  /** Count of tokens that appear in a fixed lexicon. */
  def lexiconHits(toks: Column, lexicon: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(lexicon.map(lit): _*), t)))

  /** Count of chars matching a regex char-class, via the length-diff
    * trick (identical semantics in Spark and DuckDB). */
  def charClassCount(text: Column, charClass: String): Column =
    length(text) - length(regexp_replace(text, charClass, ""))

  /** MinHash signature value for permutation `p`: the minimum md5 of
    * salted shingles — md5 is bit-identical across engines and min on
    * hex strings is plain ASCII ordering, so signatures are exact.
    * (Stand-in for ella-style hashed sketches with zero FP content.)
    */
  def minhash(shingleCol: Column, p: Int): Column =
    array_min(transform(shingleCol, sh => md5(concat(lit(s"$p:"), sh))))

  /** LSH band key for rows r..r+width-1 of a minhash signature array. */
  /** BINARY 16-byte key (unhex of the md5 hex — a bijection, so every
    * join/distinct/group-by on it is value-identical) rather than the
    * 32-char hex string: the band self-join is the dedup family's
    * hottest exchange and the key is its widest column (guide §2.3
    * "narrower types"). String consumers (the streaming gate's stored
    * `bk`) re-derive the hex via lower(hex(.)). */
  def bandKey(sig: Column, start: Int, width: Int): Column =
    unhex(md5(concat_ws("|", (start until start + width).map(i => element_at(sig, lit(i + 1))): _*)))
}
