package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-pipeline text analysis over `documents`: language ID, quality
  * scoring, token counting, fingerprinting, exact dedup. These extend
  * the reference's surface toward training-data curation (SURVEY.md §2).
  *
  * Everything is narrow projections + per-row expressions: fully
  * parallel, no shuffle except the final aggregations; at 100 TB these
  * run at scan speed with column pruning (only `doc_id`,`text` read).
  */
object TextOps {
  private[graft] val langLex: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "los", "las", "y", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("zh1", "zh2", "zh3", "zh4", "zh5"))

  private def docs(s: SparkSession, d: String): DataFrame = Tables(s, d, "documents")

  /** The tx08 kernel over any (doc_id, text) frame, shared with
    * tx32's tier report: per-doc CCNet-style character-bigram LM
    * score (mean corpus-frequency of the doc's bigrams in ppm,
    * integer-exact). Per-doc DISTINCT-bigram census from the native
    * single-pass kernel (plans/BigramCountsExpr — Σc = len−1 exactly,
    * so every derived total equals the raw-explode form's): the
    * explode and the frequency join carry ~0.3 rows per character
    * instead of 1, and the census pass allocates nothing per position
    * where the composed transform allocated one 2-char string per
    * char (measured 4.9x at the 64x blowup vs the token family's
    * 1.0-1.4x; native form 1.5x). The bigram-DOMAIN counts frame is
    * checkpointed (≤ |charset|² rows — tiny): it feeds both the total
    * and the frequency table, and without truncation each subtree
    * re-runs the corpus census+agg — the pre-r15 plan read THREE
    * corpus scans where two suffice (the autocorrOf DAG rule; the
    * doc-side scoring scan is inherently separate). Docs shorter than
    * 2 chars have no bigrams and drop, as in the oracle. */
  private[graft] def bigramLmScores(docDf: DataFrame): DataFrame = {
    // `db` feeds BOTH the corpus census (via an exchange) and the
    // broadcast-join PROBE side (no exchange), so the bigram kernel +
    // explode run twice per corpus. A lazy localCheckpoint of this
    // frame was BUILT AND REVERTED (r14): it won at sf0.1 (tx14 0.55x
    // at matched sentinel) but measured ~3x WORSE at the 64x blowup
    // (tx14 19.4 -> 7.0 s, tx32 18.4 -> 5.8 s without it) —
    // materializing a token-scale frame to block storage costs more
    // at scale than re-running the zero-allocation census kernel,
    // and the scale endpoint is the number that matters at 100 TB.
    val db = Tables.spread(docDf)
      .select(col("doc_id"),
        explode(bigramCounts(lower(col("text")))).as("e"))
      .select(col("doc_id"), col("e.bg").as("bg"), col("e.c").as("c"))
    val corpus = db.groupBy(col("bg")).agg(sum(col("c")).as("cnt"))
      .localCheckpoint(false)
    val total = corpus.agg(sum(col("cnt")).as("tot"))
    val freq = corpus.crossJoin(broadcast(total))
      .select(col("bg"), expr("(cnt * 1000000) DIV tot").as("freq_ppm"))
    db.join(broadcast(freq), "bg")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        sum(col("freq_ppm") * col("c")).as("sum_ppm"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("sum_ppm DIV n_bigrams").as("lm_score_ppm"))
  }

  /** The tx32 kernel over any (doc_id, text, source) frame, shared
    * with [[graft.api]]'s `pplTiers` verb: CCNet-style head/middle/
    * tail tiers by GLOBAL terciles of the bigram-LM score, reported
    * per (source, tier). Tercile CUTOFFS come from an integer score
    * histogram (the ts35 cum-count kernel — engine-exact,
    * deterministic under ties), never a global ntile (which would
    * single-partition-sort the corpus). Scale shape: the tx08
    * kernel's two corpus scans; the per-doc score frame is
    * checkpointed (doc-domain, two consumers: histogram + tier
    * join); the doc-keyed source join co-shuffles corpus rows once
    * per side; cutoffs and source totals broadcast. */
  private[graft] def pplTiersOf(docDf: DataFrame): DataFrame = {
    val scored = bigramLmScores(docDf)
      .select(col("doc_id"), col("lm_score_ppm"))
      .localCheckpoint(false)
    val cuts = TimeSeries.histQuantilesOf(
        scored.select(lit("all").as("key"), col("lm_score_ppm").as("cents"))
          .groupBy(col("key"), col("cents")).agg(count(lit(1)).as("cnt")),
        Seq(333, 667))
      .groupBy(col("key"))
      .agg(min(when(col("q_milli") === 333, col("cents"))).as("c333"),
        min(when(col("q_milli") === 667, col("cents"))).as("c667"))
      .drop("key")
    val meta = docDf.select(col("doc_id"), col("source"),
      wordCount(col("text")).cast("long").as("n_tok"))
    val srctot = meta.groupBy(col("source")).agg(sum(col("n_tok")).as("st"))
    scored.join(meta, "doc_id")
      .crossJoin(broadcast(cuts))
      .withColumn("tier",
        when(col("lm_score_ppm") <= col("c333"), lit("tail"))
          .when(col("lm_score_ppm") <= col("c667"), lit("middle"))
          .otherwise(lit("head")))
      .groupBy(col("source"), col("tier"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(col("lm_score_ppm")).as("sum_score"))
      .join(broadcast(srctot), "source")
      .select(col("source"), col("tier"), col("n_docs"), col("n_tokens"),
        expr("sum_score DIV n_docs").as("mean_score_ppm"),
        expr("(n_tokens * 1000) DIV st").as("tok_share_milli"))
  }

  /** tx39's kernel over any (doc_id, text) frame — shared with
    * [[graft.api]]'s `codeDetect` verb. See the registration comment
    * for the routing-gate rationale; per-row regex folds only. */
  private[graft] def codeDetectOf(docDf: DataFrame): DataFrame =
    docDf
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("n_words", size(tokens(col("text"))).cast("long"))
      .withColumn("n_sym",
        regexp_count(col("text"), lit("[{}()\\[\\];=+*<>|&]")).cast("long"))
      .withColumn("n_camel",
        regexp_count(col("text"), lit("[a-z][A-Z]")).cast("long"))
      .withColumn("n_snake",
        regexp_count(col("text"), lit("_")).cast("long"))
      .withColumn("sym_milli", expr("(n_sym * 1000) DIV n_chars"))
      .withColumn("ident_milli",
        expr("((n_camel + n_snake) * 1000) DIV n_words"))
      .withColumn("code_milli", expr("(sym_milli * 2 + ident_milli) DIV 3"))
      .select(col("doc_id"), col("n_chars"), col("n_words"), col("n_sym"),
        col("n_camel"), col("n_snake"), col("sym_milli"),
        col("ident_milli"), col("code_milli"),
        (col("code_milli") >= 40L).as("is_code"))
      .orderBy(col("doc_id"))

  /** tx37's kernel over any (source, text) frame — shared with
    * [[graft.api]]'s `stopwordProfile` verb. See the registration
    * comment for the stylometric rationale and scale shape. */
  private[graft] def stopwordProfileOf(docDf: DataFrame): DataFrame = {
    val ws = langLex.values.flatten.toSeq.distinct.sorted
    // all 25 stopword counts in ONE native byte pass (TermCountsExpr)
    // — the composed form ran one interpreted ArrayFilter over every
    // token PER WORD (25 passes per row) over a split array that
    // existed only to be scanned
    val base = docDf
      .withColumn("_cs", termCounts(col("text"), ws))
      .withColumn("n_toks", wordCount(col("text")).cast("long"))
    val counted = ws.zipWithIndex.foldLeft(base) { case (df, (w, i)) =>
      df.withColumn(s"_c$i", element_at(col("_cs"), i + 1).cast("long"))
    }
    val agged = counted.groupBy(col("source"))
      .agg(sum(col("n_toks")).as("src_toks"),
        ws.indices.map(i => sum(col(s"_c$i")).as(s"_s$i")): _*)
      .localCheckpoint(false)
    val tot = agged.agg(sum(col("src_toks")).as("all_toks"))
    val stacked = agged
      .select(col("source"), col("src_toks"),
        posexplode(array(ws.indices.map(i => col(s"_s$i")): _*)))
      .select(col("source"), col("src_toks"),
        element_at(array(ws.map(lit): _*), col("pos") + 1).as("word"),
        col("col").as("cnt"))
    val wtot = stacked.groupBy(col("word")).agg(sum(col("cnt")).as("wt"))
    stacked.join(broadcast(wtot), "word")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("word"), col("cnt"),
        expr("(cnt * 1000000) DIV src_toks").as("share_ppm"),
        expr("(wt * 1000000) DIV all_toks").as("corpus_ppm"),
        expr("(cnt * 1000000) DIV src_toks - (wt * 1000000) DIV all_toks")
          .as("dev_ppm"))
      .orderBy(col("source"), col("word"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Language ID: stopword-lexicon hit counts, max score wins with
    // alphabetical tiebreak (implemented as ordered >= cascade).
    "tx01_langid" -> ((s, d) => {
      // all five lexicon scores in ONE native byte pass (no split
      // array, no per-token interpreted filter per lexicon) — value-
      // exact with lexiconHits(tokens(text), lex), spec-pinned
      val langs = langLex.keys.toSeq.sorted
      val base = docs(s, d).withColumn("_lc",
        lexiconCounts(col("text"), langs.map(langLex)))
      val scored = langs.zipWithIndex.foldLeft(base) { case (df, (lang, i)) =>
        df.withColumn(s"s_$lang", element_at(col("_lc"), i + 1))
      }
      scored.withColumn("predicted",
          when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es") &&
               col("s_de") >= col("s_fr") && col("s_de") >= col("s_zh"), "de")
          .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") &&
                col("s_en") >= col("s_zh"), "en")
          .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_zh"), "es")
          .when(col("s_fr") >= col("s_zh"), "fr")
          .otherwise("zh"))
        .withColumn("is_correct", col("predicted") === col("lang"))
        .select(col("doc_id"), col("s_de"), col("s_en"), col("s_es"), col("s_fr"), col("s_zh"),
          col("predicted"), col("lang"), col("is_correct"))
        .orderBy(col("doc_id"))
    }),

    // LANGUAGE CONFUSION MATRIX — the declared-vs-detected audit
    // (mm05's text twin: that one catches files lying about their
    // format, this catches docs lying about their language — the
    // "0.3% of the crawl is mislabeled" table every multilingual
    // pipeline publishes before routing docs to per-language
    // pipelines): tx01's lexicon scorer predicts each doc's language,
    // the rollup reports per (declared, predicted) cell the doc
    // count, the row share of the declared language in milli, and
    // the diagonal flag. Scale shape: scoring is per-row at scan
    // speed (five lexicon folds), ONE partial-agg'd shuffle into the
    // |langs|² domain, per-language totals broadcast back.
    "tx34_lang_confusion" -> ((s, d) => {
      // tx01's one-pass native scorer (see there)
      val langs = langLex.keys.toSeq.sorted
      val base = docs(s, d).withColumn("_lc",
        lexiconCounts(col("text"), langs.map(langLex)))
      val scored = langs.zipWithIndex.foldLeft(base) { case (df, (lang, i)) =>
        df.withColumn(s"s_$lang", element_at(col("_lc"), i + 1))
      }
      val pred = scored.withColumn("predicted",
        when(col("s_de") >= col("s_en") && col("s_de") >= col("s_es") &&
             col("s_de") >= col("s_fr") && col("s_de") >= col("s_zh"), "de")
          .when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") &&
                col("s_en") >= col("s_zh"), "en")
          .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_zh"), "es")
          .when(col("s_fr") >= col("s_zh"), "fr")
          .otherwise("zh"))
      val m = pred.groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n_docs"))
      val tot = m.groupBy(col("lang")).agg(sum(col("n_docs")).as("lt"))
      m.join(broadcast(tot), "lang")
        .select(col("lang"), col("predicted"), col("n_docs"),
          expr("(n_docs * 1000) DIV lt").as("share_milli"),
          (col("lang") === col("predicted")).as("is_diag"))
        .orderBy(col("lang"), col("predicted"))
    }),

    // Quality scoring: integer milli-ratios (exact) of stopword rate,
    // word length, punctuation, plus a composite score.
    "tx02_quality" -> ((s, d) => {
      docs(s, d)
        .withColumn("len_chars", length(col("text")))
        .withColumn("n_words", wordCount(col("text")))
        .withColumn("n_stop",
          element_at(lexiconCounts(col("text"), Seq(langLex("en"))), 1))
        .withColumn("n_punct", charClassCount(col("text"), "[.!?,;:]"))
        .withColumn("awl_milli", expr("(CAST(len_chars - n_words + 1 AS BIGINT) * 1000) DIV n_words"))
        .withColumn("stop_milli", expr("(CAST(n_stop AS BIGINT) * 1000) DIV n_words"))
        .withColumn("punct_milli", expr("(CAST(n_punct AS BIGINT) * 1000) DIV len_chars"))
        .withColumn("quality_milli", expr(
          "(stop_milli * 2 + (CASE WHEN n_words BETWEEN 50 AND 200 THEN 1000 ELSE 0 END) + " +
          "(CASE WHEN awl_milli BETWEEN 3000 AND 8000 THEN 1000 ELSE 0 END)) DIV 4"))
        .select(col("doc_id"), col("len_chars"), col("n_words"), col("n_stop"),
          col("n_punct"), col("awl_milli"), col("stop_milli"), col("punct_milli"), col("quality_milli"))
        .orderBy(col("doc_id"))
    }),

    // Token counting: whitespace tokens + BPE-ish regex token count.
    "tx03_tokens" -> ((s, d) => {
      docs(s, d)
        .withColumn("toks", tokens(col("text")))
        .withColumn("n_ws_tokens", size(col("toks")))
        .withColumn("n_unique_tokens", size(array_distinct(col("toks"))))
        .withColumn("n_bpe_tokens", regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")))
        .withColumn("chars_per_token_milli", expr("(CAST(length(text) AS BIGINT) * 1000) DIV n_ws_tokens"))
        .select(col("doc_id"), col("n_ws_tokens"), col("n_unique_tokens"),
          col("n_bpe_tokens"), col("chars_per_token_milli"))
        .orderBy(col("doc_id"))
    }),

    // Content fingerprinting: md5 of normalized text + shingle stats.
    "tx04_fingerprint" -> ((s, d) => {
      Tables.spread(docs(s, d))
        .withColumn("norm", lower(trim(regexp_replace(col("text"), "\\s+", " "))))
        .withColumn("fp", md5(col("norm")))
        .withColumn("words", tokens(col("norm")))
        .withColumn("sh", shingles(col("words"), 3))
        .select(col("doc_id"), substring(col("fp"), 1, 8).as("fp8"),
          size(col("sh")).as("n_shingles"),
          size(array_distinct(col("sh"))).as("n_unique_shingles"),
          when(size(col("sh")) > 0, element_at(col("sh"), 1)).otherwise(lit(null)).as("first_shingle"))
        .orderBy(col("doc_id"))
    }),

    // Character-bigram profile: the n-gram language-model heuristic —
    // per doc: distinct bigram count + modal bigram (ties break
    // lexicographically). PER-ROW since r11: a doc's bigram profile
    // needs nothing from any other doc, so the r9 explode + (doc, bg)
    // agg + per-doc rank window — two corpus-sized bigram exchanges —
    // was pure overhead AND the plan class the I/O-contention axis
    // kept distorting (the tx05 bench watch: 2.0-2.5x readings in
    // otherwise-quiet windows). Now: sort the doc's own bigram array
    // and fold its runs — the FIRST longest run in ascending order is
    // exactly the (count desc, bigram asc) winner — at scan speed with
    // ZERO exchanges before the output sort; identical output, same
    // oracle. Docs shorter than 2 chars drop (parity with the old
    // explode and DuckDB's unnest of an empty list).
    "tx05_char_ngrams" -> ((s, d) => {
      val acc0 = struct(lit("").as("b"), lit(0L).as("bc"),
        lit("").as("c"), lit(0L).as("cc"))
      val top = aggregate(array_sort(col("bgs")), acc0,
        (a, x) => when(x === a.getField("c"),
          struct(a.getField("b").as("b"), a.getField("bc").as("bc"),
            a.getField("c").as("c"), (a.getField("cc") + 1L).as("cc")))
          .otherwise(struct(
            when(a.getField("cc") > a.getField("bc"), a.getField("c"))
              .otherwise(a.getField("b")).as("b"),
            when(a.getField("cc") > a.getField("bc"), a.getField("cc"))
              .otherwise(a.getField("bc")).as("bc"),
            x.as("c"), lit(1L).as("cc"))),
        a => struct(
          when(a.getField("cc") > a.getField("bc"), a.getField("c"))
            .otherwise(a.getField("b")).as("bg"),
          when(a.getField("cc") > a.getField("bc"), a.getField("cc"))
            .otherwise(a.getField("bc")).as("cnt")))
      Tables.spread(docs(s, d))
        .withColumn("norm", lower(col("text")))
        .filter(length(col("norm")) >= 2)
        .withColumn("bgs", transform(sequence(lit(1), length(col("norm")) - 1),
          i => col("norm").substr(i, lit(2))))
        .withColumn("_top", top)
        .select(col("doc_id"),
          size(array_distinct(col("bgs"))).cast("long").as("n_distinct_bigrams"),
          col("_top.bg").as("top_bigram"), col("_top.cnt").as("top_count"))
        .orderBy(col("doc_id"))
    }),

    // LEXICAL DIVERSITY — per-doc type-token ratio + hapax-legomenon
    // ratio (the vocabulary-richness quality signal next to tx02's
    // surface stats and tx10's repetition: templated/spun text reads
    // LOW ttr, keyboard-mash and OCR noise read HIGH hapax — both are
    // standard curation gates). PER-ROW like tx05: a doc's diversity
    // needs nothing from other docs, so the distinct/hapax counts fold
    // over the doc's own sorted token array (run-length fold: each
    // run = one distinct type, runs of length 1 = hapaxes) at scan
    // speed — ZERO exchanges before the output sort, never an
    // explode + (doc, word) agg. Integer milli throughout (n_words,
    // n_distinct >= 1 always: split of "" is [""]).
    "tx28_lexical_diversity" -> ((s, d) => {
      // distinct + hapax counts off the one-pass native token profile
      // (TokenProfileExpr) — replaces the per-row array_sort + the
      // interpreted run-length fold; value-exact (nd = #distinct,
      // nh = #runs of length 1 over sorted tokens = #count-1 tokens)
      Tables.spread(docs(s, d))
        .withColumn("_tp", tokenProfile(col("text"), Seq.empty))
        .withColumn("n_words", col("_tp").getField("n_words").cast("long"))
        .select(col("doc_id"), col("n_words"),
          col("_tp").getField("n_uniq").cast("long").as("n_distinct"),
          col("_tp").getField("n_hapax").cast("long").as("n_hapax"),
          expr("(CAST(_tp.n_uniq AS BIGINT) * 1000) DIV n_words").as("ttr_milli"),
          expr("(CAST(_tp.n_hapax AS BIGINT) * 1000) DIV _tp.n_uniq").as("hapax_milli"))
        .orderBy(col("doc_id"))
    }),

    // SIMPSON REPEAT-CONCENTRATION per doc (Simpson 1949 — Σ p_w² as
    // an integer ppm; the inverse is the "effective vocabulary size"):
    // the whole-distribution repetition ablation next to tx10's
    // modal-word fraction (a doc spreading its repeats across many
    // words hides from the modal rule but not from Σp²) and tx28's
    // distinct-count TTR (which is blind to HOW the mass distributes).
    // ENGINE-EXACT: Σ cnt_w² · 10⁶ DIV n_words² — pure integer (long
    // bound: docs to ~10⁶ tokens give Σcnt² ≤ 10¹² and ×10⁶ stays
    // under 2⁶³). Scale shape: the tx05/tx28 zero-exchange pattern —
    // a per-row run-length fold over the doc's own sorted tokens
    // accumulates Σ run² at scan speed; never an explode + per-doc
    // agg shuffle.
    "tx36_simpson" -> ((s, d) => {
      // Σ cnt² off the one-pass native token profile (TokenProfileExpr)
      // — replaces the per-row array_sort + interpreted run-length
      // fold; value-exact (Σ run² over sorted tokens = Σ count²)
      Tables.spread(docs(s, d))
        .withColumn("_tp", tokenProfile(col("text"), Seq.empty))
        .withColumn("n_words", col("_tp").getField("n_words").cast("long"))
        .withColumn("sum_sq", col("_tp").getField("sum_sq"))
        .select(col("doc_id"), col("n_words"), col("sum_sq"),
          expr("(sum_sq * 1000000) DIV (n_words * n_words)").as("simpson_ppm"))
        .orderBy(col("doc_id"))
    }),

    // STOPWORD / FUNCTION-WORD PROFILE per source — the stylometric
    // source fingerprint (Mosteller & Wallace 1964's function-word
    // method, the authorship classic): content words vary by topic
    // but function-word RATES are stable per register, so a source
    // whose profile deviates hard from the corpus is machine
    // boilerplate, template spam, or a different genre than it
    // claims. Per (source, function-word): the count, the source's
    // rate ppm, the corpus rate ppm, and the deviation — the table a
    // curation run reads before trusting a crawl's self-description
    // (tx34 audits the LANGUAGE label; this audits the REGISTER).
    // ENGINE-EXACT integer ppm. Scale shape: the 25 lexicon counts
    // are per-row array folds at scan speed (no explode — the corpus
    // never hits the wire as tokens), ONE map-side-combinable shuffle
    // collapses to the |S|-row frame (checkpointed: the word stack,
    // the corpus total, and the per-word rollup all read it), and
    // everything downstream runs on the S×25 domain with two
    // broadcast joins.
    "tx37_stopword_profile" -> ((s, d) => stopwordProfileOf(docs(s, d))),

    // READABILITY scores — Flesch reading ease + Flesch-Kincaid grade
    // with an integer syllable heuristic (vowel-group runs [aeiouy]+,
    // the standard cheap estimator), sentences = [.!?]+ runs floored
    // at 1: the grade-level quality gate next to tx02's surface stats
    // (curation pipelines band corpora by readability for curriculum
    // mixing). ENGINE-EXACT: the classic coefficients scale to milli
    // integers (0.39 -> 390 etc.); each division has positive
    // operands so both engines floor identically, and the final
    // subtractions are exact. Per-row regexp counts at scan speed —
    // zero exchanges before the output sort.
    "tx29_readability" -> ((s, d) => {
      docs(s, d)
        .withColumn("n_words", size(tokens(col("text"))).cast("long"))
        .withColumn("n_sentences",
          greatest(lit(1L), regexp_count(col("text"), lit("[.!?]+")).cast("long")))
        .withColumn("n_syllables",
          regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long"))
        .select(col("doc_id"), col("n_words"), col("n_sentences"), col("n_syllables"),
          expr("(390 * n_words) DIV n_sentences + (11800 * n_syllables) DIV n_words - 15590")
            .as("fk_grade_milli"),
          expr("206835 - (1015 * n_words) DIV n_sentences - (84600 * n_syllables) DIV n_words")
            .as("ease_milli"))
        .orderBy(col("doc_id"))
    }),

    // CODE-vs-PROSE DETECTOR — the routing gate every mixed-corpus
    // pipeline runs before text curation (code must not die to prose
    // rules: Gopher's word-length and stopword gates kill source
    // files wholesale, so StarCoder/RedPajama-style pipelines fork
    // code OFF first): per doc the code-shaped signal counts —
    // bracket/operator symbols, camelCase and snake_case
    // identifiers — folded to an integer-milli score (symbol rate
    // per char doubled + identifier rate per word, DIV 3) and the
    // route flag at ≥ 40 milli. ENGINE-EXACT: regexp_count chains
    // (the tx29 discipline), pure integer arithmetic. Scale shape:
    // per-row regex folds at scan speed — zero exchanges before the
    // output sort (the tx07/tx29 class).
    "tx39_code_detect" -> ((s, d) => codeDetectOf(docs(s, d))),

    // Distinctive-term extraction per source — tf-idf shape with a
    // LOG-FREE idf: score = tf * n_sources * 1000 / df via integer
    // division, so both engines produce identical longs (ln() is
    // libm-dependent and hash-unsafe, SURVEY.md §5). r11 structural
    // tightening (the tx05-precedent pass, applied proactively to the
    // bench watchlist): the corpus explodes ONCE — n_src counts
    // sources on the raw documents scan (the old form re-ran the
    // whole token explode just to count distinct sources), and df is
    // a count window over the tf frame instead of a separate agg
    // whose join reshuffled tf a second time. Token-domain work after
    // the tf agg: one tok exchange + one source window.
    "tx06_rare_terms" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val src = docs(s, d)
      val toks = Tables.spread(src)
        .select(col("source"), explode(split(lower(col("text")), " ")).as("tok"))
        .filter(length(col("tok")) > 2)
      val tf = toks.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("tf"))
      val nsrc = src.agg(countDistinct(col("source")).as("n_src"))
      val wDf = Window.partitionBy(col("tok"))
      val w = Window.partitionBy(col("source")).orderBy(col("score_milli").desc, col("tok"))
      tf.withColumn("df", count(lit(1)).over(wDf))
        .crossJoin(broadcast(nsrc))
        .withColumn("score_milli",
          floor((col("tf") * col("n_src") * 1000) / col("df")).cast("long"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("source"), col("rn"), col("tok"), col("score_milli"))
        .orderBy(col("source"), col("rn"))
    }),

    // Char-bigram LM quality score — the CCNet-style "how typical is
    // this text of the corpus" filter, LOG-FREE so it stays
    // engine-exact: corpus bigram frequencies in integer ppm, per-doc
    // score = mean ppm of its bigrams via integer division (a
    // monotone stand-in for mean log-prob; ln() is libm-dependent and
    // hash-unsafe, SURVEY.md §5). Low score = atypical text. Two
    // aggs + one broadcast join of the tiny bigram vocabulary.
    "tx08_bigram_lm" -> ((s, d) =>
      bigramLmScores(docs(s, d)).orderBy(col("doc_id"))),

    // CCNET QUALITY TIERS (Wenzek et al. 2020 — the head/middle/tail
    // split CCNet cuts its corpus into by LM perplexity, the tier
    // label every web-scale pipeline stamps before mixing): docs tier
    // by GLOBAL terciles of the tx08 bigram-LM score (head = most
    // corpus-typical third), reported per (source, tier) with doc/
    // token counts, mean score, and the tier's token share of its
    // source. Tercile CUTOFFS come from an integer score histogram
    // (the ts35 cum-count kernel — smallest score whose cumulative
    // count reaches ceil(q·n/1000), engine-exact integers), NEVER a
    // global ntile: value-based cutoffs are deterministic under ties
    // and the quantile window runs over the score DOMAIN (ppm-bounded
    // at any corpus size) where ntile would single-partition-sort the
    // corpus. Scale shape: the tx08 kernel's two corpus scans; the
    // per-doc score frame is checkpointed (doc-domain, 2 consumers:
    // histogram + tier join); the doc-keyed source join co-shuffles
    // corpus rows once per side; cutoffs and source totals broadcast.
    "tx32_ppl_tiers" -> ((s, d) =>
      pplTiersOf(docs(s, d)).orderBy(col("source"), col("tier"))),

    // PII / pattern scrub: count + redact emails, long digit runs and
    // a dictionary of sensitive terms, emitting the scrubbed-text
    // digest and the length delta — the redaction pass of a
    // training-data pipeline. Pure per-row regexp (scan speed, no
    // shuffle); the patterns stay in the RE2-compatible subset so
    // Spark (Java regex) and DuckDB (RE2) match identically. The
    // synthetic corpus contains no emails/digit runs (counted 0, still
    // exercised end-to-end); the dictionary terms fire on every doc.
    "tx07_pii_scrub" -> ((s, d) => {
      val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val numPat = "[0-9]{4,}"
      val dictPat = "\\b(customer|value)\\b"
      Tables.spread(docs(s, d))
        .withColumn("scrubbed",
          regexp_replace(regexp_replace(regexp_replace(col("text"),
            emailPat, "<EMAIL>"), numPat, "<NUM>"), dictPat, "<PII>"))
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(emailPat), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("text"), lit(numPat), lit(0))).as("n_longnums"),
          size(regexp_extract_all(col("text"), lit(dictPat), lit(0))).as("n_dict"),
          md5(col("scrubbed")).as("scrub_md5"),
          (length(col("text")) - length(col("scrubbed"))).as("len_delta"))
        .orderBy(col("doc_id"))
    }),

    // Exact dedup: md5 content hash, keep-first (min doc_id) per group.
    // At scale: one hash-partitioned shuffle on the digest.
    "dd01_exact" -> ((s, d) => {
      docs(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
        .orderBy(col("h"))
    })
  )

  private val lexSql: Map[String, String] = langLex.map { case (l, words) =>
    l -> words.map(w => s"'$w'").mkString("[", ", ", "]")
  }

  val oracle: Map[String, String] = Map(
    // tx34: tx01's scorer CTE + the (declared, predicted) rollup with
    // per-declared-language totals.
    "tx34_lang_confusion" -> {
      val scores = langLex.keys.toSeq.sorted.map(l =>
        s" CAST(len(list_filter(string_split(text, ' '), t -> list_contains(${lexSql(l)}, t))) AS INT) AS s_$l").mkString(",\n        |")
      s"""WITH scored AS (
        | SELECT doc_id, lang,
        |$scores
        | FROM documents),
        |pred AS (
        | SELECT lang,
        |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |       WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |       WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS predicted
        | FROM scored),
        |m AS (
        | SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n_docs
        | FROM pred GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS lt FROM m GROUP BY 1)
        |SELECT m.lang, m.predicted, m.n_docs,
        | (m.n_docs * 1000) // t.lt AS share_milli,
        | (m.lang = m.predicted) AS is_diag
        |FROM m JOIN tot t USING (lang)
        |ORDER BY m.lang, m.predicted""".stripMargin
    },
    "tx01_langid" -> {
      val scores = langLex.keys.toSeq.sorted.map(l =>
        s" CAST(len(list_filter(string_split(text, ' '), t -> list_contains(${lexSql(l)}, t))) AS INT) AS s_$l").mkString(",\n        |")
      s"""WITH scored AS (
        | SELECT doc_id, lang,
        |$scores
        | FROM documents)
        |SELECT doc_id, s_de, s_en, s_es, s_fr, s_zh,
        | CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |      WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |      WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |      WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS predicted,
        | lang,
        | (CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |      WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |      WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |      WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END) = lang AS is_correct
        |FROM scored ORDER BY doc_id""".stripMargin
    },
    "tx02_quality" ->
      s"""WITH base AS (
        | SELECT doc_id,
        |  CAST(length(text) AS INT) AS len_chars,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |  CAST(len(list_filter(string_split(text, ' '), t -> list_contains(${lexSql("en")}, t))) AS INT) AS n_stop,
        |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS INT) AS n_punct
        | FROM documents),
        |m AS (
        | SELECT *,
        |  (CAST(len_chars - n_words + 1 AS BIGINT) * 1000) // n_words AS awl_milli,
        |  (CAST(n_stop AS BIGINT) * 1000) // n_words AS stop_milli,
        |  (CAST(n_punct AS BIGINT) * 1000) // len_chars AS punct_milli
        | FROM base)
        |SELECT doc_id, len_chars, n_words, n_stop, n_punct, awl_milli, stop_milli, punct_milli,
        | (stop_milli * 2 + (CASE WHEN n_words BETWEEN 50 AND 200 THEN 1000 ELSE 0 END) +
        |  (CASE WHEN awl_milli BETWEEN 3000 AND 8000 THEN 1000 ELSE 0 END)) // 4 AS quality_milli
        |FROM m ORDER BY doc_id""".stripMargin,
    "tx03_tokens" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
        | CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_unique_tokens,
        | CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_bpe_tokens,
        | (CAST(length(text) AS BIGINT) * 1000) // len(string_split(text, ' ')) AS chars_per_token_milli
        |FROM documents ORDER BY doc_id""".stripMargin,
    "tx04_fingerprint" ->
      """WITH n AS (
        | SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm FROM documents),
        |w AS (
        | SELECT doc_id, md5(norm) AS fp, string_split(norm, ' ') AS words FROM n),
        |sh AS (
        | SELECT doc_id, fp,
        |  CASE WHEN len(words) >= 3 THEN
        |   list_transform(generate_series(1, len(words) - 2),
        |     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
        |  ELSE [array_to_string(words, ' ')] END AS sh
        | FROM w)
        |SELECT doc_id, substr(fp, 1, 8) AS fp8,
        | CAST(len(sh) AS INT) AS n_shingles,
        | CAST(len(list_distinct(sh)) AS INT) AS n_unique_shingles,
        | CASE WHEN len(sh) > 0 THEN sh[1] ELSE NULL END AS first_shingle
        |FROM sh ORDER BY doc_id""".stripMargin,
    "tx05_char_ngrams" ->
      """WITH n AS (SELECT doc_id, lower(text) AS norm FROM documents),
        |bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, length(norm) - 1),
        |  i -> substr(norm, i, 2))) AS bg FROM n),
        |counts AS (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, bg) AS rn
        |           FROM counts)
        |SELECT doc_id, count(*) AS n_distinct_bigrams,
        | max(CASE WHEN rn = 1 THEN bg END) AS top_bigram,
        | CAST(max(CASE WHEN rn = 1 THEN cnt END) AS BIGINT) AS top_count
        |FROM ranked GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "tx28_lexical_diversity" ->
      """WITH w AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        | CAST(count(*) AS BIGINT) AS n_distinct,
        | CAST(count(*) FILTER (c = 1) AS BIGINT) AS n_hapax,
        | (CAST(count(*) AS BIGINT) * 1000) // CAST(sum(c) AS BIGINT) AS ttr_milli,
        | (CAST(count(*) FILTER (c = 1) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT) AS hapax_milli
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // tx36: the oracle pays the explode + per-doc agg the Spark side
    // designs out — Σ cnt² recomputed from the grouped counts.
    "tx36_simpson" ->
      """WITH w AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |c AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        | CAST(sum(c * c) AS BIGINT) AS sum_sq,
        | CAST((CAST(sum(c * c) AS BIGINT) * 1000000)
        |   // (CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT)) AS BIGINT) AS simpson_ppm
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // tx39: same regexp_count chains; both engines count
    // non-overlapping matches left-to-right.
    "tx39_code_detect" ->
      """WITH m AS (
        | SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(len(regexp_extract_all(text, '[{}()\[\];=+*<>|&]')) AS BIGINT) AS n_sym,
        |  CAST(len(regexp_extract_all(text, '[a-z][A-Z]')) AS BIGINT) AS n_camel,
        |  CAST(len(regexp_extract_all(text, '_')) AS BIGINT) AS n_snake
        | FROM documents),
        |s AS (
        | SELECT doc_id, n_chars, n_words, n_sym, n_camel, n_snake,
        |  (n_sym * 1000) // n_chars AS sym_milli,
        |  ((n_camel + n_snake) * 1000) // n_words AS ident_milli
        | FROM m)
        |SELECT doc_id, n_chars, n_words, n_sym, n_camel, n_snake,
        | sym_milli, ident_milli,
        | (sym_milli * 2 + ident_milli) // 3 AS code_milli,
        | (sym_milli * 2 + ident_milli) // 3 >= 40 AS is_code
        |FROM s ORDER BY doc_id""".stripMargin,
    // tx37: same 25-word lexicon, same `//` floor on positive
    // operands as the Spark DIV chain.
    "tx37_stopword_profile" -> {
      val wordList = langLex.values.flatten.toSeq.distinct.sorted
        .map(w => s"'$w'").mkString(", ")
      s"""WITH src AS (
        | SELECT source, string_split(text, ' ') AS toks FROM documents),
        |tot AS (
        | SELECT source, CAST(sum(len(toks)) AS BIGINT) AS src_toks
        | FROM src GROUP BY 1),
        |words AS (SELECT unnest([$wordList]) AS word),
        |cnt AS (
        | SELECT s.source, w.word,
        |  CAST(coalesce(sum(len(list_filter(s.toks, t -> t = w.word))), 0) AS BIGINT) AS cnt
        | FROM src s CROSS JOIN words w GROUP BY 1, 2),
        |alltot AS (SELECT CAST(sum(src_toks) AS BIGINT) AS all_toks FROM tot),
        |wtot AS (SELECT word, CAST(sum(cnt) AS BIGINT) AS wt FROM cnt GROUP BY 1)
        |SELECT c.source, c.word, c.cnt,
        | (c.cnt * 1000000) // t.src_toks AS share_ppm,
        | (w.wt * 1000000) // a.all_toks AS corpus_ppm,
        | (c.cnt * 1000000) // t.src_toks - (w.wt * 1000000) // a.all_toks AS dev_ppm
        |FROM cnt c JOIN tot t USING (source) JOIN wtot w USING (word)
        |CROSS JOIN alltot a
        |ORDER BY source, word""".stripMargin
    },
    "tx29_readability" ->
      """WITH m AS (
        | SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  greatest(CAST(1 AS BIGINT),
        |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
        | FROM documents)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        | (390 * n_words) // n_sentences + (11800 * n_syllables) // n_words - 15590 AS fk_grade_milli,
        | 206835 - (1015 * n_words) // n_sentences - (84600 * n_syllables) // n_words AS ease_milli
        |FROM m ORDER BY doc_id""".stripMargin,
    "tx06_rare_terms" ->
      """WITH toks AS (
        | SELECT source, unnest(string_split(lower(text), ' ')) AS tok
        | FROM documents),
        |ft AS (SELECT source, tok FROM toks WHERE length(tok) > 2),
        |tf AS (SELECT source, tok, count(*) AS tf FROM ft GROUP BY 1, 2),
        |tfd AS (SELECT source, tok, tf, count(*) OVER (PARTITION BY tok) AS df FROM tf),
        |nsrc AS (SELECT count(DISTINCT source) AS n_src FROM documents),
        |scored AS (
        | SELECT tfd.source, tfd.tok,
        |  CAST(floor((tfd.tf * nsrc.n_src * 1000) / tfd.df) AS BIGINT) AS score_milli
        | FROM tfd CROSS JOIN nsrc),
        |ranked AS (
        | SELECT *, CAST(row_number() OVER
        |   (PARTITION BY source ORDER BY score_milli DESC, tok) AS INT) AS rn
        | FROM scored)
        |SELECT source, rn, tok, score_milli FROM ranked WHERE rn <= 3
        |ORDER BY source, rn""".stripMargin,
    "dd01_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin,
    "tx08_bigram_lm" ->
      """WITH bg AS (
        | SELECT doc_id, unnest(list_transform(generate_series(1, len(lower(text)) - 1),
        |   i -> substr(lower(text), i, 2))) AS bg
        | FROM documents WHERE len(text) >= 2),
        |corpus AS (SELECT bg, count(*) AS cnt FROM bg GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM corpus),
        |freq AS (SELECT bg, (cnt * 1000000) // tot AS freq_ppm FROM corpus, tot)
        |SELECT b.doc_id, count(*) AS n_bigrams,
        | CAST(sum(f.freq_ppm) // count(*) AS BIGINT) AS lm_score_ppm
        |FROM bg b JOIN freq f USING (bg)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "tx32_ppl_tiers" ->
      """WITH bg AS (
        | SELECT doc_id, unnest(list_transform(generate_series(1, len(lower(text)) - 1),
        |   i -> substr(lower(text), i, 2))) AS bg
        | FROM documents WHERE len(text) >= 2),
        |corpus AS (SELECT bg, count(*) AS cnt FROM bg GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM corpus),
        |freq AS (SELECT bg, (cnt * 1000000) // tot AS freq_ppm FROM corpus, tot),
        |scored AS (
        | SELECT b.doc_id, CAST(sum(f.freq_ppm) // count(*) AS BIGINT) AS s
        | FROM bg b JOIN freq f USING (bg) GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
        |hist AS (SELECT s, count(*) AS c FROM scored GROUP BY 1),
        |cum AS (SELECT s, sum(c) OVER (ORDER BY s) AS cum FROM hist),
        |cuts AS (
        | SELECT min(CASE WHEN cum * 1000 >= n * 333 THEN s END) AS c333,
        |        min(CASE WHEN cum * 1000 >= n * 667 THEN s END) AS c667
        | FROM cum, n),
        |meta AS (
        | SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        | FROM documents),
        |srctot AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS st FROM meta GROUP BY 1),
        |tiered AS (
        | SELECT m.source, m.n_tok, sc.s,
        |  CASE WHEN sc.s <= c333 THEN 'tail'
        |       WHEN sc.s <= c667 THEN 'middle' ELSE 'head' END AS tier
        | FROM scored sc JOIN meta m USING (doc_id), cuts)
        |SELECT t.source, t.tier, count(*) AS n_docs,
        | CAST(sum(t.n_tok) AS BIGINT) AS n_tokens,
        | CAST(sum(t.s) // count(*) AS BIGINT) AS mean_score_ppm,
        | CAST(sum(t.n_tok) * 1000 // max(st.st) AS BIGINT) AS tok_share_milli
        |FROM tiered t JOIN srctot st USING (source)
        |GROUP BY 1, 2 ORDER BY source, tier""".stripMargin,
    "tx07_pii_scrub" ->
      """WITH s AS (
        | SELECT doc_id, text,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{4,}', '<NUM>', 'g'),
        |    '\b(customer|value)\b', '<PII>', 'g') AS scrubbed
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        | CAST(len(regexp_extract_all(text, '[0-9]{4,}')) AS INT) AS n_longnums,
        | CAST(len(regexp_extract_all(text, '\b(customer|value)\b')) AS INT) AS n_dict,
        | md5(scrubbed) AS scrub_md5,
        | CAST(length(text) AS INT) - CAST(length(scrubbed) AS INT) AS len_delta
        |FROM s ORDER BY doc_id""".stripMargin
  )
}
