package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions.wordCount
import org.apache.spark.sql.functions._

/** Corpus-curation operators over `documents` — the quality-filter /
  * decontamination / vocabulary layer of an LLM training-data pipeline
  * (RefinedWeb / Gopher / CCNet-style rules), complementing the
  * dedup (dd) and sampling (sp/px) families.
  *
  * Everything stays engine-exact (SURVEY.md §5): ratios are integer
  * milli-fractions via DIV, the only floating op is IEEE `sqrt` of an
  * integer (correctly rounded by both engines, unlike ln/exp), and
  * word 5-grams are plain string joins both engines reproduce.
  */
object Curation {
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.spread(Tables(s, d, "documents"))

  /** Word 5-gram instances of a lowercase word array: position-ordered
    * `array_join(words[i..i+4])`. Spark's `sequence(1, 0)` is a
    * DESCENDING [1,0] while DuckDB's generate_series(1,0) is empty, so
    * short docs are guarded to an explicit empty array (same fix as
    * tx05/tx08). */
  private[graft] def grams5(words: Column): Column =
    when(size(words) >= 5,
      transform(sequence(lit(1), size(words) - 4),
        i => array_join(slice(words, i, lit(5)), " ")))
      .otherwise(typedLit(Seq.empty[String]))

  /** keep-cols + exploded 5-grams with the token array MATERIALIZED
    * in its own projection first: inlined, grams5's lambda would
    * re-split the text once per gram element — O(n²/5) per doc in
    * interpreted HOF eval (the dd16 inlining hazard, SCALE.md r8;
    * invisible at 50-word bench docs, 100x at 10k-word web docs). */
  private def gramRows(df: DataFrame, keep: Seq[Column]): DataFrame =
    df.select(keep :+ split(lower(col("text")), " ").as("_ws"): _*)
      .select(keep :+ explode(grams5(col("_ws"))).as("gram"): _*)

  /** [[gramRows]] with grams as 8-byte xxhash64 keys (`gh`) hashed
    * straight from the word bytes — for the consumers whose gram is
    * ONLY a group-by/join key (tx09/tx11/px05): the gram-domain
    * exchanges carry longs instead of ~30-byte strings and the
    * per-window gram string is never allocated. Same trade as
    * [[spanIntervals]] (r12): a 64-bit collision spuriously merges
    * two grams with P ~ n²/2^65 — these are dedup/decontam HEURISTIC
    * censuses, and the raw-gram DuckDB oracle agrees exactly at the
    * checked SFs. */
  private def gramHashRows(df: DataFrame, keep: Seq[Column]): DataFrame =
    df.select(keep :+ split(lower(col("text")), " ").as("_ws"): _*)
      .select(keep :+ explode(
        graft.functions.TextFunctions.gramHashes(col("_ws"), 5)).as("gh"): _*)

  /** tx33 stage 1+2: the per-doc rule flags and their one-row ADDITIVE
    * aggregate (11 sums — every column a sum of indicators, so a
    * streaming twin stores per-batch rows and re-sums; the
    * driftCellAgg discipline). */
  private[graft] def gopherAgg(docDf: DataFrame): DataFrame = {
    // the whole per-doc rule input (token total, stopword hits, modal
    // multiplicity, distinct count) in ONE native byte pass
    // (TokenProfileExpr) — the composed form paid the split array, an
    // interpreted per-token filter, a per-row array_sort + interpreted
    // run-length fold (the old domFold), and an array_distinct. Null
    // text: the kernel struct is null, so every derived stat is null
    // exactly as the split-based columns were, and rule 1's tnull arm
    // still catches the doc.
    val flags = docDf
      .select(col("doc_id"), col("text").isNull.as("tnull"),
        graft.functions.TextFunctions.tokenProfile(col("text"),
          Seq("the", "a", "of", "and", "to", "in", "is", "it")).as("_tp"),
        length(col("text")).cast("long").as("lc"))
      .withColumn("nw", col("_tp").getField("n_words").cast("long"))
      .withColumn("awl", expr("((lc - nw + 1) * 1000) DIV nw"))
      .withColumn("nstop", col("_tp").getField("n_stop").cast("long"))
      .withColumn("mxc", col("_tp").getField("top_cnt").cast("long"))
      .withColumn("dom", expr("(mxc * 1000) DIV nw"))
      .withColumn("ttr", expr("(CAST(_tp.n_uniq AS BIGINT) * 1000) DIV nw"))
      .select(col("doc_id"),
        // null text fails the word-count rule (rule 1) outright —
        // otherwise every flag evaluates NULL and a text-less doc
        // would silently 'pass' the whole gate into the survivors row
        (col("tnull") || col("nw") < 30 || col("nw") > 90).as("f1"),
        (col("awl") < 4300 || col("awl") > 4700).as("f2"),
        (col("nstop") < 2).as("f3"),
        (col("dom") > 120).as("f4"),
        (col("ttr") < 380).as("f5"))
    flags.agg(
        count(lit(1)).as("n0"),
        sum(when(col("f1"), 1L).otherwise(0L)).as("s1"),
        sum(when(!col("f1") && col("f2"), 1L).otherwise(0L)).as("s2"),
        sum(when(!col("f1") && !col("f2") && col("f3"), 1L).otherwise(0L)).as("s3"),
        sum(when(!col("f1") && !col("f2") && !col("f3") && col("f4"), 1L).otherwise(0L)).as("s4"),
        sum(when(!col("f1") && !col("f2") && !col("f3") && !col("f4") && col("f5"), 1L).otherwise(0L)).as("s5"),
        sum(when(col("f2"), 1L).otherwise(0L)).as("m2"),
        sum(when(col("f3"), 1L).otherwise(0L)).as("m3"),
        sum(when(col("f4"), 1L).otherwise(0L)).as("m4"),
        sum(when(col("f5"), 1L).otherwise(0L)).as("m5"))
  }

  /** tx33 stage 3: the 6-row rule table over a (summed) one-row
    * aggregate — shared verbatim by the batch kernel and
    * [[graft.streaming.TopicStream]]'s `currentGate`. */
  private[graft] def gopherStack(aggRow: DataFrame): DataFrame = {
    aggRow
      .selectExpr("""stack(6,
          1, 'word_count',    n0,                          s1, s1,
          2, 'mean_word_len', n0 - s1,                     s2, m2,
          3, 'stopwords',     n0 - s1 - s2,                s3, m3,
          4, 'dominance',     n0 - s1 - s2 - s3,           s4, m4,
          5, 'diversity',     n0 - s1 - s2 - s3 - s4,      s5, m5,
          6, 'survivors',     n0 - s1 - s2 - s3 - s4 - s5, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        ) AS (rule_ord, rule, n_checked, n_fail, n_fail_marginal)""")
      .withColumn("fail_milli",
        expr("CASE WHEN n_checked > 0 THEN (n_fail * 1000) DIV n_checked ELSE 0 END"))
      .orderBy(col("rule_ord"))
  }

  /** tx33's kernel over any (doc_id, text) frame — shared with
    * [[graft.api]]'s `gopherGate` verb: one corpus scan folds the
    * five per-doc rule flags at scan speed, one map-side-combinable
    * aggregate, a 6-row stack. See [[gopherAgg]] / [[gopherStack]]. */
  /** sp15's kernel over a (source, n_toks) rollup — shared with
    * [[graft.api]]'s `mixtureCaps` verb: sqrt-temperature weights
    * (sp04's floor(sqrt(n·10⁶)) integer discipline), clamped to
    * [floorMilli, capMilli], then ONE residual-redistribution round —
    * the clamp's leftover mass (1000 − Σ clamped, which includes the
    * DIV-truncation crumbs) spreads over the UNclamped sources
    * proportionally to their raw weight. One round is the documented
    * contract (the redistribution can push a source past the cap only
    * if the residual exceeds the free mass — the degenerate
    * all-sources-clamped case, where the clamp bounds themselves are
    * the spec); ApiSpec pins conservation |Σ final − 1000| ≤ |S|.
    * Scale shape: everything after the corpus rollup runs on the
    * |S|-row frame with two 1-row broadcasts. */
  private[graft] def mixtureCapsOf(srcToks: DataFrame, capMilli: Long,
                                   floorMilli: Long): DataFrame = {
    require(floorMilli >= 0 && capMilli > floorMilli,
      s"mixtureCaps: need 0 <= floor < cap, got floor=$floorMilli cap=$capMilli")
    val srcW = srcToks
      .withColumn("wgt",
        floor(sqrt(col("n_toks").cast("double") * 1000000d)).cast("long"))
    val tot = srcW.agg(sum(col("wgt")).as("tot_w"))
    val raw = srcW.crossJoin(broadcast(tot))
      .withColumn("raw_milli", expr("(wgt * 1000) DIV tot_w"))
      .withColumn("clamped_milli",
        expr(s"least(CAST($capMilli AS BIGINT), " +
          s"greatest(CAST($floorMilli AS BIGINT), raw_milli))"))
      .withColumn("clamped", col("clamped_milli") =!= col("raw_milli"))
    val res = raw.agg((lit(1000L) - sum(col("clamped_milli"))).as("residual"),
      sum(when(!col("clamped"), col("raw_milli")).otherwise(0L)).as("free_mass"))
    raw.crossJoin(broadcast(res))
      .withColumn("final_milli", when(col("clamped"), col("clamped_milli"))
        .otherwise(col("clamped_milli") +
          expr("(residual * raw_milli) DIV greatest(1, free_mass)")))
      .select(col("source"), col("n_toks"), col("raw_milli"),
        col("clamped_milli"), col("clamped"), col("final_milli"))
  }

  private[graft] def gopherGateOf(docDf: DataFrame): DataFrame =
    gopherStack(gopherAgg(docDf))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Cross-corpus duplicated-span analysis (RefinedWeb-style exact
    // substring dedup at word-5-gram granularity): a span is
    // "duplicated" if its gram occurs in >= 2 DISTINCT docs. Per doc:
    // span count, duplicated-span count, dup fraction in exact milli.
    // Plan: one gram->doc-frequency agg (map-side combinable), one
    // join back on gram, one per-doc agg — three hash shuffles, no
    // window, no all-pairs; at 100 TB the gram df table is the only
    // wide intermediate and it shrinks with distinct-gram count.
    "tx09_dup_ngrams" -> ((s, d) => {
      // A one-exchange rework (repartition(gh) + per-(gh, doc)
      // collapse + zero-exchange co-partitioned df join) was BUILT,
      // oracle-verified, and MEASURED WORSE at both scales (r14:
      // 1x 0.85 -> 1.37 s, 64x 7.5 -> 11.6 s at matched windows):
      // this shape's countDistinct partial-aggregates the (gh, doc)
      // pairs MAP-SIDE before its exchange, and AQE broadcasts the
      // gh-domain dfreq into the join-back — so the raw position rows
      // never cross the wire here, while an explicit repartition
      // ships them uncollapsed. Reverted; the 8.8x 64x growth is the
      // decorrelated gram DOMAIN growing 64x, not a plan defect.
      val g = gramHashRows(docs(s, d), Seq(col("doc_id")))
      val dfreq = g.groupBy(col("gh"))
        .agg(countDistinct(col("doc_id")).as("df"))
      g.join(dfreq, "gh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup_spans"))
        .withColumn("dup_milli", expr("(n_dup_spans * 1000) DIV n_spans"))
        .orderBy(col("doc_id"))
    }),

    // Gopher repetition rules, within-doc: modal-word fraction and
    // duplicate-bigram fraction in exact milli, plus the keep flag.
    // One explode + per-(doc,word) agg + per-doc window — a single
    // hash shuffle on doc_id at scale (the window reuses the agg's
    // partitioning), fully parallel per doc.
    "tx10_repetition" -> ((s, d) => {
      // the whole per-doc profile (token total, modal word with the
      // (cnt desc, word asc) tie-break, bigram census) in ONE native
      // byte pass (TokenProfileExpr) — replaces the corpus-words
      // explode + (doc, word) agg + per-doc window + the interpreted
      // bigram transform + two array_distinct passes. The text
      // isNotNull filter keeps the old inner-join semantics (a
      // null-text doc produced no word rows and dropped out) — it
      // replaced a filter on the DERIVED struct, which the optimizer
      // pushed below the exchange and re-evaluated the kernel for
      // (profile(text) is null iff text is null: nullIntolerant).
      val tp = graft.functions.TextFunctions.tokenProfile(
        lower(col("text")), Seq.empty)
      docs(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), tp.as("_tp"))
        .select(col("doc_id"),
          col("_tp").getField("n_words").cast("long").as("n_words"),
          col("_tp").getField("top_word").as("top_word"),
          col("_tp").getField("top_cnt").cast("long").as("top_cnt"),
          col("_tp").getField("n_bigrams").cast("long").as("n_bigrams"),
          col("_tp").getField("n_uniq_bigrams").cast("long").as("n_dist_bigrams"))
        .withColumn("top_word_milli", expr("(top_cnt * 1000) DIV n_words"))
        .withColumn("dup_bigram_milli",
          expr("CASE WHEN n_bigrams = 0 THEN 0 ELSE ((n_bigrams - n_dist_bigrams) * 1000) DIV n_bigrams END"))
        .withColumn("keep",
          col("top_word_milli") <= 100 && col("dup_bigram_milli") <= 250)
        .select(col("doc_id"), col("n_words"), col("top_word"), col("top_cnt"),
          col("top_word_milli"), col("n_bigrams"), col("n_dist_bigrams"),
          col("dup_bigram_milli"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    // Benchmark decontamination: flag training docs sharing any word
    // 5-gram with the held-out benchmark (here: the src0 slice — a
    // deterministic stand-in for an eval set). The benchmark gram set
    // is TINY by construction (eval sets are), so it broadcasts and
    // the scan side never shuffles on gram: per-doc distinct-gram agg
    // is the only exchange. The standard n-gram-overlap decontam pass
    // (GPT-3 appendix / PaLM style).
    "tx11_decontam" -> ((s, d) => {
      val g = gramHashRows(docs(s, d), Seq(col("doc_id"), col("source")))
      val bench = g.filter(col("source") === "src0")
        .select(col("gh")).distinct()
        .withColumn("hit", lit(1L))
      g.filter(col("source") =!= "src0")
        .dropDuplicates("doc_id", "gh")
        .join(broadcast(bench), Seq("gh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
        .withColumn("contaminated", col("n_overlap") > 0)
        .orderBy(col("doc_id"))
    }),

    // Tokenizer vocabulary build: corpus word counts -> top-64 vocab
    // by (count desc, word) with exact cumulative-coverage milli.
    // One map-side-combinable word agg; the top-64 is a
    // TakeOrderedAndProject (per-partition top-64, merged on the
    // driver — NEVER a global sort of the distinct-word table, which
    // is 10^7-10^9 rows at 100 TB), and only the 64 surviving rows
    // flow through the rank/cumsum window. `total` folds from the
    // same persisted agg — the corpus is scanned once.
    // TOKENIZER BUDGET curve — "how many vocabulary types cover
    // 50/90/95/99% of the corpus token mass" (the vocab-size-planning
    // report behind every tokenizer build; tx12 shows the top of the
    // Zipf curve, this reports where the mass cutoffs land): words
    // rank by (count desc, word) GLOBALLY via GroupPrefix's two-phase
    // range-partition form (the vocab is one global group — a plain
    // unpartitioned window would funnel the whole type domain through
    // one task), the running token mass rides GroupPrefix's prefix
    // sum, and each q reports the smallest rank whose cumulative mass
    // reaches q·total (cum·1000 ≥ q·total — integers; cum is
    // monotone in rank, so min(rank) and min(cum) pick the same row).
    // Scale shape: ONE corpus shuffle (the word rollup, map-side
    // combined into the type domain); everything after runs on the
    // type-domain frame; total is a 1-row broadcast.
    "tx30_vocab_coverage" -> ((s, d) => {
      import s.implicits._
      val wc = docs(s, d)
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .withColumn("g", lit(0))
      val total = wc.agg(sum(col("cnt")).as("total"))
      val ranked = graft.functions.GroupPrefix.groupPrefixC(
          wc, "g", Seq(col("cnt").desc, col("word")), Some("cnt"))
        .select(col("rn").cast("long").as("rn"),
          (col("cum0") + col("cnt")).as("cum"))
      val qs = Seq(500, 900, 950, 990).toDF("q_milli")
        .select(col("q_milli").cast("int").as("q_milli"))
      ranked.crossJoin(broadcast(total)).crossJoin(broadcast(qs))
        .filter(col("cum") * 1000 >= col("q_milli") * col("total"))
        .groupBy(col("q_milli"))
        .agg(min(col("rn")).as("vocab_size"), min(col("cum")).as("cum_tokens"),
          max(col("total")).as("total_tokens"))
        .withColumn("coverage_milli", expr("(cum_tokens * 1000) DIV total_tokens"))
        .orderBy(col("q_milli"))
    }),

    // ZIPF RANK-BAND PROFILE of the corpus vocabulary — the corpus-
    // health fingerprint next to tx12's head-coverage table (Gopher /
    // CCNet both publish it: a natural-language corpus's frequency
    // mass decays ~1/rank, so each DOUBLING band of ranks holds
    // roughly constant mass; a scraped corpus whose tail bands go
    // flat is template spam, one whose head band swallows everything
    // is boilerplate). Per band floor(log2(rank)): word count, mass,
    // rank bounds, and the band's corpus-mass share in milli. Scale
    // shape: one token agg into the |V| domain (map-side combinable),
    // the GLOBAL rank via GroupPrefix's two-phase range partition
    // (the one-task ntile trap designed out — |V| at web scale is
    // ~10⁸ raw words), then a log|V|-row band agg + 1-row broadcast.
    "tx35_zipf_profile" -> ((s, d) => {
      val wc = docs(s, d)
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .withColumn("_g", lit(0))
      val ranked = graft.functions.GroupPrefix.groupPrefixC(
        wc, "_g", Seq(col("cnt").desc, col("word")), rnName = "rank")
      val banded = ranked
        .withColumn("band", floor(log2(col("rank"))).cast("int"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_words"), sum(col("cnt")).as("band_mass"),
          min(col("rank")).as("rank_lo"), max(col("rank")).as("rank_hi"))
      val tot = banded.agg(sum(col("band_mass")).as("total"))
      banded.crossJoin(broadcast(tot))
        .select(col("band"), col("rank_lo"), col("rank_hi"), col("n_words"),
          col("band_mass"), expr("(band_mass * 1000) DIV total").as("mass_milli"))
        .orderBy(col("band"))
    }),

    "tx12_vocab" -> ((s, d) => {
      val wc = docs(s, d)
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val total = wc.agg(sum(col("cnt")).as("total"))
      val top = wc.orderBy(col("cnt").desc, col("word")).limit(64)
      val w = Window.orderBy(col("cnt").desc, col("word"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val rw = Window.orderBy(col("cnt").desc, col("word"))
      top.crossJoin(broadcast(total))
        .withColumn("rank", row_number().over(rw))
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("coverage_milli", expr("(cum * 1000) DIV total"))
        .select(col("rank"), col("word"), col("cnt"), col("cum"), col("coverage_milli"))
        .orderBy(col("rank"))
    }),

    // Text normalization pass (the tokenizer-prep normalize step):
    // lowercase, strip punctuation, collapse whitespace, drop
    // stopwords, crude suffix stem (ing/ed/es/s on words >= 5 chars —
    // a deterministic Porter-lite both engines express identically).
    // Pure per-row array compute — scan speed, zero shuffle; emits the
    // normalized digest so downstream exact-dedup runs on normalized
    // text. The regexes stay in the RE2-compatible subset (tx07 rule).
    "tx13_normalize" -> ((s, d) => {
      val stop = Seq("the", "a", "of", "and", "to", "is")
      val cleaned = regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
        " +", " ")
      val toks = filter(split(trim(cleaned), " "),
        t => !stop.foldLeft(lit(false))((acc, w) => acc || (t === w)) && length(t) > 0)
      val stemmed = transform(toks, t =>
        when(length(t) >= 6 && t.endsWith("ing"), t.substr(lit(1), length(t) - 3))
          .when(length(t) >= 5 && t.endsWith("ed"), t.substr(lit(1), length(t) - 2))
          .when(length(t) >= 5 && t.endsWith("es"), t.substr(lit(1), length(t) - 2))
          .when(length(t) >= 5 && t.endsWith("s"), t.substr(lit(1), length(t) - 1))
          .otherwise(t))
      Tables.spread(docs(s, d))
        .withColumn("norm_toks", stemmed)
        .select(col("doc_id"),
          size(col("norm_toks")).as("n_norm_tokens"),
          md5(array_join(col("norm_toks"), " ")).as("norm_md5"),
          array_join(slice(col("norm_toks"), 1, 5), " ").as("head5"))
        .orderBy(col("doc_id"))
    }),

    // Temperature-weighted mixture sampling (the multilingual-corpus
    // alpha-sampling rule, alpha = 0.5): per-source doc budgets
    // proportional to sqrt(token share). sqrt of an integer is
    // CORRECTLY ROUNDED IEEE in both engines (unlike ln/exp/pow), and
    // everything after the one sqrt is integer math, so the selection
    // is engine-exact AND rerun-stable (md5-hash order, like sp02).
    // Plan: per-source token agg (tiny, broadcast back); the rank is
    // a plain per-source window CAPPED at the literal total budget —
    // budgets sum to <= 200, so `rn <= 200` subsumes every per-source
    // `rn <= budget_docs`, and the literal filter lets Catalyst's
    // InferWindowGroupLimit plan a PARTIAL WindowGroupLimit before
    // the shuffle (each task forwards <= 200 rows per source; the
    // merge task sees <= 200 x partitions rows, never a whole
    // source). Rank-vs-column alone would need GroupPrefix; the
    // a-priori literal bound is what buys the cheaper shape.
    // CAPPED-TEMPERATURE MIXTURE — the weight table every production
    // mix actually ships (Llama/Gopher style): sp04's sqrt-temperature
    // shares, then per-source floor/cap clamps (no source starves, no
    // source dominates) with the clamp's residual mass redistributed
    // over the unclamped sources in one documented round. See
    // [[mixtureCapsOf]] (kernel shared with api.mixtureCaps; the
    // planted-skew battery in ApiSpec exercises the binding clamps —
    // the test corpus's post-sqrt shares are near-uniform, so here the
    // clamps pass through and the oracle pins the redistribution of
    // the DIV-truncation residue).
    "sp15_mixture_caps" -> ((s, d) =>
      mixtureCapsOf(
          docs(s, d)
            .select(col("source"),
              wordCount(col("text")).cast("long").as("tok_cnt"))
            .groupBy(col("source")).agg(sum(col("tok_cnt")).as("n_toks")),
          capMilli = 150L, floorMilli = 25L)
        .orderBy(col("source"))),

    "sp04_temperature" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = wordCount(col("text")).cast("long")
      val base = docs(s, d).select(col("doc_id"), col("source"), toks.as("tok_cnt"))
      val srcW = base.groupBy(col("source"))
        .agg(sum(col("tok_cnt")).as("n_toks"))
        .withColumn("wgt", floor(sqrt(col("n_toks").cast("double") * 1000000d)).cast("long"))
      val tot = srcW.agg(sum(col("wgt")).as("tot_w"))
      val budgets = srcW.crossJoin(broadcast(tot))
        .withColumn("budget_docs", expr("(wgt * 200) DIV tot_w"))
        .select(col("source"), col("n_toks"), col("wgt"), col("budget_docs"))
      val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
      base.withColumn("h", md5(concat(col("doc_id").cast("string"), lit(":sp04"))))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 200)
        .join(broadcast(budgets), "source")
        .filter(col("rn") <= col("budget_docs"))
        .select(col("source"), col("rn"), col("doc_id"), col("tok_cnt"), col("budget_docs"))
        .orderBy(col("source"), col("rn"))
    }),

    // Quality-ANNEALED training schedule — the data-ordering rule
    // modern pretraining runs use (a final "annealing" phase fed the
    // highest-quality slice, per the MiniCPM / Llama-3 recipes): rank
    // the corpus by tx17's frozen quality logit and mark the docs
    // whose quality-descending token prefix fits the anneal budget
    // (top 10% of tokens) as phase='anneal' — the trainer streams
    // 'main' first and the anneal slice last. The global
    // token-prefix-in-quality-order is the scale hazard (a naive
    // unpartitioned window = one task holding the corpus); GroupPrefix
    // makes it two partition-parallel passes, so task input is
    // bounded by partition size at any corpus. Integer logit + token
    // counts keep the schedule engine-exact and rerun-stable.
    "sp08_anneal_schedule" -> ((s, d) => {
      val scored = qualityScored(docs(s, d))
        .select(col("doc_id"), col("n_words").cast("long").as("n_words"), col("score"))
      val tot = scored.agg(sum(col("n_words")).as("tot"))
      val ranked = graft.functions.GroupPrefix.groupPrefixC(
        scored.withColumn("g", lit(1)), "g",
        Seq(col("score").desc, col("doc_id")), Some("n_words"),
        rnName = "qrank", cumName = "cum_before")
      ranked.crossJoin(broadcast(tot))
        .select(col("doc_id"), col("n_words"), col("score"),
          col("qrank").cast("int").as("qrank"), col("cum_before"),
          when(col("cum_before") * 10 < col("tot"), "anneal")
            .otherwise("main").as("phase"))
        .orderBy(col("qrank"))
    }),

    // Cross-split contamination AUDIT — the leakage check that runs
    // after sp05's split assignment and before training: does any
    // held-out (val/test) doc share a word 5-gram with the train
    // split? Unlike tx11 (benchmark set: small, broadcast), the train
    // side here is ~90% of the corpus, so the gram join is a plain
    // hash equi-join on the gram — both sides shuffle once, keyed by
    // gram (partitionable, AQE-skew-splittable), and only the
    // contaminated doc-id set (tiny) flows back onto the held-out
    // census. Docs with < 5 words carry no grams: counted leak-free.
    "px05_split_leakage" -> ((s, d) => {
      val h = substring(md5(concat(col("doc_id").cast("string"), lit(":sp05"))), 1, 2)
      val base = docs(s, d)
        .withColumn("split",
          when(h < "0d", lit("val")).when(h < "1a", lit("test")).otherwise(lit("train")))
      val g = gramHashRows(base, Seq(col("doc_id"), col("split")))
      val trainGrams = g.filter(col("split") === "train").select(col("gh")).distinct()
      val contam = g.filter(col("split") =!= "train")
        .join(trainGrams, Seq("gh"), "left_semi")
        .select(col("doc_id")).distinct().withColumn("hit", lit(1L))
      base.filter(col("split") =!= "train")
        .join(contam, Seq("doc_id"), "left")
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("hit"), lit(0L))).as("n_leaky"))
        .withColumn("leak_milli", expr("(n_leaky * 1000) DIV n_docs"))
        .orderBy(col("source"), col("split"))
    }),

    // LM-quality quartile report — the CCNet "score, bucket, filter"
    // step: per-doc char-bigram LM typicality (tx08's log-free
    // integer-ppm score) bucketed into per-source quartiles, so the
    // bottom bucket is the documented drop candidate. The quartile is
    // NTILE(4) in closed form over GroupPrefix positions (q23's
    // machinery) — two-phase partition-parallel, never a one-task-
    // per-source sort of the scored corpus.
    "tx14_quality_quartiles" -> ((s, d) => {
      // Scoring rides the SHARED native-census kernel
      // (TextOps.bigramLmScores — plans/BigramCountsExpr, ~0.3 rows
      // per character on the wire instead of 1): the raw double
      // explode this kernel used pre-r17 paid the corpus twice at
      // full character width, the measured hazard tx08/tx32 already
      // designed out. The source join is a doc-keyed co-shuffle (the
      // tx32 pattern).
      val scored = graft.operators.TextOps.bigramLmScores(docs(s, d))
        .join(docs(s, d).select(col("doc_id"), col("source")), "doc_id")
        .select(col("doc_id"), col("source"), col("lm_score_ppm"))
      val ranked = graft.functions.GroupPrefix.groupPrefixC(
        scored, "source", Seq(col("lm_score_ppm"), col("doc_id")))
      val counts = ranked.groupBy(col("source")).agg(count(lit(1)).as("n"))
      ranked.join(broadcast(counts), "source")
        .withColumn("q_sz", expr("CAST(n DIV 4 AS INT)"))
        .withColumn("q_rem", expr("CAST(n % 4 AS INT)"))
        .withColumn("quartile", graft.functions.GroupPrefix.ntileExpr(4))
        .groupBy(col("source"), col("quartile"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("lm_score_ppm")).as("lo_ppm"),
          max(col("lm_score_ppm")).as("hi_ppm"))
        .orderBy(col("source"), col("quartile"))
    }),

    // GOPHER-STYLE RULE GATE with funnel attribution (Rae et al. 2021
    // Table A1 — the named rule battery every curation pipeline
    // publishes as its filter-ablation table; tx02 scores docs, this
    // gates the corpus and ATTRIBUTES the kills): an ordered battery
    // of five document rules — word-count bounds, mean-word-length
    // bounds, minimum stopword evidence, top-word dominance, and
    // type-token diversity — reporting per rule both the SEQUENTIAL
    // kill (docs failing here that survived every earlier rule — the
    // number the funnel loses at this stage) and the MARGINAL kill
    // (docs failing the rule regardless of order — the ablation
    // number), plus the survivor row. Every metric is integer milli
    // (the tx02 discipline); dominance is a per-row run-length fold
    // over the doc's own sorted tokens (the tx05/tx28 zero-exchange
    // pattern — never an explode + per-doc rank). Scale shape: ONE
    // corpus scan folds per-doc flags at scan speed, a single
    // map-side-combinable agg collapses to one row, and the rule
    // table is a 6-row stack of that row — zero corpus-sized
    // exchanges, output fixed at the rule domain.
    "tx33_gopher_gate" -> ((s, d) => gopherGateOf(docs(s, d))),

    // Heavy hitters via the native Misra-Gries aggregate
    // (functions/MisraGriesAgg.scala) — tx12's vocab question at the
    // scale where even the distinct-term shuffle is the cost: the MG
    // summary keeps ≤k counters per partial aggregate and merges
    // associatively, so the wire carries one ≤k-entry map per
    // partition instead of the term domain. Summary CONTENT varies
    // with Spark's nondeterministic merge order, but its GUARANTEES
    // (every term with freq > n/(k+1) present; undercount ≤ n/(k+1))
    // hold for every order — so the output is the q26-style gated
    // form: the exact heavy-hitter twin (deterministic, hash-checked)
    // plus booleans certifying the engine's own sketch honored both
    // guarantees. Threshold compares are integer (cnt*(k+1) > n), no
    // division. At 100 TB the exact twin is the audit; production
    // reads the summary alone.
    "tx15_heavy_hitters" -> ((s, d) => {
      val k = 64
      val words = Tables.spread(docs(s, d))
        .select(explode(split(lower(col("text")), " ")).as("term"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mg = udaf(new graft.functions.MisraGriesAgg(k))
      val sk = words.agg(mg(col("term")).as("sk"))
      val tot = words.agg(count(lit(1)).as("n"))
      words.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(sk))
        .filter(col("cnt") * (k + 1) > col("n"))
        // try_element_at, not element_at: under ANSI mode a missing map
        // key throws MAP_KEY_DOES_NOT_EXIST, so a violated MG guarantee
        // would crash the query instead of reading in_sketch=false —
        // the self-certification booleans could never actually go red.
        .select(col("term"), col("cnt"), col("n"),
          try_element_at(col("sk"), col("term")).isNotNull.as("in_sketch"),
          ((col("cnt") - coalesce(try_element_at(col("sk"), col("term")), lit(0L)))
            * (k + 1) <= col("n")).as("count_within_bound"))
        .orderBy(col("term"))
    }),

    // Cross-corpus LINE dedup (C4's duplicated-line REMOVAL rule —
    // tx09 only flags; this is the edit step that rewrites documents):
    // docs chunk into consecutive 10-word "lines", a line occurring in
    // more than one place corpus-wide survives only at its FIRST
    // occurrence (min doc_id, then min position — keep-first, the dd01
    // discipline at sub-document granularity). Per doc: line counts,
    // kept fraction in exact milli, and the fingerprint of the
    // rewritten doc (kept lines joined in position order).
    // Plan: one line-domain agg (map-side-combinable min of the
    // bigint-encoded (doc,pos) instance key), one join back on line,
    // one per-doc agg — tx09's exact topology, so the 100 TB story is
    // the same: the distinct-line table is the only wide intermediate
    // and the corpus never self-joins. The rewrite digest makes the
    // edit itself oracle-checkable, not just the counts.
    // BOILERPLATE DETECTION — the corpus-level twin of tx16's line
    // dedup (C4's other line rule: a line appearing across MANY
    // DOCUMENTS is template chrome — nav bars, footers, cookie
    // banners — and gets dropped from every doc, not deduped to one
    // copy): per 10-word line (tx16's exact chunker), the distinct-
    // document frequency; boilerplate = df ≥ max(3, 1% of the corpus).
    // Output is the boilerplate REGISTRY (line, df, instances, df
    // milli) a scrubbing pass broadcasts back against the corpus.
    // Scale shape: one line-keyed shuffle (the df agg partial-combines;
    // countDistinct's expand doubles the rollup rows, still
    // line-domain); the doc total is a 1-row broadcast; the registry
    // output is tiny by definition (lines crossing the df threshold).
    "tx31_boilerplate" -> ((s, d) => {
      val words = split(col("text"), " ")
      val lines = docs(s, d)
        .select(col("doc_id"), words.as("_ws"))
        .select(col("doc_id"),
          transform(sequence(lit(0), floor((size(col("_ws")) - 1) / 10).cast("int")),
            c => array_join(slice(col("_ws"), c * 10 + 1, lit(10)), " ")).as("ls"))
        .select(col("doc_id"), explode(coalesce(col("ls"), array())).as("line"))
      val n = docs(s, d).agg(count(lit(1)).as("n_docs"))
      lines.groupBy(col("line"))
        .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("n_inst"))
        .crossJoin(broadcast(n))
        .filter(col("df") >= greatest(lit(3L), expr("(n_docs + 99) DIV 100")))
        .select(col("line"), col("df"), col("n_inst"),
          expr("(df * 1000) DIV n_docs").as("df_milli"))
        .orderBy(col("df").desc, col("line"))
    }),

    "tx16_line_dedup" -> ((s, d) => {
      val words = split(col("text"), " ")
      val lines = docs(s, d)
        .select(col("doc_id"), words.as("_ws"))
        .select(col("doc_id"),
          transform(sequence(lit(0), floor((size(col("_ws")) - 1) / 10).cast("int")),
            c => array_join(slice(col("_ws"), c * 10 + 1, lit(10)), " ")).as("ls"))
        // coalesce wrapper: a bare-attribute generator child lets
        // InferFiltersFromGenerate add size(ls)>0 which pushdown
        // substitutes into the scan filter — re-deriving the whole
        // chunk transform (inline split and all) once per row. A
        // non-leaf child suppresses the inference (SPARK-36715
        // guard); ls is non-empty by construction so the filter was
        // pure quadratic overhead. Same semantics: null ls -> empty.
        .select(col("doc_id"), posexplode(coalesce(col("ls"), array())))
        .select(col("doc_id"), col("pos"), col("col").as("line"),
          // instance key: one bigint both engines can min() exactly
          (col("doc_id") * 1000000 + col("pos")).as("inst"))
      val keeper = lines.groupBy(col("line")).agg(min(col("inst")).as("keep_inst"))
      lines.join(keeper, "line")
        .withColumn("kept", col("inst") === col("keep_inst"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("kept"), 0L).otherwise(1L)).as("n_dropped"),
          // collect_list skips nulls => only kept lines enter the
          // digest; array_sort on (pos, line) restores doc order.
          md5(concat_ws("|", transform(
            array_sort(collect_list(when(col("kept"),
              struct(col("pos"), col("line"))))),
            st => st.getField("line")))).as("kept_fp"))
        .select(col("doc_id"), col("n_lines"), col("n_dropped"),
          expr("((n_lines - n_dropped) * 1000) DIV n_lines").as("kept_milli"),
          substring(col("kept_fp"), 1, 8).as("kept_fp8"))
        .orderBy(col("doc_id"))
    }),

    // SOURCE-PAIR BOILERPLATE OVERLAP — dd24's EXACT-line sibling
    // (dd24 asks "which sources re-host near-duplicate documents";
    // this asks "which sources share verbatim template lines" — nav
    // bars, cookie banners, license footers: the cross-source
    // boilerplate provenance matrix tx31 scores per doc and tx16
    // drops per line, rolled up to WHO shares WITH WHOM): per
    // canonical source pair the distinct-line counts, the shared
    // distinct-line count, and the line-set Jaccard in milli. Scale
    // shape: lines collapse to the distinct (source, line) domain
    // FIRST (the corpus-sized explode ends at that distinct — it is
    // checkpointed, three consumers), the self-join is line-hash
    // equi-keyed with ≤|S|²/2 pairs per line, and the output is the
    // S²-bounded pair domain with two broadcast total joins.
    "tx38_boiler_overlap" -> ((s, d) => {
      // r13: the census's lines are ONLY distinct/join keys, so they
      // ride as xxhash64 longs hashed straight off the text bytes
      // (TiledLineHashesExpr — no words array, no interpreted
      // transform, no ~60-byte line strings through the distinct and
      // the self-join; the WordGramHashesExpr collision trade, and
      // the raw-line DuckDB oracle agrees at both checked SFs)
      val lines = docs(s, d)
        .select(col("source"),
          explode(org.apache.spark.sql.graft.bridge.column(
            graft.plans.TiledLineHashesExpr(
              org.apache.spark.sql.graft.bridge.expression(col("text")), 10))).as("line"))
        .distinct()
        .localCheckpoint(false)
      val tot = lines.groupBy(col("source")).agg(count(lit(1)).as("n"))
      val shared = lines.select(col("line"), col("source").as("source_1"))
        .join(lines.select(col("line"), col("source").as("source_2")), "line")
        .filter(col("source_1") < col("source_2"))
        .groupBy(col("source_1"), col("source_2"))
        .agg(count(lit(1)).as("n_shared"))
      shared
        .join(broadcast(tot.select(col("source").as("source_1"), col("n").as("n1"))),
          "source_1")
        .join(broadcast(tot.select(col("source").as("source_2"), col("n").as("n2"))),
          "source_2")
        .select(col("source_1"), col("source_2"), col("n1"), col("n2"),
          col("n_shared"),
          expr("(n_shared * 1000) DIV (n1 + n2 - n_shared)").as("jaccard_milli"))
        .orderBy(col("source_1"), col("source_2"))
    }),

    // Model-based quality GATE (the fasttext/logreg classifier step of
    // CCNet/LLaMA-style curation, downstream of tx02's raw features):
    // a frozen linear model scores each doc over exact integer
    // features and the score thresholds into hi/mid/lo + the keep
    // flag. The weights here are fixed constants standing in for a
    // trained model — what the operator represents is the INFERENCE
    // shape: a linear scorer is a per-row codegen'd expression, so the
    // gate runs at scan speed with zero shuffle at any corpus size
    // (swap the literals for a broadcast one-row weights frame read
    // from a model topic and the plan is unchanged). Integer
    // weights/features keep both engines bit-identical — no sigmoid;
    // thresholding the logit is order-equivalent.
    // QUALITY-CLASSIFIER TRAINING — the in-engine model-training verb
    // the frozen tx17 gate stops short of (production quality
    // classifiers are RETRAINED per corpus; this closes the loop the
    // way ss23/tx25 closed k-means and BPE): the NORMALIZED batch
    // perceptron (Duda–Hart) over tx17's integer features
    // (stop/distinct milli + the two band indicators + bias), teacher
    // = tx17's own keep gate — linear in exactly these features, so
    // the data is separable and the AVERAGED update inherits the
    // online mistake bound (the raw summed update |Σy·x|² grows
    // quadratically in the misclassified count and measurably
    // oscillates — the normalization is what makes batch training
    // provable, not a tuning choice). ENGINE-EXACT: weights live at
    // MILLI grain, each update is sign-symmetric integer division
    // (sign(d)·((|d|·1000) DIV k) — positive operands, so Spark's
    // trunc and DuckDB's floor agree), margins are pure long sums —
    // DuckDB replays the 3 fixed rounds bit-for-bit. Scale shape: the
    // feature frame materializes once (localCheckpoint, the
    // kmeansTrain discipline); each round is ONE partial-agg'd scan
    // producing a 6-long gradient row (the sanctioned bounded model
    // read); weights broadcast back as literals — plans never nest.
    "tx27_quality_train" -> ((s, d) => {
      val sess = s
      import sess.implicits._
      val f = qualityFeatureFrame(docs(s, d)).localCheckpoint(false)
      var w = Array(0L, 0L, 0L, 0L, 0L)
      val rows = (1 to 3).map { t =>
        val margin = col("f1") * w(0) + col("f2") * w(1) + col("f3") * w(2) +
          col("f4") * w(3) + col("f5") * w(4)
        val g = f.filter(col("y") * margin <= 0)
          .agg(count(lit(1)).as("n"),
            sum(col("y") * col("f1")).as("d1"), sum(col("y") * col("f2")).as("d2"),
            sum(col("y") * col("f3")).as("d3"), sum(col("y") * col("f4")).as("d4"),
            sum(col("y") * col("f5")).as("d5"))
          .collect()(0)
        val nMis = g.getLong(0)
        for (i <- 0 until 5) {
          val d = if (g.isNullAt(i + 1)) 0L else g.getLong(i + 1)
          if (nMis > 0L)
            w(i) += (if (d >= 0) d * 1000L / nMis else -(-d * 1000L / nMis))
        }
        (t.toLong, nMis, w(0), w(1), w(2), w(3), w(4))
      }
      rows.toDF("iter", "n_mis", "w_stop", "w_distinct", "w_awl",
        "w_len", "w_bias").orderBy(col("iter"))
    }),

    "tx17_quality_classifier" -> ((s, d) =>
      qualityScored(docs(s, d))
        .withColumn("label", expr(QualityWeights.labelSql))
        .withColumn("keep", col("score") >= QualityWeights.thMid)
        .select(col("doc_id"), col("source"), col("n_words"), col("stop_milli"),
          col("distinct_milli"), col("awl_milli"), col("score"), col("label"), col("keep"))
        .orderBy(col("doc_id")))
  ,

    // MAXIMAL duplicated-span extraction — the ExactSubstr dedup of
    // Lee et al. 2022 ("Deduplicating Training Data Makes Language
    // Models Better"), the step tx09's gram census stops short of:
    // every char-20-gram occurring >= 2 times corpus-wide marks its
    // window, and per doc the marked windows COALESCE into maximal
    // spans (gaps-and-islands interval merge) — the spans are what the
    // paper's suffix array emits and what the rewrite removes. Plan:
    // grams explode INSIDE the row (array-of-structs, so the parent
    // text never rides the explode), one partial-agg'd shuffle of the
    // gram domain (the paper's suffix-array work, re-expressed as one
    // hash agg; at 100 TB the grams shuffle as 8-byte xxhash64 keys —
    // md5-free — and the window is per-doc-bounded). The dup-gram join
    // is candidate-restricted (only grams with n_occ >= 2 come back),
    // the island merge is a per-doc lag + running sum — task input
    // bounded by doc length, never the corpus.
    "tx18_substring_spans" -> ((s, d) =>
      substringSpans(docs(s, d), 20).orderBy(col("doc_id"))),

    // BPE merge step — the first iteration of byte-pair-encoding
    // vocabulary training (Sennrich et al. 2016), the tokenizer-side
    // twin of tx12's word vocab: count adjacent CHARACTER pairs
    // weighted by word frequency and rank the merge candidates. The
    // 100 TB shape is the reason this is cheap: pairs explode over the
    // DISTINCT-WORD frequency table (exactly how real BPE trainers
    // count — corpus size only enters through the word-freq agg that
    // tx12 already prices), so the pair census costs O(vocab x word
    // length), not O(corpus). Iterating = apply the top merge to the
    // symbol sequences and re-count; every iteration keeps this plan.
    "tx19_bpe_merge" -> ((s, d) => bpePairs(docs(s, d), 20)),

    // BPE APPLY + re-count — the iteration tx19 stops short of, proving
    // the training loop closes: the rank-1 merge candidate is applied
    // to every word (greedy leftmost non-overlapping — exactly what
    // string replace() does in both engines, and what the BPE paper's
    // scan does), the merged pair becomes a single SYMBOL (chr(1) as
    // the in-band marker; labels render it back as "(ab)"), and the
    // next round's adjacent-symbol pairs re-count over the SAME
    // distinct-word frequency domain. Every iteration keeps this plan:
    // one broadcast of the winning pair + one vocab-domain pair census
    // — corpus size never re-enters after the word-freq agg. Emits the
    // applied merge alongside iteration-2's top-10 candidates.
    "tx20_bpe_apply" -> ((s, d) => {
      val wf = docs(s, d)
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("wcnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // r13: native bigram census (the tx25 rework) — Σ wcnt·c over
      // distinct bigrams equals the per-position sum exactly
      val top1 = wf
        .select(col("wcnt"),
          explode(graft.functions.TextFunctions.bigramCounts(col("word"))).as("p"))
        .groupBy(col("p.bg").as("pair"))
        .agg(sum(col("wcnt") * col("p.c")).as("pc"))
        .orderBy(col("pc").desc, col("pair")).limit(1)
        .select(col("pair").as("merged"))
      val applied = wf.crossJoin(broadcast(top1))
        .withColumn("mword", expr("replace(word, merged, char(1))"))
      // symbol at position i: chr(1) stands for the merged pair
      def sym(c: Column, merged: Column): Column =
        when(c === expr("char(1)"), concat(lit("("), merged, lit(")"))).otherwise(c)
      val pairs2 = applied
        .select(col("wcnt"), col("merged"),
          explode(when(length(col("mword")) >= 2,
            transform(sequence(lit(1), length(col("mword")) - 1),
              i => concat(sym(col("mword").substr(i, lit(1)), col("merged")),
                          sym(col("mword").substr(i + 1, lit(1)), col("merged")))))
            .otherwise(typedLit(Seq.empty[String]))).as("pair"))
        .groupBy(col("merged"), col("pair")).agg(sum(col("wcnt")).as("pair_count"))
      val rw = Window.orderBy(col("pair_count").desc, col("pair"))
      pairs2.orderBy(col("pair_count").desc, col("pair")).limit(10)
        .withColumn("rank", row_number().over(rw))
        .select(col("rank"), col("merged"), col("pair"), col("pair_count"))
        .orderBy(col("rank"))
    }),

    // RAG / context-window chunking: every doc splits into 32-word
    // chunks on a 24-word stride (8-word overlap so no boundary
    // sentence is lost to retrieval — the standard chunker shape), each
    // chunk carrying a stable (doc_id, chunk_idx) identity and a
    // rewrite digest. Purely per-row compute: the explode happens at
    // the scan with NO shuffle at all (the orderBy is presentation
    // only), and the wire carries 8-char digests, never chunk text —
    // amplification is words/stride rows per doc, bounded by design.
    // At 100 TB this is the map-side feeder of the embedding pipeline;
    // chunk identity is what lets the ANN index upsert per chunk.
    "tx21_chunk" -> ((s, d) => {
      val stride = 24; val width = 32
      val words = split(lower(col("text")), " ")
      docs(s, d)
        .select(col("doc_id"), words.as("_ws"))
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0), floor((size(col("_ws")) - 1) / stride).cast("int")),
            i => array_join(slice(col("_ws"), i * stride + 1, lit(width)), " "))))
        .select(col("doc_id"), col("pos").cast("int").as("chunk_idx"),
          wordCount(col("col")).cast("int").as("chunk_words"),
          substring(md5(col("col")), 1, 8).as("chunk_fp8"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // Lexical retrieval — tf-idf top-k for a fixed query (the BM25
    // family with a RATIONAL idf, (1e6 * N) DIV df, so scoring is
    // exact integer math in both engines — ln() is the only thing BM25
    // adds and the only thing that breaks engine-exactness). The
    // 100 TB shape is what makes lexical search cheap on Spark: the
    // term filter applies AT THE EXPLODE, before any exchange, so the
    // wire carries only the query terms' postings (3 terms here), the
    // (doc,term) tf agg and per-doc sum shuffle those postings twice,
    // and the 3-row idf table broadcasts. Corpus size enters only
    // through the scan and one count.
    "tx22_tfidf_search" -> ((s, d) => {
      val terms = Seq("vector", "join", "scan")
      val base = docs(s, d)
      val n = base.agg(count(lit(1)).as("n_docs"))
      // per-doc term counts computed IN the row (native one-pass
      // TermCountsExpr): no split array, no interpreted filter over
      // every token — tf rows come off a |terms|-array generator and
      // the (doc, term) hash-agg exchange disappears. (A fully
      // generator-free form — per-doc score as a |terms|-length fold
      // against a broadcast stats row — was built and MEASURED 1.2x
      // WORSE: the per-row interpreted HOF folds over struct arrays
      // cost more than the tiny tf frame they replace. Kept the
      // generator.)
      val tf = base
        .select(col("doc_id"),
          posexplode(graft.functions.TextFunctions.termCounts(
            lower(col("text")), terms)))
        .filter(col("col") > 0)
        .select(col("doc_id"),
          element_at(typedLit(terms), col("pos") + 1).as("w"),
          col("col").cast("long").as("tf"))
      val idf = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(n))
        .select(col("w"), expr("(1000000 * n_docs) DIV df").as("idf_sc"))
      tf.join(broadcast(idf), "w")
        .groupBy(col("doc_id"))
        .agg(sum(col("tf") * col("idf_sc")).as("score"),
          count(lit(1)).as("n_terms_hit"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // BM25 — the gated variant of tx22 (the q26/dd11 gate pattern
    // applied to ranking): tx22 stops at rational idf because ln()
    // is the one BM25 ingredient with no cross-engine bit guarantee.
    // Here the full Robertson BM25 (k1=1.2, b=0.75, length
    // normalization) ranks by a DETERMINISTIC reference score whose
    // ln is a shared rational approximation — power-of-two range
    // reduction (exact CASE on exactly-representable thresholds,
    // exact division by 2^e) + a 4-term atanh series, all IEEE
    // +,-,*,/ in pinned association order, so both engines compute
    // bit-identical doubles (|aln - ln| < 2e-5 for z < 1/3). Each
    // engine ALSO scores with its own native ln and gates it within
    // 5e-4 of the reference — the boolean that proves the native
    // BM25 is calibrated, exactly dd11's own-sketch-vs-exact-twin
    // discipline. Exact integer twins (tf-idf score, dl, hit count)
    // ride along for the hash. Scale shape = tx22: the term filter
    // applies AT THE EXPLODE so only query-term postings cross the
    // wire, the 3-row idf table broadcasts, and the length stats are
    // one scalar agg — corpus size enters via the scan only.
    "tx23_bm25" -> ((s, d) => {
      val terms = Seq("vector", "join", "scan")
      // dl via the byte-scan wordCount (lowercasing never adds or
      // removes a space, so size(split(lower(text))) == wordCount);
      // term counts via the native one-pass TermCountsExpr (the tx22
      // rework): the stats scan pays only the byte counters and the
      // tf frame comes off a |terms|-array generator with NO
      // (doc, term) agg exchange. (The fully generator-free form —
      // per-doc BM25 as an in-row fold against a broadcast stats row
      // — was built and MEASURED 2.5x WORSE: two interpreted HOF
      // filter+aggregate folds over struct arrays per CORPUS row cost
      // far more than the tiny tf frame they replace. Kept the
      // generator; lesson recorded in OPTIMIZATION_r13.md.)
      val wd = docs(s, d)
        .select(col("doc_id"), wordCount(col("text")).cast("long").as("dl"),
          graft.functions.TextFunctions.termCounts(
            lower(col("text")), terms).as("tc"))
      val st = wd.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot_dl"))
      // posexplode_OUTER: tc is never null and always |terms| long, so
      // outer ≡ inner here — but the inner form lets
      // InferFiltersFromGenerate add `size(tc) > 0 AND isnotnull(tc)`
      // below the generate, where predicate pushdown substitutes the
      // alias and the term-counts kernel runs a second time per
      // corpus row in BOTH tf scan branches (a vacuous filter: size
      // is constantly 3). Outer generates skip that inference; the
      // col > 0 filter drops the (null, null) row a null tc would
      // emit, so the output is bit-identical either way.
      val tf = wd.select(col("doc_id"), col("dl"), posexplode_outer(col("tc")))
        .filter(col("col") > 0)
        .select(col("doc_id"), col("dl"),
          element_at(typedLit(terms), col("pos") + 1).as("w"),
          col("col").cast("long").as("tf"))
      val x = (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)
      val idf = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(st))
        .withColumn("idf_sc", expr("(1000000 * n_docs) DIV df"))
        .withColumn("x", x)
        .withColumn("ln_x", log(col("x")))
        .withColumn("aln_x", approxLn(col("x")))
        .withColumn("avgdl", col("tot_dl").cast("double") / col("n_docs").cast("double"))
        .select("w", "idf_sc", "ln_x", "aln_x", "avgdl")
      val sat = (col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") + lit(1.2) *
          (lit(0.25) + lit(0.75) * (col("dl").cast("double") / col("avgdl"))))
      tf.join(broadcast(idf), "w")
        .withColumn("sat", sat)
        .groupBy(col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("n_terms_hit"),
          sum(col("tf") * col("idf_sc")).as("tfidf_exact"),
          array_sort(collect_list(struct(col("w").as("w"),
            (col("ln_x") * col("sat")).as("v")))).as("lv"),
          array_sort(collect_list(struct(col("w").as("w"),
            (col("aln_x") * col("sat")).as("v")))).as("av"))
        .withColumn("bm25",
          aggregate(col("lv"), lit(0.0), (acc, s) => acc + s.getField("v")))
        .withColumn("bm25_ref",
          aggregate(col("av"), lit(0.0), (acc, s) => acc + s.getField("v")))
        .withColumn("bm25_micro", floor(col("bm25_ref") * lit(1000000.0)).cast("long"))
        .withColumn("bm25_within_tol", abs(col("bm25") - col("bm25_ref")) <= lit(5e-4))
        .select(col("doc_id"), col("dl"), col("n_terms_hit"), col("tfidf_exact"),
          col("bm25_micro"), col("bm25_within_tol"))
        .orderBy(col("bm25_micro").desc, col("doc_id"))
        .limit(20)
    }),

    // ExactSubstr REWRITE — the Lee et al. 2022 removal step tx18's
    // span census feeds: every maximal corpus-duplicated char-20-gram
    // span is EXCISED from its doc, and the rewrite ships as a digest
    // so the oracle hash-checks the edit itself (tx16's discipline at
    // span granularity). Plan = tx18's: one gram-domain shuffle (8-byte
    // xxhash64 keys), candidate-restricted join back, per-doc island
    // merge; the excision is a per-row fold over the doc's own sorted
    // intervals against the materialized norm column. Only digests and
    // counters ever leave the row — the rewritten text never shuffles.
    "tx24_substring_rewrite" -> ((s, d) =>
      substringRewrite(docs(s, d), 20).orderBy(col("doc_id"))),

    // BPE TRAINING LOOP, oracle-replayed — api.bpeTrain's 3-merge form
    // driver-checked (the ss23 pattern applied to tokenizer training:
    // tx19/tx20 check one merge + re-count; this checks the LOOP).
    // Each round is tx20's exact machinery: a vocab-domain adjacent
    // symbol-pair census, the deterministic (count desc, pair) winner
    // as a broadcast 1-row frame, and a greedy-leftmost replace() that
    // collapses the pair to a fresh marker char — chr(i) for merge i,
    // so every symbol stays one char and round i+1's census is again
    // substr(w, j, 2). replace with a fresh char is injective, so
    // distinct words stay distinct and wcnt never re-groups. The ONE
    // corpus-sized agg is the word-frequency census; all three rounds
    // ride the distinct-word table (the Sennrich trainer shape).
    // Output: merge rank, the merge rendered in nested-paren labels,
    // and its pair count — both engines chain the same three CTEs.
    // ExactSubstr KEEP-FIRST rewrite — the Lee et al. 2022 rule as
    // actually stated ("remove it from all but one"): tx24 excises
    // every duplicated span everywhere (the conservative form); this
    // keeps the min-(doc, pos) instance of each duplicated gram so
    // exactly one copy of every duplicated run survives the corpus.
    // Same plan as tx24 — the keeper is a map-side-combinable min
    // riding the existing gram-domain agg; nothing new shuffles.
    "tx26_substring_keepfirst" -> ((s, d) =>
      substringRewrite(docs(s, d), 20, keepFirst = true).orderBy(col("doc_id"))),

    "tx25_bpe_train" -> ((s, d) => {
      val wf0 = docs(s, d)
        .select(explode(split(lower(col("text")), " ")).as("w0"))
        .groupBy(col("w0")).agg(count(lit(1)).as("wcnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // r13: the per-word pair census rides the native bigram kernel
      // (tx08's BigramCountsExpr): distinct bigrams with counts in one
      // pass, so the explode carries ~0.3 rows/char instead of one row
      // per position and the interpreted substr transform disappears.
      // Σ wcnt·c over distinct bigrams == Σ wcnt over positions, the
      // exact same census (sub-2-char words yield an empty array, the
      // old otherwise-branch).
      def top(df: DataFrame, wcol: String, i: Int): DataFrame = df
        .select(col("wcnt"),
          explode(graft.functions.TextFunctions.bigramCounts(col(wcol))).as("p"))
        .groupBy(col("p.bg").as("pair"))
        .agg(sum(col("wcnt") * col("p.c")).as("pc"))
        .orderBy(col("pc").desc, col("pair")).limit(1)
        .select(col("pair").as(s"m$i"), col("pc").as(s"pc$i"))
      // each merged vocab persists: round i+1's census AND the next
      // apply both read it, and without the cache boundary the three
      // rounds' crossJoin trees re-nest multiplicatively (the in-query
      // analog of kmeansTrain's per-round localCheckpoint)
      val t1 = top(wf0, "w0", 1)
      val wf1 = wf0.crossJoin(broadcast(t1))
        .withColumn("w1", expr("replace(w0, m1, char(1))"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t2 = top(wf1, "w1", 2)
      val wf2 = wf1.crossJoin(broadcast(t2))
        .withColumn("w2", expr("replace(w1, m2, char(2))"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t3 = top(wf2, "w2", 3)
      val all = t1.crossJoin(t2).crossJoin(t3)
        .withColumn("l1", col("m1"))
        .withColumn("l2", expr("replace(m2, char(1), '(' || l1 || ')')"))
        .withColumn("l3", expr(
          "replace(replace(m3, char(1), '(' || l1 || ')'), char(2), '(' || l2 || ')')"))
      all.select(lit(1).as("rank"), col("l1").as("merge_label"), col("pc1").as("pair_count"))
        .union(all.select(lit(2).as("rank"), col("l2"), col("pc2")))
        .union(all.select(lit(3).as("rank"), col("l3"), col("pc3")))
        .orderBy(col("rank"))
    })
  )

  /** Shared rational ln: exact power-of-two range reduction + 4-term
    * atanh series. Every operation is IEEE +,-,*,/ (or an exact CASE
    * threshold compare), written in the SAME association order as the
    * oracle SQL — both engines produce bit-identical doubles. Valid
    * for x in [1, 2^40); |error| < 2e-5. */
  private[graft] def approxLn(x: Column): Column = {
    var e: Column = lit(0.0)
    var p: Column = lit(1.0)
    for (k <- 1 to 40) {
      val t = lit(math.pow(2.0, k))
      e = when(x >= t, lit(k.toDouble)).otherwise(e)
      p = when(x >= t, t).otherwise(p)
    }
    val m = x / p
    val z = (m - lit(1.0)) / (m + lit(1.0))
    val z2 = z * z
    val z4 = z2 * z2
    val z6 = z4 * z2
    val series = lit(1.0) + z2 / lit(3.0) + z4 / lit(5.0) + z6 / lit(7.0)
    e * lit(0.6931471805599453) + lit(2.0) * z * series
  }

  /** The oracle-side twin of [[approxLn]]'s range reduction: CASE
    * chains over exact power-of-two thresholds. */
  private def eCaseSql(x: String): String =
    (40 to 1 by -1).map(k => s"WHEN $x >= ${math.pow(2.0, k).toLong}.0 THEN ${k}.0")
      .mkString("CASE ", " ", " ELSE 0.0 END")
  private def pCaseSql(x: String): String =
    (40 to 1 by -1).map(k => s"WHEN $x >= ${math.pow(2.0, k).toLong}.0 THEN ${math.pow(2.0, k).toLong}.0")
      .mkString("CASE ", " ", " ELSE 1.0 END")

  /** tx18's core, reusable on any (doc_id, text) frame: maximal
    * corpus-duplicated char-`k`-gram spans per doc via the
    * gaps-and-islands interval merge. Returns one row per doc:
    * (doc_id, len, n_spans, dup_chars, max_span, dup_milli). */
  private[graft] def substringSpans(docDf: DataFrame, k: Int): DataFrame = {
    val base = docDf.withColumn("norm", lower(col("text")))
    val spans = spanIntervals(base.select(col("doc_id"), col("norm")), k)
      .withColumn("span_chars", col("e") - col("s") + 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("span_chars")).as("dup_chars"),
        max(col("span_chars")).as("max_span"))
    base.select(col("doc_id"), length(col("norm")).cast("long").as("len"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("len"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_chars"), lit(0L)).cast("long").as("dup_chars"),
        coalesce(col("max_span"), lit(0L)).cast("long").as("max_span"))
      .withColumn("dup_milli", expr("(dup_chars * 1000) DIV len"))
  }

  /** The maximal duplicated-span INTERVALS behind tx18 and tx24: one
    * row per (doc_id, island) with 1-based inclusive char bounds
    * [s, e]. `base` must carry (doc_id, norm).
    *
    * Grams leave the row as 8-byte xxhash64 keys, never as strings:
    * the gram-domain agg + join back are the operator's entire wire
    * cost, and k=20 chars -> 8 bytes is a 2.5x cut on both (measured
    * 64x blowup: the string form hit a shuffle-memory knee). A 64-bit
    * collision would mark one spurious window (P ~ n^2/2^65 — ~5e-4
    * at 10^8 grams); the spans are a dedup HEURISTIC feeding a
    * rewrite, so that trade is right — the DuckDB oracle keeps raw
    * grams and agrees exactly at the checked SFs. The dup-gram join
    * is candidate-restricted (only grams with n_occ >= 2 come back);
    * the island merge is a per-doc lag + running sum — task input
    * bounded by doc length, never the corpus. */
  private[graft] def spanIntervals(base: DataFrame, k: Int,
                                   keepFirst: Boolean = false): DataFrame = {
    val g = base
      .select(col("doc_id"),
        explode(when(length(col("norm")) >= k,
          transform(sequence(lit(1), length(col("norm")) - (k - 1)),
            i => struct(i.as("pos"),
              xxhash64(col("norm").substr(i, lit(k))).as("h"))))
          .otherwise(typedLit(Seq.empty[(Int, Long)])
            .cast("array<struct<pos:int,h:bigint>>"))).as("pg"))
      .select(col("doc_id"), col("pg.pos").as("pos"), col("pg.h").as("h"))
    // keepFirst: the paper's actual removal rule — ONE occurrence of
    // each duplicated gram survives (the lexicographic-min (doc, pos)
    // instance, tx16's keep-first discipline at gram granularity), so
    // the corpus keeps exactly one copy of every duplicated run
    // instead of losing it everywhere. The keeper rides the same dup
    // agg as a map-side-combinable min(struct) — topology unchanged,
    // total over the FULL Long doc_id domain (a packed
    // doc_id*2^32+pos bigint would overflow past doc_id 2^31 and
    // misorder negative ids); both engines order rows the same way so
    // the tie-break is engine-exact.
    val marked =
      if (!keepFirst) {
        val dup = g.groupBy(col("h")).agg(count(lit(1)).as("n_occ"))
          .filter(col("n_occ") >= 2)
        g.join(dup, "h").select(col("doc_id"), col("pos"))
      } else {
        val dup = g.groupBy(col("h"))
          .agg(count(lit(1)).as("n_occ"),
            min(struct(col("doc_id"), col("pos"))).as("keep"))
          .filter(col("n_occ") >= 2)
        g.join(dup, "h")
          .filter(!(col("doc_id") === col("keep.doc_id") && col("pos") === col("keep.pos")))
          .select(col("doc_id"), col("pos"))
      }
    val wl = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("prev", lag(col("pos"), 1).over(wl))
      // intervals [pos, pos+k-1] merge when they overlap or touch
      .withColumn("brk", when(col("prev").isNull || col("pos") > col("prev") + k, 1L)
        .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(wl))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + k - 1).as("e"))
  }

  /** tx24's core: each doc REWRITTEN with its maximal duplicated
    * spans excised — the removal step of Lee et al. 2022 that tx18's
    * span census stops short of (tx16's oracle-checked-rewrite
    * discipline at span granularity). Returns one row per doc with
    * the kept-char accounting and the md5 of the rewritten text, so
    * the EDIT itself is hash-checked, not just counted. Cost is
    * tx18's exactly: one gram-domain shuffle, a candidate-restricted
    * join back, per-doc island merge; the rewrite is a per-row fold
    * over the doc's own O(n_spans) sorted intervals against the
    * already-materialized `norm` column (never re-derived per
    * element — the r8 long-doc-sweep rule), and only digests ride
    * the output. */
  private[graft] def substringRewrite(docDf: DataFrame, k: Int,
                                      keepFirst: Boolean = false): DataFrame = {
    val base = docDf.withColumn("norm", lower(col("text")))
    val perDoc = spanIntervals(base.select(col("doc_id"), col("norm")), k, keepFirst)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).cast("long").as("dup_chars"),
        array_sort(collect_list(struct(col("s"), col("e")))).as("ivs"))
    base
      .select(col("doc_id"), col("norm"), length(col("norm")).cast("long").as("len"))
      .join(perDoc, Seq("doc_id"), "left")
      // fold over the sorted disjoint intervals: carry (cur, acc) —
      // append the kept gap before each span, skip the span, then the
      // tail from the last span's end to the end of the doc
      .withColumn("rewritten",
        when(col("ivs").isNull, col("norm")).otherwise(
          aggregate(col("ivs"),
            struct(lit(1).as("cur"), lit("").as("acc")),
            (st, iv) => struct(
              (iv.getField("e") + 1).as("cur"),
              concat(st.getField("acc"),
                col("norm").substr(st.getField("cur"),
                  iv.getField("s") - st.getField("cur"))).as("acc")),
            st => concat(st.getField("acc"),
              col("norm").substr(st.getField("cur"),
                (col("len") + 1).cast("int") - st.getField("cur"))))))
      .select(col("doc_id"), col("len"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        (col("len") - coalesce(col("dup_chars"), lit(0L))).as("kept_chars"),
        expr("((len - coalesce(dup_chars, 0)) * 1000) DIV len").as("kept_milli"),
        md5(col("rewritten")).as("rewrite_md5"))
  }

  /** tx19's core, reusable on any frame with a `text` column: the
    * top-`topK` BPE merge candidates (adjacent char pairs weighted by
    * word frequency). Counted over the DISTINCT-WORD domain; top-K
    * via TakeOrderedAndProject before the K-row rank window. */
  private[graft] def bpePairs(docDf: DataFrame, topK: Int): DataFrame = {
    val wf = docDf
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wcnt"))
    // r13: native bigram census (the tx25 rework) — Σ wcnt·c over
    // distinct bigrams equals the per-position sum exactly
    val pairs = wf
      .select(col("wcnt"),
        explode(graft.functions.TextFunctions.bigramCounts(col("word"))).as("p"))
      .groupBy(col("p.bg").as("pair"))
      .agg(sum(col("wcnt") * col("p.c")).as("pair_count"))
    val rw = Window.orderBy(col("pair_count").desc, col("pair"))
    pairs.orderBy(col("pair_count").desc, col("pair")).limit(topK)
      .withColumn("rank", row_number().over(rw))
      .select(col("rank"), col("pair"), col("pair_count"))
      .orderBy(col("rank"))
  }

  /** tx17's frozen-model feature+score projection over a `documents`
    * frame — shared with dd15's keep-best canonical selection so both
    * operators score identically. Zero-shuffle per-row expressions. */
  private[graft] def qualityScored(docDf: DataFrame): DataFrame = {
    // all three token stats in ONE native byte pass (no split array,
    // no interpreted per-token lexicon filter, no array_distinct) —
    // value-exact with the composed forms, spec-pinned
    docDf
      .withColumn("_ts",
        graft.functions.TextFunctions.tokenProfile(col("text"), TextOps.langLex("en")))
      .select(col("doc_id"), col("source"),
        col("_ts").getField("n_words").as("n_words"),
        col("_ts").getField("n_stop").as("n_stop"),
        col("_ts").getField("n_uniq").as("n_uniq"),
        length(col("text")).as("len_chars"))
      .withColumn("stop_milli", expr("(CAST(n_stop AS BIGINT) * 1000) DIV n_words"))
      .withColumn("distinct_milli", expr("(CAST(n_uniq AS BIGINT) * 1000) DIV n_words"))
      .withColumn("awl_milli", expr("(CAST(len_chars - n_words + 1 AS BIGINT) * 1000) DIV n_words"))
      .withColumn("score", expr(QualityWeights.scoreSql))
  }

  /** tx27's training features over any documents frame: tx17's
    * integer features (stop/distinct milli) + the two band INDICATORS
    * (linearized, so tx17's teacher gate is exactly linear in them) +
    * a bias column, with the teacher label y ∈ {+1, −1}. Shared by
    * the registered query and ApiSpec's verb-replay pin. */
  private[graft] def qualityFeatureFrame(docDf: DataFrame): DataFrame =
    qualityScored(docDf)
      .select(
        col("stop_milli").as("f1"), col("distinct_milli").as("f2"),
        when(col("awl_milli").between(3000, 8000), 1000L).otherwise(0L).as("f3"),
        when(col("n_words").between(50, 300), 1000L).otherwise(0L).as("f4"),
        lit(1000L).as("f5"),
        when(col("score") >= QualityWeights.thMid, 1L).otherwise(-1L).as("y"))

  /** tx17's frozen linear model — single source of truth for BOTH
    * engines (the oracle interpolates the same constants). */
  private[graft] object QualityWeights {
    val (bias, wStop, wDistinct, awlBonus, lenBonus) = (-1200L, 3L, 1L, 500L, 800L)
    val thHi = 700L
    val thMid = 300L
    val scoreSql: String =
      s"$bias + $wStop * stop_milli + $wDistinct * distinct_milli + " +
      s"(CASE WHEN awl_milli BETWEEN 3000 AND 8000 THEN $awlBonus ELSE 0 END) + " +
      s"(CASE WHEN n_words BETWEEN 50 AND 300 THEN $lenBonus ELSE 0 END)"
    val labelSql: String =
      s"CASE WHEN score >= $thHi THEN 'hi' WHEN score >= $thMid THEN 'mid' ELSE 'lo' END"
    /** DuckDB CTE chain ending in `qsc(doc_id, source, n_words,
      * stop_milli, distinct_milli, awl_milli, score)` — the oracle
      * twin of [[Curation.qualityScored]], shared by tx17 and dd15. */
    lazy val scoredCteSql: String = {
      val en = TextOps.langLex("en").map(w => s"'$w'").mkString("[", ", ", "]")
      s"""qbase AS (
        | SELECT doc_id, source, string_split(text, ' ') AS toks,
        |  CAST(length(text) AS INT) AS len_chars FROM documents),
        |qfeat AS (
        | SELECT doc_id, source,
        |  CAST(len(toks) AS INT) AS n_words,
        |  CAST(len(list_filter(toks, t -> list_contains($en, t))) AS INT) AS n_stop,
        |  CAST(len(list_distinct(toks)) AS INT) AS n_uniq, len_chars
        | FROM qbase),
        |qm AS (
        | SELECT doc_id, source, n_words,
        |  (CAST(n_stop AS BIGINT) * 1000) // n_words AS stop_milli,
        |  (CAST(n_uniq AS BIGINT) * 1000) // n_words AS distinct_milli,
        |  (CAST(len_chars - n_words + 1 AS BIGINT) * 1000) // n_words AS awl_milli
        | FROM qfeat),
        |qsc AS (
        | SELECT *, $scoreSql AS score FROM qm)""".stripMargin
    }
  }

  val oracle: Map[String, String] = Map(
    "tx09_dup_ngrams" ->
      """WITH w AS (
        | SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
        |g AS (
        | SELECT doc_id, array_to_string(list_slice(words, i, i + 4), ' ') AS gram
        | FROM w, unnest(generate_series(1, len(words) - 4)) AS t(i)
        | WHERE len(words) >= 5),
        |dfreq AS (
        | SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY 1)
        |SELECT g.doc_id, count(*) AS n_spans,
        | CAST(sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
        | (CAST(sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 1000) // count(*) AS dup_milli
        |FROM g JOIN dfreq USING (gram)
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,
    "tx10_repetition" ->
      """WITH w AS (
        | SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
        |wc AS (
        | SELECT doc_id, unnest(words) AS word FROM w),
        |cnts AS (
        | SELECT doc_id, word, count(*) AS cnt FROM wc GROUP BY 1, 2),
        |ranked AS (
        | SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, word) AS rn
        | FROM cnts),
        |top AS (
        | SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
        |  max(CASE WHEN rn = 1 THEN word END) AS top_word,
        |  CAST(max(CASE WHEN rn = 1 THEN cnt END) AS BIGINT) AS top_cnt
        | FROM ranked GROUP BY doc_id),
        |bg AS (
        | SELECT doc_id,
        |  CAST(len(bgs) AS BIGINT) AS n_bigrams,
        |  CAST(len(list_distinct(bgs)) AS BIGINT) AS n_dist_bigrams
        | FROM (SELECT doc_id,
        |        CASE WHEN len(words) >= 2
        |          THEN list_transform(generate_series(1, len(words) - 1),
        |                 i -> array_to_string(list_slice(words, i, i + 1), ' '))
        |          ELSE [] END AS bgs
        |       FROM w)),
        |m AS (
        | SELECT top.doc_id, n_words, top_word, top_cnt,
        |  (top_cnt * 1000) // n_words AS top_word_milli,
        |  n_bigrams, n_dist_bigrams,
        |  CASE WHEN n_bigrams = 0 THEN 0
        |       ELSE ((n_bigrams - n_dist_bigrams) * 1000) // n_bigrams END AS dup_bigram_milli
        | FROM top JOIN bg USING (doc_id))
        |SELECT doc_id, n_words, top_word, top_cnt, top_word_milli,
        | n_bigrams, n_dist_bigrams, dup_bigram_milli,
        | (top_word_milli <= 100 AND dup_bigram_milli <= 250) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "tx11_decontam" ->
      """WITH w AS (
        | SELECT doc_id, source, string_split(lower(text), ' ') AS words FROM documents),
        |g AS (
        | SELECT doc_id, source, array_to_string(list_slice(words, i, i + 4), ' ') AS gram
        | FROM w, unnest(generate_series(1, len(words) - 4)) AS t(i)
        | WHERE len(words) >= 5),
        |bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        |cand AS (SELECT DISTINCT doc_id, gram FROM g WHERE source <> 'src0')
        |SELECT cand.doc_id, count(*) AS n_grams,
        | CAST(sum(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
        | sum(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END) > 0 AS contaminated
        |FROM cand LEFT JOIN bench ON cand.gram = bench.gram
        |GROUP BY cand.doc_id ORDER BY cand.doc_id""".stripMargin,
    "tx30_vocab_coverage" ->
      """WITH w AS (
        | SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |wc AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM wc),
        |r AS (
        | SELECT CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS rn,
        |  CAST(sum(cnt) OVER (ORDER BY cnt DESC, word
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        | FROM wc),
        |q AS (SELECT CAST(unnest([500, 900, 950, 990]) AS INT) AS q_milli)
        |SELECT q_milli,
        | min(rn) AS vocab_size, min(cum) AS cum_tokens,
        | max(total) AS total_tokens,
        | (min(cum) * 1000) // max(total) AS coverage_milli
        |FROM r CROSS JOIN tot CROSS JOIN q
        |WHERE cum * 1000 >= q_milli * total
        |GROUP BY 1 ORDER BY q_milli""".stripMargin,
    // tx35: floor(log2(rank)) is exact in both engines — log2 of a
    // power of two is an exact IEEE double, and for non-powers the
    // true value sits far from an integer at any realistic |V|.
    "tx35_zipf_profile" ->
      """WITH wc AS (
        | SELECT word, CAST(count(*) AS BIGINT) AS cnt
        | FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        | GROUP BY 1),
        |r AS (SELECT word, cnt,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS rank
        | FROM wc),
        |b AS (
        | SELECT CAST(floor(log2(rank)) AS INT) AS band,
        |  CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(cnt) AS BIGINT) AS band_mass,
        |  CAST(min(rank) AS BIGINT) AS rank_lo,
        |  CAST(max(rank) AS BIGINT) AS rank_hi
        | FROM r GROUP BY 1),
        |t AS (SELECT CAST(sum(band_mass) AS BIGINT) AS total FROM b)
        |SELECT band, rank_lo, rank_hi, n_words, band_mass,
        | CAST((band_mass * 1000) // t.total AS BIGINT) AS mass_milli
        |FROM b, t ORDER BY band""".stripMargin,
    "tx12_vocab" ->
      """WITH wc AS (
        | SELECT word, count(*) AS cnt
        | FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        | GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM wc),
        |r AS (
        | SELECT word, cnt,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, word) AS INT) AS rank,
        |  CAST(sum(cnt) OVER (ORDER BY cnt DESC, word
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        | FROM wc)
        |SELECT rank, word, cnt, cum, (cum * 1000) // t.total AS coverage_milli
        |FROM r, t WHERE rank <= 64 ORDER BY rank""".stripMargin,

    // tx15 oracle: the exact heavy-hitter twin. DuckDB has no
    // Misra-Gries, so the booleans are literal TRUE here — the
    // engine-side booleans are the sketch's self-certification (they
    // MUST read true for the guarantees to have held; a violated
    // bound turns the row red on hash), while term/cnt/n pin the
    // exact values both engines must agree on.
    "tx15_heavy_hitters" ->
      """WITH w AS (
        | SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents),
        |tot AS (SELECT count(*) AS n FROM w),
        |ex AS (SELECT term, count(*) AS cnt FROM w GROUP BY 1)
        |SELECT term, cnt, n,
        | TRUE AS in_sketch, TRUE AS count_within_bound
        |FROM ex, tot WHERE cnt * 65 > n ORDER BY term""".stripMargin,
    "tx31_boilerplate" ->
      """WITH w AS (
        | SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |l AS (
        | SELECT doc_id,
        |  array_to_string(list_slice(words, i * 10 + 1, i * 10 + 10), ' ') AS line
        | FROM w, unnest(generate_series(0, (len(words) - 1) // 10)) AS t(i)),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |g AS (SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
        |  CAST(count(*) AS BIGINT) AS n_inst FROM l GROUP BY 1)
        |SELECT line, df, n_inst, (df * 1000) // n_docs AS df_milli
        |FROM g, n WHERE df >= GREATEST(3, (n_docs + 99) // 100)
        |ORDER BY df DESC, line""".stripMargin,
    "tx16_line_dedup" ->
      """WITH w AS (
        | SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |lines AS (
        | SELECT doc_id, i AS pos,
        |  array_to_string(list_slice(words, i * 10 + 1, i * 10 + 10), ' ') AS line,
        |  doc_id * 1000000 + i AS inst
        | FROM w, unnest(generate_series(0, (len(words) - 1) // 10)) AS t(i)),
        |keeper AS (SELECT line, min(inst) AS keep_inst FROM lines GROUP BY 1),
        |f AS (
        | SELECT l.doc_id, l.pos, l.line, l.inst = k.keep_inst AS kept
        | FROM lines l JOIN keeper k USING (line))
        |SELECT doc_id, count(*) AS n_lines,
        | CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
        | CAST(((count(*) - sum(CASE WHEN kept THEN 0 ELSE 1 END)) * 1000) // count(*) AS BIGINT) AS kept_milli,
        | substr(md5(coalesce(string_agg(line, '|' ORDER BY pos) FILTER (WHERE kept), '')), 1, 8) AS kept_fp8
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // tx38: tx16's 10-word line chunks, distinct per source, exact
    // line-set Jaccard per canonical source pair.
    "tx38_boiler_overlap" ->
      """WITH w AS (
        | SELECT source, string_split(text, ' ') AS words FROM documents),
        |lines0 AS (
        | SELECT DISTINCT source,
        |  array_to_string(list_slice(words, i * 10 + 1, i * 10 + 10), ' ') AS line
        | FROM w, unnest(generate_series(0, (len(words) - 1) // 10)) AS t(i)),
        |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM lines0 GROUP BY 1),
        |sh AS (
        | SELECT a.source AS source_1, b.source AS source_2,
        |  CAST(count(*) AS BIGINT) AS n_shared
        | FROM lines0 a JOIN lines0 b ON a.line = b.line AND a.source < b.source
        | GROUP BY 1, 2)
        |SELECT source_1, source_2, t1.n AS n1, t2.n AS n2, n_shared,
        | (n_shared * 1000) // (t1.n + t2.n - n_shared) AS jaccard_milli
        |FROM sh JOIN tot t1 ON t1.source = sh.source_1
        |JOIN tot t2 ON t2.source = sh.source_2
        |ORDER BY source_1, source_2""".stripMargin,
    "tx17_quality_classifier" ->
      s"""WITH ${QualityWeights.scoredCteSql}
        |SELECT doc_id, source, n_words, stop_milli, distinct_milli, awl_milli, score,
        | ${QualityWeights.labelSql} AS label,
        | score >= ${QualityWeights.thMid} AS keep
        |FROM qsc ORDER BY doc_id""".stripMargin,
    "tx27_quality_train" -> {
      def upd(d: String, k: String): String =
        s"(CASE WHEN $k = 0 THEN CAST(0 AS BIGINT) " +
        s"WHEN $d >= 0 THEN CAST(($d * 1000) // $k AS BIGINT) " +
        s"ELSE CAST(-((-$d * 1000) // $k) AS BIGINT) END)"
      s"""WITH ${QualityWeights.scoredCteSql},
        |f AS (
        | SELECT stop_milli AS f1, distinct_milli AS f2,
        |  CAST(CASE WHEN awl_milli BETWEEN 3000 AND 8000 THEN 1000 ELSE 0 END AS BIGINT) AS f3,
        |  CAST(CASE WHEN n_words BETWEEN 50 AND 300 THEN 1000 ELSE 0 END AS BIGINT) AS f4,
        |  CAST(1000 AS BIGINT) AS f5,
        |  CAST(CASE WHEN score >= ${QualityWeights.thMid} THEN 1 ELSE -1 END AS BIGINT) AS y
        | FROM qsc),
        |g1 AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_mis,
        |  CAST(coalesce(sum(y*f1), 0) AS BIGINT) AS d1, CAST(coalesce(sum(y*f2), 0) AS BIGINT) AS d2,
        |  CAST(coalesce(sum(y*f3), 0) AS BIGINT) AS d3, CAST(coalesce(sum(y*f4), 0) AS BIGINT) AS d4,
        |  CAST(coalesce(sum(y*f5), 0) AS BIGINT) AS d5
        | FROM f WHERE y * 0 <= 0),
        |w1 AS (SELECT n_mis,
        |  ${upd("d1", "n_mis")} AS w1, ${upd("d2", "n_mis")} AS w2, ${upd("d3", "n_mis")} AS w3,
        |  ${upd("d4", "n_mis")} AS w4, ${upd("d5", "n_mis")} AS w5 FROM g1),
        |g2 AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_mis,
        |  CAST(coalesce(sum(y*f1), 0) AS BIGINT) AS d1, CAST(coalesce(sum(y*f2), 0) AS BIGINT) AS d2,
        |  CAST(coalesce(sum(y*f3), 0) AS BIGINT) AS d3, CAST(coalesce(sum(y*f4), 0) AS BIGINT) AS d4,
        |  CAST(coalesce(sum(y*f5), 0) AS BIGINT) AS d5
        | FROM f, w1
        | WHERE y * (f1*w1.w1 + f2*w1.w2 + f3*w1.w3 + f4*w1.w4 + f5*w1.w5) <= 0),
        |w2 AS (SELECT g2.n_mis,
        |  w1.w1 + ${upd("g2.d1", "g2.n_mis")} AS w1, w1.w2 + ${upd("g2.d2", "g2.n_mis")} AS w2,
        |  w1.w3 + ${upd("g2.d3", "g2.n_mis")} AS w3, w1.w4 + ${upd("g2.d4", "g2.n_mis")} AS w4,
        |  w1.w5 + ${upd("g2.d5", "g2.n_mis")} AS w5 FROM w1, g2),
        |g3 AS (
        | SELECT CAST(count(*) AS BIGINT) AS n_mis,
        |  CAST(coalesce(sum(y*f1), 0) AS BIGINT) AS d1, CAST(coalesce(sum(y*f2), 0) AS BIGINT) AS d2,
        |  CAST(coalesce(sum(y*f3), 0) AS BIGINT) AS d3, CAST(coalesce(sum(y*f4), 0) AS BIGINT) AS d4,
        |  CAST(coalesce(sum(y*f5), 0) AS BIGINT) AS d5
        | FROM f, w2
        | WHERE y * (f1*w2.w1 + f2*w2.w2 + f3*w2.w3 + f4*w2.w4 + f5*w2.w5) <= 0),
        |w3 AS (SELECT g3.n_mis,
        |  w2.w1 + ${upd("g3.d1", "g3.n_mis")} AS w1, w2.w2 + ${upd("g3.d2", "g3.n_mis")} AS w2,
        |  w2.w3 + ${upd("g3.d3", "g3.n_mis")} AS w3, w2.w4 + ${upd("g3.d4", "g3.n_mis")} AS w4,
        |  w2.w5 + ${upd("g3.d5", "g3.n_mis")} AS w5 FROM w2, g3)
        |SELECT CAST(1 AS BIGINT) AS iter, n_mis, w1 AS w_stop, w2 AS w_distinct,
        |  w3 AS w_awl, w4 AS w_len, w5 AS w_bias FROM w1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), n_mis, w1, w2, w3, w4, w5 FROM w2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), n_mis, w1, w2, w3, w4, w5 FROM w3
        |ORDER BY iter""".stripMargin
    },
    "tx13_normalize" ->
      """WITH c AS (
        | SELECT doc_id,
        |  regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g') AS cl
        | FROM documents),
        |t AS (
        | SELECT doc_id, list_filter(string_split(trim(cl), ' '),
        |   x -> NOT list_contains(['the','a','of','and','to','is'], x) AND length(x) > 0) AS toks
        | FROM c),
        |st AS (
        | SELECT doc_id, list_transform(toks, x ->
        |   CASE WHEN length(x) >= 6 AND right(x, 3) = 'ing' THEN substr(x, 1, length(x)-3)
        |        WHEN length(x) >= 5 AND right(x, 2) = 'ed' THEN substr(x, 1, length(x)-2)
        |        WHEN length(x) >= 5 AND right(x, 2) = 'es' THEN substr(x, 1, length(x)-2)
        |        WHEN length(x) >= 5 AND right(x, 1) = 's' THEN substr(x, 1, length(x)-1)
        |        ELSE x END) AS nt
        | FROM t)
        |SELECT doc_id, CAST(len(nt) AS INT) AS n_norm_tokens,
        | md5(array_to_string(nt, ' ')) AS norm_md5,
        | array_to_string(list_slice(nt, 1, 5), ' ') AS head5
        |FROM st ORDER BY doc_id""".stripMargin,
    // sp15: clamp + one-round residual redistribution recomputed over
    // the same integer weights; floor(sqrt(x·10⁶)) agrees (sp04's
    // established FP-safe form).
    "sp15_mixture_caps" ->
      """WITH base AS (
        | SELECT source, CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS n_toks
        | FROM documents GROUP BY 1),
        |w AS (SELECT source, n_toks,
        |  CAST(floor(sqrt(CAST(n_toks AS DOUBLE) * 1000000)) AS BIGINT) AS wgt FROM base),
        |tot AS (SELECT CAST(sum(wgt) AS BIGINT) AS tot_w FROM w),
        |raw AS (
        | SELECT source, n_toks, (wgt * 1000) // tot.tot_w AS raw_milli,
        |  least(CAST(150 AS BIGINT), greatest(CAST(25 AS BIGINT),
        |    (wgt * 1000) // tot.tot_w)) AS clamped_milli
        | FROM w, tot),
        |raw2 AS (SELECT *, clamped_milli <> raw_milli AS clamped FROM raw),
        |res AS (
        | SELECT 1000 - CAST(sum(clamped_milli) AS BIGINT) AS residual,
        |  CAST(sum(CASE WHEN NOT clamped THEN raw_milli ELSE 0 END) AS BIGINT) AS free_mass
        | FROM raw2)
        |SELECT source, n_toks, CAST(raw_milli AS BIGINT) AS raw_milli,
        | CAST(clamped_milli AS BIGINT) AS clamped_milli, clamped,
        | CAST(CASE WHEN clamped THEN clamped_milli
        |      ELSE clamped_milli + (res.residual * raw_milli) // greatest(1, res.free_mass)
        |      END AS BIGINT) AS final_milli
        |FROM raw2, res ORDER BY source""".stripMargin,
    "sp04_temperature" ->
      """WITH base AS (
        | SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_cnt
        | FROM documents),
        |srcw AS (
        | SELECT source, CAST(sum(tok_cnt) AS BIGINT) AS n_toks,
        |  CAST(floor(sqrt(CAST(sum(tok_cnt) AS DOUBLE) * 1000000)) AS BIGINT) AS wgt
        | FROM base GROUP BY 1),
        |tot AS (SELECT CAST(sum(wgt) AS BIGINT) AS tot_w FROM srcw),
        |budgets AS (
        | SELECT source, n_toks, wgt, (wgt * 200) // tot.tot_w AS budget_docs
        | FROM srcw, tot),
        |r AS (
        | SELECT source, doc_id, tok_cnt,
        |  CAST(row_number() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':sp04'), doc_id) AS INT) AS rn
        | FROM base)
        |SELECT r.source, r.rn, r.doc_id, r.tok_cnt, b.budget_docs
        |FROM r JOIN budgets b ON r.source = b.source
        |WHERE r.rn <= b.budget_docs
        |ORDER BY r.source, r.rn""".stripMargin,
    "px05_split_leakage" ->
      """WITH w AS (
        | SELECT doc_id, source,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':sp05'), 1, 2) < '0d' THEN 'val'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':sp05'), 1, 2) < '1a' THEN 'test'
        |       ELSE 'train' END AS split,
        |  string_split(lower(text), ' ') AS words
        | FROM documents),
        |g AS (
        | SELECT doc_id, split, array_to_string(list_slice(words, i, i + 4), ' ') AS gram
        | FROM w, unnest(generate_series(1, len(words) - 4)) AS t(i)
        | WHERE len(words) >= 5),
        |train AS (SELECT DISTINCT gram FROM g WHERE split = 'train'),
        |contam AS (
        | SELECT DISTINCT g.doc_id FROM g JOIN train USING (gram) WHERE g.split <> 'train')
        |SELECT w.source, w.split, count(*) AS n_docs,
        | CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky,
        | CAST((sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1000) // count(*) AS BIGINT) AS leak_milli
        |FROM w LEFT JOIN contam c ON w.doc_id = c.doc_id
        |WHERE w.split <> 'train'
        |GROUP BY 1, 2 ORDER BY source, split""".stripMargin,
    // tx33: the oracle recomputes the five per-doc rules (dominance
    // via a plain explode + per-doc max — oracle-side only) and the
    // same sequential/marginal rollup, emitting the rule table as a
    // UNION ALL over the one-row aggregate.
    "tx33_gopher_gate" ->
      """WITH t AS (
        | SELECT doc_id, text IS NULL AS tnull, string_split(text, ' ') AS toks,
        |  CAST(length(text) AS BIGINT) AS lc,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
        | FROM documents),
        |dom AS (
        | SELECT doc_id, CAST(max(c) AS BIGINT) AS mxc FROM (
        |   SELECT doc_id, w, count(*) AS c
        |   FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY 1, 2)
        | GROUP BY 1),
        |f AS (
        | SELECT t.doc_id,
        |  (t.tnull OR t.nw < 30 OR t.nw > 90) AS f1,
        |  (((t.lc - t.nw + 1) * 1000) // t.nw < 4300
        |    OR ((t.lc - t.nw + 1) * 1000) // t.nw > 4700) AS f2,
        |  (len(list_filter(t.toks,
        |     x -> x IN ('the','a','of','and','to','in','is','it'))) < 2) AS f3,
        |  ((d.mxc * 1000) // t.nw > 120) AS f4,
        |  ((CAST(len(list_distinct(t.toks)) AS BIGINT) * 1000) // t.nw < 380) AS f5
        | FROM t LEFT JOIN dom d USING (doc_id)),
        |g AS (
        | SELECT CAST(count(*) AS BIGINT) AS n0,
        |  CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
        |  CAST(sum(CASE WHEN NOT f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
        |  CAST(sum(CASE WHEN NOT f1 AND NOT f2 AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
        |  CAST(sum(CASE WHEN NOT f1 AND NOT f2 AND NOT f3 AND f4 THEN 1 ELSE 0 END) AS BIGINT) AS s4,
        |  CAST(sum(CASE WHEN NOT f1 AND NOT f2 AND NOT f3 AND NOT f4 AND f5 THEN 1 ELSE 0 END) AS BIGINT) AS s5,
        |  CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS m2,
        |  CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS m3,
        |  CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS m4,
        |  CAST(sum(CASE WHEN f5 THEN 1 ELSE 0 END) AS BIGINT) AS m5
        | FROM f),
        |r AS (
        | SELECT CAST(1 AS INT) AS rule_ord, 'word_count' AS rule,
        |   n0 AS n_checked, s1 AS n_fail, s1 AS n_fail_marginal FROM g
        | UNION ALL SELECT 2, 'mean_word_len', n0 - s1, s2, m2 FROM g
        | UNION ALL SELECT 3, 'stopwords', n0 - s1 - s2, s3, m3 FROM g
        | UNION ALL SELECT 4, 'dominance', n0 - s1 - s2 - s3, s4, m4 FROM g
        | UNION ALL SELECT 5, 'diversity', n0 - s1 - s2 - s3 - s4, s5, m5 FROM g
        | UNION ALL SELECT 6, 'survivors', n0 - s1 - s2 - s3 - s4 - s5,
        |   CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM g)
        |SELECT rule_ord, rule, n_checked, n_fail, n_fail_marginal,
        | CASE WHEN n_checked > 0 THEN (n_fail * 1000) // n_checked
        |      ELSE 0 END AS fail_milli
        |FROM r ORDER BY rule_ord""".stripMargin,
    "tx14_quality_quartiles" ->
      """WITH bg AS (
        | SELECT doc_id, source,
        |  unnest(list_transform(generate_series(1, len(lower(text)) - 1),
        |    i -> substr(lower(text), i, 2))) AS bg
        | FROM documents WHERE len(text) >= 2),
        |corpus AS (SELECT bg, count(*) AS cnt FROM bg GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM corpus),
        |freq AS (SELECT bg, (cnt * 1000000) // tot AS freq_ppm FROM corpus, tot),
        |scored AS (
        | SELECT b.doc_id, b.source,
        |  CAST(sum(f.freq_ppm) // count(*) AS BIGINT) AS lm_score_ppm
        | FROM bg b JOIN freq f USING (bg) GROUP BY 1, 2),
        |ranked AS (
        | SELECT source, lm_score_ppm,
        |  CAST(ntile(4) OVER (PARTITION BY source
        |    ORDER BY lm_score_ppm, doc_id) AS INT) AS quartile
        | FROM scored)
        |SELECT source, quartile, count(*) AS n_docs,
        | CAST(min(lm_score_ppm) AS BIGINT) AS lo_ppm,
        | CAST(max(lm_score_ppm) AS BIGINT) AS hi_ppm
        |FROM ranked GROUP BY 1, 2 ORDER BY source, quartile""".stripMargin,
    "tx18_substring_spans" ->
      """WITH n AS (SELECT doc_id, lower(text) AS norm FROM documents),
        |g AS (
        | SELECT doc_id,
        |  unnest(list_transform(generate_series(1, length(norm) - 19),
        |    i -> i)) AS pos,
        |  unnest(list_transform(generate_series(1, length(norm) - 19),
        |    i -> substr(norm, i, 20))) AS gram
        | FROM n WHERE length(norm) >= 20),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        |marked AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
        |isl AS (
        | SELECT doc_id, pos,
        |  CASE WHEN lag(pos) OVER w IS NULL
        |       OR pos > lag(pos) OVER w + 20 THEN 1 ELSE 0 END AS brk
        | FROM marked WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |grp AS (
        | SELECT doc_id, pos,
        |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        | FROM isl),
        |spans AS (
        | SELECT doc_id, island, max(pos) - min(pos) + 20 AS span_chars
        | FROM grp GROUP BY 1, 2),
        |per_doc AS (
        | SELECT doc_id, count(*) AS n_spans,
        |  CAST(sum(span_chars) AS BIGINT) AS dup_chars,
        |  CAST(max(span_chars) AS BIGINT) AS max_span
        | FROM spans GROUP BY 1)
        |SELECT n.doc_id, CAST(length(n.norm) AS BIGINT) AS len,
        | CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
        | CAST(coalesce(p.dup_chars, 0) AS BIGINT) AS dup_chars,
        | CAST(coalesce(p.max_span, 0) AS BIGINT) AS max_span,
        | (CAST(coalesce(p.dup_chars, 0) AS BIGINT) * 1000) // length(n.norm) AS dup_milli
        |FROM n LEFT JOIN per_doc p USING (doc_id)
        |ORDER BY n.doc_id""".stripMargin,
    "tx24_substring_rewrite" ->
      """WITH n AS (SELECT doc_id, lower(text) AS norm FROM documents),
        |g AS (
        | SELECT doc_id,
        |  unnest(list_transform(generate_series(1, length(norm) - 19),
        |    i -> i)) AS pos,
        |  unnest(list_transform(generate_series(1, length(norm) - 19),
        |    i -> substr(norm, i, 20))) AS gram
        | FROM n WHERE length(norm) >= 20),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        |marked AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
        |isl AS (
        | SELECT doc_id, pos,
        |  CASE WHEN lag(pos) OVER w IS NULL
        |       OR pos > lag(pos) OVER w + 20 THEN 1 ELSE 0 END AS brk
        | FROM marked WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |grp AS (
        | SELECT doc_id, pos,
        |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        | FROM isl),
        |iv AS (
        | SELECT doc_id, island, min(pos) AS s, max(pos) + 19 AS e
        | FROM grp GROUP BY 1, 2),
        |per_doc AS (
        | SELECT doc_id, count(*) AS n_spans,
        |  CAST(sum(e - s + 1) AS BIGINT) AS dup_chars
        | FROM iv GROUP BY 1),
        |segs AS (
        | SELECT doc_id,
        |  coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS gs,
        |  s - 1 AS ge
        | FROM iv
        | UNION ALL
        | SELECT i.doc_id, max(i.e) + 1 AS gs, max(length(n.norm)) AS ge
        | FROM iv i JOIN n USING (doc_id) GROUP BY i.doc_id),
        |rw AS (
        | SELECT s.doc_id,
        |  string_agg(CASE WHEN s.gs <= s.ge
        |    THEN substr(n.norm, s.gs, s.ge - s.gs + 1) ELSE '' END,
        |    '' ORDER BY s.gs) AS rewritten
        | FROM segs s JOIN n ON s.doc_id = n.doc_id GROUP BY 1)
        |SELECT n.doc_id, CAST(length(n.norm) AS BIGINT) AS len,
        | CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
        | CAST(length(n.norm) - coalesce(p.dup_chars, 0) AS BIGINT) AS kept_chars,
        | ((length(n.norm) - coalesce(p.dup_chars, 0)) * 1000) // length(n.norm) AS kept_milli,
        | md5(coalesce(r.rewritten, n.norm)) AS rewrite_md5
        |FROM n LEFT JOIN per_doc p USING (doc_id) LEFT JOIN rw r USING (doc_id)
        |ORDER BY n.doc_id""".stripMargin,
    "tx26_substring_keepfirst" ->
      """WITH n AS (SELECT doc_id, lower(text) AS norm FROM documents),
        |g AS (
        | SELECT doc_id,
        |  unnest(list_transform(generate_series(1, length(norm) - 19),
        |    i -> i)) AS pos,
        |  unnest(list_transform(generate_series(1, length(norm) - 19),
        |    i -> substr(norm, i, 20))) AS gram
        | FROM n WHERE length(norm) >= 20),
        |dup AS (
        | SELECT gram, min(struct_pack(d := doc_id, p := pos)) AS keep_inst
        | FROM g GROUP BY gram HAVING count(*) >= 2),
        |marked AS (
        | SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)
        | WHERE NOT (g.doc_id = dup.keep_inst.d AND g.pos = dup.keep_inst.p)),
        |isl AS (
        | SELECT doc_id, pos,
        |  CASE WHEN lag(pos) OVER w IS NULL
        |       OR pos > lag(pos) OVER w + 20 THEN 1 ELSE 0 END AS brk
        | FROM marked WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |grp AS (
        | SELECT doc_id, pos,
        |  sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        | FROM isl),
        |iv AS (
        | SELECT doc_id, island, min(pos) AS s, max(pos) + 19 AS e
        | FROM grp GROUP BY 1, 2),
        |per_doc AS (
        | SELECT doc_id, count(*) AS n_spans,
        |  CAST(sum(e - s + 1) AS BIGINT) AS dup_chars
        | FROM iv GROUP BY 1),
        |segs AS (
        | SELECT doc_id,
        |  coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS gs,
        |  s - 1 AS ge
        | FROM iv
        | UNION ALL
        | SELECT i.doc_id, max(i.e) + 1 AS gs, max(length(n.norm)) AS ge
        | FROM iv i JOIN n USING (doc_id) GROUP BY i.doc_id),
        |rw AS (
        | SELECT s.doc_id,
        |  string_agg(CASE WHEN s.gs <= s.ge
        |    THEN substr(n.norm, s.gs, s.ge - s.gs + 1) ELSE '' END,
        |    '' ORDER BY s.gs) AS rewritten
        | FROM segs s JOIN n ON s.doc_id = n.doc_id GROUP BY 1)
        |SELECT n.doc_id, CAST(length(n.norm) AS BIGINT) AS len,
        | CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
        | CAST(length(n.norm) - coalesce(p.dup_chars, 0) AS BIGINT) AS kept_chars,
        | ((length(n.norm) - coalesce(p.dup_chars, 0)) * 1000) // length(n.norm) AS kept_milli,
        | md5(coalesce(r.rewritten, n.norm)) AS rewrite_md5
        |FROM n LEFT JOIN per_doc p USING (doc_id) LEFT JOIN rw r USING (doc_id)
        |ORDER BY n.doc_id""".stripMargin,
    "tx25_bpe_train" ->
      """WITH wf0 AS (
        | SELECT word AS w0, count(*) AS wcnt
        | FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        | GROUP BY 1),
        |p1 AS (
        | SELECT unnest(list_transform(generate_series(1, length(w0) - 1),
        |   j -> substr(w0, j, 2))) AS pair, wcnt
        | FROM wf0 WHERE length(w0) >= 2),
        |t1 AS (
        | SELECT pair AS m1, pc AS pc1 FROM (
        |  SELECT pair, CAST(sum(wcnt) AS BIGINT) AS pc FROM p1 GROUP BY 1)
        | ORDER BY pc DESC, pair LIMIT 1),
        |wf1 AS (SELECT replace(w0, m1, chr(1)) AS w1, wcnt FROM wf0 CROSS JOIN t1),
        |p2 AS (
        | SELECT unnest(list_transform(generate_series(1, length(w1) - 1),
        |   j -> substr(w1, j, 2))) AS pair, wcnt
        | FROM wf1 WHERE length(w1) >= 2),
        |t2 AS (
        | SELECT pair AS m2, pc AS pc2 FROM (
        |  SELECT pair, CAST(sum(wcnt) AS BIGINT) AS pc FROM p2 GROUP BY 1)
        | ORDER BY pc DESC, pair LIMIT 1),
        |wf2 AS (SELECT replace(w1, m2, chr(2)) AS w2, wcnt FROM wf1 CROSS JOIN t2),
        |p3 AS (
        | SELECT unnest(list_transform(generate_series(1, length(w2) - 1),
        |   j -> substr(w2, j, 2))) AS pair, wcnt
        | FROM wf2 WHERE length(w2) >= 2),
        |t3 AS (
        | SELECT pair AS m3, pc AS pc3 FROM (
        |  SELECT pair, CAST(sum(wcnt) AS BIGINT) AS pc FROM p3 GROUP BY 1)
        | ORDER BY pc DESC, pair LIMIT 1),
        |lbl AS (
        | SELECT m1 AS l1,
        |  replace(m2, chr(1), '(' || m1 || ')') AS l2,
        |  replace(replace(m3, chr(1), '(' || m1 || ')'),
        |          chr(2), '(' || replace(m2, chr(1), '(' || m1 || ')') || ')') AS l3,
        |  pc1, pc2, pc3
        | FROM t1 CROSS JOIN t2 CROSS JOIN t3)
        |SELECT CAST(1 AS INT) AS rank, l1 AS merge_label, pc1 AS pair_count FROM lbl
        |UNION ALL
        |SELECT CAST(2 AS INT), l2, pc2 FROM lbl
        |UNION ALL
        |SELECT CAST(3 AS INT), l3, pc3 FROM lbl
        |ORDER BY rank""".stripMargin,
    "tx19_bpe_merge" ->
      """WITH wf AS (
        | SELECT word, count(*) AS wcnt
        | FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        | GROUP BY 1),
        |pairs AS (
        | SELECT unnest(list_transform(generate_series(1, length(word) - 1),
        |   i -> substr(word, i, 2))) AS pair, wcnt
        | FROM wf WHERE length(word) >= 2),
        |pc AS (SELECT pair, CAST(sum(wcnt) AS BIGINT) AS pair_count
        |       FROM pairs GROUP BY 1),
        |r AS (SELECT pair, pair_count,
        |  CAST(row_number() OVER (ORDER BY pair_count DESC, pair) AS INT) AS rank
        |  FROM pc)
        |SELECT rank, pair, pair_count FROM r
        |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    "tx20_bpe_apply" ->
      """WITH wf AS (
        | SELECT word, count(*) AS wcnt
        | FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        | GROUP BY 1),
        |p1 AS (
        | SELECT unnest(list_transform(generate_series(1, length(word) - 1),
        |   i -> substr(word, i, 2))) AS pair, wcnt
        | FROM wf WHERE length(word) >= 2),
        |top1 AS (
        | SELECT pair AS merged FROM (
        |  SELECT pair, CAST(sum(wcnt) AS BIGINT) AS pc FROM p1 GROUP BY 1)
        | ORDER BY pc DESC, pair LIMIT 1),
        |applied AS (
        | SELECT wcnt, merged, replace(word, merged, chr(1)) AS mword
        | FROM wf CROSS JOIN top1),
        |p2 AS (
        | SELECT wcnt, merged,
        |  unnest(list_transform(generate_series(1, length(mword) - 1),
        |   i -> (CASE WHEN substr(mword, i, 1) = chr(1)
        |         THEN '(' || merged || ')' ELSE substr(mword, i, 1) END) ||
        |        (CASE WHEN substr(mword, i + 1, 1) = chr(1)
        |         THEN '(' || merged || ')' ELSE substr(mword, i + 1, 1) END))) AS pair
        | FROM applied WHERE length(mword) >= 2),
        |pc2 AS (
        | SELECT merged, pair, CAST(sum(wcnt) AS BIGINT) AS pair_count
        | FROM p2 GROUP BY 1, 2),
        |r AS (SELECT merged, pair, pair_count,
        |  CAST(row_number() OVER (ORDER BY pair_count DESC, pair) AS INT) AS rank
        |  FROM pc2)
        |SELECT rank, merged, pair, pair_count FROM r
        |WHERE rank <= 10 ORDER BY rank""".stripMargin,

    "sp08_anneal_schedule" ->
      s"""WITH ${QualityWeights.scoredCteSql},
        |tot AS (SELECT CAST(sum(n_words) AS BIGINT) AS tot FROM qsc),
        |r AS (
        | SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, score,
        |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS qrank,
        |  CAST(COALESCE(sum(n_words) OVER (ORDER BY score DESC, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        | FROM qsc)
        |SELECT doc_id, n_words, score, qrank, cum_before,
        | CASE WHEN cum_before * 10 < tot THEN 'anneal' ELSE 'main' END AS phase
        |FROM r, tot ORDER BY qrank""".stripMargin,

    "tx21_chunk" ->
      """WITH w AS (
        | SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents)
        |SELECT doc_id, CAST(i AS INT) AS chunk_idx,
        | CAST(len(list_slice(words, i * 24 + 1, i * 24 + 32)) AS INT) AS chunk_words,
        | substr(md5(array_to_string(list_slice(words, i * 24 + 1, i * 24 + 32), ' ')), 1, 8) AS chunk_fp8
        |FROM w, unnest(generate_series(0, (len(words) - 1) // 24)) AS t(i)
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "tx22_tfidf_search" ->
      """WITH n AS (SELECT count(*) AS n_docs FROM documents),
        |h AS (
        | SELECT doc_id, w FROM
        |  (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents)
        | WHERE w IN ('vector', 'join', 'scan')),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM h GROUP BY 1, 2),
        |idf AS (
        | SELECT w, (1000000 * n_docs) // count(*) AS idf_sc
        | FROM tf, n GROUP BY w, n_docs)
        |SELECT doc_id, CAST(sum(tf * idf_sc) AS BIGINT) AS score,
        | count(*) AS n_terms_hit
        |FROM tf JOIN idf USING (w)
        |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,

    "tx23_bm25" ->
      s"""WITH wd AS (
        | SELECT doc_id, string_split(lower(text), ' ') AS ws,
        |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
        | FROM documents),
        |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tot_dl FROM wd),
        |h AS (
        | SELECT doc_id, dl, w FROM
        |  (SELECT doc_id, dl, unnest(ws) AS w FROM wd)
        | WHERE w IN ('vector', 'join', 'scan')),
        |tf AS (SELECT doc_id, dl, w, count(*) AS tf FROM h GROUP BY 1, 2, 3),
        |idf0 AS (
        | SELECT w, count(*) AS df, (1000000 * n_docs) // count(*) AS idf_sc,
        |  (n_docs - count(*) + 0.5) / (count(*) + 0.5) + 1.0 AS x,
        |  CAST(tot_dl AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
        | FROM tf, st GROUP BY w, n_docs, tot_dl),
        |lr1 AS (SELECT *, ln(x) AS ln_x, ${eCaseSql("x")} AS e, x / ${pCaseSql("x")} AS mm FROM idf0),
        |lr2 AS (SELECT *, (mm - 1.0) / (mm + 1.0) AS z FROM lr1),
        |lr3 AS (SELECT *, z * z AS z2 FROM lr2),
        |lr4 AS (SELECT *, z2 * z2 AS z4 FROM lr3),
        |lr5 AS (SELECT *, z4 * z2 AS z6 FROM lr4),
        |idf AS (
        | SELECT w, idf_sc, ln_x,
        |  e * 0.6931471805599453 + 2.0 * z * (1.0 + z2 / 3.0 + z4 / 5.0 + z6 / 7.0) AS aln_x,
        |  avgdl
        | FROM lr5),
        |scored AS (
        | SELECT t.doc_id, t.dl, t.w, t.tf, i.idf_sc,
        |  (CAST(t.tf AS DOUBLE) * 2.2) /
        |   (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(t.dl AS DOUBLE) / i.avgdl))) AS sat,
        |  i.ln_x, i.aln_x
        | FROM tf t JOIN idf i USING (w)),
        |agg AS (
        | SELECT doc_id, dl, count(*) AS n_terms_hit,
        |  CAST(sum(tf * idf_sc) AS BIGINT) AS tfidf_exact,
        |  list_sum(list(ln_x * sat ORDER BY w)) AS bm25,
        |  list_sum(list(aln_x * sat ORDER BY w)) AS bm25_ref
        | FROM scored GROUP BY 1, 2)
        |SELECT doc_id, dl, n_terms_hit, tfidf_exact,
        | CAST(floor(bm25_ref * 1000000.0) AS BIGINT) AS bm25_micro,
        | abs(bm25 - bm25_ref) <= 0.0005 AS bm25_within_tol
        |FROM agg ORDER BY bm25_micro DESC, doc_id LIMIT 20""".stripMargin
  )
}
