package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.functions.TextFunctions.wordCount
import org.apache.spark.sql.functions._

/** Training-data curation operators over `documents` — the sampling /
  * mixing / end-to-end-prep layer of an LLM data pipeline (the part
  * that sits on top of dedup/quality/langid and decides what actually
  * ships to the trainer).
  *
  * All sampling here is DETERMINISTIC (md5-keyed): reruns at 100 TB
  * reproduce byte-identical corpora — a hard requirement for training
  * reproducibility — and md5 is bit-identical across engines, so every
  * operator stays oracle-checkable (SURVEY.md §5).
  */
object Pipeline {
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.spread(Tables(s, d, "documents"))

  /** Per-source positions (`rn`) and exclusive token prefix sums
    * (`cum0`) in (h, doc_id) order, via the two-phase partition-
    * parallel [[graft.functions.GroupPrefix]] — never a one-task-per-
    * source window. Requires columns: source, h, doc_id, tok_cnt.
    */
  private[operators] def sourcePrefix(df: DataFrame): DataFrame =
    graft.functions.GroupPrefix.groupPrefix(
      df, "source", Seq("h", "doc_id"), Some("tok_cnt"))

  /** Curriculum pacing manifest — the sp10 kernel shared with
    * [[graft.api]]'s `curriculum` verb. Bands `difficultyCol` into
    * `nPhases` buckets of width `bandWidth` (capped at the top band);
    * phase p draws the widening pool band ≤ p, reshuffled
    * deterministically per phase (md5(id:cur<phase>)). Requires
    * `idCol` castable to string. Returns (phase, pos, <idCol>, band).
    * Scale shape: banding is scan compute, the pool is a broadcast
    * cross join against an nPhases-row table, within-phase order is
    * GroupPrefix's partition-parallel rank. */
  private[graft] def curriculumOf(df: DataFrame, idCol: String,
                                  difficultyCol: String, bandWidth: Int,
                                  nPhases: Int): DataFrame = {
    val s = df.sparkSession
    val banded = df
      .withColumn("band",
        least(expr(s"$difficultyCol DIV $bandWidth"), lit(nPhases - 1)).cast("int"))
    val phases = s.range(0, nPhases).select(col("id").cast("int").as("phase"))
    val pool = banded.crossJoin(broadcast(phases))
      .filter(col("band") <= col("phase"))
      .withColumn("h", md5(concat(col(idCol).cast("string"),
        lit(":cur"), col("phase").cast("string"))))
    graft.functions.GroupPrefix.groupPrefix(pool, "phase", Seq("h", idCol))
      .select(col("phase"), col("rn").cast("long").as("pos"),
        col(idCol), col("band"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Stratified sampling with per-stratum rates (corpus mixing:
    // upweight one source, downsample the rest). A pure filter on a
    // hash of the row key — zero shuffle, scan speed, and the sample
    // is stable under reruns AND under corpus growth (a doc's
    // keep/drop never depends on other rows).
    "sp01_stratified_sample" -> ((s, d) => {
      val h = substring(md5(concat(col("doc_id").cast("string"), lit(":sp01"))), 1, 2)
      docs(s, d)
        .filter(when(col("source") === "src0", h < "40").otherwise(h < "10"))
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // Deterministic per-stratum reservoir: exactly k docs per source,
    // chosen by hash order (a seeded shuffle both engines reproduce).
    // Scale shape: Catalyst's InferWindowGroupLimit (SPARK-37099)
    // rewrites the row_number() <= k filter into a PARTIAL
    // WindowGroupLimit before the shuffle — each input partition
    // forwards only its local top-k per source, so the per-source
    // merge task sees ~k * partitions rows, never the whole source.
    // PlanSpec pins the partial node; a hand-rolled two-level top-k
    // measured ~3x slower for the identical wire volume.
    "sp02_reservoir_per_source" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = md5(concat(col("doc_id").cast("string"), lit(":sp02")))
      val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
      docs(s, d)
        .withColumn("h", h)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("source"), col("rn"), col("doc_id"))
        .orderBy(col("source"), col("rn"))
    }),

    // End-to-end prep pipeline: language gate -> quality gate (token
    // count band) -> exact dedup keep-first -> per-source corpus
    // stats. The composition the reference user actually runs before
    // training; every stage is a narrow projection or a single
    // hash-partitioned agg, so the chain is two shuffles total
    // (dedup groupBy + final stats groupBy) at any scale.
    "px01_prep_pipeline" -> ((s, d) => {
      val toks = wordCount(col("text"))
      val gated = docs(s, d)
        .filter(col("lang") === "en")
        .withColumn("tok_cnt", toks)
        .filter(col("tok_cnt") >= 20 && col("tok_cnt") <= 40)
      // dedup keeps min(doc_id) per content hash; source is re-joined
      // from the kept doc_id (first()-style "any source" would be
      // nondeterministic across engines)
      val deduped = gated
        .withColumn("chash", md5(col("text")))
        .groupBy(col("chash"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("tok_cnt")).as("tok_cnt"))
      deduped.select(col("doc_id"), col("tok_cnt"))
        .join(docs(s, d).select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok_cnt")).as("total_tokens"))
        .orderBy(col("source"))
    }),

    // Sequence packing: assign docs to fixed-token-budget training
    // sequences (the pre-tokenizer packing step that turns a corpus
    // into equal-budget chunks). Docs are ordered deterministically
    // (md5 hash, a seeded shuffle both engines reproduce), the
    // two-phase `sourcePrefix` places each doc at its exclusive
    // per-source prefix offset WITHOUT a one-task-per-source window,
    // and pack_id = offset DIV budget — pure integer math. Every
    // shuffle stays partition-parallel; agg is map-side combinable.
    "sp03_pack_sequences" -> ((s, d) => {
      val base = docs(s, d)
        .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(":sp03"))))
        .withColumn("tok_cnt", wordCount(col("text")).cast("long"))
        .select(col("source"), col("h"), col("doc_id"), col("tok_cnt"))
      sourcePrefix(base)
        .withColumn("pack_id", expr("CAST(cum0 DIV 2000 AS INT)"))
        .groupBy(col("source"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok_cnt")).as("pack_tokens"))
        .orderBy(col("source"), col("pack_id"))
    }),

    // PACKING-EFFICIENCY audit — the QA report over sp03's packs (a
    // trainer's effective batch utilization IS this number: underfull
    // packs waste step compute, straddling docs overflow the budget):
    // per source, pack count, mean fill vs the 2000-token budget
    // (integer milli), overflow/underfull pack counts and the extremes.
    // Identical pack construction to sp03 (same hash, same prefix, the
    // oracle replays the same CTE), then ONE rollup into the
    // |source|-row report — the pack frame never leaves the cluster.
    "sp11_pack_audit" -> ((s, d) => {
      val base = docs(s, d)
        .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(":sp03"))))
        .withColumn("tok_cnt", wordCount(col("text")).cast("long"))
        .select(col("source"), col("h"), col("doc_id"), col("tok_cnt"))
      sourcePrefix(base)
        .withColumn("pack_id", expr("CAST(cum0 DIV 2000 AS INT)"))
        .groupBy(col("source"), col("pack_id"))
        .agg(sum(col("tok_cnt")).as("pack_tokens"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_packs"),
          sum(col("pack_tokens")).as("total_tokens"),
          sum(when(col("pack_tokens") > 2000, 1L).otherwise(0L)).as("n_overflow"),
          sum(when(col("pack_tokens") < 2000, 1L).otherwise(0L)).as("n_underfull"),
          max(col("pack_tokens")).as("max_pack_tokens"),
          min(col("pack_tokens")).as("min_pack_tokens"))
        .withColumn("fill_milli", expr("(total_tokens * 1000) DIV (n_packs * 2000)"))
        .select(col("source"), col("n_packs"), col("total_tokens"),
          col("fill_milli"), col("n_overflow"), col("n_underfull"),
          col("max_pack_tokens"), col("min_pack_tokens"))
        .orderBy(col("source"))
    }),

    // PACK-EFFICIENCY CURVE over candidate context lengths — the
    // packer's member of the tuning-curve family (dd23 tunes LSH
    // banding, ss34 nprobe, ss36 MRL width; this tunes THE training
    // hyperparameter every run fixes first, the sequence length):
    // per L ∈ {512, 1k, 2k, 4k} the sp11 boundary-pack audit — pack
    // count, fill ratio, overflow/underfull packs, the jumbo docs
    // that must split or truncate at that L — the table that shows
    // fill climbing and jumbo waste falling as L grows, priced
    // before a run commits its context window. Scale shape: the dd23
    // fused-fan discipline — ONE GroupPrefix prefix pass (the only
    // corpus shuffle), then a 4-row broadcast fan whose pack rollup
    // partial-aggs map-side; the curve is a 4-row frame.
    "sp16_pack_curve" -> ((s, d) => {
      import s.implicits._
      val base = docs(s, d)
        .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(":sp03"))))
        .withColumn("tok_cnt", wordCount(col("text")).cast("long"))
        .select(col("source"), col("h"), col("doc_id"), col("tok_cnt"))
      val cfg = Seq(512L, 1024L, 2048L, 4096L).toDF("seq_len")
      sourcePrefix(base)
        .crossJoin(broadcast(cfg))
        .groupBy(col("seq_len"), col("source"),
          expr("cum0 DIV seq_len").as("pack_id"))
        .agg(sum(col("tok_cnt")).as("pack_tokens"),
          sum(when(col("tok_cnt") > col("seq_len"), 1L).otherwise(0L))
            .as("n_jumbo"))
        .groupBy(col("seq_len"))
        .agg(count(lit(1)).as("n_packs"),
          sum(col("pack_tokens")).as("total_tokens"),
          sum(when(col("pack_tokens") > col("seq_len"), 1L).otherwise(0L))
            .as("n_overflow"),
          sum(when(col("pack_tokens") < col("seq_len"), 1L).otherwise(0L))
            .as("n_underfull"),
          max(col("pack_tokens")).as("max_pack_tokens"),
          sum(col("n_jumbo")).as("n_jumbo_docs"))
        .withColumn("fill_milli",
          expr("(total_tokens * 1000) DIV (n_packs * seq_len)"))
        .select(col("seq_len"), col("n_packs"), col("total_tokens"),
          col("fill_milli"), col("n_overflow"), col("n_underfull"),
          col("max_pack_tokens"), col("n_jumbo_docs"))
        .orderBy(col("seq_len"))
    }),

    // SOURCE-INTERLEAVED loader order — the "stream the mixture, not
    // the sources" manifest (a loader that reads sources sequentially
    // trains on domain-sorted data; the interleave gives every
    // training window the corpus mixture): each source's docs rank in
    // deterministic hash order (GroupPrefix — partition-parallel,
    // never one task per source), sources index 0..S−1 by name, and
    // the global position is (rank−1)·S + src_idx — a perfect
    // round-robin regardless of source sizes (an exhausted source's
    // slots are simply absent, by convention). Rerun-stable,
    // engine-exact, and the position column is what the real writer
    // sorts shards by. Scale shape: one GroupPrefix rank pass; the
    // source index/count frames are |S|-row broadcasts; no global
    // sort ever materializes (pos is computed, not ranked).
    "sp12_interleave_mix" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = docs(s, d)
        .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(":sp12"))))
        .select(col("source"), col("h"), col("doc_id"))
      val srcs = base.select(col("source")).distinct()
        .withColumn("src_idx",
          row_number().over(Window.orderBy(col("source"))).cast("long") - 1)
      val nsrc = srcs.agg(count(lit(1)).as("n_src"))
      graft.functions.GroupPrefix.groupPrefix(base, "source", Seq("h", "doc_id"))
        .join(broadcast(srcs), "source")
        .crossJoin(broadcast(nsrc))
        .select(
          ((col("rn").cast("long") - 1) * col("n_src") + col("src_idx")).as("pos"),
          col("doc_id"), col("source"), col("rn").cast("long").as("rn"))
        .orderBy(col("pos"))
    }),

    // Token-budget mixture: hit a target corpus composition (src0
    // upweighted 5x) under a global token budget. Each source gets
    // budget = weight*TOTAL/sum(weights) (integer division, exact);
    // docs are taken in deterministic hash order until the source's
    // exclusive prefix sum crosses its budget. The "sample to a target
    // token mixture" step of every training-data pipeline; the prefix
    // sum is the two-phase partition-parallel `sourcePrefix`, so no
    // task ever scans a whole source.
    "px02_mixture_budget" -> ((s, d) => {
      val base = docs(s, d)
        .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(":px02"))))
        .withColumn("tok_cnt", wordCount(col("text")).cast("long"))
        .select(col("source"), col("h"), col("doc_id"), col("tok_cnt"))
      sourcePrefix(base)
        .withColumn("wgt", when(col("source") === "src0", lit(5L)).otherwise(lit(1L)))
        .withColumn("budget", expr("CAST((wgt * 20000) DIV 24 AS BIGINT)"))
        .filter(col("cum0") < col("budget"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok_cnt")).as("sel_tokens"),
          max(col("budget")).as("budget_tokens"))
        .orderBy(col("source"))
    }),

    "px03_funnel" -> ((s, d) => funnel(s, d)),

    // DATA-CONSTRAINED EPOCH SCHEDULE (Muennighoff et al. 2023 — "how
    // many times may each source repeat?", the allocation every
    // token-budgeted training run fixes before mixing): each source's
    // token TARGET is its weight share of a 2x-total budget (src0
    // carries px02's 5x premium weight), its epoch count is
    // target/size CAPPED at 4 epochs (past ~4, repeated data stops
    // buying loss — the paper's knee), and the shortfall row reports
    // how much budget the caps strand (unfillable without over-
    // repeating the premium source). All integer milli-epochs —
    // engine-exact. Scale shape: ONE corpus scan partial-aggs into
    // the |S|-row source rollup (checkpointed — two consumers);
    // everything downstream is |S|-row arithmetic with 1-row
    // broadcasts. Long headroom: target·1000 ≈ 10^18 at 10^14 tokens
    // — inside the long domain at any realistic budget.
    "sp13_epoch_budget" -> ((s, d) => {
      val tok = docs(s, d)
        .groupBy(col("source"))
        .agg(sum(wordCount(col("text")).cast("long")).as("n_tokens"))
        .withColumn("weight",
          when(col("source") === "src0", lit(5L)).otherwise(lit(1L)))
        .localCheckpoint(false)
      val tot = tok.agg(sum(col("n_tokens")).as("tot"), sum(col("weight")).as("sumw"))
      val t = tok.crossJoin(broadcast(tot))
        .withColumn("target_tokens", expr("(2 * tot * weight) DIV sumw"))
        .withColumn("epochs_milli",
          least(lit(4000L), expr("(target_tokens * 1000) DIV n_tokens")))
        .withColumn("alloc_tokens", expr("(n_tokens * epochs_milli) DIV 1000"))
      val short = t.agg(sum(col("alloc_tokens")).as("alloc_tot"),
        max(col("tot") * 2).as("budget"))
      t.crossJoin(broadcast(short))
        .select(col("source"), col("n_tokens"), col("weight"),
          col("target_tokens"), col("epochs_milli"), col("alloc_tokens"),
          (col("epochs_milli") === 4000L).as("capped"),
          expr("((budget - alloc_tot) * 1000) DIV budget").as("shortfall_milli"))
        .orderBy(col("source"))
    }),

    // Deterministic train/val/test split — the held-out-set assignment
    // every training run needs: a doc's split is a pure function of
    // its id hash (first byte bands: ~5% val, ~5% test, rest train),
    // so the split is rerun-stable, growth-stable (new docs never
    // reshuffle old ones across splits), and leak-proof by
    // construction. Zero-shuffle flag at scan speed; the per-
    // (source, split) census is one map-side-combinable agg.
    "sp05_split" -> ((s, d) => {
      val h = substring(md5(concat(col("doc_id").cast("string"), lit(":sp05"))), 1, 2)
      docs(s, d)
        .withColumn("split",
          when(h < "0d", lit("val")).when(h < "1a", lit("test")).otherwise(lit("train")))
        .withColumn("tok_cnt", wordCount(col("text")).cast("long"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok_cnt")).as("n_tokens"))
        .orderBy(col("source"), col("split"))
    }),

    // Deterministic shuffle-and-shard — the writer layout step of a
    // training run: every doc lands in one of 8 output shards by id
    // hash, so shards are (a) size-balanced without a sort or a
    // repartition-by-count, (b) rerun-stable, and (c) source-mixed
    // (each shard sees every source — hash mixing IS the global
    // shuffle trainers want, with zero shuffle in the plan: the
    // assignment is a scan-speed projection and the census one
    // map-side-combinable agg). At 100 TB the real writer is
    // `.repartitionByRange`/partitionBy("shard") on this column; the
    // census here is the balance audit that ships with it.
    // Token-BALANCED shards — the equal-WORK sharding sp06's hash
    // sharding stops short of (hash balances doc COUNTS; training
    // loaders want byte/token-balanced shards so no worker drags the
    // epoch): docs rank globally by token count descending, then the
    // SNAKE (boustrophedon) round-robin assigns rank i to shard
    // i%N on even passes and N-1-(i%N) on odd passes — the classic
    // deterministic balancer whose per-shard sums stay within ~one
    // max-item of ideal on sorted input, no greedy state, no driver
    // loop. Scale shape: the global rank is GroupPrefix's two-phase
    // range-partition form (never a one-task window), assignment is
    // per-row arithmetic on the rank, and the report rolls up into N
    // rows with the total as a 1-row broadcast. Output is the
    // N-row balance report (balance_milli: 1000 = perfectly even);
    // the per-doc manifest is the same frame before the rollup
    // (api.balancedShards returns it).
    "sp09_balanced_shards" -> ((s, d) => {
      val n = 8
      val t = docs(s, d)
        .select(col("doc_id"), wordCount(col("text")).cast("long").as("n_tok"))
      val assigned = balancedShardsOf(t, "doc_id", "n_tok", n)
      val tot = t.agg(sum(col("n_tok")).as("total"))
      assigned.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
        .crossJoin(broadcast(tot))
        .select(col("shard"), col("n_docs"), col("sum_tokens"),
          expr(s"(sum_tokens * ${n}000) DIV total").as("balance_milli"))
        .orderBy(col("shard"))
    }),

    "sp06_shard" -> ((s, d) => {
      docs(s, d)
        .withColumn("shard", expr(
          "CAST((instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING) || ':sp06'), 1, 1)) - 1) % 8 AS INT)"))
        .withColumn("tok_cnt", wordCount(col("text")).cast("long"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok_cnt")).as("n_tokens"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("shard"))
    }),

    // Per-source corpus REPORT CARD — the health dashboard a pipeline
    // owner reads per ingest: volume (docs/tokens/mean length), label
    // purity (en share), exact-dup rate, Gopher repetition pass rate,
    // short-doc rate — all exact integer milli. One scan + one per-doc
    // word agg + one per-source rollup (the modal-word stat is the
    // only reason the corpus shuffles at all).
    "px04_source_report" -> ((s, d) => {
      val words = split(lower(col("text")), " ")
      val base = docs(s, d).select(col("doc_id"), col("source"), col("lang"),
        md5(col("text")).as("chash"), size(words).cast("long").as("tok_cnt"))
      val wc = docs(s, d).select(col("doc_id"), explode(words).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_words"), max(col("c")).as("top_cnt"))
      base.join(wc, "doc_id")
        .withColumn("rep_ok", expr("(top_cnt * 1000) DIV n_words") <= 100)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok_cnt")).as("n_tokens"),
          countDistinct(col("chash")).as("n_uniq"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
          sum(when(col("rep_ok"), 1L).otherwise(0L)).as("n_rep_ok"),
          sum(when(col("tok_cnt") < 20, 1L).otherwise(0L)).as("n_short"))
        .withColumn("mean_tok", expr("n_tokens DIV n_docs"))
        .withColumn("en_milli", expr("(n_en * 1000) DIV n_docs"))
        .withColumn("dup_milli", expr("((n_docs - n_uniq) * 1000) DIV n_docs"))
        .withColumn("rep_ok_milli", expr("(n_rep_ok * 1000) DIV n_docs"))
        .withColumn("short_milli", expr("(n_short * 1000) DIV n_docs"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("mean_tok"),
          col("en_milli"), col("dup_milli"), col("rep_ok_milli"), col("short_milli"))
        .orderBy(col("source"))
    }),

    // DATASET CARD (per-source): the distribution summary a corpus
    // release publishes next to the data — doc/token counts, each
    // source's token share of the corpus, EXACT p50/p90 length
    // quantiles (ts35's mergeable-histogram kernel over the n_chars
    // domain — never a percentile over corpus rows), language
    // diversity (count + dominant language + its share). Complements
    // px04 (which reports quality GATES); this reports distribution
    // SHAPE. Scale shape: the tokenized scan materializes ONCE (lazy
    // localCheckpoint — the totals agg, the (source, n_chars)
    // histogram, and the (source, lang) mix all read it; blocks
    // release on GC), each rollup partial-aggs into its bounded
    // domain, every window/join after runs on those domain-sized
    // frames, and the corpus token total is a 1-row broadcast. All
    // shares are integer milli (flooring DIV).
    "px06_dataset_card" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = docs(s, d).select(col("source"), col("lang"), col("n_chars"),
          wordCount(col("text")).cast("long").as("tok_cnt"))
        .localCheckpoint(false)
      val agg = base.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok_cnt")).as("n_tokens"))
      val tot = agg.agg(sum(col("n_tokens")).as("tot_tokens"))
      val hist = base.groupBy(col("source").as("key"), col("n_chars").as("cents"))
        .agg(count(lit(1)).as("cnt"))
      val quant = TimeSeries.histQuantilesOf(hist, Seq(500, 900))
        .groupBy(col("key").as("source"))
        .agg(max(when(col("q_milli") === 500, col("cents"))).as("p50_chars"),
          max(when(col("q_milli") === 900, col("cents"))).as("p90_chars"))
      val langs = base.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("lc"))
      // rank within the (source x lang) DOMAIN frame — never corpus rows
      val lrank = Window.partitionBy(col("source")).orderBy(col("lc").desc, col("lang"))
      val langTop = langs
        .withColumn("rk", row_number().over(lrank))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_langs"),
          max(when(col("rk") === 1, col("lang"))).as("top_lang"),
          max(when(col("rk") === 1, col("lc"))).as("top_lang_docs"))
      agg.join(quant, "source").join(langTop, "source").crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("(n_tokens * 1000) DIV tot_tokens").as("tok_share_milli"),
          col("p50_chars"), col("p90_chars"),
          col("n_langs"), col("top_lang"),
          expr("(top_lang_docs * 1000) DIV n_docs").as("top_lang_milli"))
        .orderBy(col("source"))
    }),

    // CURRICULUM ORDERING (Bengio et al. 2009's pacing schedule as a
    // data op): samples are banded by difficulty (token count — the
    // standard length proxy), and training phase p draws from the
    // progressively widening pool band ≤ p, shuffled deterministically
    // per phase (md5(doc_id:phase) — each phase reshuffles its pool,
    // reruns reproduce byte-identically). Output = (phase, pos,
    // doc_id, band): the trainer consumes phases in order, positions
    // within phase. Scale shape: banding is pure scan compute; the
    // phase pool is a broadcast cross join against a 4-row phase
    // table; the within-phase global order is GroupPrefix's two-phase
    // range-partition rank — partition-parallel, never one task per
    // phase (4 phases would be the definitional window-skew trap).
    "sp10_curriculum" -> ((s, d) =>
      curriculumOf(
          docs(s, d).select(col("doc_id"),
            wordCount(col("text")).as("tok_cnt")),
          idCol = "doc_id", difficultyCol = "tok_cnt",
          bandWidth = 32, nPhases = 4)
        .orderBy(col("phase"), col("pos"))),

    // Epoch ordering — the training-loader manifest sp06 stops short
    // of: every epoch re-shuffles the corpus into a DIFFERENT
    // deterministic pseudo-random order (md5 keyed by epoch), sharded
    // so no global sort ever happens. Per (epoch, shard): position =
    // hash-order rank WITHIN the shard — the window partitions by
    // (epoch, shard), so task input is bounded by shard size, never
    // the corpus (GroupPrefix discipline; at 100 TB shard count grows
    // with the corpus and each window partition stays ~file-sized).
    // Rerun-stable, epoch-distinct, source-mixed — exactly what an
    // LLM data loader needs from its epoch manifests; the real writer
    // partitionBy(epoch, shard)s this frame and trainers read shards
    // sequentially.
    "sp07_epoch_order" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("epoch"), col("shard"))
        .orderBy(col("h"), col("doc_id"))
      docs(s, d)
        .select(col("doc_id"), explode(array(lit(0), lit(1))).as("epoch"))
        .withColumn("h", md5(concat(col("doc_id").cast("string"),
          lit(":ep"), col("epoch").cast("string"))))
        .withColumn("shard", expr(
          "CAST((instr('0123456789abcdef', substr(h, 1, 1)) - 1) % 4 AS INT)"))
        .withColumn("pos", row_number().over(w))
        .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
        .orderBy(col("epoch"), col("shard"), col("pos"))
    })
  )

  // Full curation FUNNEL — the end-to-end training-data run as one
  // query, reporting corpus survival per stage: raw → language gate →
  // token band → repetition gate (tx10 rules) → normalized exact
  // dedup keep-first (tx13 digest) → benchmark decontamination (tx11,
  // src0 = the eval set, excluded from training entirely). ONE scan
  // computes every per-doc flag (the repetition stats and the contam
  // semi-join are the only shuffles); the funnel itself is a single
  // conditional aggregation unpivoted to (stage, n_docs, n_tokens).
  // The report every pipeline owner actually looks at before training.
  private def funnel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs(s, d)
    val words = split(lower(col("text")), " ")
    // repetition stats (tx10 shape: modal word + distinct bigrams) —
    // one native byte pass (TokenProfileExpr, see tx10) instead of the
    // corpus-words explode + two-level agg + the interpreted bigram
    // transform + array_distinct
    val prof = base.select(col("doc_id"),
      graft.functions.TextFunctions.tokenProfile(
        lower(col("text")), Seq.empty).as("_tp"))
    // null-text docs: the old explode dropped them from wc (no word
    // rows) while the old bigram branch kept them at 0 — replicated.
    // Filter on TEXT, not the derived struct: profile(text) is null
    // iff text is null (nullIntolerant), and a derived-struct filter
    // gets pushed below the exchange where it re-evaluates the kernel.
    val wc = base.filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokenProfile(
          lower(col("text")), Seq.empty).as("_tp"))
      .select(col("doc_id"),
        col("_tp").getField("n_words").cast("long").as("n_words"),
        col("_tp").getField("top_cnt").cast("long").as("top_cnt"))
    val bg = prof.select(col("doc_id"),
      coalesce(col("_tp").getField("n_bigrams").cast("long"), lit(0L)).as("n_bg"),
      coalesce(col("_tp").getField("n_uniq_bigrams").cast("long"), lit(0L)).as("n_dbg"))
    // benchmark gram set (tx11: src0 is the eval slice) — grams as
    // 8-byte xxhash64 keys, the gramHashRows/spanIntervals discipline
    val g = base
      .select(col("doc_id"), col("source"), words.as("_gws"))
      .select(col("doc_id"), col("source"),
        explode(graft.functions.TextFunctions.gramHashes(col("_gws"), 5)).as("gh"))
    val bench = g.filter(col("source") === "src0").select(col("gh")).distinct()
    val contam = g.filter(col("source") =!= "src0")
      .join(broadcast(bench), Seq("gh"), "left_semi")
      .select(col("doc_id")).distinct().withColumn("contam", lit(true))
    // normalized digest (tx13 normalize, digest only)
    val cleaned = regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")
    val flags = base
      .withColumn("tok_cnt", size(words).cast("long"))
      .withColumn("lang_ok", col("lang") === "en")
      .withColumn("norm_md5", md5(trim(cleaned)))
      .join(wc, "doc_id").join(bg, "doc_id")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("contam", coalesce(col("contam"), lit(false)))
      .withColumn("band_ok", col("tok_cnt") >= 20 && col("tok_cnt") <= 60)
      .withColumn("rep_ok",
        expr("(top_cnt * 1000) DIV n_words") <= 100 &&
        expr("CASE WHEN n_bg = 0 THEN 0 ELSE ((n_bg - n_dbg) * 1000) DIV n_bg END") <= 250)
      .withColumn("s3", col("lang_ok") && col("band_ok") && col("rep_ok"))
    val w = Window.partitionBy(col("norm_md5"))
    val staged = flags
      .withColumn("s4", col("s3") &&
        col("doc_id") === min(when(col("s3"), col("doc_id"))).over(w))
      .withColumn("s5", col("s4") && col("source") =!= "src0" && !col("contam"))
    def st(flag: Column) = struct(
      sum(when(flag, 1L).otherwise(0L)).as("n_docs"),
      sum(when(flag, col("tok_cnt")).otherwise(0L)).as("n_tokens"))
    val one = staged.agg(
      st(lit(true)).as("s0_raw"),
      st(col("lang_ok")).as("s1_lang"),
      st(col("lang_ok") && col("band_ok")).as("s2_band"),
      st(col("s3")).as("s3_repetition"),
      st(col("s4")).as("s4_dedup"),
      st(col("s5")).as("s5_decontam"))
    one.select(explode(array(
        Seq("s0_raw", "s1_lang", "s2_band", "s3_repetition", "s4_dedup", "s5_decontam")
          .map(n => struct(lit(n).as("stage"),
            col(s"$n.n_docs").as("n_docs"), col(s"$n.n_tokens").as("n_tokens"))): _*)).as("r"))
      .select(col("r.stage").as("stage"), col("r.n_docs").as("n_docs"),
        col("r.n_tokens").as("n_tokens"))
      .orderBy(col("stage"))
  }

  /** sp09's assignment over any (id, tokens) frame — the snake
    * balanced-shard kernel shared by the batch query and
    * [[graft.api]]'s `balancedShards` verb: global rank by (tokens
    * desc, id) via GroupPrefix (partition-parallel, never a one-task
    * window), shard = boustrophedon round-robin on the rank. Returns
    * the per-row manifest (id, tokens, shard). */
  private[graft] def balancedShardsOf(t: DataFrame, idCol: String,
                                      tokCol: String, nShards: Int): DataFrame = {
    val ranked = graft.functions.GroupPrefix.groupPrefixC(
      t.withColumn("_g", lit(1)), "_g", Seq(-col(tokCol), col(idCol)))
    ranked
      .withColumn("shard", expr(
        s"CAST(CASE WHEN ((rn - 1) DIV $nShards) % 2 = 0 THEN (rn - 1) % $nShards " +
          s"ELSE ${nShards - 1} - (rn - 1) % $nShards END AS INT)"))
      .drop("_g", "rn")
  }

  val oracle: Map[String, String] = Map(
    "sp09_balanced_shards" ->
      """WITH t AS (
        | SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        | FROM documents),
        |r AS (SELECT *, CAST(row_number() OVER (ORDER BY n_tok DESC, doc_id) AS BIGINT) AS rank
        |      FROM t),
        |a AS (
        | SELECT doc_id, n_tok,
        |  CAST(CASE WHEN ((rank - 1) // 8) % 2 = 0 THEN (rank - 1) % 8
        |       ELSE 7 - (rank - 1) % 8 END AS INT) AS shard
        | FROM r),
        |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS total FROM t)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
        | (CAST(sum(n_tok) AS BIGINT) * 8000) // total AS balance_milli
        |FROM a, tot GROUP BY shard, total ORDER BY shard""".stripMargin,
    "sp01_stratified_sample" ->
      """SELECT doc_id, source, n_chars
        |FROM documents
        |WHERE CASE WHEN source = 'src0'
        |  THEN substr(md5(CAST(doc_id AS VARCHAR) || ':sp01'), 1, 2) < '40'
        |  ELSE substr(md5(CAST(doc_id AS VARCHAR) || ':sp01'), 1, 2) < '10' END
        |ORDER BY doc_id""".stripMargin,
    "sp02_reservoir_per_source" ->
      """WITH h AS (
        | SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR) || ':sp02') AS h
        | FROM documents),
        |r AS (
        | SELECT source, doc_id,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS INT) AS rn
        | FROM h)
        |SELECT source, rn, doc_id FROM r WHERE rn <= 5
        |ORDER BY source, rn""".stripMargin,
    "px01_prep_pipeline" ->
      """WITH gated AS (
        | SELECT doc_id, source, md5(text) AS chash,
        |  CAST(len(string_split(text, ' ')) AS INT) AS tok_cnt
        | FROM documents
        | WHERE lang = 'en' AND len(string_split(text, ' ')) BETWEEN 20 AND 40),
        |dedup AS (
        | SELECT min(doc_id) AS doc_id, min(tok_cnt) AS tok_cnt
        | FROM gated GROUP BY chash)
        |SELECT d2.source, count(*) AS n_docs, CAST(sum(dd.tok_cnt) AS BIGINT) AS total_tokens
        |FROM dedup dd JOIN documents d2 ON d2.doc_id = dd.doc_id
        |GROUP BY d2.source
        |ORDER BY d2.source""".stripMargin,
    "sp03_pack_sequences" ->
      """WITH t AS (
        | SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR) || ':sp03') AS h,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_cnt
        | FROM documents),
        |c AS (
        | SELECT source, tok_cnt,
        |  sum(tok_cnt) OVER (PARTITION BY source ORDER BY h, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM t)
        |SELECT source, CAST((cum - tok_cnt) // 2000 AS INT) AS pack_id,
        | count(*) AS n_docs, CAST(sum(tok_cnt) AS BIGINT) AS pack_tokens
        |FROM c GROUP BY 1, 2 ORDER BY source, pack_id""".stripMargin,
    "px03_funnel" ->
      """WITH base AS (
        | SELECT doc_id, source, lang, text,
        |  string_split(lower(text), ' ') AS words,
        |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tok_cnt,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS norm_md5
        | FROM documents),
        |wc AS (
        | SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, CAST(max(c) AS BIGINT) AS top_cnt
        | FROM (SELECT doc_id, w, count(*) AS c
        |       FROM (SELECT doc_id, unnest(words) AS w FROM base) GROUP BY 1, 2)
        | GROUP BY doc_id),
        |bg AS (
        | SELECT doc_id, CAST(len(bgs) AS BIGINT) AS n_bg,
        |  CAST(len(list_distinct(bgs)) AS BIGINT) AS n_dbg
        | FROM (SELECT doc_id,
        |        CASE WHEN len(words) >= 2
        |          THEN list_transform(generate_series(1, len(words) - 1),
        |                 i -> array_to_string(list_slice(words, i, i + 1), ' '))
        |          ELSE [] END AS bgs
        |       FROM base)),
        |g AS (
        | SELECT doc_id, source, array_to_string(list_slice(words, i, i + 4), ' ') AS gram
        | FROM base, unnest(generate_series(1, len(words) - 4)) AS t(i)
        | WHERE len(words) >= 5),
        |bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        |contam AS (
        | SELECT DISTINCT g.doc_id, TRUE AS contam
        | FROM g JOIN bench USING (gram) WHERE g.source <> 'src0'),
        |flags AS (
        | SELECT b.doc_id, b.source, b.tok_cnt, b.norm_md5,
        |  b.lang = 'en' AS lang_ok,
        |  b.tok_cnt BETWEEN 20 AND 60 AS band_ok,
        |  ((wc.top_cnt * 1000) // wc.n_words <= 100 AND
        |   (CASE WHEN bg.n_bg = 0 THEN 0 ELSE ((bg.n_bg - bg.n_dbg) * 1000) // bg.n_bg END) <= 250) AS rep_ok,
        |  coalesce(contam.contam, FALSE) AS contam
        | FROM base b JOIN wc USING (doc_id) JOIN bg USING (doc_id)
        | LEFT JOIN contam ON contam.doc_id = b.doc_id),
        |staged AS (
        | SELECT *,
        |  (lang_ok AND band_ok AND rep_ok) AS s3,
        |  (lang_ok AND band_ok AND rep_ok AND
        |   doc_id = min(CASE WHEN lang_ok AND band_ok AND rep_ok THEN doc_id END)
        |     OVER (PARTITION BY norm_md5)) AS s4
        | FROM flags),
        |staged2 AS (
        | SELECT *, (s4 AND source <> 'src0' AND NOT contam) AS s5 FROM staged),
        |agg AS (
        | SELECT
        |  CAST(count(*) AS BIGINT) AS d0, CAST(sum(tok_cnt) AS BIGINT) AS t0,
        |  CAST(sum(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        |  CAST(sum(CASE WHEN lang_ok THEN tok_cnt ELSE 0 END) AS BIGINT) AS t1,
        |  CAST(sum(CASE WHEN lang_ok AND band_ok THEN 1 ELSE 0 END) AS BIGINT) AS d2,
        |  CAST(sum(CASE WHEN lang_ok AND band_ok THEN tok_cnt ELSE 0 END) AS BIGINT) AS t2,
        |  CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
        |  CAST(sum(CASE WHEN s3 THEN tok_cnt ELSE 0 END) AS BIGINT) AS t3,
        |  CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS d4,
        |  CAST(sum(CASE WHEN s4 THEN tok_cnt ELSE 0 END) AS BIGINT) AS t4,
        |  CAST(sum(CASE WHEN s5 THEN 1 ELSE 0 END) AS BIGINT) AS d5,
        |  CAST(sum(CASE WHEN s5 THEN tok_cnt ELSE 0 END) AS BIGINT) AS t5
        | FROM staged2)
        |SELECT 's0_raw' AS stage, d0 AS n_docs, t0 AS n_tokens FROM agg
        |UNION ALL SELECT 's1_lang', d1, t1 FROM agg
        |UNION ALL SELECT 's2_band', d2, t2 FROM agg
        |UNION ALL SELECT 's3_repetition', d3, t3 FROM agg
        |UNION ALL SELECT 's4_dedup', d4, t4 FROM agg
        |UNION ALL SELECT 's5_decontam', d5, t5 FROM agg
        |ORDER BY stage""".stripMargin,
    "sp05_split" ->
      """WITH t AS (
        | SELECT source, doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':sp05'), 1, 2) < '0d' THEN 'val'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':sp05'), 1, 2) < '1a' THEN 'test'
        |       ELSE 'train' END AS split,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_cnt
        | FROM documents)
        |SELECT source, split, count(*) AS n_docs, CAST(sum(tok_cnt) AS BIGINT) AS n_tokens
        |FROM t GROUP BY 1, 2 ORDER BY source, split""".stripMargin,
    "sp06_shard" ->
      """WITH t AS (
        | SELECT source, doc_id,
        |  CAST((strpos('0123456789abcdef',
        |        substr(md5(CAST(doc_id AS VARCHAR) || ':sp06'), 1, 1)) - 1) % 8 AS INT) AS shard,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_cnt
        | FROM documents)
        |SELECT shard, count(*) AS n_docs, CAST(sum(tok_cnt) AS BIGINT) AS n_tokens,
        | count(DISTINCT source) AS n_sources
        |FROM t GROUP BY 1 ORDER BY shard""".stripMargin,
    "px04_source_report" ->
      """WITH base AS (
        | SELECT doc_id, source, lang, md5(text) AS chash,
        |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tok_cnt
        | FROM documents),
        |wc AS (
        | SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, CAST(max(c) AS BIGINT) AS top_cnt
        | FROM (SELECT doc_id, w, count(*) AS c
        |       FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        |             FROM documents) GROUP BY 1, 2)
        | GROUP BY doc_id),
        |j AS (
        | SELECT b.*, (wc.top_cnt * 1000) // wc.n_words <= 100 AS rep_ok
        | FROM base b JOIN wc USING (doc_id)),
        |agg AS (
        | SELECT source, count(*) AS n_docs,
        |  CAST(sum(tok_cnt) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT chash) AS BIGINT) AS n_uniq,
        |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        |  CAST(sum(CASE WHEN rep_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_rep_ok,
        |  CAST(sum(CASE WHEN tok_cnt < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
        | FROM j GROUP BY source)
        |SELECT source, n_docs, n_tokens, n_tokens // n_docs AS mean_tok,
        | (n_en * 1000) // n_docs AS en_milli,
        | ((n_docs - n_uniq) * 1000) // n_docs AS dup_milli,
        | (n_rep_ok * 1000) // n_docs AS rep_ok_milli,
        | (n_short * 1000) // n_docs AS short_milli
        |FROM agg ORDER BY source""".stripMargin,
    "sp13_epoch_budget" ->
      """WITH tok AS (
        | SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(CASE WHEN source = 'src0' THEN 5 ELSE 1 END AS BIGINT) AS weight
        | FROM documents GROUP BY 1),
        |tot AS (
        | SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
        |  CAST(sum(weight) AS BIGINT) AS sumw FROM tok),
        |t AS (
        | SELECT source, n_tokens, weight,
        |  CAST((2 * tot * weight) // sumw AS BIGINT) AS target_tokens,
        |  CAST(least(4000, ((2 * tot * weight) // sumw) * 1000 // n_tokens) AS BIGINT)
        |    AS epochs_milli,
        |  CAST(tot AS BIGINT) AS tot
        | FROM tok, tot),
        |t2 AS (
        | SELECT *, CAST((n_tokens * epochs_milli) // 1000 AS BIGINT) AS alloc_tokens
        | FROM t),
        |sh AS (SELECT CAST(sum(alloc_tokens) AS BIGINT) AS alloc_tot FROM t2)
        |SELECT source, n_tokens, weight, target_tokens, epochs_milli, alloc_tokens,
        | epochs_milli = 4000 AS capped,
        | CAST(((2 * tot - alloc_tot) * 1000) // (2 * tot) AS BIGINT) AS shortfall_milli
        |FROM t2, sh ORDER BY source""".stripMargin,
    "px02_mixture_budget" ->
      """WITH t AS (
        | SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR) || ':px02') AS h,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_cnt,
        |  CASE WHEN source = 'src0' THEN 5 ELSE 1 END AS wgt
        | FROM documents),
        |c AS (
        | SELECT source, tok_cnt,
        |  CAST((wgt * 20000) // 24 AS BIGINT) AS budget,
        |  sum(tok_cnt) OVER (PARTITION BY source ORDER BY h, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM t)
        |SELECT source, count(*) AS n_docs, CAST(sum(tok_cnt) AS BIGINT) AS sel_tokens,
        | CAST(max(budget) AS BIGINT) AS budget_tokens
        |FROM c WHERE cum - tok_cnt < budget
        |GROUP BY source ORDER BY source""".stripMargin,
    "sp12_interleave_mix" ->
      """WITH b AS (
        | SELECT source, doc_id,
        |  md5(CAST(doc_id AS VARCHAR) || ':sp12') AS h
        | FROM documents),
        |srcs AS (
        | SELECT source,
        |  CAST(row_number() OVER (ORDER BY source) AS BIGINT) - 1 AS src_idx
        | FROM (SELECT DISTINCT source FROM documents)),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM srcs),
        |r AS (
        | SELECT source, doc_id,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS BIGINT) AS rn
        | FROM b)
        |SELECT (r.rn - 1) * n.n_src + s.src_idx AS pos,
        | r.doc_id, r.source, r.rn
        |FROM r JOIN srcs s USING (source), n
        |ORDER BY pos""".stripMargin,
    "sp11_pack_audit" ->
      """WITH t AS (
        | SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR) || ':sp03') AS h,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_cnt
        | FROM documents),
        |c AS (
        | SELECT source, tok_cnt,
        |  sum(tok_cnt) OVER (PARTITION BY source ORDER BY h, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM t),
        |p AS (
        | SELECT source, CAST((cum - tok_cnt) // 2000 AS INT) AS pack_id,
        |  CAST(sum(tok_cnt) AS BIGINT) AS pack_tokens
        | FROM c GROUP BY 1, 2)
        |SELECT source,
        | CAST(count(*) AS BIGINT) AS n_packs,
        | CAST(sum(pack_tokens) AS BIGINT) AS total_tokens,
        | (CAST(sum(pack_tokens) AS BIGINT) * 1000) // (count(*) * 2000) AS fill_milli,
        | CAST(sum(CASE WHEN pack_tokens > 2000 THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow,
        | CAST(sum(CASE WHEN pack_tokens < 2000 THEN 1 ELSE 0 END) AS BIGINT) AS n_underfull,
        | max(pack_tokens) AS max_pack_tokens,
        | min(pack_tokens) AS min_pack_tokens
        |FROM p GROUP BY 1 ORDER BY source""".stripMargin,
    // sp16: sp11's pack CTEs fanned over the 4-length config list;
    // pack_id = exclusive prefix DIV L, same boundary convention.
    "sp16_pack_curve" ->
      """WITH t AS (
        | SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR) || ':sp03') AS h,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_cnt
        | FROM documents),
        |c AS (
        | SELECT source, tok_cnt,
        |  sum(tok_cnt) OVER (PARTITION BY source ORDER BY h, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        | FROM t),
        |cfg AS (SELECT unnest([512, 1024, 2048, 4096]) AS seq_len),
        |p AS (
        | SELECT cfg.seq_len, source, (cum - tok_cnt) // cfg.seq_len AS pack_id,
        |  CAST(sum(tok_cnt) AS BIGINT) AS pack_tokens,
        |  CAST(sum(CASE WHEN tok_cnt > cfg.seq_len THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_jumbo
        | FROM c CROSS JOIN cfg GROUP BY 1, 2, 3)
        |SELECT CAST(seq_len AS BIGINT) AS seq_len,
        | CAST(count(*) AS BIGINT) AS n_packs,
        | CAST(sum(pack_tokens) AS BIGINT) AS total_tokens,
        | (CAST(sum(pack_tokens) AS BIGINT) * 1000) // (count(*) * seq_len)
        |  AS fill_milli,
        | CAST(sum(CASE WHEN pack_tokens > seq_len THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_overflow,
        | CAST(sum(CASE WHEN pack_tokens < seq_len THEN 1 ELSE 0 END) AS BIGINT)
        |  AS n_underfull,
        | max(pack_tokens) AS max_pack_tokens,
        | CAST(sum(n_jumbo) AS BIGINT) AS n_jumbo_docs
        |FROM p GROUP BY seq_len ORDER BY seq_len""".stripMargin,
    "px06_dataset_card" ->
      """WITH b AS (
        | SELECT source, lang, n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_cnt
        | FROM documents),
        |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tok_cnt) AS BIGINT) AS n_tokens FROM b GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM a),
        |h AS (SELECT source, n_chars, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
        |c AS (SELECT source, n_chars,
        |  CAST(sum(cnt) OVER (PARTITION BY source ORDER BY n_chars
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |  CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n FROM h),
        |q AS (
        | SELECT source,
        |  min(CASE WHEN cum * 1000 >= n * 500 THEN n_chars END) AS p50_chars,
        |  min(CASE WHEN cum * 1000 >= n * 900 THEN n_chars END) AS p90_chars
        | FROM c GROUP BY 1),
        |lg AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS lc FROM b GROUP BY 1, 2),
        |lr AS (SELECT source, lang, lc,
        |  row_number() OVER (PARTITION BY source ORDER BY lc DESC, lang) AS rk FROM lg),
        |lt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
        |  max(CASE WHEN rk = 1 THEN lang END) AS top_lang,
        |  max(CASE WHEN rk = 1 THEN lc END) AS top_lang_docs
        | FROM lr GROUP BY 1)
        |SELECT a.source, a.n_docs, a.n_tokens,
        | (a.n_tokens * 1000) // tot_tokens AS tok_share_milli,
        | q.p50_chars, q.p90_chars, lt.n_langs, lt.top_lang,
        | (lt.top_lang_docs * 1000) // a.n_docs AS top_lang_milli
        |FROM a JOIN q USING (source) JOIN lt USING (source), tot
        |ORDER BY a.source""".stripMargin,
    "sp10_curriculum" ->
      """WITH t AS (
        | SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS tok_cnt
        | FROM documents),
        |b AS (SELECT doc_id, CAST(least(tok_cnt // 32, 3) AS INT) AS band FROM t),
        |p AS (SELECT CAST(unnest([0, 1, 2, 3]) AS INT) AS phase),
        |pool AS (
        | SELECT phase, doc_id, band,
        |  md5(CAST(doc_id AS VARCHAR) || ':cur' || CAST(phase AS VARCHAR)) AS h
        | FROM b CROSS JOIN p WHERE band <= phase)
        |SELECT phase,
        | CAST(row_number() OVER (PARTITION BY phase ORDER BY h, doc_id) AS BIGINT) AS pos,
        | doc_id, band
        |FROM pool ORDER BY phase, pos""".stripMargin,
    "sp07_epoch_order" ->
      """WITH e AS (
        | SELECT doc_id, unnest([0, 1]) AS epoch FROM documents),
        |h AS (
        | SELECT doc_id, epoch,
        |  md5(CAST(doc_id AS VARCHAR) || ':ep' || CAST(epoch AS VARCHAR)) AS h
        | FROM e),
        |a AS (
        | SELECT epoch, doc_id, h,
        |  CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) % 4 AS INT) AS shard
        | FROM h)
        |SELECT epoch, shard,
        | CAST(row_number() OVER (PARTITION BY epoch, shard ORDER BY h, doc_id) AS INT) AS pos,
        | doc_id
        |FROM a ORDER BY epoch, shard, pos""".stripMargin
  )
}
