package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    // Scale note: k is small and fixed, so at 100 TB this is a
    // partial TakeOrdered per group — the window spills nothing like
    // a global sort would.
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
      val toks = size(split(col("text"), " "))
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
    // (md5 hash, a seeded shuffle both engines reproduce), a running
    // token sum per source places each doc at its exclusive prefix
    // offset, and pack_id = offset DIV budget — pure integer math.
    // One shuffle (the per-source window), agg is map-side combinable;
    // at 100 TB packs per source stream out of a single sort.
    "sp03_pack_sequences" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, d)
        .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(":sp03"))))
        .withColumn("tok_cnt", size(split(col("text"), " ")).cast("long"))
        .withColumn("cum", sum(col("tok_cnt")).over(w))
        .withColumn("pack_id", expr("CAST((cum - tok_cnt) DIV 2000 AS INT)"))
        .groupBy(col("source"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok_cnt")).as("pack_tokens"))
        .orderBy(col("source"), col("pack_id"))
    }),

    // Token-budget mixture: hit a target corpus composition (src0
    // upweighted 5x) under a global token budget. Each source gets
    // budget = weight*TOTAL/sum(weights) (integer division, exact);
    // docs are taken in deterministic hash order until the source's
    // exclusive prefix sum crosses its budget. The "sample to a target
    // token mixture" step of every training-data pipeline; same
    // single-window shuffle shape as sp03.
    "px02_mixture_budget" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, d)
        .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(":px02"))))
        .withColumn("tok_cnt", size(split(col("text"), " ")).cast("long"))
        .withColumn("wgt", when(col("source") === "src0", lit(5L)).otherwise(lit(1L)))
        .withColumn("budget", expr("CAST((wgt * 20000) DIV 24 AS BIGINT)"))
        .withColumn("cum", sum(col("tok_cnt")).over(w))
        .filter(col("cum") - col("tok_cnt") < col("budget"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tok_cnt")).as("sel_tokens"),
          max(col("budget")).as("budget_tokens"))
        .orderBy(col("source"))
    })
  )

  val oracle: Map[String, String] = Map(
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
        |GROUP BY source ORDER BY source""".stripMargin
  )
}
