package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table: brute-force cosine
  * top-k (correctness baseline), random-hyperplane LSH ANN (the scale
  * path — buckets bound the comparison set), and nearest-centroid
  * assignment (the IVF building block).
  *
  * Scale notes: the query row and the centroid table are broadcast;
  * candidate generation never shuffles the big side more than once.
  * Top-k uses orderBy+limit => TakeOrderedAndProject, no global sort.
  */
object Similarity {
  private val QueryId = 7

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** 8 deterministic ±1 hyperplanes, dim 64, derived from md5 so both
    * engines see literally identical plane constants. */
  private[operators] val planes: Seq[Seq[Double]] =
    (0 until 8).map(h => (0 until 64).map(i => if (md5hex(s"$h:$i").head <= '7') 1.0 else -1.0))

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "embeddings").repartition()

  private def bucketCol(e: Column): Column =
    planes.zipWithIndex.map { case (w, h) =>
      when(dotConst(e, w) > 0.0, lit(1 << h)).otherwise(lit(0))
    }.reduce(_ + _).cast("int")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Centroids via the custom typed Aggregator (VectorSumAgg): one
    // dense buffer per (label x partition) shuffles instead of dim
    // exploded rows per vector — the 100 TB centroid path. Output
    // scalarized + rounded at 1e-2 (cross-row FP order error ~1e-13
    // is far inside the grid, SURVEY.md §5).
    "ss04_centroid_agg" -> ((s, d) => {
      val vecsum = org.apache.spark.sql.functions.udaf(graft.functions.VectorSumAgg)
      emb(s, d)
        .groupBy(col("label"))
        .agg(vecsum(col("embedding")).as("vsum"), count(lit(1)).as("n"))
        .select(col("label"), col("n"), posexplode(col("vsum")))
        .select(col("label"), col("n"), (col("pos") + 1).as("pos"),
          round(col("col"), 2).as("sum_r"),
          round(col("col") / col("n"), 2).as("centroid_r"))
        .orderBy(col("label"), col("pos"))
    }),

    // IVF probe: the query lands in its nearest rounded-centroid cell
    // (nprobe=1) and only that cell's members are scored — at 100 TB
    // the fact side is pre-partitioned by cell, so a probe reads one
    // partition instead of the corpus.
    "ss05_ivf_probe" -> ((s, d) => {
      val e = emb(s, d)
      val ex = e.select(col("label"), posexplode(col("embedding")))
        .select(col("label"), col("pos"), col("col").cast("double").as("v"))
      val cen = ex.groupBy(col("label").as("c_label"), col("pos"))
        .agg(round(avg(col("v")), 2).as("c"))
        .groupBy(col("c_label"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          st => st.getField("c")).as("cvec"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("c_label"))
      val assigned = e.crossJoin(broadcast(cen))
        .withColumn("dist2", l2distSq(col("embedding"), col("cvec")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("c_label").as("cell"))
      val q = assigned.filter(col("vec_id") === QueryId)
        .select(col("embedding").as("q_emb"), col("cell").as("q_cell"))
      assigned.join(broadcast(q), col("cell") === col("q_cell"))
        .select(col("vec_id"), col("cell"), cosine(col("embedding"), col("q_emb")).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    }),

    // Brute-force cosine top-k vs the query vector (broadcast).
    "ss01_brute_topk" -> ((s, d) => {
      val e = emb(s, d)
      val q = e.filter(col("vec_id") === QueryId).select(col("embedding").as("q_emb"))
      e.crossJoin(broadcast(q))
        .select(col("vec_id"), cosine(col("embedding"), col("q_emb")).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10 * 5)
    }),

    // LSH-bucketed ANN: only the query's bucket is scored. At 100 TB
    // the bucket column is precomputed/partitioned-on, so a probe scans
    // ~1/2^8 of the data instead of all of it.
    "ss02_lsh_ann" -> ((s, d) => {
      val withB = emb(s, d).withColumn("bucket", bucketCol(col("embedding")))
      val q = withB.filter(col("vec_id") === QueryId)
        .select(col("embedding").as("q_emb"), col("bucket").as("q_bucket"))
      withB.join(broadcast(q), col("bucket") === col("q_bucket"))
        .select(col("vec_id"), col("bucket"), cosine(col("embedding"), col("q_emb")).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    }),

    // Nearest-centroid: per-label centroids (rounded to an exact 1e-2
    // grid so both engines see identical constants), then each vector
    // assigned to its closest centroid — the IVF coarse quantizer.
    "ss03_pairwise_label" -> ((s, d) => {
      val e = emb(s, d)
      val ex = e.select(col("label"), posexplode(col("embedding")))
        .select(col("label"), col("pos"), col("col").cast("double").as("v"))
      val cen = ex.groupBy(col("label").as("c_label"), col("pos"))
        .agg(round(avg(col("v")), 2).as("c"))
        .groupBy(col("c_label"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          s => s.getField("c")).as("cvec"))
      val assigned = e.crossJoin(broadcast(cen))
        .withColumn("dist2", l2distSq(col("embedding"), col("cvec")))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist2"), col("c_label"))
      assigned.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("label"), col("c_label").as("nearest_label"), col("dist2"))
        .orderBy(col("vec_id"))
    })
  )

  // ---- (defs continued in map above) ----
  // ---- oracle SQL (plane constants embedded as literals) ----

  private def sqlList(v: Seq[Double]): String = v.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ",", "]")

  private val dotQ =
    "list_sum(list_transform(generate_series(1, len(e.embedding)), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))"
  private def norm(x: String): String =
    s"sqrt(list_sum(list_transform($x, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"

  val oracle: Map[String, String] = Map(
    "ss04_centroid_agg" ->
      """WITH ex AS (
        | SELECT label, unnest(generate_series(1, len(embedding))) AS pos,
        |  unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
        | FROM embeddings),
        |n AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1)
        |SELECT ex.label, n.n, CAST(ex.pos AS INT) AS pos,
        | round(sum(v), 2) AS sum_r, round(sum(v) / n.n, 2) AS centroid_r
        |FROM ex JOIN n ON ex.label = n.label
        |GROUP BY ex.label, n.n, ex.pos
        |ORDER BY ex.label, pos""".stripMargin,

    "ss01_brute_topk" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = $QueryId)
         |SELECT e.vec_id,
         | $dotQ / (${norm("e.embedding")} * ${norm("q.q_emb")}) AS cos_sim
         |FROM embeddings e, q
         |ORDER BY cos_sim DESC, vec_id LIMIT 50""".stripMargin,
    "ss02_lsh_ann" -> {
      val planeCols = planes.indices.map(h => s"${sqlList(planes(h))} AS p$h").mkString(", ")
      val bucketExpr = planes.indices.map(h =>
        s"(CASE WHEN list_sum(list_transform(generate_series(1, len(embedding)), i -> CAST(embedding[i] AS DOUBLE) * p$h[i])) > 0 THEN ${1 << h} ELSE 0 END)"
      ).mkString(" + ")
      s"""WITH p AS (SELECT $planeCols),
         |b AS (SELECT vec_id, embedding, CAST($bucketExpr AS INT) AS bucket FROM embeddings, p),
         |q AS (SELECT embedding AS q_emb, bucket AS q_bucket FROM b WHERE vec_id = $QueryId)
         |SELECT e.vec_id, e.bucket,
         | $dotQ / (${norm("e.embedding")} * ${norm("q.q_emb")}) AS cos_sim
         |FROM b e, q WHERE e.bucket = q.q_bucket
         |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin
    },
    "ss05_ivf_probe" ->
      s"""WITH ex AS (
        | SELECT label, unnest(generate_series(1, len(embedding))) AS pos,
        |  unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
        | FROM embeddings),
        |cen AS (
        | SELECT label AS c_label, pos, round(avg(v), 2) AS c FROM ex GROUP BY 1, 2),
        |cvecs AS (
        | SELECT c_label, list(c ORDER BY pos) AS cvec FROM cen GROUP BY 1),
        |assigned AS (
        | SELECT e.vec_id, e.embedding, c.c_label,
        |  row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |   list_sum(list_transform(generate_series(1, len(e.embedding)),
        |     i -> (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i]) * (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i]))), c.c_label) AS rn
        | FROM embeddings e CROSS JOIN cvecs c),
        |cells AS (SELECT vec_id, embedding, c_label AS cell FROM assigned WHERE rn = 1),
        |q AS (SELECT embedding AS q_emb, cell AS q_cell FROM cells WHERE vec_id = $QueryId)
        |SELECT e.vec_id, e.cell,
        | list_sum(list_transform(generate_series(1, len(e.embedding)), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))
        |  / (sqrt(list_sum(list_transform(e.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(q.q_emb, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos_sim
        |FROM cells e, q WHERE e.cell = q.q_cell
        |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin,
    "ss03_pairwise_label" ->
      """WITH ex AS (
        | SELECT label, unnest(generate_series(1, len(embedding))) AS pos,
        |  unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
        | FROM embeddings),
        |cen AS (
        | SELECT label AS c_label, pos, round(avg(v), 2) AS c FROM ex GROUP BY 1, 2),
        |cvecs AS (
        | SELECT c_label, list(c ORDER BY pos) AS cvec FROM cen GROUP BY 1),
        |assigned AS (
        | SELECT e.vec_id, e.label, c.c_label,
        |  list_sum(list_transform(generate_series(1, len(e.embedding)),
        |    i -> (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i]) * (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i]))) AS dist2
        | FROM embeddings e CROSS JOIN cvecs c),
        |ranked AS (
        | SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist2, c_label) AS rn FROM assigned)
        |SELECT vec_id, label, c_label AS nearest_label, dist2
        |FROM ranked WHERE rn = 1 ORDER BY vec_id""".stripMargin
  )
}
