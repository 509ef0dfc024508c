package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tensor/vector column operators over `embeddings` — the Spark
  * re-expression of ella's tensor column support (ella-tensor/src/
  * ops/{binary_arith,reduce,slice,shape,cmp,masked}.rs). Vectors are
  * `array<float>` columns; ops are per-row higher-order functions with
  * no shuffle at all — they run at scan speed at any scale.
  */
object VectorOps {
  // repartition(): embeddings ship as one parquet file locally; the
  // HOF vector math is interpreted (no codegen), so spread it.
  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.spread(Tables(s, d, "embeddings"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Elementwise arithmetic (ops/binary_arith.rs): y = 2x + 1 on the
    // first 4 components. Raw doubles — bit-identical across engines.
    "v01_elementwise" -> ((s, d) => {
      // Output scalarized (vec_id, pos, scaled): array-typed result
      // columns would be reader-dependent in the driver's comparator.
      emb(s, d)
        .select(col("vec_id"),
          posexplode(transform(slice(col("embedding"), 1, 4), x => x.cast("double") * 2.0 + 1.0)))
        .select(col("vec_id"), (col("pos") + 1).as("pos"), col("col").as("scaled"))
        .orderBy(col("vec_id"), col("pos"))
    }),

    // Per-vector reductions (ops/reduce.rs): sum, mean, min, max, L2.
    // The fold is computed ONCE and mean derived from it in a second
    // projection — the interpreted HOF is the dominant cost and
    // Catalyst does not CSE subexpressions across aggregate aliases.
    "v02_reduce" -> ((s, d) => {
      emb(s, d)
        .select(col("vec_id"),
          foldSum(transform(col("embedding"), _.cast("double"))).as("vsum"),
          size(col("embedding")).as("dim"),
          array_min(col("embedding")).as("vmin"),
          array_max(col("embedding")).as("vmax"),
          l2norm(col("embedding")).as("l2"))
        .select(col("vec_id"), col("vsum"), (col("vsum") / col("dim")).as("vmean"),
          col("vmin"), col("vmax"), col("l2"))
        .orderBy(col("vec_id"))
    }),

    // Slice + concat (ops/slice.rs, ops/shape.rs): head(8) ++ tail(4).
    "v03_slice_reshape" -> ((s, d) => {
      emb(s, d)
        .select(col("vec_id"), size(col("embedding")).as("dim"),
          posexplode(concat(slice(col("embedding"), 1, 8), slice(col("embedding"), -4, 4))))
        .select(col("vec_id"), col("dim"), (col("pos") + 1).as("pos"), col("col").as("v"))
        .orderBy(col("vec_id"), col("pos"))
    }),

    // Batched mat-vec (ops/builtin_arith.rs): dot with an alternating
    // +1/-1 pattern vector; exact sign flips keep elements bit-exact.
    "v04_matvec" -> ((s, d) => {
      // zip_with against a literal +-1 pattern: one pass, no per-index
      // element_at probing (x * -1.0 is an exact sign flip, so products
      // are bit-identical to the CASE form the oracle uses).
      val pattern = array((0 until 64).map(i => lit(if (i % 2 == 0) 1.0 else -1.0)): _*)
      emb(s, d)
        .select(col("vec_id"),
          foldSum(zip_with(col("embedding"), pattern, (x, w) => x.cast("double") * w)).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
        .limit(50)
    }),

    // Shape ops (ops/shape.rs: reshape:19, invert_axis:138, roll:154):
    // the 64-vector viewed as an 8x8 row-major matrix, plus reversed
    // and rolled views — all index arithmetic on exact float copies.
    "v06_shape_ops" -> ((s, d) => {
      emb(s, d)
        .select(col("vec_id"), col("embedding"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).as("pos"), col("col").as("v"),
          (col("pos") / 8 + 1).cast("int").as("mat_row"),
          (col("pos") % 8 + 1).cast("int").as("mat_col"),
          element_at(col("embedding"), size(col("embedding")) - col("pos")).as("reversed"),
          element_at(col("embedding"),
            ((col("pos") + lit(3)) % size(col("embedding"))) + 1).as("rolled"))
        .orderBy(col("vec_id"), col("pos"))
    }),

    // Scalar (int8) quantization: the 4x-memory ANN storage path.
    // floor(x*127/maxabs + 0.5) — floor of an identical double is
    // engine-exact (round() is not, SURVEY.md §5).
    "v07_quantize" -> ((s, d) => {
      emb(s, d)
        .withColumn("maxabs", array_max(transform(col("embedding"), x => abs(x))).cast("double"))
        .select(col("vec_id"), col("maxabs"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).as("pos"),
          floor(col("col").cast("double") * 127.0 / col("maxabs") + 0.5).cast("int").as("q8"))
        .orderBy(col("vec_id"), col("pos"))
    }),

    // Compare + masked select (ops/cmp.rs, ops/masked.rs).
    "v05_cmp_mask" -> ((s, d) => {
      val pos = filter(col("embedding"), x => x > 0.0f)
      emb(s, d)
        .select(col("vec_id"),
          size(pos).as("n_pos"),
          foldSum(transform(pos, _.cast("double"))).as("pos_sum"),
          element_at(pos, 1).as("first_pos"))
        .orderBy(col("vec_id"))
    }),

    // Unary arithmetic (ops/unary_arith.rs:10,44): neg/abs/sqrt/sign/
    // exp over the first 8 components. sqrt is IEEE-correctly-rounded
    // in both engines; exp is libm-dependent, so it is emitted on a
    // 1e-4 floor grid (validated empirically against the oracle).
    "v08_unary_arith" -> ((s, d) => {
      emb(s, d)
        .select(col("vec_id"), posexplode(transform(slice(col("embedding"), 1, 8), x => x.cast("double"))))
        .select(col("vec_id"), (col("pos") + 1).as("pos"),
          (-col("col")).as("neg"),
          abs(col("col")).as("absv"),
          sqrt(abs(col("col"))).as("sqrtv"),
          signum(col("col")).cast("int").as("sgn"),
          floor(exp(col("col")) * 10000).cast("long").as("exp_q"))
        .orderBy(col("vec_id"), col("pos"))
    }),

    // Boolean reductions (ops/boolean.rs:8,12 `all`/`any`): per-vector
    // any/all/count over a comparison mask — exists/forall short-
    // circuit per row, zero shuffle.
    "v09_bool_reduce" -> ((s, d) => {
      emb(s, d)
        .select(col("vec_id"),
          exists(col("embedding"), x => x.cast("double") > 0.5).as("any_hi"),
          forall(col("embedding"), x => x.cast("double") > -1.0).as("all_gt"),
          size(filter(col("embedding"), x => x.cast("double") > 0.5)).as("n_hi"))
        .orderBy(col("vec_id"))
    }),

    // concat + stack (ops/combine.rs:32,68): consecutive vectors
    // (i, i+1) concatenated along the axis and stacked on a new axis
    // (stack_row identifies the source). The pairing is an equi-join
    // on vec_id — shuffle-partitionable at any scale.
    "v10_concat_stack" -> ((s, d) => {
      val e = emb(s, d)
      val a = e.select(col("vec_id").as("vec_id"), col("embedding").as("ea"))
      val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("eb"))
      a.join(b, "vec_id")
        .select(col("vec_id"), posexplode(concat(slice(col("ea"), 1, 8), slice(col("eb"), 1, 8))))
        .select(col("vec_id"), (col("pos") + 1).as("pos"), col("col").cast("double").as("v"),
          (col("pos") / 8).cast("int").as("stack_row"))
        .orderBy(col("vec_id"), col("pos"))
    }),

    // scatter + index/gather (ops/scatter.rs, ops/index.rs): write
    // zeros at a literal index set; `taken` carries the gathered
    // values (null elsewhere). Pure per-row index arithmetic.
    "v11_scatter_index" -> ((s, d) => {
      val idxArr = array(Seq(5, 17, 33, 60).map(lit): _*)
      emb(s, d)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).as("pos"),
          when(array_contains(idxArr, col("pos") + 1), lit(0.0))
            .otherwise(col("col").cast("double")).as("scattered"),
          when(array_contains(idxArr, col("pos") + 1), col("col").cast("double")).as("taken"))
        .orderBy(col("vec_id"), col("pos"))
    }),

    // dtype conversion (ops/convert.rs): exact f32→f64 widening, and
    // integer conversions via floor (Spark CAST truncates toward zero
    // while DuckDB CAST rounds — floor is the portable semantics).
    "v12_convert" -> ((s, d) => {
      emb(s, d)
        .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 8)))
        .select(col("vec_id"), (col("pos") + 1).as("pos"),
          col("col").cast("double").as("as_f64"),
          floor(col("col").cast("double")).cast("long").as("as_i64_floor"),
          floor(col("col").cast("double") * 1000 + 0.5).cast("long").as("as_milli"))
        .orderBy(col("vec_id"), col("pos"))
    }),

    // Masked FILL (ella-tensor/src/mask.rs — the write half of the
    // masked-tensor wrapper; v05 covers masked SELECT): replace every
    // masked (negative) element with a fill value, report the mask
    // cardinality, the filled vector's ordered sum, and its head.
    // Pure per-row HOFs — scan speed, zero shuffle.
    "v18_masked_fill" -> ((s, d) => {
      val filled = transform(col("embedding"),
        x => when(x.cast("double") < 0.0, lit(0.0)).otherwise(x.cast("double")))
      emb(s, d)
        .select(col("vec_id"),
          size(filter(col("embedding"), x => x.cast("double") < 0.0)).as("n_masked"),
          foldSum(filled).as("filled_sum"),
          element_at(filled, 1).as("first_filled"))
        .orderBy(col("vec_id"))
    }),

    // STRING tensor columns (ella-tensor dtype genericity: tensors
    // are not only numeric — mask.rs/ops work over any dtype): the
    // word list of a document as an array<string> tensor — slice,
    // reverse, join, elementwise length fold, elementwise upper. Same
    // zero-shuffle per-row HOF discipline as the numeric family.
    "v19_string_tensor" -> ((s, d) => {
      val words = split(lower(col("text")), " ")
      Tables.spread(Tables(s, d, "documents"))
        .select(col("doc_id"),
          size(words).as("n_words"),
          array_join(slice(words, 1, 3), "-").as("head3"),
          array_join(reverse(slice(words, 1, 5)), " ").as("rev5"),
          aggregate(transform(words, w => length(w).cast("long")),
            lit(0L), (acc, x) => acc + x).as("len_sum"),
          upper(element_at(words, 1)).as("first_up"))
        .orderBy(col("doc_id"))
    }),

    // TEMPORAL tensor columns (same dtype-genericity gap): a per-row
    // hourly timestamp ramp built with sequence() — the temporal
    // linspace — then reduced (last element, ordered epoch fold).
    // Epochs ship as longs so the cross-engine compare is exact.
    "v20_time_tensor" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("steps",
          sequence(col("ts"), col("ts") + expr("INTERVAL 3 HOURS"), expr("INTERVAL 1 HOUR")))
        .select(col("event_id"),
          size(col("steps")).as("n_steps"),
          element_at(col("steps"), -1).cast("long").as("last_epoch"),
          aggregate(transform(col("steps"), t => t.cast("long")),
            lit(0L), (acc, x) => acc + x).as("epoch_sum"))
        .orderBy(col("event_id"))
    }),

    // Tensor constructors (ops/constructors.rs: linspace:53, ones:30,
    // range:63, eye:84) used as load-bearing operands: a linspace ramp
    // projection, a ones-vector dot (= sum), a range() integer fold,
    // and an eye-diagonal extraction (trace of the v13 8x8 view). All
    // constructed arrays are literals — codegen folds them, zero I/O.
    "v14_constructors" -> ((s, d) => {
      val lin = array((0 until 8).map(i => lit(i / 7.0)): _*) // linspace(0,1,8)
      val ones8 = array((0 until 8).map(_ => lit(1.0)): _*)   // ones(8)
      val head8 = transform(slice(col("embedding"), 1, 8), x => x.cast("double"))
      emb(s, d).select(col("vec_id"),
        foldSum(zip_with(head8, lin, (x, w) => x * w)).as("ramp_proj"),
        foldSum(zip_with(head8, ones8, (x, w) => x * w)).as("ones_dot"),
        aggregate(transform(sequence(lit(2), lit(20), lit(3)), x => x.cast("long")),
          lit(0L), (a, x) => a + x).as("range_sum"),
        foldSum(transform(sequence(lit(1), lit(8)),
          i => element_at(col("embedding"), (i - lit(1)) * 8 + i).cast("double"))).as("trace"))
        .orderBy(col("vec_id"))
    }),

    // 2-D tensor columns (ella's Const<2> columns, ella-engine/src/
    // lazy.rs:80-93 `col2`; ella-tensor shaped tensors): the 64-vector
    // reshaped to an 8x8 array<array<double>> matrix column, then
    // per-axis reductions (row/col sums) and matrix x vector — all
    // per-row HOF folds, no shuffle, scan speed at any scale.
    "v13_tensor2d" -> ((s, d) => {
      val pattern8 = array((0 until 8).map(i => lit(if (i % 2 == 0) 1.0 else -1.0)): _*)
      emb(s, d)
        .withColumn("mat", transform(sequence(lit(0), lit(7)), r =>
          transform(slice(col("embedding"), r * 8 + 1, lit(8)), x => x.cast("double"))))
        .select(col("vec_id"), posexplode(transform(sequence(lit(1), lit(8)), i => struct(
          foldSum(element_at(col("mat"), i)).as("row_sum"),
          foldSum(transform(col("mat"), row => element_at(row, i))).as("col_sum"),
          foldSum(zip_with(element_at(col("mat"), i), pattern8, (x, w) => x * w)).as("mv")))))
        .select(col("vec_id"), (col("pos") + 1).as("pos"),
          col("col.row_sum").as("row_sum"), col("col.col_sum").as("col_sum"), col("col.mv").as("mv"))
        .orderBy(col("vec_id"), col("pos"))
    }),

    // 3-D tensor columns (ella's Const<3> columns, ella-engine/src/
    // lazy.rs:86 `col3`; rank-3 shaped tensors in ella-tensor): the
    // 64-vector reshaped to a 4x4x4 array<array<array<double>>> cube
    // column — the video-frames / multi-head-embedding shape — then
    // per-axis plane reductions (one sum per index along each of the
    // three axes), the space diagonal, and an axis-0+axis-1 slice
    // reduce. All per-row HOF folds over the materialized rank-3
    // column: no shuffle, scan speed at any scale; scalarized output
    // like v13 so the result stays oracle-comparable.
    "v16_tensor3d" -> ((s, d) => {
      emb(s, d)
        .withColumn("cube", transform(sequence(lit(0), lit(3)), a =>
          transform(sequence(lit(0), lit(3)), b =>
            transform(slice(col("embedding"), a * 16 + b * 4 + 1, lit(4)),
              x => x.cast("double")))))
        .select(col("vec_id"), posexplode(transform(sequence(lit(1), lit(4)), i => struct(
          foldSum(flatten(element_at(col("cube"), i))).as("a0_sum"),
          foldSum(flatten(transform(col("cube"),
            pl => element_at(pl, i)))).as("a1_sum"),
          foldSum(flatten(transform(col("cube"),
            pl => transform(pl, r => element_at(r, i))))).as("a2_sum"),
          element_at(element_at(element_at(col("cube"), i), i), i).as("diag"),
          foldSum(element_at(element_at(col("cube"), i), 2)).as("slice_12")))))
        .select(col("vec_id"), (col("pos") + 1).as("pos"),
          col("col.a0_sum").as("a0_sum"), col("col.a1_sum").as("a1_sum"),
          col("col.a2_sum").as("a2_sum"), col("col.diag").as("diag"),
          col("col.slice_12").as("slice_12"))
        .orderBy(col("vec_id"), col("pos"))
    }),

    // DYN-shaped tensor columns (ella's `col_dyn`, ella-engine/src/
    // lazy.rs:90: tensors whose rank/shape is per-row DATA, not
    // schema): a dyn tensor is struct(shape: array<int>, data:
    // array<double>) with row-major layout, and every op reads the
    // shape at eval time. Rows carry rank-1 [64], rank-2 [8,8], or
    // rank-3 [4,4,4] views of the same 64-float buffer (vec_id mod
    // 3); rank, numel (shape product), shape-independent total, and
    // the first axis-0 slice sum (a contiguous numel/shape[0] chunk —
    // the same expression handles scalar/row/plane slices) are all
    // computed from the shape column. Pure per-row compute, zero
    // exchanges before the output sort.
    "v17_tensor_dyn" -> ((s, d) => {
      val numel = aggregate(col("t.shape"), lit(1), (a, x) => a * x)
      emb(s, d)
        .withColumn("t", struct(
          when(col("vec_id") % 3 === 0, array(lit(64)))
            .when(col("vec_id") % 3 === 1, array(lit(8), lit(8)))
            .otherwise(array(lit(4), lit(4), lit(4))).as("shape"),
          transform(col("embedding"), x => x.cast("double")).as("data")))
        .select(col("vec_id"),
          size(col("t.shape")).as("t_rank"),
          numel.as("numel"),
          foldSum(col("t.data")).as("total"),
          element_at(col("t.shape"), 1).as("axis0"),
          foldSum(slice(col("t.data"), lit(1),
            numel / element_at(col("t.shape"), 1))).as("slice0_sum"))
        .orderBy(col("vec_id"))
    }),

    // Full 8x8 matrix x matrix product between PAIRS of 2-D tensor
    // columns (ella matmul over Const<2> tensors, ella-tensor
    // builtin arithmetic): A = even vec_id, B = the following odd
    // vec_id, C[i,j] = sum_k A[i,k]*B[k,j]. Index arithmetic reads
    // straight off the flat 64-float column (A[i,k] = a[(i-1)*8+k]),
    // the k-fold is a sequential double left fold (bit-identical to
    // DuckDB list_sum), and the A-B pairing is a self equi-join on
    // vec_id — hashable and broadcastable; the matmul itself is
    // per-row compute, no shuffle beyond the pair join.
    "v15_matmul" -> ((s, d) => {
      val e = emb(s, d)
      val a = e.filter(col("vec_id") % 2 === 0 && col("vec_id") < 100)
        .select(col("vec_id"), col("embedding").as("ea"))
      val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("eb"))
      a.join(b, "vec_id")
        .select(col("vec_id"), posexplode(flatten(
          transform(sequence(lit(1), lit(8)), i =>
            transform(sequence(lit(1), lit(8)), j =>
              foldSum(transform(sequence(lit(1), lit(8)), k =>
                element_at(col("ea"), ((i - 1) * 8 + k).cast("int")).cast("double") *
                  element_at(col("eb"), ((k - 1) * 8 + j).cast("int")).cast("double"))))))))
        .select(col("vec_id"), expr("CAST(pos DIV 8 + 1 AS INT)").as("i"),
          expr("CAST(pos % 8 + 1 AS INT)").as("j"), col("col").as("c_ij"))
        .orderBy(col("vec_id"), col("i"), col("j"))
    })
  )

  val oracle: Map[String, String] = Map(
    "v01_elementwise" ->
      """SELECT vec_id,
        | CAST(unnest(generate_series(1, 4)) AS INT) AS pos,
        | unnest(list_transform(embedding[1:4], x -> CAST(x AS DOUBLE) * 2.0 + 1.0)) AS scaled
        |FROM embeddings ORDER BY vec_id, pos""".stripMargin,
    "v02_reduce" ->
      """SELECT vec_id,
        | list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS vsum,
        | list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) / len(embedding) AS vmean,
        | list_aggregate(embedding, 'min') AS vmin,
        | list_aggregate(embedding, 'max') AS vmax,
        | sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS l2
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "v03_slice_reshape" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        | CAST(unnest(generate_series(1, 12)) AS INT) AS pos,
        | unnest(embedding[1:8] || embedding[-4:]) AS v
        |FROM embeddings ORDER BY vec_id, pos""".stripMargin,
    "v04_matvec" ->
      """SELECT vec_id,
        | list_sum(list_transform(generate_series(1, len(embedding)),
        |   i -> CASE WHEN i % 2 = 1 THEN CAST(embedding[i] AS DOUBLE)
        |        ELSE -CAST(embedding[i] AS DOUBLE) END)) AS score
        |FROM embeddings ORDER BY score DESC, vec_id LIMIT 50""".stripMargin,
    "v06_shape_ops" ->
      """SELECT vec_id,
        | CAST(unnest(generate_series(1, len(embedding))) AS INT) AS pos,
        | unnest(embedding) AS v,
        | CAST(unnest(list_transform(generate_series(1, len(embedding)), i -> (i-1) // 8 + 1)) AS INT) AS mat_row,
        | CAST(unnest(list_transform(generate_series(1, len(embedding)), i -> (i-1) % 8 + 1)) AS INT) AS mat_col,
        | unnest(list_transform(generate_series(1, len(embedding)), i -> embedding[len(embedding) - i + 1])) AS reversed,
        | unnest(list_transform(generate_series(1, len(embedding)), i -> embedding[((i - 1 + 3) % len(embedding)) + 1])) AS rolled
        |FROM embeddings ORDER BY vec_id, pos""".stripMargin,
    "v07_quantize" ->
      """WITH m AS (
        | SELECT vec_id, embedding,
        |  CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS maxabs
        | FROM embeddings)
        |SELECT vec_id,
        | CAST(unnest(generate_series(1, len(embedding))) AS INT) AS pos,
        | CAST(unnest(list_transform(embedding,
        |   x -> floor(CAST(x AS DOUBLE) * 127.0 / maxabs + 0.5))) AS INT) AS q8
        |FROM m ORDER BY vec_id, pos""".stripMargin,
    "v05_cmp_mask" ->
      """SELECT vec_id,
        | CAST(len(list_filter(embedding, x -> x > 0.0)) AS INT) AS n_pos,
        | list_sum(list_transform(list_filter(embedding, x -> x > 0.0), x -> CAST(x AS DOUBLE))) AS pos_sum,
        | list_filter(embedding, x -> x > 0.0)[1] AS first_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "v08_unary_arith" ->
      """SELECT vec_id,
        | CAST(unnest(generate_series(1, 8)) AS INT) AS pos,
        | unnest(list_transform(embedding[1:8], x -> -CAST(x AS DOUBLE))) AS neg,
        | unnest(list_transform(embedding[1:8], x -> abs(CAST(x AS DOUBLE)))) AS absv,
        | unnest(list_transform(embedding[1:8], x -> sqrt(abs(CAST(x AS DOUBLE))))) AS sqrtv,
        | CAST(unnest(list_transform(embedding[1:8], x -> sign(CAST(x AS DOUBLE)))) AS INT) AS sgn,
        | CAST(unnest(list_transform(embedding[1:8], x -> floor(exp(CAST(x AS DOUBLE)) * 10000))) AS BIGINT) AS exp_q
        |FROM embeddings ORDER BY vec_id, pos""".stripMargin,
    "v09_bool_reduce" ->
      """SELECT vec_id,
        | len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.5)) > 0 AS any_hi,
        | len(list_filter(embedding, x -> NOT (CAST(x AS DOUBLE) > -1.0))) = 0 AS all_gt,
        | CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.5)) AS INT) AS n_hi
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "v10_concat_stack" ->
      """SELECT a.vec_id,
        | CAST(unnest(generate_series(1, 16)) AS INT) AS pos,
        | unnest(list_transform(a.embedding[1:8] || b.embedding[1:8], x -> CAST(x AS DOUBLE))) AS v,
        | CAST(unnest(list_transform(generate_series(1, 16), i -> (i - 1) // 8)) AS INT) AS stack_row
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |ORDER BY a.vec_id, pos""".stripMargin,
    "v11_scatter_index" ->
      """SELECT vec_id,
        | CAST(unnest(generate_series(1, len(embedding))) AS INT) AS pos,
        | unnest(list_transform(generate_series(1, len(embedding)),
        |   i -> CASE WHEN i IN (5, 17, 33, 60) THEN 0.0 ELSE CAST(embedding[i] AS DOUBLE) END)) AS scattered,
        | unnest(list_transform(generate_series(1, len(embedding)),
        |   i -> CASE WHEN i IN (5, 17, 33, 60) THEN CAST(embedding[i] AS DOUBLE) ELSE NULL END)) AS taken
        |FROM embeddings ORDER BY vec_id, pos""".stripMargin,
    "v12_convert" ->
      """SELECT vec_id,
        | CAST(unnest(generate_series(1, 8)) AS INT) AS pos,
        | unnest(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))) AS as_f64,
        | CAST(unnest(list_transform(embedding[1:8], x -> floor(CAST(x AS DOUBLE)))) AS BIGINT) AS as_i64_floor,
        | CAST(unnest(list_transform(embedding[1:8], x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5))) AS BIGINT) AS as_milli
        |FROM embeddings ORDER BY vec_id, pos""".stripMargin,
    "v18_masked_fill" ->
      """SELECT vec_id,
        | CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) < 0.0)) AS INT) AS n_masked,
        | list_sum(list_transform(embedding,
        |   x -> CASE WHEN CAST(x AS DOUBLE) < 0.0 THEN 0.0 ELSE CAST(x AS DOUBLE) END)) AS filled_sum,
        | CASE WHEN CAST(embedding[1] AS DOUBLE) < 0.0 THEN 0.0 ELSE CAST(embedding[1] AS DOUBLE) END AS first_filled
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "v19_string_tensor" ->
      """WITH w AS (
        | SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents)
        |SELECT doc_id,
        | CAST(len(words) AS INT) AS n_words,
        | array_to_string(list_slice(words, 1, 3), '-') AS head3,
        | array_to_string(list_reverse(list_slice(words, 1, 5)), ' ') AS rev5,
        | CAST(list_sum(list_transform(words, x -> CAST(length(x) AS BIGINT))) AS BIGINT) AS len_sum,
        | upper(words[1]) AS first_up
        |FROM w ORDER BY doc_id""".stripMargin,
    "v20_time_tensor" ->
      """WITH s AS (
        | SELECT event_id, generate_series(ts, ts + INTERVAL 3 HOUR, INTERVAL 1 HOUR) AS steps
        | FROM events)
        |SELECT event_id,
        | CAST(len(steps) AS INT) AS n_steps,
        | CAST(floor(epoch(steps[len(steps)])) AS BIGINT) AS last_epoch,
        | CAST(list_sum(list_transform(steps, t -> CAST(floor(epoch(t)) AS BIGINT))) AS BIGINT) AS epoch_sum
        |FROM s ORDER BY event_id""".stripMargin,
    "v14_constructors" ->
      """SELECT vec_id,
        | list_sum(list_transform(generate_series(1, 8),
        |   i -> CAST(embedding[i] AS DOUBLE) * ((i - 1) / 7.0))) AS ramp_proj,
        | list_sum(list_transform(generate_series(1, 8),
        |   i -> CAST(embedding[i] AS DOUBLE) * 1.0)) AS ones_dot,
        | CAST(list_sum(generate_series(2, 20, 3)) AS BIGINT) AS range_sum,
        | list_sum(list_transform(generate_series(1, 8),
        |   i -> CAST(embedding[(i - 1) * 8 + i] AS DOUBLE))) AS trace
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "v13_tensor2d" ->
      """WITH m AS (
        | SELECT vec_id, list_transform(generate_series(0, 7),
        |   r -> list_transform(embedding[r*8+1 : r*8+8], x -> CAST(x AS DOUBLE))) AS mat
        | FROM embeddings)
        |SELECT vec_id,
        | CAST(unnest(generate_series(1, 8)) AS INT) AS pos,
        | unnest(list_transform(generate_series(1, 8), i -> list_sum(mat[i]))) AS row_sum,
        | unnest(list_transform(generate_series(1, 8), i -> list_sum(list_transform(mat, row -> row[i])))) AS col_sum,
        | unnest(list_transform(generate_series(1, 8), i -> list_sum(list_transform(generate_series(1, 8),
        |   j -> mat[i][j] * CASE WHEN j % 2 = 1 THEN 1.0 ELSE -1.0 END)))) AS mv
        |FROM m ORDER BY vec_id, pos""".stripMargin,
    "v16_tensor3d" ->
      """WITH c AS (
        | SELECT vec_id, list_transform(generate_series(0, 3),
        |   a -> list_transform(generate_series(0, 3),
        |     b -> list_transform(embedding[a*16+b*4+1 : a*16+b*4+4], x -> CAST(x AS DOUBLE)))) AS cube
        | FROM embeddings)
        |SELECT vec_id,
        | CAST(unnest(generate_series(1, 4)) AS INT) AS pos,
        | unnest(list_transform(generate_series(1, 4), i -> list_sum(flatten(cube[i])))) AS a0_sum,
        | unnest(list_transform(generate_series(1, 4), i -> list_sum(flatten(list_transform(cube, pl -> pl[i]))))) AS a1_sum,
        | unnest(list_transform(generate_series(1, 4), i -> list_sum(flatten(list_transform(cube, pl -> list_transform(pl, r -> r[i])))))) AS a2_sum,
        | unnest(list_transform(generate_series(1, 4), i -> cube[i][i][i])) AS diag,
        | unnest(list_transform(generate_series(1, 4), i -> list_sum(cube[i][2]))) AS slice_12
        |FROM c ORDER BY vec_id, pos""".stripMargin,
    "v17_tensor_dyn" ->
      """WITH t AS (
        | SELECT vec_id,
        |  CASE WHEN vec_id % 3 = 0 THEN [64]
        |       WHEN vec_id % 3 = 1 THEN [8, 8]
        |       ELSE [4, 4, 4] END AS shape,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS data
        | FROM embeddings)
        |SELECT vec_id,
        | CAST(len(shape) AS INT) AS t_rank,
        | CAST(list_aggregate(shape, 'product') AS INT) AS numel,
        | list_sum(data) AS total,
        | CAST(shape[1] AS INT) AS axis0,
        | list_sum(data[1 : CAST(list_aggregate(shape, 'product') // shape[1] AS INT)]) AS slice0_sum
        |FROM t ORDER BY vec_id""".stripMargin,
    "v15_matmul" ->
      """WITH a AS (
        | SELECT vec_id, embedding AS ea FROM embeddings
        | WHERE vec_id % 2 = 0 AND vec_id < 100),
        |b AS (SELECT vec_id - 1 AS vec_id, embedding AS eb FROM embeddings),
        |p AS (SELECT a.vec_id, ea, eb FROM a JOIN b USING (vec_id))
        |SELECT vec_id,
        | CAST(unnest(generate_series(0, 63)) // 8 + 1 AS INT) AS i,
        | CAST(unnest(generate_series(0, 63)) % 8 + 1 AS INT) AS j,
        | unnest(list_transform(generate_series(0, 63), q ->
        |   list_sum(list_transform(generate_series(1, 8), k ->
        |     CAST(ea[(q // 8) * 8 + k] AS DOUBLE) *
        |     CAST(eb[(k - 1) * 8 + (q % 8) + 1] AS DOUBLE))))) AS c_ij
        |FROM p ORDER BY vec_id, i, j""".stripMargin
  )
}
