package graft

import graft.api._
import org.apache.spark.sql.functions._

/** The end-to-end user story: a corpus lands in a topic, flows
  * through the curation verbs exactly as a training-data pipeline
  * would chain them, and comes out as packed sequences — with the
  * conservation and leak-proofness properties a production run relies
  * on asserted at every stage. */
class PipelineE2ESpec extends SparkSpec {

  test("topic -> gate -> dedup -> split -> pack: conserved, leak-proof, rerun-stable") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    val gs = new GraftSession(spark, root)
    val t0 = new java.sql.Timestamp(1700000000L * 1000)

    // 1. ingest: the corpus lands as a topic (bucketed parquet)
    val corpus = Tables(spark, sfDir, "documents").withColumn("time", lit(t0))
    gs.publish("raw_docs", corpus)
    val raw = gs.table("raw_docs")
    assert(raw.count() == corpus.count())

    // 2. gate: language + quality (scan-speed column verbs)
    val gated = raw.langId("text").filter(col("predicted") === "en")
      .qualityStats("text").filter(col("n_words") >= 10)
    val nGated = gated.count()
    assert(nGated > 0 && nGated <= raw.count())

    // 3. exact dedup keeps one doc per content hash (the verb emits
    // surviving ids; re-join recovers the rows)
    val deduped = gated.dedupExactRows("doc_id", "text")
    val nDeduped = deduped.count()
    assert(nDeduped > 0 && nDeduped <= nGated)
    assert(deduped.select(md5(col("text"))).distinct().count() == nDeduped,
      "dedup must leave one row per content hash")

    // 4. split: deterministic, leak-proof train/val/test
    val split = deduped.splitAssign("doc_id", 0.10, 0.10, seed = "e2e")
    assert(split.count() == nDeduped, "split adds a flag, drops nothing")

    // 5. pack the train split only
    val train = split.filter(col("split") === "train")
      .withColumn("tok_cnt", size(split_part_tokens(col("text"))))
    val packed = train.packSequences("source", "doc_id", "tok_cnt", 2000L, seed = "e2e")
    assert(packed.count() == train.count(), "packing assigns, never drops")
    // token conservation: pack offsets partition the per-source token stream
    val perSource = packed.groupBy("source")
      .agg(sum(col("tok_cnt")).as("toks"),
        max(col("pack_offset") + col("tok_cnt")).as("hi"))
      .filter(col("toks") =!= col("hi"))
    assert(perSource.count() == 0, "offsets must tile the token stream exactly")
    // leak-proofness: no packed doc carries a val/test id
    val leaked = packed.join(
      split.filter(col("split") =!= "train").select("doc_id"), Seq("doc_id"))
    assert(leaked.count() == 0, "val/test docs must never reach packing")

    // 5b. leak audit: because exact dedup ran BEFORE the split, no
    // text can appear in two splits — the ordering guarantee px05's
    // audit checks for in the large (n-gram) form, exact case here
    val crossSplit = split.select(md5(col("text")).as("h"), col("split")).distinct()
      .groupBy("h").agg(countDistinct(col("split")).as("ns")).filter(col("ns") > 1)
    assert(crossSplit.count() == 0, "dedup-before-split must kill exact cross-split dupes")

    // 5c. shard the packed train set for the writer: flag-only,
    // one shard per pack, every shard populated
    val sharded = packed
      .withColumn("pack_key", concat_ws("|", col("source"), col("pack_id")))
      .shardAssign("pack_key", 4, seed = "e2e")
    assert(sharded.count() == packed.count(), "sharding adds a flag, drops nothing")
    val splitPacks = sharded.select("pack_key", "shard").distinct()
      .groupBy("pack_key").count().filter(col("count") > 1)
    assert(splitPacks.count() == 0, "a pack maps to exactly one shard")
    assert(sharded.select("shard").distinct().count() == 4, "all shards populated")

    // 6. rerun stability: the same chain reproduces byte-identical packs
    val packedAgain = gs.table("raw_docs")
      .langId("text").filter(col("predicted") === "en")
      .qualityStats("text").filter(col("n_words") >= 10)
      .dedupExactRows("doc_id", "text")
      .splitAssign("doc_id", 0.10, 0.10, seed = "e2e")
      .filter(col("split") === "train")
      .withColumn("tok_cnt", size(split_part_tokens(col("text"))))
      .packSequences("source", "doc_id", "tok_cnt", 2000L, seed = "e2e")
    assert(packed.select("doc_id", "pack_id", "pack_offset").orderBy("doc_id").collect().toSeq ==
      packedAgain.select("doc_id", "pack_id", "pack_offset").orderBy("doc_id").collect().toSeq,
      "the pipeline must be rerun-stable end to end")

    gs.shutdown()
  }

  test("retrieval e2e: chunk -> lexical + vector shortlists -> RRF finds the planted doc") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // synthetic corpus, NOT the testdata tables — the verbs must
    // compose on any (id, text) frame. Doc 7 is the planted target:
    // it alone is dense in the query terms, and its fake embedding is
    // built from the same generator as the query vector.
    val docsDf = (0L until 40L).map { i =>
      val filler = (1 to 30).map(j => s"w${(i + j) % 17}").mkString(" ")
      val text = if (i == 7L) s"solar panel efficiency $filler solar panel" else filler
      (i, text)
    }.toDF("doc_id", "text")
    // deterministic hash-derived embeddings; the query vector reuses
    // doc 7's generator so the vector side also ranks doc 7 first
    def fakeEmb(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(15)), j =>
        ((pmod(hash(id, j), lit(201)).cast("float") - 100f) / 100f).cast("float"))
    val emb = docsDf.select(col("doc_id"), fakeEmb(col("doc_id")).as("embedding"))
    // 1. chunk: every doc splits cleanly with stable identities
    val chunks = docsDf.chunkWindows("doc_id", "text", width = 16, stride = 12)
    assert(chunks.count() >= 40 * 2,
      "30+ word docs at stride 12 must yield multiple chunks each")
    // 2. lexical shortlist over the CHUNK corpus (retrieval unit =
    // chunk), rolled up to docs: the planted doc must rank first
    val lexDoc = chunks
      .withColumn("cid", concat(col("doc_id"), lit("#"), col("chunk_idx")))
      .tfidfTopK("cid", "chunk_text", Seq("solar", "panel"), k = 50)
      .withColumn("doc_id", split_part(col("cid"), lit("#"), lit(1)).cast("long"))
      .groupBy("doc_id").agg(max("score").as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(50)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
    assert(lexDoc.orderBy("rank").select("doc_id").as[Long].head() == 7L,
      "the planted doc must top the lexical shortlist")
    // 3. vector shortlist vs the query vector (doc 7's generator)
    val q = emb.filter(col("doc_id") === 7L).select(col("embedding").as("q_emb"))
    val vecTop = emb.cosineTopK("embedding", q, "q_emb", 50, "doc_id")
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos_sim").desc, col("doc_id"))))
    // 4. fuse: rank-based RRF must put the doc both retrievers agree
    // on at the top
    val fused = vecTop.rrfFuse(lexDoc, "doc_id")
    assert(fused.select("doc_id").as[Long].head() == 7L,
      s"fusion must surface the planted doc: ${fused.collect().toSeq}")
  }

  private def split_part_tokens(c: org.apache.spark.sql.Column) = split(c, " ")

  test("serving e2e: streamed lexical index + ANN serve fuse to the planted doc") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{AnnQuery, TopicStream}
    val root = java.nio.file.Files.createTempDirectory("graft_serve_e2e").toString
    val store = new graft.sources.TopicStore(spark, root, bucketMinutes = 60)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // same planted corpus as the batch e2e: doc 7 is term-dense AND
    // its fake embedding generator supplies the query vector
    val docs = (0L until 40L).map { i =>
      val filler = (1 to 30).map(j => s"w${(i + j) % 17}").mkString(" ")
      val text = if (i == 7L) s"solar panel efficiency $filler solar panel" else filler
      (i, ts("2026-01-01 00:01:00"), text)
    }
    def fakeEmb(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(15)), j =>
        ((pmod(hash(id, j), lit(201)).cast("float") - 100f) / 100f).cast("float"))
    // 1. the lexical half STREAMS in
    val docIn = MemoryStream[(Long, java.sql.Timestamp, String)]
    val lexQ = TopicStream.lexIndexStream(
      docIn.toDF().toDF("doc_id", "ts", "text"), store, "lex")
      .option("checkpointLocation", s"$root/_lckpt").start()
    // 2. the vector half: index built once, queries stream against it
    val emb = docs.map(_._1).toDF("vec_id")
      .select(col("vec_id"), fakeEmb(col("vec_id")).as("embedding"),
        (col("vec_id") % 4).cast("int").as("label"))
    TopicStream.annIndexBuild(store, emb, "annidx")
    val qVec = emb.filter(col("vec_id") === 7L)
      .select("embedding").as[Array[Float]].head()
    val annIn = MemoryStream[AnnQuery]
    val annQ = TopicStream.annServeStream(annIn.toDF(), store, "annidx", "annres", k = 10)
      .option("checkpointLocation", s"$root/_ackpt").start()
    try {
      docIn.addData(docs: _*)
      annIn.addData(AnnQuery(9001L, ts("2026-01-01 00:02:00"), qVec))
      lexQ.processAllAvailable(); annQ.processAllAvailable()
      // 3. both serving surfaces answer; fuse their rank shortlists
      val lex = TopicStream.lexSearch(store, "lex", Seq("solar", "panel"), k = 10)
      val ann = store.readMerged("annres", "ann_key")
        .filter(col("q_id") === 9001L)
        .select(col("vec_id").as("doc_id"), col("rank"))
      val fused = ann.rrfFuse(lex, "doc_id")
      assert(fused.select("doc_id").as[Long].head() == 7L,
        s"fusion over the SERVED indexes must surface the planted doc: " +
          s"${fused.collect().toSeq}")
    } finally { lexQ.stop(); annQ.stop() }
  }
}
