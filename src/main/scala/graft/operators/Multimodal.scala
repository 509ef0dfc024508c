package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` payloads plus
  * typed metadata, processed in distributed batches.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked DETERMINISTIC STUB (dimensions derived from the
  * payload digest); everything around it — binary column synthesis,
  * schema, per-partition batch iteration, partition-parallel execution
  * — is real Spark plumbing, the exact shape a Pandas-UDF/`mapInPandas`
  * batch decoder takes at 100 TB (payload column pruned unless needed,
  * decode fanned out per partition, no driver-side collection).
  */
object Multimodal {
  /** Input row for the batch decoder. */
  case class MediaIn(doc_id: Long, payload: Array[Byte])
  /** Decoded metadata row. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, format: String,
                       width: Int, height: Int, phash8: String)

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b).map("%02x".format(_)).mkString

  private def nib(c: Char): Int = "0123456789abcdef".indexOf(c)

  /** STUB decode: a real deployment would parse image headers /
    * decode frames here (e.g. via a JNI codec or mapInPandas+PIL).
    * Deterministic fake: dims + format derived from the md5 digest.
    */
  private[operators] def decodeStub(in: MediaIn): MediaMeta = {
    val h = md5hex(in.payload)
    MediaMeta(
      doc_id = in.doc_id,
      n_bytes = in.payload.length,
      format = if (nib(h(0)) % 2 == 0) "png" else "jpeg",
      width = 64 + 16 * nib(h(1)),
      height = 64 + 16 * nib(h(2)),
      phash8 = h.substring(0, 8))
  }

  /** One sampled "frame" of a media payload. */
  case class MediaFrame(doc_id: Long, frame_idx: Int, frame_ts_ms: Int,
                        fhash8: String, brightness: Int)

  /** STUB frame sampler: a real deployment would demux the container
    * and decode every k-th frame here. Deterministic fake: frame count
    * and per-frame features derived from the payload digest. The 1→N
    * row expansion inside mapPartitions is the real shape of a frame
    * sampler at 100 TB — expansion happens executor-side per batch,
    * never on the driver, and downstream operators see ordinary rows.
    */
  private[operators] def sampleFramesStub(in: MediaIn): Iterator[MediaFrame] = {
    val h = md5hex(in.payload)
    val n = 2 + nib(h(3)) % 4
    Iterator.range(0, n).map { i =>
      val fh = md5hex((h + ":" + i).getBytes("UTF-8"))
      MediaFrame(in.doc_id, i, i * 40, fh.substring(0, 8), nib(fh(0)) * 16 + nib(fh(1)))
    }
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MAGIC-BYTE FORMAT SNIFFING + declared-vs-actual audit — the
    // media-ingest QA pass that needs NO codec, so unlike the decode
    // stubs this sniffer is the real production logic: the payload's
    // leading bytes are matched against the public magic numbers
    // (JPEG FF D8 FF, PNG 89 50 4E 47 0D 0A 1A 0A, RIFF 52 49 46 46)
    // and compared to the DECLARED format, reporting per
    // (declared, sniffed) file counts + bytes — the "0.3% of files
    // lie about their extension, 1% are headerless garbage" table
    // every crawl-ingest runs before decoding anything. Payloads are
    // synthesized with REAL magic prefixes (md5-selected; one class
    // deliberately headerless => sniffs 'unknown'); the sniff reads
    // ONLY the first 8 bytes of each payload (binary substring at
    // scan speed — the terabytes of media never leave the scan), and
    // the rollup partial-aggs into the format² domain.
    "mm05_format_sniff" -> ((s, d) => {
      val nibOf: String => org.apache.spark.sql.Column = salt =>
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(salt))),
          1, 1), 16, 10).cast("int")
      val media = Tables.spread(Tables(s, d, "documents"))
        .select(col("doc_id"),
          concat(
            when(nibOf(":fmt") % 4 === 0, unhex(lit("FFD8FF")))
              .when(nibOf(":fmt") % 4 === 1, unhex(lit("89504E470D0A1A0A")))
              .when(nibOf(":fmt") % 4 === 2, unhex(lit("52494646")))
              .otherwise(unhex(lit(""))),
            encode(col("text"), "UTF-8")).as("payload"),
          when(nibOf(":decl") % 3 === 0, "jpeg")
            .when(nibOf(":decl") % 3 === 1, "png")
            .otherwise("riff").as("declared"))
      val head = upper(hex(substring(col("payload"), 1, 8)))
      media
        .select(col("declared"),
          when(head.startsWith("FFD8FF"), "jpeg")
            .when(head.startsWith("89504E470D0A1A0A"), "png")
            .when(head.startsWith("52494646"), "riff")
            .otherwise("unknown").as("sniffed"),
          length(col("payload")).cast("long").as("nb"))
        .groupBy(col("declared"), col("sniffed"))
        .agg(count(lit(1)).as("n_files"), sum(col("nb")).as("total_bytes"))
        .withColumn("ok", col("declared") === col("sniffed"))
        .orderBy(col("declared"), col("sniffed"))
    }),

    // Binary payload column + batched per-partition decode.
    "mm01_binary_meta" -> ((s, d) => {
      import s.implicits._
      val media = Tables(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[MediaIn]
      // Undecodable (null) payloads route out: decode emits nothing
      // for them instead of failing the task — a corrupt media file
      // must never take down the batch.
      media.mapPartitions(_.withFilter(_.payload != null).map(decodeStub))
        .toDF()
        .orderBy(col("doc_id"))
    }),

    // Frame sampling: binary payload → N frame rows with per-frame
    // features, expanded per partition batch (video pipeline shape).
    "mm02_frame_sample" -> ((s, d) => {
      import s.implicits._
      val media = Tables(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[MediaIn]
      media.mapPartitions(_.withFilter(_.payload != null).flatMap(sampleFramesStub))
        .toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // Multimodal training-sample assembly: one manifest row per
    // sample joining ALL modalities — text stats, the embedding
    // (dim + order-free quantized checksum), and the decoded media
    // metadata (mm01's batch decode). The "build the actual training
    // record" step of a multimodal pipeline; at 100 TB each modality
    // table is bucketed on the sample id so the two equi-joins are
    // co-partitioned zero-shuffle joins (BucketedSpec shows the
    // mechanism) and the payload column itself is never read.
    "mm03_sample_assembly" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.spread(Tables(s, d, "documents"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          size(split(col("text"), " ")).as("tok_cnt"),
          encode(col("text"), "UTF-8").as("payload"))
      val meta = docs.select(col("doc_id"), col("payload")).as[MediaIn]
        .mapPartitions(_.withFilter(_.payload != null).map(decodeStub)).toDF()
        .select(col("doc_id"), col("format"), col("width"), col("height"), col("phash8"))
      val emb = Tables(s, d, "embeddings")
        .select(col("vec_id").as("doc_id"),
          size(col("embedding")).as("emb_dim"),
          aggregate(
            transform(col("embedding"),
              x => floor(x.cast("double") * 100 + 0.5).cast("long")),
            lit(0L), (acc, x) => acc + x).as("emb_qsum"))
      docs.drop("payload")
        .join(emb, "doc_id")
        .join(meta, "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Exact media dedup on the BINARY payload — the storage-side twin
    // of dd01 for multimodal corpora (identical images/clips re-crawled
    // under different ids are the dominant media redundancy). One
    // digest per payload at scan speed, one hash shuffle on the
    // 16-byte digest (partial-agg'd), never the payloads themselves:
    // at 100 TB the wire carries digests + counters while the
    // terabytes of media stay in place; keeper_id + n_copies +
    // total_bytes is exactly what a dedup-aware storage compactor
    // consumes. (Near-dup on media needs real perceptual decode —
    // phash is stubbed in this container, dedup on it would dedup the
    // stub; exact-dup is the honest boundary.)
    "mm04_binary_dedup" -> ((s, d) =>
      Tables.spread(Tables(s, d, "documents"))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .withColumn("media_hash", md5(col("payload")))
        .groupBy(col("media_hash"))
        .agg(min(col("doc_id")).as("keeper_id"),
          count(lit(1)).as("n_copies"),
          sum(length(col("payload")).cast("long")).as("total_bytes"))
        .orderBy(col("media_hash")))
  )

  val oracle: Map[String, String] = Map(
    "mm05_format_sniff" ->
      """WITH m AS (
        | SELECT doc_id, text,
        |  (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || ':fmt'), 1, 1)) - 1) % 4 AS f,
        |  (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || ':decl'), 1, 1)) - 1) % 3 AS dc
        | FROM documents),
        |p AS (
        | SELECT doc_id,
        |  from_hex(CASE f WHEN 0 THEN 'FFD8FF' WHEN 1 THEN '89504E470D0A1A0A'
        |                  WHEN 2 THEN '52494646' ELSE '' END) || encode(text) AS payload,
        |  CASE dc WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'riff' END AS declared
        | FROM m),
        |sn AS (
        | SELECT declared,
        |  CASE WHEN substr(upper(hex(payload)), 1, 6) = 'FFD8FF' THEN 'jpeg'
        |       WHEN substr(upper(hex(payload)), 1, 16) = '89504E470D0A1A0A' THEN 'png'
        |       WHEN substr(upper(hex(payload)), 1, 8) = '52494646' THEN 'riff'
        |       ELSE 'unknown' END AS sniffed,
        |  CAST(octet_length(payload) AS BIGINT) AS nb
        | FROM p)
        |SELECT declared, sniffed, CAST(count(*) AS BIGINT) AS n_files,
        | CAST(sum(nb) AS BIGINT) AS total_bytes,
        | declared = sniffed AS ok
        |FROM sn GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // The stub's md5-derived metadata is reproducible in SQL: DuckDB
    // md5 over the same UTF-8 bytes yields the same digest.
    "mm01_binary_meta" ->
      """WITH h AS (SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS hx FROM documents)
        |SELECT doc_id, n_bytes,
        | CASE WHEN (instr('0123456789abcdef', substr(hx,1,1)) - 1) % 2 = 0
        |      THEN 'png' ELSE 'jpeg' END AS format,
        | CAST(64 + 16 * (instr('0123456789abcdef', substr(hx,2,1)) - 1) AS INT) AS width,
        | CAST(64 + 16 * (instr('0123456789abcdef', substr(hx,3,1)) - 1) AS INT) AS height,
        | substr(hx, 1, 8) AS phash8
        |FROM h ORDER BY doc_id""".stripMargin,
    "mm02_frame_sample" ->
      """WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
        |f AS (
        | SELECT doc_id, hx,
        |  unnest(generate_series(0, 1 + (instr('0123456789abcdef', substr(hx,4,1)) - 1) % 4)) AS fi
        | FROM h),
        |ff AS (SELECT doc_id, fi, md5(hx || ':' || CAST(fi AS VARCHAR)) AS fh FROM f)
        |SELECT doc_id, CAST(fi AS INT) AS frame_idx, CAST(fi * 40 AS INT) AS frame_ts_ms,
        | substr(fh, 1, 8) AS fhash8,
        | CAST((instr('0123456789abcdef', substr(fh,1,1)) - 1) * 16
        |    + (instr('0123456789abcdef', substr(fh,2,1)) - 1) AS INT) AS brightness
        |FROM ff ORDER BY doc_id, frame_idx""".stripMargin,
    "mm03_sample_assembly" ->
      """WITH meta AS (
        | SELECT doc_id, md5(text) AS hx FROM documents),
        |m AS (
        | SELECT doc_id,
        |  CASE WHEN (instr('0123456789abcdef', substr(hx,1,1)) - 1) % 2 = 0
        |       THEN 'png' ELSE 'jpeg' END AS format,
        |  CAST(64 + 16 * (instr('0123456789abcdef', substr(hx,2,1)) - 1) AS INT) AS width,
        |  CAST(64 + 16 * (instr('0123456789abcdef', substr(hx,3,1)) - 1) AS INT) AS height,
        |  substr(hx, 1, 8) AS phash8
        | FROM meta),
        |e AS (
        | SELECT vec_id AS doc_id, CAST(len(embedding) AS INT) AS emb_dim,
        |  CAST(list_sum(list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 100 + 0.5) AS BIGINT))) AS BIGINT) AS emb_qsum
        | FROM embeddings),
        |t AS (
        | SELECT doc_id, source, n_chars,
        |  CAST(len(string_split(text, ' ')) AS INT) AS tok_cnt
        | FROM documents)
        |SELECT t.doc_id, t.source, t.n_chars, t.tok_cnt,
        | e.emb_dim, e.emb_qsum, m.format, m.width, m.height, m.phash8
        |FROM t JOIN e USING (doc_id) JOIN m USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    // payload = encode(text, UTF-8), so DuckDB's md5(text) (UTF-8
    // bytes) and octet_length give the identical digest and sizes.
    "mm04_binary_dedup" ->
      """SELECT md5(text) AS media_hash,
        | min(doc_id) AS keeper_id,
        | count(*) AS n_copies,
        | CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY media_hash""".stripMargin
  )
}
