package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Every operator must be TOTAL on degenerate-but-legal inputs.
  *
  * At 100 TB these are not corner cases: a fresh topic, a feed
  * partition that produced nothing today, a corpus shard with null
  * text (failed extraction) or null embeddings (failed encoder call).
  * A query that throws there — null from a scalar subquery over no
  * rows, min/max of nothing feeding a sequence(), a hand-rolled
  * kernel reading a null array — takes the whole pipeline down
  * instead of producing the degraded report it should. Built-in
  * expressions get null-safety from Catalyst for free; the places
  * that bypass it (typed Aggregators, mapPartitions batch decode)
  * are exactly what this spec guards.
  */
class RobustnessSpec extends SparkSpec {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def runAll(dir: String): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try { q(spark, dir).collect(); None }
      catch { case e: Exception =>
        Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}") }
    }

  test("media decoders survive fuzzed bytes (never throw) and always parse their own synthesis") {
    import graft.operators.Multimodal
    // deterministic fuzz: 500 corrupt payloads per class — random
    // bytes, truncations of valid payloads, valid magic + garbage.
    // Decoders must route out (None/empty), never throw.
    val rnd = new scala.util.Random(42)
    val texts = (0 until 50).map(i => s"doc $i " + rnd.alphanumeric.take(rnd.nextInt(80)).mkString)
    val valid = texts.flatMap(t => Seq(
      Multimodal.mkMedia(t), Multimodal.mkGif(t), Multimodal.mkWav(t), Multimodal.mkMp4(t)))
    val fuzz: Seq[Array[Byte]] =
      (0 until 100).map(_ => Array.fill(rnd.nextInt(200))(rnd.nextInt.toByte)) ++
      valid.map(p => p.take(rnd.nextInt(p.length))) ++
      valid.map { p =>
        val c = p.clone
        (0 until 1 + rnd.nextInt(8)).foreach(_ => c(rnd.nextInt(c.length)) = rnd.nextInt.toByte)
        c
      }
    fuzz.zipWithIndex.foreach { case (p, i) =>
      val in = Multimodal.MediaIn(i.toLong, p)
      Multimodal.decodeMedia(in)       // Option — must not throw
      Multimodal.decodeWav(in)
      Multimodal.decodeMp4(in)
      Multimodal.sampleFrames(in).toList
    }
    // every clean synthesized payload must parse back to its formula
    texts.foreach { t =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      def nib(c: Char) = "0123456789abcdef".indexOf(c)
      val img = Multimodal.decodeMedia(Multimodal.MediaIn(1L, Multimodal.mkMedia(t)))
      assert(img.exists(m => m.width == 64 + 16 * nib(h(1)) && m.height == 64 + 16 * nib(h(2))))
      val mp4 = Multimodal.decodeMp4(Multimodal.MediaIn(1L, Multimodal.mkMp4(t)))
      assert(mp4.exists(v => v.width == 16 * (20 + nib(h(11))) && v.n_tracks == 1))
      val wav = Multimodal.decodeWav(Multimodal.MediaIn(1L, Multimodal.mkWav(t)))
      assert(wav.exists(_.data_bytes == t.getBytes("UTF-8").length))
      val gif = Multimodal.sampleFrames(Multimodal.MediaIn(1L, Multimodal.mkGif(t))).size
      assert(gif == 2 + nib(h(3)) % 4)
    }
  }

  test("all queries complete on empty tables (schema preserved, zero rows)") {
    val dir = Files.createTempDirectory("graft_sf_empty").toString
    // events.ts is TIMESTAMP(NANOS) — readable only as raw int64
    // (the same conf Tables.events sets); the empty copy then carries
    // plain INT64, which Tables.events consumes identically.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = runAll(dir)
    assert(failures.isEmpty,
      s"queries must be total on empty input:\n${failures.mkString("\n")}")
  }

  test("all queries complete with null text and null embeddings injected") {
    val dir = Files.createTempDirectory("graft_sf_nulls").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables.foreach { t =>
      val raw = spark.read.parquet(s"$sfDir/$t.parquet")
      val df = t match {
        case "documents" => raw.withColumn("text",
          when(col("doc_id") % 7 === 0, lit(null: String)).otherwise(col("text")))
        case "embeddings" => raw.withColumn("embedding",
          when(col("vec_id") % 7 === 0, lit(null).cast("array<float>"))
            .otherwise(col("embedding")))
        case _ => raw
      }
      df.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = runAll(dir)
    assert(failures.isEmpty,
      s"queries must be total under null text/embeddings:\n${failures.mkString("\n")}")
  }
}
