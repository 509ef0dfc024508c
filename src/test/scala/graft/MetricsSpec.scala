package graft

import org.apache.spark.sql.functions._

/** The observability surface must MEASURE the scale claims the plans
  * make (SURVEY §4): zero-shuffle operators really move zero shuffle
  * bytes, and map-side combine really collapses the wire volume. */
class MetricsSpec extends SparkSpec {

  test("hash sampling measures zero shuffle traffic") {
    // the hashSample verb, not sp01: the sp01 query ends in an
    // orderBy purely for oracle determinism, which adds a (tiny)
    // range exchange that is not part of the sampling operator
    import graft.api._
    // noop sink: even count() would shuffle its per-partition partials
    val (_, m) = Metrics.measure(spark) {
      Tables(spark, sfDir, "documents").hashSample("doc_id", 0.25)
        .write.format("noop").mode("overwrite").save()
    }
    assert(m.tasks > 0 && m.inputRecords > 0)
    assert(m.shuffleBytesWritten == 0L,
      s"pure hash-filter sampling must not shuffle, saw ${m.shuffleBytesWritten} bytes")
    assert(m.diskBytesSpilled == 0L)
  }

  test("q01 map-side combine collapses shuffle records far below input records") {
    val (_, m) = Metrics.measure(spark) {
      // count() would let Spark shortcut the agg; collect the real result
      SparkEntry.queries("q01_agg")(spark, sfDir).collect()
    }
    assert(m.inputRecords > 1000, s"expected a real scan, read ${m.inputRecords}")
    assert(m.shuffleRecordsWritten > 0, "the agg must shuffle its partials")
    assert(m.shuffleAmplificationMilli < 100,
      s"partial agg should shuffle <10% of input records, " +
        s"saw ${m.shuffleRecordsWritten}/${m.inputRecords} " +
        s"(${m.shuffleAmplificationMilli} milli)")
  }

  test("broadcast star join (q04) never shuffles the fact side") {
    val fact = Tables(spark, sfDir, "customer").count()
    val (_, m) = Metrics.measure(spark) {
      SparkEntry.queries("q04_broadcast_join")(spark, sfDir).collect()
    }
    // the only shuffle allowed is the final agg/sort of the small result
    assert(m.shuffleRecordsWritten < fact,
      s"broadcast join must not shuffle the fact table: " +
        s"${m.shuffleRecordsWritten} shuffled vs $fact fact rows")
  }

  test("measure() isolates actions: a second measurement starts from zero") {
    val (_, m1) = Metrics.measure(spark) {
      Tables(spark, sfDir, "region").count()
    }
    val (_, m2) = Metrics.measure(spark) {
      spark.range(10).count()
    }
    assert(m1.inputRecords > 0)
    assert(m2.inputBytes == 0L, "range() reads no files; counters must not leak")
  }
}
