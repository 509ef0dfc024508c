#!/usr/bin/env python3
"""Python round-trip against the graft library over PySpark's py4j
gateway — the fallback proof while this container lacks `grpcio` (the
Spark Connect client's transport; see tools/pysmoke.py for the real
client path, which stays primed and self-skips today).

What this DOES prove from a genuine Python process:
  - graft's jars drive from Python (catalog, topics, SQL surface);
  - a Python-held GraftSession creates a topic, publishes rows, and
    reads them back through the same TopicStore layout every other
    surface uses;
  - results cross the JVM->Python boundary as proper typed rows.

What only Connect can prove (deferred to pysmoke.py): the gRPC+Arrow
wire, remote auth, and session isolation.

Usage: python3 tools/pygateway_smoke.py
"""
import os
import sys
import tempfile

try:
    from pyspark.sql import SparkSession
except ModuleNotFoundError as e:
    print(f"SKIP: {e.name} is not installed; no Python smoke possible.")
    sys.exit(0)


def main():
    classes = "/root/repo/target/scala-2.13/classes"
    if not os.path.isdir(classes):
        print("SKIP: build first (sbt compile)")
        sys.exit(0)
    root = tempfile.mkdtemp(prefix="graft_pygw_")
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.driver.extraClassPath", classes)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    jvm = spark._jvm  # py4j gateway into the live JVM
    gs = jvm.graft.GraftSession(spark._jsparkSession, root)

    # publish through the Python-held session: topic auto-creates,
    # rows land in the bucketed TopicStore layout
    df = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00", "a"), (2, "2026-01-01 00:00:01", "b")],
        "id LONG, time STRING, v STRING",
    ).selectExpr("id", "CAST(time AS TIMESTAMP) AS time", "v")
    gs.publish("pygw_smoke", df._jdf, "time")

    # read back through the session's SQL surface (topics resolve in
    # the graft catalog, not as bare Spark temp views), wrapping the
    # returned JVM DataFrame for Python-side collection
    from pyspark.sql import DataFrame as PyDF

    out = PyDF(gs.query("SELECT id, v FROM pygw_smoke ORDER BY id"), spark)
    got = sorted((r.id, r.v) for r in out.collect())
    assert got == [(1, "a"), (2, "b")], got
    n = gs.query("SELECT count(*) AS n FROM pygw_smoke").collect()[0].getLong(0)
    assert n == 2, n

    # the unified-workflow half: SUBSCRIBE to the same topic from
    # Python (streaming replay + live tail), publish one more row on
    # the live stream, and watch it arrive
    sub = PyDF(gs.subscribe("pygw_smoke"), spark)
    q = (
        sub.writeStream.format("memory")
        .queryName("pygw_tail")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table("pygw_tail").count() == 2  # replay
        late = spark.createDataFrame(
            [(3, "2026-01-01 00:00:02", "c")], "id LONG, time STRING, v STRING"
        ).selectExpr("id", "CAST(time AS TIMESTAMP) AS time", "v")
        gs.publish("pygw_smoke", late._jdf, "time")
        q.processAllAvailable()
        got3 = sorted(
            r.id for r in spark.table("pygw_tail").select("id").collect()
        )
        assert got3 == [1, 2, 3], got3  # live tail caught the publish
    finally:
        q.stop()

    gs.shutdown()
    spark.stop()
    print(f"PASS: Python published, queried, and SUBSCRIBED to a graft topic at {root}")


if __name__ == "__main__":
    main()
