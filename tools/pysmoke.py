#!/usr/bin/env python3
"""Python-client smoke test over the graft Serve endpoint.

Dev tool only. The full Python client for graft IS stock PySpark in
Spark Connect mode (SURVEY §6): `SparkSession.builder.remote(...)`
speaks the same gRPC+Arrow wire graft.Serve exposes, so there is no
client library to maintain. This script proves that end-to-end from a
real Python process: connect, create a topic through the `graft` V2
catalog, INSERT INTO it, read it back.

Requires: a running server (tools/run.sh graft.Serve <root> <port>)
and the `grpcio` + `pyarrow` packages PySpark's connect client needs.
If they are missing in this container, the script SKIPS with exit 0
and says why — the JVM-side wire evidence lives in ServeSpec.

Usage: python3 tools/pysmoke.py [sc://localhost:15002]
"""
import sys

try:
    import grpc  # noqa: F401  - pyspark-connect's transitive need
    import pyarrow  # noqa: F401  - the Arrow wire decoder
    from pyspark.sql import SparkSession
except ModuleNotFoundError as e:
    print(f"SKIP: {e.name} is not installed in this environment; "
          "the Spark Connect python client cannot run. "
          "JVM wire evidence: ServeSpec (sbt 'testOnly graft.ServeSpec').")
    sys.exit(0)

def main():
    url = sys.argv[1] if len(sys.argv) > 1 else "sc://localhost:15002"
    spark = SparkSession.builder.remote(url).getOrCreate()
    spark.sql("CREATE TABLE IF NOT EXISTS graft.pysmoke (id BIGINT, time TIMESTAMP, v STRING)")
    spark.sql("INSERT INTO graft.pysmoke VALUES "
              "(1, TIMESTAMP '2026-01-01 00:00:00', 'a'), "
              "(2, TIMESTAMP '2026-01-01 00:00:01', 'b')")
    rows = spark.sql("SELECT id, v FROM graft.pysmoke ORDER BY id").collect()
    got = [(r.id, r.v) for r in rows]
    assert (1, "a") in got and (2, "b") in got, got
    print(f"PASS: inserted and read back {len(got)} rows through {url}")
    spark.stop()

if __name__ == "__main__":
    main()
