#!/usr/bin/env python3
"""Local pre-check of SparkEntry queries vs DuckDB oracle.

Dev tool only (not part of the library). Usage:
  python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Loads each <out>/<name> parquet written by graft.Verify, runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB with views
over the same testdata parquet, and compares:
  - schema (column names, sorted)
  - dtypes: DuckDB DESCRIBE of the oracle SQL vs the Spark parquet
    schema, per column name. This is what the driver's hash sees:
    a DuckDB sum(BIGINT) is HUGEINT while Spark emits BIGINT, and
    Python-level value compare is blind to it — so any type drift
    is a local FAIL even when values match.
  - row count
  - values: exact match on column-name-sorted, row-sorted tuples
"""
import json, math, sys, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        if v == 0.0: return 0.0  # -0.0 == 0.0
        return v
    if isinstance(v, list): return tuple(norm(x) for x in v)
    return v

def key(row):
    return tuple((str(type(v)), str(norm(v))) for v in row)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        try:
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}"); n_fail += 1; continue
        gtypes = dict((r[0], r[1]) for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall())
        etypes = dict((r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall())
        dtbad = [(c, gtypes[c], etypes[c]) for c in sorted(gtypes)
                 if gtypes[c] != etypes[c]]
        if dtbad:
            print(f"FAIL {name}: dtype drift (spark vs oracle): " +
                  ", ".join(f"{c}: {g} != {e}" for c, g, e in dtbad))
            n_fail += 1; continue
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = sorted(key([r[i] for i in gi]) for r in got)
        e = sorted(key([r[i] for i in ei]) for r in exp)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}"); n_fail += 1; continue
        bad = [i for i, (a, b) in enumerate(zip(g, e)) if a != b]
        if bad:
            i = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(g)} rows differ; first @ {i}:\n  spark={g[i]}\n  duck ={e[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
