#!/usr/bin/env python3
"""DuckDB twin timings for every oracle SQL — the denominator of the
engine-vs-single-node-baseline ratio.

Usage: python3 tools/twin_bench.py [sfdir] [oracle_sql.json] [out.json]

Defaults: sf0.1, the oracle dump from the last full Verify run
(/tmp/verify_out/oracle_sql.json), TWIN_TIMES.json in the repo root.
Each SQL runs twice (cold then warm); the WARM time is recorded, which
is generous to DuckDB (Spark's per-fork bench pays its cold start).
"""
import sys, json, time
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/TWIN_TIMES.json"

con = duckdb.connect()
con.execute("PRAGMA threads=32")
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(oracle_path))
out = {}
for name, sql in sorted(oracle.items()):
    try:
        con.execute(sql).fetchall()           # cold (warms buffers/plan)
        t0 = time.time()
        con.execute(sql).fetchall()           # warm (recorded)
        out[name] = round(time.time() - t0, 4)
    except Exception as e:
        out[name] = None
        print(f"ERR {name}: {e}", file=sys.stderr)

ok = {k: v for k, v in out.items() if v is not None}
json.dump({"sf": sfdir, "unit": "sec", "total": round(sum(ok.values()), 2),
           "queries": out}, open(out_path, "w"), indent=0)
print(f"{len(ok)} queries, duckdb warm total {sum(ok.values()):.1f} s -> {out_path}")
