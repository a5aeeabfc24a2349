#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py [sfdir] [outdir]

Assumes `graft.Verify` was already run (sbt "runMain graft.Verify <sfdir> <outdir>").
Loads each <outdir>/<name> parquet result, runs the matching oracle SQL from
<outdir>/oracle_sql.json in DuckDB against the sf tables, and compares:
column names (sorted), row counts, and a value hash over column-name-sorted,
row-sorted string-rendered cells (floats repr'd at 12 sig digits).
"""
import sys, json, glob, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    # pandas DataFrame -> (sorted col names, row count, canonical cell table)
    cols = sorted(df.columns)
    df = df[cols]
    def render(v):
        # Type-aware, full-precision: int 0 and float 0.0 must render
        # DIFFERENTLY (the driver's hash distinguishes them — DuckDB
        # HUGEINT columns come back as float64 and broke q44 in r2),
        # and float diffs beyond 10 sig digits must fail here too.
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if v != v:
                # NaN is NOT null: collapsing them would hide a real
                # engine divergence (0/0 vs NULL) behind a passing hash
                return "f:nan"
            return f"f:{v:.17g}"
        return str(v)
    rows = sorted(tuple(render(v) for v in row) for row in df.itertuples(index=False, name=None))
    return cols, rows

fails = 0
for name in sorted(oracle):
    res_dir = f"{outdir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result at {res_dir}")
        fails += 1
        continue
    spark_df = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'").df()
    try:
        oracle_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fails += 1
        continue
    sc, sr = canon(spark_df)
    oc, orows = canon(oracle_df)
    if sc != oc:
        print(f"FAIL {name}: columns spark={sc} oracle={oc}")
        fails += 1
    elif len(sr) != len(orows):
        print(f"FAIL {name}: rows spark={len(sr)} oracle={len(orows)}")
        fails += 1
    elif sr != orows:
        diff = next(i for i, (a, b) in enumerate(zip(sr, orows)) if a != b)
        print(f"FAIL {name}: values differ at sorted-row {diff}:\n  spark : {sr[diff]}\n  oracle: {orows[diff]}")
        fails += 1
    else:
        print(f"PASS {name}: {len(sr)} rows, {len(sc)} cols")

print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} ({len(oracle)} queries)")
sys.exit(1 if fails else 0)
