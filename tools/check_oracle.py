#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfdir> <verify_out_dir>

Mirrors the contract: for each query with an oracleSql entry, load the
Spark parquet output and the DuckDB result, sort columns by name,
and compare values row-by-row.
"""
import json, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
if len(sys.argv) > 3:  # optional: restrict to named queries
    names = set(sys.argv[3].split(","))
    oracle = {k: v for k, v in oracle.items() if k in names}

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

fails = 0
for name, sql in sorted(oracle.items()):
    spark_files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not spark_files:
        print(f"[MISS] {name}: no spark output"); fails += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"[ERR ] {name}: {e}"); fails += 1; continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"[COLS] {name}: spark={list(got.columns)} oracle={list(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"[ROWS] {name}: spark={len(got)} oracle={len(want)}")
        fails += 1; continue
    import pandas as pd
    g = got.reset_index(drop=True)
    w = want.reset_index(drop=True)
    # the driver's hash canonicalizes values per-KIND (an int64 "1" and a
    # float64 "1.0" hash differently even when numerically equal — the
    # round-2 q_sessionize failure mode), so an integer-vs-float skew is a
    # FAIL here even though the value compare below is dtype-lenient.
    # Width-only skew (int32 vs int64) canonicalizes identically — round-2
    # queries with it were hash-green — and is not flagged.
    dtype_skew = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
                  if g[c].dtype.kind != w[c].dtype.kind]
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
        if dtype_skew:
            print(f"[TYPE] {name}: dtype skew {dtype_skew}")
            fails += 1
        else:
            print(f"[ OK ] {name}: {len(got)} rows")
    except AssertionError as e:
        print(f"[DIFF] {name}: {str(e).splitlines()[-1] if str(e) else 'mismatch'}")
        fails += 1

print(f"\n{len(oracle) - fails}/{len(oracle)} oracle-checked queries match")
sys.exit(1 if fails else 0)
