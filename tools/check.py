#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads oracle_sql.json from the verify output dir, runs each SQL in DuckDB
against the sfDir parquet tables, and compares against the Spark-written
parquet under verifyOutDir/<name>/ — strictly: columns sorted by name,
then exact value equality in row order (so any laxer driver compare also
passes). Reports per-query PASS/FAIL with first diffs.
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    con = duckdb.connect()
    return con.sql(f"SELECT * FROM read_parquet({files!r})").df()

def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    if isinstance(a, (np.ndarray, list)) and isinstance(b, (np.ndarray, list)):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(cmp_cell(x, y) for x, y in zip(la, lb))
    return a == b

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        got = load_spark(outdir, name)
        if got is None:
            import os
            marker = f"{outdir}/{name}/_ERROR"
            if os.path.exists(marker):
                msg = open(marker).read().strip()[:200]
                print(f"ERR  {name}: query crashed: {msg}")
            else:
                print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        got, exp = norm(got), norm(exp)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(exp.columns)}")
            n_fail += 1
            continue
        # Dtype-kind check: the driver-side hash compare distinguishes
        # representations the lax value compare below doesn't — observed in
        # round 1 with DuckDB SUM(BIGINT) -> HUGEINT (object dtype) vs Spark
        # int64. Width-only differences (int32 vs int64) DID hash-match at
        # the driver, so compare numpy dtype kind, not full dtype.
        def kind(s):
            return getattr(s.dtype, "kind", "O")
        dt_bad = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in got.columns
                  if kind(got[c]) != kind(exp[c])]
        if dt_bad:
            print(f"FAIL {name}: dtype-kind mismatch (spark,oracle): {dt_bad}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        bad = []
        for i in range(len(got)):
            for c in got.columns:
                a, b = got[c].iloc[i], exp[c].iloc[i]
                if not cmp_cell(a, b):
                    bad.append((i, c, a, b))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, first: {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # rows-only entries (queries without oracle) are listed for visibility
    for d in sorted(glob.glob(f"{outdir}/*/")):
        qn = d.rstrip("/").split("/")[-1]
        if qn not in oracle:
            df = load_spark(outdir, qn)
            nrows = 0 if df is None else len(df)
            print(f"ROWS-ONLY {qn}: {nrows} rows {'OK' if nrows > 0 else 'EMPTY!'}")
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
