#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare with the Verify.scala
parquet dumps (rows sorted, columns sorted by name, exact value match).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
Dev tooling only (driver-side python) — not part of the shipped library.
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if not os.path.isdir(p):
            continue
        got = pq.read_table(p).to_pandas()
        if name not in oracle:
            status = "ROWS-ONLY " + ("ok" if len(got) > 0 else "EMPTY!")
            print(f"{name:28s} {status} ({len(got)} rows)")
            n_ok += 1 if len(got) > 0 else 0
            n_bad += 0 if len(got) > 0 else 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name:28s} ORACLE SQL ERROR: {str(e)[:200]}")
            n_bad += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"{name:28s} SCHEMA MISMATCH spark={list(g.columns)} duck={list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"{name:28s} ROWCOUNT MISMATCH spark={len(g)} duck={len(e)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            # Dtype check mirrors the driver's dtype-sensitive hash: a DuckDB
            # HUGEINT (-> float64) vs Spark int64 fails the driver even when
            # every value is identical. Flag it locally so the oracle author
            # adds the CAST before the driver hash does.
            if gv.dtype.kind != ev.dtype.kind:
                bad_cols.append(f"{c}(DTYPE spark={gv.dtype} duck={ev.dtype})")
                continue
            if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
                eq = ((gv == ev) | (gv.isna() & ev.isna())).all()
                if not eq:
                    d = (gv - ev).abs().max()
                    bad_cols.append(f"{c}(maxdiff={d})")
            else:
                eq = ((gv == ev) | (gv.isna() & ev.isna())).all()
                if not eq:
                    bad_cols.append(c)
        if bad_cols:
            print(f"{name:28s} VALUE MISMATCH in {bad_cols}")
            n_bad += 1
        else:
            print(f"{name:28s} OK ({len(g)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
