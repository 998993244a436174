#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (SURVEY.md §5).

Usage: oracle_check.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (tables
registered as views over {sfDir}/{table}.parquet), sort columns by
name, sort rows, compare cell-exact (with a small float report when
exact fails).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (sfN stress data)
            p = f"{p}/**/*.parquet"  # recursive: covers partitioned dirs too
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    waivers = {}
    if os.path.exists(f"{out_dir}/waivers.json"):
        waivers = json.load(open(f"{out_dir}/waivers.json"))
    n_pass = n_fail = n_waived = n_unexplained = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"!! {name}: NO SPARK OUTPUT"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            if name in waivers:
                print(f"   {name}: rows-only ({len(got)} rows) — "
                      f"WAIVED: {waivers[name]}")
                n_waived += 1
            else:
                print(f"!! {name}: rows-only ({len(got)} rows) — UNEXPLAINED "
                      "(no oracle SQL and no waiver)")
                n_unexplained += 1
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"!! {name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        g, w = norm(got.copy()), norm(want.copy())
        if list(g.columns) != list(w.columns):
            print(f"!! {name}: COLUMNS got={list(g.columns)} want={list(w.columns)}")
            n_fail += 1; continue
        if len(g) != len(w):
            print(f"!! {name}: ROWS got={len(g)} want={len(w)}"); n_fail += 1; continue
        # exact compare after normalizing dtypes via string repr
        mismatch = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    eq = (a.astype(float).fillna(0) == b.astype(float).fillna(0))
                else:
                    eq = (a.astype(str) == b.astype(str))
            except Exception:
                eq = (a.astype(str) == b.astype(str))
            bad = (~eq).sum()
            if bad:
                i = (~eq).idxmax()
                mismatch.append(f"{c}: {bad} cells, e.g. got={a[i]!r} want={b[i]!r}")
        if mismatch:
            print(f"!! {name}: VALUE MISMATCH " + "; ".join(mismatch)); n_fail += 1
        else:
            print(f"ok {name} ({len(g)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_waived + n_unexplained} "
          f"rows-only ({n_waived} waived, {n_unexplained} unexplained)")
    return 1 if n_fail or n_unexplained else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
