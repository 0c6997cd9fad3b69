#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
shipped library is pure Scala/Spark — this script just mimics the driver's
DuckDB compare so we can iterate before the real gate runs).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ (parquet written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB with the sfDir
tables registered as views, canonicalizes both sides (columns sorted by
name, rows sorted by all columns), and reports row/schema/hash agreement.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp cols to ns for compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        d = f"{out_dir}/{name}"
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            print(f"SKIP  {name:22s} rows={len(got)} (no oracle, rows-only check: {'OK' if len(got)>0 else 'EMPTY!'})")
            n_skip += 1
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name:22s} oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name:22s} column mismatch: spark={list(g.columns)} duck={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL  {name:22s} row count: spark={len(g)} duck={len(e)}")
            n_fail += 1
            continue
        # dtype + exact value compare
        mismatch = None
        for c in g.columns:
            a, b = g[c], e[c]
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                idx = (~eq).idxmax()
                mismatch = (c, a[idx], b[idx], str(a.dtype), str(b.dtype))
                break
        if mismatch:
            c, av, bv, at, bt = mismatch
            print(f"FAIL  {name:22s} value mismatch col={c} spark={av!r}({at}) duck={bv!r}({bt})")
            n_fail += 1
        else:
            dt_note = ""
            dts = {c: (str(g[c].dtype), str(e[c].dtype)) for c in g.columns
                   if str(g[c].dtype) != str(e[c].dtype)}
            if dts:
                dt_note = f"  [dtype diff: {dts}]"
            print(f"PASS  {name:22s} rows={len(g)}{dt_note}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
