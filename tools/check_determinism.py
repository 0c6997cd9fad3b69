#!/usr/bin/env python3
"""Compare two graft.Verify output dirs query by query (dev tool only).

Usage: python3 tools/check_determinism.py <outDirA> <outDirB>

Both dirs must come from runs over the same sfDir (any CPU counts /
partitioning). A mismatch means a query's output depends on run
nondeterminism (float summation order, unpinned ties) — exactly the class
of bug that turns a PASS into a flaky FAIL at driver time.
"""
import sys, glob, os
import pandas as pd

def canon(d):
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        return None
    df = pd.concat([pd.read_parquet(f) for f in files])
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

a_dir, b_dir = sys.argv[1], sys.argv[2]
names = sorted(set(os.listdir(a_dir)) & set(os.listdir(b_dir)))
n_ok = n_bad = 0
for name in names:
    if not os.path.isdir(f"{a_dir}/{name}"):
        continue
    a, b = canon(f"{a_dir}/{name}"), canon(f"{b_dir}/{name}")
    same = a is not None and b is not None and a.equals(b)
    if same:
        n_ok += 1
    else:
        n_bad += 1
        print(f"NONDETERMINISTIC {name}: rowsA={0 if a is None else len(a)} rowsB={0 if b is None else len(b)}")
        if a is not None and b is not None and len(a) == len(b):
            diff = (a != b) & ~(a.isna() & b.isna())
            cols = [c for c in a.columns if diff[c].any()]
            print(f"  differing columns: {cols}")
print(f"{n_ok} identical, {n_bad} differ")
sys.exit(1 if n_bad else 0)
