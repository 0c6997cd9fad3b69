#!/usr/bin/env python3
"""Build the sf1 confidence-gate dataset (10x sf0.1) by deterministic
key-shifted replication — the round-9 construction, pinned as a tool so
the gate is reproducible when /tmp is wiped.

Copy k (k = 0..9) of every table shifts EVERY id/key column by
k * 10_000_000 so the shards join consistently (an orders copy only ever
joins its own customers copy, etc.); all value columns, text, and
timestamps are byte-identical across copies (documents deliberately gain
9 exact duplicates — the dedup stress), and embeddings add k * 1e-4 to
every component (exact copies would make semantic/ANN trivially
degenerate).

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir]
       (defaults: /root/testdata/sf0.1 -> /tmp/sf1)

Regenerating reproduces the round-9 dataset exactly on every table
except ~0.5%% of embedding components, which differ by ~1 ulp (the
round-9 ad-hoc build summed the perturbation in a different float op
order); the sf1 gate is a completion/timing sweep, not an oracle
compare, so the ulp is immaterial.
"""
import sys

import duckdb

SHIFT = 10_000_000
COPIES = 10

# every id/key column per table; everything else replicates verbatim
KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYS.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'").fetchall()]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + k.k * {SHIFT} AS {c}")
            elif table == "embeddings" and c == "embedding":
                sel.append(
                    "list_transform(embedding, "
                    "x -> CAST(x + k.k * 1e-4 AS FLOAT)) AS embedding")
            else:
                sel.append(c)
        con.execute(
            f"""COPY (
              SELECT {', '.join(sel)}
              FROM '{src}/{table}.parquet',
                   (SELECT unnest(generate_series(0, {COPIES - 1})) AS k) k
              ORDER BY {keys[0]}
            ) TO '{dst}/{table}.parquet' (FORMAT PARQUET)""")
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
