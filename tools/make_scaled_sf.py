#!/usr/bin/env python3
"""Generate a key-shifted 10x (or Nx) scale-up of an sf dir for the one-off
large-scale oracle sweep (VERDICT r12 #6).

Usage: make_scaled_sf.py <srcSfDir> <outDir> [mult]

TPC-H-ish tables are replicated `mult` times with keys shifted by
replica * 1_000_000 (replica 0 is the identity copy, so oracle literals
like `l_orderkey IN (42, ...)` keep hitting real rows); foreign keys shift
together so referential integrity holds. region/nation (tiny dims, FK'd by
nationkey) and documents/embeddings (the similarity corpora — replicating
texts verbatim would quadratically densify the near-dup pair graph and make
the exact all-pairs oracles intractable) are copied unchanged.

Both Spark and the DuckDB oracle read the SAME files, so correctness
compares stay exact at the scaled size.
"""
import sys, os
import duckdb

src, out = sys.argv[1], sys.argv[2]
mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SHIFT = 1_000_000
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

copy_unchanged = ["region", "nation", "documents", "embeddings"]
# table -> list of key columns to shift per replica
shifted = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id"],
}

for t in copy_unchanged:
    con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")

for t, keys in shifted.items():
    cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
    sel = ", ".join(
        f"{c} + r.i * {SHIFT} AS {c}" if c in keys else c for c in cols)
    con.execute(
        f"COPY (SELECT {sel} FROM '{src}/{t}.parquet' "
        f"CROSS JOIN (SELECT UNNEST(RANGE({mult})) AS i) r) "
        f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows ({mult}x)")
