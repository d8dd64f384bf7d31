#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Loads each <out>/<name> parquet, runs <out>/oracle_sql.json[name] in DuckDB
against the raw testdata views, sorts columns by name and rows by all
columns, and diffs values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to ns, floats to repr
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

ok = fail = 0
for name in sorted(glob.glob(f"{out_dir}/*/")):
    qname = os.path.basename(name.rstrip("/"))
    ours = pd.read_parquet(name)
    if qname not in oracle:
        print(f"  {qname}: rows-only ({len(ours)} rows)" +
              ("  !! EMPTY" if len(ours) == 0 else ""))
        continue
    try:
        theirs = con.execute(oracle[qname]).fetchdf()
    except Exception as e:
        print(f"X {qname}: ORACLE SQL ERROR: {e}")
        fail += 1
        continue
    a, b = canon(ours), canon(theirs)
    if list(a.columns) != list(b.columns):
        print(f"X {qname}: COLUMNS ours={list(a.columns)} oracle={list(b.columns)}")
        fail += 1
        continue
    if len(a) != len(b):
        print(f"X {qname}: ROWS ours={len(a)} oracle={len(b)}")
        fail += 1
        continue
    # Driver's hash is representation-sensitive: int64 1024 vs float64
    # 1024.0 mismatch even when values are equal (shipped red in r15 via
    # q135/q138 HUGEINT->float oracle columns). Fail on int-vs-float kind.
    kind_bad = [
        c for c in a.columns
        if {a[c].dtype.kind, b[c].dtype.kind} == {"i", "f"}
        or {a[c].dtype.kind, b[c].dtype.kind} == {"u", "f"}
    ]
    if kind_bad:
        print(f"X {qname}: DTYPE int-vs-float (driver hash mismatch): " +
              ", ".join(f"{c} ours={a[c].dtype} oracle={b[c].dtype}"
                        for c in kind_bad))
        fail += 1
        continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        print(f"  {qname}: OK ({len(a)} rows)")
        ok += 1
    except AssertionError as e:
        msg = str(e).split("\n")
        print(f"X {qname}: VALUES DIFFER: " + " | ".join(msg[:6]))
        fail += 1

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
