#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB over views named after the
parquet tables in <sfDir>, and compares: columns sorted by name, rows sorted,
values compared exactly (floats via repr equality after float64 cast).
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types: ints -> int64, floats -> float64
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    names = sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir())
    n_pass = n_fail = n_noracle = 0
    for name in names:
        files = list((Path(out_dir) / name).glob("*.parquet"))
        if not files:
            print(f"FAIL  {name}: no spark output files")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{Path(out_dir)/name}/*.parquet')").df()
        if name not in oracle:
            print(f"SKIP  {name}: no oracle ({len(got)} rows)")
            n_noracle += 1
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL  {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        if g.equals(w):
            print(f"PASS  {name} ({len(g)} rows)")
            n_pass += 1
        else:
            neq = (g != w) & ~(g.isna() & w.isna())
            bad_cols = [c for c in g.columns if neq[c].any()]
            print(f"FAIL  {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"      {c}[{idx}]: spark={g[c][idx]!r} oracle={w[c][idx]!r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
