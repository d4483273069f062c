#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Runs DuckDB on oracle_sql.json over the same parquet tables, loads the
Spark-written parquet results, sorts columns by name and rows by all
columns, and compares values exactly. Usage:

    python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything so Decimal/int64/float compare the way a
    # value-hash would
    out = df.astype(str)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"MISSING  {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            got = pd.concat(
                [pd.read_parquet(f) for f in sorted(res_dir.glob("*.parquet"))],
                ignore_index=True)
            want = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL     {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"FAIL     {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
        elif not g.equals(w):
            diff = (g != w).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL     {name}: value mismatch, e.g.")
            for i in idx:
                print(f"  spark: {g.loc[i].to_dict()}")
                print(f"  duck : {w.loc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS     {name} ({len(g)} rows)")
            n_pass += 1
    # queries without oracle: rows-only check
    for d in sorted(Path(out_dir).iterdir()):
        if d.is_dir() and d.name not in oracle and (not only or d.name in only):
            n = sum(pd.read_parquet(f).shape[0] for f in d.glob("*.parquet"))
            print(f"ROWSONLY {d.name}: {n} rows")
            n_skip += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
