#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet result, runs the matching SQL from
oracle_sql.json in DuckDB against <sfDir>/*.parquet views, sorts columns by
name and rows by value, and reports row-count / schema / value equality.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize for comparison: NaN → None, floats rounded repr
    def norm(v):
        if pd.isna(v):
            return None
        if isinstance(v, float):
            return round(v, 9)
        return v
    df = df.map(norm)
    return df.sort_values(by=list(df.columns), kind="mergesort",
                          na_position="first").reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = pd.read_parquet(d)
        if name not in oracles:
            print(f"  ? {name}: no oracle ({len(got)} rows)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"  ✗ {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"  ✗ {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_fail += 1
        elif len(g) != len(w):
            print(f"  ✗ {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
        elif not g.equals(w):
            diff = (g != w) & ~(g.isna() & w.isna())
            rows = diff.any(axis=1)
            print(f"  ✗ {name}: {rows.sum()} differing rows of {len(g)}")
            with pd.option_context("display.width", 200):
                print("    got:\n", g[rows].head(3).to_string())
                print("    want:\n", w[rows].head(3).to_string())
            n_fail += 1
        else:
            print(f"  ✓ {name} ({len(g)} rows)")
            n_pass += 1
    print(f"{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
