#!/usr/bin/env python3
"""Dev-loop mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet dir written by graft.Verify plus oracle_sql.json,
runs the oracle SQL in DuckDB against the sf_dir parquet tables, and compares
(sorted columns, sorted rows, exact values). NOT part of the library — a
development tool only.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        # strict dtype check BEFORE normalization (driver may compare schemas)
        dt_g = {c: str(got[c].dtype) for c in got.columns}
        dt_e = {c: str(exp[c].dtype) for c in exp.columns}
        for c in sorted(set(dt_g) & set(dt_e)):
            if dt_g[c] != dt_e[c]:
                print(f"  WARN {name}: dtype {c}: spark={dt_g[c]} oracle={dt_e[c]}")
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        bad = []
        for c in g.columns:
            a, b = g[c].values, e[c].values
            if np.issubdtype(g[c].dtype, np.floating):
                eq = (a == b) | (pd.isna(a) & pd.isna(b))
            else:
                eq = (g[c].fillna("__NA__") == e[c].fillna("__NA__")).values \
                    if g[c].dtype == object else (a == b)
            if not np.all(eq):
                i = int(np.argmin(eq))
                bad.append((c, i, a[i], b[i]))
        if bad:
            c, i, av, bv = bad[0]
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} oracle={bv!r} "
                  f"({len(bad)} bad cols)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
