#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: reads Verify's parquet
output + oracle_sql.json, runs each oracle in DuckDB over the same sfDir
tables, and compares (schema-insensitively: columns sorted by name, rows
sorted, values hashed). Usage: check_oracle.py <sfDir> <verifyOutDir>."""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got_files = glob.glob(os.path.join(d, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in got_files]) if got_files else pd.DataFrame()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL-sql ] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = canon(got.copy()), canon(exp.copy())
        if list(g.columns) != list(e.columns):
            print(f"[FAIL-cols] {name}: spark={list(g.columns)} duck={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"[FAIL-rows] {name}: spark={len(g)} duck={len(e)}")
            n_fail += 1
            continue
        eq = True
        for c in g.columns:
            gv, ev = g[c], e[c]
            try:
                same = (gv.values == ev.values) | (pd.isna(gv.values) & pd.isna(ev.values))
                if not same.all():
                    bad = (~same).nonzero()[0][:3]
                    print(f"[FAIL-vals] {name}.{c}: e.g. rows {bad.tolist()} spark={gv.iloc[bad].tolist()} duck={ev.iloc[bad].tolist()}")
                    eq = False
            except Exception as ex:
                print(f"[FAIL-cmp ] {name}.{c}: {ex}")
                eq = False
        if eq:
            print(f"[PASS     ] {name}: {len(g)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
