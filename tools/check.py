#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with
the sf tables registered as views, sorts columns by name, and compares
values (row-sorted) exactly.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                n_bad += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_bad += 1
                continue
            diff = (g.astype(str) != w.astype(str))
            if diff.any().any():
                bad_rows = diff.any(axis=1)
                print(f"FAIL {name}: {int(bad_rows.sum())}/{len(g)} rows differ; first:")
                print("  spark:", g[bad_rows].head(3).to_dict("records"))
                print("  duck :", w[bad_rows].head(3).to_dict("records"))
                n_bad += 1
                continue
            print(f"OK   {name} ({len(g)} rows)")
            n_ok += 1
        except Exception as e:
            print(f"ERR  {name}: {e}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
