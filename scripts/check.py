#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the same sf
tables, and compares: row count, column names, and exact values after
sorting columns by name and rows by all columns (mirrors the driver's
hash-compare as described in the build contract).
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # the driver fixtures are single parquet FILES; SfGen-generated
        # corpora are Spark-written DIRECTORIES of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    ok = bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.sql(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                bad += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                bad += 1
                continue
            # exact value compare, column by column
            diffs = []
            for c in g.columns:
                a, b = g[c], w[c]
                try:
                    eq = (a.isna() & b.isna()) | (a == b)
                except Exception:
                    eq = a.astype(str) == b.astype(str)
                if not eq.all():
                    i = int((~eq).idxmax())
                    diffs.append(f"{c}[{i}]: {a[i]!r} vs {b[i]!r} "
                                 f"(dtypes {a.dtype}/{b.dtype})")
            if diffs:
                print(f"FAIL {name}: " + "; ".join(diffs[:3]))
                bad += 1
            else:
                dt = ""
                for c in g.columns:
                    if str(g[c].dtype) != str(w[c].dtype):
                        dt += f" [dtype {c}: {g[c].dtype} vs {w[c].dtype}]"
                print(f"OK   {name} ({len(g)} rows){dt}")
                ok += 1
        except Exception as e:
            print(f"ERR  {name}: {str(e)[:200]}")
            bad += 1
    print(f"\n{ok} ok, {bad} failed")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
