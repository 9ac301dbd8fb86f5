#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <outDir>
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Compares each <outDir>/<name> parquet against the oracle SQL in
<outDir>/oracle_sql.json executed by DuckDB over the sfDir tables.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            rel = con.sql(sql)
            # The driver's hash is type-sensitive and DuckDB integer window
            # sums widen to HUGEINT, a type pandas/parquet can't mirror —
            # gate every oracle's output schema so the class can't recur.
            hug = [c for c, t in zip(rel.columns, rel.types)
                   if "HUGEINT" in str(t).upper()]
            if hug:
                print(f"FAIL {name}: oracle schema has HUGEINT cols {hug} "
                      f"(CAST them to BIGINT in the oracle SQL)")
                n_fail += 1
                continue
            got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            want = canon(rel.df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    import numpy as np
                    if not np.allclose(a.astype(float), b.astype(float),
                                       rtol=0, atol=0, equal_nan=True):
                        mismatch = c
                        break
                else:
                    if not a.astype(str).equals(b.astype(str)):
                        mismatch = c
                        break
            except Exception as e:
                mismatch = f"{c} ({e})"
                break
        if mismatch:
            print(f"FAIL {name}: column {mismatch} differs")
            ga = got[got.ne(want).any(axis=1)].head(3)
            wa = want[got.ne(want).any(axis=1)].head(3)
            print("  got:\n", ga.to_string(), "\n  want:\n", wa.to_string())
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
