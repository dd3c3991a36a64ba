#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Assumes `graft.Verify` already wrote <verifyOutDir>/<query>/ parquet dirs
plus oracle_sql.json. Runs each oracle SQL in DuckDB against views over
the sfDir parquet tables and compares (column-name-sorted, row-sorted)
values. Exits nonzero on any mismatch.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failed = []
    for name, sql in sorted(oracle.items()):
        pdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            failed.append((name, "no spark output"))
            continue
        try:
            got = normalize(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
            want = normalize(con.execute(sql).fetchdf())
        except Exception as e:
            failed.append((name, f"error: {e}"))
            continue
        if list(got.columns) != list(want.columns):
            failed.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
            continue
        if len(got) != len(want):
            failed.append((name, f"rows {len(got)} != {len(want)}"))
            continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                import numpy as np
                af = a.astype(float).to_numpy()
                bf = b.astype(float).to_numpy()
                bad = ~((pd.isna(af) & pd.isna(bf)) | (abs(af - bf) <= 1e-9 + 1e-9 * abs(bf)))
                if bad.any():
                    i = int(bad.argmax())
                    mismatch = f"col {c} row {i}: {af[i]} != {bf[i]}"
                    break
            else:
                if not a.astype(str).equals(b.astype(str)):
                    neq = a.astype(str) != b.astype(str)
                    i = int(neq.to_numpy().argmax())
                    mismatch = f"col {c} row {i}: {a.iloc[i]!r} != {b.iloc[i]!r} (dtype {a.dtype}/{b.dtype})"
                    break
        if mismatch:
            failed.append((name, mismatch))
        else:
            print(f"OK   {name} ({len(got)} rows)")
    for name, why in failed:
        print(f"FAIL {name}: {why}")
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
