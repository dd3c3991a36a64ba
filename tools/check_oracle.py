#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py [--strict] <sfDir> <verifyOutDir>

Assumes `graft.Verify` already wrote <verifyOutDir>/<query>/ parquet dirs
plus oracle_sql.json. Runs each oracle SQL in DuckDB against views over
the sfDir parquet tables and compares (column-name-sorted, row-sorted)
values. Exits nonzero on any mismatch.

--strict bit-compares doubles (raw uint64 view of the IEEE bytes): signed
zero and distinct NaN payloads count as mismatches, exactly like the
driver's hash over raw doubles. Default mode keeps the 1e-9 tolerance for
diagnosing WHERE a value diverges. Run strict at sf0.01 — the driver's
correctness SF — before declaring any hash-compared query done (the round-9
d14 lesson: -0.0 vs +0.0 is tolerance-invisible but hash-fatal, and the
cell that rounds to zero only exists at the driver's SF).
"""
import sys, os, json, glob
import duckdb
import numpy as np
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
    strict = "--strict" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir, out_dir = args[0], args[1]
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
                af = a.astype(float).to_numpy(dtype=np.float64)
                bf = b.astype(float).to_numpy(dtype=np.float64)
                if strict:
                    # the driver's contract: raw IEEE bytes must match —
                    # -0.0 != +0.0, NaNs equal only if bit-identical
                    bad = af.view(np.uint64) != bf.view(np.uint64)
                else:
                    bad = ~((pd.isna(af) & pd.isna(bf)) | (abs(af - bf) <= 1e-9 + 1e-9 * abs(bf)))
                if bad.any():
                    i = int(bad.argmax())
                    mismatch = (f"col {c} row {i}: {af[i]!r} != {bf[i]!r}"
                                + (f" (bits {af[i:i+1].view(np.uint64)[0]:016x}"
                                   f" != {bf[i:i+1].view(np.uint64)[0]:016x})" if strict else ""))
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
