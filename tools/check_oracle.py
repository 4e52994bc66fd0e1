#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: compare each
graft.Verify parquet dump against its DuckDB oracle SQL on the same
fixture tables. Usage: check_oracle.py <sfDir> <verifyOutDir>."""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

fails, passes, rows_only = [], [], []
for path in sorted(glob.glob(os.path.join(out_dir, "*"))):
    name = os.path.basename(path)
    if not os.path.isdir(path):
        continue
    got = canon(pd.read_parquet(path))
    if name not in oracle:
        rows_only.append((name, len(got)))
        continue
    try:
        want = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    if list(got.columns) != list(want.columns):
        fails.append((name, f"cols differ: spark={list(got.columns)} duck={list(want.columns)}"))
        continue
    if len(got) != len(want):
        fails.append((name, f"rowcount differ: spark={len(got)} duck={len(want)}"))
        continue
    diffs = []
    for c in got.columns:
        a, b = got[c], want[c]
        try:
            same = a.equals(b)
            if not same:
                # tolerate dtype-only difference (int32 vs int64 etc.)
                same = a.astype(object).where(pd.notna(a), None).tolist() == \
                       b.astype(object).where(pd.notna(b), None).tolist()
        except Exception:
            same = a.tolist() == b.tolist()
        if not same:
            dtype_note = f" (dtypes {a.dtype}/{b.dtype})"
            n_show = 0
            examples = []
            for i in range(len(a)):
                av, bv = a.iloc[i], b.iloc[i]
                eq = (av == bv) or (pd.isna(av) and pd.isna(bv))
                try:
                    eq = bool(eq) if not hasattr(eq, "all") else bool(eq.all())
                except Exception:
                    eq = str(av) == str(bv)
                if not eq:
                    examples.append(f"row{i}: {av!r} vs {bv!r}")
                    n_show += 1
                    if n_show >= 3:
                        break
            diffs.append(f"{c}{dtype_note}: " + "; ".join(examples))
    # exact dtype report (the real driver may hash-compare dtypes strictly)
    dtype_mismatch = [f"{c}:{got[c].dtype}!={want[c].dtype}" for c in got.columns
                      if str(got[c].dtype) != str(want[c].dtype)]
    if diffs:
        fails.append((name, " | ".join(diffs)))
    elif dtype_mismatch:
        fails.append((name, "DTYPE ONLY: " + ",".join(dtype_mismatch)))
    else:
        passes.append((name, len(got)))

print(f"== PASS ({len(passes)})")
for n, r in passes:
    print(f"  {n}: {r} rows")
print(f"== ROWS-ONLY ({len(rows_only)})")
for n, r in rows_only:
    flag = "" if r > 0 else "  <-- EMPTY!"
    print(f"  {n}: {r} rows{flag}")
print(f"== FAIL ({len(fails)})")
for n, msg in fails:
    print(f"  {n}: {msg[:400]}")
sys.exit(1 if fails else 0)
