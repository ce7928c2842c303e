#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
sf parquet tables, loads the Spark result parquet written by graft.Verify,
sorts columns by name and rows by value (like the driver's hash compare),
and diffs exactly. Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/validate.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        raw = (pd.concat([pd.read_parquet(f) for f in files])
               if files else pd.DataFrame())
        if name not in oracle:
            # no oracle → driver does a weaker rows-only check; arrays and
            # other unsortable values are fine here, so skip canon()
            print(f"[rows-only] {name}: {len(raw)} rows")
            continue
        got = canon(raw)
        try:
            want = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"[FAIL-oracle-sql] {name}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"[FAIL-schema] {name}: spark={list(got.columns)} duckdb={list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"[FAIL-rows] {name}: spark={len(got)} duckdb={len(want)}")
            failures += 1
            continue
        # exact compare (mimics hash equality); show max float diff on mismatch
        mismatch = []
        for c in got.columns:
            a, b = got[c], want[c]
            # the driver hashes raw pandas values, where int64(1) != float64(1.0):
            # a DuckDB HUGEINT (sum of ints) renders as float64 and hash-fails
            # against Spark's BIGINT even when values compare == here. Round 1
            # missed x19/x22/x26 exactly this way — flag kind splits loudly.
            if {a.dtype.kind, b.dtype.kind} == {"i", "f"}:
                mismatch.append(f"{c}(dtype spark={a.dtype} duckdb={b.dtype})")
                continue
            try:
                eq = (a.astype(object).where(a.notna(), None) ==
                      b.astype(object).where(b.notna(), None)) | (a.isna() & b.isna())
            except Exception:
                eq = pd.Series([False] * len(a))
            if not eq.all():
                detail = ""
                if pd.api.types.is_numeric_dtype(a) and pd.api.types.is_numeric_dtype(b):
                    detail = f" maxdiff={(a - b).abs().max()}"
                mismatch.append(f"{c}({int((~eq).sum())} rows{detail})")
        if mismatch:
            print(f"[FAIL-values] {name}: {', '.join(mismatch)}")
            failures += 1
        else:
            print(f"[OK] {name}: {len(got)} rows")
    extra = set(oracle) - {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(extra):
        print(f"[FAIL-missing-result] {name}")
        failures += 1
    print(f"\n{'PASS' if failures == 0 else 'FAIL'} ({failures} failures)")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
