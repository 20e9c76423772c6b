#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs oracleSql (mimics the driver).

Usage:
  python3 tools/check.py [--sf /root/testdata/sf0.01] [--out /tmp/verify_out]
                         [--nosbt] [--only q1_pricing_summary,...]

Runs `sbt "runMain graft.Verify <sf> <out>"` (unless --nosbt), then executes
each oracle SQL in DuckDB with views over the same parquet tables and compares
row counts, schemas (pandas dtypes) and values (exact for non-floats, 1e-9
relative tolerance for floats, as a conservative stand-in for the driver's
hash compare — our queries pre-round so exact match is expected).
"""
import argparse, glob, json, math, os, subprocess, sys
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/verify_out")
    ap.add_argument("--nosbt", action="store_true")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    if not args.nosbt:
        r = subprocess.run(["sbt", f'runMain graft.Verify {args.sf} {args.out}'],
                           cwd="/root/repo", capture_output=True, text=True)
        sys.stdout.write(r.stdout[-4000:])
        if r.returncode != 0:
            sys.stdout.write(r.stderr[-4000:])
            print("VERIFY RUN FAILED"); sys.exit(1)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")
    oracle = json.load(open(f"{args.out}/oracle_sql.json"))
    only = set(args.only.split(",")) if args.only else None

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        pdir = f"{args.out}/{name}"
        if not glob.glob(f"{pdir}/*.parquet"):
            print(f"FAIL {name}: spark output missing"); n_fail += 1; continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        act = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
        ok, msg = compare(act, exp)
        if ok: n_pass += 1; print(f"PASS {name} ({len(act)} rows)")
        else: n_fail += 1; print(f"FAIL {name}: {msg}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

def compare(act: pd.DataFrame, exp: pd.DataFrame):
    if sorted(act.columns) != sorted(exp.columns):
        return False, f"columns differ: spark={sorted(act.columns)} oracle={sorted(exp.columns)}"
    act = act[sorted(act.columns)]
    exp = exp[sorted(exp.columns)]
    if len(act) != len(exp):
        return False, f"row count: spark={len(act)} oracle={len(exp)}"
    for c in act.columns:
        ad, ed = act[c].dtype, exp[c].dtype
        if pd.api.types.is_float_dtype(ad) != pd.api.types.is_float_dtype(ed) or \
           (pd.api.types.is_integer_dtype(ad) != pd.api.types.is_integer_dtype(ed)
            and not (act[c].isna().any() or exp[c].isna().any())):
            return False, f"dtype {c}: spark={ad} oracle={ed}"
    for c in act.columns:
        a, e = act[c], exp[c]
        if pd.api.types.is_float_dtype(a.dtype) or pd.api.types.is_float_dtype(e.dtype):
            a = pd.to_numeric(a, errors="coerce"); e = pd.to_numeric(e, errors="coerce")
            bad = ~((a.isna() & e.isna()) |
                    (abs(a - e) <= 1e-9 * (1 + abs(e))))
            if bad.any():
                i = bad.idxmax()
                return False, f"value {c} row {i}: spark={a[i]!r} oracle={e[i]!r}"
        else:
            a = a.astype(str); e = e.astype(str)
            bad = a != e
            if bad.any():
                i = bad.idxmax()
                return False, f"value {c} row {i}: spark={act[c][i]!r} oracle={exp[c][i]!r}"
    return True, ""

if __name__ == "__main__":
    main()
