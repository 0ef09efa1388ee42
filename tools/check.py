#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
<verifyOutDir>/oracle_sql.json in DuckDB against the same sf tables, and
compares: row count, column names, and exact values (columns sorted by
name, rows sorted by all columns) — a strictly-stricter stand-in for the
driver's row/schema/hash check.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        # decimals → float for comparison robustness
        try:
            import decimal
            if len(df) and isinstance(df[c].dropna().iloc[0] if len(df[c].dropna()) else None, decimal.Decimal):
                df[c] = df[c].astype(float)
        except Exception:
            pass
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # machine-readable record of this gate run (round 12): written next to
    # the script's working dir so a round always carries an in-repo
    # correctness artifact even when the driver's CORRECTNESS_rN.json
    # arrives empty (it did in r11). One row per query: status + rows.
    summary = {"sf_dir": sf_dir, "out_dir": out_dir, "queries": {}}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            # ScaleProbe fixtures are directories of part files; the driver's
            # testdata tables are single files — handle both
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted([os.path.basename(d) for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)])
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); n_fail += 1
            summary["queries"][name] = {"status": "fail", "reason": "no spark output"}
            continue
        spark_df = pq.read_table(files).to_pandas()
        if name not in oracle:
            status = "ROWS>0" if len(spark_df) > 0 else "EMPTY!"
            print(f"{status} {name}: rows={len(spark_df)} (no oracle)")
            n_rowsonly += 1
            summary["queries"][name] = {"status": "rows_only", "rows": len(spark_df)}
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}"); n_fail += 1
            summary["queries"][name] = {"status": "fail", "reason": f"oracle error: {e}"[:200]}
            continue
        a, b = normalize(spark_df), normalize(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns spark={list(a.columns)} duck={list(b.columns)}"); n_fail += 1
            summary["queries"][name] = {"status": "fail", "reason": "column mismatch"}
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows spark={len(a)} duck={len(b)}"); n_fail += 1
            summary["queries"][name] = {"status": "fail", "reason": f"rows spark={len(a)} duck={len(b)}"}
            continue
        mism = []
        for c in a.columns:
            av, bv = a[c], b[c]
            # Dtype-strict gate (round 8): the driver's hash is type-sensitive,
            # so an integer column on one side vs a float column on the other
            # (e.g. DuckDB widening SUM(BIGINT) OVER (...) to HUGEINT, which
            # arrives as float64 through Arrow) must FAIL here even when the
            # values coerce equal. Without this, check.py passes what the
            # driver fails — exactly the a17/s21/t22 class from round 7.
            ka, kb = av.dtype.kind, bv.dtype.kind
            if (ka in 'iu' and kb == 'f') or (ka == 'f' and kb in 'iu'):
                mism.append(f"{c}: dtype kind mismatch spark={av.dtype} duck={bv.dtype} "
                            f"(int-vs-float — cast the oracle column)")
                continue
            # Round 9: FULL dtype equality for non-float columns (not just the
            # int/float cross) — int32 vs int64, bool vs int, etc. are equally
            # type-sensitive under the driver's hash. Floats keep the kind-level
            # check above (both engines emit float64 through Arrow anyway).
            if ka != 'f' and kb != 'f' and av.dtype != bv.dtype:
                mism.append(f"{c}: dtype mismatch spark={av.dtype} duck={bv.dtype} "
                            f"(cast both sides to the same type)")
                continue
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                ok = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
                exact = ok
            else:
                exact = av.equals(bv)
            if not exact:
                bad = (av != bv) if av.dtype.kind != 'f' else ~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
                i = int(np.argmax(bad.values))
                mism.append(f"{c}[row{i}]: spark={av.iloc[i]!r} duck={bv.iloc[i]!r} (dtypes {av.dtype}/{bv.dtype})")
        if mism:
            print(f"FAIL  {name}: {'; '.join(mism[:3])}"); n_fail += 1
            summary["queries"][name] = {"status": "fail", "reason": "; ".join(mism[:3])[:200]}
        else:
            print(f"PASS  {name}: rows={len(a)}")
            n_pass += 1
            summary["queries"][name] = {"status": "pass", "rows": len(a)}
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    summary.update(n_pass=n_pass, n_fail=n_fail, n_rows_only=n_rowsonly,
                   n_queries=len(names))
    with open("verify_summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
