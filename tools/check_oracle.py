#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate (t2).

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query parquet in <outDir>, executes the corresponding oracle SQL in
DuckDB over the same test tables and compares (schema-insensitively: columns
sorted by name, rows sorted by all columns, exact value equality).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # lists/arrays are unhashable -> stringify for sorting/compare
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     type(v).__name__ == 'ndarray').any():
            df[c] = df[c].map(lambda v: json.dumps([x.item() if hasattr(x, 'item') else x for x in v])
                              if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind='mergesort', na_position='first')
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(p) for p in
                                  glob.glob(os.path.join(qdir, "*.parquet"))],
                                 ignore_index=True)
        except Exception as e:
            results[name] = f"SPARK_READ_FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"ROWS_ONLY ({len(spark_df)} rows)"
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_FAIL {str(e).splitlines()[0][:160]}"
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"COLS_MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
        elif len(a) != len(b):
            results[name] = f"ROWS_MISMATCH spark={len(a)} duck={len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=True)
                results[name] = "OK"
            except AssertionError as e:
                results[name] = "VALUES_MISMATCH " + str(e).splitlines()[0][:160]
                diff = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if diff[c].any()]
                for c in bad_cols[:2]:
                    idx = diff[c].idxmax()
                    results[name] += f" | col={c} spark={a[c][idx]!r} duck={b[c][idx]!r}"

    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v == 'OK' else 'INFO' if v.startswith('ROWS_ONLY') else 'FAIL'} {name}: {v}")
    n_bad = sum(1 for v in results.values()
                if v != "OK" and not v.startswith("ROWS_ONLY"))
    print(f"\n{n_ok} OK / {n_bad} FAIL / {len(results)} total")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
