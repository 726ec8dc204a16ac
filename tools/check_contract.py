"""Local mimic of the driver's correctness gate: run each __spark_entry__
query at a given SF and compare against its DuckDB oracle —
row count + column names + order-insensitive value frame.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from table_ocr_spark.session import build_session

    qs = entry.queries()
    oracles = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = build_session(app_name="check_contract", cores=8, shuffle_partitions=8)
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {str(e).splitlines()[0][:160]}")
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only check, {len(got)} rows")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: oracle error {str(e).splitlines()[0][:160]}")
            continue
        g, w = norm_frame(got), norm_frame(want)
        if list(g.columns) != list(w.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append(name)
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            continue
        if not g.equals(w):
            neq = (g != w) & ~(g.isna() & w.isna())
            bad_rows = neq.any(axis=1)
            failures.append(name)
            print(f"FAIL {name}: {bad_rows.sum()} mismatching rows of {len(g)}")
            i = bad_rows.idxmax()
            print("  spark :", g.loc[i].to_dict())
            print("  oracle:", w.loc[i].to_dict())
            continue
        print(f"PASS {name}: {len(g)} rows")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
