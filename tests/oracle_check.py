#!/usr/bin/env python3
"""Standalone oracle differential check (what the driver's correctness
gate does at sf0.01): runs each __spark_entry__.queries() entry on Spark
and its oracle_sql() on DuckDB over the same tables, compares row count,
column-name set and order-insensitive values.

Usage:
  python3 tests/oracle_check.py           # every oracle pair at sf0.01
  python3 tests/oracle_check.py fts_      # name-prefix filter
  SOLR_SPARK_TEST_SF=/root/testdata/sf0.001 python3 tests/oracle_check.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

SF_DIR = os.environ.get("SOLR_SPARK_TEST_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return (
        df.sort_values(list(df.columns), ignore_index=True)
        if len(df)
        else df.reset_index(drop=True)
    )


def main() -> int:
    prefixes = sys.argv[1:] or [""]
    import __spark_entry__ as e
    from solr_spark.session import get_spark

    spark = get_spark("local[4]", app_name="oracle_check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs, osql = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name in sorted(qs):
        if not name.startswith(tuple(prefixes)):
            continue
        t0 = time.time()
        got = qs[name](spark, SF_DIR).toPandas()
        if name not in osql:
            n_rows_only += 1
            print(f"  rows-only {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
            continue
        want = con.execute(osql[name]).fetchdf()
        ok = len(got) == len(want) and sorted(got.columns) == sorted(want.columns)
        if ok:
            try:
                pd.testing.assert_frame_equal(
                    canon(got), canon(want), check_dtype=False, check_exact=True
                )
            except AssertionError as ex:
                ok = False
                detail = str(ex).splitlines()[0]
        else:
            detail = f"rows {len(got)}/{len(want)} cols {sorted(got.columns)}"
        if ok:
            n_pass += 1
            print(f"  OK   {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
        else:
            n_fail += 1
            print(f"  FAIL {name}: {detail}")
    print(f"\n{n_pass} ok, {n_fail} failed, {n_rows_only} rows-only @ {SF_DIR}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
