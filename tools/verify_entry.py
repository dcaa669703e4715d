"""Local mirror of the driver's correctness gate.

Runs every `queries()` entry at sf0.01 via Spark AND its `oracle_sql()` via
DuckDB on the same parquet; compares row count, sorted column names, and
order-insensitive values (columns sorted by name, rows sorted). Floats are
compared exactly after each side's own rounding — if this passes, the driver's
value-hash comparison passes.

Usage: python tools/verify_entry.py [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from pgs_spark.session import get_spark  # noqa: E402
from pgs_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:  # unify datetime storage units (ns vs us)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(names):
    spark = get_spark(app_name="verify-entry", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if names and name not in names:
            continue
        t0 = time.time()
        try:
            spark_df = fn(spark, SF_DIR).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error {exc}")
            failures.append(name)
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: rows={len(spark_df)} ({t_spark:.1f}s)")
            continue
        t0 = time.time()
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: oracle error {exc}")
            failures.append(name)
            continue
        t_oracle = time.time() - t0
        a, b = normalize(spark_df), normalize(oracle_df)
        status = "OK"
        detail = ""
        if list(a.columns) != list(b.columns):
            status, detail = "FAIL", f"columns {list(a.columns)} vs {list(b.columns)}"
        elif len(a) != len(b):
            status, detail = "FAIL", f"rows {len(a)} vs {len(b)}"
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            except AssertionError as exc:
                status, detail = "FAIL", str(exc).split("\n")[0:3]
                # show a sample of mismatches
        print(f"{status} {name}: rows={len(a)} spark={t_spark:.1f}s oracle={t_oracle:.1f}s {detail}")
        if status == "FAIL":
            failures.append(name)
    print("\nFAILURES:", failures or "none")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(set(sys.argv[1:])))
