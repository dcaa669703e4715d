"""Backstop for gate rotation (round-3 ADVICE): the driver's correctness gate
verifies only the first 50 `queries()` entries, so the rotated-out tail rides
a previous round's green row. This test machine-verifies the TAIL against the
same DuckDB oracles every round — no query is ever green-by-assumption."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from pgs_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.01"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _tail_names():
    return list(entrymod.queries())[entrymod._GATE_SLOTS:]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _tail_names())
def test_gate_tail_matches_oracle(spark, duck, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    got = _normalize(qs[name](spark, SF_DIR).toPandas())
    if name not in oracles:
        # Non-SQL-expressible op with no oracle: a vacuous pass here would be
        # green-by-assumption (round-4 ADVICE). Require a real invariant —
        # non-empty result with at least one column — and fail loudly so an
        # oracle-less query rotating into the tail is a visible event, not a
        # silent smoke-run.
        assert len(got.columns) > 0, f"{name}: tail query returned no columns"
        assert len(got) > 0, (
            f"{name}: oracle-less tail query returned 0 rows — add an oracle "
            "or keep it inside the gate (test_gate_tail backstop)"
        )
        return
    want = _normalize(duck.execute(oracles[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
