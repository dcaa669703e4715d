"""Round-5e operators: co-citation / bibliographic coupling pairs and the
stream-stream attribution join.

Hand-built directed fixtures with exact expectations, the transpose
identity (coupling(G) == cocitation(Gᵀ)), the hub-cap contract, a
stream-vs-batch twin equality on a written parquet fixture, and DuckDB
oracle-parity rows for each new gate query at sf0.01.
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from pgs_spark.operators.community import cocitation_pairs
from tests.conftest import edges_df

SF_DIR = "/root/testdata/sf0.01"


# ------------------------------------------------------ co-citation pairs


FAN = [(1, 3), (1, 4), (2, 3), (2, 4), (5, 3)]


def test_cocitation_hand_computed(spark):
    # sources 1 and 2 both point at {3, 4}; 5 points only at 3 -> the only
    # pair with >= 2 shared in-neighbors is {3, 4}.
    out = cocitation_pairs(spark, edges_df(spark, FAN), min_common=2).collect()
    assert [(r["a"], r["b"], r["n_common"]) for r in out] == [(3, 4, 2)]


def test_coupling_is_cocitation_of_transpose(spark):
    # coupling on FAN: targets 3 ({1,2,5}) and 4 ({1,2}) -> pair (1,2)
    # shares 2 out-neighbors. And transpose=True must equal running
    # cocitation on the manually reversed edge list.
    got = cocitation_pairs(
        spark, edges_df(spark, FAN), min_common=1, transpose=True
    ).collect()
    want = cocitation_pairs(
        spark, edges_df(spark, [(b, a) for a, b in FAN]), min_common=1
    ).collect()
    key = lambda r: (r["a"], r["b"])
    assert sorted(map(key, got)) == sorted(map(key, want))
    top = {(r["a"], r["b"]): r["n_common"] for r in got}
    assert top[(1, 2)] == 2


def test_cocitation_hub_cap_drops_hub_keys(spark):
    # source 0 points at 4 targets (6 pairs); source 9 at 2. A cap of 3
    # drops every wedge through the hub, leaving only source 9's pair.
    e = [(0, i) for i in range(1, 5)] + [(9, 1), (9, 2)]
    out = cocitation_pairs(
        spark, edges_df(spark, e), min_common=1, max_key_degree=3
    ).collect()
    assert [(r["a"], r["b"], r["n_common"]) for r in out] == [(1, 2, 1)]


def test_cocitation_self_loops_and_dupes_ignored(spark):
    e = [(1, 3), (1, 3), (3, 3), (1, 4), (2, 3), (2, 4)]
    out = cocitation_pairs(spark, edges_df(spark, e), min_common=2).collect()
    assert [(r["a"], r["b"], r["n_common"]) for r in out] == [(3, 4, 2)]


# ------------------------------------------------ stream-stream attribution


def test_stream_join_matches_hand_batch(spark, tmp_path):
    from pgs_spark.streaming.windows import streaming_attribution_join

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ev(i, ts, uid, typ, val):
        return (i, ts, uid, typ, float(val), "{}")

    rows = [
        ev(1, t0, 7, "view", 0.0),
        # in-window purchases: +30min and +60min (inclusive bound)
        ev(2, t0 + datetime.timedelta(minutes=30), 7, "purchase", 10.0),
        ev(3, t0 + datetime.timedelta(minutes=60), 7, "purchase", 2.5),
        # out of window: +61min
        ev(4, t0 + datetime.timedelta(minutes=61), 7, "purchase", 99.0),
        # purchase BEFORE the view never attributes
        ev(5, t0 - datetime.timedelta(minutes=5), 7, "purchase", 1.0),
        # user 8 has a purchase but no view
        ev(6, t0, 8, "purchase", 5.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "events")
    df.coalesce(1).write.parquet(path)
    out = {
        r["user_id"]: (r["n_attributed"], r["attributed_cents"])
        for r in streaming_attribution_join(spark, path, 60).collect()
    }
    assert out == {7: (2, 1250)}


# ------------------------------------------------------- gate oracle parity


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    from pgs_spark.sources.tables import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize(
    "name",
    ["cocitation", "coupling", "stream_join", "event_transitions", "triangle_estimate", "retention"],
)
def test_new_gate_queries_match_oracle(spark, duck, name):
    got = _normalize(entrymod.queries()[name](spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


# ----------------------------------------------------- event transitions


def test_event_transitions_hand_computed(spark):
    from pgs_spark.operators.corpus import event_transitions

    t0 = datetime.datetime(2024, 1, 1)

    def ev(i, mins, uid, typ):
        return (i, t0 + datetime.timedelta(minutes=mins), uid, typ)

    events = spark.createDataFrame(
        [
            ev(1, 0, 1, "view"),
            ev(2, 1, 1, "click"),
            ev(3, 2, 1, "purchase"),
            ev(4, 0, 2, "view"),
            ev(5, 1, 2, "view"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["prob_micro"])
        for r in event_transitions(events).collect()
    }
    assert out == {
        ("view", "click"): (1, 500_000),
        ("view", "view"): (1, 500_000),
        ("click", "purchase"): (1, 1_000_000),
    }


def test_event_transitions_tie_break_on_event_id(spark):
    from pgs_spark.operators.corpus import event_transitions

    t0 = datetime.datetime(2024, 1, 1)
    # identical timestamps: order must follow event_id -> a, b, c exactly
    events = spark.createDataFrame(
        [(1, t0, 1, "a"), (2, t0, 1, "b"), (3, t0, 1, "c")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {
        (r["from_type"], r["to_type"]) for r in event_transitions(events).collect()
    }
    assert out == {("a", "b"), ("b", "c")}


# ------------------------------------------------ sampled triangle estimate


def test_triangle_estimate_full_sample_is_exact(spark):
    from pgs_spark.operators.triangles import sampled_triangle_estimate, triangle_count

    k6 = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    e = edges_df(spark, k6)
    row = sampled_triangle_estimate(spark, e, keep_hex=16).collect()[0]
    assert row["n_sampled_triangles"] == triangle_count(spark, e) == 20
    assert row["est_triangles"] == 20


def test_triangle_estimate_deterministic_and_scaled(spark):
    from pgs_spark.operators.triangles import sampled_triangle_estimate

    k8 = [(a, b) for a in range(8) for b in range(a + 1, 8)]
    e = edges_df(spark, k8)
    r1 = sampled_triangle_estimate(spark, e, keep_hex=8).collect()[0]
    r2 = sampled_triangle_estimate(spark, e, keep_hex=8).collect()[0]
    assert (r1["n_sampled_triangles"], r1["est_triangles"]) == (
        r2["n_sampled_triangles"],
        r2["est_triangles"],
    )
    assert r1["est_triangles"] == r1["n_sampled_triangles"] * 4096 // 512


def test_triangle_estimate_rejects_bad_keep_hex(spark):
    from pgs_spark.operators.triangles import sampled_triangle_estimate

    with pytest.raises(ValueError):
        sampled_triangle_estimate(spark, edges_df(spark, [(0, 1)]), keep_hex=0)


# ---------------------------------------------------------- retention cohorts


def test_retention_hand_computed(spark):
    from pgs_spark.operators.corpus import retention_cohorts

    d = datetime.datetime

    events = spark.createDataFrame(
        [
            # user 1: first day Jan 1, active again Jan 2 (twice) and Jan 3
            (1, d(2024, 1, 1, 9), 1, "view"),
            (2, d(2024, 1, 2, 9), 1, "view"),
            (3, d(2024, 1, 2, 17), 1, "click"),
            (4, d(2024, 1, 3, 9), 1, "view"),
            # user 2: same cohort, never returns
            (5, d(2024, 1, 1, 10), 2, "view"),
            # user 3: Jan 2 cohort, returns Jan 3
            (6, d(2024, 1, 2, 10), 3, "view"),
            (7, d(2024, 1, 3, 10), 3, "view"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = {
        (r["cohort_day"], r["age_days"]): (r["n_users"], r["retention_micro"])
        for r in retention_cohorts(events).collect()
    }
    assert out == {
        ("2024-01-01", 0): (2, 1_000_000),
        ("2024-01-01", 1): (1, 500_000),
        ("2024-01-01", 2): (1, 500_000),
        ("2024-01-02", 0): (1, 1_000_000),
        ("2024-01-02", 1): (1, 1_000_000),
    }
