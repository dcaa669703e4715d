"""Round-5d operators: densest subgraph, seeded betweenness, vocabulary
coverage, stream-static enrichment.

Same discipline as every round: tiny hand-built fixtures with exact
expectations (the two-adjacent-triangles pattern, PGS_ColoringTests.java:
31-55), a NetworkX differential oracle where one exists, and DuckDB
oracle-parity rows for each new gate query at sf0.01.
"""

from __future__ import annotations

import duckdb
import networkx as nx
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from pgs_spark.operators.centrality import betweenness_from_seeds
from pgs_spark.operators.merge import densest_subgraph
from tests.conftest import PATH5, STAR10, edges_df

SF_DIR = "/root/testdata/sf0.01"


# ---------------------------------------------------------- densest subgraph


def test_densest_finds_clique_over_path(spark):
    # K5 (density 10/5 = 2.0) glued to a 20-vertex path tail (density -> 1/2):
    # peeling strips the path, the best round-start subgraph is the clique.
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tail = [(4 + i, 5 + i) for i in range(20)]
    out = densest_subgraph(spark, edges_df(spark, k5 + tail), rounds=8).collect()
    ids = sorted(r["id"] for r in out)
    assert ids == [0, 1, 2, 3, 4]
    assert out[0]["density_micro"] == 2_000_000


def test_densest_whole_graph_when_uniform(spark):
    # a 4-cycle is degree-regular: round 0 (the full graph, density 1) is
    # never beaten by a later prefix, and peeling at threshold 3/2 * avg
    # removes everything in one round.
    cyc = [(0, 1), (1, 2), (2, 3), (0, 3)]
    out = densest_subgraph(spark, edges_df(spark, cyc), rounds=4).collect()
    assert sorted(r["id"] for r in out) == [0, 1, 2, 3]
    assert out[0]["density_micro"] == 1_000_000


def test_densest_empty_input(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert densest_subgraph(spark, e, rounds=3).count() == 0


# ------------------------------------------------------- seeded betweenness


def test_betweenness_path_single_seed(spark):
    # path 0-1-2-3-4, seed {0}, depth 3: delta(1) = 2e6, delta(2) = 1e6,
    # delta(3) = 0 (deepest), seed excluded.
    out = {
        r["id"]: r["bc_micro"]
        for r in betweenness_from_seeds(
            spark, edges_df(spark, PATH5), seeds=[0], max_depth=3
        ).collect()
    }
    assert out == {1: 2_000_000, 2: 1_000_000}


def test_betweenness_star_matches_closed_form(spark):
    # star: every shortest path between two leaves runs through the hub;
    # all-seeds depth-2 covers every pair. Unnormalized undirected
    # betweenness of the hub is C(10,2) = 45; Brandes' per-source sum counts
    # each unordered pair from both endpoints -> 90e6 micro-units (sigma = 1
    # everywhere, so the floor divisions are exact).
    out = {
        r["id"]: r["bc_micro"]
        for r in betweenness_from_seeds(
            spark, edges_df(spark, STAR10), seed_mod=1, max_depth=2
        ).collect()
    }
    assert out == {0: 90_000_000}


def test_betweenness_tracks_networkx_with_full_seeds(spark):
    # seeded-with-all + depth >= diameter == exact Brandes up to the
    # per-edge floor (each term under-counts < 1 micro); compare at 1e-3.
    g = nx.erdos_renyi_graph(24, 0.2, seed=7)
    pairs = [(int(a), int(b)) for a, b in g.edges()]
    if not pairs:
        pytest.skip("empty random graph")
    diam = max(
        max(d.values()) for _, d in nx.all_pairs_shortest_path_length(g)
    )
    got = {
        r["id"]: r["bc_micro"] / 1e6
        for r in betweenness_from_seeds(
            spark, edges_df(spark, pairs), seed_mod=1, max_depth=diam
        ).collect()
    }
    want = nx.betweenness_centrality(g, normalized=False)
    for v, bc in want.items():
        assert abs(got.get(v, 0.0) - 2 * bc) < 1e-3, (v, got.get(v), 2 * bc)


# ------------------------------------------------------------ vocab coverage


def test_vocab_coverage_hand_computed(spark):
    from pgs_spark.operators.corpus import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b b d e")],
        "doc_id long, text string",
    )
    # counts: a=3, b=3, c=1, d=1, e=1 -> vocab_size=2 keeps {a, b}
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_micro"])
        for r in vocab_coverage(docs, vocab_size=2).collect()
    }
    assert out[1] == (4, 1, 250_000)
    assert out[2] == (5, 2, 400_000)


def test_vocab_coverage_tie_break_is_lexicographic(spark):
    from pgs_spark.operators.corpus import vocab_coverage

    docs = spark.createDataFrame([(1, "z y x")], "doc_id long, text string")
    # all counts tie at 1: vocab_size=2 must keep {x, y} (term ascending)
    out = vocab_coverage(docs, vocab_size=2).collect()[0]
    assert (out["n_tokens"], out["n_oov"]) == (3, 1)


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
    "name", ["densest", "betweenness", "vocab_coverage", "stream_enrich"]
)
def test_new_gate_queries_match_oracle(spark, duck, name):
    got = _normalize(entrymod.queries()[name](spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
