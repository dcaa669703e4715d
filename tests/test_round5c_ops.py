"""Gopher rule battery, C4 line cleaning, per-edge structural Jaccard —
Python-replay / NetworkX verified on crafted and seeded fixtures, plus
DuckDB oracle parity for the three new gate queries (they enter the gate
with staleness −1, so they must be oracle-exact before the driver sees
them)."""

import duckdb
import networkx as nx
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from pgs_spark.operators.community import edge_jaccard
from pgs_spark.operators.corpus import c4_line_stats, gopher_rules
from tests.conftest import edges_df
from tests.oracles import random_graph

SF_DIR = "/root/testdata/sf0.01"


# ---------------------------------------------------------------- edge_jaccard


def _nx_edge_jaccard(pairs):
    g = nx.Graph(pairs)
    out = {}
    for u, v in g.edges:
        a, b = min(u, v), max(u, v)
        cn = len(set(g[u]) & set(g[v]))
        union = g.degree[u] + g.degree[v] - cn
        out[(a, b)] = (cn, g.degree[a], g.degree[b], round(cn / union, 6))
    return out


def test_edge_jaccard_triangle_and_path(spark):
    # triangle: every edge has cn=1, degrees 2/2 -> J = 1/3
    tri = [(0, 1), (1, 2), (0, 2)]
    rows = edge_jaccard(spark, edges_df(spark, tri)).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["common_neighbors"] == 1
        assert r["jaccard_r"] == round(1 / 3, 6)
    # path: cn=0 edges must still appear with J = 0.0
    path = [(0, 1), (1, 2), (2, 3)]
    rows = edge_jaccard(spark, edges_df(spark, path)).collect()
    assert len(rows) == 3
    assert all(r["common_neighbors"] == 0 and r["jaccard_r"] == 0.0 for r in rows)


def test_edge_jaccard_matches_networkx(spark):
    for s in (0, 1, 2):
        pairs = random_graph(30, 0.15, seed=970 + s)
        got = {
            (r["src"], r["dst"]): (
                r["common_neighbors"],
                r["deg_src"],
                r["deg_dst"],
                r["jaccard_r"],
            )
            for r in edge_jaccard(spark, edges_df(spark, pairs)).collect()
        }
        assert got == _nx_edge_jaccard(pairs)


def test_edge_jaccard_hub_cap_undercounts_only(spark):
    pairs = random_graph(30, 0.2, seed=973)
    exact = {
        (r["src"], r["dst"]): r["common_neighbors"]
        for r in edge_jaccard(spark, edges_df(spark, pairs)).collect()
    }
    capped = {
        (r["src"], r["dst"]): r["common_neighbors"]
        for r in edge_jaccard(
            spark, edges_df(spark, pairs), max_center_degree=4
        ).collect()
    }
    assert set(capped) == set(exact)  # every edge still present
    assert all(capped[e] <= exact[e] for e in exact)


# ---------------------------------------------------------------- gopher_rules


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_gopher_rules_each_rule_fires(spark):
    long_good = ("the quick brown words keep flowing a lot here " * 6).strip()  # 54 w
    short = "the a tiny doc"  # word-count rule
    no_stops = ("zebra quark nimbus vortex lattice " * 11).strip()  # 55 w, 0 stops
    long_words = (
        "extraordinarily incomprehensible characteristically the a " * 13
    ).strip()  # mean word length 11.0 > 10
    rows = {
        r["doc_id"]: r
        for r in gopher_rules(_docs(spark, [long_good, short, no_stops, long_words]))
        .collect()
    }
    assert rows[0]["passes"] == 1 and rows[0]["n_rules_failed"] == 0
    assert rows[1]["passes"] == 0 and rows[1]["n_words"] < 50
    assert rows[2]["passes"] == 0 and rows[2]["n_stop_distinct"] < 2
    assert rows[3]["passes"] == 0 and rows[3]["mean_wlen_r"] > 10.0


def test_gopher_rules_python_replay(spark):
    from pgs_spark.functions.text import STOPWORDS

    texts = [
        ("alpha the of beta gamma longword " * k).strip() for k in (3, 8, 10, 20)
    ]
    got = {r["doc_id"]: r for r in gopher_rules(_docs(spark, texts)).collect()}
    for i, t in enumerate(texts):
        w = t.split()
        n = len(w)
        mean_r = round(sum(len(x) for x in w) / n, 6)
        alpha_r = round(sum(1 for x in w if any(c.isalpha() for c in x)) / n, 6)
        nstop = len(set(w) & set(STOPWORDS))
        fails = (
            (n < 50 or n > 100_000)
            + (mean_r < 3.0 or mean_r > 10.0)
            + (alpha_r < 0.8)
            + (nstop < 2)
        )
        r = got[i]
        assert (
            r["n_words"],
            r["mean_wlen_r"],
            r["alpha_word_frac_r"],
            r["n_stop_distinct"],
            r["n_rules_failed"],
            r["passes"],
        ) == (n, mean_r, alpha_r, nstop, fails, int(fails == 0))


# --------------------------------------------------------------- c4_line_stats


def test_c4_line_stats_rules(spark):
    doc = "\n".join(
        [
            "this line ends with enough words right here.",  # kept (8 words)
            "no terminal punctuation on this line at all",  # dropped
            "too few.",  # dropped (< 5 words)
            "this { braced line would otherwise be kept fine.",  # dropped
            "this JavaScript line would otherwise be kept fine.",  # dropped
            "ends well with exactly five words!",  # kept (6 words)
            "a third keeper sentence with plenty of words?",  # kept (8 words)
        ]
    )
    r = c4_line_stats(_docs(spark, [doc])).collect()[0]
    assert r["n_lines"] == 7
    assert r["n_kept"] == 3
    assert r["kept_words"] == 8 + 6 + 8
    assert r["doc_pass"] == 1
    # two kept lines -> doc fails the >= 3 kept-lines rule
    doc2 = "\n".join(doc.split("\n")[:6])
    r2 = c4_line_stats(_docs(spark, [doc2])).collect()[0]
    assert r2["n_kept"] == 2 and r2["doc_pass"] == 0


def test_c4_line_stats_single_line_corpus_all_dropped(spark):
    r = c4_line_stats(_docs(spark, ["word salad with no punctuation"])).collect()[0]
    assert (r["n_lines"], r["n_kept"], r["kept_words"], r["doc_pass"]) == (1, 0, 0, 0)


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


@pytest.mark.parametrize("name", ["gopher_quality", "c4_line_filter", "edge_jaccard"])
def test_new_gate_queries_match_oracle(spark, duck, name):
    got = _normalize(entrymod.queries()[name](spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
