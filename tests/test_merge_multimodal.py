"""stochastic_merge / kcore / multimodal plumbing tests."""

from pyspark.sql import functions as F

from pgs_spark.operators.edges import canonicalize
from pgs_spark.operators.merge import island_pass, kcore, stochastic_merge
from pgs_spark.operators.edges import symmetrize
from pgs_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    synthetic_media,
)
from tests.conftest import PATH5, TWO_CLIQUES, edges_df


def test_stochastic_merge_two_cliques(spark):
    """With enough classes the island pass can't merge across cliques; CC then
    yields at most one component per clique-side label split, and components
    never span the two disconnected cliques."""
    und = canonicalize(edges_df(spark, TWO_CLIQUES))
    out = stochastic_merge(spark, und, n_classes=2).collect()
    comp_by_vertex_range = {}
    total = 0
    for r in out:
        total += r["n_vertices"]
        side = "low" if r["component"] < 10 else "high"
        comp_by_vertex_range.setdefault(side, 0)
        comp_by_vertex_range[side] += r["n_vertices"]
    assert total == 7  # K4 + K3 vertices all accounted for
    assert comp_by_vertex_range.get("low", 0) == 4
    assert comp_by_vertex_range.get("high", 0) == 3


def test_island_pass_isolated_vertex_adopts(spark):
    """A vertex whose label matches no neighbor takes the modal label."""
    und = canonicalize(edges_df(spark, PATH5))
    sym = symmetrize(und)
    labels = spark.createDataFrame(
        [(0, 7), (1, 5), (2, 5), (3, 5), (4, 5)], "id long, label long"
    )
    got = {r["id"]: r["label"] for r in island_pass(sym, labels).collect()}
    assert got[0] == 5  # isolated label 7 → adopts neighbor's 5
    assert got[1] == 5  # already shares with neighbor 2 → keeps


def test_kcore_peels_tail(spark):
    """K=2 peeling removes the dangling tail of triangle+tail but keeps the
    triangle (FastPolygonizer dangle-peel semantics)."""
    und = canonicalize(edges_df(spark, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]))
    kept = {(r["src"], r["dst"]) for r in kcore(spark, und, k=2, rounds=5).collect()}
    assert kept == {(0, 1), (1, 2), (0, 2)}


def test_multimodal_features_deterministic(spark):
    media = synthetic_media(spark, n=30, seed=42).persist()
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["feature"]) == FEATURE_DIM for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r["feature"])
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)


def test_multimodal_schema(spark):
    media = synthetic_media(spark, n=5)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_features(media)
    assert dict(feats.dtypes)["feature"] == "array<double>"


def test_kcore_convergence_mode(spark):
    """rounds=None peels to the exact k-core fixed point: a long tail hanging
    off a clique vanishes entirely, the clique survives intact, regardless of
    tail length (which a fixed round count would have to guess)."""
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tail = [(3, 10), (10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (15, 16)]
    e = canonicalize(edges_df(spark, clique + tail))
    survived = {(r["src"], r["dst"]) for r in kcore(spark, e, k=2, rounds=None).collect()}
    assert survived == set(clique)  # whole 7-hop tail peeled, clique intact


def test_score_peel_weighted_vs_unweighted(spark):
    """Weighted peel keeps a low-degree/high-weight vertex that the same
    threshold on COUNT would drop, and drops high-degree/low-weight ones."""
    from pgs_spark.operators.merge import score_peel

    # vertex 1: one incident edge of weight 10 (strength 10, degree 1)
    # vertices 2..5: star around 6 with weight 1 each (strength 1-4)
    rows = [(0, 1, 10), (6, 2, 1), (6, 3, 1), (6, 4, 1), (6, 5, 1)]
    we = spark.createDataFrame(rows, "src long, dst long, weight long")
    got = score_peel(spark, we, s=5, rounds=3).collect()
    kept = {(r.src, r.dst) for r in got}
    assert (0, 1) in kept  # strength 10 >= 5 on both ends
    assert all(e == (0, 1) for e in kept)  # star edges all peel (strength <= 4)


def test_score_peel_fixed_point_on_uniform_clique(spark):
    from pgs_spark.operators.merge import score_peel

    k4 = [(a, b, 2) for a in range(4) for b in range(a + 1, 4)]
    we = spark.createDataFrame(k4, "src long, dst long, weight long")
    # strength = 6 everywhere; s=6 keeps all, s=7 empties
    assert score_peel(spark, we, s=6, rounds=2).count() == 6
    assert score_peel(spark, we, s=7, rounds=2).count() == 0
