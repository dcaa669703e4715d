"""Proper-coloring invariants + differential oracle (the PGS_ColoringTests
discipline: adjacent elements never share a class, PGS_ColoringTests.java:57-63)."""

import hashlib

import pytest

from pgs_spark.operators.coloring import conflict_count, jones_plassmann
from tests.conftest import CYCLE4, TRIANGLE_PLUS_TAIL, TWO_CLIQUES, edges_df
from tests.oracles import random_graph


def ref_greedy_coloring(pairs, seed=42):
    """Sequential greedy in decreasing (md5(id|seed), id) priority order —
    the exact coloring static-priority Jones-Plassmann must produce."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    prio = {v: (hashlib.md5(f"{v}|{seed}".encode()).hexdigest(), v) for v in adj}
    colors = {}
    for v in sorted(adj, key=lambda v: prio[v], reverse=True):
        used = {colors[u] for u in adj[v] if u in colors}
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    return colors


def _colors(spark, pairs, **kw):
    res = jones_plassmann(spark, edges_df(spark, pairs), **kw)
    return res, {r["id"]: r["color"] for r in res.colors.collect()}


@pytest.mark.parametrize("pairs", [CYCLE4, TRIANGLE_PLUS_TAIL, TWO_CLIQUES])
def test_known_graphs_match_sequential_greedy(spark, pairs):
    res, got = _colors(spark, pairs)
    assert res.converged
    assert got == ref_greedy_coloring(pairs)


@pytest.mark.parametrize("k", [0, 1])
def test_random_graphs_proper_and_exact(spark, k):
    pairs = random_graph(40 + 10 * k, 0.12, seed=200 + k)
    res, got = _colors(spark, pairs)
    assert res.converged
    assert got == ref_greedy_coloring(pairs)
    e = edges_df(spark, pairs)
    assert conflict_count(e, res.colors) == 0
    # greedy bound: χ ≤ Δ+1
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert max(got.values()) <= max(deg.values())


def test_fixed_rounds_marks_unresolved(spark):
    """With too few rounds the engine must return -1 for unresolved vertices
    (the same total semantics the unrolled oracle executes) and stay
    conflict-free on the resolved subset."""
    pairs = random_graph(40, 0.15, seed=7)
    e = edges_df(spark, pairs)
    res = jones_plassmann(spark, e, fixed_rounds=2)
    got = {r["id"]: r["color"] for r in res.colors.collect()}
    full = ref_greedy_coloring(pairs)
    assert set(got) == set(full)
    unresolved = [v for v, c in got.items() if c == -1]
    assert unresolved, "2 rounds should not fully color a 40-vertex random graph"
    assert all(got[v] == full[v] for v in got if got[v] != -1)
    assert conflict_count(e, res.colors) == 0


def test_checkpoint_resume_identical(spark, tmp_path):
    """Durable JP coloring: interrupt after 2 rounds, resume → colors equal
    to an uninterrupted run (JP with static priorities is deterministic)."""
    from pgs_spark.operators.coloring import jones_plassmann

    pairs = random_graph(60, 0.08, seed=31)
    e = edges_df(spark, pairs)
    cp = str(tmp_path / "jp_ck")

    interrupted = jones_plassmann(spark, e, max_rounds=2, checkpoint_dir=cp)
    assert interrupted.rounds == 2 and not interrupted.converged
    resumed = jones_plassmann(spark, e, checkpoint_dir=cp)
    straight = jones_plassmann(spark, e)
    a = {r["id"]: r["color"] for r in resumed.colors.collect()}
    b = {r["id"]: r["color"] for r in straight.colors.collect()}
    assert a == b
    assert resumed.converged
    # resume skipped rounds 1-2
    assert resumed.history[0]["round"] == 3
