"""SCC: known-answer digraphs + a pure-Python Kosaraju differential oracle."""

import random

import pytest

from pgs_spark.operators.scc import strongly_connected_components
from tests.conftest import edges_df


def ref_scc(pairs):
    """Kosaraju (iterative): {id: min id of its SCC} over edge endpoints."""
    edges = {(a, b) for a, b in pairs if a != b}
    verts = {x for e in edges for x in e}
    fwd, rev = {v: [] for v in verts}, {v: [] for v in verts}
    for a, b in edges:
        fwd[a].append(b)
        rev[b].append(a)
    seen, order = set(), []
    for s in verts:
        if s in seen:
            continue
        stack = [(s, iter(fwd[s]))]
        seen.add(s)
        while stack:
            v, it = stack[-1]
            adv = next(it, None)
            if adv is None:
                order.append(v)
                stack.pop()
            elif adv not in seen:
                seen.add(adv)
                stack.append((adv, iter(fwd[adv])))
    assign = {}
    for s in reversed(order):
        if s in assign:
            continue
        comp = [s]
        assign[s] = s
        while comp:
            v = comp.pop()
            for u in rev[v]:
                if u not in assign:
                    assign[u] = s
                    comp.append(u)
    # normalize roots to the SCC minimum id
    groups: dict = {}
    for v, r in assign.items():
        groups.setdefault(r, []).append(v)
    out = {}
    for mem in groups.values():
        m = min(mem)
        for v in mem:
            out[v] = m
    return out


def _got(res):
    return {r["id"]: r["scc"] for r in res.assignments.collect()}


def test_directed_cycle_is_one_scc(spark):
    res = strongly_connected_components(spark, edges_df(spark, [(0, 1), (1, 2), (2, 0)]))
    assert _got(res) == {0: 0, 1: 0, 2: 0}


def test_path_dag_is_all_singletons(spark):
    # pure DAG: the trim phase must resolve everything without label rounds
    res = strongly_connected_components(
        spark, edges_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    )
    assert _got(res) == {v: v for v in range(5)}
    assert all(h["inner_supersteps"] == 0 for h in res.history)


def test_two_cycles_bridged(spark):
    # 3-cycle → bridge → 3-cycle: two SCCs, bridge does not merge them
    pairs = [(0, 1), (1, 2), (2, 0), (2, 10), (10, 11), (11, 12), (12, 10)]
    res = strongly_connected_components(spark, edges_df(spark, pairs))
    assert _got(res) == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}


def test_self_loops_ignored(spark):
    res = strongly_connected_components(spark, edges_df(spark, [(0, 0), (0, 1), (1, 0)]))
    assert _got(res) == {0: 0, 1: 0}


@pytest.mark.parametrize("n,p,seed", [(30, 0.06, 1), (40, 0.04, 2), (25, 0.12, 3)])
def test_random_digraph_matches_kosaraju(spark, n, p, seed):
    rng = random.Random(seed)
    pairs = [
        (a, b)
        for a in range(n)
        for b in range(n)
        if a != b and rng.random() < p
    ]
    res = strongly_connected_components(spark, edges_df(spark, pairs))
    assert _got(res) == ref_scc(pairs)
