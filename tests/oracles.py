"""Independent reference implementations for differential testing.

The differential-oracle discipline is the reference's FastPolygonizer-vs-JTS
pattern (FastPolygonizerTests.java:100-137): the engine's output is compared
against a second, independently-written implementation on seeded random inputs
of growing size.
"""

from __future__ import annotations

import random
from collections import Counter, defaultdict

import numpy as np


def ref_pagerank(edges, alpha=0.85, tol=1e-13, max_iter=1000, fixed_iterations=None):
    """Dense numpy power iteration matching the engine's exact update rule:
    rank' = (1-a)/N + a*(gather + dangling_mass/N), L1 stopping."""
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = Counter(u for u, _ in edges)
    r = np.full(n, 1.0 / n)
    limit = fixed_iterations if fixed_iterations is not None else max_iter
    for _ in range(limit):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / outdeg[u]
        dmass = sum(r[idx[u]] for u in nodes if u not in outdeg)
        new = (1 - alpha) / n + alpha * (contrib + dmass / n)
        delta = np.abs(new - r).sum()
        r = new
        if fixed_iterations is None and delta < tol:
            break
    return {v: r[idx[v]] for v in nodes}


def ref_components(edges):
    """Union-find connected components: {vertex: min-id-of-component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {v: find(v) for v in parent}


def ref_triangle_count(edges):
    """Exact triangle count via adjacency-set intersection."""
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    count = 0
    for u, v in {(min(a, b), max(a, b)) for a, b in edges if a != b}:
        count += len(adj[u] & adj[v] & {w for w in adj[u] if w > v})
    return count


def random_graph(n, p, seed, directed=False):
    """Seeded Erdős–Rényi edge list (the 111+k growing-size pattern,
    FastPolygonizerTests.java:104-106)."""
    rng = random.Random(seed)
    edges = []
    for a in range(n):
        for b in range(n):
            if a == b:
                continue
            if not directed and a > b:
                continue
            if rng.random() < p:
                edges.append((a, b))
    return edges


def ref_ppr(edges, mod, alpha=0.85, tol=1e-13, max_iter=1000):
    """Dense numpy personalized PageRank matching the engine's update:
    rank' = (1-a)*p + a*(gather + dangling_mass*p), p uniform over the
    id % mod == 0 seed slice (networkx personalization semantics)."""
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = Counter(u for u, _ in edges)
    seeds = [v for v in nodes if v % mod == 0]
    p = np.zeros(n)
    for v in seeds:
        p[idx[v]] = 1.0 / len(seeds)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / outdeg[u]
        dmass = sum(r[idx[u]] for u in nodes if u not in outdeg)
        new = (1 - alpha) * p + alpha * (contrib + dmass * p)
        delta = np.abs(new - r).sum()
        r = new
        if delta < tol:
            break
    return {v: r[idx[v]] for v in nodes}
