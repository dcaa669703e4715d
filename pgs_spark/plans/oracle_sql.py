"""ANSI-SQL oracle generators for the iterative graph operators.

The driver verifies every `queries()` entry against DuckDB running these SQL
strings on the same parquet tables. Iterative algorithms are *unrolled* to a
fixed superstep count (chained CTEs — one join+aggregate pair per superstep,
exactly the engine's per-superstep plan), so oracle and engine execute the
same fixed-point recurrence and must agree to float reproducibility.

This mirrors the reference's differential-testing discipline: an independent
implementation (JTS Polygonizer) validating the optimized one
(FastPolygonizerTests.java:100-137).
"""

from __future__ import annotations


def sym_cte(edges_cte: str = "e") -> str:
    return f"SELECT src AS u, dst AS v FROM {edges_cte} UNION ALL SELECT dst, src FROM {edges_cte}"


def pagerank_sql(
    edges_sql: str,
    iterations: int = 10,
    alpha: float = 0.85,
    round_to: int = 6,
    weighted: bool = False,
    personalize_mod: int | None = None,
) -> str:
    """Unrolled power iteration with dangling-mass redistribution.

    Reproduces the engine's exact update: r' = (1-a)/N + a*(gather + dm/N).
    The (1-alpha) literal is emitted via Python repr so both engines use the
    bit-identical double constant. With ``weighted`` the edges CTE must yield
    (src, dst, weight) and contribution weight is w/Σw_src — the same
    cast-then-divide structure as the engine's weighted path (float-exact
    across engines when the expression tree matches).

    ``personalize_mod`` mirrors the engine's personalized path: restart
    distribution p_i = 1/|S| over the seed slice id % mod == 0, update
    r' = (1-a)·p + a·(gather + dm·p) — the same expression tree, so the
    doubles agree before rounding.
    """
    if weighted:
        odeg = (
            "odeg AS MATERIALIZED (SELECT src AS id, "
            "CAST(SUM(weight) AS DOUBLE) AS outdeg FROM e GROUP BY src)"
        )
        wexpr = "CAST(e.weight AS DOUBLE)/o.outdeg"
    else:
        odeg = "odeg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS outdeg FROM e GROUP BY src)"
        wexpr = "1.0/o.outdeg"
    parts = [
        f"e AS MATERIALIZED ({edges_sql})",
        "verts AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst AS id FROM e)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)",
        odeg,
        f"w AS MATERIALIZED (SELECT e.src, e.dst, {wexpr} AS w FROM e JOIN odeg o ON e.src = o.id)",
        "r0 AS MATERIALIZED (SELECT v.id, 1.0/nn.n AS rank, o.outdeg FROM verts v CROSS JOIN nn "
        "LEFT JOIN odeg o ON v.id = o.id)",
    ]
    prev = "r0"
    teleport = repr(1.0 - alpha)
    if personalize_mod is not None:
        parts.append(
            "ps AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ns FROM verts"
            f" WHERE id % {personalize_mod} = 0)"
        )
    for i in range(1, iterations + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT COALESCE(SUM(CASE WHEN outdeg IS NULL THEN rank END), 0) AS dm FROM {prev})"
        )
        parts.append(
            f"g{i} AS MATERIALIZED (SELECT w.dst AS id, SUM(r.rank * w.w) AS m FROM w JOIN {prev} r "
            f"ON w.src = r.id GROUP BY w.dst)"
        )
        if personalize_mod is not None:
            p = (
                f"(CASE WHEN v.id % {personalize_mod} = 0"
                " THEN 1.0/(SELECT ns FROM ps) ELSE 0.0 END)"
            )
            parts.append(
                f"r{i} AS MATERIALIZED (SELECT v.id, {teleport}*{p} + {alpha!r}*(COALESCE(g.m, 0) "
                f"+ (SELECT dm FROM d{i})*{p}) AS rank, v.outdeg "
                f"FROM r0 v LEFT JOIN g{i} g ON v.id = g.id)"
            )
        else:
            parts.append(
                f"r{i} AS MATERIALIZED (SELECT v.id, {teleport}/nn.n + {alpha!r}*(COALESCE(g.m, 0) "
                f"+ (SELECT dm FROM d{i})/nn.n) AS rank, v.outdeg "
                f"FROM r0 v CROSS JOIN nn LEFT JOIN g{i} g ON v.id = g.id)"
            )
        prev = f"r{i}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT id, ROUND(rank, {round_to}) AS rank_r FROM {prev}"
    )


def lpa_sql(edges_sql: str, iterations: int = 3, weighted: bool = False) -> str:
    """Unrolled synchronous LPA, tie-break (max count, then min label) —
    byte-identical semantics to operators/label_propagation.py. With
    ``weighted`` the edges CTE must yield (src, dst, weight) and the vote is
    SUM(weight) instead of COUNT(*)."""
    if weighted:
        sym = (
            "SELECT src AS u, dst AS v, weight FROM e "
            "UNION ALL SELECT dst, src, weight FROM e"
        )
        vote = "SUM(s.weight)"
    else:
        sym = sym_cte()
        vote = "COUNT(*)"
    parts = [
        f"e AS MATERIALIZED ({edges_sql})",
        f"sym AS MATERIALIZED ({sym})",
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS id, u AS label FROM sym)",
    ]
    prev = "l0"
    for i in range(1, iterations + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT s.u AS id, l.label, {vote} AS cnt FROM sym s "
            f"JOIN {prev} l ON s.v = l.id GROUP BY s.u, l.label)"
        )
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT id, MIN(label) AS new_label FROM "
            f"(SELECT id, label, cnt, MAX(cnt) OVER (PARTITION BY id) AS mx FROM c{i}) t "
            f"WHERE cnt = mx GROUP BY id)"
        )
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT l.id, COALESCE(b.new_label, l.label) AS label "
            f"FROM {prev} l LEFT JOIN b{i} b ON l.id = b.id)"
        )
        prev = f"l{i}"
    return "WITH " + ",\n".join(parts) + f"\nSELECT id, label FROM {prev}"


def components_sql(edges_sql: str) -> str:
    """Transitive-closure CC via recursive CTE (min reachable id)."""
    return f"""
WITH RECURSIVE e AS ({edges_sql}),
sym AS ({sym_cte()}),
verts AS (SELECT DISTINCT u AS id FROM sym),
reach(id, r) AS (
    SELECT id, id FROM verts
    UNION
    SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.id
)
SELECT id, MIN(r) AS component FROM reach GROUP BY id
"""


def triangle_count_sql(canonical_edges_sql: str) -> str:
    """Triangles by id-ordered 3-way join over canonical (src<dst) edges."""
    return f"""
WITH e AS ({canonical_edges_sql})
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.src = e1.dst
JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
"""


def bfs_sql(edges_sql: str, max_hops: int = 8) -> str:
    """Min hop distance from the graph's minimum vertex id."""
    return f"""
WITH RECURSIVE e AS ({edges_sql}),
sym AS ({sym_cte()}),
walk(id, dist) AS (
    SELECT (SELECT MIN(u) FROM sym), 0
    UNION
    SELECT s.v, w.dist + 1 FROM sym s JOIN walk w ON s.u = w.id WHERE w.dist < {max_hops}
)
SELECT id, CAST(MIN(dist) AS INT) AS dist FROM walk GROUP BY id
"""


def stochastic_merge_sql(edges_sql: str, n_classes: int) -> str:
    """Mirror of operators/merge.stochastic_merge with seed=None
    (label = id % n_classes): island pass → cut → CC → per-component agg."""
    return f"""
WITH RECURSIVE e AS MATERIALIZED ({edges_sql}),
sym AS MATERIALIZED ({sym_cte()}),
verts AS MATERIALIZED (SELECT DISTINCT u AS id FROM sym),
l0 AS MATERIALIZED (SELECT id, id % {n_classes} AS label FROM verts),
cnt AS MATERIALIZED (
    SELECT s.u AS id, l.label AS nbr_label, COUNT(*) AS cnt
    FROM sym s JOIN l0 l ON s.v = l.id GROUP BY s.u, l.label),
modal AS (
    SELECT id, MIN(nbr_label) AS modal_label FROM (
        SELECT id, nbr_label, cnt, MAX(cnt) OVER (PARTITION BY id) AS mx FROM cnt) t
    WHERE cnt = mx GROUP BY id),
same AS (SELECT DISTINCT c.id FROM cnt c JOIN l0 l ON c.id = l.id AND c.nbr_label = l.label),
l1 AS MATERIALIZED (
    SELECT l.id,
           CASE WHEN s.id IS NULL AND m.modal_label IS NOT NULL
                THEN m.modal_label ELSE l.label END AS label
    FROM l0 l LEFT JOIN modal m ON l.id = m.id LEFT JOIN same s ON l.id = s.id),
kept AS MATERIALIZED (
    SELECT e.src, e.dst FROM e
    JOIN l1 a ON e.src = a.id JOIN l1 b ON e.dst = b.id
    WHERE a.label = b.label),
ksym AS MATERIALIZED (SELECT src AS u, dst AS v FROM kept UNION ALL SELECT dst, src FROM kept),
reach(id, r) AS (
    SELECT id, id FROM verts
    UNION
    SELECT s.u, reach.r FROM ksym s JOIN reach ON s.v = reach.id),
comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
SELECT c.component, COUNT(*) AS n_vertices, MIN(l.label) AS label
FROM comp c JOIN l1 l ON c.id = l.id GROUP BY c.component
"""


def kcore_sql(edges_sql: str, k: int = 2, rounds: int = 5) -> str:
    """Fixed-round degree-< k peeling, unrolled."""
    parts = [f"e0 AS MATERIALIZED ({edges_sql})"]
    prev = "e0"
    for r in range(1, rounds + 1):
        parts.append(
            f"s{r} AS (SELECT src AS u, dst AS v FROM {prev} UNION ALL SELECT dst, src FROM {prev})"
        )
        parts.append(
            f"k{r} AS MATERIALIZED (SELECT u AS id FROM s{r} GROUP BY u HAVING COUNT(*) >= {k})"
        )
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT e.src, e.dst FROM {prev} e "
            f"JOIN k{r} a ON e.src = a.id JOIN k{r} b ON e.dst = b.id)"
        )
        prev = f"e{r}"
    return "WITH " + ",\n".join(parts) + f"\nSELECT src, dst FROM {prev}"


def degrees_sql(edges_sql: str) -> str:
    return f"""
WITH e AS ({edges_sql}),
sym AS ({sym_cte()})
SELECT u AS id, COUNT(*) AS degree FROM sym GROUP BY u
"""

def hyperball_sql(edges_sql: str, supersteps: int = 3) -> str:
    """Unrolled oracle for operators/hyperball.hyperball: identical register
    derivation (md5 nibble + 17 − bitlength via bin()), identical superstep
    (gather ∪ state → MAX per (id, register)), identical raw-HLL estimate.
    All arithmetic is cross-engine exact — see the operator docstring's
    dyadic-grid argument — so the 6dp round is decorative, not load-bearing."""
    parts = [
        f"e AS MATERIALIZED ({edges_sql})",
        f"sym AS MATERIALIZED ({sym_cte()})",
        "verts AS MATERIALIZED (SELECT DISTINCT u AS id FROM sym)",
        "st0 AS MATERIALIZED (SELECT id,"
        " ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 1))::INT AS j,"
        " CASE WHEN w = 0 THEN 17 ELSE 17 - length(bin(w)) END AS rho"
        " FROM (SELECT id, ('0x' || substr(md5(CAST(id AS VARCHAR)), 2, 4))::INT AS w"
        " FROM verts))",
    ]
    prev = "st0"
    for t in range(1, supersteps + 1):
        parts.append(
            f"st{t} AS MATERIALIZED (SELECT id, j, MAX(rho) AS rho FROM ("
            f"SELECT s.u AS id, p.j, p.rho FROM sym s JOIN {prev} p ON s.v = p.id"
            f" UNION ALL SELECT id, j, rho FROM {prev}) g GROUP BY id, j)"
        )
        prev = f"st{t}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT id,
       ROUND(0.673 * 256.0 /
             (CAST(16 - COUNT(*) AS DOUBLE)
              + SUM(1.0 / CAST(1 << rho AS DOUBLE))), 6) AS est
FROM {prev} GROUP BY id
"""
    )

def ktruss_sql(edges_sql: str, k: int = 3, rounds: int = 2) -> str:
    """Unrolled oracle for operators/truss.ktruss(fixed_rounds=rounds):
    per round, ID-ordered triangle enumeration (a<b<c via three canonical
    edge joins — same triangle set as the engine's degree-oriented wedge
    join), per-edge support via a 3-role UNION ALL + GROUP BY, then the
    exact integer threshold cnt >= k-2."""
    parts = [
        f"raw AS MATERIALIZED ({edges_sql})",
        "e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS src,"
        " greatest(src, dst) AS dst FROM raw WHERE src <> dst)",
    ]
    for r in range(rounds):
        parts.append(
            f"tri{r} AS MATERIALIZED (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c"
            f" FROM e{r} e1 JOIN e{r} e2 ON e2.src = e1.dst"
            f" JOIN e{r} e3 ON e3.src = e1.src AND e3.dst = e2.dst)"
        )
        parts.append(
            f"e{r + 1} AS MATERIALIZED (SELECT src, dst FROM ("
            f"SELECT src, dst, COUNT(*) AS cnt FROM ("
            f"SELECT a AS src, b AS dst FROM tri{r}"
            f" UNION ALL SELECT b, c FROM tri{r}"
            f" UNION ALL SELECT a, c FROM tri{r}) roles"
            f" GROUP BY src, dst) sup WHERE cnt >= {k - 2})"
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT src, dst FROM e{rounds}"


def hits_sql(edges_sql: str, iterations: int = 5, round_to: int = 6) -> str:
    """Unrolled HITS oracle (mirrors operators/hits.hits): per superstep an
    auth half-step (gather hub along edges, L2-normalize over the raw gather
    rows, COALESCE missing to 0 AFTER the norm) then the symmetric hub
    half-step. sqrt is IEEE-correctly-rounded in both engines; gather-sum
    order slack is buried by the final round — the pagerank_sql contract."""
    parts = [
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}) raw)",
        "verts AS MATERIALIZED (SELECT src AS id FROM e UNION SELECT dst FROM e)",
        "h0 AS MATERIALIZED (SELECT id, 1.0 AS hub FROM verts)",
    ]
    prev_h = "h0"
    for i in range(1, iterations + 1):
        parts.append(
            f"ar{i} AS MATERIALIZED (SELECT e.dst AS id, SUM(h.hub) AS a"
            f" FROM e JOIN {prev_h} h ON e.src = h.id GROUP BY e.dst)"
        )
        parts.append(f"an{i} AS (SELECT sqrt(SUM(a*a)) AS n FROM ar{i})")
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT v.id,"
            f" COALESCE(ar.a, 0) / (SELECT n FROM an{i}) AS auth"
            f" FROM verts v LEFT JOIN ar{i} ar ON v.id = ar.id)"
        )
        parts.append(
            f"hr{i} AS MATERIALIZED (SELECT e.src AS id, SUM(a.auth) AS h"
            f" FROM e JOIN a{i} a ON e.dst = a.id GROUP BY e.src)"
        )
        parts.append(f"hn{i} AS (SELECT sqrt(SUM(h*h)) AS n FROM hr{i})")
        parts.append(
            f"h{i} AS MATERIALIZED (SELECT v.id,"
            f" COALESCE(hr.h, 0) / (SELECT n FROM hn{i}) AS hub"
            f" FROM verts v LEFT JOIN hr{i} hr ON v.id = hr.id)"
        )
        prev_h = f"h{i}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT h.id, ROUND(h.hub, {round_to}) AS hub_r, ROUND(a.auth, {round_to}) AS auth_r
FROM h{iterations} h JOIN a{iterations} a ON h.id = a.id
"""
    )


def scc_sql(edges_sql: str) -> str:
    """Strongly-connected components oracle via bidirectional transitive
    closure (the convergence-independent truth operators/scc.py must hit
    exactly — SCC output is discrete, so no fixed-round replay is needed):
    scc(v) = MIN over {u : u ⇄ v} ∪ {v}. Tractable at gate scale only —
    closure is quadratic in SCC size, which is precisely why the engine
    side runs forward/backward min-label peeling instead."""
    return f"""
WITH RECURSIVE raw AS ({edges_sql}),
e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
reach(u, v) AS (
    SELECT id, id FROM verts
    UNION
    SELECT r.u, e.dst FROM reach r JOIN e ON r.v = e.src
)
SELECT a.u AS id, MIN(a.v) AS scc
FROM reach a JOIN reach b ON a.u = b.v AND a.v = b.u
GROUP BY a.u
"""


def harmonic_sql(edges_sql: str, supersteps: int = 3) -> str:
    """Unrolled truncated-harmonic-centrality oracle (mirrors
    operators/hyperball.harmonic_centrality): the hyperball_sql register
    recurrence with a raw estimate read out after EVERY superstep, then the
    telescoping Σ (est_r − est_{r−1})/r in the same left-associated
    expression tree — bit-exact cross-engine per the dyadic argument."""
    est_expr = (
        "0.673 * 256.0 / (CAST(16 - COUNT(*) AS DOUBLE)"
        " + SUM(1.0 / CAST(1 << rho AS DOUBLE)))"
    )
    parts = [
        f"e AS MATERIALIZED ({edges_sql})",
        f"sym AS MATERIALIZED ({sym_cte()})",
        "verts AS MATERIALIZED (SELECT DISTINCT u AS id FROM sym)",
        "st0 AS MATERIALIZED (SELECT id,"
        " ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 1))::INT AS j,"
        " CASE WHEN w = 0 THEN 17 ELSE 17 - length(bin(w)) END AS rho"
        " FROM (SELECT id, ('0x' || substr(md5(CAST(id AS VARCHAR)), 2, 4))::INT AS w"
        " FROM verts))",
        f"est0 AS MATERIALIZED (SELECT id, {est_expr} AS est FROM st0 GROUP BY id)",
    ]
    for t in range(1, supersteps + 1):
        parts.append(
            f"st{t} AS MATERIALIZED (SELECT id, j, MAX(rho) AS rho FROM ("
            f"SELECT s.u AS id, p.j, p.rho FROM sym s JOIN st{t - 1} p ON s.v = p.id"
            f" UNION ALL SELECT id, j, rho FROM st{t - 1}) g GROUP BY id, j)"
        )
        parts.append(
            f"est{t} AS MATERIALIZED (SELECT id, {est_expr} AS est"
            f" FROM st{t} GROUP BY id)"
        )
    terms = " + ".join(
        f"(e{t}.est - e{t - 1}.est) / {float(t)!r}" for t in range(1, supersteps + 1)
    )
    joins = " ".join(f"JOIN est{t} e{t} USING (id)" for t in range(1, supersteps + 1))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT id, ROUND({terms}, 6) AS harm FROM est0 e0 {joins}"
    )


def modularity_sql(
    edges_sql: str, labels_sql: str, round_to: int = 6, weighted: bool = False
) -> str:
    """Per-community Newman modularity of a labeled partition (mirrors
    operators/community.modularity_by_community). ``labels_sql`` is any query
    yielding (id, label) — e.g. the full unrolled lpa_sql — embedded as a
    CTE. With ``weighted`` the edges CTE must yield (src, dst, weight) and
    every count becomes a weight sum (integer weights stay exact).
    Expression tree matches the engine's exactly (int sums → double
    divisions) so the pre-round doubles agree bit-for-bit."""
    wexpr = "weight" if weighted else "1"
    return f"""
WITH me0 AS MATERIALIZED ({edges_sql}),
me AS MATERIALIZED (SELECT src, dst, {wexpr} AS w FROM me0),
labs AS MATERIALIZED ({labels_sql}),
mm AS (SELECT CAST(SUM(w) AS DOUBLE) AS m FROM me),
internal AS (
    SELECT la.label, SUM(me.w) AS n_internal
    FROM me JOIN labs la ON me.src = la.id JOIN labs lb ON me.dst = lb.id
    WHERE la.label = lb.label GROUP BY la.label),
msym AS (SELECT src AS u, w FROM me UNION ALL SELECT dst, w FROM me),
degs AS (
    SELECT l.label, SUM(s.w) AS degree_sum
    FROM msym s JOIN labs l ON s.u = l.id GROUP BY l.label)
SELECT d.label,
       COALESCE(i.n_internal, 0) AS n_internal,
       d.degree_sum,
       ROUND(CAST(COALESCE(i.n_internal, 0) AS DOUBLE) / mm.m
             - (CAST(d.degree_sum AS DOUBLE) / (2.0 * mm.m))
             * (CAST(d.degree_sum AS DOUBLE) / (2.0 * mm.m)),
             {round_to}) AS modularity_r
FROM degs d LEFT JOIN internal i ON d.label = i.label CROSS JOIN mm
"""


def link_predict_sql(edges_sql: str, min_common: int = 2, round_to: int = 6) -> str:
    """Common-neighbor link prediction over canonical undirected edges
    (mirrors operators/community.common_neighbor_links, exact path —
    no hub cap): distance-2 non-adjacent pairs with CN count and Jaccard."""
    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
sym AS MATERIALIZED ({sym_cte()}),
deg AS (SELECT u AS id, COUNT(*) AS degree FROM sym GROUP BY u),
cn AS (
    SELECT s1.u AS a, s2.v AS b, COUNT(*) AS common_neighbors
    FROM sym s1 JOIN sym s2 ON s1.v = s2.u
    WHERE s1.u < s2.v
    GROUP BY s1.u, s2.v
    HAVING COUNT(*) >= {min_common}),
ne AS (
    SELECT c.* FROM cn c
    WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = c.a AND e.dst = c.b))
SELECT n.a AS src, n.b AS dst, n.common_neighbors,
       ROUND(CAST(n.common_neighbors AS DOUBLE)
             / (da.degree + db.degree - n.common_neighbors),
             {round_to}) AS jaccard_r
FROM ne n JOIN deg da ON n.a = da.id JOIN deg db ON n.b = db.id
"""


def clustering_sql(edges_sql: str, round_to: int = 6) -> str:
    """Local clustering coefficient oracle (mirrors
    operators/community.clustering_coefficient): per-vertex triangle count
    via the id-ordered 3-way join credited to all three corners, degree from
    the symmetrized edges, cc = 2T/(d(d-1))."""
    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
t AS (SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
      FROM e e1
      JOIN e e2 ON e2.src = e1.dst
      JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
corners AS (SELECT x AS id FROM t UNION ALL SELECT y FROM t UNION ALL SELECT z FROM t),
tri AS (SELECT id, COUNT(*) AS n_triangles FROM corners GROUP BY id),
sym AS ({sym_cte()}),
deg AS (SELECT u AS id, COUNT(*) AS degree FROM sym GROUP BY u)
SELECT d.id, d.degree,
       COALESCE(t2.n_triangles, 0) AS n_triangles,
       ROUND(CASE WHEN d.degree >= 2
                  THEN (2.0 * CAST(COALESCE(t2.n_triangles, 0) AS DOUBLE))
                       / CAST(d.degree * (d.degree - 1) AS DOUBLE)
                  ELSE 0.0 END, {round_to}) AS cc_r
FROM deg d LEFT JOIN tri t2 ON d.id = t2.id
"""


def random_walks_sql(
    edges_sql: str, walk_len: int = 4, start_mod: int = 3, seed: int = 42
) -> str:
    """Unrolled deterministic-walk oracle (mirrors operators/walks.py): per
    step, the next hop is the neighbor minimizing (md5(walk|seed,step|v), v)
    — replayed with a ROW_NUMBER window, which selects the same struct-min."""
    parts = [
        f"e AS MATERIALIZED ({edges_sql})",
        f"sym AS MATERIALIZED ({sym_cte()})",
        "s0 AS MATERIALIZED (SELECT DISTINCT u AS walk_id, u AS vertex FROM sym"
        f" WHERE u % {start_mod} = 0)",
    ]
    selects = ["SELECT walk_id, 0 AS step, vertex FROM s0"]
    for t in range(1, walk_len + 1):
        parts.append(
            f"s{t} AS MATERIALIZED (SELECT walk_id, vertex FROM ("
            f"SELECT c.walk_id, s.v AS vertex,"
            f" ROW_NUMBER() OVER (PARTITION BY c.walk_id ORDER BY"
            f" md5(CAST(c.walk_id AS VARCHAR) || '|w{seed}s{t}|' || CAST(s.v AS VARCHAR)), s.v) AS rn"
            f" FROM s{t - 1} c JOIN sym s ON c.vertex = s.u) WHERE rn = 1)"
        )
        selects.append(f"SELECT walk_id, {t} AS step, vertex FROM s{t}")
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


def assortativity_sql(edges_sql: str, round_to: int = 6) -> str:
    """Degree-assortativity oracle (mirrors
    operators/community.degree_assortativity): exact integer moment sums
    over the darts, one division."""
    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
sym AS MATERIALIZED ({sym_cte()}),
deg AS (SELECT u AS id, COUNT(*) AS degree FROM sym GROUP BY u),
paired AS (
    SELECT da.degree AS du, db.degree AS dv
    FROM sym s JOIN deg da ON s.u = da.id JOIN deg db ON s.v = db.id),
agg AS (SELECT COUNT(*) AS m, SUM(du) AS s1, SUM(du * dv) AS s2,
               SUM(du * du) AS s3 FROM paired)
SELECT m AS n_darts,
       ROUND(CASE WHEN CAST(m * s3 - s1 * s1 AS DOUBLE) <> 0.0
                  THEN CAST(m * s2 - s1 * s1 AS DOUBLE)
                       / CAST(m * s3 - s1 * s1 AS DOUBLE)
                  ELSE 0.0 END, {round_to}) AS assortativity_r
FROM agg
"""


def reciprocity_sql(directed_edges_sql: str, round_to: int = 6) -> str:
    """Reciprocity oracle (mirrors operators/community.reciprocity)."""
    return f"""
WITH e AS MATERIALIZED (
    SELECT DISTINCT src, dst FROM ({directed_edges_sql}) WHERE src <> dst),
r AS (SELECT COUNT(*) AS n_reciprocal FROM e
      WHERE EXISTS (SELECT 1 FROM e e2 WHERE e2.src = e.dst AND e2.dst = e.src)),
n AS (SELECT COUNT(*) AS n_edges FROM e)
SELECT n.n_edges, r.n_reciprocal,
       ROUND(CAST(r.n_reciprocal AS DOUBLE) / CAST(n.n_edges AS DOUBLE),
             {round_to}) AS recip_r
FROM n CROSS JOIN r
"""


def effective_diameter_sql(
    edges_sql: str, supersteps: int = 3, q: float = 0.9
) -> str:
    """Effective-diameter oracle (mirrors
    operators/hyperball.effective_diameter): the hyperball register
    recurrence with a 6dp-rounded N(r) scalar per radius, then the identical
    interpolation CASE tree over the ROUNDED values."""
    est_expr = (
        "0.673 * 256.0 / (CAST(16 - COUNT(*) AS DOUBLE)"
        " + SUM(1.0 / CAST(1 << rho AS DOUBLE)))"
    )
    parts = [
        f"e AS MATERIALIZED ({edges_sql})",
        f"sym AS MATERIALIZED ({sym_cte()})",
        "verts AS MATERIALIZED (SELECT DISTINCT u AS id FROM sym)",
        "st0 AS MATERIALIZED (SELECT id,"
        " ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 1))::INT AS j,"
        " CASE WHEN w = 0 THEN 17 ELSE 17 - length(bin(w)) END AS rho"
        " FROM (SELECT id, ('0x' || substr(md5(CAST(id AS VARCHAR)), 2, 4))::INT AS w"
        " FROM verts))",
        f"n0 AS (SELECT ROUND(SUM(est), 6) AS n0_r FROM"
        f" (SELECT id, {est_expr} AS est FROM st0 GROUP BY id))",
    ]
    for t in range(1, supersteps + 1):
        parts.append(
            f"st{t} AS MATERIALIZED (SELECT id, j, MAX(rho) AS rho FROM ("
            f"SELECT s.u AS id, p.j, p.rho FROM sym s JOIN st{t - 1} p ON s.v = p.id"
            f" UNION ALL SELECT id, j, rho FROM st{t - 1}) g GROUP BY id, j)"
        )
        parts.append(
            f"n{t} AS (SELECT ROUND(SUM(est), 6) AS n{t}_r FROM"
            f" (SELECT id, {est_expr} AS est FROM st{t} GROUP BY id))"
        )
    target = f"{q!r} * n{supersteps}_r"
    cases = [f"WHEN n0_r >= {target} THEN 0.0"]
    for r in range(1, supersteps + 1):
        cases.append(
            f"WHEN n{r}_r >= {target} THEN {float(r - 1)!r}"
            f" + ({target} - n{r - 1}_r) / (n{r}_r - n{r - 1}_r)"
        )
    joins = " CROSS JOIN ".join(f"n{t}" for t in range(supersteps + 1))
    cols = ", ".join(f"n{t}_r" for t in range(supersteps + 1))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT {cols}, ROUND(CASE {' '.join(cases)}"
        + f" ELSE {float(supersteps)!r} END, 6) AS deff_r FROM {joins}"
    )


def double_sweep_sql(edges_sql: str, max_hops: int = 8) -> str:
    """Double-sweep diameter-lower-bound oracle (mirrors
    operators/traversal.double_sweep_diameter): two recursive-CTE BFS
    expansions, argmax with (dist DESC, id ASC) tie-break."""
    return f"""
WITH RECURSIVE e AS ({edges_sql}),
sym AS ({sym_cte()}),
w1(id, dist) AS (
    SELECT (SELECT MIN(u) FROM sym), 0
    UNION
    SELECT s.v, w.dist + 1 FROM sym s JOIN w1 w ON s.u = w.id
    WHERE w.dist < {max_hops}),
d1 AS (SELECT id, MIN(dist) AS dist FROM w1 GROUP BY id),
s1 AS (SELECT id, dist FROM d1 ORDER BY dist DESC, id LIMIT 1),
w2(id, dist) AS (
    SELECT (SELECT id FROM s1), 0
    UNION
    SELECT s.v, w.dist + 1 FROM sym s JOIN w2 w ON s.u = w.id
    WHERE w.dist < {max_hops}),
d2 AS (SELECT id, MIN(dist) AS dist FROM w2 GROUP BY id),
s2 AS (SELECT id, dist FROM d2 ORDER BY dist DESC, id LIMIT 1)
SELECT (SELECT MIN(u) FROM sym) AS src0,
       s1.id AS far0, CAST(s1.dist AS INT) AS ecc0,
       s2.id AS far1, CAST(s2.dist AS INT) AS diam_lb
FROM s1 CROSS JOIN s2
"""


def score_peel_sql(weighted_edges_sql: str, s: int = 2, rounds: int = 3) -> str:
    """Unrolled s-core oracle (mirrors operators/merge.score_peel):
    per-round strength census + semi-join survival, integer weights."""
    parts = [f"e0 AS MATERIALIZED (SELECT src, dst, weight FROM ({weighted_edges_sql}))"]
    for r in range(rounds):
        parts.append(
            f"k{r} AS MATERIALIZED (SELECT id FROM ("
            f"SELECT id, SUM(weight) AS strength FROM ("
            f"SELECT src AS id, weight FROM e{r}"
            f" UNION ALL SELECT dst, weight FROM e{r}) GROUP BY id)"
            f" WHERE strength >= {s})"
        )
        parts.append(
            f"e{r + 1} AS MATERIALIZED (SELECT e.src, e.dst, e.weight FROM e{r} e"
            f" WHERE EXISTS (SELECT 1 FROM k{r} a WHERE a.id = e.src)"
            f" AND EXISTS (SELECT 1 FROM k{r} b WHERE b.id = e.dst))"
        )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT src, dst, weight FROM e{rounds}"
    )


def ra_links_sql(edges_sql: str, min_common: int = 2) -> str:
    """Resource-allocation link prediction oracle (mirrors
    operators/community.resource_allocation_links, exact path — no hub
    cap): fixed-point micro-unit terms make the Σ 1/deg an order-free
    integer sum, bit-exact against Spark."""
    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
sym AS MATERIALIZED ({sym_cte()}),
deg AS (SELECT u AS id, COUNT(*) AS degree FROM sym GROUP BY u),
cn AS (
    SELECT s1.u AS a, s2.v AS b, COUNT(*) AS common_neighbors,
           CAST(SUM(CAST(ROUND(1000000.0 / d.degree, 0) AS BIGINT)) AS BIGINT) AS ra_micro
    FROM sym s1
    JOIN deg d ON s1.v = d.id
    JOIN sym s2 ON s1.v = s2.u
    WHERE s1.u < s2.v
    GROUP BY s1.u, s2.v
    HAVING COUNT(*) >= {min_common})
SELECT c.a AS src, c.b AS dst, c.common_neighbors, c.ra_micro
FROM cn c
WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = c.a AND e.dst = c.b)
"""


def stress_sql(edges_sql: str, seed_mod: int, max_depth: int = 3) -> str:
    """Unrolled DuckDB oracle for operators/centrality.stress_from_seeds:
    per-seed BFS sigma levels forward, integer path-count accumulation
    backward, stress = Σ_seeds sigma * psi. All-integer — exact parity.
    Seeds are the id % seed_mod == 0 vertex slice (scale-generic)."""
    parts = [
        f"eraw AS ({edges_sql})",
        "e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM eraw WHERE src <> dst)",
        f"sym AS MATERIALIZED ({sym_cte('e0')})",
        f"seeds AS (SELECT DISTINCT u AS s FROM sym WHERE u % {seed_mod} = 0)",
        "l0 AS MATERIALIZED (SELECT s, s AS id, CAST(1 AS BIGINT) AS sigma FROM seeds)",
        "seen0 AS (SELECT s, id FROM l0)",
    ]
    for d in range(1, max_depth + 1):
        parts += [
            f"l{d} AS MATERIALIZED (SELECT p.s, y.v AS id, CAST(SUM(p.sigma) AS BIGINT) AS sigma "
            f"FROM l{d - 1} p JOIN sym y ON y.u = p.id "
            f"WHERE NOT EXISTS (SELECT 1 FROM seen{d - 1} z "
            f"WHERE z.s = p.s AND z.id = y.v) "
            f"GROUP BY p.s, y.v)",
            f"seen{d} AS MATERIALIZED (SELECT s, id FROM seen{d - 1} "
            f"UNION ALL SELECT s, id FROM l{d})",
        ]
    parts.append(f"psi{max_depth} AS (SELECT s, id, CAST(0 AS BIGINT) AS psi FROM l{max_depth})")
    for d in range(max_depth - 1, -1, -1):
        parts.append(
            f"psi{d} AS MATERIALIZED (SELECT v.s, v.id, "
            f"CAST(COALESCE(SUM(1 + w.psi), 0) AS BIGINT) AS psi "
            f"FROM l{d} v "
            f"LEFT JOIN (SELECT p.s, y.u, p.psi FROM psi{d + 1} p "
            f"JOIN sym y ON y.v = p.id) w ON w.s = v.s AND w.u = v.id "
            f"GROUP BY v.s, v.id)"
        )
    lvl_union = " UNION ALL ".join(
        f"SELECT s, id, sigma FROM l{d}" for d in range(max_depth + 1)
    )
    psi_union = " UNION ALL ".join(
        f"SELECT s, id, psi FROM psi{d}" for d in range(max_depth + 1)
    )
    parts += [
        f"sig AS ({lvl_union})",
        f"ps AS ({psi_union})",
        "contrib AS (SELECT g.s, g.id, g.sigma * p.psi AS c "
        "FROM sig g JOIN ps p ON g.s = p.s AND g.id = p.id "
        "WHERE g.id <> g.s)",
    ]
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT id, CAST(SUM(c) AS BIGINT) AS stress "
        + "FROM contrib GROUP BY id HAVING SUM(c) > 0"
    )


def rectangles_sql(edges_sql: str) -> str:
    """Oracle for operators/triangles.rectangle_count: wedge-pair identity
    n_rectangles = Σ_{u<w} C(|N(u)∩N(w)|, 2) / 2 — pure integers (each term
    p(p−1)/2 is exact, the total is provably even)."""
    return f"""
        WITH e AS MATERIALIZED ({edges_sql}),
        s AS MATERIALIZED ({sym_cte('e')}),
        p AS (
            SELECT a.v AS u, b.v AS w, COUNT(*) AS p
            FROM s a JOIN s b ON a.u = b.u AND a.v < b.v
            GROUP BY a.v, b.v)
        SELECT CAST(COALESCE(SUM((p * (p - 1)) // 2), 0) // 2 AS BIGINT) AS n_rectangles,
               CAST(COALESCE(SUM(CASE WHEN p >= 2 THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_closed_pairs
        FROM p
    """


def louvain_sql(edges_sql: str, rounds: int = 2, weighted: bool = False) -> str:
    """Unrolled oracle for operators/community.louvain_local_move: per round
    the community degree totals, the per-(vertex, neighbor-community) edge
    counts, the all-integer gain 2m·k_vc − deg·(tot − [own]·deg), the
    Grappolo singleton-swap guard, and the (gain DESC, comm ASC) argmax —
    the identical synchronous program. With ``weighted`` the edges CTE must
    yield (src, dst, weight) and every count becomes an integer weight sum
    (m = Σw, degree = strength, k_vc = Σw into c)."""
    if weighted:
        sym = (
            "SELECT src AS u, dst AS v, weight AS w FROM e "
            "UNION ALL SELECT dst, src, weight FROM e"
        )
        deg = "SELECT u AS id, SUM(w) AS degree FROM s GROUP BY u"
        mm = "SELECT SUM(weight) AS m FROM e"
        kagg = "SUM(s.w)"
    else:
        sym = sym_cte("e")
        deg = "SELECT u AS id, COUNT(*) AS degree FROM s GROUP BY u"
        mm = "SELECT COUNT(*) AS m FROM e"
        kagg = "COUNT(*)"
    parts = [
        f"e AS MATERIALIZED ({edges_sql})",
        f"s AS MATERIALIZED ({sym})",
        f"deg AS MATERIALIZED ({deg})",
        f"mm AS ({mm})",
        "l0 AS MATERIALIZED (SELECT id, id AS comm FROM deg)",
    ]
    for r in range(rounds):
        n = r + 1
        parts += [
            f"tot{r} AS MATERIALIZED (SELECT l.comm, SUM(d.degree) AS tot "
            f"FROM l{r} l JOIN deg d ON l.id = d.id GROUP BY l.comm)",
            f"kvc{r} AS MATERIALIZED (SELECT s.u AS id, l.comm, {kagg} AS kvc "
            f"FROM s JOIN l{r} l ON s.v = l.id GROUP BY s.u, l.comm)",
            f"siz{r} AS MATERIALIZED (SELECT comm, COUNT(*) AS csize "
            f"FROM l{r} GROUP BY comm)",
            f"cand{r} AS MATERIALIZED ("
            f"SELECT l.id, l.comm, COALESCE(k.kvc, 0) AS kvc, l.comm AS own_comm "
            f"FROM l{r} l LEFT JOIN kvc{r} k ON l.id = k.id AND l.comm = k.comm "
            f"UNION ALL "
            f"SELECT k.id, k.comm, k.kvc, l.comm FROM kvc{r} k "
            f"JOIN l{r} l ON k.id = l.id WHERE k.comm <> l.comm)",
            f"sc{r} AS MATERIALIZED (SELECT c.id, c.comm, "
            f"2 * (SELECT m FROM mm) * c.kvc - d.degree * "
            f"(t.tot - CASE WHEN c.comm = c.own_comm THEN d.degree ELSE 0 END) AS gain "
            f"FROM cand{r} c JOIN deg d ON c.id = d.id "
            f"JOIN tot{r} t ON c.comm = t.comm "
            f"JOIN siz{r} st ON c.comm = st.comm "
            f"JOIN siz{r} so ON c.own_comm = so.comm "
            f"WHERE NOT (so.csize = 1 AND st.csize = 1 AND c.comm > c.own_comm))",
            f"l{n} AS MATERIALIZED (SELECT id, comm FROM ("
            f"SELECT id, comm, ROW_NUMBER() OVER "
            f"(PARTITION BY id ORDER BY gain DESC, comm ASC) AS rn FROM sc{r}"
            f") WHERE rn = 1)",
        ]
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, CAST(comm AS BIGINT) AS comm FROM l{rounds}"
    )


def katz_sql(
    edges_sql: str,
    rounds: int = 4,
    alpha_num: int = 5,
    alpha_den: int = 100,
    scale: int = 1_000_000,
) -> str:
    """Unrolled oracle for operators/centrality.katz_centrality:
    x' = scale + (Σ_N x · alpha_num) // alpha_den, all BIGINT."""
    parts = [
        f"eraw AS ({edges_sql})",
        "e0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS src, "
        "GREATEST(src, dst) AS dst FROM eraw WHERE src <> dst)",
        f"s AS MATERIALIZED ({sym_cte('e0')})",
        "verts AS MATERIALIZED (SELECT DISTINCT u AS id FROM s)",
        f"x0 AS MATERIALIZED (SELECT id, CAST({scale} AS BIGINT) AS katz FROM verts)",
    ]
    for r in range(rounds):
        n = r + 1
        parts += [
            f"g{n} AS MATERIALIZED (SELECT s.v AS id, "
            f"CAST(SUM(x.katz) AS BIGINT) AS g "
            f"FROM s JOIN x{r} x ON s.u = x.id GROUP BY s.v)",
            f"x{n} AS MATERIALIZED (SELECT v.id, "
            f"CAST({scale} + (COALESCE(g.g, 0) * {alpha_num}) // {alpha_den} "
            f"AS BIGINT) AS katz "
            f"FROM verts v LEFT JOIN g{n} g ON v.id = g.id)",
        ]
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, katz FROM x{rounds}"
    )


def mean_agg_sql(edges_sql: str, rounds: int = 2, scale: int = 1_000_000) -> str:
    """Unrolled oracle for operators/features.mean_aggregate_features:
    x0 = deg·scale, x' = (Σ_N x) // deg — all BIGINT."""
    parts = [
        f"e AS MATERIALIZED ({edges_sql})",
        f"s AS MATERIALIZED ({sym_cte('e')})",
        "deg AS MATERIALIZED (SELECT u AS id, COUNT(*) AS degree FROM s GROUP BY u)",
        f"x0 AS MATERIALIZED (SELECT id, degree, "
        f"CAST(degree * {scale} AS BIGINT) AS feat FROM deg)",
    ]
    for r in range(rounds):
        n = r + 1
        parts += [
            f"g{n} AS MATERIALIZED (SELECT s.v AS id, "
            f"CAST(SUM(x.feat) AS BIGINT) AS g "
            f"FROM s JOIN x{r} x ON s.u = x.id GROUP BY s.v)",
            f"x{n} AS MATERIALIZED (SELECT d.id, d.degree, "
            f"CAST(g.g // d.degree AS BIGINT) AS feat "
            f"FROM deg d JOIN g{n} g ON d.id = g.id)",
        ]
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id, degree, feat FROM x{rounds}"
    )


def louvain_two_level_sql(
    edges_sql: str, rounds: int = 2, rounds2: int = 2
) -> str:
    """Oracle for operators/community.louvain_two_level: the level-1
    louvain_sql program as a nested subquery, the community contraction
    (LEAST/GREATEST + COUNT(*) multiplicity weights), the weighted
    louvain_sql program on the coarse graph, and the COALESCE map-back for
    isolated communities — the identical pipeline."""
    lvl1 = louvain_sql(edges_sql, rounds=rounds)
    lvl2 = louvain_sql(
        "SELECT src, dst, weight FROM coarse", rounds=rounds2, weighted=True
    )
    return f"""
        WITH lvl1 AS MATERIALIZED (SELECT * FROM ({lvl1})),
        eorig AS MATERIALIZED ({edges_sql}),
        coarse AS MATERIALIZED (
            SELECT LEAST(a.comm, b.comm) AS src,
                   GREATEST(a.comm, b.comm) AS dst,
                   COUNT(*) AS weight
            FROM eorig e
            JOIN lvl1 a ON e.src = a.id
            JOIN lvl1 b ON e.dst = b.id
            WHERE a.comm <> b.comm
            GROUP BY LEAST(a.comm, b.comm), GREATEST(a.comm, b.comm)),
        lvl2 AS MATERIALIZED (SELECT * FROM ({lvl2}))
        SELECT l1.id, CAST(COALESCE(l2.comm, l1.comm) AS BIGINT) AS comm
        FROM lvl1 l1 LEFT JOIN lvl2 l2 ON l1.comm = l2.id
    """


def edge_jaccard_sql(edges_sql: str, round_to: int = 6) -> str:
    """Per-edge structural Jaccard oracle (mirrors
    operators/community.edge_jaccard, exact path — no hub cap): cn per edge
    is the triangle-support count; union size = deg_src + deg_dst − cn.
    Exact integers + one division rounded — bit-exact against Spark."""
    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
sym AS MATERIALIZED ({sym_cte()}),
deg AS (SELECT u AS id, COUNT(*) AS degree FROM sym GROUP BY u),
cn AS (
  SELECT s1.u AS a, s2.v AS b, COUNT(*) AS cn
  FROM sym s1 JOIN sym s2 ON s1.v = s2.u
  WHERE s1.u < s2.v
  GROUP BY s1.u, s2.v),
j AS (
  SELECT e.src, e.dst, COALESCE(c.cn, 0) AS common_neighbors,
         da.degree AS deg_src, db.degree AS deg_dst
  FROM e
  LEFT JOIN cn c ON c.a = e.src AND c.b = e.dst
  JOIN deg da ON da.id = e.src
  JOIN deg db ON db.id = e.dst)
SELECT src, dst, common_neighbors, deg_src, deg_dst,
       ROUND(CAST(common_neighbors AS DOUBLE)
             / CAST(deg_src + deg_dst - common_neighbors AS DOUBLE),
             {round_to}) AS jaccard_r
FROM j
"""


def build_order_sql(edges_sql: str) -> str:
    """Condensation build-order oracle (mirrors operators/dag.build_order):
    SCC partition via bidirectional transitive closure (scc_sql's truth),
    condensation edges by double re-key + distinct, then longest-path level
    per condensation node via a recursive path-length CTE (UNION dedup;
    terminates because the condensation is acyclic, rows bounded by
    nodes x depth). Exact integers — convergence-independent and bit-exact
    against the engine's superstep relaxation. Gate-scale truth tool only:
    the closure is quadratic in SCC size and the CTE enumerates path
    lengths, which is precisely why the engine side iterates a
    join+groupBy(max) fix point instead."""
    return f"""
WITH RECURSIVE raw AS ({edges_sql}),
e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
verts AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
reach(u, v) AS (
    SELECT id, id FROM verts
    UNION
    SELECT r.u, e.dst FROM reach r JOIN e ON r.v = e.src
),
scc AS (
    SELECT a.u AS id, MIN(a.v) AS scc
    FROM reach a JOIN reach b ON a.u = b.v AND a.v = b.u
    GROUP BY a.u
),
ce AS (
    SELECT DISTINCT sa.scc AS src, sb.scc AS dst
    FROM e
    JOIN scc sa ON e.src = sa.id
    JOIN scc sb ON e.dst = sb.id
    WHERE sa.scc <> sb.scc
),
cnodes AS (SELECT DISTINCT scc AS node FROM scc),
lvl(node, l) AS (
    SELECT node, CAST(0 AS BIGINT) FROM cnodes
    UNION
    SELECT ce.dst, lvl.l + 1 FROM lvl JOIN ce ON ce.src = lvl.node
),
clevel AS (SELECT node, MAX(l) AS level FROM lvl GROUP BY node)
SELECT s.id, s.scc, c.level
FROM scc s JOIN clevel c ON s.scc = c.node
"""


def rich_club_sql(edges_sql: str, round_to: int = 6) -> str:
    """Rich-club coefficient oracle (mirrors operators/community.rich_club):
    canonicalize, symmetrized degrees, per-edge min endpoint degree, then
    the per-threshold suffix sums over BOTH histograms via non-equi joins —
    the same aggregate-sized relations the engine uses. n_club/e_club exact
    integers; phi_r one double division (2.0*E)/(N*(N-1)) rounded — the
    identical expression tree, bit-exact cross-engine."""
    return f"""
WITH raw AS ({edges_sql}),
e AS (SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
      FROM raw WHERE src <> dst),
sym AS ({sym_cte()}),
deg AS (SELECT u AS id, COUNT(*) AS degree FROM sym GROUP BY u),
emd AS (
    SELECT LEAST(ds.degree, dd.degree) AS m
    FROM e JOIN deg ds ON e.src = ds.id JOIN deg dd ON e.dst = dd.id),
node_hist AS (SELECT degree AS d, COUNT(*) AS nd FROM deg GROUP BY degree),
edge_hist AS (SELECT m, COUNT(*) AS ne FROM emd GROUP BY m),
ks AS (SELECT d AS k FROM node_hist),
nk AS (SELECT k, SUM(nd) AS n_club FROM ks JOIN node_hist ON d > k GROUP BY k),
ek AS (SELECT k, SUM(ne) AS e_club FROM ks JOIN edge_hist ON m > k GROUP BY k)
SELECT nk.k, nk.n_club, COALESCE(ek.e_club, 0) AS e_club,
       ROUND(2.0 * COALESCE(ek.e_club, 0)
             / nk.n_club / (nk.n_club - 1), {round_to}) AS phi_r
FROM nk LEFT JOIN ek ON nk.k = ek.k
WHERE nk.n_club >= 2
"""


def sssp_sql(weighted_edges_sql: str, rounds: int = 6) -> str:
    """Unrolled fixed-round Bellman-Ford oracle (mirrors
    operators/traversal.sssp_distances, undirected): round CTE r holds
    min path cost using <= r edges from the graph's minimum vertex id.
    All-integer arithmetic — bit-exact cross-engine; the engine's fix-point
    early exit returns the identical relation (further rounds are
    identity on a converged state)."""
    parts = [
        f"e AS MATERIALIZED ({weighted_edges_sql})",
        "sym AS MATERIALIZED ("
        "SELECT src AS u, dst AS v, CAST(weight AS BIGINT) AS w FROM e"
        " UNION ALL SELECT dst, src, CAST(weight AS BIGINT) FROM e)",
        "d0 AS MATERIALIZED (SELECT (SELECT MIN(u) FROM sym) AS id,"
        " CAST(0 AS BIGINT) AS dist)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT id, MIN(dist) AS dist FROM ("
            f"SELECT id, dist FROM d{r - 1}"
            f" UNION ALL SELECT s.v, d.dist + s.w"
            f" FROM d{r - 1} d JOIN sym s ON s.u = d.id) g GROUP BY id)"
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT id, dist FROM d{rounds}"


def betweenness_sql(
    edges_sql: str, seed_mod: int, max_depth: int = 3, scale: int = 1_000_000
) -> str:
    """Unrolled DuckDB oracle for operators/centrality.betweenness_from_seeds:
    stress_sql's forward sigma levels, then the micro-unit dependency
    recursion backward — per-successor-edge floor division (// == Spark's
    `div` on non-negative operands), order-free integer sums. Exact parity."""
    parts = [
        f"eraw AS ({edges_sql})",
        "e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM eraw WHERE src <> dst)",
        f"sym AS MATERIALIZED ({sym_cte('e0')})",
        f"seeds AS (SELECT DISTINCT u AS s FROM sym WHERE u % {seed_mod} = 0)",
        "l0 AS MATERIALIZED (SELECT s, s AS id, CAST(1 AS BIGINT) AS sigma FROM seeds)",
        "seen0 AS (SELECT s, id FROM l0)",
    ]
    for d in range(1, max_depth + 1):
        parts += [
            f"l{d} AS MATERIALIZED (SELECT p.s, y.v AS id, CAST(SUM(p.sigma) AS BIGINT) AS sigma "
            f"FROM l{d - 1} p JOIN sym y ON y.u = p.id "
            f"WHERE NOT EXISTS (SELECT 1 FROM seen{d - 1} z "
            f"WHERE z.s = p.s AND z.id = y.v) "
            f"GROUP BY p.s, y.v)",
            f"seen{d} AS MATERIALIZED (SELECT s, id FROM seen{d - 1} "
            f"UNION ALL SELECT s, id FROM l{d})",
        ]
    parts.append(
        f"dl{max_depth} AS (SELECT s, id, sigma, CAST(0 AS BIGINT) AS delta "
        f"FROM l{max_depth})"
    )
    for d in range(max_depth - 1, -1, -1):
        parts.append(
            f"dl{d} AS MATERIALIZED (SELECT v.s, v.id, v.sigma, "
            f"CAST(COALESCE(SUM((v.sigma * ({scale} + w.delta)) // w.sigma), 0) "
            f"AS BIGINT) AS delta "
            f"FROM l{d} v "
            f"LEFT JOIN (SELECT p.s, y.u AS u, p.sigma, p.delta FROM dl{d + 1} p "
            f"JOIN sym y ON y.v = p.id) w ON w.s = v.s AND w.u = v.id "
            f"GROUP BY v.s, v.id, v.sigma)"
        )
    dl_union = " UNION ALL ".join(
        f"SELECT s, id, delta FROM dl{d}" for d in range(max_depth)
    )
    parts.append(
        f"contrib AS (SELECT id, delta AS c FROM ({dl_union}) du WHERE id <> s)"
    )
    return (
        "WITH " + ",\n".join(parts)
        + "\nSELECT id, CAST(SUM(c) AS BIGINT) AS bc_micro "
        + "FROM contrib GROUP BY id HAVING SUM(c) > 0"
    )


def cocitation_sql(
    edges_sql: str, min_common: int = 2, transpose: bool = False
) -> str:
    """DuckDB twin of operators/community.cocitation_pairs (exact regime,
    no hub cap): distinct directed edges, optional transpose, shared-key
    self-join, integer count per unordered pair."""
    flip = "SELECT dst AS src, src AS dst FROM e0" if transpose else "SELECT src, dst FROM e0"
    return f"""
WITH eraw AS ({edges_sql}),
e0 AS (SELECT DISTINCT src, dst FROM eraw WHERE src <> dst),
e AS MATERIALIZED ({flip})
SELECT e1.dst AS a, e2.dst AS b, CAST(COUNT(*) AS BIGINT) AS n_common
FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
GROUP BY e1.dst, e2.dst
HAVING COUNT(*) >= {int(min_common)}
"""


def sampled_triangles_sql(
    canonical_edges_sql: str, keep_hex: int = 4, seed_tag: str = "t42"
) -> str:
    """Oracle for triangles.sampled_triangle_estimate: identical md5
    hash-coin sample of the canonical edge set, id-ordered 3-way join
    count, integer 1/p^3 scale-up."""
    digits = ", ".join(f"'{c}'" for c in "0123456789abcdef"[:keep_hex])
    return f"""
WITH e0 AS ({canonical_edges_sql}),
e AS MATERIALIZED (
  SELECT src, dst FROM e0
  WHERE SUBSTRING(MD5(CAST(src AS VARCHAR) || '|' ||
                      CAST(dst AS VARCHAR) || '|{seed_tag}'), 1, 1)
        IN ({digits})
),
n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled_triangles
  FROM e e1
  JOIN e e2 ON e2.src = e1.dst
  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
SELECT n_sampled_triangles,
       CAST(n_sampled_triangles * {16 ** 3} // {keep_hex ** 3} AS BIGINT)
           AS est_triangles
FROM n
"""
