"""Distributed maximal matching — the handshake algorithm.

Fills the role of the reference's Kolmogorov blossom matching
(PGS_Meshing.java nodeMatching via jgrapht; SURVEY §2.9 "Kolmogorov
matching"). Exact minimum-weight perfect matching (Blossom V) is inherently
sequential; the distributed classic with the maximal-matching guarantee is
the handshake / "mirror proposal" algorithm (Israeli & Itai family): each
round every active vertex proposes to its HASH-MINIMUM active neighbor
(md5(v|seed), v) — a deterministic stand-in for the randomized proposal
order, so adversarial id-ordered chains (where plain min-id matching needs
O(n) rounds: an increasing path matches one pair per round) still finish in
expected O(log n) rounds; mutual proposals become matched pairs; matched
vertices leave. The fixed hash rule makes the whole run a fixed program a
DuckDB oracle replays pair-for-pair.

Guarantee at convergence: the matching is MAXIMAL — no remaining edge has
both endpoints unmatched (each such edge would generate proposals until one
endpoint matches). Each round is one groupBy (min proposal) + one self-join
(mutuality) + two anti-joins (removal) — the engine's standard superstep.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgs_spark.operators.edges import symmetrize
from pgs_spark.operators.state import make_work_dir, snapshot

# Chained localCheckpoints degrade geometrically past ~18 iterations on this
# Spark build (measured in layout.py:92-97 — 0.7s→113s by iter 23); expected
# handshake rounds are O(log n) so the cliff is normally unreachable, but an
# adversarial graph that needs 20+ rounds would walk into it. Past this round
# threshold the loop state switches to flat parquet snapshots (state.py).
LOCAL_CP_ROUNDS = 12


@dataclass
class MatchingResult:
    pairs: DataFrame  # (a, b), a < b — vertex-disjoint matched pairs
    rounds: int
    converged: bool
    history: list = field(default_factory=list)


class _RoundState:
    """localCheckpoint for shallow rounds, parquet snapshots past the chain
    cliff. `name` must be unique per (logical state, round) when the result
    outlives the round (matched parts); alternating names suffice for the
    two-generation dart state."""

    def __init__(self, prefix: str):
        self.prefix = prefix
        self.work_dir: str | None = None

    def hold(self, df: DataFrame, r: int, name: str) -> DataFrame:
        if r <= LOCAL_CP_ROUNDS:
            return df.localCheckpoint(eager=True)
        if self.work_dir is None:
            self.work_dir = make_work_dir(self.prefix)
        return snapshot(df, self.work_dir, name)


def greedy_matching(
    spark: SparkSession,
    undirected_edges: DataFrame,
    max_rounds: int = 30,
    fixed_rounds: int | None = None,
    seed: int = 11,
) -> MatchingResult:
    """Canonical undirected edge table → vertex-disjoint (a, b) pairs.

    `fixed_rounds` runs exactly that many handshake rounds (oracle mode —
    both engines execute the identical program, so they agree even if more
    rounds would match more pairs); otherwise runs until no darts remain or
    a round adds no pairs (maximal matching).
    """
    state = _RoundState("pgs_match_")
    darts = (
        symmetrize(undirected_edges)
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    matched_parts: list[DataFrame] = []
    history: list[dict] = []
    limit = fixed_rounds if fixed_rounds is not None else max_rounds
    rounds = 0
    converged = False
    prio = F.md5(F.concat(F.col("v").cast("string"), F.lit(f"|{seed}")))
    for r in range(1, limit + 1):
        cand = (
            darts.groupBy("u")
            .agg(F.min(F.struct(prio.alias("h"), F.col("v"))).alias("s"))
            .select("u", F.col("s.v").alias("mv"))
        )
        mutual = (
            cand.alias("a")
            .join(
                cand.alias("b"),
                (F.col("a.mv") == F.col("b.u")) & (F.col("b.mv") == F.col("a.u")),
            )
            .filter(F.col("a.u") < F.col("a.mv"))
            .select(F.col("a.u").alias("a"), F.col("a.mv").alias("b"))
        )
        # matched parts outlive the loop → unique snapshot name per round
        mutual = state.hold(mutual, r, f"mut_{r}")
        rounds = r
        n_new = mutual.count()
        history.append({"round": r, "matched": n_new})
        if n_new == 0:
            # impossible with darts remaining: the active vertex of globally
            # minimum hash priority is every neighbor's proposal, and it
            # proposes back to one of them — every live round matches >= 1
            # pair, so an empty round means the dart set is empty
            converged = True
            break
        matched_parts.append(mutual)
        gone = mutual.select(F.col("a").alias("id")).union(
            mutual.select(F.col("b").alias("id"))
        )
        darts = state.hold(
            darts.join(gone.withColumnRenamed("id", "u"), "u", "left_anti")
            .join(gone.withColumnRenamed("id", "v"), "v", "left_anti")
            .select("u", "v"),
            r,
            f"darts_{r % 2}",
        )
        if darts.isEmpty():
            converged = True
            break
    if not matched_parts:
        return MatchingResult(
            spark.createDataFrame([], "a long, b long"), rounds, converged, history
        )
    out = matched_parts[0]
    for p in matched_parts[1:]:
        out = out.union(p)
    return MatchingResult(out, rounds, converged, history)


def matching_sql(edges_sql: str, rounds: int, seed: int = 11) -> str:
    """Unrolled DuckDB oracle: the identical fixed-round hash handshake."""
    pr = f"md5(CAST(v AS VARCHAR) || '|{seed}')"
    parts = [
        f"e AS MATERIALIZED ({edges_sql})",
        "d0 AS MATERIALIZED (SELECT DISTINCT u, v FROM "
        "(SELECT src AS u, dst AS v FROM e UNION ALL SELECT dst, src FROM e) t)",
    ]
    prev = "d0"
    selects = []
    for r in range(1, rounds + 1):
        parts += [
            f"cand{r} AS MATERIALIZED (SELECT u, mv FROM ("
            f"SELECT u, v AS mv, ROW_NUMBER() OVER (PARTITION BY u ORDER BY {pr}, v) AS rn "
            f"FROM {prev}) t WHERE rn = 1)",
            f"mut{r} AS MATERIALIZED (SELECT a.u AS a, a.mv AS b FROM cand{r} a "
            f"JOIN cand{r} b ON a.mv = b.u AND b.mv = a.u WHERE a.u < a.mv)",
            f"gone{r} AS (SELECT a AS id FROM mut{r} UNION ALL SELECT b FROM mut{r})",
            f"d{r} AS MATERIALIZED (SELECT d.u, d.v FROM {prev} d "
            f"WHERE d.u NOT IN (SELECT id FROM gone{r}) "
            f"AND d.v NOT IN (SELECT id FROM gone{r}))",
        ]
        selects.append(f"SELECT a, b FROM mut{r}")
        prev = f"d{r}"
    union = " UNION ALL ".join(selects)
    return "WITH " + ",\n".join(parts) + f"\nSELECT a, b FROM ({union})"


def local_max_matching(
    spark: SparkSession,
    weighted_edges: DataFrame,
    max_rounds: int = 30,
    fixed_rounds: int | None = None,
    seed: int = 11,
) -> MatchingResult:
    """Weight-aware matching — the distributed local-max (Preis) algorithm.

    The reference's objective is MAXIMIZE total weight
    (KolmogorovWeightedMatching with MAXIMIZE, PGS_Meshing.java:536-543);
    the hash-handshake above is maximal in cardinality but weight-blind.
    Preis 1999 / the local-max rule (Manne–Bisseling 2007): every active
    vertex proposes along its locally-HEAVIEST incident edge; mutual
    proposals (= locally dominant edges) enter the matching and both
    endpoints leave. At convergence this is a ½-approximation of the
    maximum-weight matching AND maximal — the same superstep shape as the
    handshake with weight leading the struct-max.

    Tie-break (determinism for the fixed-round DuckDB oracle): proposals
    maximize (w, md5(v|seed), v) lexicographically — the hash rule of the
    unweighted handshake demoted to tie-breaker, so equal-weight adversarial
    chains still finish in O(log n) expected rounds and both engines replay
    the identical program. Input: canonical (src, dst, weight), one weight
    per pair; weights must be cross-engine exact (integers, or expressions
    both engines compute bit-identically) for oracle use.

    Output pairs carry the matched edge's weight. Round state switches from
    localCheckpoint to parquet snapshots past LOCAL_CP_ROUNDS (the measured
    chain cliff, layout.py:92-97).
    """
    state = _RoundState("pgs_wmatch_")
    we = weighted_edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.col("weight").alias("w"),
    )
    darts = (
        we.select(F.col("src").alias("u"), F.col("dst").alias("v"), "w")
        .union(we.select(F.col("dst").alias("u"), F.col("src").alias("v"), "w"))
        .localCheckpoint(eager=True)
    )
    matched_parts: list[DataFrame] = []
    history: list[dict] = []
    limit = fixed_rounds if fixed_rounds is not None else max_rounds
    rounds = 0
    converged = False
    prio = F.md5(F.concat(F.col("v").cast("string"), F.lit(f"|{seed}")))
    for r in range(1, limit + 1):
        cand = (
            darts.groupBy("u")
            .agg(F.max(F.struct(F.col("w"), prio.alias("h"), F.col("v"))).alias("s"))
            .select("u", F.col("s.v").alias("mv"), F.col("s.w").alias("mw"))
        )
        mutual = (
            cand.alias("a")
            .join(
                cand.alias("b"),
                (F.col("a.mv") == F.col("b.u")) & (F.col("b.mv") == F.col("a.u")),
            )
            .filter(F.col("a.u") < F.col("a.mv"))
            .select(
                F.col("a.u").alias("a"),
                F.col("a.mv").alias("b"),
                F.col("a.mw").alias("weight"),
            )
        )
        mutual = state.hold(mutual, r, f"mut_{r}")
        rounds = r
        n_new = mutual.count()
        history.append({"round": r, "matched": n_new})
        if n_new == 0:
            # the globally heaviest surviving edge is locally dominant at
            # both endpoints (ties broken identically on both sides), so a
            # live round always matches >= 1 pair — empty round == no darts
            converged = True
            break
        matched_parts.append(mutual)
        gone = mutual.select(F.col("a").alias("id")).union(
            mutual.select(F.col("b").alias("id"))
        )
        darts = state.hold(
            darts.join(gone.withColumnRenamed("id", "u"), "u", "left_anti")
            .join(gone.withColumnRenamed("id", "v"), "v", "left_anti")
            .select("u", "v", "w"),
            r,
            f"darts_{r % 2}",
        )
        if darts.isEmpty():
            converged = True
            break
    if not matched_parts:
        return MatchingResult(
            spark.createDataFrame([], "a long, b long, weight double"),
            rounds,
            converged,
            history,
        )
    out = matched_parts[0]
    for p in matched_parts[1:]:
        out = out.union(p)
    return MatchingResult(out, rounds, converged, history)


def local_max_matching_sql(edges_sql: str, rounds: int, seed: int = 11) -> str:
    """Unrolled DuckDB oracle for `local_max_matching`: the identical
    fixed-round program; the struct-MAX proposal becomes ROW_NUMBER() ...
    ORDER BY (w DESC, hash DESC, v DESC). `edges_sql` → (src, dst, weight)."""
    pr = f"md5(CAST(v AS VARCHAR) || '|{seed}')"
    parts = [
        f"e AS MATERIALIZED ({edges_sql})",
        "d0 AS MATERIALIZED (SELECT src AS u, dst AS v, weight AS w FROM e "
        "UNION ALL SELECT dst, src, weight FROM e)",
    ]
    prev = "d0"
    selects = []
    for r in range(1, rounds + 1):
        parts += [
            f"cand{r} AS MATERIALIZED (SELECT u, mv, mw FROM ("
            f"SELECT u, v AS mv, w AS mw, "
            f"ROW_NUMBER() OVER (PARTITION BY u ORDER BY w DESC, {pr} DESC, v DESC) AS rn "
            f"FROM {prev}) t WHERE rn = 1)",
            f"mut{r} AS MATERIALIZED (SELECT a.u AS a, a.mv AS b, a.mw AS weight "
            f"FROM cand{r} a JOIN cand{r} b ON a.mv = b.u AND b.mv = a.u "
            "WHERE a.u < a.mv)",
            f"gone{r} AS (SELECT a AS id FROM mut{r} UNION ALL SELECT b FROM mut{r})",
            f"d{r} AS MATERIALIZED (SELECT d.u, d.v, d.w FROM {prev} d "
            f"WHERE d.u NOT IN (SELECT id FROM gone{r}) "
            f"AND d.v NOT IN (SELECT id FROM gone{r}))",
        ]
        selects.append(f"SELECT a, b, weight FROM mut{r}")
        prev = f"d{r}"
    union = " UNION ALL ".join(selects)
    return "WITH " + ",\n".join(parts) + f"\nSELECT a, b, weight FROM ({union})"
