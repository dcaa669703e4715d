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


@dataclass
class MatchingResult:
    pairs: DataFrame  # (a, b), a < b — vertex-disjoint matched pairs
    rounds: int
    converged: bool
    history: list = field(default_factory=list)


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
            .localCheckpoint(eager=True)
        )
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
        darts = (
            darts.join(gone.withColumnRenamed("id", "u"), "u", "left_anti")
            .join(gone.withColumnRenamed("id", "v"), "v", "left_anti")
            .select("u", "v")
            .localCheckpoint(eager=True)
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
