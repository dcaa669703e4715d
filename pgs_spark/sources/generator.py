"""Deterministic synthetic ``code_files`` generator.

Shape per BASELINE.json ``input_hint``: ``(repo, path, commit, lang, content)``
plus a ``sha256`` column stamped at generation time (the per-row invariant the
extraction stage must reproduce).

Graft of the reference's seeded synthetic-row generators
(PGS_PointSet.random/gaussian/poisson, PGS_PointSet.java:362-425 — all take an
explicit seed, as does PGS_Coloring.SEED=1337, PGS_Coloring.java:47). Import
targets follow a Zipf-ish power law so hub repos create *genuine* join/agg skew
(the ">2 faces share an edge" case of PGS_Conversion.java:1101-1104, which for
dependency graphs is the common case, not the warning case).

Everything is Spark built-in column expressions over ``spark.range`` — no
Python row loop, no driver-side data, fully deterministic for a given seed, and
embarrassingly parallel (scales linearly with partitions at any data size).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "java", "js"]
EXTS = {"python": "py", "java": "java", "js": "js"}
MAX_IMPORTS = 20


def _u01(*cols) -> Column:
    """Deterministic uniform [0,1) from column values via xxhash64."""
    return F.pmod(F.xxhash64(*cols), F.lit(2**31)).cast("double") / F.lit(float(2**31))


def _zipf_idx(u: Column, n_repos: int) -> Column:
    """Inverse-CDF Zipf(s≈1) sample over repo indices [0, n_repos)."""
    # CDF(rank) ~ ln(rank)/ln(R)  =>  rank = exp(u * ln(R)); pdf ∝ 1/rank.
    rank = F.floor(F.exp(u * F.lit(math.log(float(n_repos)))))
    return F.least(F.greatest(rank - 1, F.lit(0)), F.lit(n_repos - 1))


def repo_name(idx: Column) -> Column:
    return F.format_string("repo_%05d", idx.cast("int"))


def generate_code_files(
    spark: SparkSession,
    n_repos: int = 1000,
    n_files: int = 20_000,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the ``code_files`` table: one row per source file.

    Columns: repo, path, commit, lang, content, sha256. Import statements in
    ``content`` are real per-language syntax; filler lines contain import-like
    decoys so extraction must actually parse, not substring-match.
    """
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    files = spark.range(0, n_files, numPartitions=num_partitions)
    s = F.lit(seed)

    owner_idx = F.pmod(F.xxhash64("id", F.lit("owner"), s), F.lit(n_repos))
    repo = repo_name(owner_idx)
    lang_slot = (F.pmod(F.xxhash64(repo), F.lit(3)) + 1).cast("int")
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), lang_slot)
    ext = F.element_at(F.array(*[F.lit(EXTS[x]) for x in LANGS]), lang_slot)
    path = F.format_string(
        "src/mod_%d/file_%d.%s",
        F.pmod(F.xxhash64("id", F.lit("mod"), s), F.lit(10)).cast("int"),
        F.col("id").cast("int"),
        ext,
    )
    commit = F.substring(F.sha2(F.concat(repo, path, F.lit(str(seed))), 256), 1, 40)
    n_imports = F.pmod(F.xxhash64("id", F.lit("nimp"), s), F.lit(MAX_IMPORTS + 1))

    base = files.select(
        "id",
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        n_imports.alias("n_imports"),
    )
    lang_c = F.col("lang")

    def _import_line(i: Column) -> Column:
        target = repo_name(_zipf_idx(_u01(F.col("id"), F.lit("imp"), i, s), n_repos))
        return (
            F.when(lang_c == "python", F.concat(F.lit("import "), target))
            .when(lang_c == "java", F.concat(F.lit("import "), target, F.lit(".pkg.Cls;")))
            .otherwise(F.concat(F.lit("const dep = require('"), target, F.lit("');")))
        )

    import_block = F.array_join(
        F.transform(F.sequence(F.lit(1), F.col("n_imports")), _import_line), "\n"
    )
    header = (
        F.when(lang_c == "python", F.lit('"""module docstring — not an import repo_zzz."""'))
        .when(lang_c == "java", F.concat(F.lit("package "), F.col("repo"), F.lit(".pkg; // header")))
        .otherwise(F.lit("// module header: mentions require but not a call"))
    )
    filler = F.format_string(
        "var_%d = %d  # filler: the word import appears in this comment",
        F.pmod(F.xxhash64("id", F.lit("f1"), s), F.lit(1000)).cast("int"),
        F.pmod(F.xxhash64("id", F.lit("f2"), s), F.lit(1000)).cast("int"),
    )
    body = (
        F.when(lang_c == "java", F.lit("public class Cls { /* body */ }"))
        .when(lang_c == "python", F.lit("def fn():\n    return 1"))
        .otherwise(F.lit("function fn() { return 1; }"))
    )
    content = F.concat_ws("\n", header, import_block, filler, body)

    return base.select(
        "repo",
        "path",
        "commit",
        "lang",
        content.alias("content"),
    ).withColumn("sha256", F.sha2(F.col("content"), 256))


def repo_table(spark: SparkSession, n_repos: int) -> DataFrame:
    """Dimension table of all repos with stable 64-bit vertex ids.

    Vertex identity is value-based in the reference (PVector-keyed maps,
    PGS_Conversion.java:1070-1085); here value-keys become stable 64-bit ids
    via xxhash64 over the repo name.
    """
    return (
        spark.range(0, n_repos)
        .select(repo_name(F.col("id")).alias("repo"))
        .withColumn("repo_id", F.xxhash64("repo"))
    )
