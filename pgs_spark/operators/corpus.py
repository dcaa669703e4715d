"""Corpus-level quality signals over a documents table.

The per-document scalar signals live in functions/text.py (pure column
exprs); these two need CORPUS-WIDE statistics — an n-gram count table the
documents are then scored against — so they are operators (joins +
aggregations), not column functions. Both are strict aggregation pipelines:
explode n-grams → count by key (map-side combinable) → join instances back →
per-doc aggregate. Nothing is ever all-pairs, and the count tables shuffle
on the n-gram key where partial aggregation absorbs hot n-grams, so the
shape survives a 100-TB corpus unchanged.

Oracles: plans/docs_sql.lm_score_sql / ngram_novelty_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgs_spark.functions.text import shingles_from_tokens, tokens


def lm_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_bigrams, avg_logp): per-doc average ln p(w2|w1) under the
    corpus-wide MLE bigram model — the CCNet-style fluency signal. p is
    c(w1 w2)/c(w1 ·) with c(w1 ·) counting bigram INSTANCES starting with
    w1, so every probability is a ratio of exact integers; ln() is the only
    libm call and the 6dp round after the average buries its 1-ulp
    cross-engine slack. Docs with < 2 tokens have no bigrams and drop out."""
    bi = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_w"))
        .select("doc_id", F.explode(shingles_from_tokens(F.col("_w"), 2)).alias("g"))
        .withColumn("w1", F.substring_index("g", " ", 1))
        .persist()
    )
    cg = bi.groupBy("g").agg(F.count("*").alias("cg"))
    cw = bi.groupBy("w1").agg(F.count("*").alias("cw"))
    out = (
        bi.join(cg, "g")
        .join(cw, "w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(F.log(F.col("cg").cast("double") / F.col("cw").cast("double"))), 6
            ).alias("avg_logp"),
        )
    )
    return out


def ngram_novelty(
    docs: DataFrame, k: int = 4, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_shingles, dup_frac): fraction of each doc's DISTINCT
    k-shingles occurring in at least one OTHER document (df ≥ 2) — the
    RefinedWeb/Dolma-style duplication signal one step below full near-dup
    clustering. Exact integer ratio, single division — cross-engine exact.
    Docs shorter than k tokens have no shingles and drop out."""
    sh = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_w"))
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles_from_tokens(F.col("_w"), k))).alias("g"),
        )
        .persist()
    )
    df_tab = sh.groupBy("g").agg(F.count("*").alias("df"))
    return (
        sh.join(df_tab, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.round(
                F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


def decontaminate(
    docs: DataFrame,
    k: int = 5,
    eval_mod: int = 41,
    threshold: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C discipline): flag
    training documents sharing any k-gram with a held-out eval set.

    The eval set is the deterministic slice doc_id % eval_mod == 0 (standing
    in for an external benchmark table — same join shape either way); every
    OTHER doc is scored: (doc_id, n_shingles, n_hit, contaminated) where
    n_hit counts its DISTINCT k-shingles that appear anywhere in the eval
    set and contaminated = 1 when n_hit >= threshold.

    Scale shape: the eval side collapses to a DISTINCT k-gram key table —
    benchmarks are tiny relative to a training corpus, so on a cluster this
    side broadcasts and the training-side explode never reshuffles; here it
    is an ordinary equi-join the optimizer is free to broadcast. Exact
    integer output — cross-engine exact. Oracle:
    plans/docs_sql.decontaminate_sql.
    """
    sh = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_w"))
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles_from_tokens(F.col("_w"), k))).alias("g"),
        )
    )
    eval_grams = (
        sh.filter(F.col("doc_id") % eval_mod == 0).select("g").distinct()
        .withColumn("_hit", F.lit(1))
    )
    train = sh.filter(F.col("doc_id") % eval_mod != 0)
    return (
        train.join(eval_grams, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_hit",
            F.when(F.col("n_hit") >= threshold, F.lit(1)).otherwise(F.lit(0)).alias(
                "contaminated"
            ),
        )
    )
