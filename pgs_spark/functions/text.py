"""Text-analysis column expressions for large-scale corpus pipelines.

These are the scalar-function analog of the reference's per-row morphology
layer (PGS_Morphology.java:74-914 — 30 deterministic per-row transforms): all
built-in JVM-side column expressions (whole-stage codegen), zero Python in the
hot path. Each expression has a documented DuckDB-SQL equivalent so every
operator stays oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords for the n-gram-free language heuristic + quality scoring.
# (The testdata corpus is synthetic word salad; markers chosen from real
# function words so the heuristic is meaningful on real text too.)
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization. SQL: string_split_regex(trim(text), '\\s+')."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are marker stopwords.

    SQL: len(list_filter(toks, x -> x IN (...))) / len(toks)."""
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS)))
    return hits.cast("double") / F.size(toks).cast("double")


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ascii letters or space.

    SQL: len(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) / len(text)."""
    kept = F.length(F.regexp_replace(text, "[^a-zA-Z ]", ""))
    return kept.cast("double") / F.length(text).cast("double")


def mean_token_len(text: Column) -> Column:
    """Average token length: (chars - spaces) / tokens, on trimmed text."""
    t = F.trim(text)
    nonspace = F.length(F.regexp_replace(t, r"\s", ""))
    return nonspace.cast("double") / F.size(tokens(text)).cast("double")


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]-ish: rewards natural stopword
    density, plausible word lengths, and alphabetic content; punishes
    extremes. Deterministic closed form (oracle-checkable)."""
    sw = stopword_ratio(text)
    ar = alpha_ratio(text)
    mtl = mean_token_len(text)
    len_ok = F.when((mtl >= 2.0) & (mtl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round(
        F.lit(0.4) * ar + F.lit(0.4) * F.least(sw * 4.0, F.lit(1.0)) + F.lit(0.2) * len_ok, 6
    )


def lang_guess(text: Column) -> Column:
    """Stopword-marker language ID: 'en' when English function words exceed
    5% of tokens, else 'unknown'. (Real deployments plug per-language marker
    sets into the same expression shape.)"""
    return F.when(stopword_ratio(text) > 0.05, F.lit("en")).otherwise(F.lit("unknown"))


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-word shingles from an ALREADY-PROJECTED token-array column.

    Callers on the hot path must materialize the token array in its own
    projection first (``df.select(tokens(text).alias("_w")).select(
    shingles_from_tokens(col("_w")))``): referencing ``tokens(text)``
    inline re-evaluates the regex split inside the higher-order lambda for
    every element access — measured 8-16× slower on the sf0.1 signature
    build (8.6s → 0.5s for the shingle explode). Catalyst deliberately does
    NOT collapse the two projections because inlining would duplicate the
    non-cheap split expression."""
    n = F.size(toks)
    return F.when(n < k, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
            ),
        )
    )


def shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles joined by single spaces.

    SQL mirror uses the same construction over string_split_regex + list
    slicing; both sides produce identical shingle strings. Hot paths should
    use `shingles_from_tokens` over a pre-projected token column — see its
    docstring for the measured inline-re-evaluation hazard."""
    return shingles_from_tokens(tokens(text), k)


def fingerprints(text: Column, k: int = 3, sample_hex: tuple[str, ...] = ("0", "4", "8", "c")) -> Column:
    """Winnowing-lite document fingerprints: md5 each k-shingle, keep hashes
    whose last hex digit falls in `sample_hex` (deterministic ~25% mod-p
    sampling — the content-defined sampling used by MOSS-style fingerprinting).
    Returns array<string> of selected hashes."""
    hs = F.transform(shingles(text, k), lambda s: F.md5(s))
    return F.filter(hs, lambda h: F.substring(h, 32, 1).isin(list(sample_hex)))


def fingerprints_from_tokens(
    toks: Column, k: int = 3, sample_hex: tuple[str, ...] = ("0", "4", "8", "c")
) -> Column:
    """`fingerprints` over a pre-projected token-array column (hot-path
    variant — same two-step rationale as shingles_from_tokens)."""
    hs = F.transform(shingles_from_tokens(toks, k), lambda s: F.md5(s))
    return F.filter(hs, lambda h: F.substring(h, 32, 1).isin(list(sample_hex)))
