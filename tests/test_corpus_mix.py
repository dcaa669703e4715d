"""stratified_sample / span_dedup / dsir_weights — known-answer fixtures and
invariants (the FIXTURES.md discipline: tiny hand-built inputs, exact
expectations)."""

import math

import pytest
from pyspark.sql import functions as F

from pgs_spark.operators.corpus import dsir_weights, span_dedup, stratified_sample


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---------------------------------------------------------------- sampling

def _skewed_docs(spark, n_big=80, n_small=20):
    rows = [(i, f"doc {i}", "en") for i in range(n_big)]
    rows += [(1000 + i, f"doc {1000 + i}", "fr") for i in range(n_small)]
    return docs_df(spark, rows)


def test_stratified_sample_uniform_rebalances(spark):
    got = {
        r.stratum: r
        for r in stratified_sample(_skewed_docs(spark)).collect()
    }
    # uniform target: 100 docs / 2 strata = 50 per stratum
    assert math.isclose(got["en"].rate_r, 50 / 80, abs_tol=1e-6)
    assert got["fr"].rate_r == 1.0  # under target -> keep all
    assert got["fr"].n_kept == 20
    # md5-uniform keep: expected 50, binomial sd ~4.9 — allow 4 sd
    assert abs(got["en"].n_kept - 50) < 20
    assert got["en"].n_docs == 80


def test_stratified_sample_is_deterministic(spark):
    d = _skewed_docs(spark)
    a = sorted(stratified_sample(d).collect())
    b = sorted(stratified_sample(d).collect())
    assert a == b


def test_stratified_sample_explicit_shares(spark):
    got = {
        r.stratum: r
        for r in stratified_sample(
            _skewed_docs(spark), shares={"en": 0.1, "fr": 0.9}
        ).collect()
    }
    # en target 10 of 100 docs from 80 -> rate 0.125; fr target 90 from 20 -> capped 1.0
    assert math.isclose(got["en"].rate_r, 0.125, abs_tol=1e-6)
    assert got["fr"].rate_r == 1.0


# ---------------------------------------------------------------- span dedup

def test_span_dedup_known_answer(spark):
    shared = "alpha beta gamma delta epsilon"  # one 5-token span
    d = docs_df(
        spark,
        [
            (1, shared + " zeta", "en"),  # 2 spans: [0:5] shared, [1:6] unique
            (2, "x " + shared, "en"),  # 2 spans: [1:6] shared, [0:5] unique
            (3, "one two three four five six", "en"),  # 2 spans, none shared
        ],
    )
    got = {r.doc_id: r for r in span_dedup(d, k=5).collect()}
    assert got[1].n_spans == 2 and got[1].n_dup_spans == 1
    assert math.isclose(got[1].dup_ratio_r, 0.5, abs_tol=1e-6)
    assert got[2].n_dup_spans == 1
    assert got[3].n_dup_spans == 0 and got[3].dup_ratio_r == 0.0


def test_span_dedup_within_doc_repeat_is_not_duplication(spark):
    # the same span twice in ONE doc: df(doc)=1 -> not a duplicate
    d = docs_df(spark, [(1, "a b c d e x a b c d e", "en")])
    got = span_dedup(d, k=5).collect()[0]
    assert got.n_dup_spans == 0


def test_span_dedup_short_docs_drop_out(spark):
    d = docs_df(spark, [(1, "only four tokens here", "en")])
    assert span_dedup(d, k=5).count() == 0


# ---------------------------------------------------------------- dsir

def test_dsir_weights_prefers_target_like_docs(spark):
    # target slice = doc_id % 7 == 0 -> docs 0, 7 are target
    target_text = "quality quality quality signal signal"
    noise_text = "junk junk junk junk spam spam"
    d = docs_df(
        spark,
        [
            (0, target_text, "en"),
            (7, target_text, "en"),
            (1, target_text, "en"),  # raw doc that LOOKS like target
            (2, noise_text, "en"),  # raw doc that does not
            (3, noise_text, "en"),
        ],
    )
    got = {r.doc_id: r for r in dsir_weights(d, n_buckets=64).collect()}
    assert set(got) == {1, 2, 3}  # only raw docs scored
    assert got[1].weight_r > got[2].weight_r
    assert got[2].weight_r == got[3].weight_r  # identical docs, identical score
    assert got[1].n_tokens == 5


def test_dsir_weights_empty_target_slice_still_scores(spark):
    # no doc_id % 7 == 0 docs: target counts all zero -> pure smoothing,
    # weights finite and defined
    d = docs_df(spark, [(1, "a b c", "en"), (2, "d e f", "en")])
    got = dsir_weights(d, n_buckets=16).collect()
    assert len(got) == 2
    assert all(math.isfinite(r.weight_r) for r in got)


# ---------------------------------------------------------------- tf-idf

def test_tfidf_top_terms_known_answer(spark):
    from pgs_spark.operators.corpus import tfidf_top_terms

    d = docs_df(
        spark,
        [
            (1, "apple apple banana common common", "en"),
            (2, "cherry common common", "en"),
            (3, "banana cherry common", "en"),
        ],
    )
    got = tfidf_top_terms(d, top_k=2).toPandas()
    top1 = {
        int(r.doc_id): r.term for r in got[got.term_rank == 1].itertuples()
    }
    # 'common' appears in all docs -> idf = ln(1) = 0; rarer terms win
    assert top1[1] == "apple"  # tf=2, df=1
    assert top1[2] == "cherry"  # df=2 beats common's df=3
    assert (got.groupby("doc_id").size() == 2).all()


def test_tfidf_ubiquitous_term_scores_zero(spark):
    import math as _math

    from pgs_spark.operators.corpus import tfidf_top_terms

    d = docs_df(spark, [(1, "x y", "en"), (2, "x z", "en")])
    got = {
        (int(r.doc_id), r.term): float(r.tfidf_r)
        for r in tfidf_top_terms(d, top_k=2).collect()
    }
    assert got[(1, "x")] == 0.0  # df == N
    assert _math.isclose(got[(1, "y")], _math.log(2.0), abs_tol=1e-6)


# ---------------------------------------------------------------- count-min

def test_cms_estimate_dominates_truth_and_is_tight_when_sparse(spark):
    from pgs_spark.operators.corpus import cms_token_counts

    d = docs_df(
        spark,
        [
            (1, "heavy heavy heavy heavy light rare", "en"),
            (2, "heavy heavy light light other words here", "en"),
        ],
    )
    got = {r.term: r for r in cms_token_counts(d, depth=4, width=64, top_k=10).collect()}
    assert got["heavy"].true_count == 6
    for r in got.values():
        assert r.cms_estimate >= r.true_count  # one-sided CMS guarantee
    # 9 distinct tokens over 4x64 buckets: collisions are possible but the
    # MIN over 4 independent rows must stay tight for the heavy hitter
    assert got["heavy"].cms_estimate == 6


def test_cms_is_deterministic(spark):
    from pgs_spark.operators.corpus import cms_token_counts

    d = docs_df(spark, [(i, f"tok{i % 5} tok{i % 3} common", "en") for i in range(20)])
    a = sorted(map(tuple, cms_token_counts(d).collect()))
    b = sorted(map(tuple, cms_token_counts(d).collect()))
    assert a == b


# ---------------------------------------------------------------- funnel

def test_funnel_known_answer(spark):
    from datetime import datetime

    from pgs_spark.operators.corpus import funnel_counts

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # user 1 completes the funnel in order
        (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        # user 2 clicks BEFORE viewing -> stops at stage 1
        (2, "click", t(1)), (2, "view", t(2)),
        # user 3 views+clicks, purchase same instant as click -> strict > drops it
        (3, "view", t(1)), (3, "click", t(2)), (3, "purchase", t(2)),
        # user 4 never views
        (4, "click", t(1)), (4, "purchase", t(2)),
    ]
    e = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r.stage: r.n_users for r in funnel_counts(e).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


# ---------------------------------------------------------------- HLL

def test_hll_distinct_tokens_accuracy_and_determinism(spark):
    from pgs_spark.operators.corpus import hll_distinct_tokens

    rows = [(i, " ".join(f"w{j}" for j in range(i * 10, i * 10 + 10)), "en") for i in range(20)]
    rows += [(100 + i, "a b c a b c", "fr") for i in range(5)]
    d = docs_df(spark, rows)
    got = {r.lang: r for r in hll_distinct_tokens(d).collect()}
    assert got["en"].n_tokens == 200
    # 200 distinct tokens, m=16 HLL: documented ~26% RSE -> generous band
    assert 100 <= got["en"].distinct_est_r <= 400
    assert got["fr"].n_tokens == 30
    a = sorted(map(tuple, hll_distinct_tokens(d).collect()))
    b = sorted(map(tuple, hll_distinct_tokens(d).collect()))
    assert a == b
