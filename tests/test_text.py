"""Text-analysis column expressions: known-answer tests."""

from pyspark.sql import functions as F

from pgs_spark.functions import text as tx


def _one(spark, s, expr):
    return (
        spark.createDataFrame([(s,)], "text string")
        .select(expr(F.col("text")).alias("v"))
        .first()["v"]
    )


def test_token_count(spark):
    assert _one(spark, "a b  c", tx.token_count) == 3
    assert _one(spark, "  leading and trailing  ", tx.token_count) == 3


def test_stopword_ratio(spark):
    assert _one(spark, "the cat sat on a mat", tx.stopword_ratio) == 3 / 6


def test_alpha_ratio(spark):
    assert _one(spark, "ab12", tx.alpha_ratio) == 0.5


def test_lang_guess(spark):
    assert _one(spark, "the quick brown fox is in the barn", tx.lang_guess) == "en"
    assert _one(spark, "xyzzy plugh frobozz", tx.lang_guess) == "unknown"


def test_shingles(spark):
    got = _one(spark, "a b c d", lambda c: tx.shingles(c, 3))
    assert got == ["a b c", "b c d"]
    assert _one(spark, "a b", lambda c: tx.shingles(c, 3)) == []


def test_quality_score_bounds(spark):
    good = _one(spark, "the cat sat on a mat in the warm sun", tx.quality_score)
    bad = _one(spark, "@@@@ #### $$$$ 1234 %%%%", tx.quality_score)
    assert 0.0 <= bad < good <= 1.0


def test_fingerprints_deterministic_subset(spark):
    s = "one two three four five six seven eight nine ten"
    a = _one(spark, s, tx.fingerprints)
    b = _one(spark, s, tx.fingerprints)
    assert a == b
    all_hashes = _one(spark, s, lambda c: F.transform(tx.shingles(c), lambda x: F.md5(x)))
    assert set(a) <= set(all_hashes)
    assert all(h[-1] in "048c" for h in a)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_lm_score_invariants(spark, tmp_path, monkeypatch):
    """avg ln p(w2|w1) is ≤ 0 (probabilities ≤ 1) and exactly 0 for a corpus
    whose every bigram is deterministic (one continuation per w1)."""
    import __spark_entry__ as se

    texts = ["a b c a b c", "x y x y"]
    monkeypatch.setattr(
        se, "load_table", lambda sp, sf, name: _docs_df(sp, texts)
    )
    rows = {r["doc_id"]: r for r in se.q_lm_score(spark, "ignored").collect()}
    # every w1 has exactly one continuation → p = c(g)/c(w1·) = 1 → ln = 0
    # except 'c a' vs 'c' must also be deterministic: c appears twice, once
    # doc-final — bigrams from doc 0: a b, b c, c a, a b, b c → c→a only. OK.
    assert rows[0]["avg_logp"] == 0.0
    assert rows[1]["avg_logp"] == 0.0
    assert rows[0]["n_bigrams"] == 5
    assert rows[1]["n_bigrams"] == 3


def test_lm_score_prefers_predictable(spark, monkeypatch):
    import __spark_entry__ as se

    texts = ["p q p q p q", "p q p r p s"]  # doc 1's p→{q,r,s} is uncertain
    monkeypatch.setattr(se, "load_table", lambda sp, sf, name: _docs_df(sp, texts))
    rows = {r["doc_id"]: r["avg_logp"] for r in se.q_lm_score(spark, "x").collect()}
    assert rows[0] > rows[1]


def test_ngram_novelty_planted_dup(spark, monkeypatch):
    import __spark_entry__ as se

    shared = "alpha beta gamma delta"  # one full 4-gram, shared by docs 0,1
    texts = [shared, shared + " extra", "unrelated words only here now"]
    monkeypatch.setattr(se, "load_table", lambda sp, sf, name: _docs_df(sp, texts))
    rows = {r["doc_id"]: r for r in se.q_ngram_novelty(spark, "x").collect()}
    assert rows[0]["dup_frac"] == 1.0  # its single 4-gram appears in doc 1
    assert rows[2]["dup_frac"] == 0.0
    assert 0.0 < rows[1]["dup_frac"] < 1.0  # 1 of its 2 shingles is shared
