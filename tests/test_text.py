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
