"""Dedup + similarity operators: known-answer unit tests (SURVEY §5.1)."""

import pytest
from pyspark.sql import functions as F

from pgs_spark.operators.dedup import (
    exact_dedup,
    minhash_candidates,
    ngram_jaccard,
    simhash16,
)
from pgs_spark.operators.similarity import (
    cosine_topk,
    dot,
    lsh_buckets,
    lsh_candidate_pairs,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup
    (4, "completely different words about spark distributed graph processing engines"),
    (5, "tiny doc"),  # < 3 tokens after shingling? 2 tokens → no shingles
]


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string").persist()
    df.count()
    return df


def test_exact_dedup(spark, docs):
    got = {r["doc_id"]: r["keep_id"] for r in exact_dedup(docs).collect()}
    assert got == {1: 1, 2: 1, 3: 3, 4: 4, 5: 5}


def test_hot_bucket_capping_star_links(spark):
    """A bucket above the cap must emit a star on the bucket min (O(m) rows),
    not all pairs (O(m²)); small buckets keep exact all-pairs; stats surface
    the capping (no silent caps)."""
    from pgs_spark.operators.dedup import capped_bucket_pairs

    rows = [(0, i) for i in range(10)] + [(1, 100), (1, 101), (1, 102)]
    items = spark.createDataFrame(rows, "bucket int, id long")
    stats: dict = {}
    pairs = {
        (r["a"], r["b"])
        for r in capped_bucket_pairs(items, ["bucket"], "id", 4, stats).collect()
    }
    star = {(0, i) for i in range(1, 10)}           # hot bucket 0 → star on id 0
    allp = {(100, 101), (100, 102), (101, 102)}     # cold bucket 1 → all pairs
    assert pairs == star | allp
    assert stats == {"n_hot_buckets": 1, "n_rows_in_hot_buckets": 10, "max_bucket": 4}


def test_minhash_finds_near_dups(spark, docs):
    pairs = {(r["a"], r["b"]) for r in minhash_candidates(docs).collect()}
    assert (1, 2) in pairs  # identical docs always collide in every band
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup shares most shingles
    assert all(4 not in p for p in pairs)  # unrelated doc never pairs


def test_ngram_jaccard_values(spark, docs):
    pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "a long, b long")
    got = {(r["a"], r["b"]): r["jac"] for r in ngram_jaccard(docs, pairs).collect()}
    assert got[(1, 2)] == 1.0
    assert 0.3 < got[(1, 3)] < 1.0
    assert got[(1, 4)] == 0.0


def test_simhash_identical_and_different(spark, docs):
    got = {r["id"]: r["simhash"] for r in simhash16(docs).collect()}
    assert got[1] == got[2]
    assert 0 <= got[1] < 2**16
    assert got[1] != got[4]  # different token sets → different fingerprint


def test_simhash64_width_and_hamming(spark, docs):
    from pgs_spark.operators.dedup import simhash64, simhash_candidates

    got = {r["id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert all(len(h) == 16 and set(h) <= set("0123456789abcdef") for h in got.values())
    assert got[1] == got[2]  # identical docs → identical 64-bit fingerprint
    ham = lambda a, b: sum(  # noqa: E731
        bin(int(x, 16) ^ int(y, 16)).count("1") for x, y in zip(a, b)
    )
    assert ham(got[1], got[3]) < ham(got[1], got[4])  # near-dup closer than unrelated
    pairs = {(r["a"], r["b"]) for r in simhash_candidates(docs).collect()}
    assert (1, 2) in pairs  # exact dups always share every band


def test_cosine_topk_normalized(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),   # identical to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal
        (3, [0.6, 0.8, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=3)
    ranked = [(r["neighbor_id"], r["sim"]) for r in got.orderBy("rnk").collect()]
    assert ranked[0] == (1, 1.0)
    assert ranked[1] == (3, 0.6)
    assert ranked[2] == (2, 0.0)


def test_dot_product_exact(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    assert df.select(dot(F.col("a"), F.col("b")).alias("d")).first()["d"] == 32.0


def test_lsh_buckets_identical_vectors_collide(spark):
    rows = [(0, [1.0] * 64), (1, [1.0] * 64), (2, [(-1.0) ** i for i in range(64)])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b = {r["id"]: r["bucket"] for r in lsh_buckets(emb, n_planes=8, dim=64).collect()}
    assert b[0] == b[1]
    pairs = {
        (r["a"], r["b"])
        for r in lsh_candidate_pairs(lsh_buckets(emb, n_planes=8, dim=64)).collect()
    }
    assert (0, 1) in pairs


def test_lsh_deterministic_across_sessions(spark):
    from pgs_spark.operators.similarity import hyperplanes

    assert hyperplanes(2, 4, seed=42) == hyperplanes(2, 4, seed=42)
    assert hyperplanes(2, 4, seed=42) != hyperplanes(2, 4, seed=43)


def test_dedup_keep_list_end_to_end(spark, docs):
    """Keep-list composition (stochasticMerge pipeline, PGS_Meshing.java:727-738
    applied to dedup): exact dup 2→1, near-dup 3 clusters with 1 (Jaccard of
    the 13-shingle docs differing in one trailing word = 12/14 ≈ 0.857 ≥ 0.8),
    4 and 5 keep themselves."""
    from pgs_spark.operators.dedup import dedup_keep_list

    got = {r["doc_id"]: r["keep_id"] for r in dedup_keep_list(spark, docs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}


def test_kmeans_deep_iterations_keep_all_rows(spark):
    """Round-4 regression: the two-pass float-equality argmin dropped rows
    under lazy re-evaluation (assignment EMPTY by iteration 5). The one-pass
    struct-min must keep every vector assigned at any iteration depth."""
    from pgs_spark.operators.kmeans import kmeans_fit
    from pgs_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    n = emb.count()
    assign, cent = kmeans_fit(emb, k=8, iterations=5)
    assert assign.count() == n
    a_labels = {r["cluster"] for r in assign.select("cluster").distinct().collect()}
    c_labels = {r["c"] for r in cent.select("c").distinct().collect()}
    assert a_labels == c_labels  # centroids exactly cover assignment labels


def test_embedding_neardup_clones_collapse_far_blends_survive(spark):
    """Embedding-cosine near-dup keep-list: an exact clone of v and a
    slightly-perturbed copy must resolve to v's id; an unrelated unit
    vector keeps itself. τ=0.99 on unit vectors, dot == cosine."""
    import math

    from pgs_spark.operators.similarity import embedding_neardup

    d = 8
    e1 = [1.0] + [0.0] * (d - 1)
    e2 = [0.0, 1.0] + [0.0] * (d - 2)
    # perturbed copy of e1: cos = 0.999 (above τ); e2 is orthogonal (below)
    c = 0.999
    perturbed = [c] + [math.sqrt(1 - c * c)] + [0.0] * (d - 2)
    rows = [(0, e1), (1, e1), (2, perturbed), (3, e2)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["keep_id"]
        for r in embedding_neardup(spark, emb, tau=0.99, dim=d).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3}
