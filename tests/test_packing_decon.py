"""Sequence packing + decontamination: Python replicas and invariants."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pgs_spark.operators.corpus import decontaminate
from pgs_spark.operators.packing import CHUNK_STRIDE, pack_chunks


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _md5(doc_id):
    return hashlib.md5(f"{doc_id}|p42".encode()).hexdigest()


def ref_pack(rows, capacity, n_shards):
    out = {}
    shards: dict = {}
    for doc_id, text in rows:
        if not text.strip():
            continue
        h = _md5(doc_id)
        shards.setdefault(int(h[:4], 16) % n_shards, []).append((h, doc_id, text))
    for shard, docs in shards.items():
        cum = 0
        for h, doc_id, text in sorted(docs):
            n = len(text.strip().split())
            out[doc_id] = (
                shard,
                n,
                cum,
                shard * CHUNK_STRIDE + cum // capacity,
                shard * CHUNK_STRIDE + (cum + n - 1) // capacity,
            )
            cum += n
    return out


def test_pack_matches_python_replica(spark):
    rows = [(i, " ".join(f"w{i}t{j}" for j in range(1 + (i * 7) % 13))) for i in range(60)]
    rows.append((99, "   "))  # whitespace-only doc: dropped
    got = {
        r["doc_id"]: (
            r["shard"],
            r["n_tokens"],
            r["start_off"],
            r["first_chunk"],
            r["last_chunk"],
        )
        for r in pack_chunks(docs_df(spark, rows), capacity=16, n_shards=4).collect()
    }
    assert got == ref_pack(rows, 16, 4)
    assert 99 not in got


def test_pack_spans_partition_each_shard(spark):
    rows = [(i, " ".join(["x"] * (1 + i % 5))) for i in range(40)]
    df = pack_chunks(docs_df(spark, rows), capacity=8, n_shards=2)
    per_shard = (
        df.groupBy("shard")
        .agg(
            F.sum("n_tokens").alias("tot"),
            F.max(F.col("start_off") + F.col("n_tokens")).alias("end"),
            F.min("start_off").alias("lo"),
        )
        .collect()
    )
    for r in per_shard:  # contiguous: spans tile [0, total) with no gaps
        assert r["lo"] == 0 and r["end"] == r["tot"]
    bad = df.filter(F.col("first_chunk") > F.col("last_chunk")).count()
    assert bad == 0


def ref_decon(rows, k, eval_mod, threshold=1):
    def grams(text):
        w = text.strip().split()
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    ev = set()
    for doc_id, text in rows:
        if doc_id % eval_mod == 0:
            ev |= grams(text)
    out = {}
    for doc_id, text in rows:
        if doc_id % eval_mod == 0:
            continue
        g = grams(text)
        if not g:
            continue
        hit = len(g & ev)
        out[doc_id] = (len(g), hit, 1 if hit >= threshold else 0)
    return out


def test_decontaminate_planted_overlap(spark):
    leak = "alpha beta gamma delta epsilon"
    rows = [
        (0, f"eval doc with the secret {leak} inside it"),  # eval slice (0 % 3 == 0)
        (1, f"train doc leaking {leak} verbatim here"),
        (2, "a completely clean training document with unique words only"),
        (3, "another eval doc nothing shared"),  # eval slice
        (4, "short"),  # < k tokens: no shingles, drops out
    ]
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hit"], r["contaminated"])
        for r in decontaminate(docs_df(spark, rows), k=5, eval_mod=3).collect()
    }
    ref = ref_decon(rows, 5, 3)
    assert got == ref
    assert got[1][2] == 1 and got[2][2] == 0
    assert 4 not in got and 0 not in got and 3 not in got


@pytest.mark.parametrize("k,mod", [(3, 5), (5, 7)])
def test_decontaminate_matches_replica_random(spark, k, mod):
    import random

    rng = random.Random(k * 100 + mod)
    vocab = [f"v{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20))))
        for i in range(50)
    ]
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hit"], r["contaminated"])
        for r in decontaminate(docs_df(spark, rows), k=k, eval_mod=mod).collect()
    }
    assert got == ref_decon(rows, k, mod)
