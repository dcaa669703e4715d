"""Sequence packing — concat-and-chunk a corpus into fixed training windows.

The canonical pretraining data op this engine's corpus pipeline (dedup →
quality filter → stats, __spark_entry__.corpus_clean) feeds into: documents
are concatenated in a deterministic shard order and sliced into fixed
`capacity`-token context windows, documents spanning chunk boundaries
(GPT-style packing — no padding waste; the pack-without-splitting variant
is NOT SQL-replayable because first-fit carries unbounded sequential state,
and at trillion-token scale nobody runs it anyway).

Output maps every document to its token interval and chunk span:

    (doc_id, shard, n_tokens, start_off, first_chunk, last_chunk)

where offsets are per-shard token positions and chunk ids are global
(shard * 2^40 + local chunk — shard-disjoint by construction).

Distributed shape: ONE window cumsum per shard partition — the shard key is
a content hash (md5, the engine's seeded-sampler idiom, q_hash_sample), so
shards are balanced and the window never sees a global sort. At 100 TB the
shard count scales with the cluster (n_shards parameter); each shard's
cumsum is a single partition-local pass, the same plan Spark uses for
sessionization. All arithmetic is integer — cross-engine exact.
Oracle: plans/docs_sql.pack_chunks_sql (identical window program).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pgs_spark.functions.text import token_count

#: chunk-id stride keeping (shard, local_chunk) collision-free in one int64
CHUNK_STRIDE = 1 << 40


def pack_chunks(
    docs: DataFrame,
    capacity: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each doc its token span in the concat-and-chunk packing.

    Shard = first 16 bits of md5(doc_id || '|p42') mod n_shards; order
    within shard = (md5 hex, doc_id) — fully deterministic, content-keyed,
    reproducible in ANSI SQL. first/last_chunk are the global ids of the
    capacity-token windows the doc's span [start_off, start_off+n) touches.
    Empty docs (0 tokens after trim) are dropped — they occupy no span."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|p42")))
    shard = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_shards).cast("int")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        shard.alias("shard"),
        h.alias("_h"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        F.trim(F.col(text_col)).alias("_t"),
    ).filter(F.length("_t") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("start_off")
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        start,
        (
            F.col("shard").cast("long") * CHUNK_STRIDE
            + F.floor((cum - F.col("n_tokens")) / capacity)
        ).alias("first_chunk"),
        (
            F.col("shard").cast("long") * CHUNK_STRIDE
            + F.floor((cum - 1) / capacity)
        ).alias("last_chunk"),
    )
