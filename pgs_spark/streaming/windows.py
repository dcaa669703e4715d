"""Structured Streaming windowed aggregation over the events table.

The reference has no streaming surface (SURVEY §2.10); the engine adds the
standard Spark shape: ``readStream`` over the same parquet the batch queries
use → event-time watermark → tumbling-window aggregate → ``availableNow``
trigger draining to an in-memory sink. ``availableNow`` processes exactly the
data present at start and terminates — which makes the streaming pipeline
DETERMINISTIC on static input and therefore oracle-checkable: a tumbling
window is floor-bucketing on event time, so DuckDB reproduces it with integer
arithmetic (no late rows exist to drop, so the watermark does not change the
result — it exercises the state-eviction plumbing only).

At scale this same topology runs unbounded (file/Kafka source, sliding
trigger); state per window×type is tiny and evicted by the watermark.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    spark: SparkSession,
    events_parquet: str,
    window: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Run the streaming pipeline to completion (availableNow) and return the
    finished result as a batch DataFrame (window_start_us, event_type, n)."""
    import os

    batch_schema = spark.read.parquet(events_parquet).schema
    # the streaming file source requires a DIRECTORY; the testdata tables are
    # single files, so stream the parent dir filtered to this table's file(s)
    if os.path.isdir(events_parquet):
        reader = spark.readStream.schema(batch_schema)
        src = events_parquet
    else:
        reader = spark.readStream.schema(batch_schema).option(
            "pathGlobFilter", os.path.basename(events_parquet)
        )
        src = os.path.dirname(events_parquet)
    stream = (
        reader.parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    agg = (
        stream.groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n",
        )
    )
    name = f"win_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="pgs_stream_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_dedup_keep(
    spark: SparkSession, docs_parquet: str
) -> DataFrame:
    """STREAMING exact dedup: readStream over the documents parquet →
    content hash → stateful ``groupBy(hash).agg(min(doc_id))`` →
    availableNow drain. Returns the final (hh, keep_id) table.

    min() is order-insensitive, so the result is deterministic regardless
    of file-split arrival order and equals the batch twin
    ``SELECT sha256(text), MIN(doc_id) GROUP BY 1`` exactly — the oracle.

    At scale: state is one row per DISTINCT content hash. The unbounded
    deployment runs this in update mode with a foreachBatch upsert into the
    keep-list store (streaming/foreach_sink.py shape) so only changed hashes
    flow per trigger; complete-mode-to-memory here is the test-scale drain
    that keeps the query oracle-checkable."""
    import os

    batch_schema = spark.read.parquet(docs_parquet).schema
    if os.path.isdir(docs_parquet):
        reader = spark.readStream.schema(batch_schema)
        src = docs_parquet
    else:
        reader = spark.readStream.schema(batch_schema).option(
            "pathGlobFilter", os.path.basename(docs_parquet)
        )
        src = os.path.dirname(docs_parquet)
    agg = (
        reader.parquet(src)
        .select(F.sha2(F.col("text"), 256).alias("hh"), "doc_id")
        .groupBy("hh")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="pgs_stream_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_quality_census(
    spark: SparkSession, docs_parquet: str
) -> DataFrame:
    """STREAMING per-language corpus census: readStream over the documents
    parquet → quality/token column exprs (functions/text.py, same columns
    the batch pipeline computes) → stateful groupBy(lang) with
    order-insensitive aggregates (COUNT + integer SUMs) → availableNow
    drain. Deterministic under any file-split arrival order, so it equals
    the batch GROUP BY twin exactly — the oracle.

    This is corpus_clean's monitoring face: the unbounded deployment runs
    it in update mode behind a foreachBatch upsert (state = one row per
    language); complete-mode-to-memory is the test-scale drain."""
    import os

    from pgs_spark.functions import text as tx

    batch_schema = spark.read.parquet(docs_parquet).schema
    if os.path.isdir(docs_parquet):
        reader = spark.readStream.schema(batch_schema)
        src = docs_parquet
    else:
        reader = spark.readStream.schema(batch_schema).option(
            "pathGlobFilter", os.path.basename(docs_parquet)
        )
        src = os.path.dirname(docs_parquet)
    agg = (
        reader.parquet(src)
        .select(
            "lang",
            tx.token_count(F.col("text")).alias("n_tok"),
            (tx.quality_score(F.col("text")) >= 0.5).cast("long").alias("hq"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("hq").alias("n_high_quality"),
        )
    )
    name = f"census_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="pgs_stream_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_cms_sketch(
    spark: SparkSession, docs_parquet: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """STREAMING count-min-sketch build: readStream over the documents
    parquet → token explode × depth deterministic md5 hash rows → stateful
    groupBy(row, bucket) COUNT → availableNow drain. Counts are
    order-insensitive integer sums, so the drained depth×width sketch
    equals the batch build exactly (the corpus.cms_token_counts sketch) —
    the oracle replays it cell for cell.

    This is how a sketch deploys on an unbounded stream: state is EXACTLY
    depth·width rows no matter how much data flows, the "bounded state for
    unbounded input" contract made literal."""
    import os

    from pgs_spark.functions.text import tokens as _tokens

    batch_schema = spark.read.parquet(docs_parquet).schema
    if os.path.isdir(docs_parquet):
        reader = spark.readStream.schema(batch_schema)
        src = docs_parquet
    else:
        reader = spark.readStream.schema(batch_schema).option(
            "pathGlobFilter", os.path.basename(docs_parquet)
        )
        src = os.path.dirname(docs_parquet)
    rows = F.array(*[F.lit(r) for r in range(depth)])
    agg = (
        reader.parquet(src)
        .select(F.explode(_tokens(F.col("text"))).alias("term"))
        .select("term", F.explode(rows).alias("r"))
        .select(
            "r",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("r").cast("string"), F.lit("|"), F.col("term")
                            )
                        ),
                        1,
                        6,
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            ).alias("b"),
        )
        .groupBy("r", "b")
        .agg(F.count("*").alias("c"))
    )
    name = f"cms_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="pgs_stream_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_enriched_rollup(
    spark: SparkSession, events_parquet: str, customer_parquet: str
) -> DataFrame:
    """STREAM-STATIC ENRICHMENT JOIN: readStream over the events parquet,
    joined per-row against the STATIC customer dimension (the standard
    Spark stream-static inner join — stateless on the stream side; the
    static side is planned as an ordinary batch relation and broadcast by
    AQE at dimension size), then a stateful rollup per (segment,
    event_type) with order-insensitive integer aggregates, availableNow
    drained.

    This is the canonical streaming-ETL shape the batch engine's join
    operators (§2.4) take when the fact side is unbounded: dimension
    lookups need no stream state at all, so only the final rollup holds
    state (one row per segment x type — bounded regardless of input size).

    DETERMINISM: the join is per-row, the aggregates are COUNT plus an
    integer SUM of half-away-from-zero-rounded value cents (one
    correctly-rounded double multiply + round per row — identical in both
    engines; the SUM is then order-free). Equals the batch join+GROUP BY
    twin exactly — the oracle.

    Returns (segment, event_type, n_events, value_cents).
    """
    import os

    batch_schema = spark.read.parquet(events_parquet).schema
    if os.path.isdir(events_parquet):
        reader = spark.readStream.schema(batch_schema)
        src = events_parquet
    else:
        reader = spark.readStream.schema(batch_schema).option(
            "pathGlobFilter", os.path.basename(events_parquet)
        )
        src = os.path.dirname(events_parquet)
    dim = spark.read.parquet(customer_parquet).select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    agg = (
        reader.parquet(src)
        .select(
            "user_id",
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .join(dim, "user_id")
        .groupBy("segment", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("cents").alias("value_cents"),
        )
    )
    name = f"enrich_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="pgs_stream_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_attribution_join(
    spark: SparkSession,
    events_parquet: str,
    window_minutes: int = 60,
) -> DataFrame:
    """STREAM-STREAM INNER JOIN — the last Structured Streaming join shape
    (stream-static is streaming_enriched_rollup): the view stream joined to
    the purchase stream on user_id with an EVENT-TIME RANGE condition
    (purchase within ``window_minutes`` after the view), watermarks on both
    sides bounding the join state, availableNow-drained in append mode.
    This is the attribution topology (which view gets credit for a
    purchase) — unbounded⋈unbounded, where Spark buffers each side only
    until the other side's watermark passes the range bound.

    DETERMINISM: on static input the drain emits exactly the pairs
    satisfying the time-range predicate (microsecond-integer timestamp
    comparisons), and the rollup — run BATCH-side on the drained pairs, so
    the streaming surface under test is the join itself — is COUNT plus an
    order-free integer cent SUM per user. Equals the batch self-join twin
    exactly (the inline oracle in __spark_entry__).

    At scale the watermark bounds state to window_minutes of each stream
    per partition; the join keys hash-partition both sides identically so
    matching rows co-locate without a broadcast.

    SINGLE-BATCH ASSUMPTION: exact equality with the batch self-join twin
    holds when the availableNow drain admits all input in ONE micro-batch
    (the gate fixture's shape — one parquet file, default admission
    limits). If the file source split the input across micro-batches AND
    part files arrived out of event-time order, the 2x-window watermark
    could drop late rows from either join side and the drained result
    would undercount vs the twin. Callers replaying multi-file input in
    this mode must ingest files in event-time order or widen/remove the
    watermark for the drain (state stays bounded by availableNow either
    way).

    Returns (user_id, n_attributed, attributed_cents).
    """
    import os

    batch_schema = spark.read.parquet(events_parquet).schema
    if os.path.isdir(events_parquet):
        src = events_parquet

        def reader():
            return spark.readStream.schema(batch_schema).parquet(src)

    else:
        src = os.path.dirname(events_parquet)
        glob = os.path.basename(events_parquet)

        def reader():
            return (
                spark.readStream.schema(batch_schema)
                .option("pathGlobFilter", glob)
                .parquet(src)
            )

    views = (
        reader()
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").cast("timestamp").alias("v_ts"),
        )
        .withWatermark("v_ts", f"{window_minutes * 2} minutes")
    )
    purchases = (
        reader()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .withWatermark("p_ts", f"{window_minutes * 2} minutes")
    )
    pairs = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (
            F.col("p_ts")
            <= F.col("v_ts") + F.expr(f"INTERVAL {window_minutes} MINUTES")
        ),
        "inner",
    )
    name = f"attr_{uuid.uuid4().hex[:8]}"
    q = (
        pairs.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="pgs_stream_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(name)
        .groupBy(F.col("v_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_attributed"),
            F.sum("cents").alias("attributed_cents"),
        )
    )
