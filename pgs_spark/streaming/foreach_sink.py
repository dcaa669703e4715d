"""foreachBatch egress — the user-Consumer sink hook.

Graft of the reference's apply/forEach Consumer surface (SURVEY §2.11:
PGS_Processing.apply-style hooks take a user callback over each element).
Spark's streaming analog is ``foreachBatch``: the user function receives each
micro-batch as a regular DataFrame plus its batch id and may do arbitrary
egress (JDBC upsert, multi-sink fan-out, dedup-merge) — the escape hatch for
sinks the built-in writers don't cover.

The drain uses availableNow, so on static input the set of rows delivered
across batches is exactly the batch-read relation — which makes a
foreachBatch pipeline oracle-checkable: accumulate per-batch aggregates in
the consumer and compare the combined result against plain SQL.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def stream_foreach_batch(
    spark: SparkSession,
    src_parquet: str,
    consumer: Callable[[DataFrame, int], None],
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> None:
    """Stream `src_parquet` (availableNow drain), applying `transform` (an
    optional DataFrame→DataFrame stage) and handing every micro-batch to
    `consumer(batch_df, batch_id)`. Returns after the drain completes."""
    schema = spark.read.parquet(src_parquet).schema
    # the streaming file source requires a DIRECTORY; the testdata tables are
    # single files, so stream the parent dir filtered to this table's file(s)
    if os.path.isdir(src_parquet):
        reader = spark.readStream.schema(schema)
        src = src_parquet
    else:
        reader = spark.readStream.schema(schema).option(
            "pathGlobFilter", os.path.basename(src_parquet)
        )
        src = os.path.dirname(src_parquet)
    stream = reader.parquet(src)
    if transform is not None:
        stream = transform(stream)
    checkpoint = os.path.join(
        tempfile.gettempdir(), f"pgs_feb_{uuid.uuid4().hex[:12]}"
    )
    q = (
        stream.writeStream.foreachBatch(consumer)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
