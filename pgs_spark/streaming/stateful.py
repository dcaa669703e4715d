"""Custom stateful streaming operator — applyInPandasWithState.

The task brief's "custom stateful operators" surface: per-user sessionization
where the state (last event time, session count, event count) lives in Spark's
state store and an arbitrary-Python update function folds each micro-batch
into it. Run with ``availableNow`` over static parquet the pipeline is
deterministic, so it gate-checks against the SAME DuckDB oracle as the batch
sessionize query — the streaming and batch implementations must agree on
every user.

At scale this runs unbounded (file/Kafka source): state is one tiny row per
user, evicted by timeout; the update function sees Arrow batches per key,
never per-row Python.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_sessionize(
    spark: SparkSession,
    events_parquet: str,
    gap_us: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """(user_id, n_sessions, n_events) via stateful streaming; availableNow
    drain to a memory sink returns the finished batch result."""
    batch_schema = spark.read.parquet(events_parquet).schema
    if os.path.isdir(events_parquet):
        reader = spark.readStream.schema(batch_schema)
        src = events_parquet
    else:
        reader = spark.readStream.schema(batch_schema).option(
            "pathGlobFilter", os.path.basename(events_parquet)
        )
        src = os.path.dirname(events_parquet)
    stream = reader.parquet(src).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            last_us, n_sessions, n_events = state.get
        else:
            last_us, n_sessions, n_events = None, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["us", "event_id"], kind="mergesort"
        )
        us = rows["us"].to_numpy()
        if len(us):
            import numpy as np

            # vectorized gap count over the sorted batch (hot keys can carry
            # many events per micro-batch; a Python row loop does not)
            n_sessions += int((np.diff(us) > gap_us).sum())
            n_sessions += 1 if (last_us is None or us[0] - last_us > gap_us) else 0
            last_us = int(us[-1])
            n_events += len(us)
        state.update((last_us, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_sessions long, n_events long",
        stateStructType="last_us long, n_sessions long, n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="pgs_state_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per (user, micro-batch); the LAST emission per
    # user carries the final counts (single-file sources emit once anyway)
    res = spark.table(name)
    return (
        res.groupBy("user_id")
        .agg(
            F.max("n_sessions").alias("n_sessions"),
            F.max("n_events").alias("n_events"),
        )
    )
