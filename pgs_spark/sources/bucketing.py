"""Bucketed tables — shuffle-free co-located joins for repeated workloads.

The per-superstep gather avoids re-shuffling edges by persisting a
hash-partitioned DataFrame *within one session*. Across sessions/jobs the
same property comes from BUCKETED storage: write the edge table
`bucketBy(n, src)` and the vertex-state table `bucketBy(n, id)` once, and
every later join on that key runs with ZERO Exchange on either side — the
physical layout IS the partitioning (the persistent analog of the reference
pre-sorting its edge lists once and reusing them,
PGS_Conversion.java:1087-1088).

At 100 TB this is the difference between shuffling 10^12 edges per analytics
job and shuffling them once at ingest: downstream joins/groupBys on the
bucket key become narrow dependencies. (Bucketing requires `saveAsTable` —
on a cluster, an Iceberg/Hive catalog; the layout contract is identical.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 32
) -> None:
    """Persist `df` hash-bucketed (and per-file sorted) on `key`."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys — plans with no
    Exchange on either side (asserted in tests/test_plans.py)."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[left_key] == rt[right_key])
