"""Explicit skew handling: heavy-hitter detection, salted joins, salted aggs.

Power-law graphs make hub vertices the common case (the synthetic corpus draws
import targets from a Zipf law on purpose). AQE's skew-join splitting handles
the *join* side at runtime, but the gather-side ``groupBy`` and any
pre-partitioned join still benefit from explicit salting — the north rule calls
for "salted hash join plus groupBy aggregation … heavy-hitter skew splitting".

The algorithm-substitution-by-input-property precedent is the reference's
matching fallback (PGS_Meshing.java:536-542: try perfect matching, fall back on
infeasibility) — here: detect heavy keys by degree threshold, route them
through the salted path, everything else through the plain path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def heavy_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys whose row count exceeds `threshold` → (key, cnt). Small by
    construction (power laws have few hubs), so always broadcastable."""
    return df.groupBy(key).count().filter(F.col("count") > threshold).select(key)


def salt_col(key: Column, buckets: int, tag: str = "salt") -> Column:
    """Deterministic salt in [0, buckets): derived from the row's own content
    (never rand() — determinism discipline of PGS_Conversion.java:1087-1088)."""
    return F.pmod(F.xxhash64(key, F.lit(tag)), F.lit(buckets)).cast("int")


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int,
    how: str = "inner",
    large_salt_from: str | None = None,
) -> DataFrame:
    """Equi-join where the large side's hot keys would overload one task:
    salt the large side by a second column derived from `large_salt_from`
    (default: a rotating hash of the key row), explode the small side ×buckets,
    join on (key, salt). Splits each hot key across `buckets` tasks."""
    salt_src = F.col(large_salt_from) if large_salt_from else F.monotonically_increasing_id()
    lg = large.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(buckets)).cast("int"))
    sm = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))).withColumn(
        "_salt", F.col("_salt").cast("int")
    )
    return lg.join(sm, [key, "_salt"], how).drop("_salt")


def salted_sum(
    df: DataFrame, key: str, value: str, buckets: int, salt_from: str | None = None
) -> DataFrame:
    """Two-stage aggregation: groupBy(key, salt) partial sums → groupBy(key).

    Spark's hash aggregate already map-side-combines, but when one key's rows
    land in one shuffle partition the *final* agg task is still hot; the salt
    spreads the final agg of hub keys across `buckets` tasks first. The salt
    must NOT be a function of the key alone (that would map a key to a single
    bucket); default is the upstream partition id."""
    if salt_from:
        salt = salt_col(F.col(salt_from), buckets)
    else:
        salt = F.pmod(F.spark_partition_id(), F.lit(buckets)).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(value))


def salted_sum_flagged(
    df: DataFrame, key: str, value: str, buckets: int, flag_col: str
) -> DataFrame:
    """Heavy-hitter-split two-stage sum in ONE pass over `df`.

    Rows whose `flag_col` is true (pre-marked heavy keys) get a
    partition-derived salt so their final aggregation spreads across
    `buckets` tasks; cold rows get salt 0, making their first stage exactly
    the plain map-side-combine plan. The second stage then sums at most
    `buckets` partial rows per key — |distinct keys| rows total, trivially
    cheap next to the |rows| first stage. Unlike filtering df into hot/cold
    branches, the input is scanned once (a join output feeding two branches
    would execute twice)."""
    salt = F.when(
        F.col(flag_col), F.pmod(F.spark_partition_id(), F.lit(buckets))
    ).otherwise(F.lit(0)).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_partial"))
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias(value))


def skew_ratio(df: DataFrame, key: str) -> float:
    """max/mean rows per key — the per-iteration skew metric the manifests
    record (north rule: iteration metrics include skew ratio)."""
    row = (
        df.groupBy(key)
        .count()
        .select(F.max("count").alias("mx"), F.avg("count").alias("avg"))
        .first()
    )
    if not row or not row["avg"]:
        return 1.0
    return float(row["mx"]) / float(row["avg"])
