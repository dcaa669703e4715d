"""Table loading / registration for the driver-generated parquet testdata.

The production target is an Iceberg catalog (the north rule's source-code
table); this container has no Iceberg jars, so the reader is parquet with an
import-try stub for Iceberg — the call sites are identical
(``spark.read.format("iceberg").load(name)`` vs ``spark.read.parquet(path)``),
so swapping the format is a config change, not a code change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Prefers Iceberg when a catalog is configured."""
    catalog = spark.conf.get("spark.sql.catalog.pgs", None)
    if catalog:  # pragma: no cover - no Iceberg jars in this container
        return spark.read.format("iceberg").load(f"pgs.{name}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql queries)."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)
