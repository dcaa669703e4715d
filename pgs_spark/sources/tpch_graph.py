"""Graph derivation from the driver-generated TPC-H-ish tables.

The engine's core move — derive an edge table from raw records by grouping on
a shared key (toDualGraph: faces sharing an edge key become graph edges,
PGS_Conversion.java:1068-1108) — applied to the testdata relations:

- ``co_purchase_edges``: parts sharing an order → undirected edge (the two
  faces sharing a PEdge). The l_quantity floor sparsifies deterministically.
- ``customer_supplier_edges``: directed customer→supplier purchase edges —
  suppliers have no out-edges, so PageRank's dangling-mass path is exercised.

Vertex ids are natural keys offset into disjoint ranges (parts as-is,
suppliers +10^6) — the surrogate-keying mirror of xxhash64(repo), chosen here
so the DuckDB oracle can reproduce them with plain arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgs_spark.sources.tables import load_table

SUPPLIER_OFFSET = 1_000_000
CUSTOMER_OFFSET = 2_000_000


def co_purchase_edges(
    spark: SparkSession, sf_dir: str, min_quantity: int = 0
) -> DataFrame:
    """Canonical undirected edges between parts co-occurring in an order.

    Self-join on the shared key (l_orderkey), canonicalized src<dst, distinct —
    exactly the toDualGraph shape: explode to key, pair up faces per key.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= min_quantity
    ).select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
        .distinct()
    )


def customer_supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed edges customer → supplier (via orders ⋈ lineitem), distinct.

    Suppliers never have out-edges → every supplier vertex is dangling."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey").cast("long") + F.lit(CUSTOMER_OFFSET)).alias("src"),
            (F.col("l_suppkey").cast("long") + F.lit(SUPPLIER_OFFSET)).alias("dst"),
        )
        .distinct()
    )


def co_purchase_weighted_edges(
    spark: SparkSession, sf_dir: str, min_quantity: int = 0
) -> DataFrame:
    """Canonical undirected edges with a multiplicity weight: the number of
    distinct orders in which the two parts co-occur.

    The weighted-graph graft: the reference attaches weights wherever graphs
    feed algorithms (PGS_Conversion.java:933 ``setEdgeWeight(e, e.length())``;
    quality-weighted dual graph PGS_Triangulation.java:636-650). Here weight =
    co-occurrence count — the import-count weighting a dependency graph wants.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") >= min_quantity
    ).select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            "l_orderkey",
            F.col("a.l_partkey").cast("long").alias("src"),
            F.col("b.l_partkey").cast("long").alias("dst"),
        )
        .distinct()  # one row per (order, pair)
    )
    return pairs.groupBy("src", "dst").agg(F.count("*").alias("weight"))


# The same derivations as ANSI SQL for the DuckDB oracle.
CO_PURCHASE_SQL = """
    SELECT DISTINCT
        CAST(a.l_partkey AS BIGINT) AS src,
        CAST(b.l_partkey AS BIGINT) AS dst
    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey
      AND a.l_quantity >= {minq} AND b.l_quantity >= {minq}
"""

CUSTOMER_SUPPLIER_SQL = """
    SELECT DISTINCT
        CAST(o.o_custkey AS BIGINT) + 2000000 AS src,
        CAST(l.l_suppkey AS BIGINT) + 1000000 AS dst
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""


CO_PURCHASE_WEIGHTED_SQL = """
    SELECT src, dst, COUNT(*) AS weight FROM (
        SELECT DISTINCT a.l_orderkey,
            CAST(a.l_partkey AS BIGINT) AS src,
            CAST(b.l_partkey AS BIGINT) AS dst
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
          AND a.l_quantity >= {minq} AND b.l_quantity >= {minq}) p
    GROUP BY src, dst
"""


def co_purchase_sql(min_quantity: int = 0) -> str:
    return CO_PURCHASE_SQL.format(minq=min_quantity)


def co_purchase_weighted_sql(min_quantity: int = 0) -> str:
    return CO_PURCHASE_WEIGHTED_SQL.format(minq=min_quantity)


def order_sequence_edges(
    spark: SparkSession, sf_dir: str, min_quantity: int = 0
) -> DataFrame:
    """DIRECTED part→part edges from consecutive surviving line numbers
    within each order — the toGraph consecutive-pair derivation
    (operators/edges.py:48; PGS_Conversion.java:1068-1108's ring walk)
    applied to the order's line sequence. Unlike the canonicalized
    co-purchase graph this one keeps direction, and cycles arise across
    orders (A→B in one order, B→A in another), so it exercises real SCC /
    directed-reachability structure. l_quantity floor sparsifies
    deterministically. The synthetic lineitem does NOT keep (orderkey,
    linenumber) unique, so the sequence order is (l_linenumber, l_partkey):
    total up to exact-duplicate rows, whose LEAD edges are permutation-
    invariant after the src≠dst filter + DISTINCT."""
    from pyspark.sql import Window

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= min_quantity)
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    return (
        li.select(
            F.col("l_partkey").cast("long").alias("src"),
            F.lead("l_partkey").over(w).cast("long").alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
    )


ORDER_SEQUENCE_SQL = """
    SELECT DISTINCT src, dst FROM (
        SELECT CAST(l_partkey AS BIGINT) AS src,
               CAST(LEAD(l_partkey) OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey) AS BIGINT) AS dst
        FROM lineitem WHERE l_quantity >= {minq}) s
    WHERE dst IS NOT NULL AND src <> dst
"""


def order_sequence_sql(min_quantity: int = 0) -> str:
    return ORDER_SEQUENCE_SQL.format(minq=min_quantity)
