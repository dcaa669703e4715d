"""Physical-plan assertions — the engine's `.explain` checks as code.

The optimizations SURVEY §4 marks as "Catalyst built-in, zero code" are only
free if the plan actually uses them; these helpers let tests assert it
(pushed filters reach the parquet scan, small dims broadcast, the PageRank
gather join is the intended shuffle-hash shape, no whole-plan sorts sneak in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True when `fragment` appears in the scan's PushedFilters list."""
    plan = plan_string(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names the parquet scan actually reads (column pruning check)."""
    cols: list[str] = []
    for line in plan_string(df).splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(f.split(":")[0].strip() for f in inner.split(",") if ":" in f)
    return cols


def count_nodes(df: DataFrame, node: str) -> int:
    return plan_string(df, "simple").count(node)


def uses_broadcast_join(df: DataFrame) -> bool:
    return count_nodes(df, "BroadcastHashJoin") > 0


def uses_shuffled_hash_join(df: DataFrame) -> bool:
    return count_nodes(df, "ShuffledHashJoin") > 0


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees ('Found N WholeStageCodegen
    subtrees' in codegen explain mode). An un-executed AdaptiveSparkPlan hides
    its subtrees, so plan a fresh copy of the query with AQE off."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        header = plan_string(df.where(F.lit(True)), "codegen").splitlines()[0]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    for tok in header.split():
        if tok.isdigit():
            return int(tok)
    return 0
