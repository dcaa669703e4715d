"""Grouped pruning with a user termination predicate — the simplifyDCE hook.

Graft of PGS_Morphology.simplifyDCE (PGS_Morphology.java:331): repeatedly
remove the least-important element of a shape while a USER-SUPPLIED predicate
over the accumulated state says to continue. That is an aggregating custom
hook — state accumulates across the removals of one group and a Python
callable decides termination.

Spark shape: ``applyInPandas`` per group (Arrow-batched, one Python call per
group — never per row). The default predicate ("stop once dropped value would
exceed `frac` of the group total") is SQL-expressible, which keeps the query
oracle-checkable while the *surface* (arbitrary callables closing over
parameters) is the reference's UDF contract.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame


def budget_stop(frac: float) -> Callable[[float, float, float], bool]:
    """Stop dropping once cumulative dropped value would exceed frac·total.
    SQL mirror: keep rows whose inclusive running sum > frac * total."""

    def stop(cum_dropped: float, nxt: float, total: float) -> bool:
        return cum_dropped + nxt > frac * total

    return stop


def prune_until(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    stop: Callable[[float, float, float], bool],
    keep_cols: list[str],
) -> DataFrame:
    """Per group, walk rows in ascending `order_cols` order dropping each row
    until ``stop(cum_dropped, next_value, group_total)`` returns True; emit
    the survivors' `keep_cols`. The accumulated-state walk runs vectorized
    per group inside one Arrow batch."""

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        total = float(pdf[value_col].sum())
        cum = 0.0
        kept_from = len(pdf)
        for i, v in enumerate(pdf[value_col].to_numpy()):
            if stop(cum, float(v), total):
                kept_from = i
                break
            cum += float(v)
        return pdf.iloc[kept_from:][keep_cols]

    schema = df.select(*keep_cols).schema
    return df.groupBy(group_col).applyInPandas(prune, schema=schema)
