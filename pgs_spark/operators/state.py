"""Off-heap iteration state for driver-side superstep loops.

Every iterative operator in this engine (PageRank, CC, LPA, k-core, BFS)
carries per-superstep state. Keeping that state as localCheckpoint'ed RDD
blocks leaves every superstep's rows *deserialized on the JVM heap* — blocks
that unpersist() cannot free promptly; at 20M vertices that produced 19 Full
GCs with multi-second pauses (see BENCH/BASELINE.md history). Writing state
to parquet and re-reading it keeps the working set in the OS page cache
(off-heap), truncates lineage, and — with a manifest — survives a driver
restart (streaming/checkpoint.py builds resume on top of this).

This is the two-phase "compute all, then flip" superstep barrier of the
reference's mesh smoothing (commons/PMesh.java:237-270) expressed as an
immutable snapshot swap.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def make_work_dir(prefix: str) -> str:
    """Ephemeral snapshot dir — honors PGS_SPARK_LOCAL_DIR (tmpfs in bench
    runs, per-executor local disk on a cluster). The operator's returned
    DataFrame reads from the final snapshot, so the dir must outlive the
    call; it is reclaimed at interpreter exit rather than leaked across
    long-lived sessions."""
    d = tempfile.mkdtemp(
        prefix=prefix, dir=os.environ.get("PGS_SPARK_LOCAL_DIR") or None
    )
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def snapshot(df: DataFrame, work_dir: str, name: str) -> DataFrame:
    """Write-and-reread parquet: flat lineage with OFF-HEAP state. Iterative
    loops alternate two names (``state_{it % 2}``) so storage stays bounded
    at two snapshots regardless of iteration count."""
    path = os.path.join(work_dir, name)
    df.write.mode("overwrite").parquet(path)
    # re-read with the KNOWN schema: schema inference costs a driver-side
    # footer read per snapshot (~0.12s measured), pure overhead in a loop
    # that already knows the exact schema it just wrote
    return df.sparkSession.read.schema(df.schema).parquet(path)
