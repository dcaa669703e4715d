"""Z-order layout: oracle-exact Morton codes, range-partitioned plan, and
measured row-group pruning vs a hash layout (SURVEY §2.6 locality story)."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pgs_spark.functions.zorder import interleave_bits, zorder_layout
from pgs_spark.plans.explain import plan_string
from pgs_spark.sources.tpch_graph import co_purchase_edges

SF = "/root/testdata/sf0.001"


def _morton_ref(x, y):
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_reference_bits(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 9)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", interleave_bits(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton_ref(x, y)


def test_zorder_layout_is_range_partitioned(spark):
    e = co_purchase_edges(spark, SF, 0)
    plan = plan_string(zorder_layout(e, "src", "dst", 8))
    assert "rangepartitioning" in plan.lower()
    assert "Sort" in plan


def _overlapping_files(path, lo, hi):
    """Files whose (src, dst) min/max envelope intersects the box
    [lo,hi]×[lo,hi] — a reader with file/row-group statistics must scan
    exactly these."""
    import glob

    total, hit = 0, 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        smin = min(md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups))
        smax = max(md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups))
        dmin = min(md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups))
        dmax = max(md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups))
        total += 1
        if smax >= lo and smin <= hi and dmax >= lo and dmin <= hi:
            hit += 1
    return hit, total


def test_zorder_layout_prunes_box_scans(spark, tmp_path):
    e = co_purchase_edges(spark, SF, 0).persist()
    mx = e.agg(F.max("dst")).first()[0]
    lo, hi = 0, mx // 4  # a box predicate covering the low quarter of keyspace
    plain = str(tmp_path / "plain")
    zpath = str(tmp_path / "zord")
    e.repartition(8, "src").write.parquet(plain)
    zorder_layout(e, "src", "dst", 8).select("src", "dst").write.parquet(zpath)

    plain_hit, plain_total = _overlapping_files(plain, lo, hi)
    z_hit, z_total = _overlapping_files(zpath, lo, hi)
    # hash layout spreads the box over every file; z-order confines it
    assert plain_hit == plain_total
    assert z_hit < plain_hit
    # and the data is unchanged
    a = spark.read.parquet(plain)
    b = spark.read.parquet(zpath)
    assert a.count() == b.count()
    assert a.exceptAll(b).isEmpty()


def test_sfc_tour_beats_random_order(spark):
    """TSP-heuristic sanity (Platzman-Bartholdi): the SFC tour over random
    points is much shorter than an id-order tour, and ranks are a
    permutation of 1..n."""
    import math
    import random

    from pgs_spark.functions.zorder import sfc_tour

    rng = random.Random(3)
    rows = [(i, rng.uniform(0, 100), rng.uniform(0, 100)) for i in range(400)]
    pts = spark.createDataFrame(rows, "id long, x double, y double")
    got = {r["id"]: r["tour_rank"] for r in sfc_tour(pts).collect()}
    assert sorted(got.values()) == list(range(1, 401))
    pos = {i: (x, y) for i, x, y in rows}

    def tour_len(order):
        return sum(
            math.dist(pos[a], pos[b]) for a, b in zip(order, order[1:])
        )

    sfc_order = [i for i, _ in sorted(got.items(), key=lambda kv: kv[1])]
    id_order = sorted(pos)
    assert tour_len(sfc_order) < 0.5 * tour_len(id_order)
