"""Extra isolation benchmarks (guide §1.4) — NOT the driver's bench.py.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python bench_extra.py <op> [...]
Times individual operators on the same inputs bench.py uses, with noop-sink
isolation where the operator returns a plan, and prints one JSON line.
"""
from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pgs_spark.session import get_spark


def main():
    ops = sys.argv[1:] or ["layout"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-extra")
    sc = spark.sparkContext
    from pgs_spark.sources.tpch_graph import co_purchase_edges, customer_supplier_edges
    from pgs_spark.operators.edges import canonicalize

    out = {}
    if "layout" in ops or "clump" in ops:
        from pgs_spark.operators.layout import fr_layout

        cs = customer_supplier_edges(spark, sf_dir).persist()
        cs.count()
        if "layout" in ops:
            sc.setJobDescription("bench_extra: layout_fr_50it")
            t0 = time.time()
            r = fr_layout(spark, cs, iterations=50, seed=1337)
            r.positions.count()
            out["layout_fr_50it"] = round(time.time() - t0, 3)
            out["layout_iter_secs_head"] = [h["seconds"] for h in r.history[:5]]
        if "clump" in ops:
            ids_cs = cs.selectExpr("src as id").union(cs.selectExpr("dst as id")).distinct()
            n_cs = ids_cs.count()
            stride = max(1, n_cs // 16_000)
            clump_r = 2.0 / math.sqrt(float(n_cs)) * 0.45
            hx = "conv(substring(md5(concat(cast(id as string), '|cx|1337')), 1, 6), 16, 10) / 16777216.0"
            hy = "conv(substring(md5(concat(cast(id as string), '|cy|1337')), 1, 6), 16, 10) / 16777216.0"
            in_clump = f"pmod(xxhash64(id), {stride}) = 0"
            clump_init = ids_cs.selectExpr(
                "id",
                f"CASE WHEN {in_clump} THEN {hx} * {clump_r!r} ELSE {hx} END as x",
                f"CASE WHEN {in_clump} THEN {hy} * {clump_r!r} ELSE {hy} END as y",
            )
            sc.setJobDescription("bench_extra: layout_fr_clump_10it")
            t0 = time.time()
            r = fr_layout(spark, cs, iterations=10, seed=1337, init_positions=clump_init)
            r.positions.count()
            out["layout_fr_clump_10it"] = round(time.time() - t0, 3)
            out["clump_iter_secs"] = [h["seconds"] for h in r.history]
        cs.unpersist()
    if "coloring" in ops:
        from pgs_spark.operators.coloring import jones_plassmann

        cop_sparse = canonicalize(co_purchase_edges(spark, sf_dir, 40)).persist()
        cop_sparse.count()
        sc.setJobDescription("bench_extra: coloring_jp")
        t0 = time.time()
        r = jones_plassmann(spark, cop_sparse, max_rounds=40)
        r.colors.count()
        out["coloring_jp"] = round(time.time() - t0, 3)
        out["coloring_rounds"] = r.rounds
        cop_sparse.unpersist()
    if "mergek" in ops:
        from pgs_spark.operators.contraction import merge_to_k

        cop = canonicalize(co_purchase_edges(spark, sf_dir, 0)).persist()
        cop.count()
        sc.setJobDescription("bench_extra: merge_to_k")
        t0 = time.time()
        r = merge_to_k(spark, cop, k=500, max_rounds=6)
        r.groups.count()
        out["merge_to_k"] = round(time.time() - t0, 3)
        out["mergek_rounds"] = r.rounds
        cop.unpersist()
    if "hyperball" in ops:
        from pgs_spark.operators.hyperball import hyperball

        cop = canonicalize(co_purchase_edges(spark, sf_dir, 0)).persist()
        cop.count()
        sc.setJobDescription("bench_extra: hyperball_3it")
        t0 = time.time()
        hyperball(spark, cop, supersteps=3).count()
        out["hyperball_3it"] = round(time.time() - t0, 3)
        cop.unpersist()
    if "louvain" in ops:
        from pgs_spark.operators.community import louvain_local_move, louvain_two_level

        cop = canonicalize(co_purchase_edges(spark, sf_dir, 0)).persist()
        cop.count()
        sc.setJobDescription("bench_extra: louvain_2r")
        t0 = time.time()
        louvain_local_move(spark, cop, rounds=2).count()
        out["louvain_2r"] = round(time.time() - t0, 3)
        sc.setJobDescription("bench_extra: louvain_two_level")
        t0 = time.time()
        louvain_two_level(spark, cop, rounds=2, rounds2=2).count()
        out["louvain_two_level"] = round(time.time() - t0, 3)
        cop.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
