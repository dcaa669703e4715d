"""Physical-plan assertions: pushdown, pruning, join shapes (SURVEY §4)."""

from pyspark.sql import functions as F

from pgs_spark.plans.explain import (
    has_pushed_filter,
    scan_read_schema,
    uses_broadcast_join,
    whole_stage_codegen_spans,
)

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") >= 40).select("l_orderkey", "l_partkey")
    assert has_pushed_filter(q, "l_quantity")


def test_column_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.select("l_orderkey", "l_partkey")
    cols = scan_read_schema(q)
    assert set(cols) == {"l_orderkey", "l_partkey"}  # 2 of 11 columns read


def test_small_dim_broadcasts(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    supp = spark.read.parquet(f"{SF}/supplier.parquet")
    q = li.join(supp, li.l_suppkey == supp.s_suppkey)
    assert uses_broadcast_join(q)


def test_pagerank_gather_avoids_broadcast_build(spark):
    """The gather join must be a shuffled-hash join (parallel build), not a
    broadcast of the full rank vector (serial build — Amdahl at scale)."""
    edges = spark.createDataFrame(
        [(i, (i + 1) % 50) for i in range(50)], "src long, dst long"
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    w_edges = edges.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
    )
    ranks = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.lit(0.02).alias("rank")
    )
    j = w_edges.join(ranks.hint("shuffle_hash"), w_edges.src == ranks.id)
    from pgs_spark.plans.explain import uses_shuffled_hash_join

    assert uses_shuffled_hash_join(j)
    assert not uses_broadcast_join(j)


def test_asof_join_is_window_not_join(spark):
    """The as-of lookup must compile to one sort-based window per user —
    NOT a join-then-aggregate, whose c·p fanout is quadratic on skewed users."""
    import __spark_entry__ as entry

    from pgs_spark.plans.explain import plan_string

    q = entry.q_asof_join(spark, SF)
    plan = plan_string(q)
    assert "Window" in plan
    assert "Join" not in plan


def test_bucketed_join_has_no_exchange(spark):
    """Edge table bucketed on src + vertex table bucketed on id ⇒ the join
    plans with ZERO Exchange on either side (shuffle paid once at write)."""
    from pgs_spark.plans.explain import plan_string
    from pgs_spark.sources.bucketing import bucketed_join, write_bucketed

    edges = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    verts = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "rank", F.lit(0.1)
    )
    write_bucketed(edges, "t_edges_b", "src", 8)
    write_bucketed(verts, "t_verts_b", "id", 8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "t_edges_b", "t_verts_b", "src", "id")
        plan = plan_string(j)
        assert "Exchange" not in plan
        assert j.count() == edges.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_edges_b")
        spark.sql("DROP TABLE IF EXISTS t_verts_b")


def test_codegen_covers_agg_pipeline(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    assert whole_stage_codegen_spans(q) >= 1


def test_nearest_neighbor_has_no_cross_join(spark):
    """The 1-NN lookup must be a banded value-grid equi-join (SURVEY §2.4),
    never a CartesianProduct / nested-loop join — |C|·|S| rows at sf100 is
    ~1.5e13 for a 1-row-per-customer answer."""
    import __spark_entry__ as entry
    from pgs_spark.plans.explain import plan_string

    q = entry.q_nearest_neighbor(spark, SF)
    plan = plan_string(q)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nearest_value_1d_exact(spark):
    """Known answers incl. equidistant tie (→ min right id), duplicate right
    values (→ min id per value), and a far-out left row (doubling path)."""
    from pgs_spark.operators.geometric import nearest_value_1d

    left = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 1000.0)], "id long, val double"
    )
    # right: 4.0 duplicated (ids 20, 21 → 20 wins), 6.0 ties with 4.0 for
    # left 5.0 (|5-4|=|5-6|=1 → min id 20 wins), 11.0 nearest to 10.0,
    # nothing near 1000.0 until the grid doubles out to it.
    right = spark.createDataFrame(
        [(21, 4.0), (20, 4.0), (22, 6.0), (23, 11.0)], "id long, val double"
    )
    got = {r["lid"]: r["rid"] for r in nearest_value_1d(spark, left, right).collect()}
    assert got == {1: 20, 2: 23, 3: 23}


def test_round5b_operators_have_no_cartesian_on_data(spark):
    """link_predict / modularity / dsir / tfidf / walks: the only allowed
    non-equi join shapes are 1-row scalar crossJoins (census totals); a
    CartesianProduct over DATA-sized relations would be |V|²/|docs|² at
    scale. BroadcastNestedLoopJoin appears ONLY as the physical form of
    those 1-row scalar attaches — assert no CartesianProduct anywhere and
    count the NL joins to match the intended scalar attaches exactly."""
    import __spark_entry__ as entry
    from pgs_spark.plans.explain import plan_string

    for q, n_scalar_max in (
        (entry.q_link_predict, 0),  # pure equi-joins
        (entry.q_modularity, 1),  # m (1-row)
        (entry.q_dsir_weights, 2),  # ct_total, cr_total (1-row each)
        (entry.q_tfidf, 1),  # n_docs (1-row)
        (entry.q_random_walks, 0),  # pure equi-joins
        (entry.q_clustering, 0),  # pure equi-joins
        # 1 real scalar attach; the persisted rate table's cached subtree is
        # PRINTED under both InMemoryTableScans (same node id, computed once)
        (entry.q_stratified_sample, 2),
    ):
        plan = plan_string(q(spark, SF))
        assert "CartesianProduct" not in plan, q.__name__
        # formatted plans print each node twice (tree + detail section);
        # "BroadcastNestedLoopJoin Cross" matches only the tree line
        n_nl = plan.count("BroadcastNestedLoopJoin Cross")
        assert n_nl <= n_scalar_max, (q.__name__, n_nl, plan[:500])


def test_round5c_operators_have_no_cartesian_on_data(spark):
    """rectangles / louvain / katz / mean_aggregate / mix_temperature: same
    discipline as the round-5b check — no CartesianProduct over data-sized
    relations; BroadcastNestedLoopJoin only as 1-row scalar attaches."""
    import __spark_entry__ as entry
    from pgs_spark.plans.explain import plan_string

    for q, n_scalar_max in (
        (entry.q_rectangles, 0),  # pure equi-joins
        (entry.q_louvain, 2),  # m (1-row) attached once per round
        (entry.q_louvain_weighted, 2),  # same shape, weighted sums
        (entry.q_louvain_two_level, 4),  # m (1-row) per round per level
        (entry.q_katz, 0),  # pure equi-joins
        (entry.q_mean_aggregate, 0),  # pure equi-joins
        (entry.q_mix_temperature, 1),  # w_total/n_total (1-row)
    ):
        plan = plan_string(q(spark, SF))
        assert "CartesianProduct" not in plan, q.__name__
        n_nl = plan.count("BroadcastNestedLoopJoin Cross")
        assert n_nl <= n_scalar_max, (q.__name__, n_nl, plan[:500])


def test_round5e_operators_have_no_cartesian_on_data(spark):
    """cocitation / coupling / event_transitions / retention /
    vocab_coverage / betweenness: no CartesianProduct over data-sized
    relations; BroadcastNestedLoopJoin only as 1-row scalar attaches.
    (densest and triangle_estimate drive driver-side scalars between jobs,
    so their returned relation is a literal — covered by oracle parity.)"""
    import __spark_entry__ as entry
    from pgs_spark.plans.explain import plan_string

    for q, n_scalar_max in (
        (entry.q_cocitation, 0),  # one self-equi-join + groupBy
        (entry.q_coupling, 0),
        (entry.q_event_transitions, 0),  # window + equi-join
        (entry.q_retention, 0),  # two aggs + two equi-joins
        (entry.q_vocab_coverage, 0),  # TakeOrdered vocab + broadcast join
        (entry.q_betweenness, 0),  # level equi-joins only
    ):
        plan = plan_string(q(spark, SF))
        assert "CartesianProduct" not in plan, q.__name__
        n_nl = plan.count("BroadcastNestedLoopJoin Cross")
        assert n_nl <= n_scalar_max, (q.__name__, n_nl, plan[:500])


def test_retention_broadcasts_cohort_sizes(spark):
    """The cohort-size attach must be a broadcast join (tiny |cohorts|-row
    relation), never a shuffle of the data-sized side."""
    import __spark_entry__ as entry
    from pgs_spark.plans.explain import plan_string

    plan = plan_string(entry.q_retention(spark, SF))
    assert "BroadcastHashJoin" in plan
