"""Community quality (Newman modularity) and common-neighbor link prediction.

Graft map:
- ``modularity_by_community`` — the quality functional behind the reference's
  class-partitioning family: PGS_Coloring's class assignment and
  stochasticMerge's island merging (PGS_Meshing.java:693-725) both produce a
  vertex partition; modularity Q = Σ_c [ e_c/m − (deg_c/(2m))² ] (Newman 2004)
  is the standard score for how community-like that partition is. Computed
  per community so the result is a relation, not a scalar — the total is
  SUM(modularity_r).
- ``common_neighbor_links`` — link prediction over the same wedge join that
  powers triangle counting (TriangleCollector's closed-wedge visit,
  PGS_Meshing.java:118-129, opened instead of closed): pairs at distance 2
  ranked by common-neighbor count and Jaccard coefficient
  (Liben-Nowell & Kleinberg 2003).

Scale notes (100 TB):
- modularity is two equi-joins on vertex id plus two map-side-combinable
  aggregations — no all-pairs anywhere; labels is |V|-sized so it shuffles,
  never broadcasts.
- the wedge join fans out Σ deg(v)² rows; hubs dominate that sum, so
  ``max_center_degree`` optionally drops wedges centered on vertices above a
  degree cap (the standard hub-capping approximation — DISCLOSED in the
  result when used, never silent). At gate scale the cap is off and results
  are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgs_spark.operators.edges import canonicalize, degrees, symmetrize


def modularity_by_community(
    spark: SparkSession,
    edges: DataFrame,
    labels: DataFrame,
    round_to: int = 6,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-community modularity contributions of a vertex partition.

    ``edges``: canonical undirected (src, dst). ``labels``: (id, label) —
    every edge endpoint must be labeled (inner join semantics; LPA labels
    every vertex of the graph it ran on).

    Returns (label, n_internal, degree_sum, modularity_r) where
    modularity_r = round(n_internal/m − (degree_sum/(2m))², round_to) and
    m = |E|. With ``weight_col`` (the reference's weighted graphs,
    PGS_Conversion.setEdgeWeight, PGS_Conversion.java:933) the counts become
    weight sums: n_internal = Σw internal, degree_sum = vertex strength Σ,
    m = Σw — Newman's weighted modularity. Both engines evaluate the
    identical expression tree on exact integers (weights here are integer
    co-occurrence counts, so even the weighted sums are exact), so the
    doubles agree bit-for-bit before rounding.
    """
    if weight_col is None:
        und = canonicalize(edges)
        w_one = F.lit(1).alias("w")
        und = und.select("src", "dst", w_one)
    else:
        # weighted callers pass an already-canonical weighted edge table
        und = edges.select("src", "dst", F.col(weight_col).alias("w"))
    m = und.agg(F.sum("w").cast("double").alias("m"))

    la = labels.select(F.col("id").alias("src"), F.col("label").alias("ls"))
    lb = labels.select(F.col("id").alias("dst"), F.col("label").alias("ld"))
    internal = (
        und.join(la, "src")
        .join(lb, "dst")
        .filter(F.col("ls") == F.col("ld"))
        .groupBy(F.col("ls").alias("label"))
        .agg(F.sum("w").alias("n_internal"))
    )
    sym_w = und.union(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    degs = (
        sym_w
        .join(la.select(F.col("src"), F.col("ls").alias("label")), "src")
        .groupBy("label")
        .agg(F.sum("w").alias("degree_sum"))
    )
    ni = F.coalesce(F.col("n_internal"), F.lit(0)).cast("long")
    half = F.col("degree_sum").cast("double") / (F.lit(2.0) * F.col("m"))
    return (
        degs.join(internal, "label", "left")
        .crossJoin(m)  # 1-row scalar
        .select(
            "label",
            ni.alias("n_internal"),
            "degree_sum",
            F.round(
                ni.cast("double") / F.col("m") - half * half, round_to
            ).alias("modularity_r"),
        )
    )


def common_neighbor_links(
    spark: SparkSession,
    edges: DataFrame,
    min_common: int = 2,
    max_center_degree: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Distance-2 link prediction: non-adjacent pairs scored by common
    neighbors and Jaccard coefficient.

    Returns (src, dst, common_neighbors, jaccard_r) with src < dst,
    common_neighbors >= min_common, and (src, dst) NOT an existing edge.
    jaccard_r = round(cn / (deg(src) + deg(dst) − cn), round_to).

    ``max_center_degree`` drops wedges centered on vertices whose degree
    exceeds the cap — bounds the Σdeg² fan-out on power-law graphs at the
    cost of undercounting pairs mediated only by hubs. None = exact.
    """
    und = canonicalize(edges).persist()
    sym = symmetrize(und)
    if max_center_degree is not None:
        deg_v = degrees(und).filter(F.col("degree") <= max_center_degree)
        sym = sym.join(
            deg_v.select(F.col("id").alias("dst")), "dst", "left_semi"
        )
    s1 = sym.select(F.col("src").alias("a"), F.col("dst").alias("v"))
    s2 = sym.select(F.col("src").alias("v"), F.col("dst").alias("b"))
    cn = (
        s1.join(s2, "v")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common_neighbors"))
        .filter(F.col("common_neighbors") >= min_common)
    )
    non_edges = cn.join(
        und,
        (cn["a"] == und["src"]) & (cn["b"] == und["dst"]),
        "left_anti",
    )
    deg = degrees(und)
    da = deg.select(F.col("id").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("degree").alias("db"))
    cnd = F.col("common_neighbors").cast("double")
    return (
        non_edges.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").alias("src"),
            F.col("b").alias("dst"),
            "common_neighbors",
            F.round(
                cnd / (F.col("da") + F.col("db") - F.col("common_neighbors")),
                round_to,
            ).alias("jaccard_r"),
        )
    )


def clustering_coefficient(
    spark: SparkSession, edges: DataFrame, round_to: int = 6
) -> DataFrame:
    """Local clustering coefficient: cc_v = 2·T_v / (d_v·(d_v−1)), 0 when
    d_v < 2 — Watts–Strogatz 1998, composed from the degree-oriented
    triangle enumeration (operators/triangles.py) and the degree table.
    Integer inputs, one division — cross-engine exact. Returns
    (id, degree, n_triangles, cc_r) for every vertex of the graph."""
    from pgs_spark.operators.triangles import triangle_counts_per_vertex

    und = canonicalize(edges).persist()
    tri = triangle_counts_per_vertex(spark, und)
    deg = degrees(und)
    t = F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long")
    d = F.col("degree")
    return deg.join(tri, "id", "left").select(
        "id",
        "degree",
        t.alias("n_triangles"),
        F.round(
            F.when(
                d >= 2,
                (F.lit(2.0) * t.cast("double")) / (d * (d - 1)).cast("double"),
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("cc_r"),
    )


def degree_assortativity(
    spark: SparkSession, edges: DataFrame, round_to: int = 6
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over the darts of the undirected graph,
    r = (M·Σ d_u d_v − (Σ d_u)²) / (M·Σ d_u² − (Σ d_u)²). Every sum is an
    exact integer over the symmetrized edge list (degrees are integers), so
    the single final division is the only float op — cross-engine exact.
    Returns one row (n_darts, assortativity_r).

    Scale shape: two degree joins onto the dart table plus one global
    aggregate — the same joins the triangle orientation pays, no iteration.
    """
    und = canonicalize(edges)
    deg = degrees(und)
    sym = symmetrize(und)
    paired = (
        sym.join(deg.select(F.col("id").alias("src"), F.col("degree").alias("du")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("dv")), "dst")
    )
    agg = paired.agg(
        F.count("*").alias("m"),
        F.sum("du").alias("s1"),
        F.sum(F.col("du") * F.col("dv")).alias("s2"),
        F.sum(F.col("du") * F.col("du")).alias("s3"),
    )
    num = (F.col("m") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    den = (F.col("m") * F.col("s3") - F.col("s1") * F.col("s1")).cast("double")
    return agg.select(
        F.col("m").alias("n_darts"),
        F.round(
            F.when(den != 0.0, num / den).otherwise(F.lit(0.0)), round_to
        ).alias("assortativity_r"),
    )


def reciprocity(spark: SparkSession, edges: DataFrame, round_to: int = 6) -> DataFrame:
    """Directed-graph reciprocity: the fraction of directed edges whose
    reverse edge also exists (self-loops excluded, duplicates collapsed).
    Exact integer ratio. Returns one row (n_edges, n_reciprocal, recip_r).

    Scale shape: one distinct + one self-equi-join on the reversed key —
    never all-pairs."""
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    return e.agg(F.count("*").alias("n_edges")).crossJoin(
        recip.agg(F.count("*").alias("n_reciprocal"))
    ).select(
        "n_edges",
        "n_reciprocal",
        F.round(
            F.col("n_reciprocal").cast("double") / F.col("n_edges").cast("double"),
            round_to,
        ).alias("recip_r"),
    )


def resource_allocation_links(
    spark: SparkSession,
    edges: DataFrame,
    min_common: int = 2,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Resource-allocation link prediction (Zhou, Lu, Zhang 2009): score a
    non-adjacent distance-2 pair by Σ_z 1/deg(z) over common neighbors z —
    the degree-weighted refinement of ``common_neighbor_links`` (low-degree
    mediators count for more; the strongest simple predictor in the Zhou
    et al. benchmark, ahead of Adamic-Adar, with no transcendental log).

    DETERMINISM: a float Σ 1/deg is summation-order-dependent (IEEE doubles
    are not associative), and Spark and DuckDB aggregate groups in different
    orders — so the score is computed in FIXED-POINT MICRO-UNITS:
    ra_micro = Σ CAST(ROUND(1e6/deg(z)) AS BIGINT). Each term is one
    correctly-rounded IEEE division + one half-away-from-zero round
    (identical in both engines); the sum is then an order-free integer —
    bit-exact cross-engine, no epsilon anywhere. ra = ra_micro / 1e6 at 6dp
    precision, the same resolution every rounded float in this engine gets.

    Same wedge-join plan (and hub cap) as ``common_neighbor_links``; the
    center's degree joins BEFORE the pair groupBy, so the aggregate is one
    map-side-combinable integer SUM.

    Returns (src, dst, common_neighbors, ra_micro) with src < dst,
    non-adjacent, common_neighbors >= min_common.
    """
    und = canonicalize(edges).persist()
    sym = symmetrize(und)
    deg = degrees(und)
    if max_center_degree is not None:
        deg = deg.filter(F.col("degree") <= max_center_degree)
    term = F.round(F.lit(1000000.0) / F.col("degree"), 0).cast("long")
    center = deg.select(F.col("id").alias("v"), term.alias("ra_term"))
    s1 = sym.select(F.col("src").alias("a"), F.col("dst").alias("v"))
    s2 = sym.select(F.col("src").alias("v"), F.col("dst").alias("b"))
    cn = (
        s1.join(center, "v")
        .join(s2, "v")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.sum("ra_term").alias("ra_micro"),
        )
        .filter(F.col("common_neighbors") >= min_common)
    )
    non_edges = cn.join(
        und,
        (cn["a"] == und["src"]) & (cn["b"] == und["dst"]),
        "left_anti",
    )
    return non_edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst"),
        "common_neighbors", "ra_micro",
    )


def louvain_local_move(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 2,
    weight_col: str | None = None,
) -> DataFrame:
    """One level of Louvain community detection (Blondel et al. 2008): a
    fixed number of SYNCHRONOUS local-move rounds with ALL-INTEGER
    modularity gains.

    Role: the modularity-OPTIMIZING sibling of label_propagation — the
    reference's stochasticMerge family grows regions by local merging
    (PGS_Meshing.java:693-725); Louvain's phase-1 is the principled version
    of that move rule (each vertex joins the neighboring community with the
    largest modularity gain). ``modularity_by_community`` scores a partition;
    this operator improves one.

    DETERMINISM: classic Louvain is sequential (vertices move one at a time,
    visit order matters). The distributed variant here moves EVERY vertex
    simultaneously each round (the standard Spark/Giraph "parallel Louvain"
    relaxation) and resolves the argmax with pure integers: on an unweighted
    graph the gain of moving v into community c is, up to the positive
    constant 1/(2m²),

        gain_scaled(v, c) = 2m·k_{v,c} − deg(v)·(tot(c) − [c = comm(v)]·deg(v))

    where k_{v,c} = edges from v into c, tot(c) = Σ deg over c (own
    community evaluated with v removed — the standard self-exclusion). All
    terms are BIGINTs, so argmax-by-(gain DESC, comm ASC) replays exactly in
    DuckDB (plans/oracle_sql.louvain_sql unrolls the identical program); no
    float ever appears.

    SWAP GUARD: fully synchronous moves suffer the classic oscillation —
    two adjacent singleton vertices each move into the OTHER's community in
    the same round, leaving both mis-labeled (modularity can go DOWN).
    Grappolo's remedy (Lu, Halappanavar, Kalyanaraman 2015, Parallel
    Computing 47): a singleton vertex may move into another SINGLETON
    community only when the target community id is SMALLER than its own —
    the smaller-id side stays put, so every 2-swap is broken
    deterministically while clique collapse (many→one) is unaffected.

    Scale shape per round: one |E|-sized join of labels onto the darts with
    a map-side-combinable COUNT per (vertex, neighbor-community), one
    |V|-sized degree-sum per community, one struct-min per vertex. No
    all-pairs, no windows over the whole relation; the 1-row m joins by
    crossJoin (broadcast scalar).

    With ``weight_col`` (the reference's weighted graphs —
    PGS_Conversion.setEdgeWeight, PGS_Conversion.java:933; here integer
    co-occurrence counts) the caller passes an already-canonical weighted
    edge table and every quantity becomes its weighted form: m = Σw,
    degree = vertex strength Σw, k_{v,c} = Σw into c — Newman's weighted
    modularity gain. Weights are integers, so the arithmetic stays exact.

    Returns (id, comm) after ``rounds`` synchronous rounds.
    """
    from pgs_spark.operators.state import make_work_dir, snapshot

    work_dir = make_work_dir("pgs_louvain_")
    if weight_col is None:
        und = canonicalize(edges).select(
            "src", "dst", F.lit(1).cast("long").alias("w")
        ).persist()
    else:
        und = edges.select(
            "src", "dst", F.col(weight_col).cast("long").alias("w")
        ).persist()
    sym = und.union(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    deg = (
        sym.groupBy(F.col("src").alias("id"))
        .agg(F.sum("w").alias("degree"))
        .persist()
    )
    m = und.agg(F.sum("w").alias("m"))
    labels = deg.select("id", F.col("id").alias("comm"))
    for r in range(rounds):
        # each round reads the label table five times (tot, kvc, own,
        # others, siz) — snapshot to parquet so the prior round computes
        # once, not 5^r times, and the lineage stays one round deep (the
        # stress/kcore state discipline)
        labels = snapshot(labels, work_dir, f"labels_{r % 2}")
        tot = (
            labels.join(deg, "id")
            .groupBy("comm")
            .agg(F.sum("degree").alias("tot"))
        )
        kvc = (
            sym.join(
                labels.select(F.col("id").alias("dst"), F.col("comm")), "dst"
            )
            .groupBy(F.col("src").alias("id"), "comm")
            .agg(F.sum("w").alias("kvc"))
        )
        own = (
            labels.join(kvc, ["id", "comm"], "left")
            .select(
                "id",
                "comm",
                F.coalesce(F.col("kvc"), F.lit(0)).alias("kvc"),
                F.col("comm").alias("own_comm"),
            )
        )
        others = (
            kvc.join(
                labels.select("id", F.col("comm").alias("own_comm")), "id"
            )
            .filter(F.col("comm") != F.col("own_comm"))
            .select("id", "comm", "kvc", "own_comm")
        )
        cand = own.unionByName(others)
        siz = labels.groupBy("comm").agg(F.count("*").alias("csize"))
        cand = (
            cand.join(siz.withColumnRenamed("csize", "tgt_size"), "comm")
            .join(
                siz.select(
                    F.col("comm").alias("own_comm"),
                    F.col("csize").alias("own_size"),
                ),
                "own_comm",
            )
            .filter(
                ~(
                    (F.col("own_size") == 1)
                    & (F.col("tgt_size") == 1)
                    & (F.col("comm") > F.col("own_comm"))
                )
            )
            .select("id", "comm", "kvc", "own_comm")
        )
        scored = (
            cand.join(deg, "id")
            .join(tot, "comm")
            .crossJoin(m)  # 1-row scalar
            .select(
                "id",
                "comm",
                (
                    F.lit(2) * F.col("m") * F.col("kvc")
                    - F.col("degree")
                    * (
                        F.col("tot")
                        - F.when(
                            F.col("comm") == F.col("own_comm"), F.col("degree")
                        ).otherwise(F.lit(0))
                    )
                ).alias("gain"),
            )
        )
        labels = (
            scored.groupBy("id")
            .agg(F.min(F.struct((-F.col("gain")).alias("ng"), F.col("comm"))).alias("b"))
            .select("id", F.col("b.comm").alias("comm"))
        )
    return labels


def louvain_two_level(
    spark: SparkSession, edges: DataFrame, rounds: int = 2, rounds2: int = 2
) -> DataFrame:
    """Full two-level Louvain (Blondel et al. 2008, phases 1+2): run the
    local-move phase, CONTRACT each community to a super-vertex (phase 2 —
    parallel edges collapse into integer weights, the AreaMerge/merge_to_k
    contraction shape), then run the WEIGHTED local-move phase on the coarse
    graph and map the coarse communities back to the original vertices.

    This is the composition the classic algorithm iterates to a fixed point;
    two levels is the standard fixed-budget cut (the coarse graph after one
    contraction is typically orders of magnitude smaller, so level 2 is
    cheap). Everything stays integer: level-1 gains are unweighted counts,
    contracted edge weights are multiplicities, level-2 gains are weighted
    sums of those integers — the DuckDB oracle
    (plans/oracle_sql.louvain_two_level_sql) replays the whole pipeline.

    Scale shape: level 1 as louvain_local_move; the contraction is two
    |E|-sized label joins + one map-side-combinable SUM; level 2 runs on the
    |communities|-sized graph. Isolated communities (no cross edges) do not
    appear in the coarse graph and keep their level-1 label (COALESCE on the
    final map-back join).

    Returns (id, comm) — comm the level-2 community of each ORIGINAL vertex.
    """
    from pgs_spark.operators.state import make_work_dir, snapshot

    work_dir = make_work_dir("pgs_louvain2_")
    und = canonicalize(edges).persist()
    # snapshot each stage boundary: l1 feeds three consumers (two contraction
    # sides + the map-back) and l2's lineage would otherwise nest the whole
    # level-1 program once per reference
    l1 = snapshot(louvain_local_move(spark, und, rounds=rounds), work_dir, "l1")
    la = l1.select(F.col("id").alias("src"), F.col("comm").alias("ca"))
    lb = l1.select(F.col("id").alias("dst"), F.col("comm").alias("cb"))
    coarse = (
        und.join(la, "src")
        .join(lb, "dst")
        .filter(F.col("ca") != F.col("cb"))
        .select(
            F.least("ca", "cb").alias("src"),
            F.greatest("ca", "cb").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("weight"))
    )
    coarse = snapshot(coarse, work_dir, "coarse")
    l2 = louvain_local_move(
        spark, coarse, rounds=rounds2, weight_col="weight"
    ).select(F.col("id").alias("comm"), F.col("comm").alias("comm2"))
    return (
        l1.join(l2, "comm", "left")
        .select("id", F.coalesce(F.col("comm2"), F.col("comm")).alias("comm"))
    )


def edge_jaccard(
    spark: SparkSession,
    edges: DataFrame,
    max_center_degree: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Structural (neighborhood-Jaccard) similarity of every EXISTING edge —
    the SCAN / local-similarity-sparsification primitive (Xu et al. 2007;
    Satuluri et al. 2011): for an edge (u, v) with open neighborhoods,
    J = |N(u) ∩ N(v)| / |N(u) ∪ N(v)| where the union size is
    deg(u) + deg(v) − cn (u ∈ N(v) and v ∈ N(u) each sit on exactly one
    side, so they stay in the union either way). The complement of
    ``common_neighbor_links``: that scores distance-2 NON-edges, this
    scores the edges themselves — the weight a similarity-sparsifier or
    SCAN clustering thresholds on.

    Returns (src, dst, common_neighbors, deg_src, deg_dst, jaccard_r) with
    one row per canonical edge — cn = 0 edges included (their Jaccard is
    exactly 0.0, and a sparsifier must see them to cut them).

    DETERMINISM: cn and both degrees are exact integers; jaccard_r is a
    single integer division rounded to 6dp — cross-engine exact.

    Scale shape: cn-per-edge is the triangle-support join (the same shape
    k-truss iterates): wedge fan-out Σ deg(v)² immediately semi-joined back
    onto the edge set, then one groupBy per edge — never materialized
    all-pairs. ``max_center_degree`` is the standard hub cap (disclosed
    approximation) bounding the wedge fan-out on power-law graphs; None =
    exact, the gate regime.
    """
    und = canonicalize(edges).persist()
    sym = symmetrize(und)
    wedge_src = sym
    if max_center_degree is not None:
        deg_cap = degrees(und).filter(F.col("degree") <= max_center_degree)
        wedge_src = sym.join(
            deg_cap.select(F.col("id").alias("dst")), "dst", "left_semi"
        )
    s1 = wedge_src.select(F.col("dst").alias("v"), F.col("src").alias("a"))
    s2 = wedge_src.select(F.col("dst").alias("v"), F.col("src").alias("b"))
    # wedge (a —v— b) with a < b, kept only when (a, b) is itself an edge:
    # the per-edge triangle-support count.
    cn = (
        s1.join(s2, "v")
        .filter(F.col("a") < F.col("b"))
        .join(
            und.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            ["a", "b"],
            "left_semi",
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("cn"))
    )
    deg = degrees(und)
    da = deg.select(F.col("id").alias("src"), F.col("degree").alias("deg_src"))
    db = deg.select(F.col("id").alias("dst"), F.col("degree").alias("deg_dst"))
    cn_col = F.coalesce(F.col("cn"), F.lit(0))
    return (
        und.join(
            cn.select(F.col("a").alias("src"), F.col("b").alias("dst"), "cn"),
            ["src", "dst"],
            "left",
        )
        .join(da, "src")
        .join(db, "dst")
        .select(
            "src",
            "dst",
            cn_col.alias("common_neighbors"),
            "deg_src",
            "deg_dst",
            F.round(
                cn_col.cast("double")
                / (F.col("deg_src") + F.col("deg_dst") - cn_col).cast("double"),
                round_to,
            ).alias("jaccard_r"),
        )
    )


def rich_club(
    spark: SparkSession,
    edges: DataFrame,
    round_to: int = 6,
) -> DataFrame:
    """Rich-club coefficient ladder (Zhou & Mondragon 2004; Colizza et al.
    2006, unnormalized): for each degree threshold k,

        phi(k) = 2 * E_>k / (N_>k * (N_>k - 1))

    where N_>k counts vertices with degree > k and E_>k counts edges whose
    BOTH endpoints have degree > k — the edge density among the hubs. On a
    code link graph this is the "do the mega-frameworks all import each
    other" diagnostic; the k ladder is every degree value present (phi only
    changes at those points).

    Returns (k, n_club, e_club, phi_r) for thresholds with n_club >= 2.

    DETERMINISM: n_club/e_club are exact integers; phi_r is one double
    division 2.0*E/(N*(N-1)) rounded to 6dp — cross-engine exact.

    Scale shape: the only data-sized passes are the degree groupBy and ONE
    edges x degrees join pair producing per-edge min-endpoint-degree; both
    reduce to DEGREE HISTOGRAMS (<= #distinct degrees rows — hundreds even
    at web scale, by power-law tail sparsity). The per-threshold suffix
    sums are a non-equi join of those two tiny histograms against the tiny
    threshold ladder — broadcast nested-loop on aggregate-sized relations,
    never a second pass over edges. No windows, no collect.
    """
    und = canonicalize(edges).persist()
    deg = degrees(und).persist()
    # per-edge min endpoint degree -> edge histogram
    ds = deg.select(F.col("id").alias("src"), F.col("degree").alias("dsrc"))
    dd = deg.select(F.col("id").alias("dst"), F.col("degree").alias("ddst"))
    edge_hist = (
        und.join(ds, "src")
        .join(dd, "dst")
        .select(F.least("dsrc", "ddst").alias("m"))
        .groupBy("m")
        .agg(F.count("*").alias("ne"))
    )
    node_hist = deg.groupBy(F.col("degree").alias("d")).agg(
        F.count("*").alias("nd")
    )
    ks = node_hist.select(F.col("d").alias("k"))
    # non-equi suffix-sum joins: both sides are degree histograms
    # (aggregate-sized, <= #distinct degrees) — broadcast the histogram so
    # the planner emits a BroadcastNestedLoopJoin, never a CartesianProduct
    # over a shuffled relation.
    nk = (
        ks.join(F.broadcast(node_hist), node_hist["d"] > ks["k"])
        .groupBy("k")
        .agg(F.sum("nd").alias("n_club"))
    )
    ek = (
        ks.join(F.broadcast(edge_hist), edge_hist["m"] > ks["k"])
        .groupBy("k")
        .agg(F.sum("ne").alias("e_club"))
    )
    e_club = F.coalesce(F.col("e_club"), F.lit(0).cast("long"))
    return (
        nk.join(ek, "k", "left")
        .filter(F.col("n_club") >= 2)
        .select(
            "k",
            "n_club",
            e_club.alias("e_club"),
            # two sequential divisions, not /(N*(N-1)): the int64 product
            # overflows at web-scale N (~1e10 hubs at small k); the double
            # intermediate is the identical tree in the DuckDB oracle.
            F.round(
                F.lit(2.0) * e_club / F.col("n_club")
                / (F.col("n_club") - F.lit(1)),
                round_to,
            ).alias("phi_r"),
        )
    )


def cocitation_pairs(
    spark: SparkSession,
    directed_edges: DataFrame,
    min_common: int = 2,
    max_key_degree: int | None = None,
    transpose: bool = False,
) -> DataFrame:
    """CO-CITATION (Small 1973) / BIBLIOGRAPHIC COUPLING (Kessler 1963) —
    the directed-graph link-analysis pair measures: co-citation counts, for
    each unordered pair {a, b}, the sources that point at BOTH (shared
    in-neighbors); coupling counts the targets both point AT (shared
    out-neighbors). The directed complement of ``common_neighbor_links``
    (which scores undirected distance-2 pairs): here direction carries the
    semantics — on a code link graph, co-cited modules are ones the same
    importers depend on (substitutes/siblings), coupled modules share a
    dependency footprint. Reference role: the same shared-key pair
    derivation as toDualGraph's records-sharing-a-key edges
    (PGS_Conversion.java:1068-1108) with the key being a graph vertex
    rather than a record field.

    ``transpose=True`` swaps src/dst first, turning the co-citation join
    into coupling — one operator, both measures (coupling(G) ==
    cocitation(Gᵀ), asserted in tests).

    DETERMINISM: pure integer counting over a DISTINCT edge set — no
    floats anywhere; bit-exact vs the DuckDB twin (oracle_sql.
    cocitation_sql), no epsilon.

    Scale shape: one self-equi-join of the edge table on the shared
    endpoint collapsed immediately by a map-side-combinable COUNT per
    (a, b) — fan-out Σ deg(key)², the rectangle_count/edge_jaccard wedge
    discipline. ``max_key_degree`` drops hub keys above a degree cap (the
    standard power-law bound — DISCLOSED via the argument, never silent;
    None = exact, the gate regime). min_common prunes the long tail of
    1-shared-neighbor pairs before the result materializes.

    Returns (a, b, n_common) with a < b and n_common >= min_common.
    """
    e = (
        directed_edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if transpose:
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    if max_key_degree is not None:
        keydeg = e.groupBy("src").agg(F.count("*").alias("kd"))
        ok = keydeg.filter(F.col("kd") <= max_key_degree).select("src")
        e = e.join(ok, "src", "left_semi")
    s1 = e.select(F.col("src").alias("k"), F.col("dst").alias("a"))
    s2 = e.select(F.col("src").alias("k"), F.col("dst").alias("b"))
    return (
        s1.join(s2, "k")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
