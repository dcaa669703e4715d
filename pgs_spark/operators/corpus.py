"""Corpus-level quality signals over a documents table.

The per-document scalar signals live in functions/text.py (pure column
exprs); these two need CORPUS-WIDE statistics — an n-gram count table the
documents are then scored against — so they are operators (joins +
aggregations), not column functions. Both are strict aggregation pipelines:
explode n-grams → count by key (map-side combinable) → join instances back →
per-doc aggregate. Nothing is ever all-pairs, and the count tables shuffle
on the n-gram key where partial aggregation absorbs hot n-grams, so the
shape survives a 100-TB corpus unchanged.

Oracles: plans/docs_sql.lm_score_sql / ngram_novelty_sql.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pgs_spark.functions.text import shingles_from_tokens, tokens


def lm_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_bigrams, avg_logp): per-doc average ln p(w2|w1) under the
    corpus-wide MLE bigram model — the CCNet-style fluency signal. p is
    c(w1 w2)/c(w1 ·) with c(w1 ·) counting bigram INSTANCES starting with
    w1, so every probability is a ratio of exact integers; ln() is the only
    libm call and the 6dp round after the average buries its 1-ulp
    cross-engine slack. Docs with < 2 tokens have no bigrams and drop out."""
    bi = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_w"))
        .select("doc_id", F.explode(shingles_from_tokens(F.col("_w"), 2)).alias("g"))
        .withColumn("w1", F.substring_index("g", " ", 1))
        .persist()
    )
    cg = bi.groupBy("g").agg(F.count("*").alias("cg"))
    cw = bi.groupBy("w1").agg(F.count("*").alias("cw"))
    out = (
        bi.join(cg, "g")
        .join(cw, "w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(F.log(F.col("cg").cast("double") / F.col("cw").cast("double"))), 6
            ).alias("avg_logp"),
        )
    )
    return out


def ngram_novelty(
    docs: DataFrame, k: int = 4, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_shingles, dup_frac): fraction of each doc's DISTINCT
    k-shingles occurring in at least one OTHER document (df ≥ 2) — the
    RefinedWeb/Dolma-style duplication signal one step below full near-dup
    clustering. Exact integer ratio, single division — cross-engine exact.
    Docs shorter than k tokens have no shingles and drop out."""
    sh = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_w"))
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles_from_tokens(F.col("_w"), k))).alias("g"),
        )
        .persist()
    )
    df_tab = sh.groupBy("g").agg(F.count("*").alias("df"))
    return (
        sh.join(df_tab, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.round(
                F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )


def decontaminate(
    docs: DataFrame,
    k: int = 5,
    eval_mod: int = 41,
    threshold: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C discipline): flag
    training documents sharing any k-gram with a held-out eval set.

    The eval set is the deterministic slice doc_id % eval_mod == 0 (standing
    in for an external benchmark table — same join shape either way); every
    OTHER doc is scored: (doc_id, n_shingles, n_hit, contaminated) where
    n_hit counts its DISTINCT k-shingles that appear anywhere in the eval
    set and contaminated = 1 when n_hit >= threshold.

    Scale shape: the eval side collapses to a DISTINCT k-gram key table —
    benchmarks are tiny relative to a training corpus, so on a cluster this
    side broadcasts and the training-side explode never reshuffles; here it
    is an ordinary equi-join the optimizer is free to broadcast. Exact
    integer output — cross-engine exact. Oracle:
    plans/docs_sql.decontaminate_sql.
    """
    sh = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_w"))
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles_from_tokens(F.col("_w"), k))).alias("g"),
        )
    )
    eval_grams = (
        sh.filter(F.col("doc_id") % eval_mod == 0).select("g").distinct()
        .withColumn("_hit", F.lit(1))
    )
    train = sh.filter(F.col("doc_id") % eval_mod != 0)
    return (
        train.join(eval_grams, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_hit",
            F.when(F.col("n_hit") >= threshold, F.lit(1)).otherwise(F.lit(0)).alias(
                "contaminated"
            ),
        )
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    shares: dict[str, float] | None = None,
) -> DataFrame:
    """Domain-mix rebalancing: deterministic per-stratum downsampling toward
    target corpus shares (the data-mixing step of a training pipeline —
    Gopher/LLaMA-style domain weights).

    Per stratum s: rate_s = min(1, target_s·N / n_s) where target_s is the
    requested share (uniform 1/|S| when ``shares`` is None — pure
    rebalancing). A doc is kept iff u(doc_id) < rate_s with
    u = md5(doc_id|seed)[0:6] / 16^6 — the same deterministic unit-uniform
    used by layout.py, so the decision replays bit-identically in any
    engine, any partitioning, any run.

    Returns the per-stratum report (stratum, n_docs, n_kept, rate_r): it
    covers every individual keep decision (n_kept is their sum) while
    keeping the gate row count at |S|.

    Scale shape: one groupBy for the census (map-side combinable), the
    |S|-row rate table broadcast back onto the corpus, one filter, one
    groupBy — a 100-TB corpus makes exactly two shuffle-light passes and the
    keep decision never leaves the row it applies to.
    """
    cnt = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").alias("n_docs")
    )
    tot = cnt.agg(
        F.sum("n_docs").cast("double").alias("n_total"),
        F.count("*").cast("double").alias("n_strata"),
    )
    if shares is None:
        target = F.col("n_total") / F.col("n_strata")
    else:
        share = F.coalesce(
            *[
                F.when(F.col("stratum") == k, F.lit(float(v)))
                for k, v in sorted(shares.items())
            ],
            F.lit(0.0),
        )
        target = share * F.col("n_total")
    # |S|-row rate table feeds BOTH the keep filter and the report base;
    # persist so the census runs once (unpersisted, the plan duplicates the
    # full corpus groupBy into each branch — two extra passes at 100 TB).
    rates = (
        cnt.crossJoin(tot)
        .select(
            "stratum",
            "n_docs",
            F.least(F.lit(1.0), target / F.col("n_docs").cast("double")).alias("rate"),
        )
        .persist()
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"|mix{seed}"))),
                1,
                6,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(16777216.0)
    )
    kept = (
        docs.select(F.col(strata_col).alias("stratum"), u.alias("u"))
        .join(rates.select("stratum", "rate"), "stratum")
        .filter(F.col("u") < F.col("rate"))
        .groupBy("stratum")
        .agg(F.count("*").alias("n_kept"))
    )
    return (
        rates.join(kept, "stratum", "left")
        .select(
            "stratum",
            "n_docs",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.round("rate", 6).alias("rate_r"),
        )
    )


def span_dedup(
    docs: DataFrame, k: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Duplicated-span coverage (the Lee et al. 2021 substring-dedup signal,
    positional form): for each doc, the fraction of its k-token span
    POSITIONS whose span also occurs in at least one OTHER document.

    Differs from ngram_novelty on both axes: every position counts (a span
    repeated 10× inside one doc weighs 10 positions, not 1 distinct gram)
    and the frequency is document frequency (COUNT(DISTINCT doc), so a
    within-doc repeat alone is NOT a duplicate). Exact integer ratio —
    cross-engine exact. Docs shorter than k tokens drop out.

    Scale shape: the span explosion is the MinHash shingle explosion; the
    doc-frequency table groups on the span key where partial aggregation
    absorbs hot spans; one equi-join back. Never all-pairs.
    """
    sh = (
        docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_w"))
        .select("doc_id", F.explode(shingles_from_tokens(F.col("_w"), k)).alias("g"))
        .persist()
    )
    docfreq = (
        sh.select("doc_id", "g")
        .distinct()
        .groupBy("g")
        .agg(F.count("*").alias("nd"))
    )
    return (
        sh.join(docfreq, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_dup_spans"),
            F.round(
                F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("dup_ratio_r"),
        )
    )


def dsir_weights(
    docs: DataFrame,
    n_buckets: int = 256,
    target_mod: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, hashed n-gram
    variant): score each raw document by how target-like its unigram
    distribution is, using hashed token buckets and Laplace-smoothed
    log-likelihood ratios.

    Target = the deterministic slice doc_id % target_mod == 0 (standing in
    for a curated high-quality corpus — same join shape either way); raw =
    every other doc, which is what gets scored. Features: token → bucket
    b = md5(token)[0:6] mod n_buckets. Per bucket,
    λ_b = ln((ct_b+1)/(CT+B)) − ln((cr_b+1)/(CR+B)); per raw doc,
    weight = Σ_b n_db·λ_b over its ≤B bucket counts. All counts are exact
    integers; ln is the only libm call and the per-doc sum spans ≤B terms,
    so the 6dp round buries cross-engine ulp drift (same argument as
    lm_score).

    Scale shape: one explode → two bucket censuses (map-side combinable,
    ≤B rows out) → the B-row λ table broadcasts back onto the per-doc
    bucket counts. The target side is a census, not a relation — a 100-TB
    corpus passes twice, shuffling only (doc, bucket) partial counts.
    """
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("w")
    ).select(
        "doc_id",
        (F.conv(F.substring(F.md5("w"), 1, 6), 16, 10).cast("long") % n_buckets).alias(
            "b"
        ),
    )
    tgt = tok.filter(F.col("doc_id") % target_mod == 0)
    raw = tok.filter(F.col("doc_id") % target_mod != 0).persist()

    ct = tgt.groupBy("b").agg(F.count("*").alias("ct"))
    cr = raw.groupBy("b").agg(F.count("*").alias("cr"))
    ct_tot = tgt.agg(F.count("*").alias("ct_total"))
    cr_tot = raw.agg(F.count("*").alias("cr_total"))
    lam = (
        cr.join(ct, "b", "left")
        .crossJoin(ct_tot)
        .crossJoin(cr_tot)
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("ct_total") + F.lit(n_buckets)).cast("double")
                )
                - F.log(
                    (F.col("cr") + F.lit(1)).cast("double")
                    / (F.col("cr_total") + F.lit(n_buckets)).cast("double")
                )
            ).alias("lam"),
        )
    )
    n_db = raw.groupBy("doc_id", "b").agg(F.count("*").alias("n_db"))
    return (
        n_db.join(lam, "b")
        .groupBy("doc_id")
        .agg(
            F.sum("n_db").alias("n_tokens"),
            F.round(F.sum(F.col("n_db").cast("double") * F.col("lam")), 6).alias(
                "weight_r"
            ),
        )
    )


def tfidf_top_terms(
    docs: DataFrame,
    top_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k terms by tf·idf (Spärck Jones 1972):
    tfidf(t, d) = tf(t,d) · ln(N / df(t)), ties broken by term ascending —
    deterministic feature extraction for retrieval/quality pipelines.

    Returns (doc_id, term, term_rank, tfidf_r). Both engines build tf and df
    as exact integers and apply one ln + one multiply, so pre-round doubles
    agree; the rank window orders by (tfidf DESC, term ASC), and identical
    doubles make the tie-break identical too.

    Scale shape: tf is one map-side-combinable groupBy over the token
    explosion; df aggregates tf (already one row per (doc, term)); the
    window partitions by doc — per-doc cardinality is bounded by vocabulary,
    never corpus size.
    """
    from pyspark.sql import Window

    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf")).persist()
    df_tab = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(df_tab, "term")
        .crossJoin(n_docs)  # 1-row scalar
        .select(
            "doc_id",
            "term",
            (
                F.col("tf").cast("double")
                * F.log(F.col("n_docs") / F.col("df").cast("double"))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top_k)
        .select("doc_id", "term", "term_rank", F.round("tfidf", 6).alias("tfidf_r"))
    )


def cms_token_counts(
    docs: DataFrame,
    depth: int = 4,
    width: int = 64,
    top_k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Count-min sketch over the token stream (Cormode–Muthukrishnan 2005)
    with DETERMINISTIC hash rows — md5(row|token) mod width — so the sketch
    replays identically in any engine and the one-sided error guarantee
    (estimate ≥ truth) is oracle-checkable.

    Returns the true top-k tokens (count DESC, token ASC) with their exact
    count and the sketch estimate: (term, true_count, cms_estimate).

    Scale shape: the sketch build is one explode ×depth → groupBy(row,
    bucket) — map-side combinable into EXACTLY depth·width rows, the
    classic "summarize a 100-TB stream into a broadcastable card" shape;
    the top-k truth side is the same token census tf-idf builds. All
    integers — cross-engine exact.
    """
    from pyspark.sql import Window

    tok = docs.select(
        F.explode(tokens(F.col(text_col))).alias("term")
    ).persist()
    rows = F.array(*[F.lit(r) for r in range(depth)])
    buckets = tok.select(
        "term", F.explode(rows).alias("r")
    ).select(
        "r",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("r").cast("string"), F.lit("|"), F.col("term"))),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % width
        ).alias("b"),
    )
    sketch = buckets.groupBy("r", "b").agg(F.count("*").alias("c"))

    truth = tok.groupBy("term").agg(F.count("*").alias("true_count"))
    w = Window.orderBy(F.col("true_count").desc(), F.col("term"))
    top = truth.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= top_k
    )
    probes = top.select(
        "term",
        "true_count",
        F.explode(rows).alias("r"),
    ).select(
        "term",
        "true_count",
        "r",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("r").cast("string"), F.lit("|"), F.col("term"))),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % width
        ).alias("b"),
    )
    return (
        probes.join(sketch, ["r", "b"])
        .groupBy("term", "true_count")
        .agg(F.min("c").alias("cms_estimate"))
    )


def funnel_counts(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel conversion: users who did stage1, then stage2 strictly
    later, then stage3 strictly later still (classic product-analytics
    funnel). Returns one row per stage: (stage_idx, stage, n_users).

    Pure relational: per-stage min-timestamp aggregation joined forward —
    three map-side-combinable groupBys and two user-key equi-joins; integer
    outputs, deterministic under timestamp ties (strict > drops same-instant
    conversions identically in both engines).
    """
    e = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t"), F.col(ts_col).alias("ts")
    )
    s1 = (
        e.filter(F.col("t") == stages[0])
        .groupBy("u")
        .agg(F.min("ts").alias("t1"))
        .persist()
    )
    s2 = (
        e.filter(F.col("t") == stages[1])
        .join(s1, "u")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("u")
        .agg(F.min("ts").alias("t2"))
        .persist()
    )
    s3 = (
        e.filter(F.col("t") == stages[2])
        .join(s2, "u")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("u")
        .agg(F.min("ts").alias("t3"))
    )
    rows = None
    for i, (name, df) in enumerate([(stages[0], s1), (stages[1], s2), (stages[2], s3)]):
        r = df.agg(F.count("*").alias("n_users")).select(
            F.lit(i + 1).alias("stage_idx"), F.lit(name).alias("stage"), "n_users"
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


def hll_distinct_tokens(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-group HyperLogLog distinct-token estimate using the HyperBall
    register construction (operators/hyperball.py: j = first md5 nibble of
    the token, rho = 17 − bitlength of the next 16 bits, m=16, raw
    estimator, no linear-counting correction — the same dyadic-exact
    cross-engine argument). Returns (group, n_tokens, distinct_est_r).

    The aggregation state is m rows per group regardless of corpus size —
    the bounded-sketch shape groupwise: a 100-TB corpus reduces to
    |groups|·16 register rows in one map-side-combinable pass.
    """
    h = F.md5(F.col("w"))
    w16 = F.conv(F.substring(h, 2, 4), 16, 10).cast("int")
    tok = docs.select(
        F.col(group_col).alias("grp"), F.explode(tokens(F.col(text_col))).alias("w")
    ).select(
        "grp",
        F.conv(F.substring(h, 1, 1), 16, 10).cast("int").alias("j"),
        F.when(w16 == 0, F.lit(17))
        .otherwise(F.lit(17) - F.length(F.bin(w16.cast("long"))))
        .cast("int")
        .alias("rho"),
    )
    counts = tok.groupBy("grp").agg(F.count("*").alias("n_tokens"))
    regs = tok.groupBy("grp", "j").agg(F.max("rho").alias("rho"))
    est = (
        F.lit(0.673 * 256.0)
        / (
            (F.lit(16) - F.count("*")).cast("double")
            + F.sum(F.lit(1.0) / F.expr("shiftleft(1, rho)").cast("double"))
        )
    )
    out = regs.groupBy("grp").agg(F.round(est, 6).alias("distinct_est_r"))
    return counts.join(out, "grp").select(
        F.col("grp").alias(group_col), "n_tokens", "distinct_est_r"
    )


def temperature_mix_weights(
    docs: DataFrame,
    strata_col: str = "lang",
    tau: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Temperature-scaled sampling weights for a multilingual/multi-domain
    training mix: p_s ∝ n_s^τ (the exponentiated-count rule of mBERT /
    XLM-R / mT5 — τ < 1 up-weights low-resource strata; τ=1 is proportional,
    τ=0 uniform). The companion of ``stratified_sample``: that operator
    APPLIES a share table, this one DERIVES the standard one.

    DETERMINISM: n_s^τ at the default τ=0.5 is SQRT, which IEEE 754 requires
    correctly rounded — so w_micro = CAST(ROUND(sqrt(n_s)·1e6) AS BIGINT) is
    bit-identical in Spark and DuckDB, and the normalizing Σ w_micro is an
    order-free integer sum (the ra_micro discipline). Other τ go through
    pow(), which is NOT guaranteed correctly rounded — supported for real
    pipelines, but the gate runs the exactly-replayable τ=0.5.

    Returns (stratum, n_docs, w_micro, weight_r, boost_r): weight_r the
    normalized sampling probability, boost_r = weight / (n_s/N) the over- /
    under-sampling factor each stratum gets.

    Scale shape: one map-side-combinable census groupBy + an |S|-row
    normalization — the corpus is scanned once, everything after is
    broadcast-sized.
    """
    cnt = docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").alias("n_docs")
    )
    if abs(tau - 0.5) < 1e-15:
        w = F.sqrt(F.col("n_docs").cast("double"))
    else:
        w = F.pow(F.col("n_docs").cast("double"), F.lit(float(tau)))
    pw = cnt.select(
        "stratum",
        "n_docs",
        F.round(w * F.lit(1000000.0), 0).cast("long").alias("w_micro"),
    )
    tot = pw.agg(
        F.sum("w_micro").alias("w_total"), F.sum("n_docs").alias("n_total")
    )
    return pw.crossJoin(tot).select(
        "stratum",
        "n_docs",
        "w_micro",
        F.round(
            F.col("w_micro").cast("double") / F.col("w_total").cast("double"),
            round_to,
        ).alias("weight_r"),
        F.round(
            (F.col("w_micro").cast("double") / F.col("w_total").cast("double"))
            / (F.col("n_docs").cast("double") / F.col("n_total").cast("double")),
            round_to,
        ).alias("boost_r"),
    )


def gopher_rules(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wlen: float = 3.0,
    max_mean_wlen: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stop_distinct: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, A1.1 — the
    filter battery most open corpora since have copied): per doc, the rule
    inputs plus a pass/fail verdict. Returns (doc_id, n_words, mean_wlen_r,
    alpha_word_frac_r, n_stop_distinct, n_rules_failed, passes).

    Rules graded (published thresholds, parameterized): word count in
    [min_words, max_words]; mean word length in [min_mean_wlen,
    max_mean_wlen]; fraction of words containing an alphabetic character
    >= min_alpha_frac; at least min_stop_distinct DISTINCT marker stopwords
    present (the Gopher "contains 2 of 8 stop words" rule, over the same
    marker list the quality_score signal uses).

    DETERMINISM: every input is an exact integer (token count, summed token
    lengths, filtered counts, distinct-intersection size); the two ratios
    are single divisions of exact integers rounded to 6dp — cross-engine
    exact. Comparisons against the thresholds happen on the ROUNDED values
    so both engines grade the same number.

    Scale shape: pure per-row column expressions (one projection, no joins,
    no shuffle) — whole-stage codegen end to end; a 100-TB corpus filters in
    a single map pass. Oracle: plans/docs_sql.gopher_rules_sql.
    """
    from pgs_spark.functions.text import STOPWORDS, tokens

    toks = tokens(F.col(text_col))
    n_words = F.size(toks)
    total_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-zA-Z]")))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        F.round(total_chars.cast("double") / n_words.cast("double"), 6).alias(
            "mean_wlen_r"
        ),
        F.round(n_alpha.cast("double") / n_words.cast("double"), 6).alias(
            "alpha_word_frac_r"
        ),
        n_stop.alias("n_stop_distinct"),
    )
    fails = (
        F.when(
            (F.col("n_words") < min_words) | (F.col("n_words") > max_words), 1
        ).otherwise(0)
        + F.when(
            (F.col("mean_wlen_r") < min_mean_wlen)
            | (F.col("mean_wlen_r") > max_mean_wlen),
            1,
        ).otherwise(0)
        + F.when(F.col("alpha_word_frac_r") < min_alpha_frac, 1).otherwise(0)
        + F.when(F.col("n_stop_distinct") < min_stop_distinct, 1).otherwise(0)
    )
    return base.select(
        "*",
        fails.alias("n_rules_failed"),
    ).withColumn(
        "passes", F.when(F.col("n_rules_failed") == 0, 1).otherwise(0)
    )


def c4_line_stats(
    docs: DataFrame,
    min_line_words: int = 5,
    min_kept_lines: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style line-level cleaning stats (Raffel et al. 2019 §2.2): split
    each document on newlines, keep a line iff it ends in terminal
    punctuation, has at least min_line_words words, and contains neither a
    curly brace nor the word "javascript" (case-insensitive); the document
    itself passes iff at least min_kept_lines lines survive. Returns
    (doc_id, n_lines, n_kept, kept_words, doc_pass).

    DETERMINISM: all-string predicates and integer counts — no floats
    anywhere, so the verdicts replay bit-identically in any engine. The
    terminal-punctuation test is against the RTRIMMED line ([.!?] as the
    last non-space character), matching C4's "terminal punctuation mark"
    rule without locale-dependent sentence segmentation.

    Scale shape: one per-row array pipeline (split -> filter -> aggregate)
    inside whole-stage codegen — no joins, no shuffle, single map pass over
    a 100-TB corpus. Oracle: plans/docs_sql.c4_line_stats_sql (the gate
    query plants deterministic multi-line structure first — the synthetic
    corpus is single-line by construction; same discipline as pii_scrub).
    """
    lines = F.split(F.col(text_col), "\n")

    def _kept(l):  # noqa: E741 - mirrors the C4 rule naming
        lw = F.lower(l)
        return (
            F.rtrim(l).rlike("[.!?]$")
            & (F.size(F.split(F.trim(l), r"\s+")) >= min_line_words)
            & ~lw.contains("{")
            & ~lw.contains("javascript")
        )

    kept = F.filter(lines, _kept)
    kept_words = F.aggregate(
        F.transform(kept, lambda l: F.size(F.split(F.trim(l), r"\s+"))),
        F.lit(0),
        lambda a, x: a + x,
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        kept_words.alias("kept_words"),
        F.when(F.size(kept) >= min_kept_lines, 1).otherwise(0).alias("doc_pass"),
    )


def vocab_coverage(
    docs: DataFrame,
    vocab_size: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    tok_out: list | None = None,
) -> DataFrame:
    """Tokenizer-vocabulary coverage: build the top-``vocab_size`` token
    vocabulary by corpus frequency (ties broken by token ascending — the
    deterministic-ordering discipline, PGS_Conversion.java:1087-1088) and
    score every document's OUT-OF-VOCABULARY token fraction against it.
    This is the coverage check run before committing to a tokenizer vocab:
    a doc slice with high OOV under the candidate vocabulary signals domain
    mismatch.

    All-integer: counts are exact, the vocabulary cut is a total order
    (count DESC, token ASC — no two tokens tie completely), and oov_micro =
    n_oov * 10^6 // n_tokens is one floor division — bit-exact vs the
    DuckDB twin (plans/docs_sql.vocab_coverage_sql), no epsilon.

    Scale shape: token counts are one map-side-combinable groupBy over the
    token explosion; the vocabulary is a vocab_size-row relation (orderBy +
    limit = distributed TakeOrdered, never a global sort of the corpus) that
    broadcast-joins back onto the explosion; the per-doc aggregate is again
    map-side combinable. Nothing is ever corpus-sized on one node.

    Returns (doc_id, n_tokens, n_oov, oov_micro).
    """
    from pyspark.sql.functions import broadcast

    # The exploded token relation feeds both the vocabulary cut and the
    # per-doc scoring join. One-shot callers let the session reap the cache;
    # LONG-LIVED sessions pass `tok_out` to receive the persisted DataFrame
    # and unpersist it once the result is materialized (the triangles()
    # ori_out discipline — otherwise every call leaks a corpus-sized cache).
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term")
    ).persist()
    if tok_out is not None:
        tok_out.append(tok)
    counts = tok.groupBy("term").agg(F.count("*").alias("c"))
    vocab = (
        counts.orderBy(F.desc("c"), F.asc("term"))
        .limit(vocab_size)
        .select("term", F.lit(1).alias("iv"))
    )
    return (
        tok.join(broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("iv").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.expr("(n_oov * 1000000) DIV n_tokens").alias("oov_micro"),
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
) -> DataFrame:
    """First-order MARKOV TRANSITION MATRIX over per-user event sequences —
    the probabilistic summary of the journeys funnel_counts thresholds: for
    every ordered pair of event types, the count of consecutive occurrences
    and the empirical transition probability P(to | from). The sequence
    derivation is the reference's consecutive-pair ring walk
    (PGS_Conversion.java:1068-1108 / operators/edges.py:48) applied to a
    user's event timeline instead of a face's vertex ring.

    DETERMINISM: the per-user order is (ts, tie_col) — a TOTAL order
    (event_id is unique), so LEAD is replayable; counts are exact integers
    and prob_micro = cnt * 10^6 // from_total is one floor division —
    bit-exact vs the DuckDB twin (docs_sql.event_transitions_sql).

    Scale shape: one window partitioned BY USER (millions of small
    partitions — no global sort), then a map-side-combinable count per
    (from, to) over a |types|² result; the from_total join is a broadcast
    of the |types|-row marginal. State never exceeds one user's events.

    Returns (from_type, to_type, n_transitions, prob_micro).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n_transitions").alias("from_total")
    )
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.expr("(n_transitions * 1000000) DIV from_total").alias(
                "prob_micro"
            ),
        )
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """RETENTION COHORT MATRIX — the product-analytics staple completing
    the events family (funnel_counts, event_transitions, sessionize): users
    are bucketed by their FIRST active day (the cohort); each later active
    day contributes to that cohort's retention at age = days since the
    cohort day. Row (cohort_day, age_days) counts the cohort's users active
    exactly age_days after their first day, with the retained fraction of
    the cohort in integer micro-units.

    DETERMINISM: day bucketing is calendar truncation of the event
    timestamp, MIN is order-free, the (user, day) DISTINCT makes each user
    count once per (cohort, age), and retention_micro = n_users * 10^6 //
    cohort_size is one floor division — bit-exact vs the DuckDB twin
    (docs_sql.retention_sql).

    Scale shape: one map-side-combinable MIN per user, one DISTINCT over
    (user, day) (both shuffle on user — co-partitioned, AQE coalesces), one
    equi-join back on user, then an aggregate over a |cohorts| x |ages|
    result; cohort sizes are a tiny relation broadcast back. No windows,
    nothing user-sequence-ordered, so no per-user sort at all.

    Returns (cohort_day, age_days, n_users, retention_micro) with
    cohort_day as an ISO yyyy-MM-dd string.
    """
    days = events.select(
        F.col(user_col).alias("u"), F.to_date(ts_col).alias("day")
    ).distinct()
    first = days.groupBy("u").agg(F.min("day").alias("cohort"))
    sizes = first.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    return (
        days.join(first, "u")
        .groupBy(
            "cohort", F.datediff("day", F.col("cohort")).alias("age_days")
        )
        .agg(F.count("*").alias("n_users"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.col("age_days").cast("int"),
            F.col("n_users").cast("long"),
            F.expr("(n_users * 1000000) DIV cohort_size").alias(
                "retention_micro"
            ),
        )
    )
