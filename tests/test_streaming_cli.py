"""Structured Streaming smoke + CLI job round-trip.

The reference is batch-only (SURVEY §2.10) and the north rule asks for batch
supersteps with resumable checkpoints — but the engine's relational layer is
also consumable incrementally; this smoke test pins that the same windowed
aggregation logic runs under Structured Streaming (micro-batch over the
events parquet, memory sink)."""

import json
import os

from pyspark.sql import functions as F


def test_streaming_windowed_counts(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(os.path.dirname(src) + "/")
    agg = (
        stream.filter(F.col("event_type").isNotNull())
        .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ → event-time type
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("ev_counts")
        .option("checkpointLocation", str(tmp_path / "sck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT count(*) AS n FROM ev_counts").first()["n"]
    # append mode emits only watermark-closed windows; the last day stays open
    ref = spark.read.parquet(src).select(
        F.date_trunc("day", "ts").alias("d"), "event_type"
    ).distinct().count()
    assert got > 0
    assert got <= ref


def test_cli_pagerank_roundtrip(spark, tmp_path, capsys):
    from pgs_spark.cli import main

    edges_path = str(tmp_path / "edges")
    out_path = str(tmp_path / "ranks")
    spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long"
    ).write.parquet(edges_path)
    main(["pagerank", "--edges", edges_path, "--out", out_path, "--tol", "1e-8",
          "--checkpoint-dir", str(tmp_path / "ck")])
    ranks = spark.read.parquet(out_path)
    rows = ranks.collect()
    assert len(rows) == 4
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-9
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["converged"]


def test_cli_components_roundtrip(spark, tmp_path, capsys):
    from pgs_spark.cli import main

    edges_path = str(tmp_path / "e2")
    out_path = str(tmp_path / "c2")
    spark.createDataFrame(
        [(5, 1), (9, 1), (20, 21)], "src long, dst long"
    ).write.parquet(edges_path)
    main(["components", "--edges", edges_path, "--out", out_path])
    got = {r["id"]: r["component"] for r in spark.read.parquet(out_path).collect()}
    assert got == {1: 1, 5: 1, 9: 1, 20: 20, 21: 20}


def test_streaming_window_counts_match_batch(spark):
    """The availableNow streaming pipeline must equal the batch floor-bucket
    aggregation on the same static parquet (determinism = oracle-checkable)."""
    from pyspark.sql import functions as F

    from pgs_spark.streaming.windows import windowed_event_counts

    path = "/root/testdata/sf0.001/events.parquet"
    got = {
        (r["window_start_us"], r["event_type"]): r["n"]
        for r in windowed_event_counts(spark, path).collect()
    }
    win = 10 * 60 * 1_000_000
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    batch = (
        spark.read.parquet(path)
        .groupBy(
            (F.floor(us / win) * win).alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
    )
    want = {(r["w"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want and len(got) > 10


def test_cli_coloring_and_merge_to_k_jobs(spark, tmp_path):
    """The spark-submit job surface for the round-2 operators: run both CLI
    commands in subprocesses against a small edge parquet and check their
    JSON reports + parquet outputs."""
    import subprocess
    import sys

    e = spark.createDataFrame(
        [(i, (i + 1) % 30) for i in range(30)] + [(0, 15), (3, 27)],
        "src long, dst long",
    )
    edges = str(tmp_path / "edges")
    e.write.mode("overwrite").parquet(edges)

    def run(cmd):
        r = subprocess.run(
            [sys.executable, "-m", "pgs_spark.cli"] + cmd,
            capture_output=True, text=True, check=True, cwd="/root/repo",
        )
        return json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])

    col = run(["coloring", "--edges", edges, "--out", str(tmp_path / "colors")])
    assert col["converged"] and col["conflicts"] == 0
    assert spark.read.parquet(str(tmp_path / "colors")).count() == 30

    mk = run(["merge-to-k", "--edges", edges, "--out", str(tmp_path / "groups"), "--k", "3"])
    assert mk["n_groups"] == 3
    assert spark.read.parquet(str(tmp_path / "groups")).count() == 30


def test_points_in_intervals_exact(spark):
    """Strip-bucketed containment lookup: half-open [lo, hi), pairs emitted
    exactly once even when an interval spans many strips."""
    from pgs_spark.operators.interval import points_in_intervals

    pts = spark.createDataFrame(
        [(1, 5), (2, 100), (3, 250), (4, -10)], "pid long, v long"
    )
    ivs = spark.createDataFrame(
        [(10, 0, 10), (11, 0, 300), (12, 100, 101), (13, 240, 260)],
        "iid long, lo long, hi long",
    )
    got = {
        (r["pid"], r["iid"])
        for r in points_in_intervals(pts, ivs, width=7).collect()
    }
    assert got == {
        (1, 10), (1, 11),          # 5 in [0,10) and [0,300)
        (2, 11), (2, 12),          # 100 in [0,300) and [100,101)
        (3, 11), (3, 13),          # 250 in [0,300) and [240,260)
    }                              # -10 in nothing; hi is exclusive


def test_stream_foreach_batch_consumer(spark, tmp_path):
    """foreachBatch egress: the user Consumer sees every row exactly once
    across micro-batches (availableNow drain == batch relation)."""
    from pgs_spark.streaming.foreach_sink import stream_foreach_batch

    src = str(tmp_path / "nums")
    spark.range(0, 1000).selectExpr("id", "id % 7 AS k").write.parquet(src)
    seen = {"rows": 0, "ksum": 0, "batches": 0}

    def consumer(bdf, bid):
        from pyspark.sql import functions as F

        row = bdf.groupBy().agg(
            F.count("*").alias("n"), F.sum("k").alias("s")
        ).first()
        seen["rows"] += row["n"]
        seen["ksum"] += row["s"]
        seen["batches"] += 1

    stream_foreach_batch(spark, src, consumer)
    assert seen["rows"] == 1000
    assert seen["ksum"] == sum(i % 7 for i in range(1000))
    assert seen["batches"] >= 1


def test_streaming_quality_census_equals_batch(spark, tmp_path):
    """availableNow census drain == batch groupBy on the same parquet, even
    when the input arrives as multiple files."""
    import pandas as pd

    from pgs_spark.functions import text as tx
    from pgs_spark.streaming.windows import streaming_quality_census

    d = tmp_path / "docs"
    d.mkdir()
    rows1 = [(1, "the quick brown fox jumps over the lazy dog", "en"),
             (2, "zzz qqq xxx", "xx")]
    rows2 = [(3, "a be or not to be that is the question here", "en"),
             (4, "the and of to in is it", "en")]
    for i, rows in enumerate([rows1, rows2]):
        spark.createDataFrame(rows, "doc_id long, text string, lang string") \
            .coalesce(1).write.parquet(str(d / f"part{i}"))
    # flatten into one dir of files
    import shutil, glob
    out = tmp_path / "flat"
    out.mkdir()
    for j, f in enumerate(sorted(glob.glob(str(d / "part*" / "*.parquet")))):
        shutil.copy(f, out / f"f{j}.parquet")

    got = streaming_quality_census(spark, str(out)).toPandas()
    batch = (
        spark.read.parquet(str(out))
        .select(
            "lang",
            tx.token_count(F.col("text")).alias("n_tok"),
            (tx.quality_score(F.col("text")) >= 0.5).cast("long").alias("hq"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("hq").alias("n_high_quality"),
        )
        .toPandas()
    )
    key = lambda df: df.sort_values("lang", ignore_index=True)
    pd.testing.assert_frame_equal(key(got), key(batch), check_dtype=False)


def test_cli_corpus_clean_roundtrip(spark, tmp_path, capsys):
    from pgs_spark.cli import main

    docs_path = str(tmp_path / "docs")
    out_path = str(tmp_path / "clean")
    good = "the quick brown fox jumps over the lazy dog and runs far away home"
    spark.createDataFrame(
        [
            (1, good, "en"),
            (2, good, "en"),  # exact dup of 1 -> dropped
            (3, "zzz 123 $$$ %%% ### !!!", "xx"),  # low quality -> dropped
            (4, "many hands make light work when the team shares every task well", "en"),
        ],
        "doc_id long, text string, lang string",
    ).write.parquet(docs_path)
    main(["corpus-clean", "--docs", docs_path, "--out", out_path])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_input"] == 4
    assert stats["n_kept"] == 2  # exact dup and junk removed
    kept_ids = {r.doc_id for r in spark.read.parquet(out_path).collect()}
    assert kept_ids == {1, 4}


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    """availableNow CMS drain == the batch depth×width sketch, cell for
    cell, regardless of file-split arrival order."""
    import pandas as pd

    from pgs_spark.streaming.windows import streaming_cms_sketch

    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"alpha beta{i % 3} gamma{i % 7} alpha", "en") for i in range(40)],
        "doc_id long, text string, lang string",
    ).repartition(4).write.parquet(docs_path)

    got = streaming_cms_sketch(spark, docs_path, depth=4, width=16).toPandas()
    from pgs_spark.functions.text import tokens

    rows = F.array(*[F.lit(r) for r in range(4)])
    batch = (
        spark.read.parquet(docs_path)
        .select(F.explode(tokens(F.col("text"))).alias("term"))
        .select("term", F.explode(rows).alias("r"))
        .select(
            "r",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("r").cast("string"), F.lit("|"), F.col("term"))),
                        1, 6,
                    ), 16, 10,
                ).cast("long") % 16
            ).alias("b"),
        )
        .groupBy("r", "b")
        .agg(F.count("*").alias("c"))
        .toPandas()
    )
    key = lambda df: df.sort_values(["r", "b"], ignore_index=True)
    pd.testing.assert_frame_equal(key(got), key(batch), check_dtype=False)
    # bounded state: never more than depth*width cells
    assert len(got) <= 4 * 16
