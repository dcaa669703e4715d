"""Generator determinism + extraction correctness (SURVEY §5.1, §5.6)."""

from pyspark.sql import functions as F

from pgs_spark.functions.extract import sha_violations, with_refs
from pgs_spark.sources.generator import generate_code_files, repo_table


def test_generator_deterministic(spark):
    a = generate_code_files(spark, n_repos=20, n_files=100, seed=7)
    b = generate_code_files(spark, n_repos=20, n_files=100, seed=7)
    assert a.count() == 100
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_generator_seed_changes_content(spark):
    a = generate_code_files(spark, n_repos=20, n_files=100, seed=7)
    b = generate_code_files(spark, n_repos=20, n_files=100, seed=8)
    assert a.select("sha256").exceptAll(b.select("sha256")).count() > 0


def test_generator_schema_and_sha(spark):
    cf = generate_code_files(spark, n_repos=10, n_files=50, seed=42)
    assert set(cf.columns) == {"repo", "path", "commit", "lang", "content", "sha256"}
    bad = cf.filter(F.sha2(F.col("content"), 256) != F.col("sha256")).count()
    assert bad == 0
    langs = {r["lang"] for r in cf.select("lang").distinct().collect()}
    assert langs <= {"python", "java", "js"}


def test_extract_known_rows(spark):
    rows = [
        ("r1", "python", "import repo_00001\nx = 1  # import repo_00099 in comment\nfrom repo_00002 import y"),
        ("r2", "java", "package a; // header\nimport repo_00003.pkg.Cls;\nimport static repo_00004.Cls;\nclass C {}"),
        ("r3", "js", "// require('repo_fake') is commented? no — findall sees it\nconst a = require('repo_00005');"),
        ("r4", "go", "import repo_00006"),  # unsupported lang → dropped
    ]
    cf = spark.createDataFrame(rows, "repo string, lang string, content string").withColumn(
        "sha256", F.sha2(F.col("content"), 256)
    )
    refs = {(r["repo"], r["ref"]) for r in with_refs(cf).collect()}
    assert ("r1", "repo_00001") in refs
    assert ("r1", "repo_00002") in refs  # from-import
    assert ("r1", "repo_00099") not in refs  # comment decoy is not line-anchored import
    assert ("r2", "repo_00003") in refs and ("r2", "repo_00004") in refs
    assert ("r3", "repo_00005") in refs
    assert not any(repo == "r4" for repo, _ in refs)


def test_sha_invariant_on_generated_corpus(spark):
    cf = generate_code_files(spark, n_repos=20, n_files=200, seed=42)
    assert sha_violations(cf) == 0


def test_import_skew_is_powerlaw(spark):
    """Zipf targets: the most-imported repo must be a genuine heavy hitter."""
    cf = generate_code_files(spark, n_repos=100, n_files=2000, seed=42).persist()
    refs = with_refs(cf).persist()
    counts = [r["cnt"] for r in refs.groupBy("ref").agg(F.count("*").alias("cnt")).collect()]
    counts.sort(reverse=True)
    mean = sum(counts) / len(counts)
    assert counts[0] > 5 * mean  # hub exists
    refs.unpersist()
    cf.unpersist()


def test_repo_table_ids_stable(spark):
    a = repo_table(spark, 50).collect()
    b = repo_table(spark, 50).collect()
    assert {(r["repo"], r["repo_id"]) for r in a} == {(r["repo"], r["repo_id"]) for r in b}
    assert len({r["repo_id"] for r in a}) == 50
