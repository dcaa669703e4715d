"""Headline min-of-N merge (VERDICT r4 #1a): the canonical bench artifact
is the per-query minimum over repeated same-code runs, with per-run loadavg
provenance — a contended rerun can never overwrite a clean-box run.

Pure-Python (no Spark): exercises bench._merge_headline_min_of_n directly
against a temp artifact file."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _code_fingerprint, _merge_headline_min_of_n


def _result(queries, sf=0.1):
    return {
        "metric": "headline_total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": dict(queries),
        "sf": sf,
    }


def test_fresh_artifact_records_single_run(tmp_path):
    fpath = str(tmp_path / "headline_sf0.1.json")
    out = _merge_headline_min_of_n(
        fpath, _result({"q1": 2.0, "q2": 3.0}), {"q1": 0.5, "q2": 0.7}, 32
    )
    assert out["queries"] == {"q1": 2.0, "q2": 3.0}
    assert out["value"] == 5.0
    assert out["n_runs_merged"] == 1
    assert out["code_fingerprint"] == _code_fingerprint()
    assert out["runs"][0]["query_loadavg"] == {"q1": 0.5, "q2": 0.7}


def test_contended_rerun_cannot_shadow_clean_run(tmp_path):
    fpath = str(tmp_path / "headline_sf0.1.json")
    clean = _merge_headline_min_of_n(
        fpath, _result({"q1": 2.0, "q2": 3.0}), {"q1": 0.1, "q2": 0.1}, 32
    )
    with open(fpath, "w") as f:
        json.dump(clean, f)
    # contended rerun: q1 much slower, q2 slightly faster
    merged = _merge_headline_min_of_n(
        fpath, _result({"q1": 4.5, "q2": 2.8}), {"q1": 9.9, "q2": 9.9}, 32
    )
    assert merged["queries"] == {"q1": 2.0, "q2": 2.8}
    assert merged["value"] == 4.8
    assert merged["query_best_run"] == {"q1": "prior", "q2": "this"}
    assert merged["n_runs_merged"] == 2
    # both runs' raw timings + loadavg survive as provenance
    assert [r["queries"]["q1"] for r in merged["runs"]] == [2.0, 4.5]


def test_renamed_bench_entry_drops_stale_query(tmp_path):
    fpath = str(tmp_path / "headline_sf0.1.json")
    prior = _merge_headline_min_of_n(fpath, _result({"old_q": 1.0}), {}, 32)
    with open(fpath, "w") as f:
        json.dump(prior, f)
    merged = _merge_headline_min_of_n(fpath, _result({"new_q": 2.0}), {}, 32)
    assert "old_q" not in merged["queries"]
    assert merged["queries"] == {"new_q": 2.0}


def test_fingerprint_change_discards_history(tmp_path):
    fpath = str(tmp_path / "headline_sf0.1.json")
    prior = _merge_headline_min_of_n(fpath, _result({"q1": 1.0}), {}, 32)
    prior["code_fingerprint"] = "0" * 16  # simulate different code
    with open(fpath, "w") as f:
        json.dump(prior, f)
    merged = _merge_headline_min_of_n(fpath, _result({"q1": 5.0}), {}, 32)
    assert merged["queries"] == {"q1": 5.0}  # no min vs incomparable timing
    assert merged["n_runs_merged"] == 1


def test_sf_mismatch_never_merges(tmp_path):
    fpath = str(tmp_path / "headline_sf1.0.json")
    prior = _merge_headline_min_of_n(fpath, _result({"q1": 1.0}, sf=0.1), {}, 32)
    with open(fpath, "w") as f:
        json.dump(prior, f)
    merged = _merge_headline_min_of_n(fpath, _result({"q1": 5.0}, sf=1.0), {}, 32)
    assert merged["queries"] == {"q1": 5.0}
