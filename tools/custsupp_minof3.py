"""Idle-box min-of-N for pagerank_custsupp_10it (VERDICT r4 #1b).

The query's clean-box headline reading drifted 12.1s (r2/r3) -> 18.2s (r4)
with UNCHANGED operator code, flagged two rounds running. This tool produces
the decisive evidence: N fresh-JVM runs of exactly the headline's
pagerank_custsupp_10it stage (same graph build, same persist, same
fixed_iterations=10) on an otherwise-idle box, each run stamped with the
1-min loadavg at launch. Writes BENCH/custsupp_minof3.json; the min and the
loadavg series go into BENCH/BASELINE.md's drift section.

Usage:
    python tools/custsupp_minof3.py            # parent: N sequential children
    python tools/custsupp_minof3.py --one      # child: one fresh-JVM run
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(sf_dir: str, cpus: int) -> dict:
    sys.path.insert(0, REPO)
    from pgs_spark.operators.pagerank import pagerank
    from pgs_spark.session import get_spark
    from pgs_spark.sources.tpch_graph import customer_supplier_edges

    spark = get_spark(
        app_name="custsupp-minof3", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    cs = customer_supplier_edges(spark, sf_dir).persist()
    n_edges = cs.count()
    # R in-JVM repeats: the headline measures this query mid-run in a WARM
    # JVM (dozens of queries already JIT-compiled the hot paths), so the
    # fresh-JVM first repeat is cold-start evidence and the later repeats
    # are the steady-state number comparable to the headline reading.
    repeats = int(os.environ.get("PGS_MINOF_REPEATS", "3"))
    reps = []
    n = None
    for _ in range(repeats):
        t0 = time.time()
        res = pagerank(spark, cs, fixed_iterations=10)
        n = res.ranks.count()
        reps.append(
            {
                "secs": round(time.time() - t0, 3),
                "superstep_secs": [round(h["seconds"], 3) for h in res.history],
            }
        )
    spark.stop()
    return {
        "secs": min(r["secs"] for r in reps),
        "rows": n,
        "edges": n_edges,
        "repeats": reps,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--one" in sys.argv:
        print(json.dumps(run_one(sf_dir, cpus)))
        return
    n_runs = int(os.environ.get("PGS_MINOF_N", "3"))
    pin = ["taskset", "-c", f"0-{cpus - 1}"] if shutil.which("taskset") else []
    runs = []
    for i in range(n_runs):
        la = round(os.getloadavg()[0], 2)
        out = subprocess.run(
            pin + [sys.executable, os.path.abspath(__file__), "--one"],
            capture_output=True, text=True, cwd=REPO,
        )
        line = out.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        rec.update({"run": i + 1, "loadavg_at_launch": la})
        runs.append(rec)
        print(json.dumps(rec))
    report = {
        "query": "pagerank_custsupp_10it",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "min_secs": min(r["secs"] for r in runs),
        "all_secs": [r["secs"] for r in runs],
        "loadavgs": [r["loadavg_at_launch"] for r in runs],
        "runs": runs,
    }
    with open(os.path.join(REPO, "BENCH", "custsupp_minof3.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in ("min_secs", "all_secs", "loadavgs")}))


if __name__ == "__main__":
    main()
