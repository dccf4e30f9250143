"""Per-gate build/execute split profiler (optimization round r13).

For each named gate (default: all 50), runs N samples; each sample times
separately (a) the Python DataFrame construction — plan build + Catalyst
analysis triggered by the gate function itself — and (b) the noop-sink
execution of the returned frame. The split tells us whether a gate's warm
cost is driver-side plan work (attack the plan size / duplicated analysis)
or genuine job execution (attack shuffles / operators), per guide §1.

Usage: python tools/profile_split.py [-n 3] [gate ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_DIR)
os.environ["PYTHONPATH"] = _REPO_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")

from apache_jira_scraper_spark import registry
from apache_jira_scraper_spark.io import sf_dir_from_env
from apache_jira_scraper_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("gates", nargs="*")
    args = ap.parse_args()

    sf_dir = sf_dir_from_env()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)
    spark = get_spark(app_name="profile", cpus=cpus, shuffle_partitions=max(cpus, 8))
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    qs = registry.queries()
    names = args.gates or sorted(qs)
    out = {}
    for name in names:
        samples = []
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            samples.append((round(t1 - t0, 3), round(t2 - t1, 3)))
        builds = [b for b, _ in samples]
        execs = [e for _, e in samples]
        out[name] = {
            "build": samples and min(builds),
            "exec": samples and min(execs),
            "samples": samples,
        }
        print(
            f"{name:26s} build_min={min(builds):7.3f} exec_min={min(execs):7.3f} "
            f"samples={samples}",
            flush=True,
        )
    with open("/tmp/profile_split.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
