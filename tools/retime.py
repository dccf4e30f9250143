"""Isolated per-gate re-timer (PERF.md single-query methodology): run the
named gates N times each in one session against $SPARK_GRAFT_SF_DIR
(default sf0.1), noop sink, print per-run wall times + min/median.

Usage: python tools/retime.py [-n 3] gate [gate ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
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
    ap.add_argument("gates", nargs="+")
    args = ap.parse_args()

    sf_dir = sf_dir_from_env()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)
    spark = get_spark(app_name="retime", cpus=cpus, shuffle_partitions=max(cpus, 8))
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    qs = registry.queries()
    for name in args.gates:
        runs = []
        for _ in range(args.n):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name}: runs={runs} min={min(runs)} "
            f"median={statistics.median(runs)}"
        )


if __name__ == "__main__":
    main()
