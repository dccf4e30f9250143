"""Capture .explain('formatted') for every registered gate into
plans/<tag>/<gate>_<suffix>.txt (optimization-round evidence files).

Usage: python tools/capture_plans.py <tag> <suffix> [gate ...]
e.g.   python tools/capture_plans.py r13 before
"""

from __future__ import annotations

import os
import sys

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_DIR)
os.environ["PYTHONPATH"] = _REPO_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")

from apache_jira_scraper_spark import registry
from apache_jira_scraper_spark.io import sf_dir_from_env
from apache_jira_scraper_spark.session import get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sf_dir = sf_dir_from_env()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or (os.cpu_count() or 4)
    spark = get_spark(app_name="plans", cpus=cpus, shuffle_partitions=max(cpus, 8))
    out_dir = os.path.join(_REPO_DIR, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    qs = registry.queries()
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record, keep capturing
            plan = f"CAPTURE FAILED: {type(exc).__name__}: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {name}", flush=True)


if __name__ == "__main__":
    main()
