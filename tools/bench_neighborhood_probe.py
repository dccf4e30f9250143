"""Diagnose corpus_assembly's in-bench inflation (VERDICT r13 item 3).

Reproduces the bench's exact neighborhood in ONE session: runs the gates
that precede corpus_assembly in bench order (alphabetical) with the same
min-of-N sampling, then samples corpus_assembly repeatedly, recording per
sample: wall, JVM GC time delta, storage memory used, and live RDD block
count. A control mode (--isolated) samples corpus_assembly alone in the
fresh session. Comparing the two separates (a) engine cost of the gate,
(b) neighborhood-induced cost (GC/storage pressure from predecessors'
cache builds), and (c) host phase (run the q1 sentinel between samples).

Usage: PYTHONPATH=/root/repo python tools/bench_neighborhood_probe.py \
           [sf_dir] [--isolated]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from apache_jira_scraper_spark import registry  # noqa: E402
from apache_jira_scraper_spark.session import get_spark  # noqa: E402


def _gc_ms(spark) -> int:
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def _storage(spark):
    infos = spark._jsc.sc().getRDDStorageInfo()
    n_blocks = sum(infos[i].numCachedPartitions() for i in range(len(infos)))
    mem = sum(infos[i].memSize() for i in range(len(infos)))
    return len(infos), n_blocks, mem


def _sample(spark, qs, name, sf_dir):
    gc0 = _gc_ms(spark)
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    gc = _gc_ms(spark) - gc0
    rdds, blocks, mem = _storage(spark)
    return {
        "gate": name,
        "wall_s": round(wall, 3),
        "gc_ms": gc,
        "rdds": rdds,
        "blocks": blocks,
        "storage_mb": round(mem / 1e6, 1),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    isolated = "--isolated" in sys.argv
    spark = get_spark(app_name="bench_neighborhood_probe", cpus=32,
                      shuffle_partitions=32)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    qs = registry.queries()

    out = []
    if not isolated:
        for name in ["above_avg_orders", "array_ops_per_customer", "asof_join",
                     "bm25_topk"]:
            for _ in range(3):
                out.append(_sample(spark, qs, name, sf_dir))
    for i in range(6):
        out.append(_sample(spark, qs, "corpus_assembly", sf_dir))
        # zero-delta sentinel between samples: separates host phase from
        # neighborhood effects (the sentinel has no caches, one aggregate)
        out.append(_sample(spark, qs, "q1_pricing_summary", sf_dir))
    for r in out:
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
