"""stream_stateful trigger A/B (VERDICT r10 item 6) + durable-leg cost.

The gate's critical path is the text-ingest leg (two landing files,
maxFilesPerTrigger=1). Arms measured here, N samples each, fresh
checkpoint/out dirs per sample, one warm session:

  A  one availableNow query consuming both files as two micro-batches
     (the shipped shape)
  B  two sequential availableNow queries sharing a checkpoint, each
     landing one file ("two-trigger landing": query start/stop overhead
     x2, but each run plans against a known-complete file set)
  A+durable  arm A with durable_state_dir set (parquet segment + manifest
     writes per batch) — the cost of wiring VERDICT r10 item 7 into the
     certified gate path

Run: PYTHONPATH=/root/repo python tools/stream_trigger_ab.py [sf_dir] [n]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from apache_jira_scraper_spark.io import load_table, narrowed_shuffle_partitions
    from apache_jira_scraper_spark.operators.extended import (
        _deterministic_landing,
        _land_two_batches,
    )
    from apache_jira_scraper_spark.streaming import pipelines

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("stream_trigger_ab")
        .getOrCreate()
    )
    spark.range(1000).count()

    def _land(d: str) -> None:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "n_chars"
        )
        _land_two_batches(
            d,
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
        )

    landing = _deterministic_landing(sf_dir, "text_ingest", _land)

    def stream_over(path_glob: str):
        return (
            spark.readStream.schema("doc_id long, text string, n_chars long")
            .option("maxFilesPerTrigger", "1")
            .parquet(path_glob)
        )

    def arm_a(tmp: str, durable: bool) -> int:
        q = pipelines.streaming_dedup_ingest(
            stream_over(f"{landing}/*"),
            f"{tmp}/out",
            f"{tmp}/ckpt",
            durable_state_dir=f"{tmp}/dstate" if durable else None,
        )
        q.awaitTermination()
        return spark.read.parquet(f"{tmp}/out").count()

    def arm_b(tmp: str) -> int:
        # two-trigger landing: stage file a, drain; stage file b, drain —
        # same checkpoint, so run 2 sees run 1's committed offset and
        # only batch b is new. State carries via the durable-free default
        # (rebuild from committed output) exactly as a restart would.
        from apache_jira_scraper_spark.streaming.pipelines import (
            rebuild_dedup_ingest_state,
        )

        staged = f"{tmp}/staged"
        os.makedirs(staged)
        shutil.copytree(f"{landing}/a", f"{staged}/a")
        q = pipelines.streaming_dedup_ingest(
            stream_over(f"{staged}/*"), f"{tmp}/out", f"{tmp}/ckpt"
        )
        q.awaitTermination()
        shutil.copytree(f"{landing}/b", f"{staged}/b")
        idx = rebuild_dedup_ingest_state(spark, f"{tmp}/out")
        q = pipelines.streaming_dedup_ingest(
            stream_over(f"{staged}/*"),
            f"{tmp}/out",
            f"{tmp}/ckpt",
            initial_index=idx,
        )
        q.awaitTermination()
        return spark.read.parquet(f"{tmp}/out").count()

    results: dict[str, dict] = {}
    with narrowed_shuffle_partitions(spark, 4):
        for name, fn in (
            ("A_availableNow", lambda t: arm_a(t, durable=False)),
            ("B_two_trigger", arm_b),
            ("A_durable", lambda t: arm_a(t, durable=True)),
        ):
            times, counts = [], set()
            for _ in range(n):
                tmp = tempfile.mkdtemp(prefix=f"trig_ab_{name}_")
                t0 = time.time()
                counts.add(fn(tmp))
                times.append(round(time.time() - t0, 3))
                shutil.rmtree(tmp, ignore_errors=True)
            results[name] = {
                "times": times,
                "min": min(times),
                "kept_rows": sorted(counts),
            }
            print(f"{name}: min={min(times)}s times={times} kept={sorted(counts)}",
                  flush=True)
    same = len({tuple(r["kept_rows"]) for r in results.values()}) == 1
    print(json.dumps({"results": results, "kept_rows_agree": same}))


if __name__ == "__main__":
    main()
