"""Per-leg profile of q_stream_stateful: starts the gate's seven streaming
queries exactly as the gate does (same narrowed shuffle window, same
landings), records each query's wall from gate start to ITS termination,
plus per-batch durationMs from recentProgress — identifies the critical
path leg (guide §1: measure first).

Usage: PYTHONPATH=/root/repo python tools/stream_leg_profile.py [sf_dir] [n]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from apache_jira_scraper_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="stream_leg_profile")

    import tempfile

    from pyspark.sql import functions as F

    from apache_jira_scraper_spark.io import load_table, narrowed_shuffle_partitions
    from apache_jira_scraper_spark.operators import extended as ext
    from apache_jira_scraper_spark.streaming import pipelines

    # --wide-ingest: start the two foreachBatch ingest legs OUTSIDE the
    # narrowed-shuffle window (session width instead of 4). Measured and
    # REJECTED for the gate (r14): alternating narrow/wide sessions gave
    # warm criticals 8.5 s (narrow) vs 11.3-11.9 s (wide) — 32-wide
    # shuffles on sub-MB batches add task dispatch under 7 concurrent
    # queries. Kept as the A/B switch that produced that evidence.
    wide_ingest = "--wide-ingest" in sys.argv
    for i in range(n):
        if True:  # keep the gate body's indentation for easy diffing
            ingest_tmp = tempfile.mkdtemp(prefix="stream_prof_")
            ingest_out = f"{ingest_tmp}/out"

            def _land(d: str) -> None:
                docs = load_table(spark, sf_dir, "documents").select(
                    "doc_id", "text", "n_chars"
                )
                ext._land_two_batches(
                    d,
                    docs.filter(F.col("doc_id") % 2 == 0),
                    docs.filter(F.col("doc_id") % 2 == 1),
                )

            landing = ext._deterministic_landing(sf_dir, "text_ingest", _land)
            doc_stream = (
                spark.readStream.schema("doc_id long, text string, n_chars long")
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{landing}/*")
            )

            def _land_media(d: str) -> None:
                from apache_jira_scraper_spark.operators.multimodal import (
                    PHASH_GROUP,
                    PHASH_SAMPLE_MOD,
                    phash_image_fixture,
                )

                media = phash_image_fixture(spark, sf_dir)
                parity = F.expr(f"(doc_id % {PHASH_GROUP}) DIV {PHASH_SAMPLE_MOD} % 2")
                ext._land_two_batches(
                    d, media.filter(parity == 0), media.filter(parity == 1)
                )

            mlanding = ext._deterministic_landing(sf_dir, "media_ingest", _land_media)
            media_stream = (
                spark.readStream.schema("doc_id long, content binary")
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{mlanding}/*")
            )

            t0 = time.perf_counter()
            qs = {}

            def _start_ingest():
                qs["ingest"] = pipelines.streaming_dedup_ingest(
                    doc_stream, ingest_out, f"{ingest_tmp}/ckpt"
                )
                qs["mingest"] = pipelines.streaming_media_dedup_ingest(
                    media_stream, f"{ingest_tmp}/mout", f"{ingest_tmp}/mckpt"
                )

            if wide_ingest:
                _start_ingest()  # session width: heavy batch work, no state
            with narrowed_shuffle_partitions(spark, 4):
                if not wide_ingest:
                    _start_ingest()
                qs["sess"], _ = ext._start_to_memory(
                    pipelines.session_counts(ext._events_stream(spark, sf_dir)),
                    "complete",
                )
                qs["dedup"], _ = ext._start_to_memory(
                    pipelines.stream_dedup(ext._events_stream(spark, sf_dir)).select(
                        "event_id", "user_id", "event_type"
                    ),
                    "append",
                )
                qs["life"], _ = ext._start_to_memory(
                    pipelines.stateful_user_stats(ext._events_stream(spark, sf_dir)),
                    "update",
                )
                qs["join"], _ = ext._start_to_memory(
                    pipelines.stream_interval_join(ext._events_stream(spark, sf_dir)),
                    "append",
                )
                qs["trend"], _ = ext._start_to_memory(
                    pipelines.trending_terms(ext._events_stream(spark, sf_dir)),
                    "complete",
                )
            t_started = time.perf_counter() - t0

            ends = {}
            # await in leg order; each leg's end-wall is captured when ITS
            # awaitTermination returns — the max is the critical path, and
            # legs that finished earlier still report their own progress.
            for name, q in qs.items():
                q.awaitTermination()
                ends[name] = round(time.perf_counter() - t0, 3)
            rep = {}
            for name, q in qs.items():
                prog = [json.loads(p.json) for p in q.recentProgress]
                rep[name] = {
                    "end_wall": ends[name],
                    "batches": [
                        {
                            "batchId": p["batchId"],
                            "durationMs": p.get("durationMs", {}),
                            "numInputRows": p.get("numInputRows"),
                        }
                        for p in prog
                    ],
                }
            print(
                json.dumps(
                    {
                        "run": i,
                        "start_all_s": round(t_started, 3),
                        "legs": rep,
                    },
                    indent=1,
                )
            )
    spark.stop()


if __name__ == "__main__":
    main()
