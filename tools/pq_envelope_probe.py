"""PQ/OPQ recall-envelope measurement (VERDICT r10 item 4).

The two_stage_topk gate certifies `pq_recall_ok` / `opq_recall_ok` as
"the ADC shortlist (top-40) recovers >= PQ_MIN_HITS of the exact top-5
per query". PQ training is fully deterministic (no RNG: init = first-ksub
sample subvectors), so the only variation between driver rounds is the
FIXTURE — if the embeddings regenerate, the envelope must still hold.
This probe measures the min-hits floor across the two axes of fixture
variation we can exercise locally:

  - scale: all three driver SFs (different corpus sizes AND different
    vectors — each SF is its own generation of the fixture family), and
  - composition: two deterministic corpus subsamples per SF (drop
    vec_id % 17 == 0 / % 23 == 0, queries kept) — each removes ~6% of
    the corpus including, potentially, true neighbors and training
    vectors, emulating a regenerated fixture's resampling.

Output: one JSON line per (sf, variant, model) with per-query hits and
the min, then a summary line with the global floor. The envelope
constant PQ_MIN_HITS should sit ONE below the observed floor (the IVF
gate's sizing rule); PERF.md records the measurement.

Run: PYTHONPATH=/root/repo python tools/pq_envelope_probe.py
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F


def exact_top5(emb):
    from apache_jira_scraper_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        _cosine_pre,
    )

    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    c = emb.select(
        F.col("vec_id").alias("nid"), F.col("e").alias("ce"), F.col("nrm").alias("cn")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            _cosine_pre(F.col("qe"), F.col("ce"), F.col("qn"), F.col("cn")).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("qid", "nid")
    )


def hits_per_query(exact, short):
    return {
        r["qid"]: r["h"]
        for r in exact.join(
            short.select("qid", "nid"), ["qid", "nid"], "left_semi"
        )
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("h"))
        .collect()
    }


def main() -> None:
    from apache_jira_scraper_spark.operators import quantize as Q
    from apache_jira_scraper_spark.operators.similarity import N_QUERIES, _emb
    from apache_jira_scraper_spark.io import free_local_checkpoint
    from apache_jira_scraper_spark.session import get_spark

    spark = get_spark()
    sfs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    variants = [
        ("full", None),
        ("drop17", (F.col("vec_id") < N_QUERIES) | (F.col("vec_id") % 17 != 0)),
        ("drop23", (F.col("vec_id") < N_QUERIES) | (F.col("vec_id") % 23 != 0)),
    ]
    floor = {"pq": 99, "opq": 99}
    floor_sum = {"pq": 9999, "opq": 9999}
    for sf in sfs:
        base = _emb(spark, sf)
        for tag, pred in variants:
            emb = (base if pred is None else base.filter(pred)).localCheckpoint(
                eager=True
            )
            try:
                exact = exact_top5(emb).localCheckpoint(eager=True)
                books = Q.pq_train(emb)
                pq_short = Q.pq_adc_topk(
                    emb, books, top_k=Q.PQ_GATE_SHORTLIST_K
                )
                r, obooks = Q.opq_train(emb)
                opq_short = Q.opq_adc_topk(
                    emb, r, obooks, top_k=Q.PQ_GATE_SHORTLIST_K
                )
                for model, short in (("pq", pq_short), ("opq", opq_short)):
                    hits = hits_per_query(exact, short)
                    # a query with zero recovered neighbors never appears
                    # in the semi-join — that's a 0, not a missing row
                    per_q = [hits.get(q, 0) for q in range(N_QUERIES)]
                    mn = min(per_q)
                    floor[model] = min(floor[model], mn)
                    floor_sum[model] = min(floor_sum[model], sum(per_q))
                    print(
                        json.dumps(
                            {
                                "sf": sf.rsplit("sf", 1)[-1],
                                "variant": tag,
                                "model": model,
                                "min_hits": mn,
                                "sum_hits": sum(per_q),
                                "hits": per_q,
                            }
                        ),
                        flush=True,
                    )
                free_local_checkpoint(exact)
            finally:
                free_local_checkpoint(emb)
    # Per-model recommendations (ADVICE r11: a single cross-model value
    # silently weakens the stronger model's envelope on regeneration) —
    # each envelope is its own measured floor minus one; the sum-of-hits
    # envelopes take the minimum observed per-run TOTAL minus 2 (the
    # sum-scale analog of the minus-one rule: totals aggregate 10 queries,
    # so one unit of slack per axis of variation we could not exercise).
    print(
        json.dumps(
            {
                "summary": True,
                "floor_pq": floor["pq"],
                "floor_opq": floor["opq"],
                "floor_sum_pq": floor_sum["pq"],
                "floor_sum_opq": floor_sum["opq"],
                "recommended_pq_min_hits": floor["pq"] - 1,
                "recommended_opq_min_hits": floor["opq"] - 1,
                "recommended_pq_hits_total": floor_sum["pq"] - 2,
                "recommended_opq_hits_total": floor_sum["opq"] - 2,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
