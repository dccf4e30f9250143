#!/usr/bin/env python
"""Measure per-batch wall time of the streaming text-dedup ingest sink over
a LONG run (default 60 micro-batches) and test the tiered store's central
scale claim with numbers: state advance is O(batch), so non-compaction
batch time must stay FLAT as the kept corpus grows, with bounded spikes
only at tier merges (every `compact_every` batches).

Why this exists: the r09 profile replaced the O(corpus)-per-batch index
rewrite with _TieredSegments and PERF.md carries the cost MODEL (level-0
= one batch, fanout-triggered cascade merges, O(log) amortized write
amplification) plus the durable-mode recovery curve — but no measured
long-run time series. A regression that quietly re-introduced
per-batch O(corpus) work (the exact bug r09 fixed) would not fail any
current test until someone profiled again. This probe makes the claim
falsifiable in one command.

Method: N landing files of `docs_per_batch` synthetic documents each
(deterministic token text; ~25% of each batch are near-copies of docs
from EARLIER batches, so the cross-batch index genuinely drops rows and
genuinely grows), driven through streaming_dedup_ingest with
maxFilesPerTrigger=1. Per-batch durations come from the query's
recentProgress (triggerExecution ms — the same number the streaming UI
shows). Verdict: per-batch time is a sawtooth whose period is the
compaction fanout, so the comparison is between PHASE-ALIGNED windows —
the median of one COMPLETE fanout period (all `compact_every` batches,
merge included) against the median of the last complete period; period
0 is excluded wholesale as warmup. The late median must be <=
FLATNESS_BAR x the early one; exits nonzero otherwise. (A raw
early-window/late-window comparison mixes sawtooth phases — truncated
windows sample only the cheap head or expensive tail of a period and
systematically understate growth.)

Usage: python tools/ingest_flatness_probe.py [--batches 64]
       [--docs-per-batch 40] [--compact-every 16] [--durable]
Needs >= 3 full periods (batches >= 3*compact_every); the default 64
gives periods 1 and 3 as the compared pair.
"""

from __future__ import annotations

import argparse
import json
import random
import shutil
import statistics
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FLATNESS_BAR = 2.0  # late-period median / early-period median, full periods


def synth_batches(n_batches: int, docs_per_batch: int, seed: int = 7):
    """Deterministic corpus: per batch, ~75% fresh docs of 40-60 random
    tokens, ~25% near-copies (one token substituted) of docs from earlier
    batches — enough overlap that incremental_dedup's cross-batch path
    does real work every batch."""
    rng = random.Random(seed)
    vocab = [f"tok{i}" for i in range(500)]
    batches: list[list[tuple[int, str]]] = []
    all_docs: list[str] = []
    next_id = 0
    for _ in range(n_batches):
        rows = []
        for _ in range(docs_per_batch):
            if all_docs and rng.random() < 0.25:
                words = all_docs[rng.randrange(len(all_docs))].split()
                words[rng.randrange(len(words))] = rng.choice(vocab)
                text = " ".join(words)
            else:
                text = " ".join(
                    rng.choice(vocab) for _ in range(rng.randint(40, 60))
                )
                all_docs.append(text)
            rows.append((next_id, text))
            next_id += 1
        batches.append(rows)
    return batches


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=64)
    ap.add_argument("--docs-per-batch", type=int, default=40)
    ap.add_argument("--compact-every", type=int, default=16)
    ap.add_argument("--durable", action="store_true",
                    help="probe the parquet-backed durable segment mode")
    args = ap.parse_args()

    from apache_jira_scraper_spark.session import get_spark
    from apache_jira_scraper_spark.streaming import pipelines

    spark = get_spark()
    root = Path(tempfile.mkdtemp(prefix="ingest_flatness_"))
    landing = root / "landing"
    landing.mkdir()
    try:
        # land fixtures with pyarrow directly — a Spark write job per file
        # dominates the probe's wall clock at high batch counts
        import pyarrow as pa
        import pyarrow.parquet as pq

        for i, rows in enumerate(
            synth_batches(args.batches, args.docs_per_batch)
        ):
            d = landing / f"f{i:04d}"
            d.mkdir()
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                        "text": pa.array([r[1] for r in rows], pa.string()),
                    }
                ),
                d / "part-0.parquet",
            )

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(landing / "f*"))
        )
        q = pipelines.streaming_dedup_ingest(
            stream,
            out_dir=str(root / "out"),
            checkpoint_dir=str(root / "ckpt"),
            compact_every=args.compact_every,
            durable_state_dir=str(root / "state") if args.durable else None,
        )
        q.awaitTermination()
        prog = [
            (p["batchId"], p["durationMs"].get("triggerExecution", 0), p["numInputRows"])
            for p in (json.loads(str(j.json) if hasattr(j, "json") else str(j))
                      for j in q.recentProgress)
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)

    prog = [p for p in prog if p[2] > 0]  # drop the empty tail trigger, if any
    if len(prog) < args.batches:
        print(
            f"WARNING: recentProgress holds {len(prog)} entries "
            f"(cap 100) of {args.batches} batches", file=sys.stderr,
        )
    # Per-batch time is a SAWTOOTH by design: the read side unions up to
    # `fanout` level-0 segment scans, then the tier merge (every fanout-th
    # batch: bid 15, 31, ... at fanout 16) collapses them — so comparing a
    # raw early window against a raw late window just measures sawtooth
    # phase. The O(batch) claim is about PERIODS: the median over one full
    # fanout period must not grow period-over-period (the pre-r09 bug made
    # every batch O(kept corpus), which grows monotonically across periods
    # and cannot hide in the sawtooth). Only COMPLETE periods are
    # comparable (a truncated one samples only the cheap head of the
    # sawtooth and biases the ratio down — review r10); period 0 carries
    # JVM/codegen warmup and is excluded wholesale, which keeps the
    # compared windows phase-aligned batch-for-batch.
    by_period: dict[int, list[int]] = {}
    for bid, ms, _ in prog:
        by_period.setdefault(bid // args.compact_every, []).append(ms)
    full = [
        p
        for p, v in sorted(by_period.items())
        if p > 0 and len(v) == args.compact_every
    ]
    if len(full) < 2:
        print(
            "need >= 2 full fanout periods after warmup; raise --batches to"
            f" >= {3 * args.compact_every}",
            file=sys.stderr,
        )
        return 2
    early = statistics.median(by_period[full[0]])
    late = statistics.median(by_period[full[-1]])
    ratio = late / early if early else float("inf")
    merges = [(b, ms) for b, ms, _ in prog if (b + 1) % args.compact_every == 0]

    print(json.dumps({
        "mode": "durable" if args.durable else "local",
        "batches": len(prog),
        "docs_per_batch": args.docs_per_batch,
        "compact_every": args.compact_every,
        "early_period": full[0],
        "late_period": full[-1],
        "early_median_ms": early,
        "late_median_ms": late,
        "flatness_ratio": round(ratio, 3),
        "bar": FLATNESS_BAR,
        "merge_batches": merges,
        "per_batch_ms": [(b, ms) for b, ms, _ in prog],
    }))
    if ratio > FLATNESS_BAR:
        print(
            f"FAIL: non-merge per-batch time grew {ratio:.2f}x "
            f"(bar {FLATNESS_BAR}x) — state advance is not O(batch)",
            file=sys.stderr,
        )
        return 1
    print(
        f"OK: non-merge per-batch median {early:.0f} -> {late:.0f} ms "
        f"({ratio:.2f}x over {len(prog)} batches)", file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
