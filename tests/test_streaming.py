"""Structured Streaming tests (T4-T5): drive each pipeline with a bounded
file-source stream over the events parquet and check results against the
equivalent batch computation — watermark semantics can't drop anything in
a single ordered replay, so stream results must equal batch results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_jira_scraper_spark.io import load_table
from apache_jira_scraper_spark.streaming import pipelines
from tests.conftest import TEST_SF_DIR


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, TEST_SF_DIR, "events")


@pytest.fixture(scope="module")
def events_stream(spark, events_batch, tmp_path_factory):
    # re-land the parquet WITHOUT nanos (µs timestamps) so the streaming
    # file source reads it with a plain schema
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    events_batch.write.mode("overwrite").parquet(path)
    schema = events_batch.schema
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", "4").parquet(path)


def _run(spark, sdf, name: str, mode: str = "append"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_tumbling_counts_match_batch(spark, events_batch, events_stream):
    out = _run(spark, pipelines.tumbling_counts(events_stream), "t_tumbling", "append")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value_cents"])
        for r in out.collect()
    }
    exp = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value_cents"])
        for r in (
            events_batch.groupBy(F.window("ts", "5 minutes"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.sum(F.col("value").cast("decimal(14,2)")) * 100).cast("bigint").alias("total_value_cents"),
            )
            .select(F.col("window.start").alias("window_start"), "event_type", "n", "total_value_cents")
        ).collect()
    }
    # append mode emits only watermark-closed windows; every emitted window
    # must match batch exactly, and most windows must have been emitted
    assert got
    for k, v in got.items():
        assert exp[k] == v, k
    assert len(got) >= len(exp) * 0.8


def test_sliding_windows_match_batch(spark, events_batch, events_stream):
    """Every emitted sliding frame must equal the batch twin; each event
    lands in window/slide = 2 overlapping frames."""
    out = _run(spark, pipelines.sliding_avg(events_stream), "t_sliding", "append")
    got = {
        (r["window_start"], r["user_id"]): r["n"] for r in out.collect()
    }
    exp = {
        (r["window_start"], r["user_id"]): r["n"]
        for r in (
            events_batch.groupBy(F.window("ts", "10 minutes", "5 minutes"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("window_start"), "user_id", "n")
        ).collect()
    }
    assert got
    for k, v in got.items():
        assert exp[k] == v, k
    assert len(got) >= len(exp) * 0.8


def test_session_windows_close(spark, events_stream, events_batch):
    out = _run(spark, pipelines.session_counts(events_stream), "t_sessions", "append")
    rows = out.collect()
    assert rows
    # session event totals per user can't exceed the user's event count
    per_user = {r["user_id"]: r["n"] for r in events_batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    from collections import defaultdict

    sess_events = defaultdict(int)
    for r in rows:
        assert r["session_end"] > r["session_start"]
        sess_events[r["user_id"]] += r["n_events"]
    for uid, n in sess_events.items():
        assert n <= per_user[uid]


def test_stream_dedup_drops_replayed_rows(spark, events_batch, events_stream, tmp_path):
    # duplicate the stream by unioning it with itself: dedup must halve it
    doubled = events_stream.union(events_stream)
    out = _run(spark, pipelines.stream_dedup(doubled), "t_dedup", "append")
    n_batch = events_batch.count()
    assert out.select("event_id").distinct().count() == out.count()
    assert out.count() == n_batch


def test_idempotent_sink_replay_safe(spark, events_stream, events_batch, tmp_path):
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = pipelines.write_idempotent_parquet(events_stream, out_dir, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out_dir)
    assert first.drop("batch_id").count() == events_batch.count()
    # replay: restarting with the same checkpoint must not duplicate rows
    q2 = pipelines.write_idempotent_parquet(events_stream, out_dir, ckpt)
    q2.awaitTermination(120)
    again = spark.read.parquet(out_dir)
    assert again.count() == first.count()
