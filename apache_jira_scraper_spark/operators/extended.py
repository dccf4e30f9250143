"""Extended coverage queries: approximate aggregates, streaming pipelines
under the driver gate, and the REST DataSource end-to-end ingest.

  quantiles_exact       exact interpolated percentiles (SURVEY §2.11
                        "approximate distinct/quantiles" — the exact twin;
                        DuckDB quantile_cont oracle)
  approx_distinct_parts approx_count_distinct (HLL++) next to the exact
                        count — rows-only (sketches are engine-specific)
  stream_tumbling_counts  Structured Streaming watermark + tumbling window
                        over a file-source stream of events, complete-mode
                        memory sink — bounded input makes the result equal
                        to the batch group-by, so it IS oracle-checkable
  stream_session_windows  session_window streaming agg (rows-only)
  stream_dedup          dropDuplicatesWithinWatermark (rows-only)
  jira_rest_ingest      full S1 path: in-process mock Jira REST server →
                        custom DataSource (paginated scan, JQL pushdown) →
                        from_json → extract_issues silver rows (rows-only)

Reference parity: the streaming trio upgrades scraper.py:261-337's
checkpointed cursor loop (T1-T5); jira_rest_ingest is scraper.py:147-169's
paginated search + scraper.py:190-259's extraction, executed by executors.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..schemas import RAW_ISSUE
from ..streaming import pipelines
from .extract import extract_issues

_MEM_SINK_IDS = itertools.count()


# ---------------------------------------------------------------------------
# Approximate / exact distributional aggregates
# ---------------------------------------------------------------------------

def q_quantiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles of extended price per return flag.

    Integer cents output so the oracle compare is immune to 1-ulp
    differences in the two engines' interpolation arithmetic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("double")

    def cents(q: float) -> F.Column:
        return F.round(F.expr(f"percentile(CAST(l_extendedprice AS DOUBLE), {q})") * 100).cast(
            "bigint"
        )

    return (
        li.groupBy("l_returnflag")
        .agg(
            cents(0.25).alias("p25_cents"),
            cents(0.5).alias("p50_cents"),
            cents(0.75).alias("p75_cents"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


QUANTILES_SQL = """
SELECT l_returnflag,
       CAST(ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) * 100) AS BIGINT) AS p25_cents,
       CAST(ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.50) * 100) AS BIGINT) AS p50_cents,
       CAST(ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) * 100) AS BIGINT) AS p75_cents,
       COUNT(1) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct next to the exact distinct (A3's 100 TB
    form). Rows-only check: sketch estimates are engine-specific by design;
    the test asserts the estimate lands within HLL's error envelope."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.count_distinct("l_partkey").alias("exact_parts"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Structured Streaming under the driver gate
# ---------------------------------------------------------------------------

_STREAM_DIRS: dict[str, str] = {}


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (ns ts → µs timestamp,
    same conversion as io.load_table).

    Spark's file stream source requires a *directory* landing zone, so the
    single events file is staged into a scratch dir once per process — the
    local stand-in for the S3/HDFS landing prefix a deployment would watch.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    if sf_dir not in _STREAM_DIRS:
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="events_stream_")
        shutil.copy(path, f"{d}/events.parquet")
        _STREAM_DIRS[sf_dir] = d
    raw_schema = spark.read.parquet(path).schema
    raw = spark.readStream.schema(raw_schema).parquet(_STREAM_DIRS[sf_dir])
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def _run_to_memory(df: DataFrame, spark: SparkSession, mode: str) -> DataFrame:
    name = f"ext_sink_{next(_MEM_SINK_IDS)}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def q_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: watermarked tumbling windows, run as a real streaming query.

    Complete output mode + bounded input ⇒ the emitted table equals the
    batch group-by, so the DuckDB oracle applies exactly (the watermark
    still bounds state in the unbounded deployment)."""
    out = pipelines.tumbling_counts(_events_stream(spark, sf_dir))
    return _run_to_memory(out, spark, "complete").orderBy("window_start", "event_type")


STREAM_TUMBLING_SQL = """
WITH e AS (
  SELECT make_timestamp((epoch_ns(ts) // 1000 // 300000000) * 300000000) AS ws,
         event_type, value
  FROM events
)
SELECT ws AS window_start,
       ws + INTERVAL 5 MINUTE AS window_end,
       event_type,
       COUNT(1) AS n,
       CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DECIMAL(38,4)) AS total_value
FROM e
GROUP BY ws, event_type
ORDER BY window_start, event_type
"""


def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: gap-based session windows as a streaming aggregation."""
    out = pipelines.session_counts(_events_stream(spark, sf_dir))
    return _run_to_memory(out, spark, "complete").orderBy("session_start", "user_id")


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: dropDuplicatesWithinWatermark — bounded-state streaming dedup."""
    out = pipelines.stream_dedup(_events_stream(spark, sf_dir)).select(
        "event_id", "user_id", "event_type"
    )
    return _run_to_memory(out, spark, "append").orderBy("event_id")


# ---------------------------------------------------------------------------
# REST DataSource end-to-end (S1 + S8-S9 + P1-P5 in one plan)
# ---------------------------------------------------------------------------

_MOCK = {}


def q_jira_rest_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paginated REST scan through the custom DataSource against an
    in-process mock Jira (deterministic corpus), then the silver extraction.

    Exercises: partition-per-page parallel fetch, projection/filter pushdown
    into the JQL request, retry envelope, and the P1-P5 projection — the
    whole reference ingest path as ONE Spark plan. Rows-only (no SQL oracle:
    the source is a live HTTP endpoint)."""
    from ..sources import jira_source
    from tests.mock_jira import MockJira

    jira_source.register(spark)
    # required for JiraBatchReader.pushFilters on sessions we didn't build
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    if "srv" not in _MOCK:
        srv = MockJira({"KAFKA": 120, "SPARK": 80})
        srv.thread.start()  # daemon; lives for the session so the lazy
        _MOCK["srv"] = srv  # DataFrame stays collectable
    srv = _MOCK["srv"]

    raw = (
        spark.read.format("jira")
        .option("base_url", srv.url)
        .option("projects", "KAFKA,SPARK")
        .option("page_size", 50)
        .load()
    )
    parsed = raw.select(
        "project", F.from_json("payload", RAW_ISSUE).alias("issue")
    ).select("project", "issue.*")
    return extract_issues(parsed).orderBy("issue_key")


def register_all() -> None:
    from ..registry import register

    register("quantiles_exact", q_quantiles_exact, QUANTILES_SQL)
    register("approx_distinct_parts", q_approx_distinct_parts, None)
    register("stream_tumbling_counts", q_stream_tumbling_counts, STREAM_TUMBLING_SQL)
    register("stream_session_windows", q_stream_session_windows, None)
    register("stream_dedup", q_stream_dedup, None)
    register("jira_rest_ingest", q_jira_rest_ingest, None)
