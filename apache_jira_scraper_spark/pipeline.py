"""End-to-end Jira pipeline: bronze (raw) -> silver (issues) -> gold
(training examples) -> stats, replicating main.py:17-137's dataflow with
zones as Parquet/JSON writes instead of driver-side JSON files.

The reference loops over projects in the driver (main.py:34) and merges at
the end (main.py:92); here `project` is a column, so one run processes every
project and the merge is free. Per-project isolation of failures
(main.py:82-84) becomes row-level: malformed rows project to NULLs rather
than aborting the job.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .operators.extract import extract_issues
from .operators.stats import summary_statistics, task_type_distribution
from .operators.tasks import issues_to_examples
from .schemas import RAW_ISSUE


@dataclass
class PipelineResult:
    issues: DataFrame
    examples: DataFrame
    summary: DataFrame
    distribution: DataFrame


def read_raw_json(spark: SparkSession, path: str, project: str | None = None) -> DataFrame:
    """S3: JSON-array file source (example_usage.py:57-58) with declared schema."""
    df = spark.read.option("multiLine", "true").schema(RAW_ISSUE).json(path)
    return df


def run_pipeline(raw: DataFrame, project: str | None = None) -> PipelineResult:
    issues = extract_issues(raw, project=project)
    examples = issues_to_examples(issues)
    return PipelineResult(
        issues=issues,
        examples=examples,
        summary=summary_statistics(examples),
        distribution=task_type_distribution(examples),
    )


def write_zones(result: PipelineResult, base_dir: str) -> None:
    """Persist the three zones (S5-S7).

    Raw/silver go to Parquet (columnar; the reference's pretty-printed JSON
    array at scraper.py:339-356 is an anti-pattern at scale). The gold
    examples keep JSONL parity via Spark's line-delimited JSON writer
    (transformer.py:298-314's contract).
    """
    result.issues.write.mode("overwrite").partitionBy("project").parquet(
        f"{base_dir}/silver/issues"
    )
    # gold is partitioned by task_type: the reference's own downstream
    # workload (example_usage.py:196-212) filters by task type, so the scan
    # prunes to one directory instead of reading the whole corpus.
    result.examples.write.mode("overwrite").partitionBy("task_type").json(
        f"{base_dir}/gold/examples"
    )
    result.summary.coalesce(1).write.mode("overwrite").json(f"{base_dir}/stats/summary")
    result.distribution.coalesce(1).write.mode("overwrite").json(
        f"{base_dir}/stats/distribution"
    )
