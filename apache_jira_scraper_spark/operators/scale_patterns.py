"""Scale patterns: bucketing (co-located joins) and salting (skew).

SURVEY.md §2.3/§8 commit to these tactics for the 100 TB deployment; this
module makes them concrete, and tests/test_scale_patterns.py proves the
plan effects (no Exchange under a bucketed join; bounded partition width
under a salted aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 16, path: str | None = None
) -> None:
    """Persist a table bucketed+sorted by its join key.

    On a lakehouse this is the one-time layout investment: every future
    equi-join or aggregation on `key` between same-bucketed tables runs
    with NO shuffle — the scan partitions are already co-located.
    ``path`` makes it an external table (data outside the static warehouse
    dir — useful under a shared session).
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left: str, right: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on the bucket key — shuffle-free."""
    return spark.table(left).join(spark.table(right), key)


def salted_agg(
    df: DataFrame, key: str, value: str, salts: int = 8
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    Phase 1 shuffles on (key, salt) — a hot key's rows spread over `salts`
    partitions instead of one; phase 2 combines the `salts` partials per
    key. sum/count compose exactly; avg is reconstructed from them.
    """
    salt = (F.rand(seed=7) * salts).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            F.sum(value).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_s").alias("total"),
        F.sum("_n").alias("n"),
        (F.sum("_s") / F.sum("_n")).alias("mean"),
    )
