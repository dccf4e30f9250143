"""Scale patterns: bucketing (co-located joins) and salting (skew).

SURVEY.md §2.3/§8 commit to these tactics for the 100 TB deployment; this
module makes them concrete, and tests/test_scale_patterns.py proves the
plan effects (no Exchange under a bucketed join; bounded partition width
under a salted aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
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


def write_time_partitioned(events: DataFrame, path: str) -> None:
    """Time-series layout for the events table: partition directories by
    event date, rows within each file ordered by (user_id, event_id).

    This is the layout investment that makes every time-windowed query
    at 100 TB a PARTITION-PRUNED scan (a date filter touches only its
    directories — verified by plan assertion in tests) and keeps a
    user's events adjacent within each day for run-length/window reads.
    The task sort leads with the partition column so the dynamic-
    partition writer inserts no unstable sort of its own (same rule as
    corpus.write_corpus)."""
    (
        events.withColumn("event_date", F.to_date("ts"))
        .sortWithinPartitions("event_date", "user_id", "event_id")
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )


def read_time_range(spark: SparkSession, path: str, start: str, end: str) -> DataFrame:
    """Read a date-bounded slice of a write_time_partitioned layout; the
    [start, end) filter sits on the PARTITION column, so it prunes
    directories at planning time instead of scanning and discarding."""
    return spark.read.parquet(path).filter(
        (F.col("event_date") >= F.lit(start)) & (F.col("event_date") < F.lit(end))
    )


def skew_report(
    df: DataFrame, key: str, top_n: int = 10, rel_err: float = 0.01
) -> DataFrame:
    """Shuffle-key skew diagnostics — the measurement that decides whether
    a join/agg on `key` needs salting or AQE skew handling BEFORE the
    expensive job runs.

    One pass, one shuffle (the per-key count), then driver-bounded
    results: the `top_n` hottest keys with their exact counts, plus the
    approximate p50/p90/p99 of the per-key count distribution and the
    hot-key share of all rows (rule of thumb for reading it: a top key
    holding >1/shuffle-partitions of the rows will straggle its reducer).

    Output (top_n rows, ordered by count desc):
      key_value | cnt | share_ppm | p50 | p90 | p99 | max_over_p50
    where share_ppm is the key's integer-ppm share of all rows and
    max_over_p50 (hottest key vs median key) is the skew factor. At
    100 TB the per-key count table is itself large — the quantiles are
    approx_percentile (mergeable sketch) and the top-N is
    TakeOrderedAndProject, so nothing driver-sized depends on key
    cardinality.
    """
    counts = df.groupBy(F.col(key).cast("string").alias("key_value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # total rows and the quantile sketch BOTH derive from the per-key count
    # table (one 1-row frame) — never a second scan of df; the counts
    # exchange is shared with the top-N branch via ReusedExchange.
    dist = counts.agg(
        F.percentile_approx("cnt", [0.5, 0.9, 0.99], int(1.0 / rel_err)).alias("q"),
        F.sum("cnt").alias("_total"),
    ).select(
        F.col("q")[0].alias("p50"),
        F.col("q")[1].alias("p90"),
        F.col("q")[2].alias("p99"),
        "_total",
    )
    return (
        counts.orderBy(F.desc("cnt"), F.asc("key_value"))
        .limit(top_n)
        .crossJoin(F.broadcast(dist))
        .select(
            "key_value",
            "cnt",
            F.expr("cnt * 1000000 div _total").alias("share_ppm"),
            "p50",
            "p90",
            "p99",
            (F.col("cnt") / F.col("p50")).alias("max_over_p50"),
        )
        .orderBy(F.desc("cnt"), F.asc("key_value"))
    )


def _salt_col(salts: int) -> Column:
    """THE salt expression — salted_join and salted_agg must share it."""
    return (F.rand(seed=7) * salts).cast("int")


def _guard_salt_free(df: DataFrame, who: str) -> None:
    if "_salt" in df.columns:
        raise ValueError(
            f"{who}: input already has a '_salt' column — the salting "
            "pattern would silently overwrite and drop it"
        )


def salted_join(
    facts: DataFrame, dim: DataFrame, key: str, salts: int = 8
) -> DataFrame:
    """Skew-join: equi-join where a few hot keys would otherwise pile one
    reducer — the join twin of salted_agg, for when AQE's runtime skew
    split can't apply (e.g. the skewed side feeds a co-partitioned
    downstream op, or the engine predates AQE).

    The fact side salts each row into one of `salts` sub-keys (narrow
    map); the dimension side REPLICATES each row across all `salts`
    sub-keys (explode — dimension-cardinality × salts, fine for dims,
    never for fact-fact joins); the join key becomes (key, salt), so a
    hot key's rows spread over `salts` reducers. Row-for-row equal to the
    plain join (pinned in tests). AQE's skewedJoin does this at runtime
    from actual sizes — prefer it when available; this is the explicit
    form the 100 TB playbook sometimes still needs.
    """
    _guard_salt_free(facts, "salted_join")
    _guard_salt_free(dim, "salted_join")
    f = facts.withColumn("_salt", _salt_col(salts))
    d = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    return f.join(d, [key, "_salt"]).drop("_salt")


def salted_agg(
    df: DataFrame, key: str, value: str, salts: int = 8
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    Phase 1 shuffles on (key, salt) — a hot key's rows spread over `salts`
    partitions instead of one; phase 2 combines the `salts` partials per
    key. sum/count compose exactly; avg is reconstructed from them using
    the NON-NULL value count (SUM skips NULLs, so dividing by the row
    count would understate the mean of any column with NULL measures —
    avg()'s own denominator is count(value)).

    Returns (key, total, n, n_values, mean): n is the row count, n_values
    the non-NULL count the mean divides by.
    """
    _guard_salt_free(df, "salted_agg")
    salt = _salt_col(salts)
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            F.sum(value).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
            F.count(value).alias("_nv"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_s").alias("total"),
        F.sum("_n").alias("n"),
        F.sum("_nv").alias("n_values"),
        (F.sum("_s") / F.sum("_nv")).alias("mean"),
    )


# ---------------------------------------------------------------------------
# Driver gate (r05 rotation): the salting patterns, value-certified
# ---------------------------------------------------------------------------

def q_skew_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-tagged driver gate certifying that the EXPLICIT skew tactics
    produce exactly the unsalted semantics (the plan effects — bounded
    partition width, no hot reducer — are pinned separately in
    tests/test_scale_patterns.py):

      sagg   salted_agg over orders keyed by o_orderstatus (a 3-value key:
             the textbook hot-key shape) — total cents / row count /
             non-NULL count, plus mean_cents derived by exact integer
             division. The oracle is the PLAIN GROUP BY: any salting bug
             (lost rows, double-merged partials) hash-mismatches.
      sjoin  salted_join of customer (facts) against nation (replicated
             dim), rolled up per nation — must equal the plain join.

    Harmonized to (leg, k, n1, n2, n3).
    """
    from ..io import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    agg = salted_agg(orders, key="o_orderstatus", value="price")
    sagg = agg.select(
        F.lit("sagg").alias("leg"),
        F.col("o_orderstatus").alias("k"),
        (F.col("total") * 100).cast("bigint").alias("n1"),
        F.col("n").cast("bigint").alias("n2"),
        F.expr("CAST(CAST(total * 100 AS BIGINT) DIV n_values AS BIGINT)").alias("n3"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = salted_join(cust, nation, key="n_nationkey")
    sjoin = (
        joined.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            (F.sum("bal") * 100).cast("bigint").alias("_bal_cents"),
        )
        .select(
            F.lit("sjoin").alias("leg"),
            F.col("n_name").alias("k"),
            F.col("_bal_cents").alias("n1"),
            F.col("_n").cast("bigint").alias("n2"),
            F.lit(0).cast("bigint").alias("n3"),
        )
    )
    return sagg.unionByName(sjoin).orderBy("leg", "k")


SKEW_PATTERNS_SQL = """
SELECT 'sagg' AS leg, o_orderstatus AS k,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS n1,
       COUNT(1) AS n2,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
            // COUNT(o_totalprice) AS BIGINT) AS n3
FROM orders
GROUP BY o_orderstatus
UNION ALL
SELECT 'sjoin' AS leg, n_name AS k,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS n1,
       COUNT(1) AS n2, CAST(0 AS BIGINT) AS n3
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY leg, k
"""


def register_all() -> None:
    from ..registry import register

    register("skew_patterns", q_skew_patterns, SKEW_PATTERNS_SQL)
