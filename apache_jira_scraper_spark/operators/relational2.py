"""Second relational batch: outer joins, union-distinct, date/interval
functions, and a vectorized Pandas UDAF — the last unchecked rows of
SURVEY.md §2.3/2.7/2.8/2.4.

  outer_join_balance   J1's left/full-outer flavors: customers without
                       orders and orders-per-customer via a full outer join
                       (null-extension semantics hash-checked)
  date_arithmetic      §2.8 [X] date fns: interval arithmetic, datediff,
                       unix_timestamp, date_trunc('month')
  udaf_geomean         §2.4 [X] UDAF: grouped-agg Pandas UDF (Arrow batch)
                       computing the geometric mean of event values — the
                       vectorized Python escape hatch, oracle'd via
                       exp(avg(ln)) with integer-ppm rounding
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table


def q_outer_join_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join customer↔orders: per-customer order stats with
    null-extension on both sides kept visible (J1 left/right/full family).

    Plan shape at scale: shuffle hash / sort-merge on the key — outer joins
    can't broadcast the null-producing side, so both sides partition by
    o_custkey; AQE handles skewed customers.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer")
    return (
        j.select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.col("c_custkey").isNull().alias("order_without_customer"),
            F.col("o_custkey").isNull().alias("customer_without_order"),
        )
        .orderBy("custkey")
    )


OUTER_JOIN_SQL = """
SELECT coalesce(c_custkey, o_custkey) AS custkey,
       coalesce(n_orders, 0) AS n_orders,
       c_custkey IS NULL AS order_without_customer,
       o_custkey IS NULL AS customer_without_order
FROM (SELECT c_custkey, c_nationkey FROM customer) c
FULL OUTER JOIN (SELECT o_custkey, COUNT(1) AS n_orders FROM orders GROUP BY o_custkey) o
  ON c.c_custkey = o.o_custkey
ORDER BY custkey
"""


def q_customer_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax_latest_order + outer_join_balance merged into ONE
    per-customer gate (r04 gate rotation): the orders aggregation computes
    the max_by/min_by argmax columns AND the order count in one shuffle,
    then full-outer-joins against customer so null-extension on both sides
    stays visible — the wide per-customer silver-table shape a real
    pipeline lands. Plan at scale: one o_custkey agg + one shuffle
    full-outer join (outer joins can't broadcast the null-producing side).
    The standalone q_argmax / q_outer_join_balance stay the library API.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders")
    # packing bound: o_orderkey < 1e12 (SF ~166k) — see q_argmax's note
    ord_key = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).cast(
            "bigint"
        )
        * F.lit(1_000_000_000_000).cast("bigint")
        + F.col("o_orderkey")
    )
    agg = (
        orders.select("o_custkey", "o_orderkey", "o_orderdate", ord_key.alias("ok"))
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr("max_by(o_orderkey, ok)").alias("latest_order"),
            F.expr("min_by(o_orderkey, ok)").alias("first_order"),
            F.max("o_orderdate").alias("latest_date"),
        )
    )
    j = cust.join(agg, cust.c_custkey == agg.o_custkey, "full_outer")
    return (
        j.select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            "latest_order",
            "first_order",
            "latest_date",
            F.col("c_custkey").isNull().alias("order_without_customer"),
            F.col("o_custkey").isNull().alias("customer_without_order"),
        )
        .orderBy("custkey")
    )


CUSTOMER_ORDER_PROFILE_SQL = """
SELECT coalesce(c_custkey, o_custkey) AS custkey,
       coalesce(n_orders, 0) AS n_orders,
       latest_order, first_order, latest_date,
       c_custkey IS NULL AS order_without_customer,
       o_custkey IS NULL AS customer_without_order
FROM (SELECT c_custkey, c_nationkey FROM customer) c
FULL OUTER JOIN (
  SELECT o_custkey, COUNT(1) AS n_orders,
         MAX_BY(o_orderkey, ok) AS latest_order,
         MIN_BY(o_orderkey, ok) AS first_order,
         MAX(o_orderdate) AS latest_date
  FROM (
    SELECT o_custkey, o_orderkey, o_orderdate,
           DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) * 1000000000000
             + o_orderkey AS ok
    FROM orders
  ) t
  GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
ORDER BY custkey
"""


def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval function family over orders: month bucketing, interval
    shift, day difference from a fixed epoch, unix seconds."""
    # Date-typed finals are rendered as ISO strings: Spark's toPandas yields
    # datetime.date objects where DuckDB's .df() yields midnight Timestamps,
    # so the raw types hash differently across the driver's pandas bridge.
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.date_add("o_orderdate", 90)).cast("string").alias("earliest_due"),
            F.max(F.datediff("o_orderdate", F.lit("1992-01-01"))).alias("max_day_offset"),
            F.min(F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))).alias(
                "min_unix"
            ),
        )
        .orderBy("month")
    )


DATE_ARITH_SQL = """
SELECT CAST(CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS VARCHAR) AS month,
       COUNT(1) AS n,
       CAST(MIN(CAST(o_orderdate + INTERVAL 90 DAY AS DATE)) AS VARCHAR) AS earliest_due,
       MAX(datediff('day', DATE '1992-01-01', o_orderdate)) AS max_day_offset,
       MIN(CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)) AS min_unix
FROM orders
GROUP BY DATE_TRUNC('month', o_orderdate)
ORDER BY month
"""


def q_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg Pandas UDAF (Arrow-vectorized): geometric mean of event
    value per event_type — the §2.4 UDAF row. Integer ppm output so the
    oracle (exp(avg(ln))) compares exactly despite float rounding modes.

    Scale note: GROUPED_AGG pandas UDFs run after the shuffle with whole
    groups in memory — fine for bounded groups like these; unbounded groups
    would use the two-phase trick (ln-sum natively, exp at the end).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: "pd.Series") -> "float":
        import numpy as np

        return float(np.exp(np.log(v[v > 0]).mean()))

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return (
        ev.groupBy("event_type")
        .agg(geomean("value").alias("gm"))
        .select(
            "event_type",
            F.round(F.col("gm") * 1_000_000).cast("bigint").alias("geomean_ppm"),
        )
        .orderBy("event_type")
    )


UDAF_GEOMEAN_SQL = """
SELECT event_type,
       CAST(ROUND(exp(avg(ln(value))) * 1000000) AS BIGINT) AS geomean_ppm
FROM events
WHERE value > 0
GROUP BY event_type
ORDER BY event_type
"""


def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar-subquery pattern: orders above the global average
    price, counted per status. The comparison is done as
    ``price * n > total`` in exact decimal/bigint arithmetic — dividing
    first would put a float boundary between the engines.

    Plan: one tiny agg broadcast against the fact scan — no shuffle of the
    fact table at all.
    """
    o = load_table(spark, sf_dir, "orders")
    tot = o.agg(
        F.sum("o_totalprice").alias("t"), F.count(F.lit(1)).alias("n")
    )
    return (
        o.crossJoin(F.broadcast(tot))
        .filter(F.col("o_totalprice") * F.col("n") > F.col("t"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
        .orderBy("o_orderstatus")
    )


ABOVE_AVG_SQL = """
SELECT o_orderstatus, COUNT(1) AS n_above_avg
FROM orders, (SELECT SUM(o_totalprice) AS t, COUNT(1) AS n FROM orders) s
WHERE o_totalprice * n > t
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def q_array_ops_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + higher-order functions at the gate: per-customer
    distinct order-priority set (built by collect_set), joined/sized/probed
    with native array functions (§2.8 F8 surface over the star schema)."""
    o = load_table(spark, sf_dir, "orders")
    prios = F.sort_array(F.collect_set("o_orderpriority"))
    return (
        o.groupBy("o_custkey")
        .agg(prios.alias("prios"))
        .select(
            "o_custkey",
            F.array_join("prios", ",").alias("prios_csv"),
            F.size("prios").alias("n_prios"),
            F.array_contains("prios", "1-URGENT").alias("has_urgent"),
            F.element_at("prios", 1).alias("first_prio"),
        )
        .orderBy("o_custkey")
    )


ARRAY_OPS_SQL = """
SELECT o_custkey,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS prios_csv,
       COUNT(DISTINCT o_orderpriority) AS n_prios,
       bool_or(o_orderpriority = '1-URGENT') AS has_urgent,
       MIN(o_orderpriority) AS first_prio
FROM orders
GROUP BY o_custkey
ORDER BY o_custkey
"""


def register_all() -> None:
    from ..registry import register

    register("customer_order_profile", q_customer_order_profile, CUSTOMER_ORDER_PROFILE_SQL)
    # date_arithmetic merged into the scalar_funcs gate (events.py, r05);
    # q_date_arithmetic + DATE_ARITH_SQL stay the library API.
    register("udaf_geomean", q_udaf_geomean, UDAF_GEOMEAN_SQL)
    register("above_avg_orders", q_above_avg_orders, ABOVE_AVG_SQL)
    register("array_ops_per_customer", q_array_ops_per_customer, ARRAY_OPS_SQL)
