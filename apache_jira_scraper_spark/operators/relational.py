"""Relational query programs over the star schema (SURVEY.md §2.3-2.7).

The reference has no joins/windows (SURVEY §2.3, §2.5 — verified absent);
these are the extension operators mandated by BASELINE.json's north star,
expressed as declarative DataFrame programs so Catalyst picks the physical
strategy (broadcast vs sort-merge joins, partial aggregation, top-k via
TakeOrderedAndProject).

Numeric determinism contract (shared with the DuckDB oracle in
``__spark_entry__.py``): every aggregate over DOUBLE money/quantity columns
casts to DECIMAL first. Decimal addition is exact and order-independent, so
Spark's partial/final aggregation over arbitrary partitionings produces
bit-identical results to DuckDB's single-threaded sum — double summation
would not. Averages divide the exact decimal sum (cast to double) by the
exact count: one IEEE division, deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table, load_table_parallel


def _dec(col: str, typ: str = "decimal(14,4)") -> Column:
    return F.col(col).cast(typ)


def _avg(sum_col: Column, count_col: Column) -> Column:
    return F.round(sum_col.cast("double") / count_col, 6)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan→filter→project→agg→sort.

    Maps the reference's whole "statistics" stage (SURVEY §2.4 A1-A4,
    transformer.py:316-357) onto one hash aggregate. Filter and the 7-column
    projection push down to the parquet scan; aggregation is partial
    (map-side) then final — no extra shuffle beyond the single groupBy.
    """
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(7,4)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(7,4)"))
    charge = disc_price * (one + _dec("l_tax", "decimal(7,4)"))
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # Scale of each cast matches the summand's natural scale, so the
            # cast is exact (no rounding) — required for bit-parity with the
            # oracle, whose DECIMAL rounding mode differs from Spark's.
            F.sum(_dec("l_quantity")).cast("decimal(38,4)").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("decimal(38,4)").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,8)").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,12)").alias("sum_charge"),
            _avg(F.sum(_dec("l_quantity")), F.count(F.lit(1))).alias("avg_qty"),
            _avg(F.sum(_dec("l_extendedprice")), F.count(F.lit(1))).alias("avg_price"),
            _avg(F.sum(_dec("l_discount", "decimal(7,4)")), F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    return out


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(14,4))) AS DECIMAL(38,4)) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4))) AS DECIMAL(38,4)) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4))
           * (CAST(1 AS DECIMAL(7,4)) - CAST(l_discount AS DECIMAL(7,4)))) AS DECIMAL(38,8)) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4))
           * (CAST(1 AS DECIMAL(7,4)) - CAST(l_discount AS DECIMAL(7,4)))
           * (CAST(1 AS DECIMAL(7,4)) + CAST(l_tax AS DECIMAL(7,4)))) AS DECIMAL(38,12)) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(14,4))) AS DOUBLE) / COUNT(1), 6) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4))) AS DOUBLE) / COUNT(1), 6) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(7,4))) AS DOUBLE) / COUNT(1), 6) AS avg_disc,
  COUNT(1) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def _revenue() -> Column:
    one = F.lit(1).cast("decimal(7,4)")
    return _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(7,4)"))


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(14,4))"
    " * (CAST(1 AS DECIMAL(7,4)) - CAST(l_discount AS DECIMAL(7,4)))"
)


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: 3-way join + agg + deterministic top-10 (J1/J2, O-topk).

    customer is broadcast (a dimension even at SF100); orders⋈lineitem is the
    big shuffle join on the natural key, which AQE can convert/skew-split at
    runtime. Top-10 compiles to TakeOrderedAndProject — no global sort.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("decimal(38,8)").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM({_REV_SQL}) AS DECIMAL(38,8)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-01-01'
  AND l_shipdate > DATE '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join through region (J1/J2 composition).

    All four dimensions (supplier/nation/region/customer) broadcast; the only
    shuffle is orders⋈lineitem. Catalyst folds the region filter into the
    nation broadcast — at 100 TB the fact table is touched exactly once.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("decimal(38,8)").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = f"""
SELECT n_name, CAST(SUM({_REV_SQL}) AS DECIMAL(38,8)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k by aggregated revenue (O-topk): TakeOrderedAndProject,
    tie-broken by key so LIMIT is deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(_dec("o_totalprice", "decimal(18,4)")).cast("decimal(38,4)").alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select("c_custkey", "c_name", "total_spent", "n_orders")
        .orderBy(F.desc("total_spent"), "c_custkey")
        .limit(10)
    )


TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total_spent,
       COUNT(1) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey
LIMIT 10
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per market segment (window ranking §2.5)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
        .orderBy("c_mktsegment", "rn")
    )


TOPK_PER_GROUP_SQL = """
SELECT c_mktsegment, c_custkey, c_acctbal, rn
FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
) t
WHERE rn <= 3
ORDER BY c_mktsegment, rn
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS via left_semi (J4): high-value customers that placed an order."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


SEMI_JOIN_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > 9000
  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS via left_anti (J4): customers with no urgent 2001 order.

    (Plain "never ordered" is empty at sf≥0.01 — every customer has orders —
    so the anti side is filtered to keep the result non-trivial at all SFs.)
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2001-01-01").cast("date"))
        & (F.col("o_orderpriority") == "1-URGENT")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '2001-01-01'
                    AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (§2.4 extension)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("l_quantity")).cast("decimal(38,4)").alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(1) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(14,4))) AS DECIMAL(38,4)) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over order status × priority (§2.4 extension)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice", "decimal(18,4)")).cast("decimal(38,4)").alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def q_ratio_to_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-total (A6; example_usage.py:105's percentage) via an
    empty-frame window over the tiny aggregate result."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(_revenue()).cast("decimal(38,8)").alias("revenue")
    )
    total = F.sum("revenue").over(Window.partitionBy())
    return agg.select(
        "l_returnflag",
        "revenue",
        F.round(F.col("revenue").cast("double") / total.cast("double") * 100.0, 6).alias("pct"),
    ).orderBy("l_returnflag")


RATIO_SQL = f"""
SELECT l_returnflag, revenue,
       ROUND(CAST(revenue AS DOUBLE) / CAST(SUM(revenue) OVER () AS DOUBLE) * 100.0, 6) AS pct
FROM (
  SELECT l_returnflag, CAST(SUM({_REV_SQL}) AS DECIMAL(38,8)) AS revenue
  FROM lineitem GROUP BY l_returnflag
) t
ORDER BY l_returnflag
"""


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group (A3's distinct sets, exact form)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("l_returnflag")
    )


DISTINCT_AGG_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set semantics, §2.7 extension)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")).select(
        F.col("o_custkey").alias("custkey")
    )
    return building.intersect(recent).orderBy("custkey")


INTERSECT_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= DATE '2000-01-01'
ORDER BY custkey
"""


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set semantics, §2.7 extension)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")).select(
        F.col("o_custkey").alias("custkey")
    )
    return building.exceptAll(recent.distinct()).distinct().orderBy("custkey")


EXCEPT_SQL = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= DATE '2000-01-01'
ORDER BY custkey
"""


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT order counts: priority rows × status columns (§2.4 extension)."""
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )
    return out.select(
        "o_orderpriority",
        F.col("F").alias("n_f"),
        F.col("O").alias("n_o"),
        F.col("P").alias("n_p"),
    ).orderBy("o_orderpriority")


PIVOT_SQL = """
SELECT o_orderpriority,
       COUNT(1) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(1) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       COUNT(1) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join (J3): events bucketed by value against a tiny
    broadcast bucket dimension → BroadcastNestedLoopJoin, no shuffle."""
    events = load_table_parallel(spark, sf_dir, "events")
    buckets = spark.createDataFrame(
        [("small", 0.0, 50.0), ("mid", 50.0, 150.0), ("large", 150.0, 1e9)],
        "label string, lo double, hi double",
    )
    return (
        events.join(
            F.broadcast(buckets),
            (events.value >= buckets.lo) & (events.value < buckets.hi),
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
        .orderBy("label")
    )


RANGE_JOIN_SQL = """
SELECT label, COUNT(1) AS n, MIN(value) AS min_v, MAX(value) AS max_v
FROM events
JOIN (VALUES ('small', 0.0, 50.0), ('mid', 50.0, 150.0), ('large', 150.0, 1e9))
     AS buckets(label, lo, hi)
  ON value >= lo AND value < hi
GROUP BY label
ORDER BY label
"""


def q_order_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row→many-rows fanout (D2's flatMap shape on the star schema):
    array of gated structs + explode, the same native pattern as
    operators.tasks — oracle is the equivalent UNION ALL."""
    orders = load_table(spark, sf_dir, "orders")
    total = _dec("o_totalprice", "decimal(18,4)")
    candidates = F.array(
        F.struct(F.lit("base").alias("kind"), total.cast("decimal(19,4)").alias("val")),
        F.when(
            F.col("o_orderpriority") == "1-URGENT",
            F.struct(
                F.lit("urgent").alias("kind"),
                (total * F.lit(2).cast("decimal(2,0)")).cast("decimal(19,4)").alias("val"),
            ),
        ),
        F.when(
            F.col("o_orderstatus") == "O",
            F.struct(
                F.lit("open").alias("kind"), F.lit(0).cast("decimal(19,4)").alias("val")
            ),
        ),
    )
    return (
        orders.select(F.col("o_orderkey"), F.explode(candidates).alias("t"))
        .filter(F.col("t").isNotNull())
        .select("o_orderkey", F.col("t.kind").alias("kind"), F.col("t.val").alias("val"))
        .orderBy("o_orderkey", "kind")
    )


ORDER_FANOUT_SQL = """
SELECT o_orderkey, 'base' AS kind,
       CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DECIMAL(19,4)) AS val
FROM orders
UNION ALL
SELECT o_orderkey, 'urgent' AS kind,
       CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 2 AS DECIMAL(19,4)) AS val
FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, 'open' AS kind, CAST(0 AS DECIMAL(19,4)) AS val
FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_orderkey, kind
"""


def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARGMAX via max_by/min_by (A5; utils.py:78's latest-by-mtime)."""
    orders = load_table(spark, sf_dir, "orders")
    # Composite ordering key (days-since-epoch, o_orderkey) packed into one
    # BIGINT so max_by/min_by ties on equal dates resolve identically in both
    # engines — bare max_by(x, o_orderdate) is nondeterministic under ties.
    ord_key = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).cast(
            "bigint"
        )
        * F.lit(1_000_000_000_000).cast("bigint")
        + F.col("o_orderkey")
    )
    return (
        orders.select("o_custkey", "o_orderkey", "o_orderdate", ord_key.alias("ok"))
        .groupBy("o_custkey")
        .agg(
            F.expr("max_by(o_orderkey, ok)").alias("latest_order"),
            F.expr("min_by(o_orderkey, ok)").alias("first_order"),
            F.max("o_orderdate").alias("latest_date"),
        )
        .orderBy("o_custkey")
    )


ARGMAX_SQL = """
SELECT o_custkey,
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
ORDER BY o_custkey
"""


def register_all() -> None:
    from ..registry import register

    register("q1_pricing_summary", q1_pricing_summary, Q1_SQL)
    register("q3_shipping_priority", q3_shipping_priority, Q3_SQL)
    register("q5_local_supplier_volume", q5_local_supplier_volume, Q5_SQL)
    register("top_customers", q_top_customers, TOP_CUSTOMERS_SQL)
    register("topk_per_group", q_topk_per_group, TOPK_PER_GROUP_SQL)
    register("semi_join", q_semi_join, SEMI_JOIN_SQL)
    register("anti_join", q_anti_join, ANTI_JOIN_SQL)
    register("rollup_returnflag", q_rollup, ROLLUP_SQL)
    register("cube_orders", q_cube, CUBE_SQL)
    register("ratio_to_total", q_ratio_to_total, RATIO_SQL)
    register("distinct_agg", q_distinct_agg, DISTINCT_AGG_SQL)
    register("set_intersect", q_intersect, INTERSECT_SQL)
    register("set_except", q_except, EXCEPT_SQL)
    register("pivot_orders", q_pivot, PIVOT_SQL)
    register("range_join", q_range_join, RANGE_JOIN_SQL)
    register("order_fanout", q_order_fanout, ORDER_FANOUT_SQL)
    register("argmax_latest_order", q_argmax, ARGMAX_SQL)
