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

from ..io import load_table


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


def register_all() -> None:
    from ..registry import register

    register("q1_pricing_summary", q1_pricing_summary, Q1_SQL)
