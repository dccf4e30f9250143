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

Canonical OUTPUT encoding (the round-2 gate fix): final columns are never
DECIMAL. The driver's harness moves both results across the pandas bridge,
where DuckDB renders DECIMAL as float64 while Spark yields decimal.Decimal
objects — equal values, different value-hashes. So every money/quantity
aggregate is emitted as fixed-point BIGINT (`_fx`: value × 10^k, exact —
the source data is 2-decimal, so the scaled decimal is integral and the
final integer cast is lossless on both engines). Column names carry the
scale (`*_cents`, `*_e4`, …).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table


def _dec(col: str, typ: str = "decimal(15,2)") -> Column:
    # Scale 2 is the source data's NATURAL scale (all money/qty columns are
    # 2-decimal doubles) — the double→decimal cast recovers the exact value.
    return F.col(col).cast(typ)


def _avg(sum_col: Column, count_col: Column) -> Column:
    return F.round(sum_col.cast("double") / count_col, 6)


def _fx(dec_col: Column, k: int) -> Column:
    """Exact fixed-point BIGINT: decimal × 10^k, integral by construction
    (k >= the decimal's scale), so Spark's truncating and DuckDB's rounding
    int-casts agree bit-for-bit."""
    return (dec_col * F.lit(10**k)).cast("bigint")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan→filter→project→agg→sort.

    Maps the reference's whole "statistics" stage (SURVEY §2.4 A1-A4,
    transformer.py:316-357) onto one hash aggregate. Filter and the 7-column
    projection push down to the parquet scan; aggregation is partial
    (map-side) then final — no extra shuffle beyond the single groupBy.
    """
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(7,2)")
    disc_price = _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(7,2)"))
    charge = disc_price * (one + _dec("l_tax", "decimal(7,2)"))
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # Sums stay exact decimal internally (scale 2/4/6 = the natural
            # scale of each product); the OUTPUT is fixed-point BIGINT so the
            # driver's pandas-bridge hash is engine-stable.
            # floor on BOTH engines: _fx's k >= scale invariant doesn't
            # hold at k=0 over a scale-2 decimal — on a corpus with
            # fractional quantities Spark's bigint cast truncates where
            # DuckDB's rounds half-even. floor(sum) is identical on both
            # and unchanged for integral quantities.
            F.floor(F.sum(_dec("l_quantity"))).cast("bigint").alias("sum_qty"),
            _fx(F.sum(_dec("l_extendedprice")), 2).alias("sum_base_price_cents"),
            _fx(F.sum(disc_price), 4).alias("sum_disc_price_e4"),
            _fx(F.sum(charge), 6).alias("sum_charge_e6"),
            _avg(F.sum(_dec("l_quantity")), F.count(F.lit(1))).alias("avg_qty"),
            _avg(F.sum(_dec("l_extendedprice")), F.count(F.lit(1))).alias("avg_price"),
            _avg(F.sum(_dec("l_discount", "decimal(7,2)")), F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    return out


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(FLOOR(SUM(CAST(l_quantity AS DECIMAL(15,2)))) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) * 100 AS BIGINT) AS sum_base_price_cents,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
           * (CAST(1 AS DECIMAL(7,2)) - CAST(l_discount AS DECIMAL(7,2)))) * 10000 AS BIGINT) AS sum_disc_price_e4,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
           * (CAST(1 AS DECIMAL(7,2)) - CAST(l_discount AS DECIMAL(7,2)))
           * (CAST(1 AS DECIMAL(7,2)) + CAST(l_tax AS DECIMAL(7,2)))) * 1000000 AS BIGINT) AS sum_charge_e6,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) / COUNT(1), 6) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / COUNT(1), 6) AS avg_price,
  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(7,2))) AS DOUBLE) / COUNT(1), 6) AS avg_disc,
  COUNT(1) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def _revenue() -> Column:
    one = F.lit(1).cast("decimal(7,2)")
    return _dec("l_extendedprice") * (one - _dec("l_discount", "decimal(7,2)"))


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(15,2))"
    " * (CAST(1 AS DECIMAL(7,2)) - CAST(l_discount AS DECIMAL(7,2)))"
)


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: 3-way join + agg + deterministic top-10 (J1/J2, O-topk).

    customer scales linearly with SF (150k rows/SF → billions at the 100 TB
    design point), so it carries NO forced broadcast hint: AQE broadcasts it
    at any SF where its measured size fits and falls back to a shuffle join
    when it doesn't. orders⋈lineitem is the big shuffle join on the natural
    key, which AQE can convert/skew-split at runtime. Top-10 compiles to
    TakeOrderedAndProject — no global sort.
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
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_fx(F.sum(_revenue()), 4).alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM({_REV_SQL}) * 10000 AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1998-01-01'
  AND l_shipdate > DATE '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_e4 DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way join through region (J1/J2 composition).

    Only the genuinely fixed-cardinality dims (nation: 25 rows, region: 5
    rows at every SF) carry broadcast hints. customer and supplier scale
    linearly with SF, so they are hint-free: AQE broadcasts them whenever
    their measured size fits and degrades to shuffle joins at the SF where
    it stops fitting — the hint would be an un-demotable OOM at 100 TB.
    Catalyst folds the region filter into the nation broadcast.
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
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_fx(F.sum(_revenue()), 4).alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), "n_name")
    )


Q5_SQL = f"""
SELECT n_name, CAST(SUM({_REV_SQL}) * 10000 AS BIGINT) AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY n_name
ORDER BY revenue_e4 DESC, n_name
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k by aggregated revenue (O-topk): TakeOrderedAndProject,
    tie-broken by key so LIMIT is deterministic.

    Scale shape: the top-10 is decided entirely by the orders aggregate, so
    the LIMIT runs BEFORE the customer join and the only broadcast is the
    10-row winners table — customer (SF-scaling, billions of rows at 100 TB)
    is never broadcast and is probed by an exactly-10-key hash join.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    top10 = (
        orders.groupBy("o_custkey")
        .agg(
            _fx(F.sum(_dec("o_totalprice", "decimal(18,2)")), 2).alias("total_spent_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("total_spent_cents"), "o_custkey")
        .limit(10)
    )
    return (
        cust.join(F.broadcast(top10), F.col("o_custkey") == cust.c_custkey)
        .select("c_custkey", "c_name", "total_spent_cents", "n_orders")
        .orderBy(F.desc("total_spent_cents"), "c_custkey")
    )


TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_spent_cents,
       COUNT(1) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent_cents DESC, c_custkey
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


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4's two flavors in one gate: the left_semi (EXISTS) and left_anti
    (NOT EXISTS) legs tagged and union-ALL'd so both physical join shapes
    are hash-checked in a single driver slot. The per-leg builders
    q_semi_join / q_anti_join remain the library API. Leg detail columns
    are string-encoded (acctbal as exact cents) so the legs union cleanly."""
    semi = q_semi_join(spark, sf_dir).select(
        F.lit("semi").alias("op"),
        "c_custkey",
        "c_name",
        (F.col("c_acctbal").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .cast("string")
        .alias("detail"),
    )
    anti = q_anti_join(spark, sf_dir).select(
        F.lit("anti").alias("op"), "c_custkey", "c_name", F.col("c_mktsegment").alias("detail")
    )
    return semi.unionAll(anti).orderBy("op", "c_custkey")


SEMI_ANTI_SQL = """
SELECT * FROM (
  SELECT 'semi' AS op, c_custkey, c_name,
         CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS VARCHAR) AS detail
  FROM customer
  WHERE c_acctbal > 9000
    AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  UNION ALL
  SELECT 'anti' AS op, c_custkey, c_name, c_mktsegment AS detail
  FROM customer
  WHERE NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= DATE '2001-01-01'
                      AND o_orderpriority = '1-URGENT')
) t
ORDER BY op, c_custkey
"""


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= DATE '2001-01-01'
                    AND o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def q_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets family in ONE gate (§2.4 extension): ROLLUP hierarchy
    totals over lineitem + CUBE over order status × priority, tagged and
    union-ALL'd so both plan shapes (Expand → partial agg → final agg) are
    hash-checked in a single driver slot.

    Two-level form (r13 optimization round, guide §2.3 "aggregate before
    you shuffle"): the fact tables first reduce to their bounded
    finest-grain grids — (flag, status) for lineitem, (status, priority)
    for orders — with plain map-side-partial aggregates, and the REAL
    rollup()/cube()/pivot() operators run over the grids. The Expand
    multiplication (×3 rollup, ×4 cube) therefore applies to a handful of
    grid rows instead of every fact row. COUNT re-aggregates as SUM of
    counts and the measures are exact DECIMAL sums (order-independent), so
    the two-level result is provably the single-pass result row for row;
    the oracle keeps the direct ROLLUP/CUBE form, making the equivalence
    hash-checked end to end. One orders grid serves both the cube and the
    pivot leg (the Pivot node still runs, over the grid)."""
    li = load_table(spark, sf_dir, "lineitem")
    li_grid = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(_dec("l_quantity")).alias("_s"),
    )
    rolled = (
        li_grid.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_n").alias("n"),
            _fx(F.sum("_s"), 2).alias("measure_e2"),
        )
        .select(
            F.lit("rollup_lineitem").alias("gs"),
            F.col("l_returnflag").alias("k1"),
            F.col("l_linestatus").alias("k2"),
            "n",
            "measure_e2",
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    o_grid = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(_dec("o_totalprice", "decimal(18,2)")).alias("_s"),
    )
    cubed = (
        o_grid.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum("_n").alias("n"),
            _fx(F.sum("_s"), 2).alias("measure_e2"),
        )
        .select(
            F.lit("cube_orders").alias("gs"),
            F.col("o_orderstatus").alias("k1"),
            F.col("o_orderpriority").alias("k2"),
            "n",
            "measure_e2",
        )
    )
    # pivot leg (merged r04): the REAL Pivot plan node runs (q_pivot's
    # groupBy().pivot() with fixed columns + zero fill, here over the
    # shared orders grid — SUM of grid counts == COUNT of fact rows),
    # then unpivots to the union's long shape — zero cells preserved so
    # the twin's cross-join form matches exactly. q_pivot stays the
    # direct-scan library API.
    pivoted = (
        o_grid.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("_n"))
        .na.fill(0, ["F", "O", "P"])
        .select(
            "o_orderpriority",
            F.col("F").alias("n_f"),
            F.col("O").alias("n_o"),
            F.col("P").alias("n_p"),
        )
        .unpivot(["o_orderpriority"], ["n_f", "n_o", "n_p"], "sc", "n")
        .select(
            F.lit("pivot_orders").alias("gs"),
            F.col("o_orderpriority").alias("k1"),
            F.upper(F.substring("sc", 3, 1)).alias("k2"),
            "n",
            F.lit(None).cast("bigint").alias("measure_e2"),
        )
    )
    return rolled.unionAll(cubed).unionAll(pivoted).orderBy(
        "gs", F.col("k1").asc_nulls_first(), F.col("k2").asc_nulls_first()
    )


ROLLUP_CUBE_SQL = """
SELECT * FROM (
  SELECT 'rollup_lineitem' AS gs, l_returnflag AS k1, l_linestatus AS k2,
         COUNT(1) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) * 100 AS BIGINT) AS measure_e2
  FROM lineitem
  GROUP BY ROLLUP (l_returnflag, l_linestatus)
  UNION ALL
  SELECT 'cube_orders' AS gs, o_orderstatus AS k1, o_orderpriority AS k2,
         COUNT(1) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS measure_e2
  FROM orders
  GROUP BY CUBE (o_orderstatus, o_orderpriority)
  UNION ALL
  SELECT 'pivot_orders' AS gs, p.o_orderpriority AS k1, s.k2,
         CASE s.k2 WHEN 'F' THEN p.n_f WHEN 'O' THEN p.n_o ELSE p.n_p END AS n,
         CAST(NULL AS BIGINT) AS measure_e2
  FROM (
    SELECT o_orderpriority,
           COUNT(1) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(1) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(1) FILTER (WHERE o_orderstatus = 'P') AS n_p
    FROM orders GROUP BY o_orderpriority
  ) p CROSS JOIN (VALUES ('F'), ('O'), ('P')) s(k2)
) t
ORDER BY gs, k1 ASC NULLS FIRST, k2 ASC NULLS FIRST
"""


def q_ratio_to_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-total (A6; example_usage.py:105's percentage) via an
    empty-frame window over the tiny aggregate result. The percentage is
    integer ppm over whole-unit revenues — exact integer arithmetic on both
    engines, no float division anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        _fx(F.sum(_revenue()), 4).alias("revenue_e4")
    )
    rev_u = F.expr("revenue_e4 DIV 10000")
    total_u = F.sum(rev_u).over(Window.partitionBy())
    # DECIMAL(38,0) numerator: rev_u * 1e8 exceeds int64 once per-flag
    # revenue passes ~9e10 units (SF >= 1 of this schema) — BIGINT math
    # here is a crash at exactly the scale the engine targets. The int
    # division result is ppm-bounded, so the final BIGINT cast is safe.
    return (
        agg.select(
            "l_returnflag",
            "revenue_e4",
            (rev_u.cast("decimal(38,0)") * F.lit(100000000)).alias("_num"),
            total_u.cast("decimal(38,0)").alias("_tot"),
        )
        .select(
            "l_returnflag",
            "revenue_e4",
            F.expr("CAST(_num DIV _tot AS BIGINT)").alias("pct_ppm"),
        )
        .orderBy("l_returnflag")
    )


RATIO_SQL = f"""
SELECT l_returnflag, revenue_e4,
       CAST(CAST(revenue_e4 // 10000 AS HUGEINT) * 100000000
            // (SUM(revenue_e4 // 10000) OVER ()) AS BIGINT) AS pct_ppm
FROM (
  SELECT l_returnflag, CAST(SUM({_REV_SQL}) * 10000 AS BIGINT) AS revenue_e4
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


def q_returnflag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ratio_to_total + distinct_agg merged into ONE l_returnflag
    aggregation pass (r04 gate rotation: same grouping key, same scan —
    two driver slots' semantics for one): integer-ppm revenue share via
    the empty-frame window over the 3-row aggregate, plus the three exact
    COUNT(DISTINCT)s. The standalone q_ratio_to_total / q_distinct_agg
    stay the library API.

    Shape (r13): four independent narrow aggregates joined on the 3-row
    flag key instead of one multi-COUNT(DISTINCT) pass. The single-pass
    form rewrites to a 4x Expand (every lineitem row duplicated once per
    distinct spec) flowing through two exchange+aggregate stages; the
    4-branch form scans 2-column projections (~1.3x the bytes of one
    6-column scan under parquet column pruning) with NO row expansion,
    each branch map-side partially aggregated, and the branches overlap
    as independent stages. 2.5x faster at sf0.1 (1.74 -> 0.68 s
    isolated) with byte-identical output; the 3-row join sides
    broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_returnflag").agg(
        _fx(F.sum(_revenue()), 4).alias("revenue_e4")
    )

    def dcount(col: str, alias: str) -> DataFrame:
        return (
            li.select("l_returnflag", col)
            .distinct()
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    agg = (
        rev.join(dcount("l_partkey", "n_parts"), "l_returnflag")
        .join(dcount("l_suppkey", "n_supps"), "l_returnflag")
        .join(dcount("l_orderkey", "n_orders"), "l_returnflag")
    )
    rev_u = F.expr("revenue_e4 DIV 10000")
    total_u = F.sum(rev_u).over(Window.partitionBy())
    # DECIMAL(38,0) numerator — see q_ratio_to_total: BIGINT overflows at
    # SF >= 1 (ANSI Spark throws, DuckDB's BIGINT product goes out of
    # range); the ppm-bounded quotient casts back to BIGINT losslessly.
    return (
        agg.select(
            "l_returnflag",
            "revenue_e4",
            (rev_u.cast("decimal(38,0)") * F.lit(100000000)).alias("_num"),
            total_u.cast("decimal(38,0)").alias("_tot"),
            "n_parts",
            "n_supps",
            "n_orders",
        )
        .select(
            "l_returnflag",
            "revenue_e4",
            F.expr("CAST(_num DIV _tot AS BIGINT)").alias("pct_ppm"),
            "n_parts",
            "n_supps",
            "n_orders",
        )
        .orderBy("l_returnflag")
    )


RETURNFLAG_STATS_SQL = f"""
SELECT l_returnflag, revenue_e4,
       CAST(CAST(revenue_e4 // 10000 AS HUGEINT) * 100000000
            // (SUM(revenue_e4 // 10000) OVER ()) AS BIGINT) AS pct_ppm,
       n_parts, n_supps, n_orders
FROM (
  SELECT l_returnflag, CAST(SUM({_REV_SQL}) * 10000 AS BIGINT) AS revenue_e4,
         COUNT(DISTINCT l_partkey) AS n_parts,
         COUNT(DISTINCT l_suppkey) AS n_supps,
         COUNT(DISTINCT l_orderkey) AS n_orders
  FROM lineitem GROUP BY l_returnflag
) t
ORDER BY l_returnflag
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole §2.7 set-operation family — INTERSECT, EXCEPT, UNION
    (distinct) — over the same two customer-key sets, tagged and unioned
    into one gate query. Each leg keeps its native Spark operator so all
    three physical shapes (left-semi agg, left-anti agg, union-distinct)
    are exercised and hash-checked."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")).select(
        F.col("o_custkey").alias("custkey")
    )
    legs = [
        building.intersect(recent).select(F.lit("intersect").alias("op"), "custkey"),
        # subtract IS Spark's EXCEPT DISTINCT — the exceptAll+distinct
        # composition only matched EXCEPT because the left side happened
        # to be key-unique (a duplicate surviving exceptAll would be kept
        # where EXCEPT drops it)
        building.subtract(recent).select(F.lit("except").alias("op"), "custkey"),
        building.union(recent).distinct().select(F.lit("union").alias("op"), "custkey"),
    ]
    return legs[0].unionAll(legs[1]).unionAll(legs[2]).orderBy("op", "custkey")


SET_OPS_SQL = """
SELECT * FROM (
  SELECT 'intersect' AS op, custkey FROM (
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '2000-01-01')
  UNION ALL
  SELECT 'except' AS op, custkey FROM (
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '2000-01-01')
  UNION ALL
  SELECT 'union' AS op, custkey FROM (
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '2000-01-01')
) t
ORDER BY op, custkey
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


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (the inverse of q_pivot): the pivoted wide table back to
    (priority, status, n) long form via the native `unpivot`/stack — a
    narrow per-row expansion, no shuffle beyond the pivot's own aggregate.
    Library twin of the pivot gate (oracle parity in
    tests/test_relational_extra.py); zero-count cells are dropped to keep
    the long form sparse, matching the oracle's grouped counts."""
    wide = q_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            ["o_orderpriority"],
            ["n_f", "n_o", "n_p"],
            "status_col",
            "n",
        )
        .withColumn(
            "o_orderstatus", F.upper(F.substring("status_col", 3, 1))
        )
        .filter(F.col("n") > 0)
        .select("o_orderpriority", "o_orderstatus", "n")
        .orderBy("o_orderpriority", "o_orderstatus")
    )


UNPIVOT_SQL = """
SELECT o_orderpriority, o_orderstatus, COUNT(1) AS n
FROM orders
WHERE o_orderstatus IN ('F', 'O', 'P')
GROUP BY o_orderpriority, o_orderstatus
ORDER BY o_orderpriority, o_orderstatus
"""


RANGE_BUCKETS = (("small", 0.0, 50.0), ("mid", 50.0, 150.0), ("large", 150.0, 1e9))


def range_join_generic(events: DataFrame, buckets: DataFrame) -> DataFrame:
    """Generic theta/range join (J3) for a NON-literal bucket dimension:
    broadcast the small side, evaluate the range predicate per (row ×
    bucket) in a BroadcastNestedLoopJoin. Use only when the dimension is a
    runtime table; for a static literal bucket list use the CASE-expression
    bucketing in q_range_join — a narrow codegen map, ~10× cheaper (the
    BNLJ predicate cost scales with bucket count at 100 TB).
    """
    return events.join(
        F.broadcast(buckets),
        (events.value >= buckets.lo) & (events.value < buckets.hi),
    )


def interval_overlap_join(
    a: DataFrame, b: DataFrame, bucket_width: int = 3600
) -> DataFrame:
    """Two-sided interval overlap join — pairs (a, b) whose [start, end]
    ranges intersect — as a bucketed EQUI-join, the scale path where both
    sides are large (range_join_generic's BNLJ needs one side broadcast;
    a fact-fact interval join at 100 TB needs this form).

    Mechanics: each interval explodes to the `bucket_width`-wide buckets
    it touches (fan-out = interval span / width, the tuning knob); the
    candidate join is on the bucket id, then the exact overlap predicate
    filters. A pair overlapping k shared buckets would emit k times —
    instead of a distinct() shuffle, each pair is emitted ONLY in the
    bucket containing max(a.start, b.start) (the first bucket where both
    are live — computable per-row, so dedup is a filter, not a shuffle).

    Inputs: (id, start, end) with integer/long bounds, end >= start,
    inclusive. Returns (a_id, b_id, overlap_start, overlap_end).
    """

    def fdiv(expr: str) -> Column:
        # EXACT integer floor-division: floor(x / w) through doubles loses
        # precision above 2^53 — nanosecond-epoch bounds (~1.7e18) would
        # drop or double-emit pairs. x - pmod(x, w) is divisible by w, so
        # DIV is exact, and pmod keeps floor (not truncate-toward-zero)
        # semantics for negative coordinates.
        return F.expr(
            f"(({expr}) - pmod(({expr}), {bucket_width})) div {bucket_width}"
        )

    def tag(df: DataFrame, p: str) -> DataFrame:
        return df.select(
            F.col("id").alias(f"{p}_id"),
            F.col("start").alias(f"{p}_start"),
            F.col("end").alias(f"{p}_end"),
            F.explode(F.sequence(fdiv("start"), fdiv("end"))).alias("bucket"),
        )

    cand = tag(a, "a").join(tag(b, "b"), "bucket")
    overlap = (F.col("a_start") <= F.col("b_end")) & (
        F.col("b_start") <= F.col("a_end")
    )
    first_bucket = fdiv("greatest(a_start, b_start)")
    return (
        cand.filter(overlap & (F.col("bucket") == first_bucket))
        .select(
            "a_id",
            "b_id",
            F.greatest("a_start", "b_start").alias("overlap_start"),
            F.least("a_end", "b_end").alias("overlap_end"),
        )
    )


def _seg_len(n, k: int, i: int):
    """Length of segment i (0-based) in the even partition of a length-n
    string into k segments: the first n%k segments get the extra char."""
    return F.floor(n / k).cast("int") + F.when(F.lit(i) < n % k, 1).otherwise(0)


def _seg_start(n, k: int, i: int):
    """1-based start of segment i under the same convention as _seg_len."""
    return (F.lit(i) * F.floor(n / k).cast("int") + F.least(F.lit(i), n % k) + 1).cast(
        "int"
    )


def _passjoin_segments(df: DataFrame, d: int, salts: int = 1) -> DataFrame:
    """One row per (string, segment): the PassJoin index side. Block key is
    (L, i, g) = (own length, segment index, segment text) — selective at
    EVERY length because the key embeds the exact length and slot, and
    segment text grows with the string (len/(d+1) chars). With salts > 1
    each row additionally carries salt = hash(a_id) mod salts — the
    hot-block parallelization key (see fuzzy_string_join)."""
    k = d + 1
    s, n = F.col("s"), F.length("s")
    segs = F.array(
        *[
            F.struct(
                F.lit(i).alias("gi"),
                F.substr(s, _seg_start(n, k, i), _seg_len(n, k, i)).alias("g"),
            )
            for i in range(k)
        ]
    )
    out = df.select(
        F.col("id").alias("a_id"), s.alias("a_s"), n.alias("L"), F.explode(segs).alias("b")
    ).select("a_id", "a_s", "L", F.col("b.gi").alias("gi"), F.col("b.g").alias("g"))
    if salts > 1:
        out = out.withColumn("salt", F.pmod(F.hash("a_id"), F.lit(salts)))
    return out


def _passjoin_substrings(df: DataFrame, d: int, salts: int = 1) -> DataFrame:
    """One row per (string, target length L, slot i, candidate start): the
    PassJoin probe side. For each candidate partner length L in
    [len-d, len+d] and slot i, emits the substrings of this string whose
    length equals slot i's segment length under the length-L partition and
    whose start is within ±d of slot i's start (alignment under <= d edits
    shifts positions by at most d — the PassJoin position window). A
    zero-length slot (L < d+1) emits a single empty-text row: an empty
    segment trivially occurs. Fan-out is bounded by (2d+1)^2 * (d+1) rows
    per string, independent of corpus size and string length."""
    k = d + 1
    s, m = F.col("s"), F.length("s")
    empty = F.array().cast("array<struct<L:int,gi:int,g:string>>")

    def _sub_struct(L, i, li):
        def inner(j):
            return F.struct(
                L.alias("L"), F.lit(i).alias("gi"), F.substr(s, j, li).alias("g")
            )

        return inner

    pieces = []
    for delta in range(-d, d + 1):
        L = (m + delta).cast("int")
        for i in range(k):
            li = _seg_len(L, k, i)
            p = _seg_start(L, k, i)
            lo = F.greatest(F.lit(1), p - d)
            hi = F.least(m - li + 1, p + d)
            window = F.when(
                (L >= 0) & (li >= 1) & (lo <= hi),
                F.transform(F.sequence(lo, hi), _sub_struct(L, i, li)),
            ).otherwise(
                F.when(
                    (L >= 0) & (li == 0),
                    F.array(
                        F.struct(
                            L.alias("L"), F.lit(i).alias("gi"), F.lit("").alias("g")
                        )
                    ),
                ).otherwise(empty)
            )
            pieces.append(window)
    subs = F.flatten(F.array(*pieces))
    out = df.select(
        F.col("id").alias("b_id"), s.alias("b_s"), F.explode(subs).alias("b")
    ).select(
        "b_id", "b_s", F.col("b.L").alias("L"), F.col("b.gi").alias("gi"), F.col("b.g").alias("g")
    )
    if salts > 1:
        # replicate each probe row across every salt group (the dimension
        # side of the standard salted join)
        out = out.withColumn(
            "salt", F.explode(F.array(*[F.lit(r) for r in range(salts)]))
        )
    return out


def fuzzy_string_join(
    a: DataFrame, b: DataFrame, max_dist: int = 2, salts: int = 1,
    canonical: bool = False,
) -> DataFrame:
    """Edit-distance join (entity resolution / data cleaning): pairs whose
    strings are within `max_dist` Levenshtein edits — PassJoin-style
    segment blocking (Li, Deng & Feng, "PassJoin: A Partition-based Method
    for Similarity Joins", PVLDB 2012) plus exact verification, never the
    quadratic cross join.

    Blocking: partition each a-string into d+1 even segments; within d
    edits at least one segment appears VERBATIM in the b-string, start
    position shifted by at most d. The block key (own-length, slot,
    segment-text) is a pure equi-join key and is selective at every
    length — long strings get long segments (len/(d+1) chars), short
    strings get keys pinned to their exact length and slot; there is no
    low-selectivity single-character tier. The |len(a)-len(b)| <= d
    length filter is structural (the key embeds a's length; b only emits
    lengths within ±d of its own).

    Verification is Spark's builtin JVM-side levenshtein on the deduped
    candidate pairs.

    Hot-segment caveat: a corpus whose strings share a long COMMON PREFIX
    (serials like 'Customer#000123', URLs with one host) degenerates the
    prefix segment into a single hot block — |block|² candidates, and the
    collisions are genuine (any exact substring blocking must pair
    strings that really share a segment; no recall-preserving df-cutoff
    exists, because for pairs whose edit lies in the OTHER segment the
    common prefix is their only surviving block). More generally,
    candidate volume is Σ_blocks |a-side|·|b-side|: it grows LINEARLY in
    corpus size only while segment entropy grows with the data (distinct
    block keys multiply), and degrades toward quadratic as the segment
    value space saturates — low-entropy corpora (names drawn from small
    first/last pools, serial-numbered strings) hit this even without a
    universal prefix. At scale, normalize known-constant prefixes out of
    `s` before joining, or pass ``salts=R``: the index side salts by
    hash(a_id) mod R and the probe side replicates R ways, so each hot
    block's inherent |block|² verify work spreads over R tasks instead
    of one (result identical — every pair still meets in exactly its
    a_id's salt group per slot; cost is R× the tiny probe table, the
    standard salted-join trade).

    Inputs: (id, s) string tables. Returns (a_id, b_id, dist), each pair
    once. When a and b are the SAME DataFrame (self-join), reflexive
    a_id == b_id pairs are dropped; for two distinct tables overlapping
    id spaces are fine and no pair is dropped.

    ``canonical=True`` (self-join only, r14 guide §2.3): emit each
    unordered pair once as a_id < b_id, filtered at the CANDIDATE stage —
    before the levenshtein verify, not after it. A symmetric self-join
    verifies every surviving pair twice ((x,y) via x's segments in y AND
    (y,x) via y's segments in x — PassJoin's theorem holds with either
    member as the segment side, so dropping the a_id > b_id orientation
    loses no pair); on the hot-block corpus this halves the dominant
    |block|² verification volume. Callers wanting both orientations (the
    directional index-vs-probe form) keep the default.

    Plan note: verification runs STREAMED through the block join (project
    + filter on the join output — candidate rows are never shuffled), and
    the cross-slot pair dedup happens AFTER the distance filter on the
    surviving pairs only. The alternative (distinct on the raw candidate
    set, then verify) shuffles every candidate row with both full strings
    attached — on a hot block that is |block|² wide rows through an
    exchange; a pair can match in at most d+1 slots, so the duplicate
    verification work is bounded and far cheaper than the shuffle.
    """
    if canonical and a is not b:
        raise ValueError("fuzzy_string_join: canonical=True requires a self-join")
    key = ["L", "gi", "g"] + (["salt"] if salts > 1 else [])
    cand = _passjoin_segments(a, max_dist, salts).join(
        _passjoin_substrings(b, max_dist, salts), key
    )
    if a is b:
        cand = cand.filter(
            F.col("a_id") < F.col("b_id")
            if canonical
            else F.col("a_id") != F.col("b_id")
        )
    # threshold form: banded O(d*len) DP with early exit (returns -1 past
    # the threshold) instead of the full O(len^2) matrix per candidate —
    # on a hot block the verify is the dominant cost and this is ~4x less
    # work per pair
    dist = F.levenshtein("a_s", "b_s", max_dist)
    return (
        cand.select("a_id", "b_id", dist.alias("dist"))
        .filter(F.col("dist") >= 0)
        # dist is a pure function of the pair — min() is just the dedup
        .groupBy("a_id", "b_id")
        .agg(F.min("dist").alias("dist"))
    )


FUZZY_GATE_MAX_KEY = 2000


def q_fuzzy_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance self-join gate over customer names (driver-certified
    since r04 — the slot freed by folding the pivot into rollup_cube):
    PassJoin segment blocking + exact levenshtein verify at max_dist=1,
    canonical unordered pairs. The DuckDB oracle is the brute-force
    length-pruned cross join — different algorithm, same result, so the
    blocking's exact-recall contract is hash-checked end-to-end.

    The gate bounds the input to the first FUZZY_GATE_MAX_KEY keys (the
    bm25 n_queries convention): TPC-H customer names all share the
    'Customer#' prefix, the documented hot-segment degeneracy of exact
    substring blocking (see fuzzy_string_join) — the bound keeps the
    hot block's inherent |block|² verification volume fixed across scale
    factors instead of quadratic in SF.

    The block join + levenshtein verify run PER CALL (r14, VERDICT r13
    item 1: the r13 session checkpoint of the verified pair table WAS the
    gate's result modulo the presentation sort, so every warm bench sample
    timed a ~19.5k-row checkpoint scan instead of the declared join).
    """
    from ..io import load_table_parallel

    # load_table_parallel: the bounded name table arrives as ONE scan
    # partition, and under a broadcast block-join the join OUTPUT's
    # parallelism equals the streamed side's input partitions — without
    # the fan-out the whole hot block's verify runs on one core. (The
    # `salts` knob solves the same problem for the SMJ regime at real
    # scale, where the join shuffles on the block key.)
    cust = (
        load_table_parallel(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < FUZZY_GATE_MAX_KEY)
        .select(F.col("c_custkey").alias("id"), F.col("c_name").alias("s"))
    )
    # canonical=True: the gate only keeps a_id < b_id, so verifying both
    # orientations (the default) would levenshtein every hot-block pair
    # twice and throw half away (r14, guide §2.3)
    out = fuzzy_string_join(cust, cust, max_dist=1, canonical=True)
    return out.select("a_id", "b_id", "dist").orderBy("a_id", "b_id")


FUZZY_NAME_SQL = f"""
SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
       levenshtein(a.c_name, b.c_name) AS dist
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND abs(length(a.c_name) - length(b.c_name)) <= 1
WHERE a.c_custkey < {FUZZY_GATE_MAX_KEY} AND b.c_custkey < {FUZZY_GATE_MAX_KEY}
  AND levenshtein(a.c_name, b.c_name) <= 1
ORDER BY a_id, b_id
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range bucketing (J3's static-dimension form): the literal bucket list
    folds into a CASE WHEN chain — a narrow whole-stage-codegen map with NO
    join node at all, the scale-correct plan for a constant dimension. The
    BroadcastNestedLoopJoin variant survives as `range_join_generic` for
    genuinely dynamic bucket tables (plan-shape pinned in tests).
    """
    events = load_table(spark, sf_dir, "events")
    label = F.lit(None).cast("string")
    for name, lo, hi in reversed(RANGE_BUCKETS):
        cond = (F.col("value") >= lo) & (F.col("value") < hi)
        label = F.when(cond, name).otherwise(label)
    return (
        events.withColumn("label", label)
        .filter(F.col("label").isNotNull())
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
FROM (
  SELECT CASE WHEN value >= 0.0 AND value < 50.0 THEN 'small'
              WHEN value >= 50.0 AND value < 150.0 THEN 'mid'
              WHEN value >= 150.0 AND value < 1e9 THEN 'large'
         END AS label, value
  FROM events
) t
WHERE label IS NOT NULL
GROUP BY label
ORDER BY label
"""


def q_order_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row→many-rows fanout (D2's flatMap shape on the star schema):
    array of gated structs + explode, the same native pattern as
    operators.tasks — oracle is the equivalent UNION ALL."""
    orders = load_table(spark, sf_dir, "orders")
    cents = _fx(_dec("o_totalprice", "decimal(18,2)"), 2)
    candidates = F.array(
        F.struct(F.lit("base").alias("kind"), cents.alias("val_cents")),
        F.when(
            F.col("o_orderpriority") == "1-URGENT",
            F.struct(F.lit("urgent").alias("kind"), (cents * 2).alias("val_cents")),
        ),
        F.when(
            F.col("o_orderstatus") == "O",
            F.struct(F.lit("open").alias("kind"), F.lit(0).cast("bigint").alias("val_cents")),
        ),
    )
    return (
        orders.select(F.col("o_orderkey"), F.explode(candidates).alias("t"))
        .filter(F.col("t").isNotNull())
        .select(
            "o_orderkey", F.col("t.kind").alias("kind"), F.col("t.val_cents").alias("val_cents")
        )
        .orderBy("o_orderkey", "kind")
    )


ORDER_FANOUT_SQL = """
SELECT o_orderkey, 'base' AS kind,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS val_cents
FROM orders
UNION ALL
SELECT o_orderkey, 'urgent' AS kind,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 2 AS val_cents
FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, 'open' AS kind, CAST(0 AS BIGINT) AS val_cents
FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_orderkey, kind
"""


def q_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARGMAX via max_by/min_by (A5; utils.py:78's latest-by-mtime)."""
    orders = load_table(spark, sf_dir, "orders")
    # Composite ordering key (days-since-epoch, o_orderkey) packed into one
    # BIGINT so max_by/min_by ties on equal dates resolve identically in both
    # engines — bare max_by(x, o_orderdate) is nondeterministic under ties.
    # Packing bound: o_orderkey must stay < 1e12 or keys from different
    # dates collide — that is SF ~166k in this schema (~1.7x the 100 TB
    # design point); past it, widen the pack to DECIMAL(38,0) like the
    # ratio-to-total numerator.
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
    register("semi_anti_join", q_semi_anti_join, SEMI_ANTI_SQL)
    register("rollup_cube", q_rollup_cube, ROLLUP_CUBE_SQL)
    # ratio_to_total + distinct_agg merged (same l_returnflag grouping, one
    # scan) — r04 rotation; the freed slot certifies corpus_report.
    register("returnflag_stats", q_returnflag_stats, RETURNFLAG_STATS_SQL)
    register("set_ops", q_set_ops, SET_OPS_SQL)
    # pivot_orders is a leg of rollup_cube since r04 (the Pivot node still
    # runs inside the merged gate); the freed slot certifies the PassJoin
    # fuzzy join against a brute-force oracle.
    register("fuzzy_name_join", q_fuzzy_name_join, FUZZY_NAME_SQL)
    # range_join re-registered in r06 (the reference-mapped J3 static form;
    # VERDICT r05 item 2) — the r05 merge into event_agg coerced exact cents
    # through DOUBLE and stranded tests/test_plans.py's plan pin.
    register("range_join", q_range_join, RANGE_JOIN_SQL)
    register("order_fanout", q_order_fanout, ORDER_FANOUT_SQL)
    # argmax_latest_order is merged into relational2's customer_order_profile
    # (one o_custkey aggregation carries argmax + order count into the
    # full-outer join) — r04 rotation; the freed slot certifies gap_fill.
