"""Library-level relational twins that sit outside the 50-gate registry."""

from __future__ import annotations

from apache_jira_scraper_spark.operators.relational import UNPIVOT_SQL, q_unpivot
from tests.oracle_utils import assert_matches_oracle


def test_unpivot_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        q_unpivot(spark, sf_dir), UNPIVOT_SQL, sf_dir, name="unpivot"
    )


def test_unpivot_inverts_pivot(spark, sf_dir):
    """Round trip: unpivot(pivot(orders)) reproduces the plain group-by
    (for the statuses the pivot enumerates)."""
    from pyspark.sql import functions as F

    from apache_jira_scraper_spark.io import load_table

    orders = load_table(spark, sf_dir, "orders")
    exp = {
        (r["o_orderpriority"], r["o_orderstatus"]): r["n"]
        for r in (
            orders.filter(F.col("o_orderstatus").isin("F", "O", "P"))
            .groupBy("o_orderpriority", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        ).collect()
    }
    got = {
        (r["o_orderpriority"], r["o_orderstatus"]): r["n"]
        for r in q_unpivot(spark, sf_dir).collect()
    }
    assert got == exp
