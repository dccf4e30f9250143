"""Library-level oracle parity for operators whose dedicated driver slots
were merged away in the r05 gate rotation: the per-user sessionize rollup
(its gaps-and-islands core now rides window_analytics as session_id) and
the standalone sketch gates (quantiles / approx-distinct, merged into
sketch_stats). The merged gates hash-check the combined forms; these tests
keep the standalone library APIs from rotting.
"""

from __future__ import annotations

from tests.oracle_utils import assert_matches_oracle


def test_sessionize_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.operators.events import SESSIONIZE_SQL, q_sessionize

    assert_matches_oracle(
        q_sessionize(spark, sf_dir), SESSIONIZE_SQL, sf_dir, name="sessionize"
    )


def test_quantiles_exact_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.operators.extended import (
        QUANTILES_SQL,
        q_quantiles_exact,
    )

    assert_matches_oracle(
        q_quantiles_exact(spark, sf_dir), QUANTILES_SQL, sf_dir, name="quantiles_exact"
    )


def test_approx_distinct_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.operators.extended import (
        APPROX_DISTINCT_SQL,
        q_approx_distinct_parts,
    )

    assert_matches_oracle(
        q_approx_distinct_parts(spark, sf_dir),
        APPROX_DISTINCT_SQL,
        sf_dir,
        name="approx_distinct_parts",
    )
