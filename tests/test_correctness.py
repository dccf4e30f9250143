"""Every registered query with an oracle is cross-checked against DuckDB,
mirroring the driver's t2 gate. Parametrization is automatic: registering a
new query in apache_jira_scraper_spark.registry adds a test case here."""

from __future__ import annotations

import pytest

from apache_jira_scraper_spark import registry
from tests.oracle_utils import assert_matches_oracle

_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, _ORACLES[name], sf_dir, name=name)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_query_runs(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
