"""Plan-shape regression tests: the scale contract as assertions.

These freeze the physical-plan properties the engine was designed around
(SURVEY.md §4/§8): predicate pushdown to the scan, broadcast dim joins,
no cartesian fallbacks, bounded shuffle counts, codegen on the hot path.
A correctness-preserving change that breaks one of these is a performance
regression at 100 TB even if every value-hash still matches.
"""

from __future__ import annotations

import pytest

from apache_jira_scraper_spark import registry
from apache_jira_scraper_spark.plans.inspect import (
    assert_broadcast_joins,
    assert_filter_pushed,
    assert_max_shuffles,
    assert_no_cartesian,
    assert_whole_stage_codegen,
    operator_counts,
)

_QS = registry.queries()


def test_q1_pushdown_and_shuffles(spark, sf_dir):
    df = _QS["q1_pricing_summary"](spark, sf_dir)
    assert_filter_pushed(df, "l_shipdate")
    # one shuffle for the aggregation, one for the global sort — nothing else
    assert_max_shuffles(df, 2)
    assert_whole_stage_codegen(df)


def test_q5_broadcasts_every_dim(spark, sf_dir):
    df = _QS["q5_local_supplier_volume"](spark, sf_dir)
    assert_filter_pushed(df, "r_name")
    assert_broadcast_joins(df, 5)
    assert_no_cartesian(df)


def test_flatmap_pipeline_joins(spark, sf_dir):
    df = _QS["jira_flatmap_examples"](spark, sf_dir)
    # docs dim broadcast twice (orders text + comment text)
    assert_broadcast_joins(df, 2)
    assert_no_cartesian(df)
    ops = operator_counts(df)
    assert ops.get("Generate", 0) == 1  # the explode — exactly one


def test_dedup_candidates_are_equi_joins(spark, sf_dir):
    for name in ("dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard"):
        assert_no_cartesian(_QS[name](spark, sf_dir))


def test_topk_uses_take_ordered(spark, sf_dir):
    ops = operator_counts(_QS["top_customers"](spark, sf_dir))
    assert ops.get("TakeOrderedAndProject", 0) == 1, ops
