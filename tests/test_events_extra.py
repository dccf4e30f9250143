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


def test_cms_heavy_hitter_envelope_and_exactness(spark, sf_dir):
    """The heavy-hitter leg on the real corpus: the exact top matches an
    independent groupBy ranking (min-partkey tie-break), the count-min
    verdict holds per flag, and the sketch actually probes a non-trivial
    count (top_count > 1 somewhere — a degenerate all-ones table would
    certify nothing)."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.extended import q_cms_heavy_hitter
    from pyspark.sql import functions as F

    rows = q_cms_heavy_hitter(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    ref = {}
    for r in (
        li.groupBy("l_returnflag", "l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ):
        best = ref.get(r["l_returnflag"])
        cand = (r["c"], -r["l_partkey"])
        if best is None or cand > best:
            ref[r["l_returnflag"]] = cand
    assert {r["l_returnflag"] for r in rows} == set(ref)
    for r in rows:
        c, negk = ref[r["l_returnflag"]]
        assert (r["top_count"], r["top_partkey"]) == (c, -negk)
        assert r["cms_ok"] is True
    assert any(r["top_count"] > 1 for r in rows)


def test_cms_heavy_hitter_tiebreak_and_collision_bound(spark):
    """Crafted frame: a two-way top tie resolves to the SMALLER partkey
    (the deterministic contract both engines state), and the envelope
    verdict stays true on a table dense enough that the sketch may
    collide (estimate >= exact is the CMS guarantee under test)."""
    from apache_jira_scraper_spark.operators.extended import q_cms_heavy_hitter
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="cms_tie_")
    rows = [("A", 7)] * 3 + [("A", 5)] * 3 + [("A", 9)] + [
        ("R", k) for k in range(50)
    ] + [("R", 11)] * 4
    spark.createDataFrame(
        rows, "l_returnflag string, l_partkey long"
    ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
    got = {r["l_returnflag"]: r for r in q_cms_heavy_hitter(spark, d).collect()}
    assert (got["A"]["top_partkey"], got["A"]["top_count"]) == (5, 3)
    assert (got["R"]["top_partkey"], got["R"]["top_count"]) == (11, 5)
    assert got["A"]["cms_ok"] and got["R"]["cms_ok"]
