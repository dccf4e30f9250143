"""Prove the scale patterns do what SURVEY §8 claims, at plan level.

- Bucketed join: zero Exchange operators (co-located scan → join).
- Salted aggregation: identical results to the direct aggregation, with the
  hot key's phase-1 load spread across salt partitions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_jira_scraper_spark.io import load_table
from apache_jira_scraper_spark.operators.scale_patterns import (
    bucketed_join,
    salted_agg,
    write_bucketed,
)
from apache_jira_scraper_spark.plans.inspect import operator_counts


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=8, path=str(tmp_path / "bo"))
    write_bucketed(li, "b_lineitem", "o_orderkey", buckets=8, path=str(tmp_path / "bl"))

    joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
    ops = operator_counts(joined)
    assert ops.get("Exchange", 0) == 0, f"bucketed join must not shuffle: {ops}"
    # and it is still a real join producing every lineitem row
    assert joined.count() == li.count()

    # the same join over plain parquet shuffles (or broadcasts) — the
    # bucketing is what removed the Exchange, not the data size
    plain = orders.join(li, "o_orderkey")
    plain_ops = operator_counts(plain)
    assert plain_ops.get("Exchange", 0) > 0 or "BroadcastHashJoin" in plain_ops

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_agg_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r["l_returnflag"]: (round(float(r["total"]), 4), r["n"], round(r["mean"], 6))
        for r in salted_agg(li, "l_returnflag", "l_quantity", salts=8).collect()
    }
    want = {
        r["l_returnflag"]: (round(float(r["total"]), 4), r["n"], round(r["mean"], 6))
        for r in (
            li.groupBy("l_returnflag")
            .agg(
                F.sum("l_quantity").alias("total"),
                F.count(F.lit(1)).alias("n"),
                (F.sum("l_quantity") / F.count(F.lit(1))).alias("mean"),
            )
            .collect()
        )
    }
    assert got == want


def test_salted_agg_mean_skips_nulls_like_avg(spark):
    """r04 review fix: the reconstructed mean divides by the NON-NULL
    value count (avg semantics) — dividing by the row count understated
    the mean of any measure column with NULLs."""
    rows = [("k", 10.0), ("k", None), ("k", 20.0), ("j", None), ("j", 4.0)]
    df = spark.createDataFrame(rows, "key string, v double")
    got = {
        r["key"]: (r["total"], r["n"], r["n_values"], r["mean"])
        for r in salted_agg(df, "key", "v", salts=4).collect()
    }
    assert got == {"k": (30.0, 3, 2, 15.0), "j": (4.0, 2, 1, 4.0)}


def test_skew_report_values(spark):
    """Constructed skew: one hot key with 900 rows over 9 cold keys of 10.
    The report must surface the hot key first with exact count, exact ppm
    share, and the hot/median skew factor."""
    from apache_jira_scraper_spark.operators.scale_patterns import skew_report

    rows = [("hot",)] * 900 + [(f"cold{i}",) for i in range(9) for _ in range(10)]
    df = spark.createDataFrame(rows, "k string")
    rep = skew_report(df, "k", top_n=3).collect()
    assert [r["key_value"] for r in rep][0] == "hot"
    top = rep[0]
    assert top["cnt"] == 900
    assert top["share_ppm"] == 900 * 1_000_000 // 990
    # median per-key count is 10 (9 cold keys of 10 vs 1 hot of 900)
    assert top["p50"] == 10
    assert top["max_over_p50"] == pytest.approx(90.0)
    # cold keys tie at 10 and break deterministically by key name
    assert [r["key_value"] for r in rep[1:]] == ["cold0", "cold1"]


def test_skew_report_topn_plan(spark, sf_dir):
    """The hot-key ranking must plan as TakeOrderedAndProject (driver-bounded
    top-N), never a global sort of the per-key count table."""
    from apache_jira_scraper_spark.operators.scale_patterns import skew_report

    li = load_table(spark, sf_dir, "lineitem")
    rep = skew_report(li, "l_orderkey", top_n=5)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert len(rep.collect()) == 5


def test_time_partitioned_layout_prunes(spark, sf_dir, tmp_path):
    """The date filter must land as a partition filter (pruned at planning
    time, not scanned-and-discarded), and the pruned read must equal the
    unpartitioned filter row-for-row."""
    from apache_jira_scraper_spark.operators.scale_patterns import (
        read_time_range,
        write_time_partitioned,
    )

    events = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_day")
    write_time_partitioned(events, path)

    # pick a 2-day range that exists in the data
    days = sorted(
        r["d"] for r in events.select(F.to_date("ts").alias("d")).distinct().collect()
    )
    start, end = str(days[1]), str(days[3])
    sliced = read_time_range(spark, path, start, end)

    plan = sliced._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_date" in plan.split("PartitionFilters", 1)[1][:200]

    want = events.filter(
        (F.to_date("ts") >= F.lit(start)) & (F.to_date("ts") < F.lit(end))
    ).count()
    assert sliced.count() == want and want > 0

    # pruning is physical: only the two matching date directories are read
    n_parts = sliced.select("event_date").distinct().count()
    assert n_parts == 2


def test_salted_join_matches_plain(spark, sf_dir):
    """Row-for-row (including duplicates) equal to the plain equi-join."""
    from apache_jira_scraper_spark.operators.scale_patterns import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    got = (
        salted_join(li, orders, "o_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    want = (
        li.join(orders, "o_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    g = {r["o_orderkey"]: (r["n"], float(r["q"])) for r in got.collect()}
    w = {r["o_orderkey"]: (r["n"], float(r["q"])) for r in want.collect()}
    assert g == w and g


def _dup_heavy_corpus(spark, n_base: int, dup_rate: float, seed: int = 7):
    """Synthetic dup-heavy crawl: n_base originals (~40 tokens from a small
    pool) plus round(n_base * dup_rate) near-dups, each a copy of an
    original with 2 token substitutions (shingle jaccard ~0.73 — well above the 0.5
    verify threshold, LSH collision prob ~0.95 at 4 bands x 2 rows).
    Deterministic via an explicit seed."""
    import random

    rng = random.Random(seed)
    pool = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(n_base):
        toks = [rng.choice(pool) for _ in range(40)]
        rows.append((i, " ".join(toks)))
    n_dups = round(n_base * dup_rate)
    for j in range(n_dups):
        src = rng.randrange(n_base)
        toks = rows[src][1].split()
        for _ in range(2):
            toks[rng.randrange(len(toks))] = rng.choice(pool)
        rows.append((n_base + j, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string"), n_dups


def _minhash_pipeline(docs):
    """minhash -> banded candidates -> exact-jaccard verify -> components,
    composed from the library pieces exactly as the gate pipeline does."""
    from pyspark.sql import functions as F

    from apache_jira_scraper_spark.operators.dedup import (
        _band_rows,
        _verify_jaccard,
        build_dedup_index,
        connected_components,
    )

    sh, sig = build_dedup_index(docs)
    bandrows = _band_rows(sig)
    cand = (
        bandrows.select(F.col("doc_id").alias("d1"), "bidx", "bk")
        .join(bandrows.select(F.col("doc_id").alias("d2"), "bidx", "bk"), ["bidx", "bk"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    pairs = _verify_jaccard(sh, cand)
    return cand, pairs, lambda: connected_components(pairs.select("d1", "d2"))


def test_dedup_family_dup_heavy_end_to_end(spark):
    """VERDICT r03 item 5: the workload that breaks candidate-set
    broadcasts — 40% of documents are near-dups, so the candidate side is
    corpus-cardinality, NOT 'tiny'. Asserts (a) the end-to-end
    minhash->verify->clusters pipeline finds (nearly) every planted dup,
    (b) with the auto-broadcast threshold disabled NO BroadcastExchange
    survives anywhere in the verify plan (a forced hint on the candidate
    side would OOM at 100 TB on exactly this workload), and (c) candidate
    volume grows ~linearly with corpus size (the banded equi-join
    property; an all-pairs path would grow quadratically)."""
    from apache_jira_scraper_spark.plans.inspect import physical_plan

    docs1, n_dups1 = _dup_heavy_corpus(spark, n_base=300, dup_rate=0.4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cand1, pairs1, components1 = _minhash_pipeline(docs1)
        plan = physical_plan(pairs1, "simple")
        assert "BroadcastExchange" not in plan, plan[:1500]
        got_pairs = {(r["d1"], r["d2"]) for r in pairs1.collect()}
        # recall on planted dups: each dup (id >= n_base) must pair with
        # its source via 8-perm/4-band LSH at jaccard ~0.73 (collision
        # prob ~1 - (1 - 0.73^2)^4 ~ 0.95) and survive the exact verify
        dup_ids = {d2 for (d1, d2) in got_pairs if d2 >= 300} | {
            d1 for (d1, d2) in got_pairs if d1 >= 300
        }
        assert len(dup_ids) >= 0.85 * n_dups1, (len(dup_ids), n_dups1)
        # clusters: every component's nodes are genuinely linked
        labels = {r["doc_id"]: r["cluster_id"] for r in components1().collect()}
        assert set(labels) == {d for p in got_pairs for d in p}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # linear-growth envelope: 3x the corpus must produce <= ~4x the banded
    # candidates (count is deterministic - immune to host timing noise);
    # an all-pairs/cartesian path would grow ~9x
    docs3, _ = _dup_heavy_corpus(spark, n_base=900, dup_rate=0.4)
    cand3, _, _ = _minhash_pipeline(docs3)
    n1, n3 = cand1.count(), cand3.count()
    assert n1 > 0
    assert n3 <= 4.5 * n1, (n1, n3)
