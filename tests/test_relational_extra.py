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


def test_funnel_matches_oracle(spark, sf_dir):
    """The single-shuffle fold formulation must equal the k-sequential-join
    SQL form on real events — the two formulations check each other."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.events import funnel, funnel_sql

    assert_matches_oracle(
        funnel(load_table(spark, sf_dir, "events")),
        funnel_sql(),
        sf_dir,
        name="funnel",
    )


def test_funnel_semantics(spark):
    """Constructed users: completes-in-order counts; out-of-order does not;
    an equal-timestamp next step does NOT advance (strictly-after rule);
    a later step-1 event never re-opens the funnel."""
    import datetime as dt

    from apache_jira_scraper_spark.operators.events import funnel

    t0 = dt.datetime(2025, 1, 1)
    s = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    rows = [
        # u1: full in-order funnel
        (1, s(0), "signup"), (1, s(1), "view"), (1, s(2), "click"), (1, s(3), "purchase"),
        # u2: view BEFORE signup -> stalls at signup
        (2, s(0), "view"), (2, s(1), "signup"),
        # u3: click at the SAME ts as its view -> strictly-after excludes it
        (3, s(0), "signup"), (3, s(1), "view"), (3, s(1), "click"),
        # u4: signup only
        (4, s(0), "signup"),
    ]
    df = spark.createDataFrame(
        [(u, ts, et) for u, ts, et in rows],
        "user_id bigint, ts timestamp, event_type string",
    )
    got = {r["step"]: (r["n_users"], r["conversion_ppm"]) for r in funnel(df).collect()}
    assert got["signup"] == (4, 1_000_000)
    assert got["view"] == (2, 500_000)      # u1, u3
    assert got["click"] == (1, 250_000)     # u1 only (u3's tie excluded)
    assert got["purchase"] == (1, 250_000)


def test_retention_cohorts_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.events import (
        RETENTION_SQL,
        retention_cohorts,
    )

    assert_matches_oracle(
        retention_cohorts(load_table(spark, sf_dir, "events")),
        RETENTION_SQL,
        sf_dir,
        name="retention_cohorts",
    )


def test_retention_cohorts_semantics(spark):
    """Two users signing up in week 0; one returns in week 1 -> 50% ppm;
    activity before the signup week is excluded; non-signup users too."""
    import datetime as dt

    from apache_jira_scraper_spark.operators.events import retention_cohorts

    mon = dt.datetime(2025, 1, 6)  # a Monday
    d = lambda days: mon + dt.timedelta(days=days)  # noqa: E731
    rows = [
        (1, d(0), "signup"), (1, d(8), "view"),      # active week 0 and 1
        (2, d(1), "signup"),                          # active week 0 only
        (3, d(-3), "view"),                           # never signs up: excluded
        (2, d(-7), "view"),                           # before signup week: excluded
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")
    got = {
        (r["cohort_week"].isoformat(), r["age_weeks"]): (
            r["cohort_size"], r["n_active"], r["retention_ppm"]
        )
        for r in retention_cohorts(df).collect()
    }
    assert got == {
        ("2025-01-06", 0): (2, 2, 1_000_000),
        ("2025-01-06", 1): (2, 1, 500_000),
    }


def test_gap_fill_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.events import gap_fill_hourly, gap_fill_sql

    assert_matches_oracle(
        gap_fill_hourly(load_table(spark, sf_dir, "events")),
        gap_fill_sql(),
        sf_dir,
        name="gap_fill_hourly",
    )


def test_gap_fill_semantics(spark):
    """Hour gaps appear with n_events=0, filled=true, and carry the last
    observed cents forward; the grid spans first..last hour inclusive."""
    import datetime as dt

    from apache_jira_scraper_spark.operators.events import gap_fill_hourly

    t0 = dt.datetime(2025, 1, 1, 10, 15)
    rows = [
        (1, t0, "view", 2.0),
        (1, t0 + dt.timedelta(hours=3), "view", 3.5),  # hours 11,12 are gaps
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string, value double")
    out = gap_fill_hourly(df).collect()
    assert len(out) == 4  # 10:00..13:00 inclusive
    assert [r["n_events"] for r in out] == [1, 0, 0, 1]
    assert [r["filled"] for r in out] == [False, True, True, False]
    assert [r["sum_value_cents"] for r in out] == [200, 200, 200, 350]


def test_interval_overlap_join_matches_oracle_and_bnlj(spark, sf_dir):
    """The bucketed equi-join form equals (1) DuckDB's native inequality
    join and (2) each pair exactly once even when intervals span many
    shared buckets — using sessionize's sessions self-joined."""
    import duckdb

    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.relational import interval_overlap_join
    from pyspark.sql import functions as F

    # sessions as intervals (unix secs), users < 40 for a compact pair set
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    iv = (
        events.groupBy("user_id")
        .agg(
            F.unix_timestamp(F.min("ts")).alias("start"),
            F.unix_timestamp(F.max("ts")).alias("end"),
        )
        .select(F.col("user_id").alias("id"), "start", "end")
    )
    raw = [
        r
        for r in interval_overlap_join(iv, iv, bucket_width=3600).collect()
        if r["a_id"] < r["b_id"]
    ]
    got = {
        (r["a_id"], r["b_id"]): (r["overlap_start"], r["overlap_end"]) for r in raw
    }
    # exactly-once emission pinned on the REAL data too (a dict would
    # silently collapse duplicate pair rows)
    assert len(raw) == len(got)
    rows = iv.collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE iv (id BIGINT, s BIGINT, e BIGINT)")
    con.executemany("INSERT INTO iv VALUES (?, ?, ?)", [(r["id"], r["start"], r["end"]) for r in rows])
    want = {
        (a, b): (os_, oe)
        for a, b, os_, oe in con.execute(
            """SELECT x.id, y.id, GREATEST(x.s, y.s), LEAST(x.e, y.e)
               FROM iv x JOIN iv y ON x.s <= y.e AND y.s <= x.e AND x.id < y.id"""
        ).fetchall()
    }
    assert got == want and got


def test_interval_overlap_join_emits_each_pair_once(spark):
    """Long intervals sharing MANY buckets still emit exactly one row (the
    max-start-bucket trick replaces a distinct shuffle)."""
    from apache_jira_scraper_spark.operators.relational import interval_overlap_join

    a = spark.createDataFrame([(1, 0, 100_000)], "id bigint, start bigint, end bigint")
    b = spark.createDataFrame(
        [(2, 50, 99_000), (3, 200_000, 300_000)], "id bigint, start bigint, end bigint"
    )
    out = interval_overlap_join(a, b, bucket_width=100).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a_id"], r["b_id"], r["overlap_start"], r["overlap_end"]) == (1, 2, 50, 99_000)


def test_fuzzy_string_join_matches_bruteforce(spark):
    """The tiered-blocking form equals the brute-force O(n²) levenshtein
    join EXACTLY — including cross-tier pairs (short vs char-tier vs
    q-gram-tier lengths) that a hard tier boundary would miss."""
    from apache_jira_scraper_spark.operators.relational import fuzzy_string_join
    from pyspark.sql import functions as F

    names = [
        (1, "jonathan smith"), (2, "jonathon smith"),   # q-gram tier pair
        (3, "smith"), (4, "smyth"),                     # char tier pair
        (5, "smithx"), (6, "jonathan smithx"),          # unrelated lengths
        (7, "ab"), (8, "ba"),                           # residual tier pair
        (9, "ab"), (10, "abcd"),                        # residual x char tier
        (11, "hamburg"), (12, "hamburgo"),              # char/q-gram straddle
        (13, "zzzzzzzzzzzz"),                           # loner
    ]
    df = spark.createDataFrame(names, "id bigint, s string")
    got = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in fuzzy_string_join(df, df, max_dist=2).collect()
        if r["a_id"] < r["b_id"]
    }
    brute = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in (
            df.alias("a")
            .join(df.alias("b"), F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("a_id"),
                F.col("b.id").alias("b_id"),
                F.levenshtein("a.s", "b.s").alias("dist"),
            )
            .filter(F.col("dist") <= 2)
        ).collect()
    }
    assert got == brute
    # the canonical pairs are present
    assert got[(1, 2)] == 1 and got[(3, 4)] == 1 and got[(7, 8)] == 2
    assert (11, 12) in got and (9, 10) in got


def test_fuzzy_string_join_two_tables_overlapping_ids(spark):
    """Two DISTINCT tables whose id spaces overlap (both auto-increment
    from 1): a real cross-table match with a_id == b_id must survive — the
    reflexive-pair filter applies only to the self-join (a is b)."""
    from apache_jira_scraper_spark.operators.relational import fuzzy_string_join

    a = spark.createDataFrame([(1, "jonathan"), (2, "maria")], "id bigint, s string")
    b = spark.createDataFrame([(1, "jonathon"), (2, "xavier")], "id bigint, s string")
    got = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in fuzzy_string_join(a, b, max_dist=2).collect()
    }
    # (1, 1) is a genuine match across the two tables, not a self-pair
    assert got == {(1, 1): 1}


def test_fuzzy_string_join_salted_equals_plain(spark):
    """salts=R (hot-block parallelization: index side salted by
    hash(a_id), probe side replicated R ways) returns exactly the plain
    join's pairs — the salt only re-keys WHERE a pair meets, never whether
    it meets."""
    from apache_jira_scraper_spark.operators.relational import fuzzy_string_join

    rows = [(i, f"Customer#{i:05d}") for i in range(80)] + [
        (100 + i, s) for i, s in enumerate(["smith", "smyth", "ab", "ba", "hamburg"])
    ]
    df = spark.createDataFrame(rows, "id bigint, s string")
    plain = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in fuzzy_string_join(df, df, max_dist=1).collect()
    }
    salted = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in fuzzy_string_join(df, df, max_dist=1, salts=7).collect()
    }
    assert plain == salted
    assert plain  # the common-prefix corpus must actually produce pairs


def test_fuzzy_string_join_canonical_equals_filtered_symmetric(spark):
    """canonical=True (r14: candidate-stage a_id < b_id filter, halving the
    hot-block verify volume) returns exactly the symmetric self-join's
    pairs filtered to a_id < b_id — PassJoin's segment theorem holds with
    either member as the segment side, so no unordered pair is lost."""
    from apache_jira_scraper_spark.operators.relational import fuzzy_string_join

    import pytest

    rows = [(i, f"Customer#{i:05d}") for i in range(80)] + [
        (100 + i, s) for i, s in enumerate(["smith", "smyth", "ab", "ba", "hamburg"])
    ]
    df = spark.createDataFrame(rows, "id bigint, s string")
    sym = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in fuzzy_string_join(df, df, max_dist=1).collect()
        if r["a_id"] < r["b_id"]
    }
    canon = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in fuzzy_string_join(df, df, max_dist=1, canonical=True).collect()
    }
    assert canon == sym
    assert canon  # non-empty: the equality must not pass vacuously
    assert all(a < b for a, b, _ in canon)
    # canonical is a self-join-only contract
    other = spark.createDataFrame([(1, "smith")], "id bigint, s string")
    with pytest.raises(ValueError, match="self-join"):
        fuzzy_string_join(df, other, canonical=True)


def test_fuzzy_string_join_candidate_fanout_bound(spark):
    """The PassJoin probe side's fan-out is bounded per string by
    (2d+1)^2 * (d+1) rows, independent of corpus size and string length —
    the property that makes the blocking selective at every length (the
    old single-character tier fanned out with string length AND paired
    every string sharing one character)."""
    from apache_jira_scraper_spark.operators.relational import (
        _passjoin_segments,
        _passjoin_substrings,
    )

    d = 2
    strings = [
        (1, ""), (2, "a"), (3, "ab"), (4, "abc"), (5, "abcdef"),
        (6, "abcdefghijkl"), (7, "x" * 40), (8, "the quick brown fox"),
    ]
    df = spark.createDataFrame(strings, "id bigint, s string")
    n = len(strings)
    seg_rows = _passjoin_segments(df, d).count()
    sub_rows = _passjoin_substrings(df, d).count()
    assert seg_rows == n * (d + 1)  # exactly d+1 segments per string
    assert sub_rows <= n * (2 * d + 1) ** 2 * (d + 1)


def test_pct_ppm_arithmetic_survives_frontier_revenue(spark):
    """The ratio-to-total numerator at SF >= 1: per-flag revenue of ~1e14
    units makes rev_u * 1e8 = 1e22, far past int64 (the pre-r04 BIGINT
    form crashed under ANSI Spark and errored in DuckDB). The DECIMAL(38,0)
    / HUGEINT forms must agree exactly at that magnitude."""
    import duckdb
    from pyspark.sql import functions as F

    rows = [("A", 10**14 * 10**4), ("N", 3 * 10**14 * 10**4), ("R", 10**13 * 10**4)]
    df = spark.createDataFrame(rows, "l_returnflag string, revenue_e4 long")
    rev_u = F.expr("revenue_e4 DIV 10000")
    from pyspark.sql import Window

    total_u = F.sum(rev_u).over(Window.partitionBy())
    got = {
        r["l_returnflag"]: r["pct_ppm"]
        for r in df.select(
            "l_returnflag",
            (rev_u.cast("decimal(38,0)") * F.lit(100000000)).alias("_num"),
            total_u.cast("decimal(38,0)").alias("_tot"),
        )
        .selectExpr("l_returnflag", "CAST(_num DIV _tot AS BIGINT) AS pct_ppm")
        .collect()
    }
    want = {
        r[0]: r[1]
        for r in duckdb.sql(
            """
            SELECT l_returnflag,
                   CAST(CAST(revenue_e4 // 10000 AS HUGEINT) * 100000000
                        // (SUM(revenue_e4 // 10000) OVER ()) AS BIGINT) AS pct_ppm
            FROM (VALUES ('A', CAST(1000000000000000000 AS BIGINT)),
                         ('N', CAST(3000000000000000000 AS BIGINT)),
                         ('R', CAST(100000000000000000 AS BIGINT)))
                 t(l_returnflag, revenue_e4)
            """
        ).fetchall()
    }
    assert got == want
    assert got["N"] == 73_170_731  # 3/4.1 at the 1e8 scale, floor
