"""Scalar-function golden tests — the reference's own unit-test literals
(test_scrapper.py:32-80, FIXTURES.md §6) evaluated through our Column fns."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from apache_jira_scraper_spark.functions import (
    backoff_sleep_time,
    clean_text,
    parse_jira_timestamp,
    sanitize_filename,
    user_display_name,
)
from apache_jira_scraper_spark.schemas import USER


def _eval1(spark, col, value, schema):
    df = spark.createDataFrame([(value,)], schema)
    return df.select(col.alias("out")).collect()[0]["out"]


def test_clean_text_whitespace(spark):
    out = _eval1(spark, clean_text("x"), "  hello   world  ", "x: string")
    assert out == "hello world"


def test_clean_text_newlines_tabs(spark):
    out = _eval1(spark, clean_text("x"), "a\n\nb\t c\r\nd", "x: string")
    assert out == "a b c d"


def test_clean_text_none(spark):
    out = _eval1(spark, clean_text("x"), None, "x: string")
    assert out == ""


def test_clean_text_truncation_plus3(spark):
    # test_scrapper.py:43-44: len == max_length + 3 and endswith '...'
    out = _eval1(spark, clean_text("x", max_length=10), "a" * 100, "x: string")
    assert len(out) == 13 and out == "a" * 10 + "..."


def test_clean_text_no_truncation_at_exact_length(spark):
    out = _eval1(spark, clean_text("x", max_length=10), "a" * 10, "x: string")
    assert out == "a" * 10


def test_user_display_name(spark):
    schema = T.StructType([T.StructField("u", USER)])
    cases = [
        ({"displayName": "John Doe", "name": "jdoe"}, "John Doe"),
        ({"displayName": None, "name": "jdoe"}, "jdoe"),
        (None, "Unknown"),
    ]
    for value, expected in cases:
        df = spark.createDataFrame([(value,)], schema)
        out = df.select(user_display_name("u").alias("o")).collect()[0]["o"]
        assert out == expected, (value, out)


def test_backoff_sleep_time(spark):
    df = spark.createDataFrame([(0,), (1,), (2,), (10,)], "n: int")
    rows = df.select("n", backoff_sleep_time("n").alias("s")).orderBy("n").collect()
    assert [r["s"] for r in rows] == [1.0, 2.0, 4.0, 60.0]


def test_sanitize_filename(spark):
    out = _eval1(spark, sanitize_filename("x"), 'a<b>c:d"e/f\\g|h?i*j', "x: string")
    assert out == "a_b_c_d_e_f_g_h_i_j"


def test_parse_jira_timestamp(spark):
    out = _eval1(
        spark, parse_jira_timestamp("x"), "2024-01-01T00:00:00.000+0000", "x: string"
    )
    assert out is not None and out.year == 2024 and out.month == 1


def test_has_required_fields(spark):
    from apache_jira_scraper_spark.functions import has_required_fields

    df = spark.createDataFrame(
        [(("k", "s"),), (("k", None),), ((None, None),)],
        "u: struct<key: string, summary: string>",
    )
    got = [
        r["ok"]
        for r in df.select(
            has_required_fields("u", ["key", "summary"]).alias("ok")
        ).collect()
    ]
    assert got == [True, False, False]
