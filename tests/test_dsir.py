"""DSIR importance resampling (operators/dsir.py): cross-engine parity
with the DuckDB twin, complement-model semantics, custom targets, and
the top-k resample plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_dsir_matches_duckdb_twin(spark, sf_dir):
    import duckdb

    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.dsir import dsir_logratio, dsir_sql

    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: (r["n_feats"], r["logratio_en4"], r["sampled"])
        for r in dsir_logratio(docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    ref = {r[0]: (r[1], r[2], r[3]) for r in con.execute(dsir_sql()).fetchall()}
    assert got == ref
    # the selection is MEANINGFUL: neither empty nor everything
    share = sum(1 for v in got.values() if v[2]) / len(got)
    assert 0.05 < share < 0.95, share


def test_dsir_separates_an_injected_domain(spark):
    """A target defined by doc_id membership over two clearly distinct
    sub-languages must score the target-like docs positive and the
    background-like docs negative (the paper's sanity property)."""
    from apache_jira_scraper_spark.operators.dsir import dsir_logratio

    rows = []
    for i in range(30):
        rows.append((i, "alpha beta gamma delta alpha beta", 40))
    for i in range(30, 60):
        rows.append((i, "zeta eta theta iota zeta eta", 40))
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars int")
    out = {
        r["doc_id"]: r
        for r in dsir_logratio(docs, target=F.col("doc_id") < 30).collect()
    }
    assert all(out[i]["logratio_en4"] > 0 for i in range(30))
    assert all(out[i]["logratio_en4"] < 0 for i in range(30, 60))
    assert all(out[i]["sampled"] for i in range(30))
    # feature count: n unigrams + (n-1) bigrams
    assert out[0]["n_feats"] == 6 + 5


def test_dsir_resample_topk_plan(spark, sf_dir):
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.dsir import dsir_resample

    docs = load_table(spark, sf_dir, "documents")
    top = dsir_resample(docs, 25)
    rows = top.collect()
    assert len(rows) == 25
    vals = [r["logratio_en4"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_dsir_empty_and_single_token_docs(spark):
    from apache_jira_scraper_spark.operators.dsir import dsir_logratio

    docs = spark.createDataFrame(
        [(0, "solo", 4), (1, "", 0), (2, "a b", 3), (3, "a b", 3)],
        "doc_id long, text string, n_chars int",
    )
    out = {r["doc_id"]: r for r in dsir_logratio(docs, target=F.col("doc_id") >= 2).collect()}
    assert out[0]["n_feats"] == 1          # one unigram, no bigram
    assert out[1]["n_feats"] == 1          # split('') == [''] - one feature
    assert out[2]["n_feats"] == 3          # a, b, 'a b'
    assert set(out) == {0, 1, 2, 3}
