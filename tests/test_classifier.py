"""Model-based quality classifier (operators/classifier.py):
deterministic driver-side training, zero-shuffle literal-weight scoring,
held-out distillation quality on the real corpus."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _label():
    from apache_jira_scraper_spark.operators.classifier import QC_LABEL_BP
    from apache_jira_scraper_spark.operators.text import quality_score_bp_col

    return quality_score_bp_col() >= QC_LABEL_BP


def test_qc_train_deterministic(spark, sf_dir):
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.classifier import qc_train

    docs = load_table(spark, sf_dir, "documents")
    w1 = qc_train(docs)
    w2 = qc_train(docs)
    assert w1 == w2  # zero init + fixed steps + no RNG = bit-reproducible


def test_qc_score_matches_numpy_reference(spark, sf_dir):
    """Spark's literal-weight narrow map must reproduce the numpy logit on
    the same features — the scoring path and the training path share
    feature_cols verbatim, so this pins the whole w.x plumbing."""
    import numpy as np

    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.classifier import (
        N_FEATURES,
        feature_cols,
        qc_score,
        qc_train,
    )
    from apache_jira_scraper_spark.operators.text import tokens_col

    docs = load_table(spark, sf_dir, "documents")
    w = qc_train(docs)
    feats = docs.select("doc_id", *feature_cols(tokens_col())).orderBy("doc_id")
    rows = feats.collect()
    x = np.asarray(
        [[r[f"f{i}"] for i in range(N_FEATURES)] for r in rows], dtype=np.float64
    )
    ref = x @ np.asarray(w)
    got = {r["doc_id"]: r["logit_en4"] for r in qc_score(docs, w).collect()}
    for r, logit in zip(rows, ref):
        # JVM vs numpy dot products may differ in the last ulp; the 1e-4
        # integer grid can only flip when the true value sits within an
        # ulp of a .5 boundary — allow the 1-grid-step tolerance
        assert abs(got[r["doc_id"]] - round(logit * 10_000)) <= 1


def test_qc_distills_quality_rule_heldout(spark, sf_dir):
    """The point of the operator: trained on the first 256 docs' pseudo-
    labels, the linear scorer must reproduce the quality rule on the
    UNSEEN remainder far better than the majority class (the rule's
    floor/band nonlinearities cap a linear model below 100%, so the pin
    is a margin over majority, not an absolute)."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.classifier import (
        QC_TRAIN_SAMPLE,
        qc_score,
        qc_train,
    )

    docs = load_table(spark, sf_dir, "documents")
    w = qc_train(docs)
    held = docs.filter(F.col("doc_id") >= QC_TRAIN_SAMPLE)
    n_held = held.count()
    if n_held < 100:
        pytest.skip("corpus smaller than the training sample")
    labeled = held.select("doc_id", _label().alias("y"))
    n_pos = labeled.filter("y").count()
    majority = max(n_pos, n_held - n_pos) / n_held
    agree = (
        qc_score(held, w)
        .join(labeled, "doc_id")
        .filter(F.col("pred") == F.col("y"))
        .count()
    )
    acc = agree / n_held
    assert acc >= majority + 0.15, (
        f"held-out accuracy {acc:.3f} does not beat majority {majority:.3f} "
        "by the 0.15 margin"
    )


def test_qc_report_shape_and_plan(spark, sf_dir):
    """Report joins scores to pseudo-labels; scoring itself must stay a
    zero-shuffle narrow map (no Exchange in the qc_score subtree)."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.classifier import (
        qc_score,
        qc_train,
        quality_classifier_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    w = qc_train(docs)
    scored = qc_score(docs, w, ordered=False)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.replace("AQEShuffleRead", ""), plan
    rep = quality_classifier_report(docs)
    assert rep.columns == ["doc_id", "logit_en4", "pred", "agree"]
    assert rep.count() == docs.count()


def test_qc_train_rejects_degenerate_inputs(spark):
    from apache_jira_scraper_spark.operators.classifier import qc_train

    empty = spark.createDataFrame(
        [], "doc_id long, text string, n_chars long"
    )
    with pytest.raises(ValueError, match="empty"):
        qc_train(empty)
    # every doc identical -> the pseudo-label is constant over the sample
    single = spark.createDataFrame(
        [(i, "the and of to", 13) for i in range(8)],
        "doc_id long, text string, n_chars long",
    )
    with pytest.raises(ValueError, match="single-class"):
        qc_train(single)


def test_qc_hand_computed_two_point(spark):
    """Exact GD on a two-doc corpus, mirrored step-for-step in pure
    Python INCLUDING the standardization fold: the Spark-collected
    features feed the same update rule, so the folded weights must agree
    to float tolerance."""
    from apache_jira_scraper_spark.operators.classifier import (
        N_FEATURES,
        QC_LR,
        QC_STEPS,
        feature_cols,
        qc_train,
    )
    from apache_jira_scraper_spark.operators.text import tokens_col

    # labels via explicit column: doc 0 positive, doc 1 negative
    docs = spark.createDataFrame(
        [
            (0, "the and of to a in is for", 150),
            (1, "q w e r t y u i", 10),
        ],
        "doc_id long, text string, n_chars long",
    )
    w = qc_train(docs, label_col=F.col("doc_id") == 0, train_sample=2)
    rows = (
        docs.orderBy("doc_id")
        .select(
            (F.col("doc_id") == 0).cast("double").alias("y"),
            *feature_cols(tokens_col()),
        )
        .collect()
    )
    ys = [r["y"] for r in rows]
    xs = [[r[f"f{i}"] for i in range(N_FEATURES)] for r in rows]
    n = len(ys)
    mu = [sum(x[j] for x in xs) / n for j in range(1, N_FEATURES)]
    sd = [
        math.sqrt(sum((x[j] - mu[j - 1]) ** 2 for x in xs) / n) or 1.0
        for j in range(1, N_FEATURES)
    ]
    zs = [[1.0] + [(x[j] - mu[j - 1]) / sd[j - 1] for j in range(1, N_FEATURES)] for x in xs]
    ref = [0.0] * N_FEATURES
    for _ in range(QC_STEPS):
        grad = [0.0] * N_FEATURES
        for y, z in zip(ys, zs):
            p = 1.0 / (1.0 + math.exp(-sum(wi * zi for wi, zi in zip(ref, z))))
            for j in range(N_FEATURES):
                grad[j] += (p - y) * z[j]
        ref = [wi - QC_LR * g / n for wi, g in zip(ref, grad)]
    folded = [ref[0] - sum(ref[j] * mu[j - 1] / sd[j - 1] for j in range(1, N_FEATURES))] + [
        ref[j] / sd[j - 1] for j in range(1, N_FEATURES)
    ]
    assert all(abs(a - b) < 1e-9 for a, b in zip(w, folded))


def test_qc_score_raises_on_null_text(spark):
    """ADVICE r12: a NULL text must fail loudly at scoring time, not
    emit NULL logit/pred rows."""
    from apache_jira_scraper_spark.operators.classifier import (
        N_FEATURES,
        qc_score,
    )

    docs = spark.createDataFrame(
        [(0, "the and of a text", 120), (1, None, 50)],
        "doc_id long, text string, n_chars int",
    )
    with pytest.raises(Exception, match="NULL text"):
        qc_score(docs, [0.1] * N_FEATURES).collect()


def test_qc_gate_weights_cross_engine(spark, sf_dir):
    """THE gate contract: the numpy-trained folded weights (rounded to
    QC_WEIGHT_DECIMALS) must be BIT-EQUAL to the DuckDB CTE-chain GD's
    qcf_w row — all intra-training float noise funnels into the final
    roundings (see qc_gate_sql docstring)."""
    import duckdb

    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.classifier import (
        qc_gate_sql,
        qc_gate_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    w_spark = qc_gate_weights(docs)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    full = qc_gate_sql()
    # surface the qcf_w CTE instead of the scored output
    probe = full[: full.rindex("\nSELECT ")] + "\nSELECT * FROM qcf_w"
    w_sql = list(con.execute(probe).fetchall()[0])
    assert w_spark == w_sql


def test_qc_report_agrees_with_score_plus_label(spark, sf_dir):
    """qc_report's one-pass (no-join) output equals the qc_score +
    label-join composition it replaced."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.classifier import (
        QC_LABEL_BP,
        qc_report,
        qc_score,
        qc_train,
    )
    from apache_jira_scraper_spark.operators.text import quality_score_bp_col

    docs = load_table(spark, sf_dir, "documents")
    w = qc_train(docs)
    rep = {r["doc_id"]: r for r in qc_report(docs, w).collect()}
    scored = {r["doc_id"]: r for r in qc_score(docs, w).collect()}
    labels = {
        r["doc_id"]: r["y"]
        for r in docs.select(
            "doc_id", (quality_score_bp_col() >= QC_LABEL_BP).alias("y")
        ).collect()
    }
    assert set(rep) == set(scored)
    for did, r in rep.items():
        assert r["logit_en4"] == scored[did]["logit_en4"]
        assert r["pred"] == scored[did]["pred"]
        assert r["agree"] == (scored[did]["pred"] == labels[did])
