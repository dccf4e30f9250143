"""Int8 embedding quantization (operators/quantize.py): exact parity with
the pure-Python model, cosine error bound, and recall of the quantized
brute-force top-k against the exact float top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_jira_scraper_spark.operators.quantize import (
    Q_LEVELS,
    dequantize,
    quantize_embeddings,
    quantize_model,
    quantized_cosine,
    quantized_topk,
)
from apache_jira_scraper_spark.operators.similarity import _emb, q_cosine_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return _emb(spark, sf_dir).persist()


def test_codes_match_python_model(emb):
    """The floor(+0.5) definition is engine-exact: Spark's column algebra
    and the Python model must agree code-for-code on real embeddings."""
    rows = (
        quantize_embeddings(emb)
        .join(emb.select("vec_id", "e"), "vec_id")
        .orderBy("vec_id")
        .limit(50)
        .collect()
    )
    assert rows
    for r in rows:
        codes, scale = quantize_model(list(r["e"]))
        assert list(r["qv"]) == codes, f"vec {r['vec_id']}"
        assert r["scale"] == pytest.approx(scale, abs=0.0)


def test_codes_in_int8_range_and_extreme_hit(emb):
    stats = (
        quantize_embeddings(emb)
        .select(
            F.array_min("qv").alias("lo"),
            F.array_max("qv").alias("hi"),
            F.array_max(F.transform("qv", lambda x: F.abs(x))).alias("amax"),
        )
        .agg(
            F.min("lo").alias("lo"),
            F.max("hi").alias("hi"),
            F.min("amax").alias("worst_amax"),
        )
        .first()
    )
    assert -Q_LEVELS <= stats["lo"] and stats["hi"] <= Q_LEVELS
    # the max-abs coordinate of every vector quantizes to exactly +-127
    assert stats["worst_amax"] == Q_LEVELS


def test_zero_vector_guard(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id bigint, e array<double>",
    ).withColumn("label", F.lit(0))
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert list(out[0]["qv"]) == [0, 0, 0] and out[0]["scale"] == 0.0
    assert list(out[1]["qv"]) == [64, -127, 32]


def test_dequantize_error_bound(emb):
    """|x - q*scale| <= scale/2 per coordinate, by construction."""
    qt = quantize_embeddings(emb).join(emb.select("vec_id", "e"), "vec_id")
    worst = (
        qt.select(
            F.array_max(
                F.zip_with(
                    dequantize(F.col("qv"), F.col("scale")),
                    F.col("e"),
                    lambda a, b: F.abs(a - b) / F.col("scale"),
                )
            ).alias("rel")
        )
        .agg(F.max("rel").alias("m"))
        .first()["m"]
    )
    assert worst <= 0.5 + 1e-9


def test_quantized_cosine_close_to_exact(emb):
    """Pairwise cosine from int8 codes stays within 0.02 of float cosine
    (the bound the module docstring advertises)."""
    qt = quantize_embeddings(emb, keep=("vec_id",))
    j = (
        qt.alias("a")
        .join(qt.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(F.col("a.vec_id") < 20)
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            quantized_cosine(F.col("a.qv"), F.col("b.qv")).alias("qcos"),
        )
    )
    e = emb.select("vec_id", "e", "nrm")
    exact = (
        e.alias("a")
        .join(e.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(F.col("a.vec_id") < 20)
        .select(
            F.col("a.vec_id").alias("v1"),
            F.col("b.vec_id").alias("v2"),
            (
                F.aggregate(
                    F.zip_with(F.col("a.e"), F.col("b.e"), lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cos"),
        )
    )
    worst = (
        j.join(exact, ["v1", "v2"])
        .agg(F.max(F.abs(F.col("qcos") - F.col("cos"))).alias("m"))
        .first()["m"]
    )
    assert worst < 0.02, worst


def test_quantized_topk_recall(emb, sf_dir):
    """Two-stage retrieval contract: the int8 candidate pass recovers most
    of the exact float top-k (recall@5 >= 0.8 on the test embeddings)."""
    exact = q_cosine_topk(emb.sparkSession, sf_dir)
    got = quantized_topk(emb, n_queries=10, top_k=5)
    hits = exact.join(got.select("qid", "nid"), ["qid", "nid"], "left_semi").count()
    total = exact.count()
    assert total > 0
    assert hits / total >= 0.8, f"recall {hits}/{total}"


def test_two_stage_equals_exact(emb, sf_dir):
    """With a 4x shortlist, the exact re-rank recovers the float top-k
    order: (qid, rank, nid) must match the exact operator row-for-row
    (cosine re-scored at full precision, so values match too)."""
    from apache_jira_scraper_spark.operators.quantize import two_stage_topk

    exact = {
        (r["qid"], r["rank"]): (r["nid"], r["cosine"])
        for r in q_cosine_topk(emb.sparkSession, sf_dir).collect()
    }
    got = {
        (r["qid"], r["rank"]): (r["nid"], r["cosine"])
        for r in two_stage_topk(emb, n_queries=10, top_k=5, shortlist_k=20).collect()
    }
    assert got.keys() == exact.keys()
    mismatches = {k for k in exact if got[k] != exact[k]}
    # a true neighbor is lost only if quantization pushes it below the
    # shortlist — allow at most 1 of 50 ranks to differ on the test data
    assert len(mismatches) <= 1, mismatches


def test_quantize_plan_is_narrow(emb):
    """Quantization itself must be a zero-shuffle narrow map."""
    plan = quantize_embeddings(emb)._jdf.queryExecution().optimizedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_ivf_quantized_topk_recall(emb, sf_dir):
    """IVF+int8 composed: both approximations stacked must still recover
    most of the exact float top-k (recall@5 >= 0.6 on the test
    embeddings — looser than either alone, as expected)."""
    from apache_jira_scraper_spark.operators.ivf import ivf_build
    from apache_jira_scraper_spark.operators.quantize import ivf_quantized_topk

    cent = ivf_build(emb, k=8, n_iter=3)
    got = ivf_quantized_topk(emb, cent, n_queries=10, top_k=5, nprobe=2)
    exact = q_cosine_topk(emb.sparkSession, sf_dir)
    hits = exact.join(got.select("qid", "nid"), ["qid", "nid"], "left_semi").count()
    total = exact.count()
    assert total > 0
    assert hits / total >= 0.6, f"recall {hits}/{total}"
    # all 10 queries produced a ranking
    assert got.select("qid").distinct().count() == 10
