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


# ---------------------------------------------------------------------------
# Product quantization (r10)
# ---------------------------------------------------------------------------


def _pq_py_adist(vec, code, books):
    """Independent ADC reference: sum of per-subspace query-to-centroid
    squared distances for an encoded neighbor."""
    m = len(books)
    dsub = len(books[0][0])
    return sum(
        sum(
            (x - y) * (x - y)
            for x, y in zip(vec[j * dsub : (j + 1) * dsub], books[j][code[j]])
        )
        for j in range(m)
    )


def test_pq_encode_matches_python_model_both_paths(emb):
    """Both assignment paths — the literal-argmin narrow map (small
    m*ksub) and the broadcast-join form (production-sized model) — must
    match the pure-Python argmin exactly, including the lowest-cid
    tie-break."""
    from apache_jira_scraper_spark.operators.quantize import (
        _PQ_LITERAL_MK_MAX,
        pq_encode,
        pq_model,
        pq_train,
    )

    rows = {r["vec_id"]: list(r["e"]) for r in emb.orderBy("vec_id").limit(30).collect()}
    for m, ksub in ((4, 8), (16, 32)):  # 32 <= cap -> literal; 512 -> join
        books = pq_train(emb, m=m, ksub=ksub)
        assert (m * ksub <= _PQ_LITERAL_MK_MAX) == (m * ksub == 32)
        got = {
            r["vec_id"]: list(r["pq_code"])
            for r in pq_encode(emb, books).filter(F.col("vec_id") < 30).collect()
        }
        for vid, vec in rows.items():
            assert got[vid] == pq_model(vec, books)[0], (m, ksub, vid)


def test_pq_assignment_paths_agree(emb):
    """The join path and the literal expression are the SAME function:
    run the literal kernel directly on the production-sized model (past
    the cap, so pq_encode would not choose it) and compare codes."""
    from apache_jira_scraper_spark.operators.quantize import (
        pq_code_col,
        pq_encode,
        pq_train,
    )

    books = pq_train(emb)  # m=16, ksub=32 -> join path in pq_encode
    join_codes = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(emb, books).filter(F.col("vec_id") < 40).collect()
    }
    lit_codes = {
        r["vec_id"]: list(r["pq_code"])
        for r in emb.filter(F.col("vec_id") < 40)
        .select("vec_id", pq_code_col("e", books).alias("pq_code"))
        .collect()
    }
    assert join_codes == lit_codes


def test_pq_adc_matches_python_brute_force(emb):
    """Full ADC ranking parity: top-5 per query by (adist, nid) computed
    independently in Python over every encoded vector."""
    from apache_jira_scraper_spark.operators.quantize import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    books = pq_train(emb)
    vecs = {r["vec_id"]: list(r["e"]) for r in emb.collect()}
    codes = {r["vec_id"]: list(r["pq_code"]) for r in pq_encode(emb, books).collect()}
    got = [
        (r["qid"], r["rank"], r["nid"])
        for r in pq_adc_topk(emb, books, n_queries=5, top_k=5).collect()
    ]
    want = []
    for qid in range(5):
        scored = sorted(
            (round(_pq_py_adist(vecs[qid], code, books), 6), nid)
            for nid, code in codes.items()
            if nid != qid
        )
        want += [(qid, rank + 1, nid) for rank, (_, nid) in enumerate(scored[:5])]
    assert got == want


def test_pq_gate_envelope_premise(emb, sf_dir):
    """The two_stage gate's pq_recall_ok envelope must hold with margin on
    the fixtures — and be NON-VACUOUS: the ADC shortlist must genuinely
    reorder vs exact (if PQ were secretly exact the envelope certifies
    nothing)."""
    from apache_jira_scraper_spark.operators.quantize import (
        PQ_GATE_SHORTLIST_K,
        PQ_MIN_HITS,
        pq_adc_topk,
        pq_train,
    )

    books = pq_train(emb)
    short = pq_adc_topk(emb, books, n_queries=10, top_k=PQ_GATE_SHORTLIST_K)
    exact = q_cosine_topk(emb.sparkSession, sf_dir)
    per_q = {
        r["qid"]: r["hits"]
        for r in exact.join(
            short.select("qid", "nid"), ["qid", "nid"], "left_semi"
        )
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("hits"))
        .collect()
    }
    nq = exact.select("qid").distinct().count()
    assert nq > 0 and len(per_q) == nq
    assert min(per_q.values()) >= PQ_MIN_HITS, per_q
    # non-vacuous: the quantized TOP-5 ordering differs somewhere from exact
    pq5 = {(r["qid"], r["rank"], r["nid"]) for r in short.filter(F.col("rank") <= 5).collect()}
    ex5 = {(r["qid"], r["rank"], r["nid"]) for r in exact.collect()}
    assert pq5 != ex5


def test_pq_train_input_guards(spark):
    from apache_jira_scraper_spark.operators.quantize import pq_train

    empty = spark.createDataFrame([], "vec_id long, e array<double>")
    with pytest.raises(ValueError, match="empty"):
        pq_train(empty)
    bad_dim = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, e array<double>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(bad_dim, m=2)


def test_ivf_pq_topk_recall_and_subset(emb, sf_dir):
    """IVF+PQ composed, measured at its production contract — SHORTLIST
    generation for an exact re-rank (a PQ top-5 is coarse by design; what
    matters is that the exact top-5 survives into the 4x shortlist):
    recall@(5 in 20) >= 0.7 on the test embeddings (observed 38-42/50),
    all queries ranked, and the composition is CONSISTENT with plain ADC:
    a (qid, nid) the composed search scores must carry the same adist the
    brute-force ADC assigns (cell pruning changes WHICH pairs are priced,
    never the price)."""
    from apache_jira_scraper_spark.operators.ivf import ivf_build
    from apache_jira_scraper_spark.operators.quantize import (
        ivf_pq_topk,
        pq_adc_topk,
        pq_train,
    )

    cent = ivf_build(emb, k=8, n_iter=3)
    books = pq_train(emb)
    got = ivf_pq_topk(emb, cent, books, n_queries=10, top_k=20, nprobe=2)
    exact = q_cosine_topk(emb.sparkSession, sf_dir)
    hits = exact.join(got.select("qid", "nid"), ["qid", "nid"], "left_semi").count()
    total = exact.count()
    assert total > 0 and hits / total >= 0.7, f"recall {hits}/{total}"
    assert got.select("qid").distinct().count() == 10
    brute = {
        (r["qid"], r["nid"]): r["adist"]
        for r in pq_adc_topk(emb, books, n_queries=10, top_k=2000).collect()
    }
    for r in got.collect():
        assert brute[(r["qid"], r["nid"])] == r["adist"], (r["qid"], r["nid"])


def test_ivf_pq_residual_topk_recall_and_price_parity(emb, sf_dir):
    """by_residual=True IVFPQ: shortlist recall holds the same 0.7 floor
    (the synthetic embeddings are not multi-modal, so residual coding is
    expected to roughly MATCH the plain variant here, not beat it — its
    value case is cell-clustered corpora), and the priced distance is
    EXACTLY the python reference ||(q - c(nid)) - rcb[code(res(nid))]||²
    for every returned pair — cell-local frames on both sides, computed
    end-to-end independently of the Spark column algebra."""
    from apache_jira_scraper_spark.operators.ivf import ivf_build, ivf_assign
    from apache_jira_scraper_spark.operators.quantize import (
        ivf_pq_residual_topk,
        pq_model,
        pq_train_residual,
    )

    cent = ivf_build(emb, k=8, n_iter=3)
    rbooks = pq_train_residual(emb, cent)
    got = ivf_pq_residual_topk(emb, cent, rbooks, n_queries=10, top_k=20, nprobe=2)
    exact = q_cosine_topk(emb.sparkSession, sf_dir)
    hits = exact.join(got.select("qid", "nid"), ["qid", "nid"], "left_semi").count()
    total = exact.count()
    assert total > 0 and hits / total >= 0.7, f"recall {hits}/{total}"
    assert got.select("qid").distinct().count() == 10

    cents = {r["cid"]: list(r["centroid"]) for r in cent.collect()}
    cell = {
        r["vec_id"]: r["cid"]
        for r in ivf_assign(emb, cent, nprobe=1).select("vec_id", "cid").collect()
    }
    vecs = {r["vec_id"]: list(r["e"]) for r in emb.collect()}
    m = len(rbooks)
    dsub = len(rbooks[0][0])
    for r in got.collect():
        c = cents[cell[r["nid"]]]
        res = [x - y for x, y in zip(vecs[r["nid"]], c)]
        code = pq_model(res, rbooks)[0]
        qres = [x - y for x, y in zip(vecs[r["qid"]], c)]
        want = round(
            sum(
                sum(
                    (x - y) * (x - y)
                    for x, y in zip(
                        qres[j * dsub : (j + 1) * dsub], rbooks[j][code[j]]
                    )
                )
                for j in range(m)
            ),
            6,
        )
        assert abs(want - r["adist"]) <= 1e-6, (r["qid"], r["nid"], want, r["adist"])


def test_pq_train_residual_guards(spark):
    from apache_jira_scraper_spark.operators.quantize import pq_train_residual

    cent = spark.createDataFrame(
        [(0, [0.0] * 4), (1, [1.0] * 4)], "cid int, centroid array<double>"
    )
    empty = spark.createDataFrame([], "vec_id long, e array<double>")
    with pytest.raises(ValueError, match="empty"):
        pq_train_residual(empty, cent)


def test_opq_train_rotation_and_mse(emb):
    """The learned rotation must be orthogonal to machine precision, the
    trained-sample quantization MSE must not exceed plain PQ's at the same
    (m, ksub) (each alternation step is non-increasing), and opq_iters=0
    must degrade to PQ exactly (R = identity, identical codebooks)."""
    import numpy as np

    from apache_jira_scraper_spark.operators.quantize import (
        _np_pq_reconstruct,
        opq_train,
        pq_train,
    )

    r, obooks = opq_train(emb)
    rm = np.asarray(r)
    assert float(np.abs(rm @ rm.T - np.eye(rm.shape[0])).max()) < 1e-9

    books = pq_train(emb)
    x = np.asarray([list(row["e"]) for row in emb.orderBy("vec_id").limit(4096).collect()])
    mse_pq = float(((x - _np_pq_reconstruct(x, books)) ** 2).sum(axis=1).mean())
    xr = x @ rm.T
    mse_opq = float(((xr - _np_pq_reconstruct(xr, obooks)) ** 2).sum(axis=1).mean())
    assert mse_opq <= mse_pq + 1e-12, (mse_opq, mse_pq)

    r0, books0 = opq_train(emb, opq_iters=0)
    assert np.array_equal(np.asarray(r0), np.eye(rm.shape[0]))
    assert books0 == books


def test_rotate_col_matches_sequential_reference(emb):
    """rotate_col's fold is sequential left-to-right, so a Python
    reference summing in the same order must match BIT-for-bit (no
    tolerance) — the property that keeps rotated-space twins exact."""
    from apache_jira_scraper_spark.operators.quantize import opq_train, rotate_col

    r, _ = opq_train(emb, opq_iters=2)
    rows = emb.orderBy("vec_id").limit(10).collect()
    got = {
        row["vec_id"]: list(row["re"])
        for row in emb.filter(F.col("vec_id") < 10)
        .select("vec_id", rotate_col("e", r).alias("re"))
        .collect()
    }
    for row in rows:
        vec = list(row["e"])
        want = []
        for rrow in r:
            acc = 0.0
            for x, y in zip(vec, rrow):
                acc = acc + x * y
            want.append(acc)
        assert got[row["vec_id"]] == want, row["vec_id"]


def test_opq_adc_shortlist_recall(emb, sf_dir):
    """OPQ at the gate's shortlist setting must hold the same floor as
    plain PQ (observed: it IMPROVES — 50/50 vs 46/50 exact-top-5 hits at
    the test SF — but the pin is the floor, not superiority: rotation
    gains are data-dependent)."""
    from apache_jira_scraper_spark.operators.quantize import (
        PQ_GATE_SHORTLIST_K,
        PQ_MIN_HITS,
        opq_adc_topk,
        opq_train,
    )

    r, obooks = opq_train(emb)
    short = opq_adc_topk(emb, r, obooks, n_queries=10, top_k=PQ_GATE_SHORTLIST_K)
    exact = q_cosine_topk(emb.sparkSession, sf_dir)
    per_q = {
        row["qid"]: row["hits"]
        for row in exact.join(short.select("qid", "nid"), ["qid", "nid"], "left_semi")
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("hits"))
        .collect()
    }
    nq = exact.select("qid").distinct().count()
    assert nq > 0 and len(per_q) == nq
    assert min(per_q.values()) >= PQ_MIN_HITS, per_q
