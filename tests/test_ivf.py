"""IVF ANN index: determinism, plan shape, and recall against the exact
top-k oracle (operators/ivf.py — the coarse-quantizer scale path beside the
sign-LSH bucketing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_jira_scraper_spark.operators.ivf import ivf_assign, ivf_build, ivf_search
from apache_jira_scraper_spark.operators.similarity import _emb, q_cosine_topk
from apache_jira_scraper_spark.plans.inspect import operator_counts


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return _emb(spark, sf_dir).persist()


@pytest.fixture(scope="module")
def centroids(emb):
    return ivf_build(emb, k=8, n_iter=3)


def test_build_is_deterministic(emb):
    a = {r["cid"]: r["centroid"] for r in ivf_build(emb, k=8, n_iter=3).collect()}
    b = {r["cid"]: r["centroid"] for r in ivf_build(emb, k=8, n_iter=3).collect()}
    assert a.keys() == b.keys()
    for cid in a:
        assert a[cid] == pytest.approx(b[cid])


def test_build_tol_is_scale_invariant(emb):
    """The early-stop tolerance is RELATIVE to centroid magnitude: scaling
    every embedding by 1e-6 must converge through the same trajectory and
    yield the scaled centroids — an absolute threshold would stop a
    small-magnitude space after round 1 regardless of convergence."""
    s = 1e-6
    scaled = emb.select(
        "vec_id", F.transform("e", lambda x: x * F.lit(s)).alias("e")
    )
    a = {r["cid"]: r["centroid"] for r in ivf_build(emb, k=8, n_iter=3).collect()}
    b = {r["cid"]: r["centroid"] for r in ivf_build(scaled, k=8, n_iter=3).collect()}
    assert a.keys() == b.keys()
    for cid in a:
        assert [x * s for x in a[cid]] == pytest.approx(b[cid], rel=1e-9, abs=1e-18)


def test_assign_partitions_corpus(emb, centroids):
    n = emb.count()
    assigned = ivf_assign(emb, centroids, nprobe=1)
    assert assigned.count() == n  # exactly one cell per vector
    sizes = assigned.groupBy("cid").count().collect()
    assert 1 < len(sizes) <= 8  # the quantizer actually splits the space
    assert sum(r["count"] for r in sizes) == n


def test_probe_fanout(emb, centroids):
    probes = ivf_assign(emb.filter(F.col("vec_id") < 5), centroids, nprobe=3)
    per_q = {r["vec_id"]: r["count"] for r in probes.groupBy("vec_id").count().collect()}
    assert set(per_q) == {0, 1, 2, 3, 4}
    assert all(c == 3 for c in per_q.values())


def test_search_recall_vs_exact(spark, sf_dir, emb, centroids):
    """nprobe=3 of 8 cells must recover most of the exact top-5 — the
    standard IVF recall check (threshold loose enough to be stable across
    the deterministic quantizer, tight enough to catch a broken probe)."""
    exact = q_cosine_topk(spark, sf_dir)
    truth = {(r["qid"], r["nid"]) for r in exact.collect()}
    got = {
        (r["qid"], r["nid"])
        for r in ivf_search(emb, centroids, n_queries=10, top_k=5, nprobe=3).collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"recall@5 = {recall:.2f}"


def test_search_assigned_path_identical(emb, centroids):
    """ivf_search(assigned=ivf_probe_assign(...)) — the gate's checkpointed
    index-artifact fast path — must return exactly the internal-assignment
    result, row for row."""
    from apache_jira_scraper_spark.operators.ivf import ivf_probe_assign

    internal = [
        tuple(r)
        for r in ivf_search(emb, centroids, n_queries=10, top_k=5, nprobe=2).collect()
    ]
    pre = ivf_probe_assign(emb, centroids, nprobe=2)
    fast = [
        tuple(r)
        for r in ivf_search(
            emb, centroids, n_queries=10, top_k=5, nprobe=2, assigned=pre
        ).collect()
    ]
    assert internal == fast


def test_search_plan_is_equi_join(emb, centroids):
    """Candidate generation must be the cid equi-join. The
    BroadcastNestedLoopJoins in the plan are the vector×centroid assignment
    scans — O(n·k) against a k-row broadcast table, the intended shape —
    but nothing may fall to a real CartesianProduct, and the probe→corpus
    join must hash on cid."""
    df = ivf_search(emb, centroids, n_queries=10, top_k=5, nprobe=2)
    ops = operator_counts(df)
    assert "CartesianProduct" not in ops, ops
    assert ops.get("BroadcastHashJoin", 0) >= 1, ops


def test_ivf_near_dup_pairs_exact_subset_with_recall(spark, emb, centroids):
    """The IVF-blocked near-dup generator must emit ONLY true pairs (exact
    cosine, precision 1 by construction) and, with nprobe=2, recover a
    solid fraction of all >=threshold pairs; nprobe=1 recall must not
    exceed nprobe=2 (the probe knob monotonicity)."""
    import numpy as np

    from apache_jira_scraper_spark.operators.ivf import ivf_near_dup_pairs

    rows = emb.select("vec_id", "e").collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.array([r["e"] for r in rows])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    C = M @ M.T
    iu = np.triu_indices(len(ids), k=1)
    true_pairs = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))): round(float(C[i, j]), 4)
        for i, j in zip(*iu)
        if round(float(C[i, j]), 4) >= 0.25
    }
    assert len(true_pairs) > 100  # the fixture corpus has a real pair tail

    got = {
        (r["v1"], r["v2"]): r["cosine"]
        for r in ivf_near_dup_pairs(emb, centroids, threshold=0.25, nprobe=2).collect()
    }
    assert set(got) <= set(true_pairs)
    for p, c in got.items():
        assert c == pytest.approx(true_pairs[p], abs=1e-4)
    recall2 = len(got) / len(true_pairs)

    got1 = ivf_near_dup_pairs(emb, centroids, threshold=0.25, nprobe=1).count()
    assert got1 / len(true_pairs) <= recall2 + 1e-9
    assert recall2 >= 0.3, recall2


def test_assign_literal_path_is_zero_shuffle(emb, centroids):
    """For k <= _LITERAL_K_MAX the inverted-list assignment must be a pure
    narrow map (argmin over centroid literals): no Exchange, no Join."""
    plan = (
        ivf_assign(emb, centroids, nprobe=1)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_assign_large_k_join_path_equivalent(emb, centroids):
    """The broadcast-join form (forced via _LITERAL_K_MAX) must assign
    exactly the same cells as the literal-expression form."""
    from apache_jira_scraper_spark.operators import ivf as ivf_mod

    lit = {(r["vec_id"], r["cid"]) for r in ivf_assign(emb, centroids, nprobe=2).collect()}
    old = ivf_mod._LITERAL_K_MAX
    ivf_mod._LITERAL_K_MAX = 0
    try:
        join = {
            (r["vec_id"], r["cid"])
            for r in ivf_assign(emb, centroids, nprobe=2).collect()
        }
    finally:
        ivf_mod._LITERAL_K_MAX = old
    assert lit == join


def test_semantic_dedup_constructed_clusters(spark):
    """Two tight clusters + one loner: one survivor per cluster (min id),
    loner kept, every input row labeled."""
    from apache_jira_scraper_spark.operators.ivf import ivf_build, semantic_dedup

    base_a = [1.0, 0.0, 0.0, 0.0]
    base_b = [0.0, 1.0, 0.0, 0.0]
    rows = [
        (0, [1.0, 0.01, 0.0, 0.0], 0),
        (1, [0.99, 0.0, 0.01, 0.0], 0),
        (2, [1.0, 0.0, 0.0, 0.02], 0),     # cluster A: 0,1,2
        (10, [0.0, 1.0, 0.01, 0.0], 1),
        (11, [0.01, 0.99, 0.0, 0.0], 1),   # cluster B: 10,11
        (20, [0.0, 0.0, 0.0, -1.0], 2),    # loner
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, e array<double>, label int")
    emb = emb.withColumn(
        "nrm",
        F.sqrt(F.aggregate(F.transform("e", lambda x: x * x), F.lit(0.0), lambda a, v: a + v)),
    )
    cent = ivf_build(emb, k=3, n_iter=3)
    got = {r["vec_id"]: (r["cluster_id"], r["kept"]) for r in semantic_dedup(emb, cent, threshold=0.9).collect()}
    assert got == {
        0: (0, True), 1: (0, False), 2: (0, False),
        10: (10, True), 11: (10, False),
        20: (20, True),
    }


def test_ann_or_amplification_recall(spark, sf_dir):
    """ann_lsh_topk_multi: recall@k vs the exact top-k rises monotonically
    with n_tables (a pair missed by one table's buckets can collide in
    another's), and n_tables=1 matches the single-table path's pair
    coverage."""
    from apache_jira_scraper_spark.operators.similarity import (
        LSH_TOP_K,
        ann_lsh_topk_multi,
        q_cosine_topk,
    )

    exact = {}
    for r in q_cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r["qid"], set()).add(r["nid"])

    def recall(k_tables: int) -> float:
        got = {}
        for r in ann_lsh_topk_multi(spark, sf_dir, n_tables=k_tables).collect():
            got.setdefault(r["qid"], set()).add(r["nid"])
        hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
        return hits / sum(len(v) for v in exact.values())

    r1, r2, r4 = recall(1), recall(2), recall(4)
    assert r1 <= r2 <= r4, (r1, r2, r4)
    assert r4 > r1, (r1, r4)  # amplification actually bites on this corpus


def test_build_rejects_empty_and_nonfinite(spark, emb):
    """Guards from the r04 review: empty training input raises a clear
    ValueError (not a NoneType subscript), and a NaN coordinate reaching
    the centroid model is rejected before it becomes an invalid 'nanD'
    SQL literal deep inside the argmin expression."""
    empty = spark.createDataFrame([], "vec_id long, e array<double>")
    with pytest.raises(ValueError, match="empty"):
        ivf_build(empty)

    bad = spark.createDataFrame(
        [(0, [float("nan"), 1.0]), (1, [0.5, 0.5])], "cid int, centroid array<double>"
    )
    with pytest.raises(ValueError, match="non-finite"):
        ivf_assign(emb, bad)


def test_bucket_bits_validation(spark):
    """n_bits outside [1, 32]: 0 silently collapses blocking to one bucket
    (quadratic self-join) and >32 reads past the 64-dim layout — both are
    rejected loudly."""
    from apache_jira_scraper_spark.operators.similarity import _bucket_t

    for bad in (0, -1, 33):
        with pytest.raises(ValueError, match="n_bits"):
            _bucket_t(F.col("e"), bad, 0)


def test_exact_ivf_cross_engine_parity(spark, sf_dir):
    """The r11 exact-IVF family: Python-trained model + Spark-assigned
    blocked pairs must equal, BIT FOR BIT, the DuckDB CTE chain that
    trains the same model in SQL (ivf_exact_sql_ctes) — the property the
    semantic_dedup gate's ivf leg rests on. Checked standalone so an edit
    to either twin fails here before gate time."""
    import duckdb

    from apache_jira_scraper_spark.operators.ivf import (
        ivf_build_exact,
        ivf_exact_sql_ctes,
        ivf_near_dup_pairs_exact,
    )
    from apache_jira_scraper_spark.operators.similarity import _emb

    emb = _emb(spark, sf_dir)
    cents = ivf_build_exact(emb)
    got = [
        (r["v1"], r["v2"], r["cosine"])
        for r in ivf_near_dup_pairs_exact(emb, cents).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = [
        (a, b, float(c))
        for a, b, c in con.execute(
            f"WITH {ivf_exact_sql_ctes()} "
            "SELECT v1, v2, cosine FROM ivq_pairs ORDER BY v1, v2"
        ).fetchall()
    ]
    assert got == want
    assert got, "exact-IVF pair set empty — the parity certifies nothing"


def test_exact_ivf_leg_differs_from_lsh_leg(spark, sf_dir):
    """Non-vacuity: IVF-cell blocking must produce a genuinely different
    clustering from sign-LSH blocking somewhere at this SF, or the second
    gate leg certifies a clone (the r02 lesson)."""
    from apache_jira_scraper_spark.operators.dedup import q_semantic_dedup

    rows = q_semantic_dedup(spark, sf_dir).collect()
    legs: dict = {"lsh": {}, "ivf": {}, "proto": {}}
    for r in rows:
        legs[r["leg"]][r["vec_id"]] = (r["cluster_id"], r["kept"])
    assert set(legs["lsh"]) == set(legs["ivf"]) == set(legs["proto"])
    assert legs["lsh"] != legs["ivf"]
    # and the r13 proto leg is not a clone of either dedup leg
    assert legs["proto"] != legs["lsh"] and legs["proto"] != legs["ivf"]


def test_round_half_away_matches_engines():
    """_round_half_away must agree with Spark F.round / DuckDB ROUND
    (half away from zero) — NOT Python's banker's round."""
    from apache_jira_scraper_spark.operators.ivf import _round_half_away

    assert _round_half_away(0.0000005) == 0.000001
    assert _round_half_away(-0.0000005) == -0.000001
    assert _round_half_away(1.0000015) == 1.000002  # banker's would give 1.000002 too
    assert _round_half_away(2.5, 0) == 3.0  # banker's gives 2.0
    assert _round_half_away(-2.5, 0) == -3.0


def test_round_half_away_vectorized_is_same_definition():
    """The trainer calls _round_half_away on numpy arrays; pin that the
    vectorized path equals the scalar path on a sign/boundary grid so the
    one definition genuinely serves both (review r11)."""
    import numpy as np

    from apache_jira_scraper_spark.operators.ivf import _round_half_away

    grid = [-2.5e-6, -5e-7, -1e-7, 0.0, 1e-7, 5e-7, 2.5e-6, 1.0000005, -3.14159265]
    vec = _round_half_away(np.asarray(grid))
    for g, v in zip(grid, vec):
        assert _round_half_away(g) == v


def test_density_prune_crafted_cutoff():
    """Hand-checkable D4 prune (r13): explicit 2-D centroids, one live
    cell with known squared distances 0.25/1.44/2.89/4.0/6.25 -> buckets
    0/1/2/4/6 at grid=1e6 (whole units). quota = floor(5 * 0.5) = 2, cum
    hits 2 at bucket 1 -> cutoff 1: ONLY the bucket-0 point drops, and
    the boundary bucket survives whole (value-only tie policy)."""
    from apache_jira_scraper_spark.operators.ivf import density_prune
    from apache_jira_scraper_spark.session import get_spark

    spark = get_spark()
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [100.0, 100.0])],
        "cid int, centroid array<double>",
    )
    pts = [
        (10, [0.5, 0.0]),  # d2 = 0.25 -> b0 (the one drop)
        (11, [1.2, 0.0]),  # 1.44 -> b1 (boundary, kept)
        (12, [0.0, 1.7]),  # 2.89 -> b2
        (13, [2.0, 0.0]),  # 4.00 -> b4
        (14, [1.5, 2.0]),  # 6.25 -> b6
    ]
    emb = spark.createDataFrame(pts, "vec_id bigint, e array<double>")
    got = {
        r["vec_id"]: (r["cid"], r["kept"])
        for r in density_prune(
            emb, cents, prune_ppm=500_000, grid=1_000_000
        ).collect()
    }
    assert got == {
        10: (0, False),
        11: (0, True),
        12: (0, True),
        13: (0, True),
        14: (0, True),
    }


def test_density_prune_cross_engine_parity(spark, sf_dir):
    """density_prune vs the ivq_proto CTE twin, bit for bit — the
    property the semantic_dedup gate's proto leg rests on, checked
    standalone (the exact-family pattern)."""
    import duckdb

    from apache_jira_scraper_spark.operators.ivf import (
        DENSITY_PRUNE_PPM,
        density_prune,
        ivf_build_exact,
        ivf_exact_sql_ctes,
    )
    from apache_jira_scraper_spark.operators.similarity import _emb

    emb = _emb(spark, sf_dir)
    cents = ivf_build_exact(emb)
    got = [
        (r["vec_id"], r["cid"], r["kept"])
        for r in density_prune(emb.select("vec_id", "e"), cents).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = [
        (v, c, bool(k))
        for v, c, k in con.execute(
            f"WITH {ivf_exact_sql_ctes(proto_ppm=DENSITY_PRUNE_PPM)} "
            "SELECT vec_id, cid, kept FROM ivq_proto ORDER BY vec_id"
        ).fetchall()
    ]
    assert got == want
    dropped = sum(1 for _, _, k in got if not k)
    assert dropped, "prune dropped nothing — the parity certifies nothing"
    # realized drop fraction never exceeds the ppm quota (value-only
    # ties only UNDER-prune), summed per cell so the bound is the tight
    # per-cell one, not the aggregate
    from collections import Counter

    n_cell: Counter = Counter()
    d_cell: Counter = Counter()
    for _, c, k in got:
        n_cell[c] += 1
        d_cell[c] += 0 if k else 1
    for c in n_cell:
        assert d_cell[c] <= n_cell[c] * DENSITY_PRUNE_PPM // 1_000_000
