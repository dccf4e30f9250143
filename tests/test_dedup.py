"""Dedup-family coverage beyond the registry gates.

The signature-producing queries (MinHash, SimHash) were de-registered in
round 2 to fit the driver's 50-query cap — their end-to-end consumers
stay oracle-gated (since r05 the LSH + ngram + substring legs share the
union-tagged `dedup_near_pairs` gate; simhash keeps its own slot), and
THIS file pins the signature parity that the dropped gates used to
check, plus the df-cutoff scale knob of the n-gram jaccard join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_jira_scraper_spark.operators.dedup import (
    MINHASH_SIG_SQL,
    SIMHASH_SIG_SQL,
    q_dedup_ngram_jaccard,
    q_minhash_signatures,
    q_simhash_signatures,
)
from tests.oracle_utils import assert_matches_oracle


def test_minhash_signatures_match_oracle(spark, sf_dir):
    assert_matches_oracle(
        q_minhash_signatures(spark, sf_dir), MINHASH_SIG_SQL, sf_dir,
        name="minhash_signatures",
    )


def test_simhash_signatures_match_oracle(spark, sf_dir):
    assert_matches_oracle(
        q_simhash_signatures(spark, sf_dir), SIMHASH_SIG_SQL, sf_dir,
        name="simhash_signatures",
    )


def test_ngram_df_cutoff_prunes_and_converges(spark, sf_dir):
    """A generous cutoff must reproduce the exact result (no shingle in the
    small corpus is that hot); a cutoff of 1 keeps only unique shingles, so
    no pair can share one and the result is empty — the two endpoints of
    the recall contract."""
    exact = {(r["d1"], r["d2"]) for r in q_dedup_ngram_jaccard(spark, sf_dir).collect()}
    loose = {
        (r["d1"], r["d2"])
        for r in q_dedup_ngram_jaccard(spark, sf_dir, max_doc_freq=10**6).collect()
    }
    assert loose == exact
    strict = q_dedup_ngram_jaccard(spark, sf_dir, max_doc_freq=1).collect()
    assert strict == []


def test_connected_components_chain_and_clique(spark):
    """A 4-node chain (worst-case diameter) and a disjoint triangle must
    both collapse to their min node id; a pair component keeps its own min."""
    from apache_jira_scraper_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "d1 long, d2 long",
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(edges).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_connected_components_empty_edges(spark):
    from apache_jira_scraper_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([], "d1 long, d2 long")
    assert connected_components(edges).count() == 0


def test_connected_components_long_chain(spark):
    """A 20-node path graph is the adversarial diameter case for
    min-label propagation — the loop must iterate to full convergence,
    not stop at a fixed small round count."""
    from apache_jira_scraper_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 119)], "d1 long, d2 long"
    )
    got = {(r["doc_id"], r["cluster_id"]) for r in connected_components(edges).collect()}
    assert got == {(i, 100) for i in range(100, 120)}


def test_signatures_partitioning_invariant(spark, sf_dir):
    """Aggregation results must be independent of the physical partition
    layout — the property that makes the pipeline's answers stable across
    cluster sizes and AQE re-plans. Compute minhash signatures and simhash
    sketches from a 1-partition and a 32-partition copy of the shingle/token
    input and require bit-identical results."""
    from pyspark.sql import functions as F

    from apache_jira_scraper_spark.operators import dedup

    sh = dedup._doc_shingle_hashed(spark, sf_dir)
    one = dedup._signatures(spark, sf_dir, sh_hashed=sh.coalesce(1))
    many = dedup._signatures(spark, sf_dir, sh_hashed=sh.repartition(32))
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))

    sim = {r["doc_id"]: r["simhash"] for r in dedup._simhash_df(spark, sf_dir).collect()}
    # simhash over a shuffled layout: force a different partitioning of docs
    docs = dedup.load_table(spark, sf_dir, "documents").repartition(7, "lang")
    docs.createOrReplaceTempView("_sim_docs_tmp")
    tok = docs.select("doc_id", F.explode(dedup._toks()).alias("t")).select(
        "doc_id",
        F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("bigint").alias("x"),
    )
    votes = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nt"),
        *[
            F.sum(
                F.expr(
                    f"CAST(((x >> {3 * g}) & 1) + (((x >> {3 * g + 1}) & 1) << 20)"
                    f" + (((x >> {3 * g + 2}) & 1) << 40) AS BIGINT)"
                )
            ).alias(f"S{g}")
            for g in range(20)
        ],
    )
    sim_expr = F.expr(
        "CAST("
        + " + ".join(
            f"(CASE WHEN 2 * ((S{i // 3} >> {20 * (i % 3)}) & 1048575) > nt"
            f" THEN {1 << i} ELSE 0 END)"
            for i in range(60)
        )
        + " AS BIGINT)"
    )
    sim2 = {
        r["doc_id"]: r["sh"]
        for r in votes.select("doc_id", sim_expr.alias("sh")).collect()
    }
    assert sim == sim2


def test_twophase_components_match_hash_to_min(spark, sf_dir):
    """Large-star/small-star must produce the identical labeling as
    hash-to-min on the chain, the clique, the long path, AND the real
    corpus near-dup graph."""
    from apache_jira_scraper_spark.operators.dedup import (
        connected_components,
        connected_components_twophase,
        minhash_pairs,
    )

    synth = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
        + [(i, i + 1) for i in range(100, 119)],
        "d1 long, d2 long",
    )
    for edges in (synth, minhash_pairs(spark, sf_dir).select("d1", "d2")):
        a = {(r["doc_id"], r["cluster_id"]) for r in connected_components(edges).collect()}
        b = {
            (r["doc_id"], r["cluster_id"])
            for r in connected_components_twophase(edges).collect()
        }
        assert a == b and len(a) > 0


def test_embedding_cosine_pairs_exact_values(spark):
    """Value-level check of the embedding near-dup scorer on constructed
    vectors (r02 lesson: the gate passed on 0 rows, so a sign flip in the
    dot product was unobservable). Four 64-dim vectors sharing a label and
    an LSH bucket: base, a near-duplicate (cosine ~1), an orthogonal vector
    (cosine 0), and an anti-correlated vector engineered to KEEP the bucket
    bits while flipping the dot sign — only (base, near) may be emitted,
    with the numpy-computed cosine."""
    import numpy as np

    from apache_jira_scraper_spark.operators.dedup import embedding_cosine_pairs

    base = np.array([1.0] * 32 + [0.0] * 32)
    near = base.copy()
    near[10] = 1.05  # tiny perturbation: cosine ~0.9995, same sign bits
    orth = np.array([0.0] * 32 + [1.0] * 32)
    orth[:5] = 0.1  # keep e[i] > e[32+i] for the five bucket bits...
    orth[32:37] = 0.0  # ...so exclusion is by the cosine threshold alone
    anti = np.array([0.1] * 5 + [-10.0] * 27 + [0.0] * 32)  # bucket bits kept, dot < 0

    def cos(a, b):
        return round(float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 4)

    emb = spark.createDataFrame(
        [(1, "x", base.tolist()), (2, "x", near.tolist()),
         (3, "x", orth.tolist()), (4, "x", anti.tolist())],
        "vec_id long, label string, embedding array<double>",
    )
    got = {
        (r["v1"], r["v2"]): r["cosine"]
        for r in embedding_cosine_pairs(emb, threshold=0.25, n_bits=5).collect()
    }
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == cos(base, near) > 0.99
    # the anti vector shares base's bucket, so only the negative cosine
    # keeps it out — a sign/abs bug in the fold would emit (1, 4)
    assert cos(base, anti) < -0.5


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _base(i: int, n: int = 12) -> str:
    return " ".join(f"d{i}w{j}" for j in range(n))


def test_incremental_dedup_first_batch_and_new_batch(spark):
    """Batch A: 0/1 near-identical (1 dropped), 2 unique, 9 short (kept —
    no shingles). Batch B: 10 dupes kept-A 0, 11 dupes dropped-A 1 (kept:
    1 left the index), 12 dupes B-internal 13, 14 unique."""
    from apache_jira_scraper_spark.operators.dedup import incremental_dedup

    a_txt = _base(0)
    docs_a = _mkdocs(
        spark,
        [(0, a_txt), (1, a_txt + " tail"), (2, _base(2)), (9, "too short")],
    )
    kept_a, idx = incremental_dedup(docs_a)
    assert {r["doc_id"] for r in kept_a.collect()} == {0, 2, 9}
    # the signature table covers EVERY kept doc — the short doc rides along
    # with null minhashes (no LSH candidates, but replay-guard-visible)
    assert {r["doc_id"] for r in idx[1].select("doc_id").collect()} == {0, 2, 9}
    assert idx[1].filter("doc_id = 9 AND m0 IS NULL").count() == 1

    b13 = _base(13)
    docs_b = _mkdocs(
        spark,
        [
            (10, a_txt + " x"),           # near-dup of kept 0 -> dropped
            (11, a_txt + " tail y"),      # near-dup of DROPPED 1 only… and of 0? same base -> dropped
            (12, b13 + " z"),             # near-dup of 13 (same batch, larger id) -> kept? 12 < 13
            (13, b13),                    # larger id of the in-batch pair -> dropped
            (14, _base(14)),              # unique -> kept
        ],
    )
    kept_b, idx2 = incremental_dedup(docs_b, idx)
    got = {r["doc_id"] for r in kept_b.collect()}
    assert 10 not in got and 14 in got and 12 in got and 13 not in got
    # the updated index holds exactly the kept docs of both batches
    assert {r["doc_id"] for r in idx2[1].select("doc_id").collect()} == {0, 2, 9} | got


def test_incremental_equals_single_batch_when_chain_free(spark):
    """For chain-free duplicate relations, incremental over two batches
    keeps exactly the docs a single-batch run over the union keeps."""
    from apache_jira_scraper_spark.operators.dedup import incremental_dedup

    rows = [(i, _base(i)) for i in range(6)]
    rows += [(10, _base(0) + " q"), (11, _base(3) + " r"), (12, _base(20))]
    all_docs = _mkdocs(spark, rows)
    kept_all, _ = incremental_dedup(all_docs)

    first = _mkdocs(spark, rows[:6])
    second = _mkdocs(spark, rows[6:])
    k1, idx = incremental_dedup(first)
    k2, _ = incremental_dedup(second, idx)
    inc = {r["doc_id"] for r in k1.collect()} | {r["doc_id"] for r in k2.collect()}
    assert inc == {r["doc_id"] for r in kept_all.collect()}


def test_incremental_dedup_index_side_never_reshingled(spark):
    """The candidate plan must read the index's SIGNATURE table, not
    re-derive it: no md5/split over the index docs appears in the new-batch
    dedup plan (the index tables stand alone as leaves)."""
    from apache_jira_scraper_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup,
    )

    idx_docs = _mkdocs(spark, [(i, _base(i)) for i in range(4)])
    sh, sig = build_dedup_index(idx_docs)
    idx = (sh.localCheckpoint(eager=True), sig.localCheckpoint(eager=True))
    new_docs = _mkdocs(spark, [(50, _base(0) + " v"), (51, _base(30))])
    kept, _ = incremental_dedup(new_docs, idx)
    plan = kept._jdf.queryExecution().optimizedPlan().toString()
    # checkpointed index = LogicalRDD leaves; the only parquet/json scans
    # or shingle derivations allowed are over the 2-row new batch
    assert plan.count("LogicalRDD") >= 2
    assert {r["doc_id"] for r in kept.collect()} == {51}


def test_exact_substring_dedup_constructed_values(spark):
    """A 5-token run shared by docs 1 and 2 vanishes from BOTH (remove-all);
    doc 3's self-repeated run vanishes too; unique text untouched; short
    docs pass through."""
    from apache_jira_scraper_spark.operators.dedup import exact_substring_dedup

    shared = "p q r s t"
    docs = _mkdocs(
        spark,
        [
            (1, f"a b {shared} c d"),
            (2, f"x {shared} y z"),
            (3, f"{shared} {shared}"),     # duplicated within one doc
            (4, "all unique tokens here e f"),
            (5, "tiny doc"),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in exact_substring_dedup(docs, span=5).collect()}
    assert got[1]["cleaned_text"] == "a b c d" and got[1]["n_removed"] == 5
    assert got[2]["cleaned_text"] == "x y z"
    assert got[3]["cleaned_text"] == "" and got[3]["n_removed"] == 10
    assert got[4]["cleaned_text"] == "all unique tokens here e f"
    assert got[5] == {
        "doc_id": 5, "n_tokens": 2, "n_removed": 0, "cleaned_text": "tiny doc"
    }


def test_exact_substring_dedup_overlapping_runs(spark):
    """A 6-token duplicated run = two overlapping hot 5-windows; coverage
    must merge them (6 tokens removed, not 10)."""
    from apache_jira_scraper_spark.operators.dedup import exact_substring_dedup

    run6 = "p q r s t u"
    docs = _mkdocs(spark, [(1, f"a {run6} b"), (2, f"c {run6} d")])
    got = {r["doc_id"]: r.asDict() for r in exact_substring_dedup(docs, span=5).collect()}
    assert got[1]["n_removed"] == 6 and got[1]["cleaned_text"] == "a b"
    assert got[2]["cleaned_text"] == "c d"


def test_exact_substring_dedup_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.operators.dedup import (
        exact_substring_dedup,
        exact_substring_dedup_sql,
    )
    from apache_jira_scraper_spark.io import load_table
    from tests.oracle_utils import assert_matches_oracle

    assert_matches_oracle(
        exact_substring_dedup(load_table(spark, sf_dir, "documents"), span=10),
        exact_substring_dedup_sql(span=10),
        sf_dir,
        name="exact_substring_dedup",
    )


def test_incremental_dedup_replayed_batch_drops_everything(spark):
    """Replay safety: feeding the SAME batch against the post-batch index
    keeps nothing (every doc is an exact dup of its indexed self), and the
    index is unchanged in cardinality — the property streaming_dedup_ingest
    relies on for at-least-once sources."""
    from apache_jira_scraper_spark.operators.dedup import incremental_dedup

    # include a sub-3-token doc: it has no shingles, so only the id-replay
    # guard can drop its re-delivery — the signature table must carry a
    # null-minhash row for it (regression: an index of shingled docs only
    # silently re-kept replayed short docs)
    docs = _mkdocs(spark, [(i, _base(i)) for i in range(5)] + [(9, "too short")])
    kept1, idx1 = incremental_dedup(docs)
    assert kept1.filter("doc_id = 9").count() == 1  # short doc kept once
    n_index = idx1[1].count()
    kept2, idx2 = incremental_dedup(docs, idx1)
    assert kept2.count() == 0
    assert idx2[1].count() == n_index


def test_lsh_plan_contract():
    """The module's NUM_HASHES/BANDS constants ARE lsh_plan's answer at the
    verify threshold (the sizing contract can't drift); knees land near
    their targets; the S-curve separates below/above-threshold pairs."""
    import pytest as _pytest

    from apache_jira_scraper_spark.operators.dedup import (
        BANDS,
        LSH_VERIFY_THRESHOLD,
        NUM_HASHES,
        lsh_collision_prob,
        lsh_plan,
    )

    assert lsh_plan(LSH_VERIFY_THRESHOLD, NUM_HASHES) == (BANDS, NUM_HASHES // BANDS)
    for threshold, n_perm in [(0.5, 8), (0.8, 128), (0.5, 128), (0.9, 64)]:
        b, r = lsh_plan(threshold, n_perm)
        assert b * r <= n_perm
        knee = (1.0 / b) ** (1.0 / r)
        assert abs(knee - threshold) < 0.15
        # amplification: well-above-threshold pairs are near-certain
        # candidates, well-below pairs are unlikely ones
        assert lsh_collision_prob(min(threshold + 0.2, 0.99), b, r) > 0.5
        assert lsh_collision_prob(max(threshold - 0.3, 0.01), b, r) < 0.5

    with _pytest.raises(ValueError):
        lsh_plan(0.0, 8)
    with _pytest.raises(ValueError):
        lsh_plan(0.5, 0)


def test_embedding_cosine_or_amplification_recall(spark, sf_dir):
    """OR-amplification contract (VERDICT r03 item 6): with the exact
    within-label pair set as ground truth, n_tables=k's output is a
    SUBSET of n_tables=k+1's (a pair colliding in any of the first k
    tables still collides among k+1), every emitted pair is exact-correct
    (subset of ground truth with identical cosines), and recall rises
    monotonically — strictly somewhere on this corpus — as tables are
    added, without switching to IVF."""
    from pyspark.sql import functions as F

    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.dedup import embedding_cosine_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    thr = 0.2  # below the gate threshold for a denser ground-truth set
    e = emb.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("e"))
    a = e.select(F.col("vec_id").alias("v1"), "label", F.col("e").alias("e1"))
    b = e.select(F.col("vec_id").alias("v2"), "label", F.col("e").alias("e2"))
    dot = F.aggregate(
        F.zip_with("e1", "e2", lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )
    exact = {
        (r["v1"], r["v2"]): r["cosine"]
        for r in (
            a.join(b, "label")
            .filter(F.col("v1") < F.col("v2"))
            .withColumn("cosine", F.round(dot / (nrm(F.col("e1")) * nrm(F.col("e2"))), 4))
            .filter(F.col("cosine") >= thr)
        ).collect()
    }
    assert exact, "ground truth must be non-empty for the recall check"

    got = {}
    for k in (1, 2, 4):
        got[k] = {
            (r["v1"], r["v2"]): r["cosine"]
            for r in embedding_cosine_pairs(
                emb, threshold=thr, n_bits=5, n_tables=k
            ).collect()
        }
        # soundness: LSH only prunes, never invents or corrupts a pair
        assert set(got[k]) <= set(exact)
        for pair, cos in got[k].items():
            assert cos == exact[pair]
    assert set(got[1]) <= set(got[2]) <= set(got[4])
    recalls = {k: len(v) / len(exact) for k, v in got.items()}
    assert recalls[1] <= recalls[2] <= recalls[4]
    assert recalls[4] > recalls[1], recalls  # amplification actually bites


# ---------------------------------------------------------------------------
# Candidate-volume linearity at 10x corpus scale (VERDICT r06 item 5).
#
# The 100-TB claim for the MinHash-LSH path is that banded candidate
# generation stays O(dup_rate * n): band keys of unrelated docs collide
# rarely, so candidate volume tracks the planted duplicate count, not n^2.
# Until now that rested on the sf0.01 -> sf0.1 pair (5k -> 50k shingled
# rows); this synthesizes a 10x corpus with a CONTROLLED duplicate rate and
# pins candidates <= c * docs with the same c at both scales.


def _stress_corpus(spark, sf_dir, mult):
    """mult-x corpus from the sf documents table: each base doc becomes
    `mult` replicas whose every token carries a replica prefix (replicas of
    one base share NO trigram shingles, so scaling up adds documents, not
    duplicates), and exactly one replica per base gets a planted near-dup
    (one mid-token mutated -> jaccard ~0.9 against its source).

    Returns (docs_df, planted) where planted is the list of (src, dup)
    doc_id pairs the pipeline is expected to recover. The planted-dup rate
    is 1-in-10 replicas at every mult, so the per-doc candidate rate c is
    directly comparable across scales.
    """
    base = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    rows, planted = [], []
    dup_off = 10**9
    for i, text in base:
        words = text.split()
        for r in range(mult):
            did = i * mult + r
            body = [f"r{r}x{w}" for w in words]
            rows.append((did, " ".join(body)))
            # fixed 1-in-10 planting rate at EVERY mult — the linearity pin
            # compares per-doc candidate rates across scales, so the planted
            # dup rate must be scale-invariant
            if did % 10 == 0 and len(body) >= 6:
                mut = list(body)
                mut[len(mut) // 2] = "zzplantedmutation"
                rows.append((dup_off + did, " ".join(mut)))
                planted.append((did, dup_off + did))
    return spark.createDataFrame(rows, "doc_id long, text string"), planted


def _banded_candidates(docs):
    from apache_jira_scraper_spark.operators.dedup import _band_rows, build_dedup_index

    sh, sig = build_dedup_index(docs)
    br = _band_rows(sig)
    cand = (
        br.select(F.col("doc_id").alias("d1"), "bidx", "bk")
        .join(br.select(F.col("doc_id").alias("d2"), "bidx", "bk"), ["bidx", "bk"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    return sh, cand


def test_candidate_volume_linear_at_10x(spark, sf_dir):
    from apache_jira_scraper_spark.operators.dedup import (
        LSH_VERIFY_THRESHOLD,
        _verify_jaccard,
        connected_components,
    )
    from apache_jira_scraper_spark.plans.inspect import operator_counts, physical_plan

    stats = {}
    for mult in (1, 10):
        docs, planted = _stress_corpus(spark, sf_dir, mult)
        n_docs = docs.count()
        sh, cand = _banded_candidates(docs)

        # scale shape: candidate generation is a pure banded equi-join —
        # no cartesian/BNLJ fallback, and under threshold=-1 no broadcast
        # survives (nothing in this pipeline carries a forced hint)
        ops = operator_counts(cand)
        assert "CartesianProduct" not in ops, ops
        assert "BroadcastNestedLoopJoin" not in ops, ops
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = physical_plan(cand, "simple")
            assert "BroadcastExchange" not in plan, plan[:1500]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

        n_cand = cand.count()
        stats[mult] = {"docs": n_docs, "cand": n_cand, "c": n_cand / n_docs}

        if mult == 10:
            # end-to-end at the 10x scale: verify -> clusters recovers the
            # planted pairs (fixed HASH_PARAMS make this deterministic)
            verified = _verify_jaccard(sh, cand, ordered=True)
            got = {
                (r["d1"], r["d2"])
                for r in verified.filter(
                    F.col("jaccard") >= LSH_VERIFY_THRESHOLD
                ).collect()
            }
            hit = sum(1 for p in planted if p in got)
            recall = hit / len(planted)
            assert recall >= 0.9, (hit, len(planted))
            comp = connected_components(verified.select("d1", "d2"))
            cid = {r["doc_id"]: r["cluster_id"] for r in comp.collect()}
            # >= hit: a planted pair can also land in one component
            # transitively (src—third-doc—dup) without being a directly
            # verified edge
            same = sum(
                1 for a, b in planted if a in cid and b in cid and cid[a] == cid[b]
            )
            assert same >= hit, (same, hit)
            stats[mult]["recall"] = recall

    # the linearity pin: same per-doc candidate rate at 1x and 10x (the
    # planted rate is ~1 dup per base doc-group at both scales; accidental
    # band collisions must not grow superlinearly). 1.5x headroom absorbs
    # collision noise without letting an O(n^2) regression through (which
    # would show up as c growing ~10x).
    c1, c10 = stats[1]["c"], stats[10]["c"]
    assert c10 <= 1.5 * max(c1, 0.05), stats
    print(f"STRESS_STATS {stats}")
