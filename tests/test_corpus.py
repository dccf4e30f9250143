"""Corpus-assembly operators (split / packing): DuckDB-oracle parity plus
the semantic properties that make them safe at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_jira_scraper_spark.io import load_table
from apache_jira_scraper_spark.operators.corpus import (
    PACK_SUMMARY_SQL,
    SEQ_BUDGET_TOKENS,
    SPLIT_COUNTS_SQL,
    deterministic_split,
    pack_sequences,
    pack_summary,
    split_counts,
)
from tests.oracle_utils import assert_matches_oracle


def test_split_counts_match_oracle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert_matches_oracle(split_counts(docs), SPLIT_COUNTS_SQL, sf_dir, name="split_counts")


def test_split_is_stable_under_corpus_growth(spark, sf_dir):
    """A document's split must not change when other documents disappear —
    the contamination-control property hash assignment buys."""
    docs = load_table(spark, sf_dir, "documents")
    full = {r["doc_id"]: r["split"] for r in deterministic_split(docs).collect()}
    half = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(docs.filter(F.col("doc_id") % 2 == 0)).collect()
    }
    assert half == {k: v for k, v in full.items() if k % 2 == 0}


def test_split_covers_and_partitions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = deterministic_split(docs)
    assert out.count() == docs.count()
    assert set(r["split"] for r in out.select("split").distinct().collect()) <= {
        "train",
        "val",
        "test",
    }


def test_pack_summary_matches_oracle(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert_matches_oracle(pack_summary(docs), PACK_SUMMARY_SQL, sf_dir, name="pack_summary")


def test_packing_fills_sequences(spark, sf_dir):
    """Every sequence except each shard's tail must start at least a full
    budget's worth of tokens minus one straddling document; equivalently,
    a doc starts in seq k+1 only once seq k's cumulative fill passed the
    budget. Check the per-shard invariant: token starts are monotone in
    seq order and each non-tail sequence's cumulative fill >= budget."""
    docs = load_table(spark, sf_dir, "documents")
    rows = pack_summary(docs).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["seq_id"] >> 40, []).append(r)
    for shard, seqs in by_shard.items():
        seqs.sort(key=lambda r: r["seq_id"])
        for r in seqs[:-1]:
            assert r["tokens_started"] >= 1
        # non-tail sequences: the NEXT sequence exists, so the cut fired —
        # cumulative fill through this sequence reached its budget boundary
        total = 0
        for i, r in enumerate(seqs):
            total += r["tokens_started"]
            if i < len(seqs) - 1:
                assert total >= (r["seq_id"] & ((1 << 40) - 1)) * SEQ_BUDGET_TOKENS


def test_pack_ids_unique_per_doc(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs)
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()


def test_split_plan_is_narrow(spark, sf_dir):
    """Zero exchanges: the split must never shuffle."""
    from apache_jira_scraper_spark.plans.inspect import operator_counts

    docs = load_table(spark, sf_dir, "documents")
    ops = operator_counts(deterministic_split(docs))
    assert ops.get("Exchange", 0) == 0, ops


def test_pack_plan_single_shard_exchange(spark, sf_dir):
    """Exactly ONE exchange (the hash-shard partitioning for the window) —
    a global-order window would show a single-partition sort instead."""
    from apache_jira_scraper_spark.plans.inspect import operator_counts

    docs = load_table(spark, sf_dir, "documents")
    ops = operator_counts(pack_sequences(docs))
    assert ops.get("Exchange", 0) == 1, ops
    assert ops.get("Window", 0) == 1, ops


def test_contamination_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.operators.corpus import (
        contamination_sql,
        cross_split_contamination,
    )

    assert_matches_oracle(
        cross_split_contamination(spark, sf_dir),
        contamination_sql(),
        sf_dir,
        name="cross_split_contamination",
    )


def test_remove_boilerplate_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.operators.corpus import (
        REMOVE_BOILERPLATE_SQL,
        remove_boilerplate,
    )

    docs = load_table(spark, sf_dir, "documents")
    assert_matches_oracle(
        remove_boilerplate(docs), REMOVE_BOILERPLATE_SQL, sf_dir,
        name="remove_boilerplate",
    )


def test_remove_boilerplate_drops_hot_sentences(spark):
    """A sentence repeated across >max_df docs disappears everywhere;
    unique sentences survive in original order."""
    from apache_jira_scraper_spark.operators.corpus import remove_boilerplate

    rows = [(i, f"unique {i}. SHARED FOOTER. tail {i}") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["clean_text"] for r in remove_boilerplate(docs, max_df=3).collect()}
    assert out == {i: f"unique {i}. tail {i}" for i in range(4)}


def test_build_training_corpus_end_to_end(spark, sf_dir):
    """The composed pipeline: output is a subset of the corpus, free of
    exact duplicates and of non-canonical near-dup cluster members, with
    every surviving doc carrying a split and a packed sequence id."""
    from pyspark.sql import functions as F

    from apache_jira_scraper_spark.operators.corpus import build_training_corpus
    from apache_jira_scraper_spark.operators.dedup import q_dedup_clusters
    from apache_jira_scraper_spark.operators.text import q_quality_score

    out = build_training_corpus(spark, sf_dir).collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids)) > 0

    # no non-canonical near-dup member survives
    losers = {
        r["doc_id"]
        for r in q_dedup_clusters(spark, sf_dir).collect()
        if r["doc_id"] != r["cluster_id"]
    }
    assert not losers & set(ids)

    # every survivor meets the quality bar
    q = {
        r["doc_id"]: r["quality_score_bp"]
        for r in q_quality_score(spark, sf_dir).collect()
    }
    assert all(q[i] >= 5000 for i in ids)

    # split and packing are total over the output
    assert all(r["split"] in ("train", "val", "test") and r["seq_id"] >= 0 for r in out)


def test_deterministic_sample_stable_nested_and_oracle(spark, sf_dir):
    """Membership must be a pure function of the key (stable under corpus
    growth), samples at increasing rates must be NESTED, and the hash gate
    must replicate exactly in DuckDB SQL."""
    from pyspark.sql import functions as F

    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.corpus import deterministic_sample
    from tests.oracle_utils import assert_matches_oracle

    docs = load_table(spark, sf_dir, "documents")
    s10 = {r["doc_id"] for r in deterministic_sample(docs, 100_000).select("doc_id").collect()}
    s50 = {r["doc_id"] for r in deterministic_sample(docs, 500_000).select("doc_id").collect()}
    assert s10 < s50  # nested and strictly growing
    n = docs.count()
    assert 0 < len(s10) < len(s50) < n
    # stability: sampling a half-corpus yields exactly the intersection
    half = docs.filter(F.col("doc_id") % 2 == 0)
    s10_half = {
        r["doc_id"] for r in deterministic_sample(half, 100_000).select("doc_id").collect()
    }
    assert s10_half == {d for d in s10 if d % 2 == 0}
    # decorrelation: a salted draw at the same rate is a different set
    salted = {
        r["doc_id"]
        for r in deterministic_sample(docs, 100_000, salt="v2").select("doc_id").collect()
    }
    assert salted != s10
    assert_matches_oracle(
        deterministic_sample(docs, 100_000).select("doc_id").orderBy("doc_id"),
        """
        SELECT doc_id FROM documents
        WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              % 1000000 < 100000
        ORDER BY doc_id
        """,
        sf_dir,
        name="deterministic_sample",
    )


def test_stratified_sample_respects_per_stratum_rates(spark, sf_dir):
    """Each language stratum is sampled at its own rate; unlisted strata
    fall to default_ppm (drop)."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.corpus import (
        deterministic_sample,
        stratified_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    rates = {"en": 1_000_000, "de": 250_000}
    out = stratified_sample(docs, rates, strata_col="lang")
    got = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert got <= {"en", "de"}
    n_en = docs.filter("lang = 'en'").count()
    assert out.filter("lang = 'en'").count() == n_en  # rate 1.0 keeps all
    # the de stratum must equal the plain deterministic sample of that stratum
    de_direct = {
        r["doc_id"]
        for r in deterministic_sample(docs.filter("lang = 'de'"), 250_000)
        .select("doc_id")
        .collect()
    }
    de_strat = {r["doc_id"] for r in out.filter("lang = 'de'").select("doc_id").collect()}
    assert de_strat == de_direct


def test_eval_decontamination_exact_counts(spark):
    """Constructed corpus/eval overlap: shared-shingle and eval-doc-hit
    counts computed independently in Python must match exactly; clean docs
    and sub-3-token docs never surface."""
    from apache_jira_scraper_spark.operators.corpus import eval_decontamination

    def sh(text):
        t = text.split(" ")
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    docs_rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely unrelated training text with no overlap at all"),
        (3, "the quick brown cat sits still"),
        (4, "too short"),
    ]
    eval_rows = [
        (100, "the quick brown fox runs"),
        (101, "fox jumps over the lazy dog today"),
    ]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    evals = spark.createDataFrame(eval_rows, "eval_id long, text string")
    got = {
        r["doc_id"]: (r["n_shared_shingles"], r["n_eval_docs_hit"])
        for r in eval_decontamination(docs, evals).collect()
    }
    eval_sh = {eid: sh(t) for eid, t in eval_rows}
    exp = {}
    for did, t in docs_rows:
        shared = {s for s in sh(t) if any(s in es for es in eval_sh.values())}
        hits = sum(1 for es in eval_sh.values() if es & sh(t))
        if shared:
            exp[did] = (len(shared), hits)
    assert got == exp
    assert 1 in got and 3 in got and 2 not in got and 4 not in got
    # min_shared thresholding prunes the weak hit
    strict = {
        r["doc_id"]
        for r in eval_decontamination(docs, evals, min_shared=got[1][0]).collect()
    }
    assert strict == {1}


def test_chunk_documents_constructed_values(spark):
    """Window arithmetic on hand-sized docs: short doc -> one chunk; exact
    boundary -> one chunk; one-past-boundary -> short tail window; overlap
    tokens repeat between consecutive chunks."""
    from apache_jira_scraper_spark.operators.corpus import chunk_documents

    words = lambda n: " ".join(f"w{i}" for i in range(n))  # noqa: E731
    docs = spark.createDataFrame(
        [(1, words(3)), (2, words(4)), (3, words(5)), (4, words(10))],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [r["n_chunk_tokens"] for r in by_doc[1]] == [3]
    assert [r["n_chunk_tokens"] for r in by_doc[2]] == [4]
    # n=5, stride=3: [w0..w3], [w3, w4]
    assert [r["chunk_text"] for r in by_doc[3]] == ["w0 w1 w2 w3", "w3 w4"]
    # n=10: starts 0,3,6 -> windows [0..3],[3..6],[6..9]; last token covered
    assert [r["chunk_text"] for r in by_doc[4]] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9",
    ]
    # overlap: last token of chunk k == first token of chunk k+1
    for rows in by_doc.values():
        for a, b in zip(rows, rows[1:]):
            assert a["chunk_text"].split()[-1] == b["chunk_text"].split()[0]


def test_chunk_documents_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.operators.corpus import (
        chunk_documents,
        chunk_documents_sql,
    )

    assert_matches_oracle(
        chunk_documents(load_table(spark, sf_dir, "documents")),
        chunk_documents_sql(),
        sf_dir,
        name="chunk_documents",
    )


def test_chunk_documents_plan_is_narrow(spark, sf_dir):
    """Chunking must stay a zero-shuffle explode: no Exchange below the
    final presentation sort."""
    from apache_jira_scraper_spark.operators.corpus import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        chunk_documents(docs)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    body = plan.split("Sort", 1)[-1]
    assert "Exchange" not in body and "Repartition" not in body


from apache_jira_scraper_spark.operators.corpus import (
    GATE_MIX_BUDGET as MIX_BUDGET,
    GATE_MIX_WEIGHTS as MIX_WEIGHTS,
)


def test_mix_summary_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.operators.corpus import mix_summary, mix_summary_sql

    assert_matches_oracle(
        mix_summary(load_table(spark, sf_dir, "documents"), MIX_WEIGHTS, MIX_BUDGET),
        mix_summary_sql(MIX_WEIGHTS, MIX_BUDGET),
        sf_dir,
        name="mix_summary",
    )


def test_mix_corpus_semantics(spark, sf_dir):
    """Kept token mass per source tracks budget*weight (within one doc's
    tokens of the target at the hash gate's resolution); unlisted sources
    are dropped entirely; mixes are NESTED across budgets."""
    from apache_jira_scraper_spark.operators.corpus import mix_corpus

    docs = load_table(spark, sf_dir, "documents")
    small = mix_corpus(docs, MIX_WEIGHTS, MIX_BUDGET)
    kept_sources = {r["source"] for r in small.select("source").distinct().collect()}
    assert kept_sources <= set(MIX_WEIGHTS)

    big = mix_corpus(docs, MIX_WEIGHTS, MIX_BUDGET * 5)
    small_ids = {r["doc_id"] for r in small.select("doc_id").collect()}
    big_ids = {r["doc_id"] for r in big.select("doc_id").collect()}
    assert small_ids <= big_ids

    # an over-asked source caps at keeping everything rather than renormalizing
    all_src0 = docs.filter(F.col("source") == "src0").count()
    huge = mix_corpus(docs, {"src0": 1_000_000}, 10**9)
    assert huge.count() == all_src0


def test_temperature_weights_math():
    """alpha=1 -> natural token proportions; alpha=0 -> uniform; alpha in
    between up-samples the tail; ppm weights sum EXACTLY to 1e6."""
    from apache_jira_scraper_spark.operators.corpus import temperature_weights

    totals = {"web": 800_000, "code": 150_000, "ref": 50_000}
    nat = temperature_weights(totals, alpha=1.0)
    assert sum(nat.values()) == 1_000_000
    assert nat["web"] == 800_000 and nat["ref"] == 50_000

    uni = temperature_weights(totals, alpha=0.0)
    assert sum(uni.values()) == 1_000_000
    assert max(uni.values()) - min(uni.values()) <= 1  # largest-remainder split

    mid = temperature_weights(totals, alpha=0.5)
    assert sum(mid.values()) == 1_000_000
    # tail source gains weight as alpha drops, head loses it
    assert nat["ref"] < mid["ref"] < uni["ref"]
    assert uni["web"] < mid["web"] < nat["web"]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_weights(totals, alpha=-0.1)
    assert temperature_weights({}, alpha=0.5) == {}


def test_temperature_weights_zero_token_sources():
    """Empty sources get NO ppm budget at any alpha (at alpha=0 Python's
    0.0**0 == 1.0 would otherwise hand them a full uniform share), and an
    all-empty dict returns {} instead of ZeroDivisionError."""
    from apache_jira_scraper_spark.operators.corpus import temperature_weights

    totals = {"web": 900_000, "code": 100_000, "ghost": 0}
    for alpha in (0.0, 0.3, 1.0):
        w = temperature_weights(totals, alpha=alpha)
        assert "ghost" not in w
        assert sum(w.values()) == 1_000_000
    # with ghost dropped, alpha=0 splits uniformly across the REAL sources
    uni = temperature_weights(totals, alpha=0.0)
    assert uni == {"web": 500_000, "code": 500_000}
    assert temperature_weights({"a": 0, "b": 0}, alpha=0.5) == {}


def test_mix_corpus_temperature_membership(spark, sf_dir):
    """The temperature path is EXACTLY mix_corpus under the derived
    weights (one shared totals pass, same hash gate), and the derived
    weights feed mix_summary_sql for a DuckDB-checked summary."""
    from apache_jira_scraper_spark.operators.corpus import (
        mix_corpus,
        mix_corpus_temperature,
        mix_summary,
        mix_summary_sql,
        source_token_totals,
        temperature_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    mixed, weights = mix_corpus_temperature(docs, alpha=0.5, budget_tokens=MIX_BUDGET)
    assert weights == temperature_weights(source_token_totals(docs), 0.5)
    direct = mix_corpus(docs, weights, MIX_BUDGET)
    got = {r["doc_id"] for r in mixed.select("doc_id").collect()}
    want = {r["doc_id"] for r in direct.select("doc_id").collect()}
    assert got == want and got

    assert_matches_oracle(
        mix_summary(docs, weights, MIX_BUDGET),
        mix_summary_sql(weights, MIX_BUDGET),
        sf_dir,
        name="mix_summary_temperature",
    )


def test_build_training_corpus_optional_stages(spark, sf_dir):
    """redact_pii must not change WHICH docs survive (only their text);
    mixing must drop unlisted sources and subset the unmixed survivors."""
    from apache_jira_scraper_spark.operators.corpus import build_training_corpus

    plain = build_training_corpus(spark, sf_dir)
    plain_ids = {r["doc_id"] for r in plain.select("doc_id").collect()}

    red = build_training_corpus(spark, sf_dir, redact_pii=True)
    assert {r["doc_id"] for r in red.select("doc_id").collect()} == plain_ids

    mixed = build_training_corpus(
        spark, sf_dir,
        mix_weights_ppm={"src0": 600_000, "src1": 400_000},
        mix_budget_tokens=5_000,
    )
    mixed_ids = {r["doc_id"] for r in mixed.select("doc_id").collect()}
    assert mixed_ids <= plain_ids and len(mixed_ids) < len(plain_ids)


def test_write_corpus_layout(spark, sf_dir, tmp_path):
    """Partition dirs per split; rows within each file sorted by
    (seq_id, doc_id); full round-trip equality."""
    import os

    from apache_jira_scraper_spark.operators.corpus import (
        build_training_corpus,
        write_corpus,
    )

    corpus = build_training_corpus(spark, sf_dir)
    out = str(tmp_path / "corpus")
    write_corpus(corpus, out)

    dirs = {d for d in os.listdir(out) if d.startswith("split=")}
    assert dirs == {"split=train", "split=val", "split=test"}

    back = spark.read.parquet(out)
    orig = {tuple(r) for r in corpus.collect()}
    got = {tuple(r) for r in back.select(*corpus.columns).collect()}
    assert got == orig

    import pyarrow.parquet as pq

    for d in dirs:
        for f in os.listdir(f"{out}/{d}"):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(f"{out}/{d}/{f}", columns=["seq_id", "doc_id"])
            rows = list(zip(t["seq_id"].to_pylist(), t["doc_id"].to_pylist()))
            assert rows == sorted(rows), f"{d}/{f} not sorted"


def test_read_training_sequences_round_trip(spark, sf_dir, tmp_path):
    """write_corpus -> read_training_sequences closes the loop: every
    sequence reassembles its docs in doc_id order with the right token
    mass, and the concatenated text matches a driver-side reconstruction."""
    from apache_jira_scraper_spark.operators.corpus import (
        build_training_corpus,
        read_training_sequences,
        write_corpus,
    )

    corpus = build_training_corpus(spark, sf_dir)
    out = str(tmp_path / "corpus_rt")
    write_corpus(corpus, out)

    docs = load_table(spark, sf_dir, "documents")
    seqs = read_training_sequences(spark, out, text_source=docs)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assign = {}
    for r in corpus.collect():
        assign.setdefault((r["split"], r["seq_id"]), []).append(
            (r["doc_id"], r["n_tokens"])
        )
    got = {(r["split"], r["seq_id"]): r for r in seqs.collect()}
    assert set(got) == set(assign)
    for key, members in assign.items():
        members.sort()
        r = got[key]
        assert r["n_docs"] == len(members)
        assert r["seq_tokens"] == sum(n for _, n in members)
        assert r["text"] == " ".join(texts[d] for d, _ in members)


def test_packed_sequences_pack_within_split(spark, sf_dir):
    """Pack-within-split invariant, recomputed independently: for every
    (split, shard) the cut index of each doc must equal the cumsum formula
    over THAT SPLIT's docs alone — the pre-fix pack-then-join layout
    (sequences straddling train/test, leaking eval text into training
    sequences) fails this reconstruction."""
    from apache_jira_scraper_spark.operators.corpus import (
        SEQ_BUDGET_TOKENS,
        build_training_corpus,
    )

    rows = build_training_corpus(spark, sf_dir).collect()
    by_group: dict[tuple, list] = {}
    for r in rows:
        shard = r["seq_id"] >> 40
        by_group.setdefault((r["split"], shard), []).append(r)
    assert len(by_group) > 1
    for (split, shard), members in by_group.items():
        members.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in members:
            cum += r["n_tokens"]
            expect_cut = (cum - r["n_tokens"]) // SEQ_BUDGET_TOKENS
            assert r["seq_id"] == (shard << 40) + expect_cut, (split, shard, r)


def test_mix_rate_arithmetic_exact_beyond_double():
    """The oracle's rate_ppm must use HUGEINT integer division: the old
    FLOOR(double) form loses integers above 2^53, where budget*weight_ppm
    lives at frontier token budgets (9e15 tokens * 1e6 ppm)."""
    import duckdb

    from apache_jira_scraper_spark.operators.corpus import mix_summary_sql

    sql = mix_summary_sql({"src0": 1}, 9007199254740993)
    rates_leg = sql.split("rates AS", 1)[1]
    assert "HUGEINT" in rates_leg and "//" in rates_leg
    # the exact quotient 2^53+1 is unrepresentable as a double; HUGEINT //
    # preserves it where FLOOR(x/1.0) rounds to 2^53
    got = duckdb.sql(
        "SELECT CAST(CAST(9007199254740993 AS HUGEINT) * 1 // 1 AS BIGINT)"
    ).fetchone()[0]
    assert got == 9007199254740993
    lossy = duckdb.sql(
        "SELECT CAST(FLOOR(CAST(9007199254740993 AS BIGINT) * 1 / 1) AS BIGINT)"
    ).fetchone()[0]
    assert lossy != 9007199254740993  # documents why the double form is wrong


def test_chunk_documents_unordered_is_exchange_free(spark, sf_dir):
    """ordered=False must leave ZERO exchanges — the chunker is a pure
    narrow map, and composed pipelines skip the presentation sort."""
    from apache_jira_scraper_spark.operators.corpus import chunk_documents
    from apache_jira_scraper_spark.plans.inspect import operator_counts

    docs = load_table(spark, sf_dir, "documents")
    ops = operator_counts(chunk_documents(docs, ordered=False))
    assert ops.get("Exchange", 0) == 0, ops
    # same rows either way
    assert chunk_documents(docs, ordered=False).count() == chunk_documents(docs).count()


def test_corpus_report_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.operators.corpus import (
        corpus_report,
        corpus_report_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    assert_matches_oracle(
        corpus_report(docs), corpus_report_sql(), sf_dir, name="corpus_report"
    )


def test_corpus_report_internal_consistency(spark, sf_dir):
    """Every section's doc/token mass must sum to the total leg."""
    from apache_jira_scraper_spark.operators.corpus import corpus_report

    rows = corpus_report(load_table(spark, sf_dir, "documents")).collect()
    by_sec: dict[str, tuple[int, int]] = {}
    for r in rows:
        d, t = by_sec.get(r["section"], (0, 0))
        by_sec[r["section"]] = (d + r["n_docs"], t + r["n_tokens"])
    total = by_sec.pop("total")
    assert total[0] > 0
    for sec, sums in by_sec.items():
        assert sums == total, (sec, sums, total)


def test_domain_cards_composition(spark, sf_dir):
    """The discovered-domain section partitions exactly the docs that
    carry an embedding: per-cell doc/token mass sums to the joined
    corpus totals, keys are distinct cell ids within [0, IVF_EXACT_K),
    and more than one domain is actually discovered (a single-cell
    degenerate quantizer would certify nothing)."""
    from apache_jira_scraper_spark.operators.corpus import domain_cards
    from apache_jira_scraper_spark.operators.ivf import IVF_EXACT_K
    from apache_jira_scraper_spark.operators.similarity import _emb

    docs = load_table(spark, sf_dir, "documents")
    emb = _emb(spark, sf_dir)
    rows = domain_cards(docs, emb).collect()
    keys = [int(r["key"]) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(0 <= c < IVF_EXACT_K for c in keys)
    assert len(keys) > 1
    joined = docs.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id"
    ).select(F.size(F.split("text", " ")).alias("nt"))
    n_docs = joined.count()
    assert sum(r["n_docs"] for r in rows) == n_docs > 0
    assert sum(r["n_tokens"] for r in rows) == joined.agg(F.sum("nt")).first()[0]


def test_corpus_report_single_scan_and_empty_input(spark, sf_dir):
    """GROUPING SETS form: ONE scan + ONE exchange (the 4-way union of
    groupBys recomputed the tokenize/score projection per leg); an empty
    corpus yields an empty report in BOTH engines."""
    from apache_jira_scraper_spark.operators.corpus import corpus_report
    from apache_jira_scraper_spark.plans.inspect import operator_counts

    docs = load_table(spark, sf_dir, "documents")
    ops = operator_counts(corpus_report(docs))
    assert ops.get("Scan", 0) == 1, ops
    assert ops.get("Exchange", 0) <= 2, ops  # grouping agg + final sort

    empty = spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    assert corpus_report(empty).collect() == []


def test_build_corpus_cluster_survives_when_keeper_fails_quality(spark, sf_dir):
    """r04 review fix: a near-dup cluster whose RAW canonical (min doc_id)
    fails the quality gate must still be represented by its best surviving
    member — the old cluster_id-based canonicalization dropped the keeper
    via quality AND every other member as a 'loser', erasing the cluster's
    content entirely. At min_quality_bp=5200 the sf0.001 corpus has exactly
    such a cluster (6000 exercises it at sf0.01); assert every cluster
    with >= 1 quality+exact survivor contributes exactly one kept doc
    (the min surviving id)."""
    from pyspark.sql import functions as F

    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.corpus import build_training_corpus
    from apache_jira_scraper_spark.operators.dedup import q_dedup_clusters
    from apache_jira_scraper_spark.operators.text import q_quality_score

    thr = 5200 if sf_dir.rstrip('/').endswith('sf0.001') else 6000
    out_ids = {
        r["doc_id"] for r in build_training_corpus(spark, sf_dir, min_quality_bp=thr).collect()
    }

    docs = load_table(spark, sf_dir, "documents")
    quality = {
        r["doc_id"]
        for r in q_quality_score(spark, sf_dir)
        .filter(F.col("quality_score_bp") >= thr)
        .collect()
    }
    exact = {
        r["doc_id"]
        for r in docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    survivors = quality & exact
    clusters = {}
    for r in q_dedup_clusters(spark, sf_dir).collect():
        clusters.setdefault(r["cluster_id"], []).append(r["doc_id"])

    keeper_failed_somewhere = False
    for cid, members in clusters.items():
        surviving = sorted(m for m in members if m in survivors)
        kept_here = [m for m in members if m in out_ids]
        if surviving:
            # exactly one representative: the min SURVIVING member
            assert kept_here == [surviving[0]], (cid, surviving, kept_here)
            if surviving[0] != cid:
                keeper_failed_somewhere = True
        else:
            assert kept_here == [], (cid, kept_here)
    # the corpus must actually exercise the fixed case at this threshold
    assert keeper_failed_somewhere
