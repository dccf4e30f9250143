"""Text-family coverage for the library operators that no longer hold their
own driver slot. q_doc_clean's gate (doc_clean_text) was folded into
doc_stats in round 3 to free a registry slot for corpus_assembly — the
standalone operator keeps oracle parity HERE so the F1 truncation contract
(+3 ellipsis, whitespace normalization) can't silently rot.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_jira_scraper_spark.operators.text import DOC_CLEAN_SQL, q_doc_clean
from tests.oracle_utils import assert_matches_oracle


def test_doc_clean_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        q_doc_clean(spark, sf_dir), DOC_CLEAN_SQL, sf_dir, name="doc_clean"
    )


def test_bpe_token_count_matches_oracle(spark, sf_dir):
    """Standalone BPE piece-count operator: its gate merged into doc_stats
    in r05, so the library-level oracle parity is pinned here."""
    from apache_jira_scraper_spark.operators.text import BPE_TOKEN_SQL, q_bpe_token_count

    assert_matches_oracle(
        q_bpe_token_count(spark, sf_dir), BPE_TOKEN_SQL, sf_dir, name="bpe_token_count"
    )


def test_repetition_signals_match_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import (
        REPETITION_SQL,
        repetition_signals,
    )

    assert_matches_oracle(
        repetition_signals(load_table(spark, sf_dir, "documents")),
        REPETITION_SQL,
        sf_dir,
        name="repetition_signals",
    )


def test_repetition_signals_constructed_values(spark):
    """A maximally repetitive doc vs a fully distinct one, plus the 1-token
    edge where Spark's sequence(1, 0) would emit a bogus descending range."""
    from apache_jira_scraper_spark.operators.text import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # one bigram repeated 3x
            (2, "all words fully distinct here"),
            (3, "x"),                             # no bigrams at all
            (4, "a b. a b. c d"),                 # duplicate sentence
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_signals(docs).collect()}
    assert got[1]["dup_token_ppm"] == (4 - 1) * 1_000_000 // 4
    assert got[1]["top_bigram_ppm"] == 1_000_000  # every bigram is "spam spam"
    assert got[2]["dup_token_ppm"] == 0
    assert got[2]["top_bigram_ppm"] == 1_000_000 // 4
    assert got[3]["top_bigram_ppm"] == 0 and got[3]["dup_token_ppm"] == 0
    assert got[4]["dup_sent_ppm"] == (3 - 2) * 1_000_000 // 3


def test_build_vocab_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import build_vocab, build_vocab_sql

    assert_matches_oracle(
        build_vocab(load_table(spark, sf_dir, "documents"), vocab_size=50),
        build_vocab_sql(vocab_size=50),
        sf_dir,
        name="build_vocab",
    )


def test_build_vocab_constructed_values(spark):
    from apache_jira_scraper_spark.operators.text import build_vocab

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "aa cc7 bb")], "doc_id long, text string"
    )
    got = [(r["rank"], r["piece"], r["n_occ"]) for r in build_vocab(docs, 10).collect()]
    # pieces: "aa", " bb", " aa", "aa", " cc", "7", " bb" -> counts:
    # " bb":2, "aa":2, " aa":1, " cc":1, "7":1 (count desc, piece asc)
    assert got == [
        (1, " bb", 2), (2, "aa", 2), (3, " aa", 1), (4, " cc", 1), (5, "7", 1),
    ]


def test_build_vocab_plan_top_k(spark, sf_dir):
    """Global top-k must plan as TakeOrderedAndProject, not a full sort."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import build_vocab

    docs = load_table(spark, sf_dir, "documents")
    plan = build_vocab(docs, 50)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_unigram_logprob_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import (
        UNIGRAM_LOGPROB_SQL,
        unigram_logprob,
    )

    assert_matches_oracle(
        unigram_logprob(load_table(spark, sf_dir, "documents")),
        UNIGRAM_LOGPROB_SQL,
        sf_dir,
        name="unigram_logprob",
    )


def test_unigram_logprob_ranks_gibberish_low(spark):
    """A doc of corpus-frequent tokens must outscore a doc of hapaxes."""
    import math

    from apache_jira_scraper_spark.operators.text import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "the the the the"), (2, "zq1 zq2 zq3 zq4"), (3, "the the zq5 zq6")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["avg_logprob_en4"] for r in unigram_logprob(docs).collect()}
    assert got[1] > got[3] > got[2]
    # exact check for doc 1: p(the) = (6+1)/(12+7) -> round(ln(7/19)*1e4)
    assert got[1] == round(math.log(7 / 19) * 10_000)


def test_quality_threshold_sweep_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import (
        quality_threshold_sweep,
        quality_threshold_sweep_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    assert_matches_oracle(
        quality_threshold_sweep(docs),
        quality_threshold_sweep_sql(),
        sf_dir,
        name="quality_threshold_sweep",
    )


def test_quality_threshold_sweep_semantics(spark, sf_dir):
    """Cumulative curve: monotone non-increasing in the threshold; the
    loosest band keeps EVERY doc and 100% of tokens (ppm = 1e6)."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import quality_threshold_sweep

    docs = load_table(spark, sf_dir, "documents")
    rows = quality_threshold_sweep(docs).collect()
    assert rows
    assert rows[0]["n_docs_kept"] == docs.count()
    assert rows[0]["token_share_ppm"] == 1_000_000
    docs_kept = [r["n_docs_kept"] for r in rows]
    toks_kept = [r["n_tokens_kept"] for r in rows]
    assert docs_kept == sorted(docs_kept, reverse=True)
    assert toks_kept == sorted(toks_kept, reverse=True)


def test_encode_with_vocab_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import (
        build_vocab,
        encode_with_vocab,
        encode_with_vocab_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    vocab = build_vocab(docs, vocab_size=100)
    assert_matches_oracle(
        encode_with_vocab(docs, vocab),
        encode_with_vocab_sql(vocab_size=100),
        sf_dir,
        name="encode_with_vocab",
    )


def test_encode_with_vocab_semantics(spark):
    """Known text, constructed vocab: in-vocab pieces map to their rank in
    piece order, OOV pieces to unk, empty docs survive with []."""
    from apache_jira_scraper_spark.operators.text import encode_with_vocab

    docs = spark.createDataFrame(
        [(1, "aa bb aa zz"), (2, "")], "doc_id bigint, text string"
    )
    vocab = spark.createDataFrame(
        [(1, "aa"), (2, " aa"), (3, " bb"), (4, " zz_not_present")],
        "rank bigint, piece string",
    )
    out = {r["doc_id"]: (r["n_pieces"], list(r["ids"])) for r in encode_with_vocab(docs, vocab).collect()}
    # pretokenizer pieces of "aa bb aa zz": ["aa", " bb", " aa", " zz"]
    assert out[1] == (4, [1, 3, 2, 0])
    assert out[2] == (0, [])


def test_bm25_topk_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import bm25_topk, bm25_topk_sql

    docs = load_table(spark, sf_dir, "documents")
    assert_matches_oracle(
        bm25_topk(docs), bm25_topk_sql(), sf_dir, name="bm25_topk"
    )


def test_bm25_semantics(spark):
    """A query doc's top hit is the doc sharing its rare term, not the one
    sharing only a ubiquitous term (the idf property BM25 exists for)."""
    from apache_jira_scraper_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (0, "common zebra common common"),          # query
            (10, "common zebra other words here"),      # shares rare 'zebra'
            (11, "common common common filler filler"), # shares only 'common'
            (12, "entirely different tokens again yes"),
        ],
        "doc_id bigint, text string",
    )
    rows = bm25_topk(docs, n_queries=1, top_k=3).collect()
    assert [r["did"] for r in rows][0] == 10
    # doc 12 shares no term -> never a candidate
    assert 12 not in {r["did"] for r in rows}
    assert all(r["score_en4"] > 0 for r in rows)


def test_hybrid_rrf_topk_hand_computed(spark):
    """RRF fusion semantics on a hand-computed example: contributions are
    round(1e6/(60+rank)) per branch, summed where a doc appears in both,
    fused rank by score desc with did-asc tie-break."""
    from apache_jira_scraper_spark.operators.similarity import (
        hybrid_rrf_topk,
    )

    lex = spark.createDataFrame(
        [(0, 1, 100), (0, 2, 200), (0, 3, 300)],
        "qid long, rank long, did long",
    )
    sem = spark.createDataFrame(
        [(0, 1, 200), (0, 2, 400)], "qid long, rank long, nid long"
    )
    got = {
        (r["rank"], r["did"]): r["rrf_e6"]
        for r in hybrid_rrf_topk(lex, sem, top_k=4).collect()
    }
    c = {r: round(1_000_000 / (60 + r)) for r in (1, 2, 3)}
    # doc 200: lex rank 2 + sem rank 1; 100: lex 1; 400: sem 2; 300: lex 3
    assert got == {
        (1, 200): c[2] + c[1],
        (2, 100): c[1],
        (3, 400): c[2],
        (4, 300): c[3],
    }, got


def test_hybrid_gate_fusion_is_not_degenerate(spark, sf_dir):
    """Premise pin for the r10 bm25_topk gate rotation: the rrf leg must
    genuinely reorder relative to the lexical branch — measured 42/45/46
    of 50 slots at sf0.001/0.01/0.1, pinned at >= 60% so a partial
    degeneration of the embedding branch's contribution fails loudly
    (if it stopped contributing entirely, both gate sides could agree
    on a fusion that equals bm25 and the driver hash would stay green
    while certifying nothing)."""
    from apache_jira_scraper_spark.operators.text import q_bm25_topk

    rows = q_bm25_topk(spark, sf_dir).collect()
    bm = {(r["qid"], r["rank"]): r["did"] for r in rows if r["leg"] == "bm25"}
    rrf = {(r["qid"], r["rank"]): r["did"] for r in rows if r["leg"] == "rrf"}
    assert bm and rrf and set(bm) == set(rrf)
    diff = sum(1 for k in bm if bm[k] != rrf[k])
    assert diff >= len(bm) * 3 // 5, (
        f"fusion reordered only {diff}/{len(bm)} slots — embedding branch "
        "contribution degenerated (measured band: 42-46/50)"
    )


def test_bigram_logprob_matches_oracle(spark, sf_dir):
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import (
        BIGRAM_LOGPROB_SQL,
        bigram_logprob,
    )

    assert_matches_oracle(
        bigram_logprob(load_table(spark, sf_dir, "documents")),
        BIGRAM_LOGPROB_SQL,
        sf_dir,
        name="bigram_logprob",
    )


def test_bigram_logprob_hand_computed(spark):
    """Exact arithmetic on a corpus small enough to verify by hand, plus
    the fluency ordering unigrams cannot see: doc 4 reuses exactly doc 1's
    tokens but in a never-seen order, so its unigram stats match doc 1
    while its bigram score must fall strictly below."""
    import math

    from apache_jira_scraper_spark.operators.text import (
        bigram_logprob,
        unigram_logprob,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),  # bigrams: ab ba ab
            (2, "a b"),  # bigram: ab
            (3, "x"),  # no bigram -> (0, 0, 0)
            (4, "b a b a"),  # same tokens as 1, different order: ba ab ba
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    # corpus bigrams: doc1 ab,ba,ab; doc2 ab; doc4 ba,ab,ba
    # -> c(ab)=4, c(ba)=3; ctx(a)=c(ab)=4, ctx(b)=c(ba)=3; V=3 (a, b, x)
    lp_ab = round(math.log((4 + 1) / (4 + 3)) * 10_000)
    lp_ba = round(math.log((3 + 1) / (3 + 3)) * 10_000)
    assert (got[3]["n_bigrams"], got[3]["sum_logprob_en4"], got[3]["avg_logprob_en4"]) == (0, 0, 0)
    assert got[2]["n_bigrams"] == 1 and got[2]["sum_logprob_en4"] == lp_ab
    assert got[1]["n_bigrams"] == 3
    assert got[1]["sum_logprob_en4"] == 2 * lp_ab + lp_ba

    # the fluency case: tokens of 5 == tokens of 6, orders differ
    docs2 = spark.createDataFrame(
        [(5, "the cat sat on the mat"), (6, "mat the on sat cat the"),
         (7, "the cat sat on the mat")],
        "doc_id long, text string",
    )
    uni = {r["doc_id"]: r["avg_logprob_en4"] for r in unigram_logprob(docs2).collect()}
    bg = {r["doc_id"]: r["avg_logprob_en4"] for r in bigram_logprob(docs2).collect()}
    assert uni[5] == uni[6]  # unigram model is order-blind
    assert bg[5] > bg[6]  # the bigram model is not


def test_contamination_report_crafted(spark):
    """Independent reference on a crafted corpus (n=3 for readability):
    exact copy of an eval doc is fully contaminated, a doc sharing one
    3-gram is partially contaminated, a disjoint doc is clean, a
    too-short doc emits zeros instead of vanishing."""
    from apache_jira_scraper_spark.operators.text import contamination_report

    ev = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], "doc_id long, text string"
    )
    tr = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),     # exact copy: all 2 grams hit
            (2, "x alpha beta gamma y"),       # shares 'alpha beta gamma'
            (3, "p q r s t"),                  # disjoint: clean
            (4, "a b"),                        # < n tokens: zero grams
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in contamination_report(tr, ev, n=3).collect()
    }
    assert (got[1]["n_grams"], got[1]["n_contam"], got[1]["contaminated"]) == (2, 2, 1)
    assert got[1]["contam_ppm"] == 1_000_000
    assert (got[2]["n_grams"], got[2]["n_contam"], got[2]["contaminated"]) == (3, 1, 1)
    assert got[2]["contam_ppm"] == 1_000_000 // 3
    assert (got[3]["n_contam"], got[3]["contaminated"]) == (0, 0)
    assert (got[4]["n_grams"], got[4]["n_contam"], got[4]["contam_ppm"]) == (0, 0, 0)
    assert set(got) == {1, 2, 3, 4}  # every train doc surfaces, eval doc absent


def test_contamination_gate_leg_nonvacuous(spark, sf_dir):
    """The gate's mod-7 split must flag SOME but not ALL docs at the test
    SF (measured: 7/9/57 at sf0.001/0.01/0.1) — an all-zero or all-one
    leg would certify nothing (the r02 lesson)."""
    from apache_jira_scraper_spark.operators.text import (
        DECONTAM_EVAL_MOD,
        contamination_report,
    )
    from apache_jira_scraper_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    rep = contamination_report(
        docs.filter(F.col("doc_id") % DECONTAM_EVAL_MOD != 0),
        docs.filter(F.col("doc_id") % DECONTAM_EVAL_MOD == 0),
    )
    agg = rep.agg(
        F.sum("contaminated").alias("c"), F.count(F.lit(1)).alias("n")
    ).first()
    assert 0 < agg["c"] < agg["n"]


def test_pack_sequences_crafted(spark):
    """Independent check of the two-phase prefix sum: crafted token
    counts with a doc spanning a pack boundary, plus bucket-boundary
    doc_ids (4095/4096/4097) so the cross-bucket offset join is exercised
    for real, not just bucket 0."""
    from apache_jira_scraper_spark.operators.text import pack_sequences

    docs = spark.createDataFrame(
        [
            (0, "a " * 6),        # 7 tokens (trailing '' token) cum 0
            (1, "b " * 2),        # 3 tokens, cum 7 -> crosses 8-boundary
            (4095, "c"),          # 1 token, cum 10 (last doc of bucket 0)
            (4096, "d " * 4),     # 5 tokens, cum 11 (first doc of bucket 1)
            (4097, "e"),          # 1 token, cum 16 -> pack 2
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in pack_sequences(docs, context_len=8).collect()
    }
    exp = {
        # doc_id: (n_tokens, cum_start, pack_first, pack_last, n_packs)
        0: (7, 0, 0, 0, 1),
        1: (3, 7, 0, 1, 2),     # spans packs 0-1
        4095: (1, 10, 1, 1, 1),
        4096: (5, 11, 1, 1, 1),
        4097: (1, 16, 2, 2, 1),
    }
    for d, (nt, cs, pf, pl, np_) in exp.items():
        r = got[d]
        assert (
            r["n_tokens"], r["cum_start"], r["pack_first"],
            r["pack_last"], r["n_packs"],
        ) == (nt, cs, pf, pl, np_), d


def test_pack_sequences_no_global_single_partition_window(spark, sf_dir):
    """The scale contract: no unpartitioned window over the CORPUS — the
    executed plan's only non-partitioned window must consume the bucket
    partials (corpus/4096 rows). Pin: every Window node that has no
    partition spec sits above the bucket aggregate, never above the raw
    doc scan; cheapest robust proxy is that the plan contains at most one
    'Window' without 'bucket' in its partition args."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import pack_sequences

    df = pack_sequences(load_table(spark, sf_dir, "documents"))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    wins = [l for l in plan.splitlines() if re.search(r"\bWindow\b", l)]
    assert wins, "expected window nodes in the pack plan"
    unpartitioned = [l for l in wins if "bucket" not in l]
    # the global running sum over bucket PARTIALS is the only allowed
    # partition-free window; the per-doc cumsum must be bucket-partitioned
    assert len(unpartitioned) <= 1, plan


def test_trigram_backoff_matches_oracle(spark, sf_dir):
    """Cross-engine parity of the held-out stupid-backoff trigram scorer
    (all three backoff branches live on the real corpus: the mod-7 eval
    docs carry trigrams/bigrams the train split never saw)."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import (
        TRIGRAM_BACKOFF_SQL,
        trigram_backoff_logprob,
    )

    assert_matches_oracle(
        trigram_backoff_logprob(load_table(spark, sf_dir, "documents")),
        TRIGRAM_BACKOFF_SQL,
        sf_dir,
        name="trigram_backoff",
    )


def test_trigram_backoff_hand_computed(spark):
    """Exact arithmetic on a crafted corpus exercising ALL THREE backoff
    branches: doc 7 (eval split: 7 % 7 == 0) contains a trigram whose
    full form was seen in train (branch 1), one whose trigram is novel
    but whose (w2,w3) bigram was seen (branch 2), and one whose w3 never
    occurs in train at all (branch 3, Laplace base)."""
    import math

    from apache_jira_scraper_spark.operators.text import (
        BACKOFF_ALPHA,
        trigram_backoff_logprob,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),  # train: trigrams abc bcd; bigrams ab bc cd
            (2, "b c e"),    # train: trigram bce; bigrams bc ce
            (3, "x"),        # train: no trigram (1 token)
            (7, "a b c"),    # EVAL (7%7==0): scored, not trained
            (14, "e b c"),   # EVAL: trigram ebc novel, bigram bc seen
            (21, "a b z"),   # EVAL: z unseen anywhere in train
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in trigram_backoff_logprob(docs).collect()}
    # train tokens: a b c d b c e x -> N=8; vocab {a,b,c,d,e,x} V=6
    # train trigram counts: abc=1 bcd=1 bce=1
    # train bigram counts: ab=1 bc=2 cd=1 ce=1
    # train unigram counts: a=1 b=2 c=2 d=1 e=1 x=1
    lp = lambda v: round(math.log(v) * 10_000)
    # doc 7 "a b c": trigram abc seen -> c3/c2(ab) = 1/1
    assert got[7]["n_trigrams"] == 1
    assert got[7]["sum_logprob_en4"] == lp(1 / 1)
    # doc 14 "e b c": trigram ebc unseen; bigram (b,c) seen ->
    # 0.4 * c2(bc)/c1(b) = 0.4 * 2/2
    assert got[14]["sum_logprob_en4"] == lp(BACKOFF_ALPHA * 2 / 2)
    # doc 21 "a b z": z unseen -> 0.16 * (0+1)/(N+V) = 0.16/14
    assert got[21]["sum_logprob_en4"] == lp(
        BACKOFF_ALPHA * BACKOFF_ALPHA * 1 / (8 + 6)
    )
    # short docs emit zeros
    assert (
        got[3]["n_trigrams"],
        got[3]["sum_logprob_en4"],
        got[3]["avg_logprob_en4"],
    ) == (0, 0, 0)
    # train docs are scored too (against the model they trained)
    assert got[1]["n_trigrams"] == 2


def test_trigram_backoff_heldout_orders(spark):
    """The fluency property one order above the bigram test: an eval doc
    repeating a train doc verbatim outscores an eval doc with the same
    tokens shuffled into never-seen trigrams."""
    from apache_jira_scraper_spark.operators.text import trigram_backoff_logprob

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat"),
            (7, "the cat sat on the mat"),   # eval, fluent
            (14, "mat the on sat cat the"),  # eval, shuffled
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["avg_logprob_en4"] for r in trigram_backoff_logprob(docs).collect()}
    assert got[7] > got[14]


def test_trigram_backoff_rejects_empty_train_split(spark):
    """An all-eval corpus (every doc_id = 0 mod 7) must fail loudly — an
    empty train split nulls N and the sums would silently zero."""
    from apache_jira_scraper_spark.operators.text import trigram_backoff_logprob

    docs = spark.createDataFrame(
        [(0, "a b c"), (7, "b c d"), (14, "c d e")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="empty train split"):
        trigram_backoff_logprob(docs)


def test_ppl_bucket_matches_oracle(spark, sf_dir):
    """Cross-engine parity of the CCNet tercile bucketing (labels,
    per-doc grid scores, and the two corpus cutoff constants)."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import (
        PPL_BUCKET_SQL,
        ppl_bucket,
        trigram_backoff_logprob,
    )

    assert_matches_oracle(
        ppl_bucket(trigram_backoff_logprob(load_table(spark, sf_dir, "documents"))),
        PPL_BUCKET_SQL,
        sf_dir,
        name="ppl_bucket",
    )


def test_ppl_bucket_tercile_properties(spark, sf_dir):
    """Structural properties on the real corpus: buckets partition scored
    docs into value-ordered bands (every tail grid score <= cut_lo <
    every middle <= cut_hi < every head), shares are tercile-ish (ties
    only move boundary CELLS), skip == the <3-token docs, cutoffs are
    corpus constants."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import (
        ppl_bucket,
        trigram_backoff_logprob,
    )

    scores = trigram_backoff_logprob(load_table(spark, sf_dir, "documents"))
    rows = ppl_bucket(scores).collect()
    n_tri = {r["doc_id"]: r["n_trigrams"] for r in scores.collect()}
    assert {r["doc_id"] for r in rows} == set(n_tri)
    assert len({(r["cut_lo"], r["cut_hi"]) for r in rows}) == 1
    cut_lo, cut_hi = rows[0]["cut_lo"], rows[0]["cut_hi"]
    assert cut_lo < cut_hi
    by = {"head": [], "middle": [], "tail": [], "skip": []}
    for r in rows:
        by[r["bucket"]].append(r)
    assert {r["doc_id"] for r in by["skip"]} == {
        d for d, n in n_tri.items() if n == 0
    }
    assert all(r["s_grid"] <= cut_lo for r in by["tail"])
    assert all(cut_lo < r["s_grid"] <= cut_hi for r in by["middle"])
    assert all(r["s_grid"] > cut_hi for r in by["head"])
    n_scored = len(rows) - len(by["skip"])
    for b in ("head", "middle", "tail"):
        # value-only tie policy: shares drift from n/3 by at most the
        # boundary cells' mass — generous band, catches degenerate splits
        assert 0.15 * n_scored <= len(by[b]) <= 0.55 * n_scored, (
            b,
            len(by[b]),
            n_scored,
        )


def test_ppl_bucket_hand_computed(spark):
    """Exact cutoffs on a crafted score table: 6 scored docs -> ranks
    ceil(6/3)=2 and ceil(12/3)=4 land cut_lo/cut_hi on the 2nd and 4th
    distinct grid value; a <3-token doc skips; ties share a bucket."""
    from apache_jira_scraper_spark.operators.text import ppl_bucket

    scores = spark.createDataFrame(
        # (doc_id, n_trigrams, sum, avg_en4): grid = avg DIV 100
        [
            (1, 5, -10_000, -2_000),   # grid -20
            (2, 5, -10_000, -2_000),   # grid -20 (tie with doc 1)
            (3, 5, -15_000, -3_000),   # grid -30
            (4, 5, -40_000, -8_000),   # grid -80
            (5, 5, -45_000, -9_000),   # grid -90
            (6, 5, -50_000, -9_999),   # grid -99
            (7, 0, 0, 0),              # skip
        ],
        "doc_id long, n_trigrams long, sum_logprob_en4 long, avg_logprob_en4 long",
    )
    got = {r["doc_id"]: r for r in ppl_bucket(scores).collect()}
    # n=6 scored; cum over ASC grids [-99,-90,-80,-30,-20]:
    # counts [1,1,1,1,2] -> cum [1,2,3,4,6]; ceil(6/3)=2 -> cut_lo=-90,
    # ceil(12/3)=4 -> cut_hi=-30
    assert (got[1]["cut_lo"], got[1]["cut_hi"]) == (-90, -30)
    assert got[1]["bucket"] == got[2]["bucket"] == "head"   # -20 > -30
    assert got[3]["bucket"] == "middle"                     # -90 < -30 <= -30
    assert got[4]["bucket"] == "middle"                     # -80 <= -30? no: -80 <= cut_hi=-30 -> middle
    assert got[5]["bucket"] == "tail"                       # -90 <= cut_lo
    assert got[6]["bucket"] == "tail"
    assert got[7]["bucket"] == "skip" and got[7]["s_grid"] == 0


def test_filter_verdict_precedence_and_consistency(spark, sf_dir):
    """The mixer verdict on the real corpus: every reason code is
    consistent with its source signal AND respects the fixed precedence
    (a contaminated doc reads 'contam' even when it would also fail
    repetition/ppl/qc); keep == 1 iff reason == 'keep'."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.classifier import (
        quality_classifier_report,
    )
    from apache_jira_scraper_spark.operators.text import (
        DECONTAM_EVAL_MOD,
        VERDICT_DUP_TOKEN_PPM,
        VERDICT_TOP_BIGRAM_PPM,
        contamination_report,
        filter_verdict,
        ppl_bucket,
        repetition_signals,
        trigram_backoff_logprob,
    )

    docs = load_table(spark, sf_dir, "documents")
    contam = contamination_report(
        docs.filter(F.col("doc_id") % DECONTAM_EVAL_MOD != 0),
        docs.filter(F.col("doc_id") % DECONTAM_EVAL_MOD == 0),
    )
    rep = repetition_signals(docs)
    ppl = ppl_bucket(trigram_backoff_logprob(docs))
    qc = quality_classifier_report(docs)
    got = {
        r["doc_id"]: r
        for r in filter_verdict(docs, contam, rep, ppl, qc).collect()
    }
    sig = {}
    for r in contam.collect():
        sig[r["doc_id"]] = {"contam": r["n_contam"] > 0}
    # rep/ppl/qc cover the WHOLE corpus; the verdict (and sig) only the
    # contam report's train split — skip eval-split rows here
    for r in rep.collect():
        if r["doc_id"] in sig:
            sig[r["doc_id"]]["repet"] = (
                r["dup_token_ppm"] > VERDICT_DUP_TOKEN_PPM
                or r["top_bigram_ppm"] > VERDICT_TOP_BIGRAM_PPM
            )
    for r in ppl.collect():
        if r["doc_id"] in sig:
            sig[r["doc_id"]]["ppl_tail"] = r["bucket"] in ("tail", "skip")
    for r in qc.collect():
        if r["doc_id"] in sig:
            sig[r["doc_id"]]["lowq"] = not r["pred"]
    # verdict covers exactly the contam-report docs (the train split)
    assert set(got) == set(sig)
    order = ("contam", "repet", "ppl_tail", "lowq")
    for d, r in got.items():
        expect = next((c for c in order if sig[d][c]), "keep")
        assert r["reason"] == expect, (d, r["reason"], expect, sig[d])
        assert r["keep"] == (1 if expect == "keep" else 0)
    reasons = {r["reason"] for r in got.values()}
    # non-vacuity: measured at sf0.001/0.01 — every code fires, and some
    # contaminated doc would ALSO fail a later rule (precedence is live)
    assert reasons == {"contam", "repet", "ppl_tail", "lowq", "keep"}
    assert any(
        sig[d]["contam"] and (sig[d]["repet"] or sig[d]["ppl_tail"] or sig[d]["lowq"])
        for d in sig
    )


def test_pack_token_ids_matches_python_model(spark, sf_dir):
    """pack_token_ids vs a direct Python concat-and-chunk over the same
    encoded corpus: identical windows, identical trailing partial."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import (
        build_vocab,
        encode_with_vocab,
        pack_token_ids,
    )

    docs = load_table(spark, sf_dir, "documents").limit(120)
    enc = encode_with_vocab(docs, build_vocab(docs), ordered=False)
    rows = sorted(
        ((r["doc_id"], list(r["ids"])) for r in enc.collect()),
        key=lambda x: x[0],
    )
    stream: list[int] = []
    for _, ids in rows:
        stream.extend(ids)
    L = 64
    ref = {
        i // L: stream[i : i + L]
        for i in range(0, len(stream), L)
    }
    got = {
        r["seq_id"]: list(r["ids"])
        for r in pack_token_ids(enc, seq_len=L).collect()
    }
    assert got == ref
    # trailing partial really is partial unless the stream divides evenly
    last = max(got)
    assert len(got[last]) == (len(stream) - 1) % L + 1


def test_pack_token_ids_no_global_window_on_corpus(spark, sf_dir):
    """The only unpartitioned window must run over the bucket partials
    (corpus/PACK_BUCKET rows), never the corpus/token stream."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import (
        build_vocab,
        encode_with_vocab,
        pack_token_ids,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = pack_token_ids(
        encode_with_vocab(docs, build_vocab(docs), ordered=False)
    )
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every unpartitioned Window must consume the bucket-partials agg
    # (bsum) — the same pin pack_sequences carries in test_plans
    import re

    for m in re.finditer(r"Window \[[^\]]*\], \[bucket", plan):
        pass  # partitioned-by-bucket windows are fine
    unpart = [
        seg for seg in plan.splitlines()
        if "Window [" in seg and "windowspecdefinition(bucket" not in seg
        and "partitionBy" not in seg
    ]
    # the bucket-offset window mentions bsum, and build_vocab ranks its
    # POST-LIMIT 100-row vocabulary (bounded by construction, see its
    # docstring); nothing else may be unpartitioned
    for seg in unpart:
        if (
            "bsum" not in seg
            and "boff" not in seg
            and "row_number" not in seg
        ):
            raise AssertionError(f"unexpected unpartitioned window: {seg}")


def test_gopher_rules_matches_oracle(spark, sf_dir):
    """Cross-engine parity of the Gopher document-rule filter (code,
    keep flag, and the two certified numerics)."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import (
        gopher_rules,
        gopher_rules_sql,
    )

    assert_matches_oracle(
        gopher_rules(load_table(spark, sf_dir, "documents")),
        gopher_rules_sql(),
        sf_dir,
        name="gopher_rules",
    )


def test_gopher_rules_nonvacuous(spark, sf_dir):
    """At every test SF the corpus-adapted thresholds keep >=3 codes
    live ('keep' plus at least two distinct failure codes) — the
    verdict-leg discipline for a filter gate."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import gopher_rules

    rows = gopher_rules(load_table(spark, sf_dir, "documents")).collect()
    codes = {r["code"] for r in rows}
    assert "keep" in codes and len(codes) >= 3, codes
    keeps = {r["code"] for r in rows if r["keep"] == 1}
    assert keeps == {"keep"}


def test_gopher_rules_crafted_every_branch(spark):
    """Hand-built docs firing each rule in precedence order — including
    the 'sym' and 'alpha' branches that never fire on the synthetic
    corpus (certified-but-passing there, live here)."""
    from apache_jira_scraper_spark.operators.text import gopher_rules

    docs = spark.createDataFrame(
        [
            (0, "tiny doc"),  # words (n=2 < 50)
            (1, " ".join(["ab"] * 60)),  # mwl low (200)
            # mwl stays in band (all length-5 tokens) so the later rules
            # are reachable: 8/60 '#'-tokens = 13% > 10% -> sym
            (2, " ".join(["weird"] * 52 + ["#####"] * 8)),
            (3, " ".join(["weird"] * 45 + ["12345"] * 15)),  # alpha 75% < 80%
            (4, " ".join(["data", "word", "lines"] * 20)),  # stop (0 distinct)
            (5, " ".join(["the", "and", "vector", "table"] * 15)),  # keep
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["code"] for r in gopher_rules(docs).collect()}
    assert got == {0: "words", 1: "mwl", 2: "sym", 3: "alpha", 4: "stop", 5: "keep"}


def test_gopher_rules_python_model(spark, sf_dir):
    """Row-for-row agreement with an independent pure-Python model of the
    published rule set (integer grids, first-failing precedence)."""
    from apache_jira_scraper_spark.io import load_table
    from apache_jira_scraper_spark.operators.text import (
        GOPHER_ALPHA_PPM_MIN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_STOP,
        GOPHER_MIN_WORDS,
        GOPHER_MWL_HI_C,
        GOPHER_MWL_LO_C,
        GOPHER_SYM_PPM_MAX,
        STOPWORDS,
        gopher_rules,
    )

    docs = load_table(spark, sf_dir, "documents")
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}

    def model(text: str) -> tuple[str, int, int, int]:
        toks = text.split(" ")
        n = len(toks)
        mwl = sum(len(t) for t in toks) * 100 // n
        sym = sum(1 for t in toks if "#" in t or "..." in t) * 1_000_000 // n
        alpha = sum(1 for t in toks if any("a" <= c <= "z" for c in t)) * 1_000_000 // n
        nstop = len({t for t in toks if t in STOPWORDS})
        if n < GOPHER_MIN_WORDS or n > GOPHER_MAX_WORDS:
            code = "words"
        elif mwl < GOPHER_MWL_LO_C or mwl > GOPHER_MWL_HI_C:
            code = "mwl"
        elif sym > GOPHER_SYM_PPM_MAX:
            code = "sym"
        elif alpha < GOPHER_ALPHA_PPM_MIN:
            code = "alpha"
        elif nstop < GOPHER_MIN_STOP:
            code = "stop"
        else:
            code = "keep"
        return code, int(code == "keep"), n, mwl

    for r in gopher_rules(docs).collect():
        assert (r["code"], r["keep"], r["n_words"], r["mwl_c100"]) == model(
            texts[r["doc_id"]]
        ), r["doc_id"]
