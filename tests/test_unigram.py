"""Unigram-LM tokenizer (operators/unigram.py): cross-checked against an
INDEPENDENT pure-Python implementation of the same spec (the bpe
Sennrich-parity pattern) plus crafted hand-checkable cases. The Spark DP
adds integer 1e-4-nat scores, so parity is exact — no tolerance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from apache_jira_scraper_spark.operators.unigram import (
    UNI_MAX_PIECE,
    _NEG,
    unigram_encode,
    unigram_segment,
    unigram_train,
)


# ---------- independent reference (dict-based, no Spark) ----------


def ref_viterbi(w: str, lp: dict[str, int], L: int) -> list[str]:
    n = len(w)
    dp: list[tuple[int, int]] = [(0, 0)]
    for i in range(1, n + 1):
        best = None
        for length in range(1, min(L, i) + 1):
            s = dp[i - length][0] + lp.get(w[i - length : i], _NEG)
            cand = (s, length)  # tuple max == (score, then LONGER piece)
            if best is None or cand > best:
                best = cand
        dp.append(best)
    out: list[str] = []
    i = n
    while i > 0:
        length = dp[i][1]
        out.insert(0, w[i - length : i])
        i -= length
    return out


def ref_train(
    texts: list[str], vocab_size: int, n_rounds: int, L: int
) -> tuple[dict[str, int], dict[str, int]]:
    """Returns (counts, lp_e4) after training — the same spec as
    unigram_train, written independently against dicts."""
    freq: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                freq[w] = freq.get(w, 0) + 1
    sub: dict[str, int] = {}
    for w, f in freq.items():
        for i in range(len(w)):
            for length in range(1, min(L, len(w) - i) + 1):
                p = w[i : i + length]
                sub[p] = sub.get(p, 0) + f
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    assert chars, "empty corpus"
    budget = max(0, vocab_size - len(chars))
    multi = dict(
        sorted(
            ((p, c) for p, c in sub.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[:budget]
    )
    counts = {**chars, **multi}

    def lp_of(cnt: dict[str, int]) -> dict[str, int]:
        # half-AWAY (the spec, matching DuckDB ROUND) — NOT Python round
        def rha(x: float) -> int:
            return int(math.copysign(math.floor(abs(x) + 0.5), x))

        total = sum(cnt.values())
        return {p: rha(math.log(c / total) * 10_000) for p, c in cnt.items()}

    lp = lp_of(counts)
    for _ in range(n_rounds):
        used: dict[str, int] = {}
        for w, f in freq.items():
            for p in ref_viterbi(w, lp, L):
                used[p] = used.get(p, 0) + f
        counts = {
            p: used.get(p, 0) + (1 if len(p) == 1 else 0)
            for p in counts
            if len(p) == 1 or used.get(p, 0) > 0
        }
        lp = lp_of(counts)
    return counts, lp


def ref_layout(counts: dict[str, int]) -> list[str]:
    singles = sorted(p for p in counts if len(p) == 1)
    multis = [
        p
        for p, _ in sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
    ]
    return singles + multis


# ---------- tests ----------


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from apache_jira_scraper_spark.io import load_table

    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_train_matches_reference_end_to_end(spark, docs):
    """Full cross-implementation parity on the real corpus: vocab
    (pieces, counts, integer scores, id layout) AND the Viterbi
    segmentation of every document."""
    texts = [r["text"] for r in docs.collect()]
    v = unigram_train(docs, vocab_size=80, n_rounds=2, max_piece=3)
    rows = v.orderBy("id").collect()
    counts, lp = ref_train(texts, vocab_size=80, n_rounds=2, L=3)
    assert [r["piece"] for r in rows] == ref_layout(counts)
    assert {r["piece"]: r["cnt"] for r in rows} == counts
    assert {r["piece"]: r["lp_e4"] for r in rows} == lp

    got = {
        r["doc_id"]: r["pieces"]
        for r in unigram_segment(docs, v, max_piece=3).collect()
    }
    by_id = {r["doc_id"]: r["text"] for r in docs.collect()}
    for did, text in by_id.items():
        want: list[str] = []
        for w in text.split(" "):
            if w:
                want.extend(ref_viterbi(w, lp, 3))
        assert got[did] == want, did


def test_crafted_learns_repeated_piece(spark):
    """'ab' dominates a corpus of ab-repeats: the trained model must
    segment 'ababab' into three 'ab' pieces, and an UNSEEN word must
    still segment (total Viterbi — chars fall back via the NEG floor)."""
    docs = spark.createDataFrame(
        [(0, "ab abab ababab ab abab"), (1, "ab ababab cd")],
        "doc_id bigint, text string",
    )
    v = unigram_train(docs, vocab_size=20, n_rounds=2, max_piece=2)
    got = {
        r["doc_id"]: r["pieces"]
        for r in unigram_segment(
            spark.createDataFrame(
                [(0, "ababab"), (1, "abxq")], "doc_id bigint, text string"
            ),
            v,
            max_piece=2,
        ).collect()
    }
    assert got[0] == ["ab", "ab", "ab"]
    assert "".join(got[1]) == "abxq"  # unseen chars still segment


def test_segmentation_is_lossless(spark, docs):
    """Concatenating every doc's pieces reproduces its words exactly —
    the coverage guarantee the single-char floor exists for."""
    v = unigram_train(docs, vocab_size=60, n_rounds=1, max_piece=3)
    seg = unigram_segment(docs, v, max_piece=3)
    joined = docs.join(seg, "doc_id").select(
        "doc_id",
        F.concat_ws("", "pieces").alias("glued"),
        F.regexp_replace("text", " ", "").alias("flat"),
    )
    bad = joined.filter(F.col("glued") != F.col("flat")).count()
    assert bad == 0


def test_encode_ids_roundtrip(spark, docs):
    """unigram_encode ids decode back to the segmentation through the
    vocab table; no id is the unk sentinel (training corpus == encode
    corpus, so every piece is in-vocab)."""
    v = unigram_train(docs, vocab_size=60, n_rounds=1, max_piece=3)
    id2p = {r["id"]: r["piece"] for r in v.collect()}
    enc = {
        r["doc_id"]: r["ids"]
        for r in unigram_encode(docs, v, max_piece=3).collect()
    }
    seg = {
        r["doc_id"]: r["pieces"]
        for r in unigram_segment(docs, v, max_piece=3).collect()
    }
    assert set(enc) == set(seg)
    for did, ids in enc.items():
        assert -1 not in ids
        assert [id2p[i] for i in ids] == seg[did]


def test_empty_corpus_raises(spark):
    docs = spark.createDataFrame([(0, "")], "doc_id bigint, text string")
    with pytest.raises(Exception, match="empty corpus"):
        unigram_train(docs, vocab_size=10, n_rounds=1, max_piece=2)


def test_viterbi_is_zero_shuffle_per_word(spark, docs):
    """The per-distinct-word segmentation subtree must contain no
    exchange beyond the word-distinct one: training's EM segmentation
    pass is a narrow fold (the scale claim in the module docstring)."""
    from apache_jira_scraper_spark.operators.unigram import (
        _model_map,
        _viterbi_cols,
    )

    v = unigram_train(docs, vocab_size=40, n_rounds=1, max_piece=3)
    lp = _model_map(v)
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    pieces, _ = _viterbi_cols(F.col("w"), lp, 3)
    plan = (
        words.select("w", pieces.alias("p"))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the DP adds NO join/window; the only aggregate is the distinct's
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Aggregate") <= 2  # partial+final of distinct


def test_gate_lp_cross_engine(spark, docs):
    """Driver-side math.log + half-away rounding must equal DuckDB
    ln + ROUND on the gate model's ACTUAL counts — the residual float
    surface of the ut_vocab leg (the QC_WEIGHT_DECIMALS boundary-flip
    class; re-run when the documents fixture regenerates)."""
    import duckdb

    from apache_jira_scraper_spark.operators.unigram import (
        UNI_GATE_MAXP,
        UNI_GATE_ROUNDS,
        UNI_GATE_VOCAB,
    )

    v = unigram_train(
        docs,
        vocab_size=UNI_GATE_VOCAB,
        n_rounds=UNI_GATE_ROUNDS,
        max_piece=UNI_GATE_MAXP,
    )
    rows = v.collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(piece VARCHAR, c BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(r["piece"], r["cnt"]) for r in rows]
    )
    got = dict(
        con.execute(
            "SELECT piece, CAST(ROUND(ln(CAST(c AS DOUBLE) / "
            "(SELECT SUM(c) FROM t)) * 10000, 0) AS BIGINT) FROM t"
        ).fetchall()
    )
    for r in rows:
        assert got[r["piece"]] == r["lp_e4"], r["piece"]


def test_ref_viterbi_is_optimal_brute_force():
    """The DP's anchor: on every word up to length 7 over a small
    alphabet, ref_viterbi's score must equal the brute-force maximum
    over ALL 2^(n-1) segmentations, and its pieces must be a valid
    segmentation achieving it (hypothesis-style grid, deterministic).
    Transitively certifies the Spark fold and the SQL recursive CTE,
    which are pinned equal to ref_viterbi elsewhere."""
    import itertools

    lp = {
        "a": -20000, "b": -25000, "ab": -30000, "ba": -60000,
        "aa": -41000, "aab": -44999, "bb": -50001,
    }
    L = 3

    def brute(w: str) -> int:
        n = len(w)
        best = None
        for cuts in itertools.product([0, 1], repeat=n - 1):
            pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
            pieces = [w[pos[i] : pos[i + 1]] for i in range(len(pos) - 1)]
            if any(len(p) > L for p in pieces):
                continue
            s = sum(lp.get(p, _NEG) for p in pieces)
            best = s if best is None else max(best, s)
        return best

    for n in range(1, 8):
        for chars in itertools.product("ab", repeat=n):
            w = "".join(chars)
            ps = ref_viterbi(w, lp, L)
            assert "".join(ps) == w
            assert all(1 <= len(p) <= L for p in ps)
            got = sum(lp.get(p, _NEG) for p in ps)
            assert got == brute(w), w


def test_tokenize_and_pack_composition(spark, docs):
    """unigram_tokenize_and_pack: every doc's ids appear in the packed
    stream in doc order, windows are seq_len except the tail, and the
    total token count is conserved."""
    from apache_jira_scraper_spark.operators.unigram import (
        unigram_tokenize_and_pack,
    )

    vocab, seqs = unigram_tokenize_and_pack(
        docs, vocab_size=60, n_rounds=1, max_piece=3, seq_len=128
    )
    rows = sorted(
        ((r["seq_id"], r["ids"]) for r in seqs.collect()), key=lambda x: x[0]
    )
    assert rows, "no sequences packed"
    for sid, ids in rows[:-1]:
        assert len(ids) == 128
    stream = [i for _, ids in rows for i in ids]
    enc_total = sum(
        r["n_pieces"]
        for r in unigram_encode(docs, vocab, max_piece=3).collect()
    )
    assert len(stream) == enc_total
    assert -1 not in stream


# ---------- soft EM (forward-backward expected counts) ----------


def _ref_lpf(lp: dict[str, int], p: str) -> float:
    v = lp.get(p)
    return v / 10_000.0 if v is not None else -1.0e9


def _ref_alpha(w: str, lp: dict[str, int], L: int) -> list[float]:
    a = [0.0]
    for i in range(1, len(w) + 1):
        cands = [
            (a[i - length] + _ref_lpf(lp, w[i - length : i]))
            if length <= i
            else -2.0e9
            for length in range(1, L + 1)
        ]
        mx = max(cands)
        s = 0.0
        for c in cands:  # sequential fold, mirroring the Spark aggregate
            s += math.exp(c - mx)
        a.append(mx + math.log(s))
    return a


def _ref_soft_counts(
    freq: dict[str, int], lp: dict[str, int], L: int
) -> dict[str, float]:
    lp_rev = {p[::-1]: v for p, v in lp.items()}
    E: dict[str, float] = {}
    for w, f in freq.items():
        n = len(w)
        a = _ref_alpha(w, lp, L)
        ar = _ref_alpha(w[::-1], lp_rev, L)
        for i in range(n):
            for length in range(1, min(L, n - i) + 1):
                p = w[i : i + length]
                if p in lp:
                    lg = a[i] + _ref_lpf(lp, p) + ar[n - (i + length)] - a[n]
                    E[p] = E.get(p, 0.0) + f * math.exp(lg)
    return E


def test_soft_em_counts_match_reference(spark, docs):
    """Forward-backward expected counts vs the pure-Python mirror of the
    same op order — equal to float tolerance (libm + shuffle-sum ulps;
    the soft E-step is the documented float surface, unlike the integer
    hard path)."""
    from apache_jira_scraper_spark.operators.unigram import (
        _words_of,
        soft_em_counts,
    )

    texts = [r["text"] for r in docs.collect()]
    counts, lp = ref_train(texts, vocab_size=60, n_rounds=0, L=3)
    words = _words_of(docs.select("doc_id", "text"), "text")
    freq = {r["w"]: r["freq"] for r in words.collect()}
    got = {
        r["piece"]: r["e_cnt"]
        for r in soft_em_counts(words, lp, 3).collect()
    }
    want = _ref_soft_counts(freq, lp, 3)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-7), p
    # posterior mass is conserved per occurrence-set: total expected
    # pieces can never exceed total characters or drop below chars/L
    n_chars = sum(len(w) * f for w, f in freq.items())
    total = sum(want.values())
    assert n_chars / 3 - 1e-6 <= total <= n_chars + 1e-6


def test_soft_em_trains_and_differs_from_hard(spark, docs):
    """em='soft' end-to-end: trains, segmentation stays lossless under
    the integer score grid, and the learned scores genuinely differ
    from hard EM somewhere (non-vacuity)."""
    vs = unigram_train(docs, vocab_size=60, n_rounds=2, max_piece=3, em="soft")
    vh = unigram_train(docs, vocab_size=60, n_rounds=2, max_piece=3, em="hard")
    s = {r["piece"]: r["lp_e4"] for r in vs.collect()}
    h = {r["piece"]: r["lp_e4"] for r in vh.collect()}
    assert s != h
    # soft keeps every seed piece (no pruning); hard may prune
    assert set(s) >= set(h)
    seg = unigram_segment(docs, vs, max_piece=3)
    joined = docs.join(seg, "doc_id").select(
        F.concat_ws("", "pieces").alias("g"),
        F.regexp_replace("text", " ", "").alias("f"),
    )
    assert joined.filter(F.col("g") != F.col("f")).count() == 0


def test_soft_em_rejects_bad_mode(spark, docs):
    with pytest.raises(ValueError, match="em must be"):
        unigram_train(docs, vocab_size=20, n_rounds=1, em="fuzzy")


# ---------- loss-based pruning (Kudo's vocabulary shrink) ----------


def _ref_loss(
    freq: dict[str, int], lp: dict[str, int], L: int
) -> dict[str, float]:
    out: dict[str, float] = {}
    for p in lp:
        if len(p) == 1:
            continue
        lx = {k: v for k, v in lp.items() if k != p}
        d = 0.0
        for w, f in freq.items():
            d += f * (_ref_alpha(w, lp, L)[-1] - _ref_alpha(w, lx, L)[-1])
        out[p] = d
    return out


def test_piece_loss_matches_leave_one_out_reference(spark, docs):
    """piece_loss (one grid job with the exclusion column) vs the naive
    per-piece leave-one-out recomputation in pure Python — equal to
    float tolerance, and every loss is non-negative (removing a piece
    can only lower corpus likelihood)."""
    from apache_jira_scraper_spark.operators.unigram import (
        _words_of,
        piece_loss,
    )

    texts = [r["text"] for r in docs.collect()]
    counts, lp = ref_train(texts, vocab_size=45, n_rounds=1, L=3)
    words = _words_of(docs.select("doc_id", "text"), "text")
    freq = {r["w"]: r["freq"] for r in words.collect()}
    got = {
        r["piece"]: r["loss"] for r in piece_loss(words, lp, 3).collect()
    }
    want = _ref_loss(freq, lp, 3)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-7, abs=1e-9), p
        assert got[p] >= -1e-9, p


def test_unigram_prune_end_to_end(spark, docs):
    """Shrink a trained vocab: target honored, single chars never
    dropped, survivors re-normalized, dropped pieces are exactly the
    lowest-loss ones, segmentation under the pruned model stays
    lossless."""
    from apache_jira_scraper_spark.operators.unigram import (
        _words_of,
        piece_loss,
        unigram_prune,
    )

    v = unigram_train(docs, vocab_size=60, n_rounds=1, max_piece=3)
    full = {r["piece"] for r in v.collect()}
    singles = {p for p in full if len(p) == 1}
    target = len(singles) + 5
    pruned = unigram_prune(docs, v, target_size=target, max_piece=3)
    kept = {r["piece"] for r in pruned.collect()}
    assert len(kept) == target
    assert singles <= kept
    # dropped = lowest-loss multi-char pieces
    words = _words_of(docs.select("doc_id", "text"), "text")
    lp = {r["piece"]: r["lp_e4"] for r in v.collect()}
    losses = {
        r["piece"]: r["loss"] for r in piece_loss(words, lp, 3).collect()
    }
    order = sorted(
        (p for p in full - singles), key=lambda p: (losses.get(p, 0.0), p)
    )
    assert set(order[: len(full) - target]) == full - kept
    seg = unigram_segment(docs, pruned, max_piece=3)
    joined = docs.join(seg, "doc_id").select(
        F.concat_ws("", "pieces").alias("g"),
        F.regexp_replace("text", " ", "").alias("f"),
    )
    assert joined.filter(F.col("g") != F.col("f")).count() == 0
    # no-op when target >= current size
    same = unigram_prune(docs, v, target_size=len(full) + 5, max_piece=3)
    assert {r["piece"] for r in same.collect()} == full
