"""Unigram-LM (SentencePiece-style) tokenizer training + Viterbi
segmentation (SURVEY.md §2.11 extension — Kudo 2018, arXiv:1804.10959;
the canonical ALTERNATIVE to BPE, completing the tokenizer family next to
bpe.bpe_train: BPE grows pieces bottom-up by merge rules, unigram starts
from a large seed vocabulary and re-estimates piece probabilities, with
segmentation = the max-likelihood piece sequence).

Spark-first decomposition, the bpe_train shape:

  word table   ONE corpus-sized shuffle up front: whitespace words ->
               (w, freq). Training never touches the corpus again.
  seed         substring explosion of the DISTINCT words (bounded:
               |words| x len x UNI_MAX_PIECE rows), freq-weighted
               partial-agg counts, top-V by (count, piece) + ALL single
               characters (coverage guarantee).
  EM round     hard EM (Viterbi counts, the standard distributed
               simplification): segment every DISTINCT word with the
               current piece scores — a ZERO-SHUFFLE integer-DP column
               fold, the vocab rides along as a bounded driver-side map
               literal (the classifier literal-weights precedent) — then
               one vocabulary-sized count shuffle + a bounded collect
               re-estimates the scores. Multi-char pieces that fell out
               of every Viterbi path are pruned; single characters keep
               a +1 count floor (coverage can never be pruned away).
  segment      corpus words posexplode -> equi-join the SEGMENTED
               DISTINCT-WORD table (AQE broadcasts at small SF, demotes
               to a shuffle join at scale) -> ONE doc-keyed reassembly.
               OOV words need no special path: the Viterbi expression is
               total (unseen characters score the NEG floor but still
               segment), so segmentation doubles as the fallback.

All piece scores are INTEGER 1e-4 nats (the trigram-LM grid): the DP adds
longs, so Spark-vs-reference parity is exact by construction — the only
float math is the driver-side ln when scores are re-estimated, identical
in the pure-Python reference (tests/test_unigram.py).

No SQL twin yet: like bpe_train, each EM round's segmentation depends on
the previous round's scores (the connected-components class); correctness
is pinned against an independent pure-Python implementation of the same
spec instead.

Reference behavior anchor: the reference pipeline tokenizes text for its
instruction corpus (transformer.py's summary/description handling); this
operator family is the §2.11 mandate's "token counting" taken to a real
trainable tokenizer, as bpe.py's docstring lays out.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: demo budgets — production unigram models use max piece length ~16 and
#: 32k+ vocabularies with the same per-round shape; budgets bound rounds
#: and expression width, never correctness (pinned at any setting)
UNI_MAX_PIECE = 4
UNI_VOCAB = 120
UNI_ROUNDS = 3

#: integer 1e-4-nat score floor for pieces absent from the map: far below
#: any real score (|ln p| * 1e4 <= ~2e5 for p >= 1e-9) yet small enough
#: that length(word) of them can never overflow a long
_NEG = -(10**12)


def _words_of(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus -> (w, freq) distinct-word table — the one corpus pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _viterbi_cols(
    word: Column, lp: dict[str, int], max_piece: int
) -> tuple[Column, Column]:
    """(pieces, score) of the max-likelihood segmentation of ``word``
    under integer piece scores ``lp`` — one narrow expression, no
    shuffle, no Python rows.

    dp is built by ONE left fold over positions 1..n: dp[k+1] holds the
    best (score, piece_len) for the length-k prefix, candidates are the
    <= max_piece pieces ending at k, and the struct array_max implements
    the tie policy (equal score -> LONGER piece, the deterministic rule
    the reference implementation mirrors). The backtrace is a second
    fold walking the stored piece lengths. Scores are long sums — exact.
    """
    n = F.length(word)
    m = F.create_map(
        *[F.lit(x) for kv in lp.items() for x in kv]
    ) if lp else F.create_map().cast("map<string,bigint>")

    def step(acc: Column, i: Column) -> Column:
        cands = F.array(
            *[
                F.when(
                    F.lit(length) <= i,
                    F.struct(
                        (
                            F.element_at(acc, i - F.lit(length) + 1)["s"]
                            + F.coalesce(
                                F.element_at(
                                    m, word.substr(i - F.lit(length) + 1, F.lit(length))
                                ),
                                F.lit(_NEG),
                            )
                        ).alias("s"),
                        F.lit(length).alias("b"),
                    ),
                ).otherwise(
                    F.struct(
                        F.lit(2 * _NEG * max_piece).alias("s"),
                        F.lit(0).alias("b"),
                    )
                )
                for length in range(1, max_piece + 1)
            ]
        )
        return F.concat(acc, F.array(F.array_max(cands)))

    dp = F.aggregate(
        F.sequence(F.lit(1), n),
        F.array(F.struct(F.lit(0).cast("bigint").alias("s"), F.lit(0).alias("b"))),
        step,
    )
    back = F.aggregate(
        F.sequence(F.lit(1), n),
        F.struct(n.alias("i"), F.array().cast("array<string>").alias("ps")),
        lambda acc, _: F.when(
            acc["i"] > 0,
            F.struct(
                (acc["i"] - F.element_at(dp, acc["i"] + 1)["b"]).alias("i"),
                F.concat(
                    F.array(
                        word.substr(
                            acc["i"] - F.element_at(dp, acc["i"] + 1)["b"] + 1,
                            F.element_at(dp, acc["i"] + 1)["b"],
                        )
                    ),
                    acc["ps"],
                ).alias("ps"),
            ),
        ).otherwise(acc),
        lambda acc: acc["ps"],
    )
    score = F.element_at(dp, n + 1)["s"]
    return back, score


def _lp_e4(counts: dict[str, int]) -> dict[str, int]:
    """count table -> integer 1e-4-nat scores (driver-side, bounded)."""
    total = sum(counts.values())
    return {p: round(math.log(c / total) * 10_000) for p, c in counts.items()}


def unigram_train(
    docs: DataFrame,
    vocab_size: int = UNI_VOCAB,
    n_rounds: int = UNI_ROUNDS,
    max_piece: int = UNI_MAX_PIECE,
    text_col: str = "text",
) -> DataFrame:
    """Train the unigram LM tokenizer. Returns the model as a bounded
    DataFrame (id, piece, lp_e4, cnt), id dense 0..|V|-1 in the
    deterministic layout single-chars-lexicographic first, then
    multi-char by (cnt DESC, piece ASC) — the bpe_vocab id discipline.

    Per EM round: one zero-shuffle Viterbi pass over the DISTINCT-word
    table + one vocabulary-sized count shuffle + one bounded driver
    collect. The corpus itself is read exactly once (the word table).
    """
    from ..io import free_local_checkpoint

    if n_rounds < 0 or vocab_size < 2 or max_piece < 1:
        raise ValueError("unigram_train: bad budgets")
    words = _words_of(docs, text_col).localCheckpoint(eager=True)
    try:
        # seed: freq-weighted substring counts over the distinct words
        subs = words.select(
            "freq",
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.length("w")),
                        lambda i: F.transform(
                            F.sequence(
                                F.lit(1),
                                F.least(
                                    F.lit(max_piece), F.length("w") - i + 1
                                ),
                            ),
                            lambda le: F.col("w").substr(i, le),
                        ),
                    )
                )
            ).alias("piece"),
        )
        counts_df = subs.groupBy("piece").agg(F.sum("freq").alias("c"))
        chars = {
            r["piece"]: int(r["c"])
            for r in counts_df.filter(F.length("piece") == 1).collect()
        }
        if not chars:
            raise ValueError("unigram_train: empty corpus (no characters)")
        budget = max(0, vocab_size - len(chars))
        multi = {
            r["piece"]: int(r["c"])
            for r in counts_df.filter(F.length("piece") > 1)
            .orderBy(F.desc("c"), F.asc("piece"))
            .limit(budget)
            .collect()
        }
        counts = {**chars, **multi}
        lp = _lp_e4(counts)

        for _ in range(n_rounds):
            pieces_col, _score = _viterbi_cols(F.col("w"), lp, max_piece)
            used_rows = (
                words.select("freq", F.explode(pieces_col).alias("piece"))
                .groupBy("piece")
                .agg(F.sum("freq").alias("c"))
                .collect()
            )
            used = {r["piece"]: int(r["c"]) for r in used_rows}
            # char floor keeps coverage; unused multi-char pieces prune
            counts = {
                p: used.get(p, 0) + (1 if len(p) == 1 else 0)
                for p in counts
                if len(p) == 1 or used.get(p, 0) > 0
            }
            lp = _lp_e4(counts)
    finally:
        free_local_checkpoint(words)

    spark = docs.sparkSession
    singles = sorted((p, c) for p, c in counts.items() if len(p) == 1)
    multis = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    layout = singles + multis
    return spark.createDataFrame(
        [(i, p, lp[p], c) for i, (p, c) in enumerate(layout)],
        "id int, piece string, lp_e4 bigint, cnt bigint",
    )


def _model_map(vocab: DataFrame) -> dict[str, int]:
    """Bounded model collect: (piece -> lp_e4) for the Viterbi map."""
    return {r["piece"]: int(r["lp_e4"]) for r in vocab.select("piece", "lp_e4").collect()}


def unigram_segment(
    docs: DataFrame,
    vocab: DataFrame,
    max_piece: int = UNI_MAX_PIECE,
    text_col: str = "text",
    id_col: str = "doc_id",
    ordered: bool = True,
) -> DataFrame:
    """Corpus -> (id, n_pieces, pieces) under a trained model: Viterbi
    runs ONCE PER DISTINCT WORD (zero-shuffle fold over the word table),
    then the corpus joins the segmented table word-keyed and reassembles
    with one doc-keyed shuffle — bpe_segment's scale path, with no OOV
    branch because the Viterbi expression is total."""
    lp = _model_map(vocab)
    pieces_col, _ = _viterbi_cols(F.col("w"), lp, max_piece)
    segw = (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .distinct()
        .select("w", pieces_col.alias("wp"))
    )
    pos = docs.select(
        id_col,
        F.posexplode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("pos", "w"),
    )
    joined = pos.join(segw, "w").select(
        id_col, F.struct("pos", "wp").alias("pw")
    )
    out = (
        docs.select(id_col)
        .join(
            joined.groupBy(id_col).agg(
                F.flatten(
                    F.transform(
                        F.array_sort(F.collect_list("pw")), lambda s: s["wp"]
                    )
                ).alias("pieces")
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.coalesce("pieces", F.array().cast("array<string>")).alias(
                "pieces"
            ),
        )
        .select(id_col, F.size("pieces").alias("n_pieces"), "pieces")
    )
    return out.orderBy(id_col) if ordered else out


def unigram_encode(
    docs: DataFrame,
    vocab: DataFrame,
    max_piece: int = UNI_MAX_PIECE,
    text_col: str = "text",
    id_col: str = "doc_id",
    ordered: bool = True,
) -> DataFrame:
    """Text -> unigram token-id arrays: unigram_segment then bpe_encode's
    broadcast-vocab id plumbing (the `segmented` reuse hook) — one
    shared corpus segmentation, one reassembly shuffle."""
    from .bpe import bpe_encode

    seg = unigram_segment(
        docs,
        vocab,
        max_piece=max_piece,
        text_col=text_col,
        id_col=id_col,
        ordered=False,
    ).select(id_col, "pieces")
    return bpe_encode(
        docs,
        merges=[],
        vocab=vocab,
        text_col=text_col,
        id_col=id_col,
        segmented=seg,
        ordered=ordered,
    )
