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

Correctness is pinned two ways: an independent pure-Python implementation
of the same spec at ANY budget (tests/test_unigram.py), and — for the
FIXED gate budgets (one EM round, max piece 3) — a full DuckDB twin
under the driver hash (unigram_gate_sql: the Viterbi DP as rolling-window
recursive CTEs, the fixed-depth trick ivf_exact_sql_ctes uses for Lloyd
rounds), feeding the text gate's 'ut_vocab'/'ut_seg' legs.

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

#: sentinel for structurally-invalid DP candidates (piece longer than the
#: prefix): must lose to ANY chain of real candidates, i.e. stay below
#: len(word) * _NEG — safe for words up to 1e5 characters (a longer
#: whitespace-free "word" is degenerate input, documented bound)
_SENT = -(10**17)


def _words_of(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus -> (w, freq) distinct-word table — the one corpus pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _viterbi_dp(word: Column, lp: dict[str, int], max_piece: int) -> Column:
    """The Viterbi dp table of ``word`` under integer piece scores
    ``lp`` — one narrow fold, no shuffle, no Python rows.

    dp is built by ONE left fold over positions 1..n: dp[k+1] holds the
    best (score, piece_len) for the length-k prefix, candidates are the
    <= max_piece pieces ending at k, and the struct array_max implements
    the tie policy (equal score -> LONGER piece, the deterministic rule
    the reference implementation mirrors). Scores are long sums — exact.

    IMPORTANT (measured, the ivf literal-expression lesson): consumers
    must land this in a REAL COLUMN (withColumn) and run the backtrace /
    score reads against that column reference — referencing this
    expression tree directly from the backtrace duplicates the whole
    fold (with its embedded vocab-map literal) 4x and Catalyst analysis
    cost explodes (~2x leg build wall at sf0.1). CollapseProject keeps
    the split honest: it never inlines a multiply-referenced non-cheap
    expression, so the plan stays one narrow two-step projection.
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
                        F.lit(_SENT).cast("bigint").alias("s"),
                        F.lit(0).alias("b"),
                    )
                )
                for length in range(1, max_piece + 1)
            ]
        )
        return F.concat(acc, F.array(F.array_max(cands)))

    return F.aggregate(
        F.sequence(F.lit(1), n),
        F.array(F.struct(F.lit(0).cast("bigint").alias("s"), F.lit(0).alias("b"))),
        step,
    )


def _viterbi_backtrace(word: Column, dp: Column) -> Column:
    """Pieces from a dp COLUMN (see _viterbi_dp): a second fold walking
    the stored piece lengths back from the full word."""
    n = F.length(word)
    return F.aggregate(
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


def _viterbi_score(word: Column, dp: Column) -> Column:
    return F.element_at(dp, F.length(word) + 1)["s"]


def _viterbi_cols(
    word: Column, lp: dict[str, int], max_piece: int
) -> tuple[Column, Column]:
    """(pieces, score) as SINGLE expressions — the dp tree is inlined at
    every reference, so this form is for bounded ad-hoc use (tests);
    the operators go through the _viterbi_dp column split."""
    dp = _viterbi_dp(word, lp, max_piece)
    return _viterbi_backtrace(word, dp), _viterbi_score(word, dp)


def _lp_e4(counts: dict[str, int]) -> dict[str, int]:
    """count table -> integer 1e-4-nat scores (driver-side, bounded).
    Half-AWAY rounding (ivf._round_half_away) so the tie policy matches
    DuckDB ROUND in the gate twin — Python's built-in round is banker's
    (the QC_WEIGHT_DECIMALS boundary-flip class, healed at the spec)."""
    from .ivf import _round_half_away

    total = sum(counts.values())
    return {
        p: int(_round_half_away(math.log(c / total) * 10_000, 0))
        for p, c in counts.items()
    }


def unigram_train(
    docs: DataFrame,
    vocab_size: int = UNI_VOCAB,
    n_rounds: int = UNI_ROUNDS,
    max_piece: int = UNI_MAX_PIECE,
    text_col: str = "text",
    em: str = "hard",
) -> DataFrame:
    """Train the unigram LM tokenizer. Returns the model as a bounded
    DataFrame (id, piece, lp_e4, cnt), id dense 0..|V|-1 in the
    deterministic layout single-chars-lexicographic first, then
    multi-char by (cnt DESC, piece ASC) — the bpe_vocab id discipline.

    Per EM round: one zero-shuffle Viterbi pass over the DISTINCT-word
    table + one vocabulary-sized count shuffle + one bounded driver
    collect. The corpus itself is read exactly once (the word table).

    ``em="soft"`` (r13, the genuine Kudo E-step) replaces the Viterbi
    argmax counts with forward-backward EXPECTED counts
    (soft_em_counts): every in-vocab piece keeps positive posterior
    mass, so no piece is pruned — re-weighting only (loss-based
    pruning, Kudo's alpha-shrink, is the documented follow-on). The
    score grid stays integer 1e-4 nats, so segmentation under either
    trainer is the same exact integer DP; the soft E-step itself is
    float log-domain (pinned vs a pure-Python mirror with tolerance in
    tests, not a cross-engine hash — the documented float surface).
    """
    from ..io import free_local_checkpoint

    if n_rounds < 0 or vocab_size < 2 or max_piece < 1:
        raise ValueError("unigram_train: bad budgets")
    if em not in ("hard", "soft"):
        raise ValueError(f"unigram_train: em must be hard|soft, got {em!r}")
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
            if em == "soft":
                used_rows = soft_em_counts(words, lp, max_piece).collect()
                usedf = {r["piece"]: float(r["e_cnt"]) for r in used_rows}
                # char floor keeps coverage; posteriors never hit exact
                # zero for an occurring piece, so no pruning (see doc)
                counts = {
                    p: usedf.get(p, 0.0) + (1.0 if len(p) == 1 else 0.0)
                    for p in counts
                }
                lp = _lp_e4(counts)
                continue
            used_rows = (
                words.withColumn(
                    "_dp", _viterbi_dp(F.col("w"), lp, max_piece)
                )
                .select(
                    "freq",
                    F.explode(
                        _viterbi_backtrace(F.col("w"), F.col("_dp"))
                    ).alias("piece"),
                )
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
    from .ivf import _round_half_away

    # soft EM carries float expected counts internally; the emitted cnt
    # column stays integral (display/layout), lp_e4 is the model
    return spark.createDataFrame(
        [
            (i, p, lp[p], int(_round_half_away(c, 0)))
            for i, (p, c) in enumerate(layout)
        ],
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
    with_score: bool = False,
) -> DataFrame:
    """Corpus -> (id, n_pieces, pieces) under a trained model: Viterbi
    runs ONCE PER DISTINCT WORD (zero-shuffle fold over the word table),
    then the corpus joins the segmented table word-keyed and reassembles
    with one doc-keyed shuffle — bpe_segment's scale path, with no OOV
    branch because the Viterbi expression is total. ``with_score`` adds
    a ``score`` column: the doc's total integer Viterbi score (the sum
    over word INSTANCES — exact long arithmetic, what the gate leg
    certifies)."""
    lp = _model_map(vocab)
    segw = (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .distinct()
        .withColumn("_dp", _viterbi_dp(F.col("w"), lp, max_piece))
        .select(
            "w",
            _viterbi_backtrace(F.col("w"), F.col("_dp")).alias("wp"),
            _viterbi_score(F.col("w"), F.col("_dp")).alias("ws"),
        )
    )
    pos = docs.select(
        id_col,
        F.posexplode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("pos", "w"),
    )
    joined = pos.join(segw, "w").select(
        id_col, F.struct("pos", "wp").alias("pw"), "ws"
    )
    out = (
        docs.select(id_col)
        .join(
            joined.groupBy(id_col).agg(
                F.flatten(
                    F.transform(
                        F.array_sort(F.collect_list("pw")), lambda s: s["wp"]
                    )
                ).alias("pieces"),
                F.sum("ws").alias("score"),
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.coalesce("pieces", F.array().cast("array<string>")).alias(
                "pieces"
            ),
            F.coalesce("score", F.lit(0).cast("bigint")).alias("score"),
        )
        .select(
            id_col,
            F.size("pieces").alias("n_pieces"),
            "pieces",
            *(["score"] if with_score else []),
        )
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


# ---------- driver-gate SQL twin (fixed demo budgets, ug_ prefix) ----------

#: gate budgets: ONE hard-EM round, max piece 3 (the SQL DP's rolling
#: window is written for exactly 3), vocab 40 (25 corpus chars + 15
#: multi-char pieces at the current fixture)
UNI_GATE_VOCAB = 40
UNI_GATE_ROUNDS = 1
UNI_GATE_MAXP = 3


def _viterbi_sql_ctes(sfx: str, lp_cte: str) -> str:
    """The Viterbi DP as a pair of recursive CTEs over the distinct-word
    table, for max_piece = 3 (UNI_GATE_MAXP — the rolling-window columns
    s0/s1/s2 are the fixed-depth trick: each recursion step advances one
    prefix position carrying the last 3 dp scores, so reaching back
    max_piece positions never needs the recursion's full history).
    Tie policy mirrors the Spark array_max: max score, then the LONGER
    piece (the CASE tests l=3 first with >=). The backtrace is a second
    recursion walking the stored piece lengths. Emits
    ``ug_fin{sfx}(w, ws, bs)`` and ``ug_seg{sfx}(w, ps)``."""
    return f"""
ug_dp{sfx}(w, i, s0, s1, s2, bs) AS (
  SELECT w, 0, CAST(0 AS BIGINT), CAST(NULL AS BIGINT),
         CAST(NULL AS BIGINT), CAST([] AS INT[])
  FROM ug_wf
  UNION ALL
  SELECT w, i + 1,
         CASE WHEN c3 IS NOT NULL AND c3 >= c1
                   AND (c2 IS NULL OR c3 >= c2) THEN c3
              WHEN c2 IS NOT NULL AND c2 >= c1 THEN c2
              ELSE c1 END,
         s0, s1,
         list_append(bs,
           CASE WHEN c3 IS NOT NULL AND c3 >= c1
                     AND (c2 IS NULL OR c3 >= c2) THEN 3
                WHEN c2 IS NOT NULL AND c2 >= c1 THEN 2
                ELSE 1 END)
  FROM (
    SELECT d.w, d.i, d.s0, d.s1, d.s2, d.bs,
           d.s0 + COALESCE(l1.lp, {_NEG}) AS c1,
           CASE WHEN d.i >= 1
                THEN d.s1 + COALESCE(l2.lp, {_NEG}) END AS c2,
           CASE WHEN d.i >= 2
                THEN d.s2 + COALESCE(l3.lp, {_NEG}) END AS c3
    FROM ug_dp{sfx} d
    LEFT JOIN {lp_cte} l1 ON l1.piece = substr(d.w, d.i + 1, 1)
    LEFT JOIN {lp_cte} l2 ON d.i >= 1 AND l2.piece = substr(d.w, d.i, 2)
    LEFT JOIN {lp_cte} l3 ON d.i >= 2 AND l3.piece = substr(d.w, d.i - 1, 3)
    WHERE d.i < length(d.w)
  )
),
ug_fin{sfx} AS MATERIALIZED (
  SELECT w, s0 AS ws, bs FROM ug_dp{sfx} WHERE i = length(w)
),
ug_bt{sfx}(w, i, ps) AS (
  SELECT w, length(w), CAST([] AS VARCHAR[]) FROM ug_fin{sfx}
  UNION ALL
  SELECT b.w, b.i - f.bs[b.i],
         list_prepend(substr(b.w, b.i - f.bs[b.i] + 1, f.bs[b.i]), b.ps)
  FROM ug_bt{sfx} b JOIN ug_fin{sfx} f ON b.w = f.w
  WHERE b.i > 0
),
ug_seg{sfx} AS MATERIALIZED (
  SELECT w, ps FROM ug_bt{sfx} WHERE i = 0
)"""


def unigram_gate_sql(
    vocab_size: int = UNI_GATE_VOCAB, table: str = "documents"
) -> str:
    """DuckDB twin of unigram_train(vocab_size, n_rounds=1, max_piece=3)
    + unigram_segment(with_score) — the whole trained model AND the
    max-likelihood segmentation of the corpus under the driver hash.
    Fully integer DP (float enters only at the two ln() re-estimations,
    ROUND half-away on both engines — pinned in tests/test_unigram.py).
    Emits harmonized gate rows ('ut_vocab', vid, piece, cnt, lp_e4, 0)
    and ('ut_seg', doc_id, md5(pieces), n_pieces, score, 0). Prefix
    ``ug_`` reserved (embedded-oracle namespace ritual)."""
    L = UNI_GATE_MAXP
    lp_of = (
        "SELECT piece, CAST(ROUND(ln(CAST(c AS DOUBLE) / "
        "(SELECT SUM(c) FROM {src})) * 10000, 0) AS BIGINT) AS lp "
        "FROM {src}"
    )
    return f"""
WITH RECURSIVE
ug_wf AS MATERIALIZED (
  SELECT w, COUNT(1) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM {table})
  WHERE w != '' GROUP BY w
),
ug_subs AS MATERIALIZED (
  SELECT substr(w, i, l) AS piece, SUM(freq) AS c
  FROM ug_wf,
       unnest(range(1, length(w) + 1)) AS gi(i),
       unnest(range(1, least({L}, length(w) - i + 1) + 1)) AS gl(l)
  GROUP BY 1
),
ug_chars AS MATERIALIZED (SELECT piece, c FROM ug_subs WHERE length(piece) = 1),
ug_multi AS (
  SELECT piece, c FROM (
    SELECT piece, c, ROW_NUMBER() OVER (ORDER BY c DESC, piece) AS rn
    FROM ug_subs WHERE length(piece) > 1
  ) WHERE rn <= {vocab_size} - (SELECT COUNT(1) FROM ug_chars)
),
ug_cnt0 AS MATERIALIZED (SELECT * FROM ug_chars UNION ALL SELECT * FROM ug_multi),
ug_lp0 AS MATERIALIZED ({lp_of.format(src="ug_cnt0")}),
{_viterbi_sql_ctes("0", "ug_lp0").lstrip()},
ug_used AS MATERIALIZED (
  SELECT u.piece, SUM(f.freq) AS c
  FROM ug_seg0 s, ug_wf f, unnest(s.ps) AS u(piece)
  WHERE s.w = f.w
  GROUP BY 1
),
ug_cnt1 AS MATERIALIZED (
  SELECT v.piece,
         COALESCE(u.c, 0)
           + CASE WHEN length(v.piece) = 1 THEN 1 ELSE 0 END AS c
  FROM ug_cnt0 v LEFT JOIN ug_used u USING (piece)
  WHERE length(v.piece) = 1 OR COALESCE(u.c, 0) > 0
),
ug_lp1 AS MATERIALIZED ({lp_of.format(src="ug_cnt1")}),
{_viterbi_sql_ctes("1", "ug_lp1").lstrip()},
ug_cw AS (
  SELECT doc_id, UNNEST(ws) AS w, UNNEST(range(1, len(ws) + 1)) AS wpos
  FROM (SELECT doc_id, list_filter(string_split(text, ' '),
                                   x -> x != '') AS ws
        FROM {table})
),
ug_docseg AS (
  SELECT c.doc_id,
         flatten(list(g.ps ORDER BY c.wpos)) AS pieces,
         SUM(f.ws) AS score
  FROM ug_cw c
  JOIN ug_seg1 g ON c.w = g.w
  JOIN ug_fin1 f ON c.w = f.w
  GROUP BY c.doc_id
),
ug_vid AS (
  SELECT n.piece, n.c, l.lp,
         ROW_NUMBER() OVER (
           ORDER BY (length(n.piece) > 1),
                    CASE WHEN length(n.piece) = 1 THEN n.piece END,
                    n.c DESC, n.piece) - 1 AS vid
  FROM ug_cnt1 n JOIN ug_lp1 l ON n.piece = l.piece
)
SELECT 'ut_vocab' AS leg, CAST(vid AS BIGINT) AS id, piece AS txt,
       CAST(c AS BIGINT) AS m1, CAST(lp AS BIGINT) AS m2,
       CAST(0 AS BIGINT) AS m3
FROM ug_vid
UNION ALL
SELECT 'ut_seg' AS leg, d.doc_id AS id,
       md5(COALESCE(array_to_string(s.pieces, ' '), '')) AS txt,
       CAST(COALESCE(len(s.pieces), 0) AS BIGINT) AS m1,
       CAST(COALESCE(s.score, 0) AS BIGINT) AS m2,
       CAST(0 AS BIGINT) AS m3
FROM {table} d LEFT JOIN ug_docseg s ON d.doc_id = s.doc_id
"""


def unigram_tokenize_and_pack(
    docs: DataFrame,
    vocab_size: int = UNI_VOCAB,
    n_rounds: int = UNI_ROUNDS,
    max_piece: int = UNI_MAX_PIECE,
    seq_len: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """The end-to-end unigram pretraining tokenization pipeline in one
    call — bpe_tokenize_and_pack's twin for the SentencePiece-style
    model: train on the corpus, encode every document via the word-keyed
    Viterbi segmentation, pack the global id stream into fixed `seq_len`
    windows. Returns (vocab, sequences) where sequences is
    (seq_id, n_tokens, ids). Each stage is certified machinery composed
    (ut_vocab/ut_seg gate legs + the tokpack-certified pack), so this
    owns only the plumbing."""
    from .text import PACK_CONTEXT, pack_token_ids

    vocab = unigram_train(
        docs,
        vocab_size=vocab_size,
        n_rounds=n_rounds,
        max_piece=max_piece,
        text_col=text_col,
    )
    enc = unigram_encode(
        docs,
        vocab,
        max_piece=max_piece,
        text_col=text_col,
        id_col=id_col,
        # pack_token_ids' groupBy(seq_id) destroys order (the bpe
        # composition's ordered=False contract)
        ordered=False,
    )
    seqs = pack_token_ids(
        enc.withColumnRenamed(id_col, "doc_id"),
        seq_len=seq_len or PACK_CONTEXT,
    )
    return vocab, seqs


# ---------- soft EM (the genuine Kudo E-step) ----------

#: float log-domain floor for out-of-vocab pieces in the soft E-step
#: (exp of it underflows to exactly 0.0 — the piece contributes nothing)
_NEG_F = -1.0e9


def _lsum(cands: Column) -> Column:
    """logsumexp of a small candidate array: max + ln(sum(exp(x - max))),
    the sum a SEQUENTIAL left fold so the pure-Python reference mirrors
    the op order bit-for-bit (only libm ulps differ)."""
    mx = F.array_max(cands)
    return mx + F.log(
        F.aggregate(
            F.transform(cands, lambda x: F.exp(x - mx)),
            F.lit(0.0),
            lambda a, v: a + v,
        )
    )


def _alpha_dp(
    word: Column,
    lp: dict[str, int],
    max_piece: int,
    exclude: Column | None = None,
) -> Column:
    """Forward log-probabilities alpha[0..n] of the unigram lattice as
    one narrow fold (alpha[k+1] = logsumexp over pieces ending the
    length-k prefix). Scores are float nats = lp_e4 / 1e4. The BACKWARD
    pass needs no second implementation: beta over suffixes of w equals
    alpha over prefixes of reverse(w) under the reversed-key map, so
    callers run this same fold twice (the column-landing discipline of
    _viterbi_dp applies: land each in a real column).

    ``exclude`` (a string column): score that piece as out-of-vocab —
    the leave-one-out lattice the pruning loss needs, per ROW, so one
    narrow job scores every (word, candidate) pair."""
    m = F.create_map(*[F.lit(x) for kv in lp.items() for x in kv])

    def lpf(piece: Column) -> Column:
        base = F.coalesce(
            F.element_at(m, piece) / F.lit(10_000.0), F.lit(_NEG_F)
        )
        if exclude is None:
            return base
        return F.when(piece == exclude, F.lit(_NEG_F)).otherwise(base)

    def step(acc: Column, i: Column) -> Column:
        cands = F.array(
            *[
                F.when(
                    F.lit(length) <= i,
                    F.element_at(acc, i - F.lit(length) + 1)
                    + lpf(word.substr(i - F.lit(length) + 1, F.lit(length))),
                ).otherwise(F.lit(2.0 * _NEG_F))
                for length in range(1, max_piece + 1)
            ]
        )
        return F.concat(acc, F.array(_lsum(cands)))

    return F.aggregate(
        F.sequence(F.lit(1), F.length(word)),
        F.array(F.lit(0.0)),
        step,
    )


def soft_em_counts(
    words: DataFrame, lp: dict[str, int], max_piece: int
) -> DataFrame:
    """ONE soft-EM E-step over the distinct-word table: expected piece
    counts E[c(piece)] = sum over words freq * sum over occurrences
    exp(alpha[i] + lp(piece) + beta[i+l] - alpha[n]) — the Kudo (2018)
    forward-backward posterior, replacing hard EM's Viterbi argmax
    counts. Returns (piece, e_cnt double), in-vocab pieces only.
    Zero shuffle up to the final vocabulary-sized aggregation; the two
    lattice folds land in real columns (the _viterbi_dp lesson)."""
    m = F.create_map(*[F.lit(x) for kv in lp.items() for x in kv])
    lp_rev = {p[::-1]: v for p, v in lp.items()}

    def lpf(piece: Column) -> Column:
        return F.coalesce(
            F.element_at(m, piece) / F.lit(10_000.0), F.lit(_NEG_F)
        )

    n = F.length("w")
    wa = (
        words.withColumn("_a", _alpha_dp(F.col("w"), lp, max_piece))
        .withColumn(
            "_ar", _alpha_dp(F.reverse(F.col("w")), lp_rev, max_piece)
        )
    )
    occ = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(max_piece), n - i)),
                lambda le: F.struct(
                    F.col("w").substr(i + 1, le).alias("piece"),
                    (
                        F.element_at("_a", i + 1)
                        + lpf(F.col("w").substr(i + 1, le))
                        + F.element_at("_ar", n - (i + le) + 1)
                        - F.element_at("_a", n + 1)
                    ).alias("lg"),
                ),
            ),
        )
    )
    return (
        wa.select("freq", F.explode(occ).alias("o"))
        .filter(F.element_at(m, F.col("o.piece")).isNotNull())
        .select(
            F.col("o.piece").alias("piece"),
            (F.col("freq") * F.exp("o.lg")).alias("e"),
        )
        .groupBy("piece")
        .agg(F.sum("e").alias("e_cnt"))
    )


def piece_loss(
    words: DataFrame, lp: dict[str, int], max_piece: int
) -> DataFrame:
    """Kudo's pruning signal: for every prune-ABLE piece (multi-char —
    single characters are the coverage floor and never candidates),
    loss(p) = sum over words freq * (alpha[n] - alpha_without_p[n]) —
    the exact corpus log-likelihood drop if p left the vocabulary.
    Returns (piece, loss) with loss >= 0 in float nats.

    Shape: the |words| x |candidates| grid is BOUNDED (distinct words x
    multi-char vocab), built with a broadcast cross join; both lattices
    are narrow folds per grid row (the exclude column drives the
    leave-one-out), and ONE vocabulary-sized aggregation sums the
    per-word deltas. No corpus pass at all."""
    spark = words.sparkSession
    cands = [p for p in lp if len(p) > 1]
    if not cands:
        return spark.createDataFrame([], "piece string, loss double")
    cdf = spark.createDataFrame([(p,) for p in cands], "piece string")
    grid = (
        words.crossJoin(F.broadcast(cdf))
        .withColumn("_af", _alpha_dp(F.col("w"), lp, max_piece))
        .withColumn(
            "_ax",
            _alpha_dp(F.col("w"), lp, max_piece, exclude=F.col("piece")),
        )
    )
    n = F.length("w")
    return (
        grid.select(
            "piece",
            (
                F.col("freq")
                * (F.element_at("_af", n + 1) - F.element_at("_ax", n + 1))
            ).alias("d"),
        )
        .groupBy("piece")
        .agg(F.sum("d").alias("loss"))
    )


def unigram_prune(
    docs: DataFrame,
    vocab: DataFrame,
    target_size: int,
    max_piece: int = UNI_MAX_PIECE,
    text_col: str = "text",
) -> DataFrame:
    """Kudo's vocabulary-shrink step: drop the LOWEST-loss multi-char
    pieces until ``target_size`` remains (single characters are never
    dropped — coverage floor), then re-normalize scores over the
    survivors' counts. Ties break (loss ASC, piece ASC) —
    deterministic. Returns the pruned model in the same
    (id, piece, lp_e4, cnt) layout as unigram_train.

    The full Kudo loop is seed-large -> EM -> prune -> EM -> ... ;
    compose this with unigram_train(em='soft') per shrink round."""
    rows = {r["piece"]: (int(r["lp_e4"]), int(r["cnt"])) for r in vocab.collect()}
    lp = {p: v[0] for p, v in rows.items()}
    singles = {p for p in rows if len(p) == 1}
    n_drop = len(rows) - max(target_size, len(singles))
    if n_drop <= 0:
        return vocab
    words = _words_of(docs, text_col)
    losses = {
        r["piece"]: float(r["loss"])
        for r in piece_loss(words, lp, max_piece).collect()
    }
    drop = {
        p
        for p, _ in sorted(
            ((p, losses.get(p, 0.0)) for p in rows if p not in singles),
            key=lambda kv: (kv[1], kv[0]),
        )[:n_drop]
    }
    counts = {p: rows[p][1] for p in rows if p not in drop}
    lp2 = _lp_e4(counts)
    spark = docs.sparkSession
    s = sorted((p, c) for p, c in counts.items() if len(p) == 1)
    m = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )
    return spark.createDataFrame(
        [(i, p, lp2[p], c) for i, (p, c) in enumerate(s + m)],
        "id int, piece string, lp_e4 bigint, cnt bigint",
    )
