"""Text-analysis operators over the documents table (SURVEY.md §2.11 +
BASELINE.json north star: "text analysis").

All pure column algebra — tokenization, quality scoring, language ID, and
fingerprinting run inside whole-stage codegen. The only state is literal
marker/stopword arrays, broadcast as constants in the plan. At 100 TB these
are embarrassingly parallel narrow maps: no shuffle at all.

Portability notes for the DuckDB oracle:
  - documents.text is single-spaced lowercase ASCII (verified), so
    tokenization is split-on-space in both engines.
  - hashes go through md5 (identical hex in both); numeric token hashing
    parses the first 15 md5 hex chars to a 60-bit BIGINT (Spark conv(,16,10),
    DuckDB CAST('0x…' AS BIGINT)).
  - element_at/list_extract are both 1-based (Spark's `arr[i]` is 0-based —
    never used here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import clean_text
from ..io import load_table, load_table_parallel

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "for")

# marker words per language for the n-gram/keyword language-ID heuristic;
# precedence (tie-break) order is the tuple order below.
LANG_MARKERS = (
    ("en", ("the", "and", "fast", "slow")),
    ("de", ("der", "die", "und", "nicht")),
    ("es", ("el", "los", "y", "que")),
    ("fr", ("le", "la", "et", "est")),
    ("zh", ("shi", "de", "bu", "le")),
)


def tokens_col(col: Column | str = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def _toks_of(docs: DataFrame) -> Column:
    """Pre-staged token array when the caller supplies one (`ts` column —
    the shared tokenized checkpoint `_docs_tokenized_cached` feeds the
    quality-gate legs), else split in place. One helper so every text
    operator can consume the shared subtree without changing its
    standalone (raw-docs) behavior.

    The dispatch requires `ts` to actually BE a string array (review
    r12): `ts` is also the events table's timestamp column name, and a
    name-only check would silently misread an enriched documents frame
    carrying an event timestamp as pre-tokenized."""
    if dict(docs.dtypes).get("ts") == "array<string>":
        return F.col("ts")
    return tokens_col()


def token_hash60(col: Column) -> Column:
    """Portable 60-bit token hash: first 15 hex chars of md5 -> BIGINT.

    Same value as DuckDB's CAST('0x' || substr(md5(t),1,15) AS BIGINT);
    used by dedup.py's MinHash/SimHash so the oracle can replicate them.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


TOKEN_HASH60_SQL = "CAST(concat('0x', substr(md5({t}), 1, 15)) AS BIGINT)"


def q_doc_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clean_text (F1) semantics applied at corpus scale: whitespace
    normalization + truncate-with-ellipsis (the reference's +3 contract)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", clean_text(F.col("text"), max_length=100).alias("cleaned"))
        .select("doc_id", "cleaned", F.length("cleaned").alias("cleaned_len"))
        .orderBy("doc_id")
    )


from ..functions.core import WS_RUN as _WS

DOC_CLEAN_SQL = f"""
WITH c AS (
  SELECT doc_id, trim(regexp_replace(text, '{_WS}', ' ', 'g')) AS ct
  FROM documents
), t AS (
  SELECT doc_id,
         CASE WHEN length(ct) > 100 THEN substr(ct, 1, 100) || '...' ELSE ct END AS cleaned
  FROM c
)
SELECT doc_id, cleaned, length(cleaned) AS cleaned_len
FROM t ORDER BY doc_id
"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, avg token length."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    toks = tokens_col()
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    n = F.size(toks)
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.round(total_len.cast("double") / n, 6).alias("avg_token_len"),
    ).orderBy("doc_id")


TOKEN_STATS_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct,
       ROUND(CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t)))
                  AS DOUBLE) / len(string_split(text, ' ')), 6) AS avg_token_len
FROM documents ORDER BY doc_id
"""


def quality_score_bp_col(toks: Column | None = None) -> Column:
    """Integer basis-point quality score (0..10000) over the `text` /
    `n_chars` columns: length band + stopword ratio + type/token ratio.
    Shared by the q_quality_score gate, quality_threshold_sweep, the
    corpus report, and the doc_stats gate so they can't drift. Floor over
    exact integer ratios — a float composite (0.4*x + 0.3*y …) lands on
    round-half boundaries where Spark (HALF_UP) and DuckDB disagree in
    the last digit; integer math can't. Pass a pre-staged token-array
    column to reuse an aliased split (the staged-projection callers)."""
    toks = tokens_col() if toks is None else toks
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_dist = F.size(F.array_distinct(toks))
    len_ok = (F.col("n_chars") >= 100) & (F.col("n_chars") <= 2000)
    return (
        F.when(len_ok, F.lit(4000)).otherwise(F.lit(0))
        + F.floor(n_stop * 3000 / n).cast("bigint")
        + F.floor(n_dist * 3000 / n).cast("bigint")
    )


def lang_score_cols(toks: Column) -> list[Column]:
    """Per-language marker-count columns (aliased s_<lang>), built from a
    pre-staged token array — THE marker-count definition, shared by the
    q_lang_id library API and the doc_stats gate."""
    cols = []
    for lang, markers in LANG_MARKERS:
        arr = F.array(*[F.lit(m) for m in markers])
        cols.append(
            F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias(f"s_{lang}")
        )
    return cols


def lang_pred_col() -> Column:
    """Fixed-precedence argmax over the s_<lang> columns staged by
    lang_score_cols — shared by q_lang_id and the doc_stats gate."""
    s = {lang: F.col(f"s_{lang}") for lang, _ in LANG_MARKERS}
    return (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"])
            & (s["en"] >= s["fr"]) & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] >= s["zh"]), "de")
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["zh"]), "es")
        .when(s["fr"] >= s["zh"], "fr")
        .otherwise("zh")
    )


def min_shingle_fp(toks: Column, full_fp: Column) -> Column:
    """Min word-3-gram md5 shingle fingerprint with the full-content md5
    as the short-doc fallback — THE shingle-fingerprint definition, shared
    by q_fingerprint and the doc_stats gate. The n >= 3 guard exists
    because Spark's sequence(1, 0) is descending [1, 0], so a short doc
    would index past the token array (see dedup._shingles)."""
    n = F.size(toks)
    shingles = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.md5(
                F.concat_ws(
                    " ",
                    F.element_at(toks, i),
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                )
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.coalesce(F.array_min(shingles), full_fp)


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length band + stopword ratio + type/token ratio,
    combined into one deterministic [0,1] score."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    toks = tokens_col()
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    stop_ratio = F.round(n_stop.cast("double") / n, 6)
    ttr = F.round(F.size(F.array_distinct(toks)).cast("double") / n, 6)
    score_bp = quality_score_bp_col()
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("type_token_ratio"),
        score_bp.alias("quality_score_bp"),
    ).orderBy("doc_id")


_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


def quality_score_bp_sql(ts: str = "ts", n_chars: str = "n_chars") -> str:
    """quality_score_bp_col's formula as a DuckDB expression over a token
    LIST column — THE shared oracle fragment (review r13: dsir_sql had
    hand-copied the formula with a literal stopword list; a STOPWORDS or
    formula edit would have silently left that oracle computing the old
    rule while the Spark side moved)."""
    return (
        f"(CASE WHEN {n_chars} BETWEEN 100 AND 2000 THEN 4000 ELSE 0 END"
        f" + CAST(FLOOR(len(list_filter({ts}, t -> list_contains("
        f"{_STOP_SQL}, t))) * 3000 / len({ts})) AS BIGINT)"
        f" + CAST(FLOOR(len(list_distinct({ts})) * 3000 / len({ts}))"
        f" AS BIGINT))"
    )

QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id, n_chars, len(toks) AS n,
         len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS n_stop,
         len(list_distinct(toks)) AS n_dist
  FROM t
)
SELECT doc_id, n AS n_tokens,
       ROUND(CAST(n_stop AS DOUBLE) / n, 6) AS stopword_ratio,
       ROUND(CAST(n_dist AS DOUBLE) / n, 6) AS type_token_ratio,
       CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 4000 ELSE 0 END
         + CAST(FLOOR(n_stop * 3000 / n) AS BIGINT)
         + CAST(FLOOR(n_dist * 3000 / n) AS BIGINT) AS quality_score_bp
FROM m ORDER BY doc_id
"""


def quality_threshold_sweep(docs: DataFrame, bucket_bp: int = 500) -> DataFrame:
    """Filter-tuning curve: for each quality-score cutoff, how many docs
    and tokens survive — the table a practitioner reads before choosing
    the quality gate for a training corpus (too strict starves the token
    budget, too loose admits garbage; this shows the whole trade-off in
    one pass instead of re-running the filter per candidate threshold).

    One shuffle: scores bucket to `bucket_bp`-wide bands and aggregate
    per band (<= 10000/bucket_bp + 1 groups). The cumulative legs then
    run as windows over that band table — ~21 rows, so the single-
    partition window is driver-trivial BY CONSTRUCTION (the unbounded
    window never sees doc cardinality; at 100 TB the band table is still
    21 rows). token share is exact integer ppm (bigint `div`) so the
    DuckDB twin reproduces it bit-for-bit.

    Output per band lower-edge T: n_docs_kept / n_tokens_kept /
    token_share_ppm for the filter `score_bp >= T`.
    """
    toks = _toks_of(docs)
    per_doc = docs.select(
        quality_score_bp_col(toks).alias("score_bp"), F.size(toks).alias("_nt")
    )
    band = (F.floor(F.col("score_bp") / bucket_bp) * bucket_bp).cast("bigint")
    per_band = per_doc.groupBy(band.alias("threshold_bp")).agg(
        F.count(F.lit(1)).alias("_docs"), F.sum("_nt").alias("_tokens")
    )
    w_cum = Window.orderBy(F.desc("threshold_bp")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(F.desc("threshold_bp")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per_band.select(
            "threshold_bp",
            F.sum("_docs").over(w_cum).alias("n_docs_kept"),
            F.sum("_tokens").over(w_cum).alias("n_tokens_kept"),
            F.sum("_tokens").over(w_all).alias("_all_tokens"),
        )
        .select(
            "threshold_bp",
            "n_docs_kept",
            "n_tokens_kept",
            # DECIMAL(38,0) product: cum_tokens * 1e6 overflows BIGINT at
            # ~9.2e12 tokens — inside this operator's own 100 TB design
            # point (DuckDB's window SUM promotes to HUGEINT and survives;
            # the Spark side must widen explicitly)
            F.expr(
                "CAST(CAST(n_tokens_kept AS DECIMAL(38,0)) * 1000000"
                " DIV _all_tokens AS BIGINT)"
            ).alias("token_share_ppm"),
        )
        .orderBy("threshold_bp")
    )


def quality_threshold_sweep_sql(bucket_bp: int = 500, table: str = "documents") -> str:
    """DuckDB twin of quality_threshold_sweep (same integer band/cumsum
    arithmetic, generated from the same bucket width)."""
    return f"""
WITH m AS (
  SELECT doc_id, n_chars, len(toks) AS n,
         len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS n_stop,
         len(list_distinct(toks)) AS n_dist
  FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM {table}) t
), s AS (
  SELECT CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 4000 ELSE 0 END
           + CAST(FLOOR(n_stop * 3000 / n) AS BIGINT)
           + CAST(FLOOR(n_dist * 3000 / n) AS BIGINT) AS score_bp,
         n
  FROM m
), b AS (
  SELECT CAST(FLOOR(score_bp / {bucket_bp}) AS BIGINT) * {bucket_bp} AS threshold_bp,
         COUNT(1) AS b_docs, SUM(n) AS b_tokens
  FROM s GROUP BY 1
)
SELECT threshold_bp,
       SUM(b_docs) OVER (ORDER BY threshold_bp DESC) AS n_docs_kept,
       SUM(b_tokens) OVER (ORDER BY threshold_bp DESC) AS n_tokens_kept,
       (SUM(b_tokens) OVER (ORDER BY threshold_bp DESC)) * 1000000
         // (SUM(b_tokens) OVER ()) AS token_share_ppm
FROM b ORDER BY threshold_bp
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword/n-gram language-ID heuristic: per-language marker counts,
    argmax with fixed precedence; compared against the labeled lang column."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    # staged projections: split once, score each language once, decide once
    # — referencing the marker-count expressions through aliases keeps every
    # list_filter to a single evaluation per row (CollapseProject would
    # otherwise inline the 5 scores into each branch of the argmax).
    toked = docs.select("doc_id", "lang", tokens_col().alias("toks"))
    scored = toked.select("doc_id", "lang", *lang_score_cols(F.col("toks")))
    return (
        scored.select("doc_id", "lang", lang_pred_col().alias("pred_lang"))
        .select(
            "doc_id",
            "lang",
            "pred_lang",
            (F.col("pred_lang") == F.col("lang")).alias("correct"),
        )
        .orderBy("doc_id")
    )


def _marker_sql(markers: tuple[str, ...]) -> str:
    arr = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    return f"len(list_filter(toks, x -> list_contains({arr}, x)))"


_M = {lang: _marker_sql(m) for lang, m in LANG_MARKERS}

LANG_ID_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
), s AS (
  SELECT doc_id, lang,
         {_M['en']} AS s_en, {_M['de']} AS s_de, {_M['es']} AS s_es,
         {_M['fr']} AS s_fr, {_M['zh']} AS s_zh
  FROM t
)
SELECT doc_id, lang,
       CASE
         WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         WHEN s_fr >= s_zh THEN 'fr'
         ELSE 'zh'
       END AS pred_lang,
       CASE
         WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         WHEN s_fr >= s_zh THEN 'fr'
         ELSE 'zh'
       END = lang AS correct
FROM s ORDER BY doc_id
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: full-content md5 + min word-3-gram shingle
    fingerprint (the content-defined analog of a rolling hash)."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    full_fp = F.md5(F.col("text"))
    return docs.select(
        "doc_id",
        full_fp.alias("content_fp"),
        min_shingle_fp(tokens_col(), full_fp).alias("shingle_fp"),
    ).orderBy("doc_id")


FINGERPRINT_SQL = """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id,
       md5(text) AS content_fp,
       COALESCE(
         list_aggregate(
           list_transform(
             generate_series(1, len(toks) - 2),
             i -> md5(concat_ws(' ', list_extract(toks, i),
                                list_extract(toks, i + 1),
                                list_extract(toks, i + 2)))
           ), 'min'),
         md5(text)) AS shingle_fp
FROM t ORDER BY doc_id
"""


# GPT-2-style pretokenizer, simplified to the RE2-compatible subset (no
# lookahead — DuckDB's regex engine rejects it): a piece is an optionally
# space-prefixed letter run, digit run, or punctuation run.
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, BPE-pretokenizer flavor: pieces per document and the
    pieces-per-whitespace-word ratio (integer ppm) — the standard proxy for
    LLM token cost of a corpus (whitespace flavor: doc_token_stats)."""
    docs = load_table(spark, sf_dir, "documents")
    pieces = F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0)))
    words = F.size(tokens_col())
    # staged: the regex pretokenizer runs once per row; the ppm ratio reads
    # the aliased counts instead of re-running regex + split
    return (
        docs.select("doc_id", pieces.alias("n_pieces"), words.alias("n_words"))
        .select(
            "doc_id",
            "n_pieces",
            "n_words",
            F.expr("CAST(n_pieces AS BIGINT) * 1000000 DIV n_words").alias(
                "pieces_per_word_ppm"
            ),
        )
        .orderBy("doc_id")
    )


BPE_TOKEN_SQL = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_pieces,
       len(string_split(text, ' ')) AS n_words,
       (CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT) * 1000000)
         // len(string_split(text, ' ')) AS pieces_per_word_ppm
FROM documents ORDER BY doc_id
"""


def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined per-document stats gate: token counts, quality score,
    fingerprints, AND the language-ID heuristic in ONE narrow map over the
    corpus — the shape a real pipeline uses (one scan, many derived
    columns) and one driver slot instead of five. The standalone
    q_token_stats / q_quality_score / q_fingerprint / q_lang_id /
    q_bpe_token_count remain the library API (pinned by tests); lang-ID
    merged here per VERDICT r03 gate rotation, the BPE piece counts per
    VERDICT r04 (frees the slot for the redaction family)."""
    docs = load_table_parallel(spark, sf_dir, "documents")
    # Two-phase projection (same trick as dedup._doc_shingle_df): alias the
    # token array once so split(text) runs once per row — the nine derived
    # expressions below all reference `toks`, and CollapseProject would
    # otherwise inline the split into each of them.
    docs = docs.select("doc_id", "text", "n_chars", "lang", tokens_col().alias("toks"))
    # Stage the per-language marker counts behind aliases for the same
    # reason: the argmax CASE references each score several times. All
    # shared definitions come from the module helpers (lang_score_cols /
    # lang_pred_col / quality_score_bp_col / min_shingle_fp) so this gate
    # CANNOT drift from the standalone library operators or their twins.
    docs = docs.select(
        "doc_id", "text", "n_chars", "lang", "toks", *lang_score_cols(F.col("toks"))
    )
    pred = lang_pred_col()
    toks = F.col("toks")
    n = F.size(toks)
    n_dist = F.size(F.array_distinct(toks))
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    full_fp = F.md5(F.col("text"))
    # doc_clean_text's F1 leg (whitespace-normalize + truncate-with-ellipsis)
    # folded in since round 3 — same scan, one driver slot freed for the
    # corpus_assembly gate; the standalone q_doc_clean stays the library API.
    cleaned = clean_text(F.col("text"), max_length=100)
    return (
        docs.select(
            "doc_id",
            n.alias("n_tokens"),
            n_dist.alias("n_distinct"),
            F.round(total_len.cast("double") / n, 6).alias("avg_token_len"),
            F.round(n_stop.cast("double") / n, 6).alias("stopword_ratio"),
            F.round(n_dist.cast("double") / n, 6).alias("type_token_ratio"),
            quality_score_bp_col(toks).alias("quality_score_bp"),
            full_fp.alias("content_fp"),
            min_shingle_fp(toks, full_fp).alias("shingle_fp"),
            cleaned.alias("cleaned"),
            "lang",
            pred.alias("pred_lang"),
            (pred == F.col("lang")).alias("lang_correct"),
            F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0))).alias(
                "n_pieces"
            ),
        )
        .withColumn("cleaned_len", F.length("cleaned"))
        # reads the aliased counts so the BPE regex and the split each ran
        # exactly once per row (same staging rule as q_bpe_token_count)
        .withColumn(
            "pieces_per_word_ppm",
            F.expr("CAST(n_pieces AS BIGINT) * 1000000 DIV n_tokens"),
        )
        .orderBy("doc_id")
    )


DOC_STATS_SQL = f"""
WITH t AS (
  SELECT doc_id, text, n_chars, lang, string_split(text, ' ') AS toks,
         trim(regexp_replace(text, '{_WS}', ' ', 'g')) AS ct
  FROM documents
), m AS (
  SELECT doc_id, text, n_chars, lang, toks, len(toks) AS n,
         len(list_distinct(toks)) AS n_dist,
         len(list_filter(toks, x -> list_contains({_STOP_SQL}, x))) AS n_stop,
         {_M['en']} AS s_en, {_M['de']} AS s_de, {_M['es']} AS s_es,
         {_M['fr']} AS s_fr, {_M['zh']} AS s_zh,
         CASE WHEN length(ct) > 100 THEN substr(ct, 1, 100) || '...' ELSE ct END AS cleaned
  FROM t
), p AS (
  SELECT *,
         CASE
           WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
           WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
           WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
           WHEN s_fr >= s_zh THEN 'fr'
           ELSE 'zh'
         END AS pred_lang
  FROM m
)
SELECT doc_id,
       n AS n_tokens,
       n_dist AS n_distinct,
       ROUND(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / n, 6)
         AS avg_token_len,
       ROUND(CAST(n_stop AS DOUBLE) / n, 6) AS stopword_ratio,
       ROUND(CAST(n_dist AS DOUBLE) / n, 6) AS type_token_ratio,
       CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 4000 ELSE 0 END
         + CAST(FLOOR(n_stop * 3000 / n) AS BIGINT)
         + CAST(FLOOR(n_dist * 3000 / n) AS BIGINT) AS quality_score_bp,
       md5(text) AS content_fp,
       COALESCE(
         list_aggregate(
           list_transform(
             generate_series(1, n - 2),
             i -> md5(concat_ws(' ', list_extract(toks, i),
                                list_extract(toks, i + 1),
                                list_extract(toks, i + 2)))
           ), 'min'),
         md5(text)) AS shingle_fp,
       cleaned,
       lang,
       pred_lang,
       pred_lang = lang AS lang_correct,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_pieces,
       length(cleaned) AS cleaned_len,
       (CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT) * 1000000)
         // n AS pieces_per_word_ppm
FROM p ORDER BY doc_id
"""


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1.2, public):
    the quality signals a pretraining pipeline cuts on beyond simple
    length/stopword ratios. All integer ppm so the DuckDB oracle compares
    exactly.

      dup_sent_ppm      fraction of '. '-sentences that are duplicates of an
                        earlier sentence in the SAME doc — pure array
                        algebra (size - size(array_distinct)), no shuffle
      dup_token_ppm     same for whitespace tokens
      top_bigram_ppm    occurrences of the doc's most frequent word bigram
                        over total bigrams — the "top 2-gram fraction" cut.
                        A PER-DOC quantity, so it stays a narrow map: sort
                        the doc's bigram array and fold it for the longest
                        run of equal adjacent elements (max multiplicity) —
                        zero shuffle at any scale. The previous form
                        exploded every bigram into a corpus-wide
                        (doc_id, bigram) aggregation: two shuffles of
                        token-cardinality rows to compute a row-local
                        statistic (measured 8.9 s vs 1.3 s at sf0.1).

    Emits one row per doc: repetitive docs (boilerplate, keyword stuffing,
    template spam) score high and get cut by thresholding downstream.
    """
    sents = F.split("text", "\\. ")
    toks = _toks_of(docs)
    base = docs.select(
        "doc_id",
        sents.alias("sents"),
        toks.alias("toks"),
    ).select(
        "doc_id",
        F.size("sents").alias("n_sents"),
        F.size(F.array_distinct("sents")).alias("n_sents_d"),
        F.size("toks").alias("n_toks"),
        F.size(F.array_distinct("toks")).alias("n_toks_d"),
        # guarded: Spark's sequence(1, 0) is DESCENDING [1, 0] (DuckDB's
        # generate_series is empty), so a 1-token doc needs the CASE
        F.expr(
            "CASE WHEN size(toks) > 1 THEN transform(sequence(1, size(toks) - 1),"
            " i -> concat_ws(' ', toks[i - 1], toks[i]))"
            " ELSE CAST(array() AS array<string>) END"
        ).alias("bigrams"),
    )
    # max bigram multiplicity = longest run of equal adjacent elements in
    # the SORTED bigram array — a left fold with (prev, run, best) state.
    # A bigram is never the empty string (concat_ws always embeds the
    # separator space), so '' is a safe initial `prev`.
    top_c = F.aggregate(
        F.array_sort("bigrams"),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, g: F.struct(
            g.alias("prev"),
            F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return (
        base.select(
            "doc_id",
            F.expr("(n_sents - n_sents_d) * 1000000 DIV n_sents").alias("dup_sent_ppm"),
            F.expr("(n_toks - n_toks_d) * 1000000 DIV n_toks").alias("dup_token_ppm"),
            top_c.cast("bigint").alias("_top_c"),
            F.size("bigrams").cast("bigint").alias("_n_grams"),
        )
        .select(
            "doc_id",
            "dup_sent_ppm",
            "dup_token_ppm",
            F.when(
                F.col("_n_grams") > 0,
                F.expr("_top_c * 1000000 DIV _n_grams"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("top_bigram_ppm"),
        )
        .orderBy("doc_id")
    )


REPETITION_SQL = """
WITH base AS (
  SELECT doc_id, string_split(text, '. ') AS sents, string_split(text, ' ') AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         len(sents) AS n_sents, len(list_distinct(sents)) AS n_sents_d,
         len(toks) AS n_toks, len(list_distinct(toks)) AS n_toks_d,
         list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                        i -> concat_ws(' ', toks[i], toks[i + 1])) AS bigrams
  FROM base
), grams AS (
  SELECT doc_id, g FROM m, unnest(bigrams) AS u(g)
), per AS (
  SELECT doc_id, g, COUNT(1) AS c FROM grams GROUP BY doc_id, g
), top AS (
  SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_grams FROM per GROUP BY doc_id
)
SELECT m.doc_id,
       (n_sents - n_sents_d) * 1000000 // n_sents AS dup_sent_ppm,
       (n_toks - n_toks_d) * 1000000 // n_toks AS dup_token_ppm,
       CAST(COALESCE(top_c * 1000000 // n_grams, 0) AS BIGINT) AS top_bigram_ppm
FROM m LEFT JOIN top ON m.doc_id = top.doc_id
ORDER BY m.doc_id
"""


# Gopher document-quality rule constants (Rae et al. 2021 §A1.1, public).
# Word-count and stopword floors are the paper's own (50 words, >=2
# stopwords); the mean-word-length band is corpus-adapted ([4.00, 5.00]
# chars in a 1e-2 grid — the paper's [3, 10] never fires on the synthetic
# corpus, the same measured-distribution tightening as the verdict leg's
# VERDICT_*_PPM thresholds) so the rule is live at every test SF; the
# symbol-ratio and alpha-fraction caps are the paper's (10% / 80%) and are
# certified-but-passing here (the corpus has no '#'/'...' symbols and every
# token is alphabetic). The paper's bullet-/ellipsis-LINE rules are omitted:
# the corpus has no newlines, so every doc is one line and the rule is
# structurally constant, not merely passing.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_LO_C = 400  # mean word length, 1e-2 chars
GOPHER_MWL_HI_C = 500
GOPHER_SYM_PPM_MAX = 100_000  # '#'/'...'-token share <= 10%
GOPHER_ALPHA_PPM_MIN = 800_000  # >=80% tokens contain [a-z]
GOPHER_MIN_STOP = 2  # >=2 DISTINCT stopwords (STOPWORDS list)


def gopher_rules(docs: DataFrame, ordered: bool = True) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021 §A1.1) with
    first-failing-rule precedence — the canonical pretraining document
    filter, next to the repo's own quality_score_bp formula.

    Codes in precedence (paper) order: 'words' (count outside
    [GOPHER_MIN_WORDS, GOPHER_MAX_WORDS]), 'mwl' (mean word length
    outside the band), 'sym' (symbol-to-word ratio over the cap),
    'alpha' (alphabetic-token fraction under the floor), 'stop' (fewer
    than GOPHER_MIN_STOP distinct STOPWORDS), else 'keep'.

    All arithmetic is integer (1e-2 char grid, ppm shares) so the DuckDB
    oracle compares exactly. Zero shuffle: one narrow map over the shared
    tokenized checkpoint — the repetition leg's scale shape.
    ``ordered=False`` skips the presentation sort (the gate union
    re-sorts — the established ordered-flag convention).
    """
    toks = _toks_of(docs)
    base = docs.select(
        "doc_id",
        F.size(toks).alias("n"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        ).alias("sum_len"),
        F.size(
            F.filter(toks, lambda t: t.contains("#") | t.contains("..."))
        ).alias("n_sym"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).alias("n_alpha"),
        F.size(
            F.array_distinct(
                F.filter(toks, lambda t: t.isin(*STOPWORDS))
            )
        ).alias("n_stop_d"),
    )
    m = base.select(
        "doc_id",
        "n",
        F.expr("sum_len * 100 DIV n").alias("mwl_c100"),
        F.expr("n_sym * 1000000 DIV n").alias("sym_ppm"),
        F.expr("n_alpha * 1000000 DIV n").alias("alpha_ppm"),
        "n_stop_d",
    )
    code = (
        F.when(
            (F.col("n") < GOPHER_MIN_WORDS) | (F.col("n") > GOPHER_MAX_WORDS),
            F.lit("words"),
        )
        .when(
            (F.col("mwl_c100") < GOPHER_MWL_LO_C)
            | (F.col("mwl_c100") > GOPHER_MWL_HI_C),
            F.lit("mwl"),
        )
        .when(F.col("sym_ppm") > GOPHER_SYM_PPM_MAX, F.lit("sym"))
        .when(F.col("alpha_ppm") < GOPHER_ALPHA_PPM_MIN, F.lit("alpha"))
        .when(F.col("n_stop_d") < GOPHER_MIN_STOP, F.lit("stop"))
        .otherwise(F.lit("keep"))
    )
    out = m.select(
        "doc_id",
        code.alias("code"),
        (code == "keep").cast("bigint").alias("keep"),
        F.col("n").cast("bigint").alias("n_words"),
        F.col("mwl_c100").cast("bigint").alias("mwl_c100"),
    )
    return out.orderBy("doc_id") if ordered else out


def gopher_rules_sql(table: str = "documents") -> str:
    """gopher_rules as one DuckDB query over the same integer grids; the
    stopword list rides the shared _STOP_SQL fragment (review r13: a
    hand-copied list is the drift class)."""
    return f"""
WITH gp_t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM {table}
), gp_m AS (
  SELECT doc_id, len(toks) AS n,
         (SELECT SUM(length(x.t)) FROM unnest(toks) AS x(t)) * 100 // len(toks)
           AS mwl_c100,
         len(list_filter(toks, t -> contains(t, '#') OR contains(t, '...')))
           * 1000000 // len(toks) AS sym_ppm,
         len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
           * 1000000 // len(toks) AS alpha_ppm,
         len(list_distinct(list_filter(toks, t -> list_contains({_STOP_SQL}, t))))
           AS n_stop_d
  FROM gp_t
), gp_c AS (
  SELECT doc_id, n, mwl_c100,
         CASE
           WHEN n < {GOPHER_MIN_WORDS} OR n > {GOPHER_MAX_WORDS} THEN 'words'
           WHEN mwl_c100 < {GOPHER_MWL_LO_C} OR mwl_c100 > {GOPHER_MWL_HI_C}
             THEN 'mwl'
           WHEN sym_ppm > {GOPHER_SYM_PPM_MAX} THEN 'sym'
           WHEN alpha_ppm < {GOPHER_ALPHA_PPM_MIN} THEN 'alpha'
           WHEN n_stop_d < {GOPHER_MIN_STOP} THEN 'stop'
           ELSE 'keep'
         END AS code
  FROM gp_m
)
SELECT doc_id, code, CAST(code = 'keep' AS BIGINT) AS keep,
       CAST(n AS BIGINT) AS n_words, CAST(mwl_c100 AS BIGINT) AS mwl_c100
FROM gp_c ORDER BY doc_id
"""


def build_vocab(
    docs: DataFrame, vocab_size: int = 100, pieces: DataFrame | None = None
) -> DataFrame:
    """Tokenizer-vocabulary induction: the `vocab_size` most frequent
    BPE-pretokenizer pieces across the corpus, ranked by (count DESC,
    piece ASC) so the vocabulary is fully deterministic.

    Scale shape: explode pieces → ONE partial-agg shuffle keyed by piece
    (map-side combine collapses each partition to its distinct pieces —
    vocabulary cardinality, not token cardinality, crosses the wire) →
    global top-k as orderBy+limit, which Spark plans as
    TakeOrderedAndProject (no full sort). Returns (rank, piece, n_occ).

    `pieces` (optional): a precomputed (..., pieces array<string>) frame —
    the pretokenized corpus — so callers holding a materialized piece
    table (the gate's session checkpoint) skip the BPE_PATTERN regex pass
    (r13 optimization round, guide §2.3: the extraction ran once per
    consumer of the same corpus).
    """
    if pieces is None:
        pieces = docs.select(
            F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0)).alias(
                "pieces"
            )
        )
    counted = (
        pieces.select(F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    top = counted.orderBy(F.desc("n_occ"), F.asc("piece")).limit(vocab_size)
    w = Window.orderBy(F.desc("n_occ"), F.asc("piece"))
    # the window runs over vocab_size rows only (post-limit) — single tiny
    # partition by construction, not a corpus-wide global window
    return top.select(
        F.row_number().over(w).alias("rank"), "piece", "n_occ"
    ).orderBy("rank")


def build_vocab_sql(vocab_size: int = 100, table: str = "documents") -> str:
    """DuckDB twin of build_vocab (same BPE_PATTERN, same tie-break)."""
    return f"""
WITH p AS (
  SELECT u.piece FROM {table}, unnest(regexp_extract_all(text, '{BPE_PATTERN}')) AS u(piece)
), c AS (
  SELECT piece, COUNT(1) AS n_occ FROM p GROUP BY piece
  ORDER BY n_occ DESC, piece ASC LIMIT {vocab_size}
)
SELECT ROW_NUMBER() OVER (ORDER BY n_occ DESC, piece ASC) AS rank, piece, n_occ
FROM c ORDER BY rank
"""


def encode_with_vocab(
    docs: DataFrame,
    vocab: DataFrame,
    unk_id: int = 0,
    ordered: bool = True,
    pieces: DataFrame | None = None,
) -> DataFrame:
    """Corpus encoding: text -> integer token-id arrays under the induced
    vocabulary (the production step AFTER build_vocab — what actually
    turns a filtered corpus into training-ready sequences). Pieces come
    from the same BPE pretokenizer as build_vocab; in-vocab pieces map to
    their vocabulary rank (1..V), OOV pieces to `unk_id`.

    Scale shape: posexplode the piece arrays, BROADCAST-join the
    vocabulary (top-k bounded by construction — unlike unigram_logprob's
    unbounded token-count table, a tokenizer vocab is 32k-256k rows and
    always broadcastable), then ONE doc-keyed shuffle reassembles ids in
    piece order via sort_array(collect_list(struct(pos, id))). Docs whose
    text yields zero pieces are preserved with an empty id array (left
    join back to the doc spine), so encode output stays row-aligned with
    the corpus.

    Returns (doc_id, n_pieces, ids array<int>).
    """
    if pieces is None:
        # `pieces` (optional): the precomputed (doc_id, pieces) pretokenized
        # corpus — same contract as build_vocab's parameter
        pieces = docs.select(
            "doc_id",
            F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0)).alias(
                "pieces"
            ),
        )
    pos = pieces.select("doc_id", F.posexplode("pieces").alias("pos", "piece"))
    vid = vocab.select("piece", F.col("rank").cast("int").alias("_vid"))
    encoded = (
        pos.join(F.broadcast(vid), "piece", "left")
        .select(
            "doc_id",
            F.struct(
                F.col("pos"), F.coalesce("_vid", F.lit(unk_id).cast("int")).alias("id")
            ).alias("pi"),
        )
        .groupBy("doc_id")
        .agg(
            F.transform(F.array_sort(F.collect_list("pi")), lambda s: s["id"]).alias(
                "ids"
            )
        )
    )
    out = (
        docs.select("doc_id")
        .join(encoded, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("ids", F.array().cast("array<int>")).alias("ids"),
        )
        .select("doc_id", F.size("ids").alias("n_pieces"), "ids")
    )
    # ordered=False skips the presentation sort (the
    # exact_substring_dedup contract) — composition callers
    # (pack_token_ids, the gate legs) re-shuffle anyway
    return out.orderBy("doc_id") if ordered else out


def encode_with_vocab_sql(
    vocab_size: int = 100, unk_id: int = 0, table: str = "documents"
) -> str:
    """DuckDB twin of encode_with_vocab over build_vocab_sql's vocabulary
    (same pretokenizer, same rank ids, same OOV/empty-doc semantics)."""
    return f"""
WITH c AS (
  SELECT piece, COUNT(1) AS n_occ
  FROM (SELECT u.piece FROM {table}, unnest(regexp_extract_all(text, '{BPE_PATTERN}')) AS u(piece))
  GROUP BY piece ORDER BY n_occ DESC, piece ASC LIMIT {vocab_size}
), v AS (
  SELECT ROW_NUMBER() OVER (ORDER BY n_occ DESC, piece ASC) AS rank, piece FROM c
), p AS (
  SELECT doc_id, i AS pos, pieces[i] AS piece
  FROM (SELECT doc_id, regexp_extract_all(text, '{BPE_PATTERN}') AS pieces FROM {table}) t,
       unnest(generate_series(1, len(pieces))) AS g(i)
), e AS (
  SELECT p.doc_id,
         list(CAST(COALESCE(v.rank, {unk_id}) AS INT) ORDER BY p.pos) AS ids
  FROM p LEFT JOIN v ON p.piece = v.piece
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       COALESCE(len(e.ids), 0) AS n_pieces,
       COALESCE(e.ids, CAST([] AS INT[])) AS ids
FROM {table} d LEFT JOIN e ON d.doc_id = e.doc_id
ORDER BY d.doc_id
"""


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Corpus-trained unigram log-probability score per document — the
    perplexity-filter analog of a pretraining pipeline (docs whose tokens
    are improbable under the corpus's own unigram model are gibberish/
    boilerplate candidates; cut on avg_logprob downstream).

    Model: Laplace-smoothed p(t) = (count(t) + 1) / (N + V) trained on the
    same corpus. Per-token log-probs are rounded to integer 1e-4 nats
    BEFORE summing, so the per-doc aggregate is order-independent integer
    math — a raw double SUM would hash differently across partition orders
    (float addition is not associative), and the 1e-4 grid leaves ~100 ulp
    of margin against libm last-digit differences between engines.

    Plan shape: token counts are one partial-agg shuffle (vocabulary
    cardinality crosses the wire); scoring joins the exploded corpus to
    the count table on the token (shuffle join — the vocabulary is NOT
    assumed broadcastable at 100 TB) and re-aggregates per doc.

    Returns (doc_id, n_tokens, sum_logprob_en4, avg_logprob_en4).
    """
    toks = docs.select("doc_id", F.explode(_toks_of(docs)).alias("t"))
    counts = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("N"), F.count(F.lit(1)).alias("V")
    )
    scored = (
        toks.join(counts, "t")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.round(
                F.log((F.col("c") + 1).cast("double") / (F.col("N") + F.col("V")))
                * 10_000
            )
            .cast("bigint")
            .alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("lp").alias("sum_logprob_en4"))
        .select(
            "doc_id",
            "n_tokens",
            "sum_logprob_en4",
            F.expr("sum_logprob_en4 DIV n_tokens").alias("avg_logprob_en4"),
        )
        .orderBy("doc_id")
    )


UNIGRAM_LOGPROB_SQL = """
WITH toks AS (
  SELECT doc_id, u.t FROM documents, unnest(string_split(text, ' ')) AS u(t)
), counts AS (
  SELECT t, COUNT(1) AS c FROM toks GROUP BY t
), totals AS (
  SELECT SUM(c) AS N, COUNT(1) AS V FROM counts
), scored AS (
  SELECT doc_id,
         CAST(ROUND(ln(CAST(c + 1 AS DOUBLE) / (N + V)) * 10000) AS BIGINT) AS lp
  FROM toks JOIN counts USING (t) CROSS JOIN totals
)
SELECT doc_id, COUNT(1) AS n_tokens, SUM(lp) AS sum_logprob_en4,
       SUM(lp) // COUNT(1) AS avg_logprob_en4
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


def bigram_logprob(docs: DataFrame, scratch_out: list | None = None) -> DataFrame:
    """Corpus-trained BIGRAM log-probability per document — the KenLM-style
    perplexity filter one order up from unigram_logprob (fluency: a doc
    whose word PAIRS are improbable under the corpus's own bigram model is
    shuffled/templated/gibberish even when its unigrams look normal).

    Model: Laplace-smoothed p(w2|w1) = (c(w1,w2) + 1) / (ctx(w1) + V),
    ctx(w1) = number of bigrams starting with w1, V = unigram vocabulary
    size. Per-bigram log-probs round to integer 1e-4 nats BEFORE summing
    (the unigram_logprob discipline: order-independent integer aggregation,
    and Spark `div` == DuckDB `//` for the truncating average — verified
    on negative operands, which log-probs always are). Docs with < 2
    tokens carry zero bigrams and emit (0, 0, 0) via the left join back
    to the doc spine.

    Plan shape: bigram construction is a ZERO-SHUFFLE narrow map
    (zip_with over two slices of the one split — no posexplode self-join);
    the model is one bigram-keyed partial-agg shuffle + a context
    re-aggregation of the (vocabulary²-bounded) count table; scoring joins
    the exploded bigrams to the count table on the bigram key (shuffle
    join — a bigram table is NOT assumed broadcastable at 100 TB) and
    re-aggregates per doc. V rides a 1-row broadcast (the accepted
    totals-crossJoin shape).

    Returns (doc_id, n_bigrams, sum_logprob_en4, avg_logprob_en4).

    ``scratch_out`` (ADVICE r10): the exploded ``pairs`` subtree is
    multiply-referenced (model build + scoring join) and its row count is
    corpus x tokens-per-doc. ReusedExchange already dedups the (w1, w2)
    shuffle (measured 0.30 vs 0.24 s at sf0.1 — PERF.md r11), but
    multi-action callers should still persist it once: pass a list and
    the persisted frame is appended for the CALLER to unpersist after its
    consumers have run — the ``_verify_jaccard`` contract.
    """
    toks = docs.select("doc_id", _toks_of(docs).alias("ts"))
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.expr("slice(ts, 1, size(ts) - 1)"),
                F.expr("slice(ts, 2, size(ts) - 1)"),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    if scratch_out is not None:
        pairs = pairs.persist()
        scratch_out.append(pairs)
    cbg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    ctx = cbg.groupBy("w1").agg(F.sum("c").alias("cw"))
    vocab = (
        docs.select(F.explode(_toks_of(docs)).alias("t"))
        .agg(F.count_distinct("t").alias("V"))
    )
    scored = (
        pairs.join(cbg, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                F.log((F.col("c") + 1).cast("double") / (F.col("cw") + F.col("V")))
                * 10_000
            )
            .cast("bigint")
            .alias("lp"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("lp").alias("sum_lp")
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("sum_lp", F.lit(0)).cast("bigint").alias("sum_logprob_en4"),
            F.coalesce(F.expr("sum_lp DIV n_bigrams"), F.lit(0))
            .cast("bigint")
            .alias("avg_logprob_en4"),
        )
        .orderBy("doc_id")
    )


# bigram keys concatenate with ' ' — tokens are whitespace-split, so the
# separator cannot occur inside a token and the key is collision-free;
# split_part recovers w1 exactly (same argument on both engines).
BIGRAM_LOGPROB_SQL = """
WITH btoks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
bgr AS (
  SELECT doc_id, u.bg
  FROM (
    SELECT doc_id,
           list_transform(list_zip(l[:-2], l[2:]), p -> p[1] || ' ' || p[2]) AS z
    FROM btoks
  ), unnest(z) AS u(bg)
),
cbg AS (SELECT bg, COUNT(1) AS c FROM bgr GROUP BY bg),
bctx AS (SELECT split_part(bg, ' ', 1) AS w1, SUM(c) AS cw FROM cbg GROUP BY 1),
bvocab AS (
  SELECT COUNT(DISTINCT u.t) AS V
  FROM documents, unnest(string_split(text, ' ')) AS u(t)
),
bscored AS (
  SELECT g.doc_id,
         CAST(ROUND(ln(CAST(c.c + 1 AS DOUBLE) / (x.cw + v.V)) * 10000) AS BIGINT) AS lp
  FROM bgr g
  JOIN cbg c USING (bg)
  JOIN bctx x ON split_part(g.bg, ' ', 1) = x.w1
  CROSS JOIN bvocab v
),
bagg AS (
  SELECT doc_id, COUNT(1) AS n_bigrams, SUM(lp) AS sum_lp
  FROM bscored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(a.sum_lp, 0) AS BIGINT) AS sum_logprob_en4,
       CAST(COALESCE(a.sum_lp // a.n_bigrams, 0) AS BIGINT) AS avg_logprob_en4
FROM documents d LEFT JOIN bagg a USING (doc_id)
ORDER BY doc_id
"""


# --- stupid-backoff trigram LM (held-out scoring) --------------------------

# Brants et al. 2007 ("Large Language Models in Machine Translation",
# public): score(w3 | w1 w2) backs off through the n-gram ladder with a
# FIXED multiplier instead of learned discounts — the standard web-scale
# LM for corpus quality filtering (CCNet's perplexity filter shape).
# alpha = 0.4, the published constant.
BACKOFF_ALPHA = 0.4
# Held-out split so backoff genuinely fires: the model trains on
# doc_id % BACKOFF_HELDOUT_MOD != 0 and scores EVERY doc — eval-split
# docs contain trigrams the train split never saw (a same-corpus model
# would have c3 >= 1 for every scored trigram and the backoff branches
# would be dead code). Same mod-7 split as decontamination for coherence.
BACKOFF_HELDOUT_MOD = 7


def trigram_backoff_logprob(
    docs: DataFrame, heldout_mod: int = BACKOFF_HELDOUT_MOD
) -> DataFrame:
    """Stupid-backoff trigram log-score per document, model trained on the
    mod-split train partition and scored over the WHOLE corpus:

        s(w3|w1w2) = c3(w1w2w3) / c2(w1w2)                 if c3 > 0
                   = 0.4 * c2(w2w3) / c1(w2)               elif c2(w2w3) > 0
                   = 0.16 * (c1(w3) + 1) / (N + V)         otherwise

    (the base level is Laplace-smoothed so an unseen w3 scores finitely —
    the unigram_logprob discipline; upper levels never need smoothing
    because their numerator > 0 guards the branch). Per-trigram log-scores
    round to integer 1e-4 nats BEFORE summing — order-independent integer
    aggregation, and the 1e-4 grid heals libm last-digit drift between
    engines (the unigram/bigram contract). Docs with < 3 tokens emit
    (0, 0, 0) via the spine left-join.

    Plan shape: trigram construction is a zero-shuffle narrow map
    (zip_with over three slices of one split); the model is three
    partial-agg shuffles over the TRAIN split (trigram-, bigram-, and
    unigram-keyed — each bounded by vocabulary^n, not corpus size);
    scoring left-joins the exploded corpus trigrams to the three count
    tables on their own keys (shuffle joins — no level is assumed
    broadcastable at 100 TB) and re-aggregates per doc. N/V ride a 1-row
    broadcast (the accepted totals-crossJoin shape).

    Returns (doc_id, n_trigrams, sum_logprob_en4, avg_logprob_en4).
    """

    def tri(d: DataFrame) -> DataFrame:
        staged = d.select("doc_id", _toks_of(d).alias("ts"))
        return staged.select(
            "doc_id",
            F.explode(
                # greatest(..., 0): a 1-token doc's size-2 is negative and
                # Spark's slice throws on negative length (bigram's size-1
                # bottoms out at 0 naturally; the trigram form does not)
                F.zip_with(
                    F.expr("slice(ts, 1, greatest(size(ts) - 2, 0))"),
                    F.zip_with(
                        F.expr("slice(ts, 2, greatest(size(ts) - 2, 0))"),
                        F.expr("slice(ts, 3, greatest(size(ts) - 2, 0))"),
                        lambda b, c: F.struct(b.alias("w2"), c.alias("w3")),
                    ),
                    lambda a, bc: F.struct(
                        a.alias("w1"), bc["w2"].alias("w2"), bc["w3"].alias("w3")
                    ),
                )
            ).alias("t"),
        ).select(
            "doc_id",
            F.col("t.w1").alias("w1"),
            F.col("t.w2").alias("w2"),
            F.col("t.w3").alias("w3"),
        )

    train = docs.filter(F.col("doc_id") % heldout_mod != 0)
    tri_train = tri(train)
    c3 = tri_train.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c3"))
    toks_train = train.select("doc_id", F.explode(_toks_of(train)).alias("t"))
    c1 = toks_train.groupBy("t").agg(F.count(F.lit(1)).alias("c1"))
    # bigram counts over the train TOKEN stream (not derived from c3's
    # context sums: the last bigram of each doc starts no trigram, so
    # sum(c3) over w3 undercounts c2 at doc tails)
    b_train = (
        train.select(_toks_of(train).alias("ts"))
        .select(
            F.explode(
                F.zip_with(
                    F.expr("slice(ts, 1, size(ts) - 1)"),
                    F.expr("slice(ts, 2, size(ts) - 1)"),
                    lambda a, b: F.struct(a.alias("wa"), b.alias("wb")),
                )
            ).alias("p")
        )
        .select(F.col("p.wa").alias("wa"), F.col("p.wb").alias("wb"))
    )
    c2 = b_train.groupBy("wa", "wb").agg(F.count(F.lit(1)).alias("c2"))
    totals = c1.agg(F.sum("c1").alias("N"), F.count(F.lit(1)).alias("V"))
    # Loud guard (review r12 follow-up, the pagerank_weighted limit-1
    # discipline): with an EMPTY train split, SUM over zero rows makes N
    # NULL, every base-branch log goes NULL, and the per-doc sums would
    # silently read (n_trigrams, 0, 0) instead of erroring.
    if train.limit(1).count() == 0:
        raise ValueError(
            "trigram_backoff_logprob: empty train split (every doc_id is "
            f"0 mod {heldout_mod}) - the model has nothing to train on; "
            "choose a different heldout_mod or widen the corpus"
        )

    scored = (
        tri(docs)
        .join(c3, ["w1", "w2", "w3"], "left")
        .join(
            c2.select(
                F.col("wa").alias("w1"), F.col("wb").alias("w2"),
                F.col("c2").alias("c2_ctx"),
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            c2.select(
                F.col("wa").alias("w2"), F.col("wb").alias("w3"),
                F.col("c2").alias("c2_bo"),
            ),
            ["w2", "w3"],
            "left",
        )
        .join(c1.select(F.col("t").alias("w2"), F.col("c1").alias("c1_ctx")), "w2", "left")
        .join(c1.select(F.col("t").alias("w3"), F.col("c1").alias("c1_w3")), "w3", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.round(
                F.when(
                    F.col("c3").isNotNull(),
                    F.log(F.col("c3").cast("double") / F.col("c2_ctx")),
                )
                .when(
                    F.col("c2_bo").isNotNull(),
                    F.log(
                        F.lit(BACKOFF_ALPHA)
                        * F.col("c2_bo").cast("double")
                        / F.col("c1_ctx")
                    ),
                )
                .otherwise(
                    F.log(
                        F.lit(BACKOFF_ALPHA * BACKOFF_ALPHA)
                        * (F.coalesce(F.col("c1_w3"), F.lit(0)) + 1).cast("double")
                        / (F.col("N") + F.col("V"))
                    )
                )
                * 10_000
            )
            .cast("bigint")
            .alias("lp"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trigrams"), F.sum("lp").alias("sum_lp")
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_trigrams", F.lit(0)).cast("bigint").alias("n_trigrams"),
            F.coalesce("sum_lp", F.lit(0)).cast("bigint").alias("sum_logprob_en4"),
            F.coalesce(F.expr("sum_lp DIV n_trigrams"), F.lit(0))
            .cast("bigint")
            .alias("avg_logprob_en4"),
        )
        .orderBy("doc_id")
    )


# Body/full split (the _PACK_BODY_SQL lesson, r11): the gate oracle embeds
# the UNORDERED body; a naive .replace("ORDER BY doc_id", "") on the full
# string is exactly the class of edit that silently stripped a window's
# ORDER BY once before.
_TRIGRAM_BACKOFF_BODY_SQL = f"""
WITH tb_toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
tb_tri AS (
  SELECT doc_id, u.t3[1] AS w1, u.t3[2] AS w2, u.t3[3] AS w3
  FROM (
    SELECT doc_id,
           list_transform(generate_series(1, greatest(len(l) - 2, 0)),
                          i -> [l[i], l[i + 1], l[i + 2]]) AS z
    FROM tb_toks
  ), unnest(z) AS u(t3)
),
tb_c3 AS (
  SELECT w1, w2, w3, COUNT(1) AS c3 FROM tb_tri
  WHERE doc_id % {BACKOFF_HELDOUT_MOD} != 0 GROUP BY w1, w2, w3
),
tb_bi AS (
  SELECT doc_id, u.p[1] AS wa, u.p[2] AS wb
  FROM (
    SELECT doc_id,
           list_transform(generate_series(1, greatest(len(l) - 1, 0)),
                          i -> [l[i], l[i + 1]]) AS z
    FROM tb_toks
  ), unnest(z) AS u(p)
),
tb_c2 AS (
  SELECT wa, wb, COUNT(1) AS c2 FROM tb_bi
  WHERE doc_id % {BACKOFF_HELDOUT_MOD} != 0 GROUP BY wa, wb
),
tb_c1 AS (
  SELECT u.t, COUNT(1) AS c1
  FROM tb_toks, unnest(l) AS u(t)
  WHERE doc_id % {BACKOFF_HELDOUT_MOD} != 0 GROUP BY u.t
),
tb_tot AS (SELECT SUM(c1) AS N, COUNT(1) AS V FROM tb_c1),
tb_scored AS (
  SELECT g.doc_id,
         CAST(ROUND(
           CASE
             WHEN c3.c3 IS NOT NULL
               THEN ln(CAST(c3.c3 AS DOUBLE) / ctx.c2)
             WHEN bo.c2 IS NOT NULL
               THEN ln({BACKOFF_ALPHA!r} * CAST(bo.c2 AS DOUBLE) / w2c.c1)
             ELSE ln({BACKOFF_ALPHA * BACKOFF_ALPHA!r}
                     * CAST(COALESCE(w3c.c1, 0) + 1 AS DOUBLE) / (t.N + t.V))
           END * 10000) AS BIGINT) AS lp
  FROM tb_tri g
  LEFT JOIN tb_c3 c3 ON g.w1 = c3.w1 AND g.w2 = c3.w2 AND g.w3 = c3.w3
  LEFT JOIN tb_c2 ctx ON g.w1 = ctx.wa AND g.w2 = ctx.wb
  LEFT JOIN tb_c2 bo ON g.w2 = bo.wa AND g.w3 = bo.wb
  LEFT JOIN tb_c1 w2c ON g.w2 = w2c.t
  LEFT JOIN tb_c1 w3c ON g.w3 = w3c.t
  CROSS JOIN tb_tot t
),
tb_agg AS (
  SELECT doc_id, COUNT(1) AS n_trigrams, SUM(lp) AS sum_lp
  FROM tb_scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_trigrams, 0) AS BIGINT) AS n_trigrams,
       CAST(COALESCE(a.sum_lp, 0) AS BIGINT) AS sum_logprob_en4,
       CAST(COALESCE(a.sum_lp // a.n_trigrams, 0) AS BIGINT) AS avg_logprob_en4
FROM documents d LEFT JOIN tb_agg a USING (doc_id)
"""

TRIGRAM_BACKOFF_SQL = _TRIGRAM_BACKOFF_BODY_SQL + "ORDER BY doc_id\n"


# --- CCNet-style perplexity bucketing ------------------------------------

# 1e-2-nat grid for the bucket histogram: avg_logprob_en4 spans roughly
# [-15e4, 0], so DIV 100 bounds the histogram at ~1.5k cells regardless
# of corpus size — the value RANGE, not the corpus, is the bound.
PPL_BUCKET_GRID = 100


def ppl_bucket(scores: DataFrame, grid: int = PPL_BUCKET_GRID) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020) over
    held-out LM scores: docs split head / middle / tail by corpus-wide
    terciles of average log-probability (head = highest logprob = lowest
    perplexity — CCNet's keep set), with the tercile cutoffs computed on
    a bounded VALUE HISTOGRAM instead of a global sort.

    Reference parity: the reference has no LM filtering at all — this is
    §2.11 extension surface (the north star's "text analysis" family),
    composing on trigram_backoff_logprob's output schema.

    Scale shape: avg_logprob_en4 is coarsened to a 1e-2-nat grid
    (integer DIV — truncation toward zero, matching DuckDB `//`), the
    histogram is one shuffle keyed on ≤~1.5k grid cells, the cumulative
    window rides that bounded table (the quality_threshold_sweep
    band-table discipline — bounded by value range, NOT corpus size),
    and the two cutoffs return to the corpus as a 1-row broadcast. No
    corpus-sized window, no driver collect.

    Tie policy: bucketing compares grid VALUES only — every doc sharing
    a cell shares a bucket — so the split is deterministic without a
    doc_id tie-break; observed shares deviate from exact thirds only at
    cell boundaries. Docs with no trigrams (< 3 tokens) bucket 'skip'
    (no LM evidence; CCNet drops them pre-bucketing) and are excluded
    from the cutoff population.

    Returns (doc_id, bucket, s_grid, cut_lo, cut_hi); the cut_* corpus
    constants replicate per row so the driver hash certifies the
    cutoffs themselves, not just the labels.
    """
    s_expr = F.expr(f"avg_logprob_en4 DIV {grid}")
    scored = scores.filter(F.col("n_trigrams") > 0)
    hist = scored.groupBy(s_expr.alias("s")).agg(F.count(F.lit(1)).alias("c"))
    # bounded-table window (≤ ~1.5k rows): the single-partition WindowExec
    # here is by design, like quality_threshold_sweep's band table
    w_cum = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cuts = (
        hist.select("s", F.sum("c").over(w_cum).alias("cum"))
        .crossJoin(F.broadcast(scored.agg(F.count(F.lit(1)).alias("n"))))
        .agg(
            F.min(
                F.when(F.col("cum") >= F.expr("(n + 2) DIV 3"), F.col("s"))
            ).alias("cut_lo"),
            F.min(
                F.when(F.col("cum") >= F.expr("(2 * n + 2) DIV 3"), F.col("s"))
            ).alias("cut_hi"),
        )
    )
    return (
        scores.select("doc_id", "n_trigrams", s_expr.alias("s"))
        .crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            F.when(F.col("n_trigrams") == 0, F.lit("skip"))
            .when(F.col("s") <= F.col("cut_lo"), F.lit("tail"))
            .when(F.col("s") <= F.col("cut_hi"), F.lit("middle"))
            .otherwise(F.lit("head"))
            .alias("bucket"),
            F.col("s").cast("bigint").alias("s_grid"),
            # COALESCE: an all-skip corpus leaves both cutoffs NULL
            F.coalesce("cut_lo", F.lit(0)).cast("bigint").alias("cut_lo"),
            F.coalesce("cut_hi", F.lit(0)).cast("bigint").alias("cut_hi"),
        )
    )


# DuckDB twin reading the backoff scores from a CTE named `tbb` (the
# gate oracle materializes _TRIGRAM_BACKOFF_BODY_SQL once under that
# name and feeds BOTH the backoff and ppl_bucket legs from it).
# `pb_` prefix reserved.
_PPL_BUCKET_OVER_TBB_SQL = f"""
WITH pb_g AS (
  SELECT doc_id, n_trigrams, avg_logprob_en4 // {PPL_BUCKET_GRID} AS s
  FROM tbb
),
pb_h AS (
  SELECT s, COUNT(1) AS c FROM pb_g WHERE n_trigrams > 0 GROUP BY s
),
pb_cum AS (
  SELECT s, SUM(c) OVER (ORDER BY s) AS cum FROM pb_h
),
pb_n AS (SELECT COUNT(1) AS n FROM pb_g WHERE n_trigrams > 0),
pb_cut AS (
  SELECT MIN(CASE WHEN cum >= (n + 2) // 3 THEN s END) AS cut_lo,
         MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN s END) AS cut_hi
  FROM pb_cum CROSS JOIN pb_n
)
SELECT doc_id,
       CASE WHEN n_trigrams = 0 THEN 'skip'
            WHEN s <= cut_lo THEN 'tail'
            WHEN s <= cut_hi THEN 'middle'
            ELSE 'head' END AS bucket,
       CAST(s AS BIGINT) AS s_grid,
       CAST(COALESCE(cut_lo, 0) AS BIGINT) AS cut_lo,
       CAST(COALESCE(cut_hi, 0) AS BIGINT) AS cut_hi
FROM pb_g CROSS JOIN pb_cut
"""

# standalone twin (library surface + pytest): materialize the backoff
# body under the `tbb` name the pb_ chain expects
PPL_BUCKET_SQL = (
    f"WITH tbb AS MATERIALIZED ({_TRIGRAM_BACKOFF_BODY_SQL})\n"
    f"SELECT * FROM ({_PPL_BUCKET_OVER_TBB_SQL}) ORDER BY doc_id\n"
)


# --- filter verdict (mixer decision) --------------------------------------

# Repetition cut points chosen against the synthetic corpus's measured
# distribution (sf0.01: dup_token_ppm median 536585 / p90 678571;
# top_bigram_ppm p99 111111) so the rule fires on the repetitive TAIL
# (~10% / ~1%), not the corpus baseline — an all-'keep' or all-'repet'
# verdict would certify nothing (the contam-leg non-vacuity lesson).
VERDICT_DUP_TOKEN_PPM = 680_000
VERDICT_TOP_BIGRAM_PPM = 100_000


def filter_verdict(
    docs: DataFrame,
    contam: DataFrame,
    rep: DataFrame,
    ppl: DataFrame,
    qc: DataFrame,
    dup_token_ppm: int = VERDICT_DUP_TOKEN_PPM,
    top_bigram_ppm: int = VERDICT_TOP_BIGRAM_PPM,
) -> DataFrame:
    """Dolma-mixer-style keep/drop decision per document: the composition
    stage every curation pipeline ends with — taggers (the certified
    signal operators) feed ONE verdict table with a first-failing-rule
    reason code, fixed precedence:

        contam    shares >=1 8-gram with the eval split (hygiene first:
                  a contaminated doc is dropped no matter how fluent)
        repet     Gopher repetition cut (dup_token_ppm or top_bigram_ppm
                  over the module thresholds)
        ppl_tail  CCNet bucket 'tail' (or 'skip' — no LM evidence)
        lowq      quality classifier predicts low quality
        keep      none of the above

    The reference has no filtering at all — §2.11 extension surface; the
    operator is pure composition, so its scale shape is its inputs':
    four doc-keyed equi-joins on the docs spine (co-partitioned on the
    same key — one shuffle lineage at scale) and a narrow CASE map. No
    new aggregate, no window, no collect.

    Inputs are the signal frames (caller passes the session-cached gate
    legs so nothing recomputes): contam = contamination_report rows,
    rep = repetition_signals rows, ppl = ppl_bucket rows, qc = qc_report
    rows. Inner joins intersect the coverages — with the gate's inputs
    that is the contam report's TRAIN split (eval-split docs are not
    training candidates, so they get no verdict by design). Returns
    (doc_id, reason, keep).
    """
    reason = (
        F.when(F.col("n_contam") > 0, F.lit("contam"))
        .when(
            (F.col("dup_token_ppm") > dup_token_ppm)
            | (F.col("top_bigram_ppm") > top_bigram_ppm),
            F.lit("repet"),
        )
        .when(F.col("bucket").isin("tail", "skip"), F.lit("ppl_tail"))
        .when(~F.col("pred"), F.lit("lowq"))
        .otherwise(F.lit("keep"))
    )
    return (
        docs.select("doc_id")
        .join(contam.select("doc_id", "n_contam"), "doc_id")
        .join(rep.select("doc_id", "dup_token_ppm", "top_bigram_ppm"), "doc_id")
        .join(ppl.select("doc_id", "bucket"), "doc_id")
        .join(qc.select("doc_id", "pred"), "doc_id")
        .select(
            "doc_id",
            reason.alias("reason"),
            (reason == F.lit("keep")).cast("bigint").alias("keep"),
        )
    )


# DuckDB twin reading the four signal tables from gate-oracle CTEs named
# ctb / rpb / pbb / qcb (the gate hoists each signal body once, like
# tbb). `vd_` prefix reserved.
_VERDICT_OVER_CTES_SQL = f"""
SELECT d.doc_id,
       CASE WHEN c.n_contam > 0 THEN 'contam'
            WHEN r.dup_token_ppm > {VERDICT_DUP_TOKEN_PPM}
                 OR r.top_bigram_ppm > {VERDICT_TOP_BIGRAM_PPM} THEN 'repet'
            WHEN p.bucket IN ('tail', 'skip') THEN 'ppl_tail'
            WHEN NOT q.pred THEN 'lowq'
            ELSE 'keep' END AS reason
FROM documents d
JOIN ctb c USING (doc_id)
JOIN rpb r USING (doc_id)
JOIN pbb p USING (doc_id)
JOIN qcb q USING (doc_id)
"""


# --- benchmark decontamination -------------------------------------------

# n-gram width: the published decontamination range is 8-13 word-grams
# (GPT-3 appendix C uses 13-gram dedup; Llama-2 flags >=8-token overlap);
# 8 is the strict end that still yields non-vacuous overlap on the
# synthetic corpus at every SF (measured: 7/9/57 contaminated docs at
# sf0.001/0.01/0.1 with the mod-7 eval split — an all-zero gate would
# certify nothing, the r02 lesson).
DECONTAM_N = 8
# deterministic held-out "benchmark" split for the gate: doc_id % 7 == 0
DECONTAM_EVAL_MOD = 7


def _gramn(toks: Column, n: int) -> Column:
    """THE gram builder, shared with the MinHash shingle family — one
    definition so the shingle space and the decontamination gram space
    cannot desynchronize (review r11; lives in dedup.py next to _gram3)."""
    from .dedup import _gramn as _dedup_gramn

    return _dedup_gramn(toks, n)


def contamination_report(
    train_docs: DataFrame, eval_docs: DataFrame, n: int = DECONTAM_N
) -> DataFrame:
    """Benchmark decontamination: flag every training document sharing at
    least one word-n-gram with a held-out evaluation set — the standard
    pre-training hygiene pass (GPT-3 appendix C's 13-gram scrub, Llama 2's
    8-token overlap rule; reference repo has no analog — engine-side
    surface for the LLM-data pipeline like the dedup family).

    Sibling: corpus.eval_decontamination is the broadcast fast-path for
    benchmark-sized eval sets (3-gram shingles, contaminated rows only,
    eval side broadcast by construction). THIS is the full-report form —
    published 8-gram width, one row per train doc including clean ones
    (the shape a filter stage consumes), and a shuffle semi-join so the
    eval side may be another SHARD of the corpus, not just a benchmark.
    This one is driver-hash-certified (text_quality_signals 'contam'
    leg); the broadcast sibling stays value-tested library API.

    Returns one row per train doc:
      (doc_id, n_grams, n_contam, contam_ppm, contaminated)
    n_grams = distinct n-grams in the doc (0 for docs under n tokens),
    n_contam = how many of those also appear anywhere in the eval set,
    contam_ppm = n_contam * 1e6 div n_grams (0 when gram-less),
    contaminated = n_contam > 0 as BIGINT.

    Scale shape: both sides explode to (doc_id, 60-bit gram hash) rows —
    the shingle-index shape, same token_hash60 derivation — and meet in
    ONE gram-keyed shuffle semi-join. NO broadcast hint on the eval side:
    eval suites are tiny today, but a contamination pass is also how you
    scrub against a whole held-out SHARD, so the plan must survive an
    eval side that scales with the corpus (AQE promotes the small case to
    broadcast at runtime). Per-doc totals and hits are two partial-agg
    shuffles on the train grams; the final assembly is doc-keyed joins on
    the train-doc spine, so gram-less docs surface with zeros instead of
    vanishing.
    """

    def grams(d: DataFrame) -> DataFrame:
        # distinct on the HASH, not just the gram string: counts must be
        # per distinct 60-bit hash in BOTH engines, or a within-doc
        # collision makes Spark count 2 where the oracle's
        # GROUP BY (doc_id, gh) counts 1 (review r11)
        return (
            d.select("doc_id", F.explode(_gramn(_toks_of(d), n)).alias("g"))
            .select("doc_id", token_hash60(F.col("g")).alias("gh"))
            .distinct()
        )

    eval_grams = grams(eval_docs).select("gh").distinct()
    train_grams = grams(train_docs)
    totals = train_grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        train_grams.join(eval_grams, "gh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contam"))
    )
    return (
        train_docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_contam", F.lit(0)).cast("bigint").alias("n_contam"),
            F.coalesce(F.expr("(n_contam * 1000000) div n_grams"), F.lit(0))
            .cast("bigint")
            .alias("contam_ppm"),
            (F.coalesce("n_contam", F.lit(0)) > 0).cast("bigint").alias("contaminated"),
        )
    )


def decontam_sql_ctes(n: int = DECONTAM_N, eval_mod: int = DECONTAM_EVAL_MOD) -> str:
    """DuckDB CTE chain mirroring contamination_report over the mod-split
    documents table. Emits dc_grams / dc_eval / dc_tot / dc_hit; the
    caller selects from dc_tot LEFT JOIN dc_hit against the train spine.
    dc_ prefix reserved (embedded-oracle namespace ritual).

    The overlap join runs on the SAME 60-bit gram hash the Spark side
    joins on (TOKEN_HASH60_SQL — the ritual every hashed operator
    follows; review r11: joining raw strings here while Spark joins
    hashes meant any 60-bit collision would diverge the engines instead
    of being shared behavior)."""
    idx = ", ".join(f"list_extract(toks, i + {j})" for j in range(n))
    gh = TOKEN_HASH60_SQL.format(t="concat_ws(' ', " + idx + ")")
    return f"""
dc_grams AS MATERIALIZED (
  SELECT doc_id, {gh} AS gh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t,
       unnest(generate_series(1, greatest(len(toks) - {n - 1}, 0))) AS u(i)
  GROUP BY doc_id, gh
),
dc_eval AS (SELECT DISTINCT gh FROM dc_grams WHERE doc_id % {eval_mod} = 0),
dc_tot AS (
  SELECT doc_id, COUNT(1) AS n_grams FROM dc_grams
  WHERE doc_id % {eval_mod} != 0 GROUP BY doc_id
),
dc_hit AS (
  SELECT doc_id, COUNT(1) AS n_contam
  FROM dc_grams JOIN dc_eval USING (gh)
  WHERE doc_id % {eval_mod} != 0 GROUP BY doc_id
)"""


DECONTAM_SQL = f"""
WITH {decontam_sql_ctes()}
SELECT d.doc_id,
       CAST(COALESCE(t.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_contam, 0) AS BIGINT) AS n_contam,
       CAST(COALESCE(h.n_contam * 1000000 // t.n_grams, 0) AS BIGINT) AS contam_ppm,
       CAST(COALESCE(h.n_contam, 0) > 0 AS BIGINT) AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {DECONTAM_EVAL_MOD} != 0) d
LEFT JOIN dc_tot t USING (doc_id)
LEFT JOIN dc_hit h USING (doc_id)
ORDER BY doc_id
"""


# --- sequence packing ------------------------------------------------------

# training context window (tokens) for the gate; any power-of-two works —
# the math is exact integer division either way
PACK_CONTEXT = 1024
# prefix-sum bucket width (doc_ids per bucket): the two-phase split point.
# At corpus cardinality N the bucket table has N / PACK_BUCKET rows — the
# only part of the plan that rides a single-partition window, so it must
# stay driver-tiny relative to the corpus (4096 keeps it < 25k rows even
# at 100M docs; recurse the same trick one level if that ever grows).
PACK_BUCKET = 4096


def _global_token_offsets(t: DataFrame) -> DataFrame:
    """THE distributed two-phase prefix sum over (doc_id, n_tokens[, ...])
    — shared by pack_sequences (bookkeeping) and pack_token_ids
    (materialization) so the decomposition can't drift between them.
    Adds `cum_start` = the doc's exclusive global token offset in doc_id
    order; extra input columns pass through. See pack_sequences for the
    bucket-partials argument (the only unpartitioned window runs over
    corpus/PACK_BUCKET rows)."""
    t = t.withColumn("bucket", F.expr(f"doc_id div {PACK_BUCKET}"))
    partials = t.groupBy("bucket").agg(F.sum("n_tokens").alias("bsum"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = partials.select(
        "bucket", F.coalesce(F.sum("bsum").over(w_b), F.lit(0)).alias("boff")
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        t.join(offsets, "bucket")
        .withColumn(
            "cum_start",
            F.col("boff") + F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0)),
        )
        .drop("bucket", "boff")
    )


def pack_token_ids(
    enc: DataFrame, seq_len: int = PACK_CONTEXT
) -> DataFrame:
    """Materialize the packed training sequences pack_sequences only
    BOOKKEEPS: concatenate every document's token ids in doc_id order
    and emit one row per fixed-length window — (seq_id, n_tokens,
    ids array<int>), the trailing partial sequence included. This is the
    artifact an LLM pre-training data pipeline actually lands (the step
    after encode: tokenize -> pack -> shard).

    Input: (doc_id, ids array<int>) — encode_with_vocab or bpe_encode
    output. Scale shape: the shared two-phase prefix sum assigns each
    doc its global offset (no corpus-wide window), then ONE posexplode +
    ONE seq_id-keyed shuffle reassembles windows via
    sort_array(collect_list(struct(gpos, id))) — global position is
    unique by construction, so the sort is total and deterministic."""
    t = enc.select(
        "doc_id", "ids", F.size("ids").cast("bigint").alias("n_tokens")
    )
    cum = _global_token_offsets(t)
    tok = cum.select(
        F.col("cum_start"), F.posexplode("ids").alias("pos", "id")
    ).select(
        (F.col("cum_start") + F.col("pos")).alias("gpos"), F.col("id")
    )
    return (
        tok.select(
            F.expr(f"gpos div {seq_len}").alias("seq_id"),
            F.struct("gpos", "id").alias("gi"),
        )
        .groupBy("seq_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("gi")), lambda s: s["id"]
            ).alias("ids")
        )
        .select("seq_id", F.size("ids").alias("n_tokens"), "ids")
    )


def pack_sequences(docs: DataFrame, context_len: int = PACK_CONTEXT) -> DataFrame:
    """Sequence packing for training batches: concatenate every document's
    tokens in doc_id order and chunk the stream into fixed `context_len`
    windows — the standard concat-and-chunk batching step of an LLM
    pre-training pipeline (each doc maps to the pack range it lands in;
    a doc spanning a boundary is split across adjacent packs). Returns
    per doc: (doc_id, n_tokens, cum_start, pack_first, pack_last,
    n_packs) where cum_start is the doc's offset in the global token
    stream and pack_first/last = floor division by context_len.

    The whole operator is one GLOBAL PREFIX SUM — the naive Spark
    expression (`sum() over (order by doc_id)` with no partition) drags
    the entire corpus through a SINGLE partition. This implementation is
    the distributed two-phase scan instead:

      1. bucket docs by `doc_id div PACK_BUCKET` and partial-sum each
         bucket's tokens (one map-side-combined shuffle, corpus-wide
         parallelism);
      2. run the unpartitioned running sum over the BUCKET PARTIALS only
         (corpus/4096 rows — the bounded single-partition step, same
         budget class as a convergence count);
      3. join the bucket offsets back and finish with a cumsum window
         PARTITIONED by bucket (parallel again), so every doc's global
         offset = bucket offset + local prefix.

    Exactness: integer token counts, order-independent partial sums, and
    floor division agree across engines — the oracle is DuckDB's plain
    global-window cumsum, so the two-phase decomposition is hash-checked
    against the direct form.
    """
    t = docs.select(
        "doc_id",
        F.size(_toks_of(docs)).cast("bigint").alias("n_tokens"),
    )
    cum = _global_token_offsets(t)
    return cum.select(
        "doc_id",
        "n_tokens",
        "cum_start",
        F.expr(f"cum_start div {context_len}").alias("pack_first"),
        F.expr(f"(cum_start + n_tokens - 1) div {context_len}").alias("pack_last"),
        (
            F.expr(f"(cum_start + n_tokens - 1) div {context_len}")
            - F.expr(f"cum_start div {context_len}")
            + 1
        ).alias("n_packs"),
    )


# Body/full split (review r11): the gate oracle embeds the UNORDERED body.
# A naive PACK_SQL.replace("ORDER BY doc_id", "") also stripped the window
# frame's ORDER BY inside pkc, silently turning the oracle's cumulative
# sum into an undefined-order scan that only passed because the fixture
# happens to be doc_id-ordered.
_PACK_BODY_SQL = f"""
WITH pk AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
pkc AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_start
  FROM pk
)
SELECT doc_id, n_tokens, cum_start,
       cum_start // {PACK_CONTEXT} AS pack_first,
       (cum_start + n_tokens - 1) // {PACK_CONTEXT} AS pack_last,
       (cum_start + n_tokens - 1) // {PACK_CONTEXT}
         - cum_start // {PACK_CONTEXT} + 1 AS n_packs
FROM pkc
"""

PACK_SQL = _PACK_BODY_SQL + "ORDER BY doc_id\n"


def tokpack_sql(
    seq_len: int = PACK_CONTEXT, vocab_size: int = 100, table: str = "documents"
) -> str:
    """DuckDB twin of encode_with_vocab |> pack_token_ids: the embedded
    encode twin, the DIRECT global cumsum over n_pieces (the oracle side
    of the two-phase-prefix-sum contract, the pack-leg precedent), then
    unnest to global positions and regroup into seq_len windows. Emits
    (seq_id, n_tokens, ids). Prefix ``tp_`` reserved (embedded-oracle
    namespace ritual)."""
    return f"""
WITH tp_enc AS MATERIALIZED (
  SELECT * FROM ({encode_with_vocab_sql(vocab_size=vocab_size, table=table)})
), tp_cum AS (
  SELECT doc_id, ids,
         COALESCE(SUM(n_pieces) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS cum_start
  FROM tp_enc
), tp_tok AS (
  -- CAST: cum_start rides a SUM window (HUGEINT), and a HUGEINT seq_id
  -- reaches the driver's pandas bridge as float64 ('0.0' != '0')
  SELECT CAST((cum_start + i - 1) // {seq_len} AS BIGINT) AS seq_id,
         cum_start + i - 1 AS gpos, ids[i] AS id
  FROM tp_cum, unnest(generate_series(1, len(ids))) AS g(i)
)
SELECT seq_id, CAST(COUNT(1) AS BIGINT) AS n_tokens,
       list(id ORDER BY gpos) AS ids
FROM tp_tok GROUP BY seq_id
"""


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    n_queries: int = 10,
    top_k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
    materialize_tf: bool = False,
    scratch_out: list | None = None,
) -> DataFrame:
    """BM25 text retrieval over an inverted index — the lexical similarity
    tier beside the embedding family (cosine/LSH/IVF): dedup catches
    near-copies, embeddings catch paraphrases, BM25 catches keyword
    overlap, and a retrieval-based decontamination or dedup pass needs all
    three. Queries are the first `n_queries` docs (the similarity family's
    convention); query terms are binary (standard for short queries).

    Scale shape — the classic sparse-retrieval plan, all equi-joins:
    per-(doc, term) postings with one doc-keyed and one term-keyed
    partial-agg shuffle (tf, document frequency); the 1-row (N, avgdl)
    stats frame broadcasts; per-posting BM25 weight idf·sat(tf) computed
    in ONE projection; candidates come from the postings ⋈ query-terms
    join ON THE TERM (docs sharing no term with a query are never
    touched — this is what the inverted index buys), then one
    (qid, did) aggregation and a per-query top-k window over candidates.
    The term join is a shuffle join — a vocabulary is NOT assumed
    broadcastable at 100 TB (same contract as unigram_logprob); the
    query-term side IS broadcast (n_queries · distinct-terms rows, tiny).

    Engine-exact scoring: per-posting weights are rounded to integer 1e-4
    units BEFORE summing (unigram_logprob's trick) so the per-pair SUM is
    order-independent integer math and the DuckDB twin hashes identically.

    Returns (qid, rank, did, score_en4).
    """
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("t"))
    tf = toks.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    if materialize_tf:
        # The term-frequency table feeds FOUR consumers (dl, df, postings,
        # query terms); without materialization Spark re-tokenizes the
        # corpus once per consumer. The production analog is landing the
        # inverted index between pipeline stages — same contract as
        # dedup.shingle_index. A caller that eagerly materializes the
        # RESULT can free this corpus-scale scratch via scratch_out (the
        # incremental_dedup convention, review r10 — otherwise it stays
        # pinned in executor storage until driver GC).
        tf = tf.localCheckpoint(eager=True)
        if scratch_out is not None:
            scratch_out.append(tf)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("N"), F.avg("dl").alias("avgdl"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("N") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    sat = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    postings = (
        tf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(dfreq, "t")
        .select(
            "t",
            F.col("doc_id").alias("did"),
            F.round(idf * sat * 10_000).cast("bigint").alias("w_en4"),
        )
    )
    qterms = tf.filter(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("qid"), "t"
    )
    scored = (
        postings.join(F.broadcast(qterms), "t")
        .filter(F.col("qid") != F.col("did"))
        .groupBy("qid", "did")
        .agg(F.sum("w_en4").alias("score_en4"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score_en4"), F.asc("did"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("qid", "rank", "did", "score_en4")
        .orderBy("qid", "rank")
    )


def bm25_topk_sql(
    n_queries: int = 10,
    top_k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
    table: str = "documents",
) -> str:
    """DuckDB twin of bm25_topk (same integer-1e-4 weight quantization)."""
    return f"""
WITH toks AS (
  SELECT doc_id, u.t FROM {table}, unnest(string_split(text, ' ')) AS u(t)
), tf AS (
  SELECT doc_id, t, COUNT(1) AS tf FROM toks GROUP BY doc_id, t
), dl AS (
  SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
), stats AS (
  SELECT COUNT(1) AS N, AVG(dl) AS avgdl FROM dl
), dfreq AS (
  SELECT t, COUNT(1) AS df FROM tf GROUP BY t
), postings AS (
  SELECT tf.t, tf.doc_id AS did,
         CAST(ROUND(ln((N - df + 0.5) / (df + 0.5) + 1.0)
                    * (tf * ({k1!r} + 1)) / (tf + {k1!r} * (1 - {b!r} + {b!r} * dl / avgdl))
                    * 10000) AS BIGINT) AS w_en4
  FROM tf JOIN dl USING (doc_id) CROSS JOIN stats JOIN dfreq USING (t)
), qterms AS (
  SELECT doc_id AS qid, t FROM tf WHERE doc_id < {n_queries}
), scored AS (
  -- CAST: DuckDB's SUM(BIGINT) is HUGEINT, which the pandas bridge
  -- renders as float64 and the driver hash sees as '61960.0' != '61960'
  SELECT qid, did, CAST(SUM(w_en4) AS BIGINT) AS score_en4
  FROM postings JOIN qterms USING (t)
  WHERE qid != did GROUP BY qid, did
), ranked AS (
  SELECT qid, did, score_en4,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score_en4 DESC, did ASC) AS rank
  FROM scored
)
SELECT qid, rank, did, score_en4 FROM ranked WHERE rank <= {top_k}
ORDER BY qid, rank
"""


#: session cache for the gate's BM25 top-k table (50 rows, pure function
#: of (session, sf_dir) — the similarity family's q_cosine_topk
#: precedent): it feeds BOTH gate legs, and caching also bounds the
#: inverted-index checkpoint inside bm25_topk to one per session.
_BM25_TOPK_CACHE: dict = {}
_BIGRAM_LEG_CACHE: dict = {}
_DOCS_TOK_CACHE: dict = {}
_CONTAM_LEG_CACHE: dict = {}


def _docs_tokenized_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared tokenized-documents checkpoint (VERDICT r11 item 1): every
    text_quality_signals leg previously re-scanned the parquet and
    re-split `text` independently — 8 scans + 8 splits per gate call for
    one row-identical subtree. Build (doc_id, n_chars, text, ts) ONCE per
    (session, sf_dir), localCheckpoint it, and feed all legs: split-based
    legs consume the staged `ts` array via _toks_of, the BPE legs
    (vocab/encode) and the sentence split still need `text` but now read
    it from cached blocks instead of the parquet scan. At cluster scale
    the same pattern is a persisted silver table: tokenize once, run the
    whole quality battery over the one materialization."""
    from ..io import session_cached

    def _build() -> DataFrame:
        return (
            load_table_parallel(spark, sf_dir, "documents")
            .select("doc_id", "n_chars", "text", tokens_col().alias("ts"))
            .localCheckpoint(eager=True)
        )

    return session_cached(_DOCS_TOK_CACHE, spark, (sf_dir,), _build)


def _bpe_pieces_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared BPE-pretokenized corpus checkpoint (r13 optimization round):
    (doc_id, pieces array<string>) under BPE_PATTERN. The vocab leg, the
    encode leg's vocabulary rebuild and the encode leg's position table
    each re-ran the same regexp_extract_all over every document per gate
    call — three extraction passes of one row-identical table (guide
    §2.3/§2.4). Materialize it once per (session, sf_dir) next to the
    whitespace-token checkpoint; at cluster scale this is the landed
    pretokenized silver table the tokenizer-induction stages fan out
    from."""
    from ..io import session_cached

    def _build() -> DataFrame:
        return (
            _docs_tokenized_cached(spark, sf_dir)
            .select(
                "doc_id",
                F.regexp_extract_all(
                    "text", F.lit(BPE_PATTERN), F.lit(0)
                ).alias("pieces"),
            )
            .localCheckpoint(eager=True)
        )

    return session_cached(_BPE_PIECES_CACHE, spark, (sf_dir,), _build)


def _unigram_leg_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached unigram-LM leg (r13 optimization round): the
    Laplace-smoothed unigram scores are a pure function of (session,
    sf_dir) — the same corpus-trained-LM class as the cached bigram and
    backoff legs (r10/r12) — yet the token-count shuffle join re-ran on
    every warm gate call (~0.6 s at sf0.1 by the leg split). The
    checkpoint is docs-sized (one row per doc)."""
    from ..io import session_cached

    def _build() -> DataFrame:
        return unigram_logprob(
            _docs_tokenized_cached(spark, sf_dir)
        ).localCheckpoint(eager=True)

    return session_cached(_UNIGRAM_LEG_CACHE, spark, (sf_dir,), _build)


def _contam_leg_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached decontamination leg (ADVICE r11): the contam leg is
    the gate's widest subtree (double 8-gram explode + distinct + gram-
    keyed semi-join) and was rebuilt on every gate call (bench samples
    3x) — exactly the per-call recompute the bigram leg's cache fixed in
    r10. The result is train-docs-sized (one row per train doc), so the
    checkpoint is small; the build consumes the shared tokenized frame."""
    from ..io import session_cached

    def _build() -> DataFrame:
        docs = _docs_tokenized_cached(spark, sf_dir)
        return contamination_report(
            docs.filter(F.col("doc_id") % DECONTAM_EVAL_MOD != 0),
            docs.filter(F.col("doc_id") % DECONTAM_EVAL_MOD == 0),
        ).localCheckpoint(eager=True)

    return session_cached(_CONTAM_LEG_CACHE, spark, (sf_dir,), _build)


_BACKOFF_LEG_CACHE: dict = {}
_BPE_PIECES_CACHE: dict = {}
_UNIGRAM_LEG_CACHE: dict = {}
_QC_WEIGHTS_CACHE: dict = {}
_BPE_LEG_CACHE: dict = {}
_DSIR_LEG_CACHE: dict = {}
_TOKPACK_LEG_CACHE: dict = {}
_PPL_LEG_CACHE: dict = {}
_VERDICT_LEG_CACHE: dict = {}
_UNITOK_LEG_CACHE: dict = {}


def _unitok_leg_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached unigram-tokenizer gate leg (r13): train the
    SentencePiece-style unigram LM at the gate budgets (one hard-EM
    round, max piece 3, vocab 40) over the shared tokenized checkpoint,
    then Viterbi-segment the corpus via the word-keyed join path with
    the per-doc integer score. Emits harmonized rows for BOTH sub-legs:
    ('ut_vocab', vid, piece, cnt, lp_e4) — the whole trained model under
    the hash — and ('ut_seg', doc_id, md5 of the pieces, n_pieces,
    score). Oracle: unigram.unigram_gate_sql's rolling-window recursive-
    CTE Viterbi (``ug_`` prefix reserved)."""
    from ..io import session_cached
    from .unigram import (
        UNI_GATE_MAXP,
        UNI_GATE_ROUNDS,
        UNI_GATE_VOCAB,
        unigram_segment,
        unigram_train,
    )

    def _build() -> DataFrame:
        docs = _docs_tokenized_cached(spark, sf_dir)
        v = unigram_train(
            docs,
            vocab_size=UNI_GATE_VOCAB,
            n_rounds=UNI_GATE_ROUNDS,
            max_piece=UNI_GATE_MAXP,
        )
        seg = unigram_segment(
            docs,
            v,
            max_piece=UNI_GATE_MAXP,
            ordered=False,
            with_score=True,
        )
        zero = F.lit(0).cast("bigint")
        vocab_rows = v.select(
            F.lit("ut_vocab").alias("leg"),
            F.col("id").cast("bigint").alias("id"),
            F.col("piece").alias("txt"),
            F.col("cnt").cast("bigint").alias("m1"),
            F.col("lp_e4").cast("bigint").alias("m2"),
            zero.alias("m3"),
        )
        seg_rows = seg.select(
            F.lit("ut_seg").alias("leg"),
            F.col("doc_id").cast("bigint").alias("id"),
            F.md5(F.concat_ws(" ", "pieces")).alias("txt"),
            F.col("n_pieces").cast("bigint").alias("m1"),
            F.col("score").cast("bigint").alias("m2"),
            zero.alias("m3"),
        )
        return vocab_rows.unionByName(seg_rows).localCheckpoint(eager=True)

    return session_cached(_UNITOK_LEG_CACHE, spark, (sf_dir,), _build)


def _verdict_leg_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached mixer-verdict leg (r13): composes three cached
    signal frames plus two narrow maps; caching the docs-sized result
    follows the sibling discipline (measured ~0.3 s/warm-call otherwise
    — the four-join subtree re-plans every gate call)."""
    from ..io import session_cached

    def _build() -> DataFrame:
        from .classifier import qc_report

        docs = _docs_tokenized_cached(spark, sf_dir)
        return filter_verdict(
            docs,
            _contam_leg_cached(spark, sf_dir),
            repetition_signals(docs),
            _ppl_leg_cached(spark, sf_dir),
            qc_report(docs, _qc_weights_cached(spark, sf_dir), ordered=False),
        ).localCheckpoint(eager=True)

    return session_cached(_VERDICT_LEG_CACHE, spark, (sf_dir,), _build)


def _ppl_leg_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached CCNet perplexity-bucketing leg (r13): derives
    purely from the cached backoff scores, but participating UNCACHED in
    the 15-leg union added ~1 s of per-call plan/exchange overhead at
    sf0.1 (measured; the standalone leg runs 0.3 s warm) — so the
    corpus-sized label frame checkpoints once per (session, sf_dir) like
    its siblings."""
    from ..io import session_cached

    def _build() -> DataFrame:
        return ppl_bucket(
            _backoff_leg_cached(spark, sf_dir)
        ).localCheckpoint(eager=True)

    return session_cached(_PPL_LEG_CACHE, spark, (sf_dir,), _build)


def _tokpack_leg_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached tokenize-and-pack leg (r13): encode the corpus
    under the induced vocabulary (the certified 'encode' machinery,
    unordered) and materialize the fixed-length training sequences via
    pack_token_ids — the artifact a pretraining pipeline actually lands.
    Sequence-count-sized result (total_tokens / PACK_CONTEXT rows), so
    the checkpoint is small."""
    from ..io import session_cached

    def _build() -> DataFrame:
        docs = _docs_tokenized_cached(spark, sf_dir)
        enc = encode_with_vocab(docs, build_vocab(docs), ordered=False)
        return pack_token_ids(enc).localCheckpoint(eager=True)

    return session_cached(_TOKPACK_LEG_CACHE, spark, (sf_dir,), _build)


def _dsir_leg_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached DSIR importance-resampling leg (r13): feature
    explode + two bucket-keyed aggs + bucket join + doc re-agg per build
    — per-session-constant, so it rides the bigram/contam discipline
    over the shared tokenized checkpoint."""
    from ..io import session_cached
    from .dsir import dsir_logratio

    def _build() -> DataFrame:
        return dsir_logratio(
            _docs_tokenized_cached(spark, sf_dir), ordered=False
        ).localCheckpoint(eager=True)

    return session_cached(_DSIR_LEG_CACHE, spark, (sf_dir,), _build)


def _bpe_leg_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached BPE gate leg (r13): train BPE_GATE_MERGES merges
    over the shared tokenized corpus (8 vocabulary-sized shuffles + 8
    one-row collects), then segment the corpus via the SCALE PATH — the
    word-keyed join of corpus words against the trained (word, symbols)
    table (bpe_segment(encoded_words=...)), so the certified plan is the
    one a 30k-merge production run would use, not the rank-by-rank fold.
    Emits harmonized rows for BOTH sub-legs: ('bpe_merge', rank, 'l r')
    for the learned rule sequence and ('bpe_seg', doc_id, md5 of the
    pieces) for the segmentation. The trained word table's checkpoint is
    freed once the leg materializes."""
    from ..io import free_local_checkpoint, session_cached
    from .bpe import (
        BPE_GATE_MERGES,
        bpe_encode,
        bpe_segment,
        bpe_train,
        bpe_vocab,
    )

    def _build() -> DataFrame:
        docs = _docs_tokenized_cached(spark, sf_dir)
        counts: list = []
        merges, words = bpe_train(
            docs, n_merges=BPE_GATE_MERGES, counts_out=counts
        )
        if len(merges) != BPE_GATE_MERGES:
            raise ValueError(
                f"bpe gate: corpus ran out of pairs after {len(merges)} "
                f"merges (budget {BPE_GATE_MERGES}) - degenerate fixture?"
            )
        zero = F.lit(0).cast("bigint")
        merge_rows = spark.createDataFrame(
            [
                (i + 1, f"{l} {r}", c)
                for i, ((l, r), c) in enumerate(zip(merges, counts))
            ],
            "id bigint, txt string, m1 bigint",
        ).select(F.lit("bpe_merge").alias("leg"), "id", "txt", "m1",
                 zero.alias("m2"), zero.alias("m3"))
        # ONE segmentation feeds both the seg and ids legs (review r13:
        # the union has no cross-branch subtree reuse, so an uncheck-
        # pointed shared frame would still evaluate twice) — eager
        # checkpoint, freed with the word table after `out` materializes
        seg = bpe_segment(
            docs, merges, encoded_words=words, ordered=False
        ).localCheckpoint(eager=True)
        seg_rows = seg.select(
            F.lit("bpe_seg").alias("leg"),
            F.col("doc_id").alias("id"),
            F.md5(F.concat_ws(" ", "pieces")).alias("txt"),
            F.col("n_pieces").cast("bigint").alias("m1"),
            zero.alias("m2"),
            zero.alias("m3"),
        )
        # r13 late: 'bpe_ids' certifies bpe_vocab + bpe_encode — the
        # GPT-2 id layout (alphabet lexicographic, merges in training
        # order) and the broadcast-vocab encode, md5 per id stream.
        enc = bpe_encode(
            docs,
            merges,
            bpe_vocab(merges, words),
            segmented=seg,
            ordered=False,
        )
        ids_rows = enc.select(
            F.lit("bpe_ids").alias("leg"),
            F.col("doc_id").alias("id"),
            F.md5(
                F.concat_ws(",", F.transform("ids", lambda x: x.cast("string")))
            ).alias("txt"),
            F.col("n_pieces").cast("bigint").alias("m1"),
            zero.alias("m2"),
            zero.alias("m3"),
        )
        out = (
            merge_rows.unionByName(seg_rows)
            .unionByName(ids_rows)
            .localCheckpoint(eager=True)
        )
        free_local_checkpoint(words)
        free_local_checkpoint(seg)
        return out

    return session_cached(_BPE_LEG_CACHE, spark, (sf_dir,), _build)


def _qc_weights_cached(spark: SparkSession, sf_dir: str) -> list:
    """Session-cached trained classifier weights (r13, 'qc' gate leg):
    training is one 256-row collect + driver GD — constant per
    (session, sf_dir), and caching keeps the gate's repeat samples to the
    zero-shuffle scoring map alone. The cached value is the ROUNDED
    weight list (qc_gate_weights — the cross-engine contract), not a
    DataFrame: session_cached stores it fine, there is just no
    checkpoint to free on eviction."""
    from ..io import session_cached
    from .classifier import qc_gate_weights

    return session_cached(
        _QC_WEIGHTS_CACHE,
        spark,
        (sf_dir,),
        lambda: qc_gate_weights(_docs_tokenized_cached(spark, sf_dir)),
    )


def _backoff_leg_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached stupid-backoff leg (r12, 9th gate leg): five
    key-partitioned joins over the exploded trigram stream per build —
    per-session-constant, so it rides the bigram/contam discipline and
    consumes the shared tokenized checkpoint."""
    from ..io import session_cached

    def _build() -> DataFrame:
        return trigram_backoff_logprob(
            _docs_tokenized_cached(spark, sf_dir)
        ).localCheckpoint(eager=True)

    return session_cached(_BACKOFF_LEG_CACHE, spark, (sf_dir,), _build)


def _bigram_leg_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached bigram-LM leg of the quality gate (ADVICE r10): the
    exploded pair subtree persists for the single build, the docs-sized
    result checkpoints once per (session, sf_dir), and the persisted
    scratch frees deterministically after materialization — without this,
    every gate call (bench samples 3x) leaked either a recompute of the
    widest per-doc explode or an unfreeable per-call checkpoint."""
    from ..io import free_local_checkpoint, session_cached

    def _build() -> DataFrame:
        scratch: list = []
        out = bigram_logprob(
            _docs_tokenized_cached(spark, sf_dir), scratch_out=scratch
        ).localCheckpoint(eager=True)
        for df in scratch:
            df.unpersist()
        return out

    return session_cached(_BIGRAM_LEG_CACHE, spark, (sf_dir,), _build)


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval gate, union-tagged since r10 (leg, qid, rank, did,
    score_en4): the certified BM25 top-k list (leg='bm25', defaults:
    first 10 docs as queries, top 5 per query) PLUS the hybrid
    reciprocal-rank fusion of that list with the exact cosine top-k
    over the aligned embeddings table (leg='rrf', score =
    similarity.hybrid_rrf_topk's integer rrf_e6) — certifying the
    hybrid-retrieval merge under the driver hash. vec_id == doc_id by
    testdata construction, so the two branches rank the same document
    collection; the fused order genuinely differs from the lexical
    branch (42-46/50 slots across sf0.001-0.1, pinned at >= 60% in
    tests so a degenerate agreement fails loudly). The semantic branch
    re-reads the
    session-cached exact top-k the similarity gates already
    materialize; the DuckDB oracle restates the fusion over the same
    two branch queries (validated against an independent Python RRF
    before wiring)."""
    from ..io import free_local_checkpoint, session_cached
    from .similarity import hybrid_rrf_topk, q_cosine_topk

    def _build() -> DataFrame:
        scratch: list = []
        out = bm25_topk(
            load_table_parallel(spark, sf_dir, "documents"),
            materialize_tf=True,
            scratch_out=scratch,
        ).localCheckpoint(eager=True)
        # the per-(doc,term) inverted-index checkpoint is orders of
        # magnitude larger than the 50-row result it built — free it
        # once the result materializes (review r10)
        for df in scratch:
            free_local_checkpoint(df)
        return out

    bm = session_cached(_BM25_TOPK_CACHE, spark, (sf_dir,), _build)
    fused = hybrid_rrf_topk(bm, q_cosine_topk(spark, sf_dir))
    return (
        bm.select(
            F.lit("bm25").alias("leg"), "qid", "rank", "did", "score_en4"
        )
        .unionByName(
            fused.select(
                F.lit("rrf").alias("leg"),
                "qid",
                "rank",
                "did",
                F.col("rrf_e6").alias("score_en4"),
            )
        )
        .orderBy("leg", "qid", "rank")
    )


def hybrid_bm25_rrf_sql() -> str:
    """DuckDB twin of the union-tagged q_bm25_topk: the bm25_topk_sql
    chain embedded as a subquery (hyb_-prefixed outer CTEs — an outer
    name colliding with an embedded WITH binds wrong, the r06 lesson),
    the exact-cosine branch embedded as similarity.COSINE_TOPK_SQL
    VERBATIM (review r10: a hand restatement could silently drift from
    the shared convention the Spark side consumes via q_cosine_topk),
    and the identical integer RRF fusion."""
    from .similarity import COSINE_TOPK_SQL, RRF_K, TOP_K

    return f"""
WITH hyb_bm AS MATERIALIZED (SELECT * FROM ({bm25_topk_sql()})),
hyb_sem AS (
  SELECT qid, nid AS did, rank FROM ({COSINE_TOPK_SQL})
),
hyb_fused AS (
  SELECT qid, did, CAST(SUM(c) AS BIGINT) AS rrf_e6
  FROM (
    SELECT qid, did,
           CAST(ROUND(1000000.0 / (rank + {RRF_K})) AS BIGINT) AS c
    FROM hyb_bm
    UNION ALL
    SELECT qid, did, CAST(ROUND(1000000.0 / (rank + {RRF_K})) AS BIGINT)
    FROM hyb_sem)
  GROUP BY qid, did
),
hyb_ranked AS (
  SELECT qid, did, rrf_e6,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf_e6 DESC, did ASC)
           AS rank
  FROM hyb_fused
)
SELECT 'bm25' AS leg, qid, rank, did, score_en4 FROM hyb_bm
UNION ALL
SELECT 'rrf' AS leg, qid, rank, did, rrf_e6 AS score_en4
FROM hyb_ranked WHERE rank <= {TOP_K}
ORDER BY leg, qid, rank
"""


_TEXT_GATE_FRAME_MEMO: dict = {}


def drain_session_caches() -> None:
    """Free + clear EVERY session cache this module owns, including the
    gate's prepared-query frame memo (ADVICE r13: the memo holds a lazy
    frame referencing the leg checkpoints — any drain site that clears a
    leg cache but leaves the memo hands the next caller dangling
    checkpoint scans; centralizing the enumeration HERE makes that
    invariant structural instead of a convention each drain site must
    remember). Callers: tools/scale_probe.py's cold-sample reset, tests.
    Values are checkpointed DataFrames, tuples containing them, or plain
    model objects (cleared; nothing to free)."""
    from ..io import free_local_checkpoint

    for cache in (
        _BM25_TOPK_CACHE,
        _BIGRAM_LEG_CACHE,
        _DOCS_TOK_CACHE,
        _CONTAM_LEG_CACHE,
        _BACKOFF_LEG_CACHE,
        _QC_WEIGHTS_CACHE,
        _BPE_LEG_CACHE,
        _DSIR_LEG_CACHE,
        _TOKPACK_LEG_CACHE,
        _PPL_LEG_CACHE,
        _VERDICT_LEG_CACHE,
        _UNIGRAM_LEG_CACHE,
        _UNITOK_LEG_CACHE,
        _BPE_PIECES_CACHE,
        _TEXT_GATE_FRAME_MEMO,
    ):
        for v in list(cache.values()):
            for x in v if isinstance(v, tuple) else (v,):
                if hasattr(x, "unpersist"):
                    free_local_checkpoint(x)
        cache.clear()


def q_text_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-tagged driver gate — thin prepared-query wrapper (r13
    optimization round, guide §7.3: planning time itself can become the
    bottleneck). The assembled 19-leg union frame is memoized per
    (session, sf_dir): `_build_text_gate_frame`'s ~300-expression tree
    cost ~1.3 s of per-call Python construction + Catalyst analysis,
    although it is a pure function of (session, sf_dir). The memo holds
    the lazily-assembled DataFrame OBJECT only — no result data beyond
    the legs' inventoried session checkpoints is materialized, and
    optimization, physical planning and execution still run on every
    call (the noop sink re-executes the full plan). The presentation
    sort stays live per call on top."""
    from ..io import session_cached

    frame = session_cached(
        _TEXT_GATE_FRAME_MEMO,
        spark,
        (sf_dir,),
        lambda: _build_text_gate_frame(spark, sf_dir),
    )
    return frame.orderBy("leg", "id", "txt")


def _build_text_gate_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-tagged driver gate (r05 rotation) for the corpus-quality ops
    previously pytest-only: Gopher repetition signals, the quality
    threshold sweep, and the induced tokenizer vocabulary, harmonized to
    (leg, id, txt, m1, m2, m3):

      repetition  id=doc_id, m1..m3 = dup_sent / dup_token / top_bigram ppm
      sweep       id=threshold_bp, m1..m3 = n_docs_kept / n_tokens_kept /
                  token_share_ppm
      vocab       id=rank, txt=piece, m1=n_occ
      encode      id=doc_id, txt=md5 of the id-sequence CSV (certifies the
                  full encoded token stream, not just its length),
                  m1=n_pieces
      unigram     id=doc_id, m1=n_tokens, m2=sum_logprob_en4,
                  m3=avg_logprob_en4
      bigram      id=doc_id, m1=n_bigrams, m2=sum_logprob_en4,
                  m3=avg_logprob_en4 (r10 — the fluency leg; <2-token
                  docs emit (0, 0, 0))
      contam      id=doc_id, m1=n_grams, m2=n_contam, m3=contam_ppm
                  (r11 — benchmark decontamination against the
                  deterministic mod-7 eval split; 8-gram overlap)
      pack        id=doc_id, m1=cum_start, m2=pack_first, m3=pack_last
                  (r11 — concat-and-chunk sequence packing; the Spark
                  side is the distributed two-phase prefix sum, the
                  oracle the direct global cumsum, so the decomposition
                  itself is what the hash certifies)
      backoff     id=doc_id, m1=n_trigrams, m2=sum_logprob_en4,
                  m3=avg_logprob_en4 (r12 — held-out stupid-backoff
                  trigram LM; the mod-7 train/score split makes all
                  three backoff branches live under the hash)
      qc          id=doc_id, m1=logit_en4, m2=pred, m3=agree (r13 — the
                  weak-label-distillation quality classifier: the hash
                  certifies TRAINING (the oracle re-runs the same
                  200-step logistic GD in chained SQL CTEs, weights
                  rounded to QC_WEIGHT_DECIMALS on both engines) and the
                  zero-shuffle literal-weight scoring)
      bpe_merge   id=rank, txt='l r', m1=the pair's exact corpus count
                  at selection time (r13 — the learned BPE merge rule
                  sequence; the oracle re-trains the same fixed-count
                  Sennrich loop as chained CTE triples — pure
                  integer/string math, no rounding-risk class)
      bpe_seg     id=doc_id, txt=md5 of the space-joined pieces,
                  m1=n_pieces (r13 — segmentation under the trained
                  model via the word-keyed JOIN path, the 100 TB shape)
      bpe_ids     id=doc_id, txt=md5 of the comma-joined token ids,
                  m1=n_pieces (r13 — bpe_vocab's GPT-2 id layout +
                  bpe_encode's broadcast-vocab join under the hash)
      ppl_bucket  id=doc_id, txt=head|middle|tail|skip, m1=1e-2-nat
                  grid score, m2/m3=the corpus tercile cutoffs (r13 —
                  CCNet perplexity bucketing over the cached backoff
                  scores; the hash certifies labels AND cutoffs)
      ut_vocab    id=piece_id, txt=piece, m1=cnt, m2=lp_e4 (r13 — the
                  unigram-LM tokenizer's ENTIRE trained model after one
                  hard-EM round; oracle re-trains in SQL with a
                  rolling-window recursive-CTE Viterbi)
      ut_seg      id=doc_id, txt=md5 of the pieces, m1=n_pieces,
                  m2=total integer Viterbi score (r13 — max-likelihood
                  segmentation via the word-keyed join path)
      verdict     id=doc_id, txt=reason (contam|repet|ppl_tail|lowq|
                  keep), m1=keep flag (r13 — the Dolma-mixer decision
                  composing four certified signal frames under a fixed
                  reason precedence)
      dsir        id=doc_id, m1=n_feats, m2=logratio_en4, m3=sampled
                  (r13 — DSIR importance resampling: hashed unigram+
                  bigram target-vs-background log importance ratio,
                  integer 1e-4 nats; target = the quality pseudo-label)
      tokpack     id=seq_id, txt=md5 of the packed id window, m1=
                  n_tokens (r13 — tokenize-and-pack: the materialized
                  fixed-length training sequences, two-phase prefix sum
                  vs the oracle's direct cumsum)
      gopher      id=doc_id, txt=first-failing rule code (words|mwl|sym|
                  alpha|stop|keep), m1=keep, m2=n_words, m3=mean word
                  length in a 1e-2 grid (r13 — the canonical Gopher
                  §A1.1 document filter; integer grids, gp_ reserved)

    Scale shapes are the standalone operators', unchanged: repetition's
    zero-shuffle narrow map, the sweep's ~21-row band table, vocab's
    TakeOrderedAndProject top-k, encode's broadcast-vocab join + one
    doc-keyed reassembly shuffle, unigram's token-count shuffle join,
    bigram's bigram-keyed shuffle join over the zero-shuffle zip_with
    pair construction.

    r12: all legs consume ONE shared tokenized checkpoint
    (_docs_tokenized_cached) instead of independent scan+split subtrees;
    the contam leg — the widest explode — is session-cached like the
    bigram leg (ADVICE r11); and the 9th 'backoff' leg certifies the
    held-out stupid-backoff trigram LM (session-cached build).
    """
    docs = _docs_tokenized_cached(spark, sf_dir)
    # r13: the five cached leg builds (bigram, contam, backoff, qc
    # weights, bpe) are independent once the shared tokenized checkpoint
    # above exists — under io.session_cached's per-key build locks they
    # run on concurrent driver threads (the q_two_stage_topk pattern), so
    # a cold gate pays the slowest build, not the sum (measured 22.8 ->
    # 15.8 s cold at sf0.1 — the floor is the BPE leg's 8 inherently
    # sequential training rounds). Warm calls are five dict hits.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=9) as _ex:
        _f_bg = _ex.submit(_bigram_leg_cached, spark, sf_dir)
        _f_ct = _ex.submit(_contam_leg_cached, spark, sf_dir)
        _f_bk = _ex.submit(_backoff_leg_cached, spark, sf_dir)
        _f_qc = _ex.submit(_qc_weights_cached, spark, sf_dir)
        _f_bpe = _ex.submit(_bpe_leg_cached, spark, sf_dir)
        _f_ds = _ex.submit(_dsir_leg_cached, spark, sf_dir)
        _f_tp = _ex.submit(_tokpack_leg_cached, spark, sf_dir)
        # ppl chains on backoff via session_cached's per-key lock: its
        # thread blocks on the backoff build, then layers the bounded
        # histogram pass — still off this thread's critical path
        _f_ppl = _ex.submit(_ppl_leg_cached, spark, sf_dir)
        # verdict chains on contam/ppl/qc-weights via their build locks
        _f_vd = _ex.submit(_verdict_leg_cached, spark, sf_dir)
        # r13: the unigram-tokenizer leg (one EM round = 2 bounded
        # collects) rides its own thread like the BPE leg
        _f_ut = _ex.submit(_unitok_leg_cached, spark, sf_dir)
        # r13 optimization round: the pretokenized-pieces checkpoint (read
        # by the vocab + encode legs below) and the unigram-LM leg join
        # the same concurrent build pool
        _f_pieces = _ex.submit(_bpe_pieces_cached, spark, sf_dir)
        _f_uni = _ex.submit(_unigram_leg_cached, spark, sf_dir)
        _bg_df, _ct_df, _bk_df = _f_bg.result(), _f_ct.result(), _f_bk.result()
        _qc_w, _bpe_df, _ds_df = _f_qc.result(), _f_bpe.result(), _f_ds.result()
        _tp_df, _ppl_df, _vd_df = _f_tp.result(), _f_ppl.result(), _f_vd.result()
        _ut_df = _f_ut.result()
        _pieces_df, _uni_df = _f_pieces.result(), _f_uni.result()
    zero = F.lit(0).cast("bigint")
    empty = F.lit("").alias("txt")
    rep = repetition_signals(docs).select(
        F.lit("repetition").alias("leg"),
        F.col("doc_id").alias("id"),
        empty,
        F.col("dup_sent_ppm").cast("bigint").alias("m1"),
        F.col("dup_token_ppm").cast("bigint").alias("m2"),
        F.col("top_bigram_ppm").cast("bigint").alias("m3"),
    )
    # 17th leg (r13): the canonical Gopher document-rule filter — a
    # zero-shuffle narrow map like the repetition leg (no session cache:
    # nothing to amortize).
    gopher = gopher_rules(docs, ordered=False).select(
        F.lit("gopher").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("code").alias("txt"),
        F.col("keep").alias("m1"),
        F.col("n_words").alias("m2"),
        F.col("mwl_c100").alias("m3"),
    )
    sweep = quality_threshold_sweep(docs).select(
        F.lit("sweep").alias("leg"),
        F.col("threshold_bp").alias("id"),
        empty,
        F.col("n_docs_kept").cast("bigint").alias("m1"),
        F.col("n_tokens_kept").cast("bigint").alias("m2"),
        F.col("token_share_ppm").cast("bigint").alias("m3"),
    )
    vocab_df = build_vocab(docs, pieces=_pieces_df)
    vocab = vocab_df.select(
        F.lit("vocab").alias("leg"),
        F.col("rank").cast("bigint").alias("id"),
        F.col("piece").alias("txt"),
        F.col("n_occ").cast("bigint").alias("m1"),
        zero.alias("m2"),
        zero.alias("m3"),
    )
    # ordered=False: the union's own orderBy re-sorts (review r13 — the
    # flag's raison d'être names the gate legs as the callers)
    enc = encode_with_vocab(docs, vocab_df, ordered=False, pieces=_pieces_df).select(
        F.lit("encode").alias("leg"),
        F.col("doc_id").alias("id"),
        F.md5(
            F.concat_ws(",", F.transform("ids", lambda x: x.cast("string")))
        ).alias("txt"),
        F.col("n_pieces").cast("bigint").alias("m1"),
        zero.alias("m2"),
        zero.alias("m3"),
    )
    uni = _uni_df.select(
        F.lit("unigram").alias("leg"),
        F.col("doc_id").alias("id"),
        empty,
        F.col("n_tokens").cast("bigint").alias("m1"),
        F.col("sum_logprob_en4").cast("bigint").alias("m2"),
        F.col("avg_logprob_en4").cast("bigint").alias("m3"),
    )
    bg = _bg_df.select(
        F.lit("bigram").alias("leg"),
        F.col("doc_id").alias("id"),
        empty,
        F.col("n_bigrams").cast("bigint").alias("m1"),
        F.col("sum_logprob_en4").cast("bigint").alias("m2"),
        F.col("avg_logprob_en4").cast("bigint").alias("m3"),
    )
    # 7th leg (r11): benchmark decontamination over the deterministic
    # mod-7 eval split — per train doc: distinct 8-grams, eval-overlapping
    # 8-grams, contamination ppm (the contaminated flag is m2 > 0).
    contam = _ct_df.select(
        F.lit("contam").alias("leg"),
        F.col("doc_id").alias("id"),
        empty,
        F.col("n_grams").alias("m1"),
        F.col("n_contam").alias("m2"),
        F.col("contam_ppm").alias("m3"),
    )
    # 8th leg (r11): sequence packing — the two-phase distributed prefix
    # sum vs the oracle's direct global cumsum.
    pack = pack_sequences(docs).select(
        F.lit("pack").alias("leg"),
        F.col("doc_id").alias("id"),
        empty,
        F.col("cum_start").alias("m1"),
        F.col("pack_first").alias("m2"),
        F.col("pack_last").alias("m3"),
    )
    # 9th leg (r12): held-out stupid-backoff trigram LM.
    backoff = _bk_df.select(
        F.lit("backoff").alias("leg"),
        F.col("doc_id").alias("id"),
        empty,
        F.col("n_trigrams").alias("m1"),
        F.col("sum_logprob_en4").alias("m2"),
        F.col("avg_logprob_en4").alias("m3"),
    )
    # 15th leg (r13): CCNet perplexity bucketing — rides the same cached
    # backoff scores; cutoffs from the bounded grid histogram.
    ppl = _ppl_df.select(
        F.lit("ppl_bucket").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("bucket").alias("txt"),
        F.col("s_grid").alias("m1"),
        F.col("cut_lo").alias("m2"),
        F.col("cut_hi").alias("m3"),
    )
    # 10th leg (r13): the weak-label-distillation quality classifier —
    # GD-trained weights (session-cached, rounded per the cross-engine
    # contract) scoring the whole corpus in one zero-shuffle narrow map;
    # the oracle re-trains the same GD in chained SQL CTEs.
    from .classifier import qc_report

    qc = qc_report(docs, _qc_w, ordered=False).select(
        F.lit("qc").alias("leg"),
        F.col("doc_id").alias("id"),
        empty,
        F.col("logit_en4").alias("m1"),
        F.col("pred").cast("bigint").alias("m2"),
        F.col("agree").cast("bigint").alias("m3"),
    )
    # 11th/12th legs (r13): BPE merge training + join-path segmentation
    # (session-cached; both sub-legs ride one frame).
    bpe = _bpe_df
    # 14th leg (r13): tokenize-and-pack — the materialized fixed-length
    # training sequences (md5 over each window's id stream).
    tokpack = _tp_df.select(
        F.lit("tokpack").alias("leg"),
        F.col("seq_id").alias("id"),
        F.md5(
            F.concat_ws(",", F.transform("ids", lambda x: x.cast("string")))
        ).alias("txt"),
        F.col("n_tokens").cast("bigint").alias("m1"),
        zero.alias("m2"),
        zero.alias("m3"),
    )
    # 16th leg (r13): the mixer decision — composes four certified
    # signal frames (contam/repetition/ppl/qc) into one keep/drop
    # verdict with first-failing-rule reason codes.
    verdict = _vd_df.select(
        F.lit("verdict").alias("leg"),
        F.col("doc_id").alias("id"),
        F.col("reason").alias("txt"),
        F.col("keep").alias("m1"),
        zero.alias("m2"),
        zero.alias("m3"),
    )
    # 13th leg (r13): DSIR importance resampling — hashed-n-gram
    # target-vs-background log importance ratio per doc.
    dsir = _ds_df.select(
        F.lit("dsir").alias("leg"),
        F.col("doc_id").alias("id"),
        empty,
        F.col("n_feats").cast("bigint").alias("m1"),
        F.col("logratio_en4").cast("bigint").alias("m2"),
        F.col("sampled").cast("bigint").alias("m3"),
    )
    # 18th/19th legs (r13): the unigram-LM tokenizer — the trained model
    # (ut_vocab) and the scored Viterbi segmentation (ut_seg), already
    # harmonized rows from the cached builder.
    unitok = _ut_df
    return (
        rep.unionByName(gopher)
        .unionByName(sweep)
        .unionByName(vocab)
        .unionByName(enc)
        .unionByName(uni)
        .unionByName(bg)
        .unionByName(contam)
        .unionByName(pack)
        .unionByName(backoff)
        .unionByName(ppl)
        .unionByName(verdict)
        .unionByName(qc)
        .unionByName(bpe)
        .unionByName(dsir)
        .unionByName(tokpack)
        .unionByName(unitok)
    )


def _qc_gate_body_sql() -> str:
    """classifier.qc_gate_sql via a late import (classifier imports this
    module at ITS top level; importing it back at text's module level
    would be the circular-import shape)."""
    from .classifier import qc_gate_sql

    return qc_gate_sql()


def text_quality_signals_sql() -> str:
    """DuckDB twin assembled from the same per-leg SQL generators. Every
    signal body consumed by MORE THAN ONE leg is hoisted to a top-level
    MATERIALIZED CTE (tbb = trigram backoff, rpb = repetition, ctb =
    contamination, qcb = quality classifier, pbb = perplexity buckets —
    all names reserved): the backoff/ppl legs share tbb, and the r13
    'verdict' leg re-reads rpb/ctb/qcb/pbb — inlining any of them twice
    would double the oracle's most expensive chains."""
    return f"""
WITH tbb AS MATERIALIZED ({_TRIGRAM_BACKOFF_BODY_SQL}),
rpb AS MATERIALIZED ({REPETITION_SQL}),
ctb AS MATERIALIZED ({DECONTAM_SQL.replace("ORDER BY doc_id", "")}),
qcb AS MATERIALIZED ({_qc_gate_body_sql()}),
pbb AS MATERIALIZED (SELECT * FROM ({_PPL_BUCKET_OVER_TBB_SQL}))
SELECT 'repetition' AS leg, doc_id AS id, '' AS txt,
       CAST(dup_sent_ppm AS BIGINT) AS m1, CAST(dup_token_ppm AS BIGINT) AS m2,
       CAST(top_bigram_ppm AS BIGINT) AS m3
FROM rpb
UNION ALL
SELECT 'gopher' AS leg, doc_id AS id, code AS txt,
       CAST(keep AS BIGINT) AS m1, CAST(n_words AS BIGINT) AS m2,
       CAST(mwl_c100 AS BIGINT) AS m3
FROM ({gopher_rules_sql()})
UNION ALL
SELECT 'sweep' AS leg, threshold_bp AS id, '' AS txt,
       CAST(n_docs_kept AS BIGINT), CAST(n_tokens_kept AS BIGINT),
       CAST(token_share_ppm AS BIGINT)
FROM ({quality_threshold_sweep_sql()})
UNION ALL
SELECT 'vocab' AS leg, CAST(rank AS BIGINT) AS id, piece AS txt,
       CAST(n_occ AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM ({build_vocab_sql()})
UNION ALL
SELECT 'encode' AS leg, doc_id AS id, md5(array_to_string(ids, ',')) AS txt,
       CAST(n_pieces AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM ({encode_with_vocab_sql()})
UNION ALL
SELECT 'unigram' AS leg, doc_id AS id, '' AS txt,
       CAST(n_tokens AS BIGINT), CAST(sum_logprob_en4 AS BIGINT),
       CAST(avg_logprob_en4 AS BIGINT)
FROM ({UNIGRAM_LOGPROB_SQL})
UNION ALL
SELECT 'bigram' AS leg, doc_id AS id, '' AS txt,
       CAST(n_bigrams AS BIGINT), CAST(sum_logprob_en4 AS BIGINT),
       CAST(avg_logprob_en4 AS BIGINT)
FROM ({BIGRAM_LOGPROB_SQL})
UNION ALL
SELECT 'contam' AS leg, doc_id AS id, '' AS txt,
       CAST(n_grams AS BIGINT), CAST(n_contam AS BIGINT),
       CAST(contam_ppm AS BIGINT)
FROM ctb
UNION ALL
SELECT 'pack' AS leg, doc_id AS id, '' AS txt,
       CAST(cum_start AS BIGINT), CAST(pack_first AS BIGINT),
       CAST(pack_last AS BIGINT)
FROM ({_PACK_BODY_SQL})
UNION ALL
SELECT 'backoff' AS leg, doc_id AS id, '' AS txt,
       CAST(n_trigrams AS BIGINT), CAST(sum_logprob_en4 AS BIGINT),
       CAST(avg_logprob_en4 AS BIGINT)
FROM tbb
UNION ALL
SELECT 'ppl_bucket' AS leg, doc_id AS id, bucket AS txt,
       s_grid AS m1, cut_lo AS m2, cut_hi AS m3
FROM pbb
UNION ALL
SELECT 'verdict' AS leg, doc_id AS id, reason AS txt,
       CAST(reason = 'keep' AS BIGINT) AS m1,
       CAST(0 AS BIGINT) AS m2, CAST(0 AS BIGINT) AS m3
FROM ({_VERDICT_OVER_CTES_SQL})
UNION ALL
SELECT 'qc' AS leg, doc_id AS id, '' AS txt,
       CAST(logit_en4 AS BIGINT), CAST(pred AS BIGINT),
       CAST(agree AS BIGINT)
FROM qcb
UNION ALL
SELECT leg, id, txt, m1, m2, m3
FROM ({_bpe_gate_body_sql()})
UNION ALL
SELECT 'dsir' AS leg, doc_id AS id, '' AS txt,
       CAST(n_feats AS BIGINT), CAST(logratio_en4 AS BIGINT),
       CAST(sampled AS BIGINT)
FROM ({_dsir_body_sql()})
UNION ALL
SELECT 'tokpack' AS leg, seq_id AS id,
       md5(array_to_string(ids, ',')) AS txt,
       CAST(n_tokens AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
FROM ({tokpack_sql()})
UNION ALL
SELECT leg, id, txt, m1, m2, m3
FROM ({_unigram_gate_body_sql()})
ORDER BY leg, id, txt
"""


def _dsir_body_sql() -> str:
    from .dsir import dsir_sql

    return dsir_sql()


def _unigram_gate_body_sql() -> str:
    from .unigram import unigram_gate_sql

    return unigram_gate_sql()


def _bpe_gate_body_sql() -> str:
    from .bpe import bpe_gate_sql

    return bpe_gate_sql()


def register_all() -> None:
    from ..registry import register

    # doc_clean_text AND lang-ID are folded into doc_stats (one scan, one
    # slot); the freed slots go to corpus_assembly (r03) and bm25_topk /
    # event_funnel_retention (r04 gate rotation). r05 adds the
    # text_quality_signals gate (repetition + sweep + vocab legs) in the
    # slot freed by the sketch_stats merge — the registry stays at the
    # driver's 50-query cap.
    register("doc_stats", q_doc_stats, DOC_STATS_SQL)
    register("text_quality_signals", q_text_quality_signals, text_quality_signals_sql())
    # doc_bpe_token_count merged into doc_stats (r05 gate rotation);
    # q_bpe_token_count + BPE_TOKEN_SQL stay the library API, pytest-pinned.
    # union-tagged since r10: bm25 leg + hybrid RRF fusion leg
    register("bm25_topk", q_bm25_topk, hybrid_bm25_rrf_sql())
