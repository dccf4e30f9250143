"""Model-based quality classifier (SURVEY.md §2.11 extension — the
"quality classifier" stage of a pretraining pipeline: GPT-3 filtered
Common Crawl with a linear classifier trained on weak/pseudo labels;
CCNet and fastText-style filters are the same shape).

Spark-first decomposition, the ivf_build/pq_train discipline:

  train   logistic regression by full-batch gradient descent on a
          DETERMINISTIC bounded sample (first `train_sample` docs by
          doc_id) — the sample is driver-resident BY CONSTRUCTION, so
          training runs in numpy on the driver: one Spark job collects
          features, every GD step is an in-memory matvec. Features are
          z-standardized from sample statistics for GD conditioning and
          the scaling is FOLDED INTO the returned weights, so scoring
          stays a plain dot product. Fixed step count + fixed learning
          rate + zero init = bit-reproducible weights run-to-run (no
          RNG anywhere).
  score   w . x as a zero-shuffle narrow map over the corpus — the
          weights are literals in the plan, features are pure column
          algebra over `text` (the text.py feature share: STOPWORDS /
          LANG_MARKERS), so scoring a 100 TB corpus is embarrassingly
          parallel with NO join and NO shuffle.

The default label is the WEAK-SUPERVISION distillation shape the real
pipelines use: the expensive/rule-based quality score thresholded into a
pseudo-label (quality_score_bp >= QC_LABEL_BP), distilled into a cheap
linear scorer. (The testdata's `lang` column is deliberately NOT the
demo label: it is statistically independent of the synthetic text —
measured marker ratios are identical across lang values — so no text
model can learn it; the quality pseudo-label is a real function of the
text.) Any Column label works via `label_col`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import LANG_MARKERS, STOPWORDS, tokens_col

#: GD budget: full-batch steps on the bounded sample. Fixed (not
#: early-stopped) so the trained weights are a pure function of the
#: sample — the reproducibility contract.
QC_STEPS = 200
QC_LR = 1.0
# 256: small enough that every driver SF (min corpus: 500 docs at
# sf0.001) leaves a real held-out remainder for the accuracy pin, large
# enough to cover both pseudo-label classes (~53/47 at the default
# threshold)
QC_TRAIN_SAMPLE = 256
# default pseudo-label threshold: the corpus quality-score median band
# (measured ~5400 at every SF), so the distillation task is
# class-balanced
QC_LABEL_BP = 5400
# decimal places the GATE-certified weights are rounded to on BOTH
# engines (numpy here, ROUND(x, 8) in the DuckDB twin): all intra-
# training float noise (libm exp, summation order) funnels into these
# six roundings — measured cross-engine weight deltas are ~1e-12, five
# orders below the 0.5e-8 boundary (the exact-IVF round(x, 6) risk
# class). 1e-8 weight precision shifts logits < 1e-7, invisible at the
# 1e-4 logit quantization.
QC_WEIGHT_DECIMALS = 8


def feature_cols(toks: Column) -> list[Column]:
    """The feature map, shared verbatim by training collection and corpus
    scoring so the two cannot drift (the quality_score_bp_col pattern):

      f0  bias (1.0)
      f1  stopword ratio          (English function words)
      f2  en-marker ratio         (text.LANG_MARKERS['en'])
      f3  zh-marker ratio         (the strongest confusable class)
      f4  type/token ratio
      f5  capped length           (min(n_tokens, 100) / 100)

    All ratios of exact integer counts over n_tokens — cheap, bounded
    [0, 1], and computable by any engine from `text` alone.
    """
    n = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    markers = dict(LANG_MARKERS)
    en_arr = F.array(*[F.lit(m) for m in markers["en"]])
    zh_arr = F.array(*[F.lit(m) for m in markers["zh"]])

    def ratio(arr: Column) -> Column:
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))) / n

    return [
        F.lit(1.0).alias("f0"),
        ratio(stop_arr).alias("f1"),
        ratio(en_arr).alias("f2"),
        ratio(zh_arr).alias("f3"),
        (F.size(F.array_distinct(toks)) / n).alias("f4"),
        (F.least(n, F.lit(100.0)) / 100.0).alias("f5"),
    ]


N_FEATURES = 6


def qc_train(
    docs: DataFrame,
    label_col: Column | None = None,
    train_sample: int = QC_TRAIN_SAMPLE,
    steps: int = QC_STEPS,
    lr: float = QC_LR,
) -> list[float]:
    """Train the classifier; returns the weight vector (driver-sized:
    N_FEATURES floats, standardization folded in). Default label: the
    quality pseudo-label (quality_score_bp >= QC_LABEL_BP).

    Full-batch GD on the logistic loss over the deterministic sample —
    ONE Spark job (the feature collect), then pure numpy. No RNG: zero
    init, fixed steps, fixed lr. Features z-standardize from sample
    statistics before GD (conditioning — raw ratio features span three
    orders of magnitude of gradient scale); the returned weights fold
    the standardization back (w_j / sd_j into the slope, the means into
    the bias), so qc_score stays a plain literal dot product.
    """
    import numpy as np

    from .text import _toks_of, quality_score_bp_col

    toks = _toks_of(docs)
    label = (
        (quality_score_bp_col(toks) >= QC_LABEL_BP)
        if label_col is None
        else label_col
    )
    # deterministic sample: first train_sample docs by doc_id
    rows = (
        docs.orderBy("doc_id")
        .limit(train_sample)
        .select(label.cast("double").alias("y"), *feature_cols(toks))
        .collect()
    )
    if not rows:
        raise ValueError("qc_train: empty docs input")
    y = np.asarray([r["y"] for r in rows], dtype=np.float64)
    x = np.asarray(
        [[r[f"f{i}"] for i in range(N_FEATURES)] for r in rows], dtype=np.float64
    )
    if not np.isfinite(x).all():
        raise ValueError("qc_train: non-finite feature in the training sample")
    if y.min() == y.max():
        raise ValueError(
            "qc_train: single-class training sample - the label column is "
            "constant over the first train_sample docs; widen the sample "
            "or fix the label"
        )
    mu = x[:, 1:].mean(axis=0)
    sd = x[:, 1:].std(axis=0)
    sd[sd == 0.0] = 1.0  # a constant feature carries no gradient either way
    xs = x.copy()
    xs[:, 1:] = (x[:, 1:] - mu) / sd
    w = np.zeros(N_FEATURES)
    n = len(y)
    for _ in range(steps):
        p = 1.0 / (1.0 + np.exp(-(xs @ w)))
        w -= lr * (xs.T @ (p - y)) / n
    # fold the standardization: w.xs == folded.x for every x
    folded = np.empty(N_FEATURES)
    folded[1:] = w[1:] / sd
    folded[0] = w[0] - float((w[1:] * mu / sd).sum())
    return [float(v) for v in folded]


def qc_score(
    docs: DataFrame, weights: list[float], ordered: bool = True
) -> DataFrame:
    """Score the corpus: (doc_id, logit_en4, pred) with the logit rounded
    to integer 1e-4 (the text-family integer discipline; pred = logit > 0).
    Zero-shuffle narrow map — weights are plan literals; `ordered=False`
    skips the presentation sort (the exact_substring_dedup contract).

    Input contract: `text` must be non-null. A NULL text raises at
    execution (per-row raise_error branch — ADVICE r12: NULL features
    would otherwise silently propagate into NULL logits/preds, the exact
    silent-corruption shape the pagerank weight guard exists to prevent;
    a branch inside the scoring expression costs nothing on clean rows
    where a separate limit-1 null scan would re-read the corpus)."""
    if len(weights) != N_FEATURES:
        raise ValueError(
            f"qc_score: expected {N_FEATURES} weights, got {len(weights)}"
        )
    logit = _logit_col(tokens_col(), weights)
    out = docs.select(
        "doc_id",
        F.round(logit * 10_000).cast("bigint").alias("logit_en4"),
        (logit > 0).alias("pred"),
    )
    return out.orderBy("doc_id") if ordered else out


def _logit_col(toks: Column, weights: list[float]) -> Column:
    """The folded dot product over feature_cols, guarded against NULL
    text (see qc_score docstring). Left-associated sum — the DuckDB twin
    states the identical association so the doubles agree bit-for-bit."""
    feats = feature_cols(toks)
    logit = sum(
        (F.lit(float(w)) * f for w, f in zip(weights[1:], feats[1:])),
        F.lit(float(weights[0])),
    )
    return F.when(
        F.col("text").isNull(),
        F.raise_error(
            F.concat(
                F.lit("qc_score: NULL text for doc_id="),
                F.col("doc_id").cast("string"),
                F.lit(" - the corpus is corrupted upstream"),
            )
        ).cast("double"),
    ).otherwise(logit)


def qc_gate_weights(docs: DataFrame, **train_kwargs) -> list[float]:
    """qc_train, then round every folded weight to QC_WEIGHT_DECIMALS —
    THE cross-engine weight contract for the driver gate (the DuckDB twin
    trains the same GD in SQL and applies ROUND(w, 8); see
    QC_WEIGHT_DECIMALS for the noise-funnel argument). Rounding is
    half-away-from-zero (ivf._round_half_away — review r13: Python's
    builtin round() is banker's, so a weight landing on a 0.5e-8
    boundary would round to a DIFFERENT grid point than DuckDB's ROUND;
    bit-equal on the current fixtures either way, but half-away removes
    the latent divergence class)."""
    from .ivf import _round_half_away

    return [
        _round_half_away(v, QC_WEIGHT_DECIMALS)
        for v in qc_train(docs, **train_kwargs)
    ]


def qc_report(
    docs: DataFrame, weights: list[float], ordered: bool = True
) -> DataFrame:
    """(doc_id, logit_en4, pred, agree) in ONE zero-shuffle narrow map:
    the pseudo-label lives on the same row as the score (text/n_chars are
    both input columns), so the audit report needs NO join — the r12
    join+orderBy shape re-partitioned the corpus twice for nothing."""
    from .text import _toks_of, quality_score_bp_col

    if len(weights) != N_FEATURES:
        raise ValueError(
            f"qc_report: expected {N_FEATURES} weights, got {len(weights)}"
        )
    toks = _toks_of(docs)
    logit = _logit_col(toks, weights)
    pred = logit > 0
    label = quality_score_bp_col(toks) >= QC_LABEL_BP
    out = docs.select(
        "doc_id",
        F.round(logit * 10_000).cast("bigint").alias("logit_en4"),
        pred.alias("pred"),
        (pred == label).alias("agree"),
    )
    return out.orderBy("doc_id") if ordered else out


def quality_classifier_report(docs: DataFrame) -> DataFrame:
    """Train-and-score in one call: the filter table a curation pipeline
    lands before thresholding (one row per doc, logit + prediction +
    agreement with the pseudo-label for audit)."""
    return qc_report(docs, qc_train(docs))


def qc_gate_sql(
    steps: int = QC_STEPS,
    lr: float = QC_LR,
    train_sample: int = QC_TRAIN_SAMPLE,
    label_bp: int = QC_LABEL_BP,
    table: str = "documents",
) -> str:
    """DuckDB twin of qc_gate_weights + qc_report: trains the SAME
    full-batch logistic GD in SQL (one MATERIALIZED CTE per step — the
    ivf_exact_sql_ctes fixed-depth discipline; MATERIALIZED is load-
    bearing: inlining would expand the weight expressions 6^steps-fold),
    folds the standardization, rounds the weights to QC_WEIGHT_DECIMALS,
    and scores the whole corpus. Emits (doc_id, logit_en4, pred, agree).
    Prefix ``qcf_`` reserved (embedded-oracle namespace ritual).

    Cross-engine contract: the feature ratios are exact integer counts
    over exact integer lengths (bit-equal doubles on both engines), so
    the ONLY float divergence is intra-training noise (libm exp,
    summation order), which the weight rounding absorbs — prototype-
    measured max |Δw| after ROUND(, 8): 0.0 at sf0.01."""
    from .text import LANG_MARKERS, STOPWORDS

    markers = dict(LANG_MARKERS)

    def lst(words) -> str:
        return "[" + ", ".join(f"'{w}'" for w in words) + "]"

    def nfilt(words) -> str:
        return f"len(list_filter(ts, t -> list_contains({lst(words)}, t)))"

    feats = (
        "qcf_f AS MATERIALIZED (\n"
        "  SELECT doc_id,\n"
        "    1.0 AS f0,\n"
        f"    CAST({nfilt(STOPWORDS)} AS DOUBLE) / len(ts) AS f1,\n"
        f"    CAST({nfilt(markers['en'])} AS DOUBLE) / len(ts) AS f2,\n"
        f"    CAST({nfilt(markers['zh'])} AS DOUBLE) / len(ts) AS f3,\n"
        "    CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) AS f4,\n"
        "    LEAST(CAST(len(ts) AS DOUBLE), 100.0) / 100.0 AS f5,\n"
        "    CAST((CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 4000 ELSE 0 END\n"
        f"      + CAST(FLOOR({nfilt(STOPWORDS)} * 3000 / len(ts)) AS BIGINT)\n"
        "      + CAST(FLOOR(len(list_distinct(ts)) * 3000 / len(ts)) AS BIGINT))\n"
        f"      >= {label_bp} AS DOUBLE) AS y\n"
        f"  FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS ts\n"
        f"        FROM {table})\n"
        ")"
    )
    parts = [
        feats,
        f"qcf_s AS MATERIALIZED (SELECT * FROM qcf_f ORDER BY doc_id"
        f" LIMIT {train_sample})",
        "qcf_mu AS MATERIALIZED (SELECT "
        + ", ".join(f"AVG(f{j}) AS m{j}" for j in range(1, 6))
        + ", "
        + ", ".join(
            f"CASE WHEN stddev_pop(f{j}) = 0 THEN 1.0"
            f" ELSE stddev_pop(f{j}) END AS s{j}"
            for j in range(1, 6)
        )
        + " FROM qcf_s)",
        "qcf_std AS MATERIALIZED (SELECT y, f0, "
        + ", ".join(f"(f{j} - m{j}) / s{j} AS f{j}" for j in range(1, 6))
        + " FROM qcf_s, qcf_mu)",
        "qcf_g0 AS (SELECT "
        + ", ".join(f"0.0 AS w{j}" for j in range(6))
        + ")",
    ]
    z = " + ".join(f"g.w{j} * s.f{j}" for j in range(6))
    for i in range(1, steps + 1):
        upd = ", ".join(
            f"w{j} - {lr!r} * AVG(d * f{j}) AS w{j}" for j in range(6)
        )
        parts.append(
            f"qcf_g{i} AS MATERIALIZED (SELECT {upd} FROM ("
            f"SELECT {', '.join(f'g.w{j}' for j in range(6))}, "
            f"1.0 / (1.0 + EXP(-({z}))) - s.y AS d, "
            f"{', '.join(f's.f{j} AS f{j}' for j in range(6))} "
            f"FROM qcf_g{i - 1} g, qcf_std s"
            f") GROUP BY {', '.join(f'w{j}' for j in range(6))})"
        )
    fold_bias = " + ".join(f"g.w{j} * m{j} / s{j}" for j in range(1, 6))
    parts.append(
        "qcf_w AS MATERIALIZED (SELECT "
        f"ROUND(g.w0 - ({fold_bias}), {QC_WEIGHT_DECIMALS}) AS w0, "
        + ", ".join(
            f"ROUND(g.w{j} / s{j}, {QC_WEIGHT_DECIMALS}) AS w{j}"
            for j in range(1, 6)
        )
        + f" FROM qcf_g{steps} g, qcf_mu)"
    )
    # scoring: the identical left-associated dot product qc_report states
    logit = "w.w0 + " + " + ".join(f"w.w{j} * f.f{j}" for j in range(1, 6))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT f.doc_id,
       CAST(ROUND(({logit}) * 10000) AS BIGINT) AS logit_en4,
       ({logit}) > 0 AS pred,
       (({logit}) > 0) = (f.y = 1.0) AS agree
FROM qcf_f f, qcf_w w
"""
    )
