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

    from .text import quality_score_bp_col

    label = (
        (quality_score_bp_col() >= QC_LABEL_BP)
        if label_col is None
        else label_col
    )
    # deterministic sample: first train_sample docs by doc_id
    rows = (
        docs.orderBy("doc_id")
        .limit(train_sample)
        .select(label.cast("double").alias("y"), *feature_cols(tokens_col()))
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
    feats = feature_cols(tokens_col())
    logit = sum(
        (F.lit(float(w)) * f for w, f in zip(weights[1:], feats[1:])),
        F.lit(float(weights[0])),
    )
    logit = F.when(
        F.col("text").isNull(),
        F.raise_error(
            F.concat(
                F.lit("qc_score: NULL text for doc_id="),
                F.col("doc_id").cast("string"),
                F.lit(" - the corpus is corrupted upstream"),
            )
        ).cast("double"),
    ).otherwise(logit)
    out = docs.select(
        "doc_id",
        F.round(logit * 10_000).cast("bigint").alias("logit_en4"),
        (logit > 0).alias("pred"),
    )
    return out.orderBy("doc_id") if ordered else out


def quality_classifier_report(docs: DataFrame) -> DataFrame:
    """Train-and-score in one call: the filter table a curation pipeline
    lands before thresholding (one row per doc, logit + prediction +
    agreement with the pseudo-label for audit)."""
    from .text import quality_score_bp_col

    w = qc_train(docs)
    # ordered=False: the join re-partitions by doc_id and the final
    # orderBy re-sorts — the presentation sort here would be a wasted
    # corpus-wide range shuffle (review r12)
    scored = qc_score(docs, w, ordered=False)
    labels = docs.select(
        "doc_id", (quality_score_bp_col() >= QC_LABEL_BP).alias("_y")
    )
    return (
        scored.join(labels, "doc_id")
        .select(
            "doc_id",
            "logit_en4",
            "pred",
            (F.col("pred") == F.col("_y")).alias("agree"),
        )
        .orderBy("doc_id")
    )
