"""DSIR-style importance resampling for pretraining-data selection
(SURVEY.md §2.11 extension — Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling": score every raw document by
the log importance ratio of a TARGET-domain hashed-n-gram model over the
non-target background model, then keep the highest-ratio documents; the
method GPT-class pipelines use to up-sample Pile-like text out of
Common Crawl).

Spark-first decomposition (the unigram_logprob discipline):

  features   per doc: word unigrams + word bigrams, hashed into
             DSIR_BUCKETS buckets (the hashing trick — collisions are
             part of the estimator). Bigrams are the zero-shuffle
             zip_with-over-two-slices construction; the bucket id is the
             portable 60-bit md5 hash mod DSIR_BUCKETS, so DuckDB
             reproduces it exactly.
  models     two Laplace-smoothed bucket distributions from TWO
             partial-agg shuffles over the exploded features: p(b) over
             the TARGET subset (default: quality_score_bp >=
             classifier.QC_LABEL_BP — the "clean reference domain"), and
             q(b) over its COMPLEMENT (with target inside the
             background, p/q washes out to ~1 and `sampled` degenerates
             to ~0.4% of docs — measured; the complement restores the
             paper's target-vs-pool contrast, sampled ~29-35%).
  scoring    one bucket-keyed shuffle join of the exploded features to
             the (bucket, c_raw, c_tgt) table, per-occurrence
             round((ln p - ln q) * 1e4) to integer 1e-4 nats BEFORE the
             per-doc sum (order-independent integer aggregation; the
             1e-4 grid leaves ~100 ulp against libm differences), then
             one doc-keyed re-aggregation. `sampled` = logratio > 0
             (importance ratio > 1) — a threshold, NOT a global rank, so
             the corpus-sized path carries no unpartitioned window; the
             exact-top-k budget variant is dsir_resample's
             TakeOrderedAndProject.

At 100 TB: feature explode + two bucket-count aggs (bucket cardinality
DSIR_BUCKETS crosses the wire) + one bucket-keyed join (DSIR_BUCKETS
distinct keys — bounded, broadcastable) + one doc-keyed agg. Nothing
grows with the merge of corpus size but the partial-agg passes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import _toks_of, quality_score_bp_col, token_hash60

#: hashed feature buckets (the DSIR paper's hashing-trick dimension,
#: sized to the synthetic corpus scale; production uses 10k-100k)
DSIR_BUCKETS = 4096


def _feature_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, b): one row per feature OCCURRENCE — word unigrams plus
    space-joined word bigrams, hashed to [0, DSIR_BUCKETS)."""
    toks = docs.select("doc_id", _toks_of(docs).alias("ts"))
    feats = toks.select(
        "doc_id",
        F.explode(
            F.concat(
                F.col("ts"),
                F.zip_with(
                    F.expr("slice(ts, 1, size(ts) - 1)"),
                    F.expr("slice(ts, 2, size(ts) - 1)"),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                ),
            )
        ).alias("f"),
    )
    return feats.select(
        "doc_id", (token_hash60(F.col("f")) % DSIR_BUCKETS).alias("b")
    )


def dsir_logratio(
    docs: DataFrame,
    target: Column | None = None,
    ordered: bool = True,
) -> DataFrame:
    """Per-document DSIR importance score. Returns
    (doc_id, n_feats, logratio_en4, sampled).

    ``target``: boolean Column marking the reference-domain documents
    (computable from the docs row). Default: the quality pseudo-label —
    the weak-supervision shape classifier.qc_train distills, making the
    default pipeline "select raw docs that look like the high-quality
    slice". The target model trains on the SUBSET, the raw model on the
    whole corpus; both Laplace-smoothed over DSIR_BUCKETS.
    """
    from .classifier import QC_LABEL_BP

    if target is None:
        target = quality_score_bp_col(_toks_of(docs)) >= QC_LABEL_BP
    marked = docs.select("doc_id", target.alias("_tgt"))
    fb = _feature_buckets(docs)
    occ = fb.join(marked, "doc_id")
    counts = occ.groupBy("b").agg(
        F.count(F.lit(1)).alias("c_raw"),
        F.sum(F.col("_tgt").cast("bigint")).alias("c_tgt"),
    )
    totals = counts.agg(
        F.sum("c_raw").alias("n_raw"), F.sum("c_tgt").alias("n_tgt")
    )
    lp = F.log(
        (F.col("c_tgt") + 1).cast("double")
        / (F.col("n_tgt") + DSIR_BUCKETS)
    )
    lq = F.log(
        (F.col("c_raw") - F.col("c_tgt") + 1).cast("double")
        / (F.col("n_raw") - F.col("n_tgt") + DSIR_BUCKETS)
    )
    # counts is bounded at DSIR_BUCKETS rows BY CONSTRUCTION — broadcast
    # it explicitly so the scoring join never shuffles the exploded
    # feature stream (at sf0.01 AQE happened to broadcast the FEATURE
    # side instead — harmless there, a corpus-sized build at 100 TB)
    scored = (
        fb.join(F.broadcast(counts), "b")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.round((lp - lq) * 10_000).cast("bigint").alias("lr"),
        )
    )
    out = (
        docs.select("doc_id")
        .join(
            scored.groupBy("doc_id").agg(
                F.count(F.lit(1)).alias("n_feats"),
                F.sum("lr").alias("logratio_en4"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("logratio_en4", F.lit(0)).alias("logratio_en4"),
            (F.coalesce("logratio_en4", F.lit(0)) > 0).alias("sampled"),
        )
    )
    return out.orderBy("doc_id") if ordered else out


def dsir_resample(
    docs: DataFrame, k: int, target: Column | None = None
) -> DataFrame:
    """The budgeted variant: keep exactly the top-``k`` docs by
    (logratio_en4 DESC, doc_id ASC — deterministic tie-break). Global
    top-k compiles to TakeOrderedAndProject (per-partition heaps + one
    k-row driver merge, the top_customers shape), NOT a full sort."""
    scored = dsir_logratio(docs, target=target, ordered=False)
    return scored.orderBy(
        F.desc("logratio_en4"), F.asc("doc_id")
    ).limit(k)


# DuckDB twin of dsir_logratio under the default target — same hashed
# buckets (TOKEN_HASH60 mod DSIR_BUCKETS), same Laplace smoothing, same
# per-occurrence integer rounding. Prefix ``ds_`` reserved
# (embedded-oracle namespace ritual).
def dsir_sql(table: str = "documents") -> str:
    from .classifier import QC_LABEL_BP
    from .text import TOKEN_HASH60_SQL, quality_score_bp_sql

    h = TOKEN_HASH60_SQL.format(t="f")
    return f"""
WITH ds_toks AS (
  SELECT doc_id, n_chars, string_split(text, ' ') AS ts FROM {table}
), ds_tgt AS (
  SELECT doc_id, {quality_score_bp_sql()} >= {QC_LABEL_BP} AS tgt
  FROM ds_toks
), ds_fb AS (
  SELECT doc_id, {h} % {DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, unnest(list_concat(ts,
             list_transform(range(1, len(ts)),
                            i -> ts[i] || ' ' || ts[i + 1]))) AS f
    FROM ds_toks
  )
), ds_counts AS (
  SELECT b, COUNT(1) AS c_raw,
         CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS c_tgt
  FROM ds_fb JOIN ds_tgt USING (doc_id) GROUP BY b
), ds_tot AS (
  SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw,
         CAST(SUM(c_tgt) AS BIGINT) AS n_tgt
  FROM ds_counts
), ds_scored AS (
  SELECT doc_id,
         CAST(ROUND((ln(CAST(c_tgt + 1 AS DOUBLE) / (n_tgt + {DSIR_BUCKETS}))
                   - ln(CAST(c_raw - c_tgt + 1 AS DOUBLE)
                        / (n_raw - n_tgt + {DSIR_BUCKETS})))
                    * 10000) AS BIGINT) AS lr
  FROM ds_fb JOIN ds_counts USING (b) CROSS JOIN ds_tot
), ds_agg AS (
  SELECT doc_id, COUNT(1) AS n_feats, CAST(SUM(lr) AS BIGINT) AS lr_sum
  FROM ds_scored GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(a.n_feats, 0) AS n_feats,
       COALESCE(a.lr_sum, 0) AS logratio_en4,
       COALESCE(a.lr_sum, 0) > 0 AS sampled
FROM {table} d LEFT JOIN ds_agg a ON d.doc_id = a.doc_id
"""
