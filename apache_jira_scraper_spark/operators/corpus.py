"""Training-corpus assembly operators: deterministic splits and sequence
packing — the steps that turn a deduplicated document set into model-ready
training data at 100 TB.

Both are pure column algebra (no UDFs, no shuffles beyond the one window
partitioning), with DuckDB-oracle parity pinned in tests/test_corpus.py via
the same comparison the driver gate uses. They are not in the 50-gate
registry only because the driver hash-checks at most 50 queries; the oracle
discipline is identical.

  deterministic_split  hash-based train/val/test assignment — reproducible,
                       stable under corpus growth (a doc's split never
                       changes when other docs are added/removed, unlike
                       row_number()-based splits), no shuffle at all
  pack_sequences       contiguous-fill packing of documents into
                       fixed-token-budget training sequences, sharded so
                       the cumulative-sum window never collapses to a
                       single partition
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPLIT_PPM = 1_000_000


def _hash_ppm(key) -> "F.Column":
    """Portable per-row hash in [0, 1e6): first 8 md5 hex chars of the
    stringified key, mod 1e6. Identical math on the DuckDB side."""
    return (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10).cast("bigint")
        % SPLIT_PPM
    )


def deterministic_split(
    docs: DataFrame,
    key: str = "doc_id",
    train_ppm: int = 900_000,
    val_ppm: int = 50_000,
) -> DataFrame:
    """Assign train/val/test by hashing the document key.

    Scale shape: a narrow projection — no shuffle, no state, no sampling
    seed to coordinate across executors. The assignment is a pure function
    of the key, so reruns, backfills, and incremental corpus growth keep
    every existing document in its original split (the property that
    matters for contamination control; fraction-based `randomSplit` has
    neither determinism nor stability).
    """
    h = _hash_ppm(key)
    return docs.withColumn(
        "split",
        F.when(h < train_ppm, F.lit("train"))
        .when(h < train_ppm + val_ppm, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def split_counts(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Per-split document and character counts — the sanity check run after
    every split assignment."""
    return (
        deterministic_split(docs, key=key)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("split")
    )


SPLIT_COUNTS_SQL = """
SELECT CASE
         WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 < 900000 THEN 'train'
         WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 < 950000 THEN 'val'
         ELSE 'test'
       END AS split,
       COUNT(1) AS n_docs,
       SUM(n_chars) AS n_chars
FROM documents
GROUP BY 1
ORDER BY split
"""


N_SHARDS = 64
SEQ_BUDGET_TOKENS = 512


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = SEQ_BUDGET_TOKENS,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """Contiguous-fill sequence packing: concatenate documents in a
    deterministic order and cut at every `budget_tokens` boundary; a
    document belongs to the sequence where it STARTS (documents that
    straddle a boundary span into the next sequence, as in standard
    concat-and-chunk LLM pretraining).

    Scale shape: the cumulative token sum is a window ORDERED BY doc_id but
    PARTITIONED BY a hash shard — the global-order window that a naive
    implementation uses collapses the whole corpus onto one task. Sharding
    makes packing embarrassingly parallel (each shard packs its own
    sequence space; seq_id = shard * 2^40 + local cut index keeps ids
    globally unique), at the cost of at most one under-filled sequence per
    shard — negligible against shard sizes in the billions of tokens.
    Everything is integer column algebra inside whole-stage codegen.
    """
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        ),
        F.lit(n_shards),
    )
    toks = F.size(F.split("text", " "))
    staged = docs.select("doc_id", shard.alias("shard"), toks.alias("n_tokens"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return staged.select(
        "doc_id",
        "shard",
        "n_tokens",
        (F.col("shard") * F.lit(1 << 40) + F.floor((cum - F.col("n_tokens")) / budget_tokens)).alias(
            "seq_id"
        ),
    )


def pack_summary(
    docs: DataFrame,
    budget_tokens: int = SEQ_BUDGET_TOKENS,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """Per-sequence fill report: docs per sequence and tokens STARTING in
    each sequence — the packing-efficiency metric (tokens_started ≈ budget
    everywhere except each shard's tail sequence)."""
    packed = pack_sequences(docs, budget_tokens=budget_tokens, n_shards=n_shards)
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens_started"),
        )
        .orderBy("seq_id")
    )


PACK_SUMMARY_SQL = f"""
WITH staged AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % {N_SHARDS} AS shard,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM staged
)
SELECT shard * {1 << 40} + CAST(FLOOR(CAST(c - n_tokens AS DOUBLE) / {SEQ_BUDGET_TOKENS}) AS BIGINT) AS seq_id,
       COUNT(1) AS n_docs,
       SUM(n_tokens) AS tokens_started
FROM cum
GROUP BY 1
ORDER BY seq_id
"""
