"""Int8 embedding quantization — the storage/bandwidth path for the
embedding family at 100 TB (SURVEY.md §2.11 [X] extension; no reference
counterpart — the reference has no embedding surface at all).

Why this exists: every embedding operator in this repo (cosine top-k,
sign-LSH buckets, IVF probe search, embedding-cosine dedup) scans the
`embedding` column. At 100 TB corpus scale the embedding table is itself
multi-TB; storing `array<float>` (4 B/dim) or computing in `array<double>`
(8 B/dim) makes every scan IO-bound. Symmetric per-vector max-abs int8
quantization cuts the scan 4x (vs float32) / 8x (vs float64) and keeps the
dot-product kernel in integer arithmetic, at a bounded cosine error
(~0.5/127 per-coordinate relative rounding; < 0.02 absolute cosine error
observed on the test embeddings, pinned in tests/test_quantize.py).

Design (all JVM-side column algebra, zero shuffles, zero UDFs):

  quantize   one narrow map per row: scale = max|x|/127, then
             q[i] = floor(x[i]/scale + 0.5)  (floor(+0.5) instead of
             round() so the definition is engine-exact — Spark rounds
             HALF_UP, Python half-even; floor is identical everywhere).
             Emitted as array<tinyint> — the honest 1-byte storage type in
             parquet — plus the double `scale` for dequantization.
  cosine     scales CANCEL in cosine: cos_q = dot(q1,q2) /
             sqrt(dot(q1,q1)*dot(q2,q2)) — the whole kernel runs on
             integers promoted to bigint (no overflow until dim*127^2 >
             2^63, i.e. dim ~5.7e14) and never touches the stored scale.
  dequantize x~[i] = q[i]*scale for operators that need approximate
             raw coordinates (e.g. feeding the IVF trainer).

At scale the quantized table is written once (columnar, partitioned like
the source) and every downstream similarity/dedup pass reads 1/4 the
bytes; exact re-scoring of the final candidate set against the full-
precision column is the standard two-stage retrieval shape and composes
directly with ivf_search / cosine top-k (quantized pass for candidates,
float pass for the final ranking).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

Q_LEVELS = 127  # symmetric int8: values in [-127, 127]


def _maxabs(vec: Column) -> Column:
    return F.array_max(F.transform(vec, lambda x: F.abs(x)))


def quantize_embeddings(
    emb: DataFrame, vec_col: str = "e", keep: tuple[str, ...] = ("vec_id", "label")
) -> DataFrame:
    """Per-vector symmetric int8 quantization.

    Returns `keep` columns plus `qv array<tinyint>` and `scale double`
    (scale = max|x|/127; the all-zero vector gets scale 0 and an all-zero
    qv — guarded so the division never produces NaN columns).

    scale is STAGED in its own projection before the quantization lambda:
    HOF lambda bodies get no whole-stage codegen or common-subexpression
    elimination, so an inlined scale (an array_max fold over the whole
    vector) would be re-evaluated for EVERY element — O(dim²) arithmetic
    per row on the multi-TB table this module exists to shrink. The
    multi-referenced non-cheap alias survives CollapseProject (the
    dedup._doc_shingle_df trick).
    """
    staged = emb.select(
        *keep,
        F.col(vec_col).alias("_v"),
        (_maxabs(F.col(vec_col)) / F.lit(float(Q_LEVELS))).alias("scale"),
    )
    scale = F.col("scale")
    q = F.when(
        scale == 0.0,
        F.transform(F.col("_v"), lambda x: F.lit(0).cast("tinyint")),
    ).otherwise(
        F.transform(
            F.col("_v"),
            lambda x: F.floor(x / scale + F.lit(0.5)).cast("tinyint"),
        )
    )
    return staged.select(*keep, q.alias("qv"), scale.alias("scale"))


def _idot(a: Column, b: Column) -> Column:
    """Integer dot product — tinyint inputs promoted to bigint before the
    fold so dim*127^2 can never wrap."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("bigint") * y.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def quantized_cosine(q1: Column, q2: Column) -> Column:
    """Cosine from the int8 codes alone — per-vector scales cancel."""
    return _idot(q1, q2) / F.sqrt(
        _idot(q1, q1).cast("double") * _idot(q2, q2).cast("double")
    )


def dequantize(qv: Column, scale: Column) -> Column:
    """Approximate raw coordinates: q[i]*scale (array<double>)."""
    return F.transform(qv, lambda x: x.cast("double") * scale)


def quantized_topk(
    emb: DataFrame,
    n_queries: int = 10,
    top_k: int = 5,
    vec_col: str = "e",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force top-k neighbors scored ENTIRELY on int8 codes — the
    quantized twin of similarity.q_cosine_topk (same broadcast-query join
    shape, 1/4 the scan bytes at scale). Returns (qid, rank, nid, qcosine).
    """
    qt = quantize_embeddings(emb, vec_col=vec_col, keep=(id_col,))
    q = qt.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("qid"), F.col("qv").alias("q1")
    )
    c = qt.select(F.col(id_col).alias("nid"), F.col("qv").alias("q2"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(quantized_cosine(F.col("q1"), F.col("q2")), 6).alias("qcosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("qcosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("qid", "rank", "nid", "qcosine")
        .orderBy("qid", "rank")
    )


def two_stage_topk(
    emb: DataFrame,
    n_queries: int = 10,
    top_k: int = 5,
    shortlist_k: int = 20,
    vec_col: str = "e",
    nrm_col: str = "nrm",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage retrieval: int8 candidate pass -> exact float re-score.

    Stage 1 scans ONLY the quantized codes (1/4 the bytes) and keeps a
    `shortlist_k` candidate set per query; stage 2 joins the shortlist —
    n_queries*shortlist_k rows, tiny by construction — back to the full-
    precision vectors and re-ranks exactly. At 100 TB the expensive
    brute-force pass never touches the float column; only the shortlist
    does. With shortlist_k a few multiples of top_k the quantization
    error (<0.02 cosine) is absorbed by the re-rank: a true top-k
    neighbor is only lost if quantization pushes it below rank
    shortlist_k, pinned in tests/test_quantize.py.

    Expects (vec_id, e, nrm) as produced by similarity._emb; returns the
    same (qid, rank, nid, cosine) shape as the exact operator so the two
    are drop-in interchangeable.
    """
    shortlist = quantized_topk(
        emb, n_queries=n_queries, top_k=shortlist_k, vec_col=vec_col, id_col=id_col
    ).select("qid", "nid")
    full = emb.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("ce"), F.col(nrm_col).alias("cn")
    )
    q = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"), F.col(nrm_col).alias("qn")
    )
    dot = F.aggregate(
        F.zip_with("qe", "ce", lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v
    )
    rescored = (
        F.broadcast(shortlist)
        .join(full, "nid")
        .join(F.broadcast(q), "qid")
        .select("qid", "nid", F.round(dot / (F.col("qn") * F.col("cn")), 6).alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("qid", "rank", "nid", "cosine")
        .orderBy("qid", "rank")
    )


def ivf_quantized_topk(
    emb: DataFrame,
    centroids: DataFrame,
    n_queries: int = 10,
    top_k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF over int8 codes — the two approximations composed (the shape
    FAISS ships as IVF+SQ8, the standard production ANN configuration):
    the coarse quantizer prunes the search to nprobe cells (complexity),
    the int8 codes shrink what those cells read (bandwidth). The corpus
    representation after build time is ONLY (cid, qv): cell assignment
    runs on the DEQUANTIZED codes — honest to the storage story, the
    float column is never needed at search time — and candidate scoring
    is the integer-dot quantized cosine within probed cells. Exact
    float re-scoring of this shortlist (two_stage_topk's stage 2)
    composes on top when the final ranking must be exact.

    Returns (qid, rank, nid, qcosine).
    """
    from .ivf import ivf_assign

    qt = quantize_embeddings(emb, keep=(id_col,))
    deq = qt.select(
        id_col, "qv", dequantize(F.col("qv"), F.col("scale")).alias("e")
    )
    corpus = ivf_assign(deq, centroids, vec_col="e", nprobe=1, id_col=id_col).select(
        F.col(id_col).alias("nid"), F.col("qv").alias("q2"), "cid"
    )
    queries = ivf_assign(
        deq.filter(F.col(id_col) < n_queries),
        centroids,
        vec_col="e",
        nprobe=nprobe,
        id_col=id_col,
    ).select(F.col(id_col).alias("qid"), F.col("qv").alias("q1"), "cid")
    scored = (
        F.broadcast(queries)
        .join(corpus, "cid")
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(quantized_cosine(F.col("q1"), F.col("q2")), 6).alias("qcosine"),
        )
        # NO pair-collapse aggregation — same proof as ivf_search: the
        # corpus side is nprobe=1 (one cid per vector) and a query's probe
        # cids are distinct, so each (qid, nid) pair meets at most once
    )
    w = Window.partitionBy("qid").orderBy(F.desc("qcosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("qid", "rank", "nid", "qcosine")
        .orderBy("qid", "rank")
    )


def quantize_model(vec: list[float]) -> tuple[list[int], float]:
    """Pure-Python model of the quantizer (test oracle): must match the
    Spark column algebra bit-for-bit on finite inputs."""
    import math

    m = max((abs(x) for x in vec), default=0.0)
    scale = m / Q_LEVELS
    if scale == 0.0:
        return [0] * len(vec), 0.0
    return [int(math.floor(x / scale + 0.5)) for x in vec], scale


# ---------------------------------------------------------------------------
# Driver gate (r05 rotation): two-stage retrieval, hash-checked
# ---------------------------------------------------------------------------

# Gate shortlist: 8x top_k. The certification contract is that the int8
# shortlist RECOVERS the exact float top-k (stage 2 re-scores at full
# precision), so the oracle is the plain exact brute-force top-k — the gate
# fails loudly if quantization error ever pushes a true neighbor below the
# shortlist. tests/test_quantize.py pins the tighter 4x setting with a
# 1-rank tolerance; the gate uses 8x so the certified output is exact.
GATE_SHORTLIST_K = 40


def q_two_stage_topk(spark, sf_dir: str) -> DataFrame:
    """Driver gate: int8 candidate scan -> exact float re-rank, certified
    against the exact brute-force oracle (same (qid, rank, nid, cosine)
    contract as similarity_topk's exact leg)."""
    from .similarity import N_QUERIES, TOP_K, _emb

    return two_stage_topk(
        _emb(spark, sf_dir),
        n_queries=N_QUERIES,
        top_k=TOP_K,
        shortlist_k=GATE_SHORTLIST_K,
    )


def _two_stage_sql() -> str:
    from .similarity import N_QUERIES, TOP_K, _COS_SQL

    return f"""
WITH scored AS (
  SELECT q.vec_id AS qid, c.vec_id AS nid, {_COS_SQL} AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id < {N_QUERIES} AND q.vec_id != c.vec_id
), ranked AS (
  SELECT qid, nid, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
  FROM scored
)
SELECT qid, rank, nid, cosine FROM ranked WHERE rank <= {TOP_K} ORDER BY qid, rank
"""


def register_all() -> None:
    from ..registry import register

    register("two_stage_topk", q_two_stage_topk, _two_stage_sql())
