"""IVF (inverted-file) approximate nearest-neighbor index — the coarse-
quantizer scale path for similarity search (SURVEY.md §2.11; complements the
sign-LSH bucketing in similarity.py / dedup.py).

Design (all DataFrame algebra, no MLlib dependency, no driver-side loops
over data — only over the fixed, small iteration/centroid counts):

  build   k-means coarse quantizer trained with Lloyd's iterations expressed
          as DataFrame ops: assignment is a broadcast join of the corpus
          against the (tiny) centroid table with an argmin over a
          struct-min; the update step is per-dimension F.avg over the
          cluster — `F.array(avg(e[0]), …, avg(e[d-1]))`, one shuffle per
          iteration. Init is deterministic (first k vectors by id), so the
          index is reproducible run-to-run.
  assign  each corpus vector gets its nearest centroid id → the inverted
          list key. One narrow map against broadcast centroids.
  search  queries probe their `nprobe` nearest centroids; candidates come
          from an equi-join on centroid id (never a cross join), then exact
          cosine top-k within the candidate set.
  pairs   `ivf_near_dup_pairs` — near-dup pair generation blocked on IVF
          cells (nprobe-way assignment for boundary recall), the trained
          alternative to dedup.embedding_cosine_pairs' sign-LSH blocking.

At 100 TB: centroid count grows ~sqrt(n) (stays broadcastable — 64-dim
doubles at 65k centroids is ~33 MB); the corpus is hash-partitioned by
centroid id so each probe touches `nprobe/k` of the data. Training runs on
a bounded sample (`train_sample`), the standard IVF practice — Lloyd's on
the full corpus would be k full-scan shuffles per iteration for no recall
benefit.

Recall contract: a true neighbor in an unprobed cell is missed; raise
`nprobe` (or centroid overlap) to trade cost for recall —
tests/test_ivf.py pins recall@k against the exact top-k oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _sqdist(a: Column, b: Column) -> Column:
    """Squared L2 distance between two array<double> columns (one fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def ivf_build(
    emb: DataFrame,
    k: int = 16,
    n_iter: int = 5,
    train_sample: int = 4096,
    vec_col: str = "e",
    id_col: str = "vec_id",
) -> DataFrame:
    """Train the coarse quantizer; returns the centroid table (cid, centroid).

    Lloyd's iterations over a deterministic bounded training sample (first
    `train_sample` vectors by id — reproducible, unlike rand() sampling).
    The centroid table stays on the driver side of a broadcast at every
    step; the sample is the only distributed operand.
    """
    dim = len(emb.select(vec_col).first()[0])
    sample = (
        emb.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(train_sample)
        .persist()
    )
    # deterministic init: the first k sample vectors (row_number over the
    # k-row subset — a single-partition window over k rows, not the corpus)
    centroids = (
        sample.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy(id_col)) - 1).alias("cid"),
            F.col(vec_col).alias("centroid"),
        )
    )
    for _ in range(n_iter):
        assigned = (
            sample.join(F.broadcast(centroids))
            .select(
                id_col,
                vec_col,
                F.struct(
                    _sqdist(F.col(vec_col), F.col("centroid")).alias("d"),
                    F.col("cid").alias("cid"),
                ).alias("dc"),
            )
            .groupBy(id_col, vec_col)
            .agg(F.min("dc").alias("dc"))
            .select(vec_col, F.col("dc.cid").alias("cid"))
        )
        centroids = assigned.groupBy("cid").agg(
            F.array(*[F.avg(F.col(vec_col)[i]) for i in range(dim)]).alias("centroid")
        )
    out = centroids.persist()
    sample.unpersist()
    return out


def ivf_assign(
    emb: DataFrame, centroids: DataFrame, vec_col: str = "e", nprobe: int = 1
) -> DataFrame:
    """Attach the `nprobe` nearest centroid ids to every row of `emb`
    (nprobe=1 → the inverted-list assignment; >1 → the query-side probe
    set). One broadcast join + per-row top-nprobe via struct sort — narrow,
    no shuffle of the big side."""
    pairs = emb.join(F.broadcast(centroids)).withColumn(
        "dc",
        F.struct(
            _sqdist(F.col(vec_col), F.col("centroid")).alias("d"),
            F.col("cid").alias("cid"),
        ),
    )
    keys = [c for c in emb.columns]
    probes = (
        pairs.groupBy(*keys)
        .agg(F.slice(F.sort_array(F.collect_list("dc")), 1, nprobe).alias("probes"))
        .select(*keys, F.explode(F.col("probes.cid")).alias("cid"))
    )
    return probes


def ivf_search(
    emb: DataFrame,
    centroids: DataFrame,
    n_queries: int = 10,
    top_k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """ANN top-k: probe `nprobe` cells per query, exact cosine inside the
    candidate cells. Expects `emb` with (vec_id, label, e, nrm) as produced
    by similarity._emb. The candidate generator is an equi-join on cid —
    the IVF twin of similarity.q_ann_lsh_topk's sign-LSH bucket join."""
    corpus = ivf_assign(emb, centroids, nprobe=1).select(
        F.col("vec_id").alias("nid"),
        F.col("label"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
        "cid",
    )
    queries = ivf_assign(
        emb.filter(F.col("vec_id") < n_queries), centroids, nprobe=nprobe
    ).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe"), F.col("nrm").alias("qn"), "cid"
    )
    scored = (
        F.broadcast(queries)
        .join(corpus, "cid")
        .filter(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            "label",
            F.round(_dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn")), 6).alias(
                "cosine"
            ),
        )
        # a (query, neighbor) pair can surface from several probed cells —
        # collapse before ranking
        .groupBy("qid", "nid", "label")
        .agg(F.first("cosine").alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("qid", "rank", "nid", "label", "cosine")
        .orderBy("qid", "rank")
    )


def ivf_near_dup_pairs(
    emb: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.25,
    nprobe: int = 2,
) -> DataFrame:
    """Embedding near-dup pairs blocked on IVF cells — the trained-centroid
    alternative to dedup.embedding_cosine_pairs' sign-LSH blocking, and the
    preferred 100 TB shape when a training pass is affordable: cells adapt
    to the data distribution (hot regions split across many centroids)
    where sign-LSH buckets are data-oblivious.

    Every vector is assigned its `nprobe` nearest cells, so a pair whose
    members straddle one cell boundary still meets in the second-choice
    cell — the recall knob, at ≤ nprobe² candidate duplication (collapsed
    before thresholding). Candidate generation stays an equi-join on cid;
    no cross join at any scale. Expects (vec_id, e, nrm) as produced by
    similarity._emb; returns (v1, v2, cosine).
    """
    assigned = ivf_assign(emb, centroids, nprobe=nprobe)
    a = assigned.select(
        F.col("vec_id").alias("v1"), F.col("e").alias("e1"), F.col("nrm").alias("n1"),
        "cid",
    )
    b = assigned.select(
        F.col("vec_id").alias("v2"), F.col("e").alias("e2"), F.col("nrm").alias("n2"),
        "cid",
    )
    return (
        a.join(b, "cid")
        .filter(F.col("v1") < F.col("v2"))
        .select(
            "v1",
            "v2",
            F.round(
                _dot(F.col("e1"), F.col("e2")) / (F.col("n1") * F.col("n2")), 4
            ).alias("cosine"),
        )
        # the same pair can meet in up to nprobe² shared cells — collapse
        .groupBy("v1", "v2")
        .agg(F.first("cosine").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy("v1", "v2")
    )
