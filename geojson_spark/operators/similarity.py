"""Approximate-nearest-neighbor search over an embedding column.

Two paths (training-pipeline requirement):
- ``cosine_topk_bruteforce`` — exact baseline: broadcast the (small) query
  set, score every (query, vector) pair JVM-side-joined + Arrow-batched
  matrix math, window re-rank. One shuffle (the window).
- ``ivf_topk`` — scale path: k-means-lite IVF. Centroids are trained on a
  sample (driver-side NumPy, few MB), broadcast; every vector is assigned to
  its nearest centroid (one column of int); queries probe ``n_probe``
  nearest centroids, so the scoring join touches ~n_probe/n_centroids of
  the table instead of all of it. Recall measured in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType
from pyspark.sql.window import Window


def _cos_udf():
    @F.pandas_udf(DoubleType())
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack([np.asarray(v, dtype=np.float64) for v in a])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in b])
        num = (A * B).sum(axis=1)
        den = np.sqrt((A * A).sum(axis=1) * (B * B).sum(axis=1))
        return pd.Series(np.where(den > 0, num / den, 0.0))

    return _cos


def cosine_topk_bruteforce(
    queries: DataFrame,
    vectors: DataFrame,
    k: int,
    *,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    v_id: str = "vec_id",
    v_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (q_id, vec_id, cosine, rank). Queries broadcast."""
    cand = F.broadcast(queries.select(q_id, q_vec)).crossJoin(vectors.select(v_id, v_vec))
    scored = cand.withColumn("cosine", _cos_udf()(F.col(q_vec), F.col(v_vec)))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(v_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id, v_id, "cosine", "rank")
    )


def train_centroids(
    vectors: DataFrame, n_centroids: int = 16, *, v_vec: str = "embedding",
    sample: int = 2048, iters: int = 10, seed: int = 42,
) -> np.ndarray:
    """k-means on a driver-side sample (Lloyd's, NumPy). Returns (C, dim)."""
    pdf = vectors.select(v_vec).limit(sample).toPandas()
    X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[v_vec]])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), n_centroids, replace=False)]
    for _ in range(iters):
        sims = X @ C.T
        assign = sims.argmax(axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C


def _assign_udf(centroids: np.ndarray, top: int = 1):
    C = [[float(x) for x in row] for row in centroids]

    @F.pandas_udf(ArrayType(LongType()))
    def _assign(vecs: pd.Series) -> pd.Series:
        Cm = np.asarray(C)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ Cm.T
        order = np.argsort(-sims, axis=1)[:, :top]
        return pd.Series([row.tolist() for row in order])

    return _assign


def ivf_topk(
    queries: DataFrame,
    vectors: DataFrame,
    k: int,
    *,
    centroids: np.ndarray,
    n_probe: int = 4,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    v_id: str = "vec_id",
    v_vec: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: probe ``n_probe`` inverted lists per query."""
    v_assigned = vectors.withColumn(
        "_cl", F.element_at(_assign_udf(centroids, 1)(F.col(v_vec)), 1)
    )
    q_assigned = queries.withColumn("_cls", _assign_udf(centroids, n_probe)(F.col(q_vec)))
    q_probes = q_assigned.select(q_id, q_vec, F.explode("_cls").alias("_cl"))
    cand = F.broadcast(q_probes).join(v_assigned, "_cl")
    scored = cand.withColumn("cosine", _cos_udf()(F.col(q_vec), F.col(v_vec)))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(v_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id, v_id, "cosine", "rank")
    )


def cosine_pairs_blocked(
    vectors: DataFrame,
    *,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.40,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within blocking-key groups.

    Blocking (shard/source/label key) is the deterministic alternative to
    LSH bucketing (``geojson_spark.operators.dedup.embedding_dedup``): the
    candidate set is an equi-join on ``block_col`` — never a crossJoin —
    and the exact cosine filter is Arrow-batched matrix math. Returns
    (id_a, id_b, block) with id_a < id_b.
    """
    keyed = vectors.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
    )
    pairs = (
        keyed.alias("a")
        .join(keyed.alias("b"), "block")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            "block",
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.vec").alias("va"),
            F.col("b.vec").alias("vb"),
        )
    )
    return (
        pairs.withColumn("cosine", _cos_udf()(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.col("block"))
    )
