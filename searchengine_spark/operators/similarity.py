"""Similarity search over embedding columns (array<float/double>).

* brute-force cosine top-k — the exactness baseline: broadcast the
  query set, native `zip_with`/`aggregate` dot products (JVM, no
  Python), window top-k. At 100 TB this is one scan of the corpus per
  query batch — right when the query set is small.
* LSH-bucketed ANN — the scale path: deterministic random-hyperplane
  signatures via a vectorized pandas UDF (numpy matmul over Arrow
  batches), candidates = bucket collisions (multi-probe by hamming-1),
  exact cosine re-rank inside buckets only.
* embedding-cosine near-duplicates — pairs above a cosine threshold
  within LSH buckets (near-dup dedup for training data).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W, functions as F

from searchengine_spark.functions.hashes import hash60_py

N_HYPERPLANES = 4  # random-ish corpora: few planes + multi-probe; clustered
# corpora at scale: raise planes (bucket count 2^n) to keep buckets small
DIM = 64


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector. queries: (query_id, qvec)."""
    joined = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).crossJoin(F.broadcast(queries.select("query_id", "qvec")))
    scored = joined.where(F.col("vec_id") != F.col("query_id")).withColumn(
        "cosine", F.round(cosine_expr(F.col("vec"), F.col("qvec")), 4)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _hyperplanes(dim: int = DIM, n: int = N_HYPERPLANES) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from hash60 — no RNG."""
    m = np.empty((n, dim), dtype=np.float64)
    for j in range(n):
        for d in range(dim):
            m[j, d] = (hash60_py(f"{j}:{d}", "hp") % 2001) - 1000
    return m / 1000.0


def add_lsh_bucket(
    df: DataFrame, vec_col: str = "embedding", n_planes: int = N_HYPERPLANES
) -> DataFrame:
    """Sign-pattern bucket id via numpy matmul over Arrow batches."""
    planes = _hyperplanes(DIM, n_planes)

    @F.pandas_udf("int")
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.values)  # (batch, dim)
        signs = (m @ planes.T) > 0  # (batch, n_planes)
        weights = 1 << np.arange(n_planes)
        return pd.Series((signs @ weights).astype(np.int32))

    return df.withColumn("lsh_bucket", bucket(F.col(vec_col)))


def ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_HYPERPLANES,
) -> DataFrame:
    """Approximate top-k: exact cosine within (multi-probe) LSH buckets.

    Queries probe their own bucket plus all hamming-1 neighbors, so
    recall degrades gracefully; corpus side is bucketed once (at scale:
    persisted bucketed table -> co-located joins, no corpus reshuffle
    per query batch).
    """
    corpus = add_lsh_bucket(
        embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")),
        "vec",
        n_planes,
    )
    q = add_lsh_bucket(queries.select("query_id", F.col("qvec")), "qvec", n_planes)
    probes = q.select(
        "query_id",
        "qvec",
        F.explode(
            F.array(
                F.col("lsh_bucket"),
                *[
                    F.col("lsh_bucket").bitwiseXOR(F.lit(1 << j))
                    for j in range(n_planes)
                ],
            )
        ).alias("lsh_bucket"),
    )
    cand = corpus.join(F.broadcast(probes), "lsh_bucket").where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.withColumn(
        "cosine", F.round(cosine_expr(F.col("vec"), F.col("qvec")), 4)
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine within LSH buckets (a < b)."""
    b = add_lsh_bucket(
        embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    )
    x, y = b.alias("x"), b.alias("y")
    pairs = (
        x.join(y, "lsh_bucket")
        .where(F.col("x.vec_id") < F.col("y.vec_id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("x.vec"), F.col("y.vec")), 4))
        .where(F.col("cosine") >= threshold)
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            "cosine",
        )
    )
    return pairs
