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

# Multi-table banded LSH: L independent tables of b hyperplanes each.
# Recall ~ 1 - (1 - p_probe^b)^L per neighbor (p = 1 - theta/pi), so L
# buys recall while b bounds bucket size. Scale rule for 10^10 vectors:
# grow b ~ log2(n / target_bucket_rows) and keep L fixed — candidate
# volume per query stays ~ L * (b+1) * n / 2^b.
N_TABLES = 16
N_HYPERPLANES = 6  # bits per table -> 2^6 buckets/table
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


def _hyperplanes(
    dim: int = DIM, n: int = N_HYPERPLANES, table: int = 0
) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from hash60 — no RNG;
    each table gets an independent plane set via the salt."""
    m = np.empty((n, dim), dtype=np.float64)
    for j in range(n):
        for d in range(dim):
            m[j, d] = (hash60_py(f"{table}:{j}:{d}", "hp") % 2001) - 1000
    return m / 1000.0


def _all_planes(n_tables: int, n_planes: int, dim: int = DIM) -> np.ndarray:
    return np.stack([_hyperplanes(dim, n_planes, t) for t in range(n_tables)])


def add_lsh_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    n_tables: int = N_TABLES,
    n_planes: int = N_HYPERPLANES,
) -> DataFrame:
    """Per-table sign-pattern bucket ids (`lsh_buckets` array<int>, one
    per table) via ONE numpy matmul over Arrow batches — all tables'
    planes in a single (L*b, dim) multiply."""
    planes = _all_planes(n_tables, n_planes).reshape(n_tables * n_planes, DIM)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @F.pandas_udf("array<int>")
    def buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.values)  # (batch, dim)
        signs = (m @ planes.T) > 0  # (batch, L*b)
        signs = signs.reshape(len(m), n_tables, n_planes)
        ids = (signs @ weights).astype(np.int32)  # (batch, L)
        return pd.Series(list(ids))

    return df.withColumn("lsh_buckets", buckets(F.col(vec_col)))


def _explode_tables(df: DataFrame) -> DataFrame:
    """(…, lsh_buckets) -> (…, table, bucket) — the join key per table."""
    return df.select(
        *[c for c in df.columns if c != "lsh_buckets"],
        F.posexplode("lsh_buckets").alias("table", "bucket"),
    )


def ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = N_TABLES,
    n_planes: int = N_HYPERPLANES,
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank within multi-table,
    multi-probe LSH buckets.

    Queries probe their own bucket plus every hamming-1 neighbor in
    EACH of the L tables (L*(b+1) probes), candidates = bucket
    collisions in any table, deduped before the exact re-rank. The
    corpus side is bucketed once (at scale: a persisted table bucketed
    by (table, bucket) -> co-located joins, no corpus reshuffle per
    query batch); the query side is broadcast.
    """
    corpus = _explode_tables(
        add_lsh_buckets(
            embeddings.select(
                F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
            ),
            "vec",
            n_tables,
            n_planes,
        )
    )
    q = add_lsh_buckets(
        queries.select("query_id", F.col("qvec")), "qvec", n_tables, n_planes
    )
    probes = _explode_tables(q).select(
        "query_id",
        "qvec",
        "table",
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(n_planes)],
            )
        ).alias("bucket"),
    )
    cand = (
        corpus.join(F.broadcast(probes), ["table", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qvec", "vec_id", "vec")
        .dropDuplicates(["query_id", "vec_id"])
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
    n_tables: int = N_TABLES,
    n_planes: int = N_HYPERPLANES,
) -> DataFrame:
    """Near-duplicate pairs by cosine within multi-table LSH buckets
    (a < b) — a pair is a candidate if ANY table collides, then exact
    cosine verifies. Never an all-pairs product: one shuffle on
    (table, bucket), one on the deduped pair set."""
    b = _explode_tables(
        add_lsh_buckets(
            embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")),
            "vec",
            n_tables,
            n_planes,
        )
    )
    x, y = b.alias("x"), b.alias("y")
    pairs = (
        x.join(y, ["table", "bucket"])
        .where(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            F.col("x.vec").alias("va"),
            F.col("y.vec").alias("vb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
        .withColumn("cosine", F.round(cosine_expr(F.col("va"), F.col("vb")), 4))
        .where(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )
    return pairs
