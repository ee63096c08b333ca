"""Embedding similarity search over ``array<float>`` columns.

Brute-force cosine top-k is the correctness baseline; LSH-bucketed (random
hyperplane) search is the scale path — at 100 TB the brute-force inner
product against one query is still a single scan (fine), but *batch* query
workloads and kNN-join shapes need the bucketed variant so candidate
generation is hash-local instead of all-pairs.

All arithmetic is in double precision via built-in higher-order functions
(``zip_with`` + ``aggregate``) — JVM-side, sequential left-fold, so results
are deterministic and reproducible by an oracle that sums in index order.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as an index-ordered left fold (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """Exact cosine top-k against one query vector.

    One scan + TakeOrderedAndProject (per-partition heap, no full sort).
    Scores rounded so cross-engine float summation agrees; ties break by id
    for determinism.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), round_to).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG over [-1,1]); no numpy
    RNG state so plans are reproducible across submissions."""
    planes = []
    x = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            x = (1_103_515_245 * x + 12_345) % (2**31)
            row.append((x / (2**31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: Sequence[Sequence[float]]) -> Column:
    """Random-hyperplane LSH bucket id: bit i = sign(vec · plane_i)."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        pa = F.array(*[F.lit(float(v)) for v in p])
        bucket = bucket + F.when(dot(vec, pa) > 0, F.lit(2**i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket.

    The bucket column would be precomputed/persisted at ingest in a real
    deployment (scan-side, no shuffle); candidates shrink ~2^n_planes-fold.
    Recall is probabilistic — the point is the plan shape: partition-prunable
    candidate filter, then the same top-k.
    """
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    q_bucket = lsh_bucket(q, planes)
    scored = (
        df.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
        .where(F.col("_bucket") == q_bucket)
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), round_to).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def knn_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Approximate kNN join: bucket both sides by hyperplane LSH, join on
    bucket, per-left top-k by cosine.  The join is bucket-local (equi-join on
    the bucket key) — the only shape that survives a 100 TB × 100 TB kNN."""
    from pyspark.sql import Window

    if dim is None:
        dim = len(left.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes)
    lb = left.select(
        F.col(id_col).alias("left_id"),
        F.col(vec_col).alias("_lvec"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    rb = right.select(
        F.col(id_col).alias("right_id"),
        F.col(vec_col).alias("_rvec"),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
    )
    scored = (
        lb.join(rb, on="_bucket")
        .where(F.col("left_id") != F.col("right_id"))
        .withColumn("score", F.round(cosine(F.col("_lvec"), F.col("_rvec")), 6))
    )
    w = Window.partitionBy("left_id").orderBy(F.col("score").desc(), F.col("right_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("left_id", "right_id", "score")
    )
