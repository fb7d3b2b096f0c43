"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline. The
  query vector is a broadcast (1-row cross join); the scan is embarrassingly
  parallel; top-k is TakeOrderedAndProject (no full sort).
- ``lsh_bucket_topk``: the scale path — sign-pattern (axis-aligned
  random-hyperplane) LSH restricts the scan to the query's bucket, trading
  recall for a 2^k scan reduction; at 100 TB this is the difference between
  touching every partition and touching one bucket's partitions (the bucket
  key is a deterministic column → partition pruning applies when the table
  is written partitioned by bucket).

All vector math is JVM-side (zip_with/aggregate) — no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(vec: Column, dims: tuple[int, ...] = (0, 7, 13, 21)) -> Column:
    """Deterministic LSH bucket: concatenated sign bits of fixed coordinates."""
    return F.concat_ws(
        "",
        *[F.when(F.element_at(vec, d + 1) >= 0, "1").otherwise("0") for d in dims],
    )


def cosine_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to the query vector: (vec_id, cos), k rows.

    Deterministic tie-break on id so results are stable across partitionings.
    """
    q = emb.where(F.col(id_col) == query_id).select(
        _as_double(F.col(vec_col)).alias("qv")
    )
    cand = emb.where(F.col(id_col) != query_id).select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    scored = cand.join(F.broadcast(q)).select(
        "vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos")
    )
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def lsh_bucket_topk(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = (0, 7, 13, 21),
) -> DataFrame:
    """Approximate top-k: scan only the query's sign bucket."""
    with_bucket = emb.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    q = with_bucket.where(F.col("vec_id") == query_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    cand = with_bucket.where(F.col("vec_id") != query_id)
    scored = cand.join(
        F.broadcast(q), cand.bucket == F.col("qbucket")
    ).select("vec_id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos"))
    return scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
