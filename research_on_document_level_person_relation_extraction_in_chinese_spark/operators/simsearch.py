"""Similarity search over embedding columns (driver mandate).

- ``cosine_topk``: brute-force cosine top-k — the correctness baseline.
  Dot/norm math uses ``zip_with`` + ``aggregate`` (JVM, ordered summation →
  bit-identical to the DuckDB oracle's ``list_dot_product``).
- ``bucketed_ann_topk``: sign-bucketed (random-hyperplane-style LSH on the
  first ``sign_dims`` coordinates) variant — the scale path: the query probes
  only its own bucket, cutting the scan by ~2^sign_dims; buckets are a plain
  column so the scan is partition-prunable when the table is written
  partitioned by bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def _query_literal(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)).cast("double") for v in query_vec])


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector. Ordering is by
    exact double cosine desc then id asc; output cosine rounded to 6 dp."""
    q = _query_literal(query_vec)
    e = _to_double(F.col(vec_col))
    return (
        emb.select(F.col(id_col), cosine(e, q).alias("_cos"))
        .orderBy(F.col("_cos").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round(F.col("_cos"), 6).alias("cosine"))
    )


def sign_bucket(vec: Column, sign_dims: int = 3) -> Column:
    """LSH bucket id from the sign bits of the first ``sign_dims`` coords."""
    out = F.lit(0)
    for d in range(sign_dims):
        out = out + F.when(F.element_at(vec, d + 1) >= 0, F.lit(1 << d)).otherwise(F.lit(0))
    return out


def bucketed_ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    sign_dims: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: scan only the query's sign bucket."""
    qbucket = 0
    for d in range(sign_dims):
        if float(query_vec[d]) >= 0:
            qbucket |= 1 << d
    q = _query_literal(query_vec)
    e = _to_double(F.col(vec_col))
    return (
        emb.where(sign_bucket(F.col(vec_col), sign_dims) == qbucket)
        .select(F.col(id_col), cosine(e, q).alias("_cos"))
        .orderBy(F.col("_cos").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round(F.col("_cos"), 6).alias("cosine"))
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    sign_dims: int = 3,
    max_id: int | None = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup family, driver mandate).

    Blocked by the sign-bucket LSH (same buckets as ``bucketed_ann_topk``) so
    the pairwise join is per-bucket, not all-pairs: at K buckets the
    candidate count drops ~K×, and bucket id is a plain column → the join
    shuffles on it and AQE splits any skewed bucket. ``max_id`` bounds the
    demo subset; the scale path is the same plan without it.
    """
    base = emb
    if max_id is not None:
        base = base.where(F.col(id_col) < max_id)
    base = base.select(
        F.col(id_col).alias("id"),
        _to_double(F.col(vec_col)).alias("e"),
        sign_bucket(F.col(vec_col), sign_dims).alias("bucket"),
    )
    a, b = base.alias("a"), base.alias("b")
    cos = cosine(F.col("a.e"), F.col("b.e"))
    return (
        a.join(b, on="bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .withColumn("_cos", cos)
        .where(F.round(F.col("_cos"), 6) >= threshold)
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.round(F.col("_cos"), 6).alias("cosine"),
        )
    )
