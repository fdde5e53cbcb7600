"""Embedding similarity search over an ``array<float>`` column.

Two paths over the ``embeddings`` table (vec_id, embedding, label):

  brute-force    exact cosine top-k: JVM-side F.zip_with + F.aggregate
                 dot products (no Python, no shuffle beyond the final
                 TakeOrderedAndProject)
  sign-LSH (ANN) deterministic hyperplanes (md5-seeded), vectors bucketed
                 by their sign pattern; a query probes only its bucket —
                 the scale path: buckets are the partition key, the scan
                 prunes to one bucket

At 100 TB the brute-force path stays linear-per-query but embarrassingly
parallel (no shuffle); the LSH path turns it into an O(bucket) probe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wiser_spark.operators.dedup import md5_long


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact cosine top-k vs a literal query vector:
    (rank, vec_id, cosine)."""
    q = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scored = embeddings.select(
        "vec_id", cosine_col(emb, q).alias("cosine")
    )
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "vec_id", F.round("cosine", 6).alias("cosine")
    )


def hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5("p<plane>_<j>") -> 60-bit int -> scaled. Reproducible in SQL."""
    import hashlib

    out = []
    for j in range(dim):
        h = int(hashlib.md5(f"p{plane}_{j}".encode()).hexdigest()[:15], 16)
        out.append((h % 1_000_000) / 500_000.0 - 1.0)
    return out


def lsh_bucket_col(emb: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit p set iff dot(plane_p, v) >= 0."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        pl = F.array(*[F.lit(float(v)).cast("double") for v in plane])
        bucket = bucket + F.when(_dot(emb, pl) >= 0, F.lit(1 << p)).otherwise(0)
    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
) -> DataFrame:
    """ANN top-k: probe only the query's sign-LSH bucket:
    (rank, vec_id, cosine). Approximate — recall measured in tests."""
    dim = len(query_vec)
    planes = [hyperplane(p, dim) for p in range(n_planes)]
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    bucketed = embeddings.select(
        "vec_id", emb.alias("emb"), lsh_bucket_col(emb, planes).alias("bucket")
    )
    import numpy as np

    qb = 0
    for p, plane in enumerate(planes):
        if float(np.dot(query_vec, plane)) >= 0:
            qb |= 1 << p
    q = F.array(*[F.lit(float(v)).cast("double") for v in query_vec])
    scored = bucketed.filter(F.col("bucket") == qb).select(
        "vec_id", cosine_col(F.col("emb"), q).alias("cosine")
    )
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "vec_id", F.round("cosine", 6).alias("cosine")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.98, n_planes: int = 6
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH blocking:
    (vec_a, vec_b, cosine >= threshold). Pairs are only compared within a
    bucket — the quadratic blowup is bounded per bucket."""
    dim = int(embeddings.select(F.size("embedding")).first()[0])
    planes = [hyperplane(p, dim) for p in range(n_planes)]
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    b = embeddings.select(
        "vec_id", emb.alias("emb"), lsh_bucket_col(emb, planes).alias("bucket")
    )
    left = b.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"), "bucket")
    right = b.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"), "bucket")
    return (
        left.join(right, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b", cosine_col(F.col("ea"), F.col("eb")).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )
