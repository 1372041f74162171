"""Approximate nearest neighbor search over an embedding column.

- brute-force cosine top-k: the exactness baseline. Native
  zip_with/aggregate dot product (JVM-side, no Python), double
  accumulation, cosine rounded to 6 dp before ranking so ordering is
  engine-stable; ties broken by neighbor id.
- sign-LSH bucketed top-k: the scale path — bucket = sign bits of the
  first B dimensions (a fixed public hyperplane set); candidates only
  within the same bucket, so the join is bucket-equi instead of cross.
  At cluster scale the bucket column is the shuffle/partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cos(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return F.round(dot / (na * nb), 6)


def brute_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_id: int | None = 100,
) -> DataFrame:
    """Exact cosine top-k for each query vector (id filter bounds cost)."""
    q = emb.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    if query_ids is not None:
        q = q.filter(F.col("q_id").isin(query_ids))
    elif max_query_id is not None:
        q = q.filter(F.col("q_id") < max_query_id)
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    pairs = (
        q.crossJoin(c)
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", _cos(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos", "rk")
    )


def sign_bucket(vec, n_bits: int = 8):
    """LSH bucket id: sign bits of the first n_bits dimensions."""
    return F.concat(
        *[
            F.when(F.element_at(vec, b + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for b in range(n_bits)
        ]
    )


def lsh_topk(
    emb: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_id: int | None = 100,
) -> DataFrame:
    """Bucketed ANN: candidates share the sign-LSH bucket.

    The equi-join on bucket replaces the cross join — at 10^9 vectors
    this is the difference between a shuffle join on a key and an
    impossible cartesian.
    """
    with_b = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    q = with_b.select(
        F.col("id").alias("q_id"), F.col("vec").alias("q_vec"), "bucket"
    )
    if max_query_id is not None:
        q = q.filter(F.col("q_id") < max_query_id)
    c = with_b.select(F.col("id").alias("n_id"), F.col("vec").alias("n_vec"), "bucket")
    pairs = (
        q.join(c, "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", _cos(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "n_id", "cos", "rk")
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b) within
    sign-LSH buckets — the embedding flavor of dedup."""
    with_b = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    a = with_b.select(F.col("id").alias("id_a"), F.col("vec").alias("va"), "bucket")
    b = with_b.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", _cos(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
