"""Similarity search over embedding columns (array<float>):
brute-force cosine top-k baseline + sign-LSH bucketed variant as the
scale path (north-star surface, BASELINE.json:6).

The dot product is F.zip_with + F.aggregate — JVM-side, no Python UDF.
Elements are cast float->double (exact) and summed left-to-right, which
matches DuckDB's list_dot_product order, so cosines are bit-comparable
with the SQL oracle before rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .rounding import pround


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    queries: (id_col, vec_col) — broadcast against the corpus, ranked per
    query with a deterministic tie-break on neighbor id. Scale: corpus is
    partition-parallel; queries broadcast (small side)."""
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"))
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine_expr(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("long").alias("rank"), pround(F.col("cos"), 4).alias("cos"))
    )


def sign_lsh_bucket(vec: Column, dims: int = 6) -> Column:
    """Random-hyperplane LSH degenerate form: bucket = sign bits of the
    first `dims` coordinates. Deterministic, oracle-expressible; at scale
    replace coordinates with stored random projections."""
    bucket = F.lit(0).cast("long")
    for d in range(dims):
        bucket = bucket + F.when(vec[d] > 0, F.lit(1 << d).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dims: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine rank within the bucket. The bucket equality join is
    the scale path — shuffle on bucket id, never the full pair space."""
    c = emb.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("nv"),
        sign_lsh_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("qv"),
        sign_lsh_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine_expr(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.col("rank").cast("long").alias("rank"), pround(F.col("cos"), 4).alias("cos"))
    )


def ivf_assign(emb: DataFrame, n_centroids_dims: int = 8, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-style coarse partition assignment: cell = argmax coordinate
    among the first n dims (a deterministic stand-in for learned
    centroids; the Spark plumbing — assign, partition, search-within-cell
    — is the real artifact)."""
    vec = F.col(vec_col)
    best_d, best_v = F.lit(0), vec[0]
    for d in range(1, n_centroids_dims):
        is_better = vec[d] > best_v
        best_d = F.when(is_better, F.lit(d)).otherwise(best_d)
        best_v = F.when(is_better, vec[d]).otherwise(best_v)
    return emb.select(F.col(id_col), best_d.cast("long").alias("cell"))
