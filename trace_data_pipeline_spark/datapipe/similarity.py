"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k with a broadcast query set — for Q
queries the cost is Q·N dot products, JVM-side via zip_with/aggregate
higher-order functions (no Python). Scale path (LSH bucketing) keeps
the same interface but meets candidates on hash buckets instead of the
full corpus.

All arithmetic is in float64 (explicit casts) so results are
reproducible against the DuckDB oracle; rankings order by the ROUNDED
cosine with an id tiebreak so ulp noise can't flip neighbor order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_f64(a: Column, b: Column, dim: int | None = None) -> Column:
    """Σ aᵢ·bᵢ with per-element double cast, accumulated left-to-right
    (same term order as the oracle's list_dot_product).

    With `dim` given, the sum is unrolled into a flat codegen-friendly
    expression — measurably faster than the interpreted higher-order
    aggregate() fold on hot paths like brute-force top-k."""
    if dim is not None:
        acc = F.lit(0.0)
        for i in range(dim):
            acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_f64(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(dot_f64(a, a, dim))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot_f64(a, b, dim) / (norm_f64(a, dim) * norm_f64(b, dim))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors (self excluded): broadcast the query
    set against the corpus, one window per query for the top-k cut.
    Returns (query_id, neighbor_id, cos_sim, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim", F.round(cosine(F.col("__qv"), F.col("__cv"), dim), round_dp)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_norms(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """L2 norms — the cheap sanity surface for the vector plumbing."""
    return vectors.select(
        F.col(id_col),
        F.round(norm_f64(F.col(vec_col), dim), 6).alias("l2_norm"),
        F.size(F.col(vec_col)).alias("dim"),
    )


def random_hyperplane_buckets(
    vectors: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH scale path: sign-pattern bucket id from fixed hyperplanes.
    Near-duplicate cosine search then joins on bucket equality instead
    of cross-joining the corpus. Planes are deterministic constants
    (seeded offline) so the bucketing is reproducible."""
    sign_bits = []
    for p in planes:
        plane = F.array(*[F.lit(float(x)) for x in p])
        sign_bits.append(
            F.when(dot_f64(F.col(vec_col), plane) >= 0, F.lit("1")).otherwise(F.lit("0"))
        )
    return vectors.select(
        F.col(id_col), F.col(vec_col), F.concat(*sign_bits).alias("bucket")
    )


def lsh_cosine_pairs(
    vectors: DataFrame,
    planes: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup detection at scale: bucket join (same sign
    pattern) → exact cosine verify. One shuffle on the bucket key."""
    b = random_hyperplane_buckets(vectors, planes, id_col, vec_col)
    b1 = b.select(F.col(id_col).alias("a"), F.col(vec_col).alias("__va"), "bucket")
    b2 = b.select(F.col(id_col).alias("b"), F.col(vec_col).alias("__vb"), "bucket")
    return (
        b1.join(b2, "bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos_sim", F.round(cosine(F.col("__va"), F.col("__vb"), dim), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("a", "b", "cos_sim")
    )
