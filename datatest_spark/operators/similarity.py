"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline (all-pairs dot
products — fine for query batches, O(Q x N)); the scale path is IVF-style
bucketing: assign every vector to its nearest of C centroids (one pass),
then search only the probe buckets (candidate set ~ N/C * nprobe). LSH
(random-hyperplane) bucketing is provided as the alternative scale path.

All arithmetic is native Column expressions (zip_with / aggregate in
codegen, cast to double for stable accumulation); no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def as_double(vec):
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b):
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col="vec_id",
    vec_col="embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).

    Query side is broadcast (query batches are small); the corpus scan is
    embarrassingly parallel — no shuffle until the per-query top-k, which
    Spark executes as partial top-k per partition (window + row_number
    under AQE)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("nv")
    )
    pairs = v.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("nv")).alias("cosine"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


def threshold_pairs(
    vectors: DataFrame,
    id_col="vec_id",
    vec_col="embedding",
    threshold: float = 0.8,
    max_ids: int | None = None,
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding-cosine near-dup)."""
    v = vectors.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    if max_ids is not None:
        v = v.filter(F.col("id") < max_ids)
    a, b = v.alias("a"), v.alias("b")
    pairs = a.crossJoin(b).filter(F.col("a.id") < F.col("b.id"))
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


def _centroids_from_sample(vectors, vec_col, n_centroids, id_col):
    """Deterministic centroid pick: the first C vectors by id (a seeded
    k-means init would add quality; determinism matters more here)."""
    return (
        vectors.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            F.monotonically_increasing_id().alias("centroid_id"),
            as_double(F.col(vec_col)).alias("cv"),
        )
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col="vec_id",
    vec_col="embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast argmax)."""
    v = vectors.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    joined = v.crossJoin(F.broadcast(centroids))
    scored = joined.select(
        "id", "v", "centroid_id", cosine(F.col("v"), F.col("cv")).alias("sim")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("id").orderBy(F.col("sim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter("_r = 1")
        .select("id", "v", "centroid_id")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col="vec_id",
    vec_col="embedding",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: search only the nprobe nearest buckets.

    At 100 TB the assignment table is written bucketed by centroid_id so
    query-time probes prune partitions; here both passes are computed
    inline. Recall is tested against brute force in tests/test_pipeline.py.
    """
    cents = _centroids_from_sample(vectors, vec_col, n_centroids, id_col)
    cents = cents.persist()
    assigned = ivf_assign(vectors, cents, id_col, vec_col)

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "centroid_id", cosine(F.col("qv"), F.col("cv")).alias("sim")
    )
    from pyspark.sql.window import Window

    wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("centroid_id"))
    probes = (
        qc.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )

    cand = probes.join(assigned, "centroid_id").filter(
        F.col("query_id") != F.col("id")
    )
    scored = cand.select(
        "query_id", F.col("id").alias("neighbor_id"),
        cosine(F.col("qv"), F.col("v")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


def lsh_buckets(
    vectors: DataFrame,
    id_col="vec_id",
    vec_col="embedding",
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH signature: sign pattern against n_planes
    deterministic pseudo-random hyperplanes (seeded hash arithmetic —
    no RNG state, reproducible at any parallelism)."""
    import math

    # deterministic "random" planes from the seed via integer hashing
    def plane(p):
        vals = []
        for d in range(dim):
            h = hash((seed, p, d)) % 10_000
            vals.append((h / 5000.0) - 1.0)
        return vals

    planes = [plane(p) for p in range(n_planes)]
    v = vectors.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    sig = F.concat(
        *[
            F.when(
                F.aggregate(
                    F.zip_with(
                        F.col("v"),
                        F.array(*[F.lit(x) for x in pl]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                > 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for pl in planes
        ]
    )
    return v.select("id", sig.alias("bucket"))
