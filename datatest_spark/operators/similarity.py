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
    exact: bool = False,
    bands: int = 8,
    rows_per_band: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Pairs with cosine >= threshold (embedding-cosine near-dup).

    Default path (the 100-TB shape): banded random-hyperplane LSH
    generates candidate pairs via an equi-join on (band, key) — an
    OR-of-ANDs construction whose recall at near-dup thresholds
    (cos >= ~0.9, collision prob p ≈ 1 - θ/π per plane) is
    1 - (1 - p^rows_per_band)^bands ≈ 0.9999 — then the exact cosine
    verifies candidates only. No cross join appears in the plan.

    ``exact=True`` is the all-pairs O(N²) escape hatch: the exactness
    baseline for oracle comparison and small batches only.
    """
    v = vectors.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    if max_ids is not None:
        v = v.filter(F.col("id") < max_ids)
    if exact:
        a, b = v.alias("a"), v.alias("b")
        pairs = a.crossJoin(b).filter(F.col("a.id") < F.col("b.id"))
    else:
        bk = _band_buckets(v, "id", "v", bands, rows_per_band, seed)
        a_k, b_k = bk.alias("ak"), bk.alias("bk")
        cand = (
            a_k.join(b_k, on=["band", "key"])
            .filter(F.col("ak.id") < F.col("bk.id"))
            .select(F.col("ak.id").alias("_ia"), F.col("bk.id").alias("_ib"))
            .distinct()
        )
        va = v.select(F.col("id").alias("_ia"), F.col("v").alias("_va"))
        vb = v.select(F.col("id").alias("_ib"), F.col("v").alias("_vb"))
        pairs = (
            cand.join(va, "_ia")
            .join(vb, "_ib")
            .select(
                F.struct(F.col("_ia").alias("id"), F.col("_va").alias("v")).alias("a"),
                F.struct(F.col("_ib").alias("id"), F.col("_vb").alias("v")).alias("b"),
            )
        )
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


def _centroids_from_sample(vectors, vec_col, n_centroids, id_col,
                           hash_fn="xxhash64"):
    """Deterministic hash-stratified centroid pick: stratum =
    pmod(hash(id), C); within each stratum keep the row minimizing a
    salted hash of the id. Seed-stable at any parallelism (unlike
    monotonically_increasing_id) and spread across the id space (unlike
    first-C-by-id, which collapses all centroids into one region when ids
    are insertion-ordered and the data is clustered).

    ``hash_fn='md5'`` swaps xxhash64 for md5-derived keys (stratum from
    the last two hex digits, within-stratum order lexicographic on a
    salted md5 hex string) — same statistical behavior, but every step
    is reproducible in ANSI SQL for the cross-engine oracle."""
    from pyspark.sql.window import Window

    v = vectors.select(
        F.col(id_col).alias("_src_id"), as_double(F.col(vec_col)).alias("cv")
    )
    if hash_fn == "md5":
        h = F.md5(F.col("_src_id").cast("string"))
        v = v.withColumn(
            "centroid_id",
            F.pmod(
                F.conv(F.substring(h, 31, 2), 16, 10).cast("int"),
                F.lit(n_centroids),
            ),
        )
        order_key = F.md5(
            F.concat(F.col("_src_id").cast("string"), F.lit("#7"))
        )
    else:
        v = v.withColumn(
            "centroid_id", F.pmod(F.xxhash64(F.col("_src_id")), F.lit(n_centroids))
        )
        order_key = F.xxhash64(F.col("_src_id"), F.lit(7))
    w = Window.partitionBy("centroid_id").orderBy(order_key, F.col("_src_id"))
    return (
        v.withColumn("_r", F.row_number().over(w))
        .filter("_r = 1")
        .select("centroid_id", "cv")
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
    centroid_hash: str = "xxhash64",
) -> DataFrame:
    """IVF approximate top-k: search only the nprobe nearest buckets.

    At 100 TB the assignment table is written bucketed by centroid_id so
    query-time probes prune partitions; here both passes are computed
    inline. Recall is tested against brute force in tests/test_pipeline.py.
    ``centroid_hash='md5'`` selects the SQL-reproducible centroid pick
    (see _centroids_from_sample) for the cross-engine oracle query.
    """
    cents = _centroids_from_sample(
        vectors, vec_col, n_centroids, id_col, hash_fn=centroid_hash
    )
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


def _sign_bits(v, n_planes: int, seed: int):
    """Sign of <v, plane_p> for p in [0, n_planes) as '0'/'1' Columns.

    Plane components are generated JVM-side from xxhash64(seed, p, dim
    index) — dimension-agnostic (adapts to each row's vector length),
    no RNG state, reproducible at any parallelism, and the whole dot
    product stays in codegen (zip_with + aggregate)."""
    idx = F.sequence(F.lit(0), F.size(v) - 1)

    def _component(p):
        # two-arg lambda required: PySpark binds Columns by arity
        def comp(x, d):
            h = F.pmod(F.xxhash64(F.lit(int(seed)), F.lit(int(p)), d), F.lit(10000))
            return x * (h / F.lit(5000.0) - F.lit(1.0))

        return comp

    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(v, idx, _component(p)), F.lit(0.0), lambda acc, x: acc + x
        )
        bits.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    return bits


def lsh_buckets(
    vectors: DataFrame,
    id_col="vec_id",
    vec_col="embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH signature: sign pattern against n_planes
    deterministic pseudo-random hyperplanes — (id, bucket)."""
    v = vectors.select(F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v"))
    sig = F.concat(*_sign_bits(F.col("v"), n_planes, seed))
    return v.select("id", sig.alias("bucket"))


def _band_buckets(v: DataFrame, id_name: str, vec_name: str, bands: int,
                  rows_per_band: int, seed: int) -> DataFrame:
    """Banded LSH buckets (id, band, key): OR-construction over ``bands``
    bands, each band an AND of ``rows_per_band`` plane signs."""
    bits = _sign_bits(F.col(vec_name), bands * rows_per_band, seed)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat(*bits[b * rows_per_band : (b + 1) * rows_per_band]).alias("key"),
        )
        for b in range(bands)
    ]
    return v.select(
        F.col(id_name).alias("id"), F.explode(F.array(*band_structs)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
