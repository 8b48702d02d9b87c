"""KMV (k-minimum-values) bottom-k distinct sketches.

``approx_count_distinct`` (HyperLogLog) answers "how many distinct" but
its register state is opaque: two sketches from different engines never
compare equal, and it cannot estimate *overlap* between groups.  The KMV
bottom-k sketch keeps the k smallest hash values of a column — a tiny,
MERGEABLE, engine-reproducible summary that yields

- a distinct-count estimate ``(k-1) / u_k`` (u_k = k-th smallest hash
  mapped to [0,1)), exact below k distinct values;
- a cross-group Jaccard estimate: merge two signatures, keep the
  bottom-k of the union, count how many of those k landed in both —
  the classic bottom-k coordinated-sample estimator.

Everything is md5-based (``conv(substr(md5(x),1,15),16,10)`` — a 60-bit
uniform draw DuckDB reproduces verbatim via ``CAST('0x'||... AS
BIGINT)``), so the *entire sketch*, not just the estimate, is
value-oracled cross-engine.  At 10^12 rows the signature per group is
k longs — broadcastable state the drift/overlap monitors can persist
per snapshot and merge across days without rescanning history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "kmv_signatures",
    "kmv_distinct",
    "kmv_overlap_matrix",
    "kmv_error_audit",
    "kmv_snapshot_delta",
    "log2_histogram",
    "log2_quantiles",
]

_TWO60 = float(1 << 60)


def _grp(group_col: str) -> F.Column:
    return F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))


def _u(col: str) -> F.Column:
    # 60-bit uniform hash of the value's string form; nulls are not a
    # value (dropped by the caller before this point)
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
    ).cast("long")


def _bottom_k(df: DataFrame, col: str, group_col: str, k: int) -> DataFrame:
    """(group, u) rows: per group the k smallest distinct 60-bit hashes.

    Scale shape: the distinct pass is ONE map-side-combinable
    ``groupBy(group, u)``; the rank filter compiles to WindowGroupLimit,
    which Spark pushes below the exchange as a partial per-task bottom-k
    — no task ever materializes a full group's hash set, the same
    discipline as ``vocab_topk``.
    """
    if k < 2:
        raise ValueError("kmv: k must be >= 2 (the estimator uses k-1)")
    distinct = (
        df.where(F.col(col).isNotNull())
        .select(_grp(group_col).alias("group"), _u(col).alias("u"))
        .groupBy("group", "u")
        .agg(F.lit(1))
        .select("group", "u")
    )
    w = Window.partitionBy("group").orderBy(F.col("u").asc())
    return (
        distinct.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("group", "u")
    )


def kmv_signatures(
    df: DataFrame, col: str, group_col: str = "source", k: int = 256
) -> DataFrame:
    """Per-group KMV signature: ``(group, n_kept, signature)`` with the
    signature an ascending ``array<long>`` of the k smallest distinct
    60-bit hashes (shorter when the group holds < k distinct values —
    then the sketch IS the exact distinct set).

    This is the persistable/mergeable artifact: union two signatures
    and re-take the bottom-k to merge snapshots or partitions; feed
    pairs to :func:`kmv_overlap_matrix` for Jaccard.  The collect_list
    runs on <= k rows per group — bounded state, never corpus-sized.
    """
    return (
        _bottom_k(df, col, group_col, k)
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.array_sort(F.collect_list("u")).alias("signature"),
        )
    )


def kmv_distinct(
    df: DataFrame, col: str, group_col: str = "source", k: int = 256
) -> DataFrame:
    """Per-group distinct-count estimate from the bottom-k sketch:
    ``(group, n_kept, is_exact, est_distinct)``.  Below k distinct
    values the sketch saw everything (``is_exact``, estimate == n_kept);
    at or above, the estimator is ``(k-1) / (u_k / 2^60)``.

    Cross-engine determinism: u_k is an exact BIGINT; the estimate is
    ``(k-1)*2^60`` (a double holding an exact power-of-two multiple) in
    ONE correctly-rounded division by ``CAST(u_k AS DOUBLE)``, mirrored
    verbatim in the oracle SQL, then one round(…, 4).

    Scale shape: :func:`_bottom_k` (map-side distinct + pushed-down
    group limit) plus a <= k-rows-per-group aggregate.  Relative error
    is ~1/sqrt(k-2) (~6% at k=256) — the audit for that bound on real
    data is :func:`kmv_error_audit`.
    """
    return (
        _bottom_k(df, col, group_col, k)
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.max("u").alias("_uk"),
        )
        .select(
            "group",
            "n_kept",
            (F.col("n_kept") < k).alias("is_exact"),
            F.when(
                F.col("n_kept") < k, F.col("n_kept").cast("double")
            )
            .otherwise(
                F.round(
                    F.lit(float(k - 1) * _TWO60)
                    / F.col("_uk").cast("double"),
                    4,
                )
            )
            .alias("est_distinct"),
        )
    )


def kmv_overlap_matrix(
    df: DataFrame, col: str, group_col: str = "source", k: int = 256
) -> DataFrame:
    """Estimated Jaccard overlap of distinct ``col`` values for every
    unordered group pair: merge each pair's signatures, keep the
    bottom-k of the union (a uniform coordinated sample of it), and
    count members seen by BOTH sides — ``jaccard_est = inter / depth``
    where depth = min(k, |union sample|).  The overlap lens the
    HLL-based distinct counter cannot give: which sources feed each
    other content (mirrors, scrapes of scrapes) *without* any
    corpus-side pair join.

    Scale shape: after the bounded sketch build, the pair stage is a
    |groups|² cross join over rows carrying <= k-element arrays — tens
    of groups, driver-trivial, zero corpus involvement.  All array math
    is exact longs; ``jaccard_est`` is one rounded division.
    """
    sigs = kmv_signatures(df, col, group_col, k)
    a = sigs.select(
        F.col("group").alias("group_a"),
        F.col("n_kept").alias("n_a"),
        F.col("signature").alias("sig_a"),
    )
    b = sigs.select(
        F.col("group").alias("group_b"),
        F.col("n_kept").alias("n_b"),
        F.col("signature").alias("sig_b"),
    )
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat("sig_a", "sig_b"))), 1, k
    )
    pairs = (
        a.crossJoin(b)
        .where(F.col("group_a") < F.col("group_b"))
        .withColumn("_m", merged)
    )
    inter = F.size(
        F.array_intersect(F.array_intersect(F.col("_m"), "sig_a"), "sig_b")
    ).cast("long")
    depth = F.size("_m").cast("long")
    return pairs.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        inter.alias("inter"),
        depth.alias("depth"),
        F.when(
            depth > 0,
            F.round(inter.cast("double") / depth.cast("double"), 6),
        ).alias("jaccard_est"),
    )


def kmv_error_audit(
    df: DataFrame, col: str, group_col: str = "source", k: int = 256
) -> DataFrame:
    """Sketch-vs-truth scorecard: per group the exact distinct count
    (full two-phase ``countDistinct`` — affordable at audit scale, the
    thing you *cannot* afford routinely at 10^12) next to the KMV
    estimate, with signed relative error.  Run at a small SF or on a
    sample to certify the k you deploy; the documented bound is
    ~1/sqrt(k-2) relative standard error.

    Scale shape: the estimate side is the bounded sketch; the exact side
    is one expanded groupBy — both one exchange, joined on |groups|
    rows.  ``rel_error`` is (est - exact)/exact in doubles, one fixed op
    sequence, null for an empty group rather than a division blow-up.
    """
    exact = (
        df.where(F.col(col).isNotNull())
        .select(_grp(group_col).alias("group"), F.col(col))
        .groupBy("group")
        .agg(F.countDistinct(col).cast("long").alias("exact_distinct"))
    )
    est = kmv_distinct(df, col, group_col, k)
    joined = exact.join(est, "group", "inner")
    ex = F.col("exact_distinct").cast("double")
    return joined.select(
        "group",
        "exact_distinct",
        "n_kept",
        "is_exact",
        "est_distinct",
        F.when(
            F.col("exact_distinct") > 0,
            F.round((F.col("est_distinct") - ex) / ex, 6),
        ).alias("rel_error"),
    )


def _log2_bin(col: str) -> F.Column:
    # exact integer floor(log2): digits of the base-2 string form minus
    # one — no floating log anywhere, so no cross-engine ulp hazard at
    # the power-of-two boundaries; 0 gets its own bin -1
    v = F.col(col).cast("long")
    return F.when(v == 0, F.lit(-1)).otherwise(
        (F.length(F.conv(v, 10, 2)) - 1).cast("int")
    )


def log2_histogram(df: DataFrame, col: str, group_col: str = "source"):
    """Mergeable power-of-two histogram of a non-negative integer
    column: per (group, bin) row counts with ``bin = floor(log2(v))``
    (computed as base-2 digit count — EXACT integer arithmetic, immune
    to the log-ulp boundary hazard a floating log2 carries on values
    adjacent to 2^k) and ``bin = -1`` for zeros.  Negative and null
    values are dropped (a length cannot be negative; audit them with
    the validation layer, not the sketch).

    This is the quantile counterpart of the KMV sketch: ≤ 64 exact
    BIGINT counters per group that merge across partitions, snapshots
    and days by plain addition — unlike ``approx_percentile``'s opaque
    state, every counter is engine-reproducible and value-oracled.
    One map-side-combinable ``groupBy(group, bin)`` over the scan.
    """
    v = F.col(col).cast("long")
    return (
        df.where(v.isNotNull() & (v >= 0))
        .select(
            F.coalesce(F.col(group_col).cast("string"), F.lit("__null__"))
            .alias("group"),
            _log2_bin(col).alias("bin"),
        )
        .groupBy("group", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def log2_quantiles(
    df: DataFrame, col: str, group_col: str = "source", qs=(0.5, 0.9, 0.99)
) -> DataFrame:
    """Per-group quantile BOUNDS from the :func:`log2_histogram`
    sketch: for each requested q, the smallest bin whose cumulative
    count reaches ``q·n`` and its inclusive upper bound ``2^(bin+1)−1``
    — a certified ≤2× overestimate of the true quantile (the bound a
    context-length or skew monitor needs; when the factor-of-two
    envelope is too loose the caller escalates to the exact pass at
    audit scale).  Returns (group, q, n, bin, est_hi).

    Cross-engine determinism: bins and cumulative counts are exact
    integers; the only float op is the ``cum >= q·n`` comparison with a
    literal q — one correctly-rounded multiply on both engines.

    Scale shape: the corpus-side work is the histogram's single
    combine-friendly exchange; the cumulative window, the q expansion
    and the argmin all run on the |groups|×64-row sketch.  Domain:
    values < 2^62 (the digit count is exact for any positive BIGINT;
    est_hi for bin 62 would overflow — lengths and token counts live
    far below).
    """
    qs = list(qs)
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("log2_quantiles: each q must be in (0, 1]")
    hist = log2_histogram(df, col, group_col)
    w = (
        Window.partitionBy("group")
        .orderBy(F.col("bin").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("group")
    cum = hist.select(
        "group",
        "bin",
        F.sum("n").over(w).cast("long").alias("cum"),
        F.sum("n").over(wt).cast("long").alias("n"),
    )
    qdf = cum.crossJoin(
        F.broadcast(
            df.sparkSession.createDataFrame(
                [(float(q),) for q in sorted(qs)], "q double"
            )
        )
    )
    hit = qdf.where(
        F.col("cum").cast("double") >= F.col("q") * F.col("n").cast("double")
    )
    best = hit.groupBy("group", "q").agg(
        F.max("n").alias("n"), F.min("bin").alias("bin")
    )
    return best.select(
        "group",
        "q",
        "n",
        "bin",
        # python shiftleft() only takes a literal shift; the SQL form
        # accepts an expression (exact integer 2^(bin+1) − 1)
        F.when(F.col("bin") < 0, F.lit(0).cast("long"))
        .otherwise(F.expr("shiftleft(CAST(1 AS BIGINT), bin + 1) - 1"))
        .alias("est_hi"),
    )


def _est_from(sig, n, k: int) -> F.Column:
    """Distinct estimate from a sorted bottom-k signature column:
    exact n below k, else (k−1)·2^60 / u_k (kmv_distinct's arithmetic,
    one power-of-two-exact double division)."""
    return F.when(n < k, n.cast("double")).otherwise(
        F.round(
            F.lit(float(k - 1) * _TWO60)
            / F.element_at(sig, k).cast("double"),
            4,
        )
    )


def kmv_snapshot_delta(
    old_sigs: DataFrame, new_sigs: DataFrame, k: int = 256
) -> DataFrame:
    """Cross-snapshot content-growth estimate from two PERSISTED KMV
    signature frames (:func:`kmv_signatures` outputs) — how much
    genuinely new distinct content each group gained between corpus
    versions, WITHOUT rescanning the old snapshot: merge the two
    bottom-k signatures, estimate |old|, |new|, |old ∪ new|, and report
    ``est_added = max(est_union − est_old, 0)`` plus the coordinated-
    sample Jaccard.  An ingest that claims a fresh crawl but shows
    est_added ≈ 0 re-delivered yesterday's content; a source whose
    union explodes past est_old + est_new−overlap expectations has a
    hash/extraction change masquerading as new data.

    Groups absent from one side enter as empty signatures (est 0) —
    a brand-new source is 100% added, a vanished one 0.

    Cross-engine determinism: signatures are exact BIGINT arrays; every
    estimate is kmv_distinct's single-division arithmetic; the merge is
    exact array math.  This is the payoff of a sketch whose WHOLE STATE
    is engine-reproducible: the oracle rebuilds both snapshots' sketches
    and gets bit-identical estimates.

    Scale shape: zero corpus involvement — the inputs are |groups|-row
    signature frames; one outer join + array ops on ≤k-long arrays.
    """
    if k < 2:
        raise ValueError("kmv: k must be >= 2 (the estimator uses k-1)")
    o = old_sigs.select(
        "group",
        F.col("n_kept").alias("_no"),
        F.col("signature").alias("_so"),
    )
    n = new_sigs.select(
        "group",
        F.col("n_kept").alias("_nn"),
        F.col("signature").alias("_sn"),
    )
    empty = F.array().cast("array<long>")
    j = (
        o.join(n, "group", "full_outer")
        .select(
            "group",
            F.coalesce(F.col("_no"), F.lit(0)).cast("long").alias("n_old"),
            F.coalesce(F.col("_so"), empty).alias("so"),
            F.coalesce(F.col("_nn"), F.lit(0)).cast("long").alias("n_new"),
            F.coalesce(F.col("_sn"), empty).alias("sn"),
        )
        .withColumn(
            "_m",
            F.slice(
                F.array_sort(F.array_distinct(F.concat("so", "sn"))), 1, k
            ),
        )
    )
    n_m = F.size("_m").cast("long")
    est_old = _est_from(F.col("so"), F.col("n_old"), k)
    est_new = _est_from(F.col("sn"), F.col("n_new"), k)
    est_union = _est_from(F.col("_m"), n_m, k)
    inter = F.size(
        F.array_intersect(F.array_intersect(F.col("_m"), "so"), "sn")
    ).cast("long")
    return j.select(
        "group",
        "n_old",
        "n_new",
        F.round(est_old, 4).alias("est_old"),
        F.round(est_new, 4).alias("est_new"),
        F.round(est_union, 4).alias("est_union"),
        F.round(F.greatest(est_union - est_old, F.lit(0.0)), 4).alias(
            "est_added"
        ),
        F.when(
            n_m > 0,
            F.round(inter.cast("double") / n_m.cast("double"), 6),
        ).alias("jaccard_est"),
    )
