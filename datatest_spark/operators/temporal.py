"""Temporal joins — as-of enrichment over event streams.

``asof_join`` matches each left row to the nearest right row per key at
or before (``backward``) / at or after (``forward``) its timestamp — the
join every event-enrichment pipeline needs (latest signup before a
purchase, next heartbeat after an error) and one Spark has no built-in
for.

Spark-first plan: NOT a range join (O(n*m) blowup) and NOT a per-key
collect. Both sides are tagged and unioned, hash-partitioned once on the
key, sorted by (time, tag), and the right payload is carried forward
with ``last(struct, ignorenulls=True)`` over a running window — the
classic distributed merge-as-of. One Exchange total (plan-pinned in
tests/test_plans.py); skewed keys shard like any single-key window.

The right payload rides in ONE struct column, so every matched field
comes from the SAME right row (per-column ``last(ignorenulls)`` would
mix rows when a payload column is legitimately null).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    direction: str = "backward",
    suffix: str = "_r",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the right row nearest in
    ``on`` (inclusive) per ``by`` key — or nulls when no right row
    qualifies.

    Output = all left columns, then each right payload column renamed
    ``<name><suffix>``, then ``<on><suffix>`` (the matched right
    timestamp, for tolerance filtering by the caller — e.g.
    ``timestamp_diff`` bounds, which stay TZ-free on NTZ columns).

    Equal timestamps match (a right row AT the left row's time wins over
    an earlier one). Duplicate right rows on (by, on) are broken by
    ``tiebreak_col`` when given (largest wins, deterministic) — without
    it Spark's sort leaves the winner unspecified, same as most engines'
    ASOF. ``direction='forward'`` picks the nearest row at-or-after
    instead.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lpay = [c for c in left.columns if c != by]
    rpay = [c for c in right.columns if c not in (by, on)]
    clash = set(lpay) & {c + suffix for c in rpay} | {on + suffix} & set(lpay)
    if clash:
        raise ValueError("suffixed right columns collide with left: %s"
                         % sorted(clash))

    rstruct = F.struct(
        F.col(on).alias("_on"), *[F.col(c).alias(c) for c in rpay]
    )
    # tiebreak keeps its NATIVE type (casting to string would order
    # numerics lexicographically: '9' > '100'); the left side unions a
    # same-typed null
    tb_type = (right.schema[tiebreak_col].dataType
               if tiebreak_col is not None else "long")
    tb = (F.col(tiebreak_col) if tiebreak_col is not None
          else F.lit(None).cast("long"))
    # a right row with a null timestamp can never be anyone's as-of
    # match (ASOF semantics everywhere, incl. the DuckDB oracle) — but
    # asc ordering sorts NULL first, so last(ignorenulls) would pick it
    # for left rows with no real predecessor. Same for a null BY key:
    # equi-join semantics never match NULL = NULL, but the window
    # partitioning groups null keys together and would silently enrich
    # a null-key left row from an unrelated null-key right row.
    # Exclude both up front (left rows keep flowing — they just get a
    # null match, standard left-ASOF).
    tagged_r = right.where(
        F.col(on).isNotNull() & F.col(by).isNotNull()
    ).select(
        F.col(by).alias("_by"),
        F.col(on).alias("_t"),
        F.lit(0).alias("_tag"),
        tb.alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        rstruct.alias("_r"),
    )
    null_struct = F.lit(None).cast(
        tagged_r.schema["_r"].dataType.simpleString()
    )
    tagged_l = left.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(tb_type).alias("_tb"),
        *[F.col(c) for c in lpay],
        null_struct.alias("_r"),
    )
    u = tagged_l.unionByName(tagged_r)
    t_order = F.col("_t").asc() if direction == "backward" else F.col("_t").desc()
    w = (
        Window.partitionBy("_by")
        # at equal _t right rows (_tag 0) precede left rows, so an
        # exact-time right row is visible to the left row's last();
        # among equal right rows the largest _tb sorts last and wins
        .orderBy(t_order, F.col("_tag").asc(), F.col("_tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # a left row with a null timestamp matches nothing (under forward's
    # desc order null-_t lefts sort last and would otherwise "match"
    # the minimum right timestamp)
    m = F.when(
        F.col("_t").isNotNull(), F.last("_r", ignorenulls=True).over(w)
    )
    out = u.withColumn("_m", m).where(F.col("_tag") == 1)
    return out.select(
        F.col("_by").alias(by),
        *[F.col(c) for c in lpay],
        *[F.col("_m")[c].alias(c + suffix) for c in rpay],
        F.col("_m")["_on"].alias(on + suffix),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    start: str = "start",
    end: str = "end",
    by: str | None = None,
    bucket_ms: int = 3_600_000,
    suffix: str = "_r",
    max_span_buckets: int = 10_000,
) -> DataFrame:
    """Interval join: left rows whose ``on`` falls inside a right row's
    ``[start, end]`` (inclusive both ends) — the other temporal join
    Spark has no built-in for. A naive theta-join is O(|L| x |R|); this
    plan is the standard bucketized range join: every right interval is
    exploded to the coarse ``bucket_ms`` buckets it spans, each left row
    maps to its single bucket, and the two sides meet in an EQUI-join on
    (``by``?, bucket) followed by the exact inequality filter. A (left,
    right) pair shares exactly one bucket — the left row's — so no
    dedup pass is needed. Shuffle is one hash exchange per side on the
    join key; interval fan-out is bounded by span/bucket_ms (an interval
    spanning more than ``max_span_buckets`` raises rather than silently
    exploding the stage — pick a coarser bucket_ms for long intervals).

    Timestamps go through :func:`datatest_spark.operators.checks.epoch_ms`
    (NTZ-safe, session-TZ-free); plain numeric columns join on their raw
    values with ``bucket_ms`` as the bucket width. Null ``on``/``start``/
    ``end`` never match. Output: all left columns, then every right
    column suffixed.
    """
    from .checks import epoch_ms

    if bucket_ms <= 0:
        raise ValueError("bucket_ms must be positive, got %r" % bucket_ms)
    clash = {c + suffix for c in right.columns} & set(left.columns)
    if clash:
        raise ValueError(
            "suffixed right columns collide with left: %s" % sorted(clash)
        )
    reserved = {"_bkt"}
    taken = set(left.columns) | {c + suffix for c in right.columns}
    if reserved & taken:
        raise ValueError(
            "column name _bkt is reserved by range_join; rename it"
        )

    def _exact(df, col):
        # the post-join filter must compare at FULL resolution: epoch_ms
        # truncates to milliseconds, so a left row in the same ms as an
        # interval boundary would falsely match despite being
        # microseconds outside [start, end]. Timestamps compare in
        # microseconds; numerics compare raw (same unit the bucketing
        # used). Mixed numeric/timestamp sides are not supported.
        dt = dict(df.dtypes).get(col, "")
        c = F.col(col)
        if dt == "timestamp_ntz" or dt == "date":
            return F.timestamp_diff(
                "MICROSECOND",
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
                c.cast("timestamp_ntz"),
            )
        if dt.startswith("timestamp"):
            return F.unix_micros(c.cast("timestamp"))
        return c
    l_ms = epoch_ms(left, on)
    s_ms = epoch_ms(right, start)
    e_ms = epoch_ms(right, end)
    lb = F.floor(l_ms / bucket_ms)
    sb = F.floor(s_ms / bucket_ms)
    eb = F.floor(e_ms / bucket_ms)
    span = eb - sb + 1
    guard = F.when(
        span > max_span_buckets,
        F.raise_error(
            F.concat(
                F.lit(
                    "range_join interval spans more than %d buckets of "
                    "%d ms (start=" % (max_span_buckets, bucket_ms)
                ),
                F.col(start).cast("string"),
                F.lit("); raise bucket_ms or max_span_buckets"),
            )
        ).cast("long"),
    ).otherwise(sb)
    r = right.select(
        *[F.col(c).alias(c + suffix) for c in right.columns],
        F.explode(
            F.when(
                F.col(start).isNotNull() & F.col(end).isNotNull() & (sb <= eb),
                F.sequence(guard, eb),
            )
        ).alias("_bkt"),
    )
    l = left.withColumn("_bkt", lb).where(F.col(on).isNotNull())
    cond = l["_bkt"] == r["_bkt"]
    if by is not None:
        cond = cond & (l[by] == r[by + suffix])
    joined = l.join(r, cond, "inner")
    # re-derive the expressions against the JOINED frame's suffixed
    # names (the pre-join Columns would resolve against the wrong lineage)
    lj = _exact(joined, on)
    sj = _exact(joined, start + suffix)
    ej = _exact(joined, end + suffix)
    out = joined.where((lj >= sj) & (lj <= ej))
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(c + suffix) for c in right.columns],
    )


def funnel_conversion(
    df: DataFrame,
    steps,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered-step funnel over an event stream: how many users
    performed step 1, then step 2 STRICTLY AFTER their first step 1,
    then step 3 strictly after that, ... — the sequential-conversion
    audit (signup -> activation -> retention, view -> click ->
    purchase) that a plain per-type count always overstates, because it
    ignores ordering.

    Semantics: a user's step-i timestamp is their EARLIEST step-i event
    strictly later than their step-(i-1) timestamp (first-touch
    attribution; simultaneous events do NOT chain — ``ts`` ties break
    conservatively). ``within_seconds`` additionally requires each hop
    to land within that many seconds of the previous step (comparisons
    and ``timestamp_diff`` only — TZ-free on TIMESTAMP_NTZ data).

    Returns one row per step:
    (step_idx, step, n_users, rate_vs_first, rate_vs_prev) with rates
    6-dp and null when the respective denominator is zero
    (rate_vs_prev is additionally null for step 1).

    Scale shape: one equi-join per hop on ``user_col`` (k-1 shuffle
    joins for a k-step funnel, each output bounded by |users who
    reached the hop|), one k-wide left-join spine, ONE 1-row count
    aggregation, and a posexplode over a k-element array. No windows,
    no per-user event sort, no collect. Each hop frame is persisted
    (|users|-bounded): frame i is referenced both by frame i+1 and by
    the spine, and without the cache the chained lineage would re-scan
    the event table O(k^2) times.
    """
    steps = list(steps)
    if len(steps) < 1:
        raise ValueError("funnel_conversion: steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(
            "funnel_conversion: steps must be distinct, got %r" % (steps,)
        )
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError(
            "funnel_conversion: within_seconds must be positive, got %r"
            % (within_seconds,)
        )
    u = F.col(user_col)
    frames = []
    prev = None
    for i, step in enumerate(steps):
        ev = df.where(F.col(type_col) == step).select(
            u.alias("_u"), F.col(ts_col).alias("_ts")
        )
        if prev is None:
            cur = ev.groupBy("_u").agg(F.min("_ts").alias("_t0"))
        else:
            cond = F.col("_ts") > F.col("_t%d" % (i - 1))
            if within_seconds is not None:
                cond = cond & (
                    F.timestamp_diff(
                        "SECOND", F.col("_t%d" % (i - 1)), F.col("_ts")
                    )
                    <= F.lit(int(within_seconds))
                )
            cur = (
                ev.join(
                    prev.select("_u", "_t%d" % (i - 1)), "_u"
                )
                .where(cond)
                .groupBy("_u")
                .agg(F.min("_ts").alias("_t%d" % i))
            )
        cur = cur.persist()
        frames.append(cur)
        prev = cur
    spine = frames[0]
    for i in range(1, len(frames)):
        spine = spine.join(frames[i], "_u", "left")
    # coalesce: SUM over an empty spine (nobody reached step 1) is
    # NULL, but an empty funnel must count 0, not null
    one = spine.agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(F.col("_t%d" % i).isNotNull(), 1).otherwise(0)
                ),
                F.lit(0),
            ).cast("long").alias("_c%d" % i)
            for i in range(len(steps))
        ]
    )
    counts = F.array(*[F.col("_c%d" % i) for i in range(len(steps))])
    names = F.array(*[F.lit(s) for s in steps])
    exploded = one.select(
        F.posexplode(counts).alias("_i", "n_users"),
        counts.alias("_a"),
        names.alias("_s"),
    )
    first = F.element_at("_a", 1).cast("double")
    prevc = F.element_at(F.col("_a"), F.col("_i")).cast("double")  # 1-based: _i is prev idx
    return exploded.select(
        (F.col("_i") + 1).cast("int").alias("step_idx"),
        F.element_at(F.col("_s"), F.col("_i") + 1).alias("step"),
        F.col("n_users"),
        F.round(
            F.when(first > 0, F.col("n_users").cast("double") / first), 6
        ).alias("rate_vs_first"),
        F.round(
            F.when(
                (F.col("_i") > 0) & (prevc > 0),
                F.col("n_users").cast("double") / prevc,
            ),
            6,
        ).alias("rate_vs_prev"),
    )


def inter_event_cadence(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    min_intervals: int = 2,
) -> DataFrame:
    """Per-user inter-arrival cadence — the bot/burst forensic: humans
    produce bursty, high-variance gaps between events; scripted traffic
    produces metronome-regular ones (cv -> 0) or duplicate-timestamp
    floods (zero_gap_frac -> 1). Returns one row per user with at least
    ``min_intervals`` gaps:

        (user, n_intervals, mean_gap_s, std_gap_s, cv, zero_gap_frac)

    where gaps are integer MICROSECONDS between CONSECUTIVE events (ts
    order; equal timestamps contribute zero gaps — the gap multiset,
    and hence every statistic, is independent of tie order), reported
    in seconds; ``std_gap_s`` is the sample standard deviation, ``cv``
    = std/mean (null when the mean is 0 — an all-burst user has no
    scale), all 4-dp.

    Engine-exactness: gaps are measured in microseconds because that
    is where elapsed time and boundary-crossing counts coincide
    (DuckDB's date_diff counts boundary crossings; at coarser units
    the two definitions diverge on sub-second timestamps). Moments are
    exact integer sums — n, sum(gap), sum(gap^2) in DECIMAL(38,0) so
    no float accumulation order can flicker the result across
    partitionings or engines (and a century of microseconds squared
    can't silently overflow a BIGINT); variance = (n*ss - s^2) /
    (n*(n-1)) is ONE double division of exact integers, sqrt is
    correctly rounded IEEE on both engines, and the second conversions
    divide AFTER, in the same order the oracle does.

    Scale shape: one per-user window (lag over ts — per-user sort,
    bounded by a user's own history, spillable) + one
    map-side-combinable aggregation. TZ-free: ``timestamp_diff`` on
    TIMESTAMP_NTZ values only.
    """
    if min_intervals < 1:
        raise ValueError(
            "min_intervals must be >= 1, got %r" % (min_intervals,)
        )
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gaps = (
        df.where(F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("user"),
            F.timestamp_diff(
                "MICROSECOND", F.lag(ts_col).over(w), F.col(ts_col)
            ).alias("_gap"),
        )
        .where(F.col("_gap").isNotNull())
    )
    g = F.col("_gap").cast("decimal(38,0)")
    agg = gaps.groupBy("user").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(g).alias("_s"),
        F.sum(g * g).alias("_ss"),
        F.sum(F.when(F.col("_gap") == 0, 1).otherwise(0)).alias("_z"),
    ).where(F.col("n_intervals") >= min_intervals)
    n = F.col("n_intervals").cast("double")
    mean_us = F.col("_s").cast("double") / n
    var_us2 = F.when(
        F.col("n_intervals") >= 2,
        (F.col("n_intervals").cast("decimal(38,0)") * F.col("_ss")
         - F.col("_s") * F.col("_s")).cast("double")
        / (n * (n - F.lit(1.0))),
    )
    std_us = F.sqrt(var_us2)
    usec = F.lit(1000000.0)
    return agg.select(
        "user",
        "n_intervals",
        F.round(mean_us / usec, 4).alias("mean_gap_s"),
        F.round(std_us / usec, 4).alias("std_gap_s"),
        F.round(F.when(mean_us > 0, std_us / mean_us), 4).alias("cv"),
        F.round(
            F.col("_z").cast("double") / n, 4
        ).alias("zero_gap_frac"),
    )


def event_transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    min_count: int = 1,
) -> DataFrame:
    """First-order Markov transition matrix over each user's ordered
    event stream — the behavioral lens the cadence audit is blind to.

    inter_event_cadence sees WHEN a user acts; this sees WHAT follows
    what. Scripted traffic shows near-deterministic rows (one next
    state at prob ~1.0 where organic users spread mass), and a
    transition that was never observed before appearing in production
    (error->purchase) is an instrumentation bug wearing a user hat.

    Returns (prev_type, next_type, n, prob): ``n`` = observed
    prev->next steps pooled over users (consecutive events of ONE user
    — streams never chain across users), ``prob`` = n / total steps
    leaving prev_type (6-dp; rows with n < min_count are dropped AFTER
    the denominator is fixed, so surviving probabilities are unchanged
    by the cut). Ordering is (ts, tiebreak_col) per user — the
    tiebreaker makes simultaneous-timestamp streams deterministic on
    every engine and partitioning; null timestamps are excluded up
    front (no defined position in the stream).

    Scale shape: ONE user-partitioned lag window (hash exchange on
    user, per-user streams sort locally and spill) + ONE
    map-side-combinable groupBy carrying |types|^2 rows; the
    denominator is a window over that tiny aggregate, not the events.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1, got %r" % (min_count,))
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    steps = (
        events.where(F.col(ts_col).isNotNull())
        .select(
            F.col(type_col).alias("next_type"),
            F.lag(F.col(type_col)).over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNotNull())
    )
    counts = steps.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return (
        counts.withColumn("_row_total", F.sum("n").over(wp))
        .where(F.col("n") >= min_count)
        .select(
            "prev_type",
            "next_type",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.col("n").cast("double") / F.col("_row_total").cast("double"),
                6,
            ).alias("prob"),
        )
    )


def audience_overlap(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """User-audience overlap between event types — which behaviors
    share people. The transition matrix sees sequence; this sees
    MEMBERSHIP: two event types whose audiences are near-disjoint
    (jaccard ~ 0) are different populations wearing one schema, and a
    pair whose lift collapses release-over-release means a feature
    stopped reaching the other feature's users.

    Returns every unordered type pair (type_a < type_b) including
    zero-overlap ones: (type_a, type_b, users_a, users_b, users_both,
    jaccard, lift), jaccard = both/(a+b-both), lift =
    both·N/(a·b) vs the independence baseline (N = distinct users),
    both 6-dp. Null users and null types are dropped (no nameable
    audience).

    Scale shape: ONE groupBy(user) exchange building the bounded
    per-user type set (|event-type vocabulary| entries at most — this
    is an audit over a type VOCABULARY, not an unbounded key); ordered
    pairs expand map-only from the sorted set; everything downstream
    (pair counts, audience sizes, the |types|^2 zero-fill cross join,
    the 1-row user count) is broadcast-sized aggregate arithmetic.
    """
    p = events.where(
        F.col(user_col).isNotNull() & F.col(type_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"), F.col(type_col).cast("string").alias("t")
    )
    per_user = p.groupBy("u").agg(F.sort_array(F.collect_set("t")).alias("ts"))
    audiences = per_user.select(F.explode("ts").alias("t")).groupBy("t").agg(
        F.count(F.lit(1)).alias("n")
    )
    n_users = per_user.agg(F.count(F.lit(1)).alias("n_users"))
    pair_arr = F.flatten(
        F.transform(
            F.col("ts"),
            lambda a, i: F.transform(
                F.slice(F.col("ts"), i + 2, F.size("ts")),
                lambda b: F.struct(a.alias("ta"), b.alias("tb")),
            ),
        )
    )
    both = (
        per_user.select(F.explode(pair_arr).alias("pr"))
        .groupBy(F.col("pr.ta").alias("ta"), F.col("pr.tb").alias("tb"))
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    a1 = audiences.select(F.col("t").alias("ta"), F.col("n").alias("users_a"))
    a2 = audiences.select(F.col("t").alias("tb"), F.col("n").alias("users_b"))
    grid = a1.crossJoin(F.broadcast(a2)).where(F.col("ta") < F.col("tb"))
    out = (
        grid.join(F.broadcast(both), ["ta", "tb"], "left")
        .crossJoin(F.broadcast(n_users))
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "users_a",
            "users_b",
            F.coalesce(F.col("nb"), F.lit(0)).cast("long").alias("users_both"),
            "n_users",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("users_both").cast("double")
                / (F.col("users_a") + F.col("users_b") - F.col("users_both")),
                6,
            ),
        )
        .withColumn(
            "lift",
            F.round(
                F.col("users_both").cast("double")
                / F.col("users_a")
                / F.col("users_b")
                * F.col("n_users"),
                6,
            ),
        )
        .drop("n_users")
    )
    return out


def path_trigrams(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    min_count: int = 1,
) -> DataFrame:
    """Second-order path mining with a first-order null model — the
    Markov-order test for event streams. The transition matrix assumes
    WHAT-comes-next depends only on the current state; this measures
    where that breaks: each (t1, t2, t3) path's observed count against
    the count the first-order matrix predicts
    (``expected_n = n(t1,t2,·) · P(t3|t2)``), so ``lift`` >> 1 exposes
    genuinely second-order behavior (scripted multi-step flows,
    compensating-event loops) and lift << 1 exposes forbidden
    continuations.

    Returns (t1, t2, t3, n, expected_n 4-dp, lift 4-dp); rows with
    n < min_count are cut AFTER every denominator is fixed. Ordering
    is (ts, tiebreak) per user; null timestamps drop (no position);
    null types coalesce to '__null__' so a genuine null state is
    distinguishable from the stream boundary. (A corpus whose event
    vocabulary literally contains '__start__' would merge with the
    boundary sentinel and lose those trigrams — rename upstream.)

    Scale shape: BOTH lags ride ONE user-partitioned window exchange,
    and the events are scanned exactly ONCE (plan-pinned): a single
    tiny aggregate keyed (t1, t2, t3) — stream-boundary steps carried
    under a '__start__' sentinel so the first-order model
    n2(b,c) = Σ_a n3(a,b,c) is derivable — feeds the trigram counts,
    the first-order model, and both denominators as window sums over
    |types|^3 rows. Branching tri/fo/fo_tot off the steps frame
    instead was measured to recompute the event-scale window sort
    three times.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1, got %r" % (min_count,))
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    ty = F.coalesce(F.col(type_col).cast("string"), F.lit("__null__"))
    steps = events.where(F.col(ts_col).isNotNull()).select(
        ty.alias("t3"),
        F.lag(ty, 1).over(w).alias("t2"),
        F.lag(ty, 2).over(w).alias("t1"),
    )
    base = (
        steps.where(F.col("t2").isNotNull())
        .groupBy(
            F.coalesce(F.col("t1"), F.lit("__start__")).alias("t1"),
            "t2",
            "t3",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_fo = Window.partitionBy("t2", "t3")
    w_fot = Window.partitionBy("t2")
    w_prefix = Window.partitionBy("t1", "t2")
    return (
        base.withColumn("n2", F.sum("n").over(w_fo))
        .withColumn("n2_tot", F.sum("n").over(w_fot))
        .withColumn("_prefix", F.sum("n").over(w_prefix))
        .where(F.col("t1") != "__start__")
        .withColumn(
            "expected_n",
            F.col("_prefix").cast("double")
            * F.col("n2")
            / F.col("n2_tot"),
        )
        .where(F.col("n") >= min_count)
        .select(
            "t1",
            "t2",
            "t3",
            F.col("n").cast("long").alias("n"),
            F.round("expected_n", 4).alias("expected_n"),
            F.round(F.col("n").cast("double") / F.col("expected_n"), 4)
            .alias("lift"),
        )
    )


def km_survival(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
) -> DataFrame:
    """Kaplan–Meier user-lifetime curve with right-censoring — the
    retention statistic :func:`retention-cohort` triangles cannot give
    honestly: a user whose last event is near the end of the
    observation window has not *churned*, they are CENSORED, and
    counting them as dead biases every naive retention ratio down.
    Lifetime = days between a user's first and last event; a user
    still active within ``censor_days`` of the global horizon (the max
    event date) is censored at their observed lifetime.  Per observed
    lifetime t: users at risk, deaths d (churned at t), censored c,
    and the K-M survival estimate Π_{t'≤t} (1 − d/n) — the probability
    a user survives past t days.

    Cross-engine determinism: lifetimes are exact calendar-day diffs on
    DATE values (timezone-free for NTZ timestamps); n/d/c are exact
    BIGINTs; each factor is one IEEE division and the survival product
    is a LEFT FOLD in ascending-t order (F.aggregate over the sorted
    factor array here, a recursive-CTE running product in the oracle —
    identical operation sequence), rounded once at the end.

    Scale shape: ONE ``groupBy(user)`` exchange builds the per-user
    (first, last) frame; everything after runs on |distinct lifetimes|
    rows (≤ observation-window days — hundreds, not 10^12): a tiny
    aggregate, one broadcast horizon row, and a single-row sorted
    factor array cross-joined back.  No corpus-side window, no Python.
    """
    if censor_days < 0:
        raise ValueError("km_survival: censor_days must be >= 0")
    users = (
        df.where(F.col(ts_col).isNotNull())
        .select(
            F.coalesce(F.col(user_col).cast("string"), F.lit("__null__"))
            .alias("_u"),
            F.to_date(F.col(ts_col)).alias("_d"),
        )
        .groupBy("_u")
        .agg(F.min("_d").alias("first_d"), F.max("_d").alias("last_d"))
    )
    horizon = users.agg(F.max("last_d").alias("_h"))
    per_user = users.crossJoin(F.broadcast(horizon)).select(
        F.datediff(F.col("last_d"), F.col("first_d")).alias("t"),
        (
            F.datediff(F.col("_h"), F.col("last_d")) < F.lit(censor_days)
        ).alias("_cens"),
    )
    curve = per_user.groupBy("t").agg(
        F.sum(F.when(~F.col("_cens"), 1).otherwise(0))
        .cast("long")
        .alias("d"),
        F.sum(F.when(F.col("_cens"), 1).otherwise(0))
        .cast("long")
        .alias("c"),
    )
    w = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy()
    ranked = curve.select(
        "t",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(wt)
            - F.sum(F.col("d") + F.col("c")).over(w)
            + (F.col("d") + F.col("c"))
        )
        .cast("long")
        .alias("n_at_risk"),
    )
    factor = F.lit(1.0) - F.col("d").cast("double") / F.col(
        "n_at_risk"
    ).cast("double")
    facts = ranked.select(
        "t", "d", "c", "n_at_risk", factor.alias("_f")
    )
    arr = facts.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("t"), F.col("_f")))
        ).alias("_arr")
    )
    return (
        facts.crossJoin(F.broadcast(arr))
        .select(
            "t",
            "n_at_risk",
            "d",
            "c",
            F.round(
                F.aggregate(
                    F.filter(
                        F.col("_arr"), lambda x: x["t"] <= F.col("t")
                    ),
                    F.lit(1.0),
                    lambda a, x: a * x["_f"],
                ),
                6,
            ).alias("survival"),
        )
    )
