"""Shared join idioms that encode the engine's broadcast discipline."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def required_minus_data(req_df: DataFrame, data_df: DataFrame, cols,
                        null_safe: bool = True) -> DataFrame:
    """required-minus-data with broadcast-only joins (semi-then-anti).

    A plain ``req ANTI data`` puts the small requirement table on the
    LEFT, and Spark can only broadcast the RIGHT side of a left_anti —
    the plan degrades to a sort-merge join that shuffles the data side's
    full distinct-value set. Instead: semi-join the data against the
    broadcast requirement (the matched set is bounded at |req| rows),
    then anti-join the requirement against that small matched set, which
    broadcasts. Zero wide shuffles.

    The matched set is ``distinct()``-ed here so the ≤|req|-row broadcast
    bound is intrinsic, not call-site etiquette: a caller passing raw
    (non-distinct) data would otherwise broadcast one matched row per
    DATA row. The distinct is cheap — its value space is bounded by |req|
    so partial aggregation collapses it map-side before the exchange.

    ``cols`` must exist on both inputs; ``null_safe`` picks eqNullSafe
    (set/sequence semantics: null ≈ null) vs plain equality (key-join
    semantics: null keys never align, matching the sibling inner/anti
    name-joins). The matched side is re-aliased (``_m_<col>``) so the
    requirement plan appearing in both branches cannot produce ambiguous
    attribute resolution.
    """
    def eq(a, b):
        return a.eqNullSafe(b) if null_safe else (a == b)

    cond = None
    for c in cols:
        e = eq(data_df[c], req_df[c])
        cond = e if cond is None else cond & e
    matched = (
        data_df.join(F.broadcast(req_df), cond, "left_semi")
        .select(*[F.col(c).alias("_m_" + c) for c in cols])
        .distinct()
    )
    mcond = None
    for c in cols:
        e = eq(req_df[c], F.col("_m_" + c))
        mcond = e if mcond is None else mcond & e
    return req_df.join(F.broadcast(matched), mcond, "left_anti").select(
        *req_df.columns
    )
