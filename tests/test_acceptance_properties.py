"""Property tests (SURVEY §5.2.1, §7.3.1): random difference multisets ×
random acceptance compositions — the driver-side filter and the
distributed filter must keep exactly the same rows, and absorption must
be deterministic. hypothesis generates the cases; Spark executes the
distributed side once per example (examples kept small)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datatest_spark import Deviation, Extra, Invalid, Missing, accepted
from datatest_spark.schema import VIOLATION_SCHEMA

VALUES = ["a", "b", "c"]


def diff_strategy():
    return st.one_of(
        st.sampled_from(VALUES).map(Missing),
        st.sampled_from(VALUES).map(Extra),
        st.sampled_from(VALUES).map(lambda v: Invalid(v, "exp")),
        st.sampled_from(VALUES).map(Invalid),  # one-arg form (arity matters)
        st.sampled_from([1, -1, 2, 5, -3]).map(lambda d: Deviation(d, 10)),
    )


def acceptance_strategy():
    leaf = st.one_of(
        st.sampled_from(VALUES).map(lambda v: accepted(Missing(v))),
        st.sampled_from(VALUES).map(lambda v: accepted(Invalid(v))),
        st.sampled_from(VALUES).map(lambda v: accepted(Invalid(v, "exp"))),
        st.sampled_from([Missing, Extra, Invalid, Deviation]).map(accepted),
        st.lists(diff_strategy(), min_size=1, max_size=3).map(accepted),
        st.sampled_from([1, 2, 3]).map(lambda t: accepted.tolerance(t)),
        st.sampled_from([0.1, 0.25, 0.5]).map(lambda p: accepted.percent(p)),
        st.sampled_from([0, 1, 3]).map(accepted.count),
    )
    return st.recursive(
        leaf,
        lambda inner: st.tuples(inner, inner, st.booleans()).map(
            lambda t: (t[0] | t[1]) if t[2] else (t[0] & t[1])
        ),
        max_leaves=3,
    )


def _rows(diffs):
    rows = []
    for i, d in enumerate(diffs):
        if isinstance(d, Deviation):
            rows.append(("r", "c", "deviation", None, None, str(i), None,
                         str(d.expected), float(d.deviation), None))
        else:
            expected = (
                str(d.args[1]) if isinstance(d, Invalid) and len(d.args) > 1 else None
            )
            rows.append(("r", "c", type(d).__name__.lower(), None, None, str(i),
                         str(d.args[0]), expected, None, None))
    return rows


@pytest.mark.spark
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(diffs=st.lists(diff_strategy(), min_size=1, max_size=8),
       acc=acceptance_strategy())
def test_distributed_equals_driver_side(spark, diffs, acc):
    try:
        remaining_drv = acc.filter_differences(list(diffs))
    except NotImplementedError:
        return
    vdf = spark.createDataFrame(_rows(diffs), VIOLATION_SCHEMA).repartition(3)
    try:
        remaining_dist = acc.apply(vdf).collect()
    except NotImplementedError:
        return  # '&' of two budgeted acceptances: driver-side only (documented)
    kept_dist = sorted(
        ((r["kind"], r["value"], r["expected"], r["deviation"])
         for r in remaining_dist), key=repr,
    )
    kept_drv = sorted(
        ((r[2], r[6], r[7], r[8]) for r in _rows(remaining_drv)), key=repr,
    )
    assert kept_dist == kept_drv


@settings(max_examples=200, deadline=None)
@given(diffs=st.lists(diff_strategy(), min_size=1, max_size=10),
       acc=acceptance_strategy())
def test_driver_side_filter_invariants(diffs, acc):
    remaining = acc.filter_differences(list(diffs))
    # no invention: remaining is a sub-multiset of the input
    pool = list(diffs)
    for d in remaining:
        assert d in pool
        pool.remove(d)
    # idempotence on a fresh acceptance: filtering the remainder with the
    # same composition never removes more than the original absorption
    again = acc.filter_differences(list(remaining))
    assert len(again) <= len(remaining)
