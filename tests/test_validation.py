"""validate() dispatch + method surface (SURVEY.md §2.6 V1–V12, §3.1;
ref tests/test_validation.py). Hand-derived truth tables are the spec."""

import re

import pytest

from datatest_spark import (
    Deviation,
    Extra,
    Invalid,
    Missing,
    ValidationError,
    valid,
    validate,
)


@pytest.fixture(autouse=True)
def _spark(spark):
    # ensure an active session for python-data normalization
    return spark


class TestDispatch:
    def test_set_requirement(self):
        with pytest.raises(ValidationError) as exc:
            validate(["a", "b", "x"], {"a", "b", "c"})
        diffs = set(exc.value.differences)
        assert diffs == {Extra("x"), Missing("c")}

    def test_scalar_requirement_strings(self):
        with pytest.raises(ValidationError) as exc:
            validate(["ok", "ok", "bad"], "ok")
        assert exc.value.differences == [Invalid("bad")]

    def test_scalar_requirement_numeric_deviation(self):
        with pytest.raises(ValidationError) as exc:
            validate([10, 12, 10], 10)
        assert exc.value.differences == [Deviation(2, 10)]

    def test_type_requirement(self):
        with pytest.raises(ValidationError) as exc:
            validate(["5", "x"], int)
        assert exc.value.differences == [Invalid("x")]

    def test_regex_requirement(self):
        with pytest.raises(ValidationError) as exc:
            validate(["foo1", "bar2"], re.compile(r"^foo"))
        assert exc.value.differences == [Invalid("bar2")]

    def test_callable_requirement(self):
        with pytest.raises(ValidationError) as exc:
            validate([2, 4, 5], lambda x: x % 2 == 0)
        assert exc.value.differences == [Invalid(5)]

    def test_callable_returning_difference(self):
        def check(v):
            if v < 0:
                return Invalid(v, expected=0)
            return True

        with pytest.raises(ValidationError) as exc:
            validate([1, -3], check)
        assert exc.value.differences == [Invalid(-3, 0)]

    def test_tuple_requirement_rows(self):
        data = [("a", 1), ("b", 9)]
        with pytest.raises(ValidationError) as exc:
            validate(data, (str, lambda x: x < 5))
        [d] = exc.value.differences
        assert isinstance(d, Invalid)

    def test_mapping_requirement_scalars(self):
        data = {"A": 10, "B": 7}
        with pytest.raises(ValidationError) as exc:
            validate(data, {"A": 10, "B": 5})
        assert exc.value.differences == {"B": [Deviation(2, 5)]}

    def test_mapping_requirement_sets(self):
        data = {"A": ["x", "y"], "B": ["x", "q"]}
        with pytest.raises(ValidationError) as exc:
            validate(data, {"A": {"x", "y"}, "B": {"x", "y"}})
        diffs = exc.value.differences
        assert set(diffs.keys()) == {"B"}
        assert set(diffs["B"]) == {Extra("q"), Missing("y")}

    def test_mapping_missing_required_key_numeric(self):
        data = {"A": 10}
        with pytest.raises(ValidationError) as exc:
            validate(data, {"A": 10, "B": 5})
        assert exc.value.differences == {"B": [Deviation(-5, 5)]}

    def test_mapping_extra_data_key(self):
        data = {"A": "x", "B": "y"}
        with pytest.raises(ValidationError) as exc:
            validate(data, {"A": "x"})
        assert exc.value.differences == {"B": [Extra("y")]}

    def test_passing_data_raises_nothing(self):
        validate(["a", "b"], {"a", "b"})
        validate([1, 1, 1], 1)

    def test_description_carried(self):
        with pytest.raises(ValidationError) as exc:
            validate([1, 2], 1, description="must be one")
        assert exc.value.description == "must be one"


class TestDataFrameInputs:
    def test_single_column_df(self, spark):
        df = spark.createDataFrame([("a",), ("x",)], ["v"])
        with pytest.raises(ValidationError) as exc:
            validate(df, {"a", "b"})
        assert set(exc.value.differences) == {Extra("x"), Missing("b")}

    def test_multi_column_tuple_predicate(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "zz")], ["x", "y"])
        with pytest.raises(ValidationError) as exc:
            validate(df, (..., {"a", "b"}))
        assert len(exc.value.differences) == 1

    def test_grouped_df_mapping(self, spark):
        df = spark.createDataFrame(
            [("A", 10), ("A", 10), ("B", 7)], ["key", "val"]
        )
        with pytest.raises(ValidationError) as exc:
            validate(df, {"A": 10, "B": 5}, group_col="key")
        assert exc.value.differences == {"B": [Deviation(2, 5)]}

    def test_string_column_keeps_string_args(self, spark):
        df = spark.createDataFrame([("5",), ("7",)], ["v"])
        with pytest.raises(ValidationError) as exc:
            validate(df, "5")
        assert exc.value.differences == [Invalid("7")]


class TestMethods:
    def test_predicate(self):
        with pytest.raises(ValidationError):
            validate.predicate([1, 2], lambda v: v == 1)

    def test_regex_method(self):
        with pytest.raises(ValidationError) as exc:
            validate.regex(["a1", "bb"], r"\d")
        assert exc.value.differences == [Invalid("bb")]

    def test_approx_places(self):
        validate.approx([1.00000001], 1.0)
        with pytest.raises(ValidationError) as exc:
            validate.approx([1.2], 1.0)
        [d] = exc.value.differences
        assert isinstance(d, Deviation)
        assert abs(d.deviation - 0.2) < 1e-9

    def test_approx_delta(self):
        validate.approx([1.4], 1.0, delta=0.5)
        with pytest.raises(ValidationError):
            validate.approx([1.6], 1.0, delta=0.5)

    def test_fuzzy(self):
        validate.fuzzy(["kitten"], "sitten", cutoff=0.6)
        with pytest.raises(ValidationError) as exc:
            validate.fuzzy(["abcdef"], "zzzzzz", cutoff=0.6)
        assert exc.value.differences == [Invalid("abcdef", "zzzzzz")]

    def test_interval(self):
        with pytest.raises(ValidationError) as exc:
            validate.interval([5, 15, 25], min=10, max=20)
        assert set(exc.value.differences) == {Deviation(-5, 10), Deviation(5, 20)}

    def test_interval_one_sided(self):
        with pytest.raises(ValidationError) as exc:
            validate.interval([5, 15], min=10)
        assert exc.value.differences == [Deviation(-5, 10)]

    def test_set_methods(self):
        with pytest.raises(ValidationError) as exc:
            validate.subset(["a", "x"], {"a", "b"})
        assert exc.value.differences == [Extra("x")]  # subset: data ⊆ req
        with pytest.raises(ValidationError) as exc:
            validate.superset(["a"], {"a", "b"})
        assert exc.value.differences == [Missing("b")]  # superset: data ⊇ req

    def test_unique(self):
        with pytest.raises(ValidationError) as exc:
            validate.unique(["a", "b", "a", "a"])
        assert exc.value.differences == [Extra("a"), Extra("a")]

    def test_order(self):
        with pytest.raises(ValidationError) as exc:
            validate.order(["a", "X", "c"], ["a", "b", "c"])
        diffs = set(repr(d) for d in exc.value.differences)
        # positional alignment: index 1 mismatch -> Extra + Missing pair
        assert any("extra" in d.lower() for d in diffs)
        assert any("missing" in d.lower() for d in diffs)

    def test_valid_bool(self):
        assert valid(["a"], {"a"}) is True
        assert valid(["a", "x"], {"a"}) is False

    def test_valid_honors_columns_kwarg(self, spark):
        """ADVICE regression: valid() must scope to columns= the same way
        validate() does instead of silently validating all columns."""
        df = spark.createDataFrame([("a", "zzz"), ("b", "zzz")], ["good", "bad"])
        assert valid(df, {"a", "b"}, columns="good") is True
        assert valid(df, {"a", "b"}, columns=["good"]) is True
        assert valid(df, {"a", "b"}, columns="bad") is False


class TestFuzzyNativeApproximation:
    """The documented native levenshtein approximation tracks difflib on
    typical strings (exactness not claimed — SURVEY V5)."""

    def test_close_strings_agree(self, spark):
        from pyspark.sql import functions as F

        from datatest_spark.functions.fuzzy import fuzzy_ratio_native, fuzzy_ratio_py

        pairs = [("kitten", "sitting"), ("abc", "abc"), ("abc", "xyz")]
        df = spark.createDataFrame(pairs, ["a", "b"])
        rows = df.select(
            "a", "b", fuzzy_ratio_native(F.col("a"), F.col("b")).alias("r")
        ).collect()
        for r in rows:
            exact = fuzzy_ratio_py(r["a"], r["b"])
            assert abs(r["r"] - exact) < 0.35


class TestOrderDifflibParity:
    """Python-sequence order checks use the reference's difflib
    alignment: (index, value) two-tuples from opcodes."""

    def test_replace(self):
        with pytest.raises(ValidationError) as exc:
            validate.order(["a", "X", "c"], ["a", "b", "c"])
        assert set(exc.value.differences) == {Extra((1, "X")), Missing((1, "b"))}

    def test_delete_is_extra(self):
        with pytest.raises(ValidationError) as exc:
            validate.order(["a", "b", "c"], ["a", "c"])
        assert exc.value.differences == [Extra((1, "b"))]

    def test_insert_is_missing_at_data_index(self):
        with pytest.raises(ValidationError) as exc:
            validate.order(["a", "c"], ["a", "b", "c"])
        assert exc.value.differences == [Missing((1, "b"))]

    def test_alignment_not_positional(self):
        # one missing element early must NOT cascade mismatches
        with pytest.raises(ValidationError) as exc:
            validate.order(["b", "c", "d"], ["a", "b", "c", "d"])
        assert exc.value.differences == [Missing((0, "a"))]

    def test_equal_sequences_pass(self):
        validate.order(["a", "b"], ["a", "b"])


class TestReviewRegressions:
    """Regressions from the round-1 code review (adapter crashes and
    silent-pass paths)."""

    def test_nan_deviation_raises_validation_error(self):
        with pytest.raises(ValidationError) as exc:
            validate([float("nan")], 5.0)
        [d] = exc.value.differences
        assert isinstance(d, Deviation)

    def test_interval_with_null_value(self, spark):
        df = spark.createDataFrame([(5,), (None,)], "v int")
        with pytest.raises(ValidationError) as exc:
            validate.interval(df, min=1, max=3)
        kinds = {type(d).__name__ for d in exc.value.differences}
        assert kinds == {"Deviation", "Invalid"}

    def test_null_vs_zero_expected(self, spark):
        df = spark.createDataFrame([(None,), (0,)], "v int")
        with pytest.raises(ValidationError) as exc:
            validate(df, 0)
        assert exc.value.differences == [Invalid(None, 0)]

    def test_type_requirement_rejects_null(self, spark):
        df = spark.createDataFrame([(None,), ("5",)], "v string")
        with pytest.raises(ValidationError) as exc:
            validate(df, int)
        assert exc.value.differences == [Invalid(None)]


class TestReviewRegressionsR2:
    """Regressions from the round-2 code review (negation/NaN handling in
    callable predicates, zero-expected mapping rows, order-check
    null-vs-absent conflation, id_col in uniqueness grouping)."""

    def test_negated_callable_predicate_distributed(self, spark):
        from datatest_spark.predicates import Predicate

        df = spark.createDataFrame([("a",), ("b",)], "v string")
        with pytest.raises(ValidationError) as exc:
            validate(df, ~Predicate(lambda v: v == "a"))
        assert exc.value.differences == [Invalid("a")]

    def test_difference_returning_callable_distributed(self, spark):
        def check(v):
            return Invalid(v, "want") if v != "ok" else True

        df = spark.createDataFrame([("ok",), ("bad",)], "v string")
        with pytest.raises(ValidationError) as exc:
            validate(df, check)
        assert exc.value.differences == [Invalid("bad", "want")]

    def test_callable_sees_none_not_nan(self, spark):
        # Arrow hands numeric nulls to the UDF as NaN; the reference
        # callable contract is Python None for missing values
        df = spark.createDataFrame([(1.0,), (None,)], "v double")
        with pytest.raises(ValidationError) as exc:
            validate(df, lambda v: v is None)
        assert exc.value.differences == [Invalid(1.0)]

    def test_mapping_null_value_zero_expected(self, spark):
        df = spark.createDataFrame([("a", None), ("b", 2)], "k string, v int")
        with pytest.raises(ValidationError) as exc:
            validate(df, {"a": 0, "b": 2})
        assert exc.value.differences == {"a": [Invalid(None, 0)]}

    def test_mapping_absent_key_zero_expected(self, spark):
        df = spark.createDataFrame([("a", 1)], "k string, v int")
        with pytest.raises(ValidationError) as exc:
            validate(df, {"a": 1, "c": 0})
        assert exc.value.differences == {"c": [Missing(0)]}

    def test_order_null_value_is_extra_not_dropped(self, spark):
        df = spark.createDataFrame(
            [(0, "a"), (1, None)], "ord int, v string"
        )
        with pytest.raises(ValidationError) as exc:
            validate.order(df, ["a"], order_by="ord")
        assert exc.value.differences == [Extra('{"index":1,"value":null}')]

    def test_order_null_matches_null(self, spark):
        df = spark.createDataFrame(
            [(0, "a"), (1, None)], "ord int, v string"
        )
        validate.order(df, ["a", None], order_by="ord")  # no raise

    def test_unique_ignores_id_col(self, spark):
        df = spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, "y")], "id int, v string"
        )
        with pytest.raises(ValidationError) as exc:
            validate.unique(df, id_col="id")
        assert exc.value.differences == [Extra("x")]

    def test_negated_difference_returning_callable_still_violates(self, spark):
        # driver oracle: bool(difference) is truthy, so ~P yields False —
        # a violation, reported as generic Invalid (not silently accepted)
        from datatest_spark.predicates import Predicate

        def check(v):
            return Invalid(v, "want") if v != "ok" else True

        df = spark.createDataFrame([("ok",), ("bad",)], "v string")
        with pytest.raises(ValidationError) as exc:
            validate(df, ~Predicate(check))
        assert set(exc.value.differences) == {Invalid("ok"), Invalid("bad")}

    def test_negated_raising_callable_still_violates(self, spark):
        from datatest_spark.predicates import Predicate

        df = spark.createDataFrame([("abc",), ("7",)], "v string")
        with pytest.raises(ValidationError) as exc:
            validate(df, ~Predicate(lambda v: int(v) > 5))
        assert set(exc.value.differences) == {Invalid("abc"), Invalid("7")}

    def test_order_ignores_id_col(self, spark):
        df = spark.createDataFrame(
            [(10, 0, "a"), (11, 1, "b")], "doc_id int, ord int, v string"
        )
        validate.order(df, ["a", "b"], order_by="ord", id_col="doc_id")


class TestTemporalPredicates:
    """Date/timestamp columns through the predicate/interval paths —
    pinned so the Column compiler keeps handling temporal literals
    (violation rows stringify values; VIOLATION_SCHEMA is string-typed)."""

    def test_date_equality(self, spark):
        import datetime

        df = spark.createDataFrame(
            [(datetime.date(2024, 1, 1),), (datetime.date(2024, 1, 2),)], "d date"
        )
        with pytest.raises(ValidationError) as exc:
            validate(df, datetime.date(2024, 1, 1))
        assert exc.value.differences == [Invalid("2024-01-02")]

    def test_date_set_membership(self, spark):
        import datetime

        df = spark.createDataFrame(
            [(datetime.date(2024, 1, 1),), (datetime.date(2024, 1, 2),)], "d date"
        )
        validate(df, {datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)})

    def test_timestamp_interval_nonnumeric_invalid(self, spark):
        import datetime

        df = spark.createDataFrame(
            [(datetime.datetime(2024, 1, 1, 12),),
             (datetime.datetime(2024, 6, 1, 12),)], "t timestamp"
        )
        with pytest.raises(ValidationError) as exc:
            validate.interval(
                df, min=datetime.datetime(2024, 1, 1),
                max=datetime.datetime(2024, 3, 1),
            )
        # timestamps have no numeric deviation: out-of-range rows surface
        # as Invalid(value, expected=<violated bound>)
        [d] = exc.value.differences
        assert isinstance(d, Invalid) and d.args[0].startswith("2024-06-01")
