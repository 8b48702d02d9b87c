"""Difference-class invariants (SURVEY.md §2.8 D1–D5; ref tests/test_differences.py).

Pure-Python — no Spark session needed. The truth tables here are the spec
(SURVEY.md §0.4): they pin the reference semantics the engine reproduces.
"""

import math

import pytest

from datatest_spark.differences import (
    Deviation,
    Extra,
    Invalid,
    Missing,
    NOVALUE,
    ValidationError,
)


class TestEqualityByClassAndArgs:
    def test_equal_same_class_args(self):
        assert Missing("a") == Missing("a")
        assert Extra(1) == Extra(1)
        assert Invalid("x") == Invalid("x")
        assert Invalid("x", "y") == Invalid("x", "y")
        assert Deviation(1, 10) == Deviation(1, 10)

    def test_unequal_across_classes(self):
        assert Missing("a") != Extra("a")
        assert not (Missing("a") == Extra("a"))

    def test_unequal_args(self):
        assert Missing("a") != Missing("b")
        assert Invalid("x") != Invalid("x", "y")
        assert Deviation(1, 10) != Deviation(2, 10)

    def test_hashable(self):
        assert len({Missing("a"), Missing("a"), Extra("a")}) == 2

    def test_nan_aware_equality(self):
        assert Deviation(float("nan"), 10) == Deviation(float("nan"), 10)
        assert Missing(float("nan")) == Missing(float("nan"))


class TestArgs:
    def test_args_tuples(self):
        assert Missing("a").args == ("a",)
        assert Extra(2).args == (2,)
        assert Invalid("x").args == ("x",)
        assert Invalid("x", "y").args == ("x", "y")
        assert Deviation(-1, 7).args == (-1, 7)

    def test_invalid_expected_accessors(self):
        assert Invalid("x", "y").invalid == "x"
        assert Invalid("x", "y").expected == "y"
        assert Invalid("x").expected is NOVALUE

    def test_deviation_accessors(self):
        d = Deviation(2, 10)
        assert d.deviation == 2
        assert d.expected == 10


class TestReprRoundTrip:
    def test_repr(self):
        assert repr(Missing("a")) == "Missing('a')"
        assert repr(Extra(1)) == "Extra(1)"
        assert repr(Invalid("x")) == "Invalid('x')"
        assert repr(Invalid("x", "y")) == "Invalid('x', expected='y')"
        assert repr(Deviation(1, 10)) == "Deviation(+1, 10)"
        assert repr(Deviation(-1, 10)) == "Deviation(-1, 10)"

    def test_repr_evals_back(self):
        for d in [Missing("a"), Extra(1), Invalid("x"), Deviation(-2, 9)]:
            assert eval(repr(d)) == d


class TestDeviationConstruction:
    def test_zero_deviation_rejected(self):
        with pytest.raises(ValueError):
            Deviation(0, 10)

    def test_none_deviation_with_numeric_expected_rejected(self):
        with pytest.raises(ValueError):
            Deviation(None, 10)

    def test_nonnumeric_rejected(self):
        with pytest.raises(ValueError):
            Deviation("x", 10)
        with pytest.raises(ValueError):
            Deviation(1, "x")

    def test_nan_deviation_allowed(self):
        d = Deviation(float("nan"), 10)
        assert math.isnan(d.deviation)

    def test_empty_expected_cases(self):
        # empty-vs-number (NOVALUE) cases: Deviation(+x, None) and
        # Deviation(-e, e) are both constructible.
        assert Deviation(5, None).expected is None
        assert Deviation(-7, 7) == Deviation(-7, 7)

    def test_empty_expected_requires_numeric_deviation(self):
        with pytest.raises(ValueError):
            Deviation(None, None)
        with pytest.raises(ValueError):
            Deviation("x", None)


class TestValidationError:
    def test_list_differences(self):
        e = ValidationError([Missing("a"), Extra("b")], "check")
        assert e.differences == [Missing("a"), Extra("b")]
        assert e.description == "check"
        assert len(e) == 2

    def test_dict_differences(self):
        e = ValidationError({"g1": [Missing("a")], "g2": [Extra("b"), Extra("c")]})
        assert e.differences["g1"] == [Missing("a")]
        assert len(e) == 3

    def test_single_diff_normalized_to_list_in_dict(self):
        e = ValidationError({"g": Missing("a")})
        assert e.differences["g"] == [Missing("a")]

    def test_empty_rejected(self):
        with pytest.raises(ValueError):
            ValidationError([])

    def test_is_assertion_error(self):
        assert issubclass(ValidationError, AssertionError)

    def test_str_truncates(self):
        e = ValidationError([Missing(i) for i in range(50)], "many")
        s = str(e)
        assert "50 differences" in s
        assert s.count("Missing") <= ValidationError._TRUNCATE_AT + 1
