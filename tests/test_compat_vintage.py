"""Vintage public-API surface: 0.9.x ``allowed_*`` aliases, ``@mandatory``
/ DataTestRunner (X3), DBAPI2 cursor sources (S3) and the Excel loader
dispatch (round-1 verdict gap list items 1–4)."""

import io
import sqlite3
import unittest

import pytest

from datatest_spark import (
    DataTestRunner,
    Deviation,
    Extra,
    Invalid,
    Missing,
    Select,
    ValidationError,
    allowed_deviation,
    allowed_extra,
    allowed_invalid,
    allowed_limit,
    allowed_missing,
    allowed_percent_deviation,
    allowed_specific,
    mandatory,
    validate,
)
from datatest_spark.sources.external import load_dbapi


class TestVintageAliases:
    def test_allowed_missing_extra_invalid(self):
        diffs = [Missing("a"), Extra("b"), Invalid("c")]
        assert allowed_missing().filter_differences(list(diffs)) == [
            Extra("b"), Invalid("c")
        ]
        assert allowed_extra().filter_differences(list(diffs)) == [
            Missing("a"), Invalid("c")
        ]
        assert allowed_invalid().filter_differences(list(diffs)) == [
            Missing("a"), Extra("b")
        ]

    def test_allowed_deviation(self):
        diffs = [Deviation(2, 10), Deviation(7, 10)]
        assert allowed_deviation(3).filter_differences(list(diffs)) == [
            Deviation(7, 10)
        ]
        # asymmetric lower/upper form
        assert allowed_deviation(-1, 7).filter_differences(list(diffs)) == []

    def test_allowed_percent_deviation(self):
        diffs = [Deviation(1, 10), Deviation(5, 10)]
        assert allowed_percent_deviation(0.2).filter_differences(list(diffs)) == [
            Deviation(5, 10)
        ]

    def test_allowed_specific_and_limit(self):
        diffs = [Missing("a"), Missing("a"), Extra("b")]
        # each listed instance absorbs at most one match
        assert allowed_specific([Missing("a")]).filter_differences(
            list(diffs)
        ) == [Missing("a"), Extra("b")]
        assert len(allowed_limit(2).filter_differences(list(diffs))) == 1

    def test_alias_composition_with_context_manager(self, spark):
        with allowed_missing() | allowed_extra():
            validate(["a", "x"], {"a", "b"})  # Missing('b') + Extra('x')
        with pytest.raises(ValidationError):
            with allowed_missing():
                validate(["a", "x"], {"a", "b"})


class TestMandatoryRunner:
    def _run(self, case_cls):
        suite = unittest.TestLoader().loadTestsFromTestCase(case_cls)
        runner = DataTestRunner(stream=io.StringIO(), verbosity=0)
        return runner.run(suite)

    def test_mandatory_failure_stops_run(self):
        executed = []

        class Suite(unittest.TestCase):
            @mandatory
            def test_a_gate(self):
                executed.append("gate")
                self.fail("schema gate failed")

            def test_b_later(self):
                executed.append("later")

        result = self._run(Suite)
        assert result.shouldStop
        assert executed == ["gate"]  # later test never ran

    def test_non_mandatory_failure_continues(self):
        executed = []

        class Suite(unittest.TestCase):
            def test_a_soft(self):
                executed.append("soft")
                self.fail("soft failure")

            def test_b_later(self):
                executed.append("later")

        result = self._run(Suite)
        assert not result.shouldStop
        assert executed == ["soft", "later"]


class TestDBAPI2Source:
    def test_select_from_sqlite_cursor(self, spark):
        con = sqlite3.connect(":memory:")
        con.executescript(
            "CREATE TABLE t (name TEXT, qty INTEGER);"
            "INSERT INTO t VALUES ('a', 1), ('b', 2), ('c', 3);"
        )
        cur = con.execute("SELECT name, qty FROM t ORDER BY name")
        sel = Select(cur, spark=spark)
        assert sel.fieldnames == ["name", "qty"]
        assert sel("qty").sum().execute() == 6

    def test_load_dbapi_batches_and_empty(self, spark):
        con = sqlite3.connect(":memory:")
        con.executescript(
            "CREATE TABLE t (x INTEGER);"
            + "".join(f"INSERT INTO t VALUES ({i});" for i in range(25))
        )
        cur = con.execute("SELECT x FROM t")
        df = load_dbapi(spark, cur, arraysize=7)  # several fetchmany batches
        assert df.count() == 25
        empty = load_dbapi(
            spark, con.execute("SELECT x FROM t WHERE x < 0"), schema="x int"
        )
        assert empty.count() == 0 and empty.dtypes == [("x", "int")]

    def test_load_dbapi_empty_with_nonidentifier_columns(self, spark):
        """Review finding: cursor names like COUNT(*) are not valid DDL —
        the empty-result fallback must build the StructType directly."""
        con = sqlite3.connect(":memory:")
        con.execute("CREATE TABLE t (x INTEGER)")
        cur = con.execute("SELECT COUNT(*), x FROM t WHERE 1=0 GROUP BY x")
        df = load_dbapi(spark, cur)
        assert df.count() == 0
        assert df.columns[0] == "COUNT(*)"

    def test_load_dbapi_requires_result_set(self, spark):
        con = sqlite3.connect(":memory:")
        cur = con.cursor()
        with pytest.raises(ValueError):
            load_dbapi(spark, cur)


class TestExcelDispatch:
    def test_xlsx_path_dispatches_to_excel_loader(self, spark, tmp_path):
        # openpyxl is absent in this container: the dispatch must reach
        # the Excel loader and surface the documented ImportError, not a
        # parquet/table fallback (plumbing real, optional dep gated)
        p = tmp_path / "book.xlsx"
        p.write_bytes(b"not a real workbook")
        with pytest.raises(ImportError, match="openpyxl"):
            Select(str(p), spark=spark)
