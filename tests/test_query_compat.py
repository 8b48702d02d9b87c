"""Legacy Select/Query layer + compat shims (SURVEY §2.2-2.4, §3.3, S6,
F7, X1): container-shape conventions of the reference, compiled to
DataFrame plans."""

import os

import pytest
from pyspark.sql import functions as F

from datatest_spark.compat import DataTestCase, RepeatingContainer, working_directory
from datatest_spark.query import Select
from datatest_spark.sources.io import Catalog, read_csv


@pytest.fixture(scope="module")
def sel(spark):
    df = spark.createDataFrame(
        [("x", "a", 10), ("x", "b", 20), ("y", "a", 30), ("y", "a", 5)],
        ["grp", "tag", "val"],
    )
    return Select(df)


class TestSelectShapes:
    def test_scalar_selection_list_of_values(self, sel):
        assert sorted(sel("val").fetch()) == [5, 10, 20, 30]

    def test_list_selection_list_rows(self, sel):
        rows = sel(["grp", "val"]).fetch()
        assert [r for r in rows if r == ["x", 10]]
        assert all(isinstance(r, list) for r in rows)

    def test_tuple_selection_tuple_rows(self, sel):
        rows = sel(("grp", "val")).fetch()
        assert ("y", 30) in rows
        assert all(isinstance(r, tuple) for r in rows)

    def test_mapping_selection_groups(self, sel):
        out = sel({"grp": "val"}).fetch()
        assert sorted(out["x"]) == [10, 20]
        assert sorted(out["y"]) == [5, 30]

    def test_composite_key(self, sel):
        out = sel({("grp", "tag"): "val"}).fetch()
        assert out[("y", "a")] == [30, 5] or sorted(out[("y", "a")]) == [5, 30]

    def test_where_kwargs_with_predicate(self, sel):
        assert sorted(sel("val", grp="x").fetch()) == [10, 20]
        assert sorted(sel("val", tag={"a"}).fetch()) == [5, 10, 30]

    def test_fieldnames(self, sel):
        assert sel.fieldnames == ["grp", "tag", "val"]


class TestQueryOps:
    def test_grouped_sum(self, sel):
        assert sel({"grp": "val"}).sum().fetch() == {"x": 30, "y": 35}

    def test_grouped_avg_min_max_count(self, sel):
        assert sel({"grp": "val"}).avg().fetch() == {"x": 15.0, "y": 17.5}
        assert sel({"grp": "val"}).min().fetch() == {"x": 10, "y": 5}
        assert sel({"grp": "val"}).max().fetch() == {"x": 20, "y": 30}
        assert sel({"grp": "val"}).count().fetch() == {"x": 2, "y": 2}

    def test_whole_sum(self, sel):
        assert sel("val").sum().fetch() == 65

    def test_distinct(self, sel):
        assert sorted(sel("tag").distinct().fetch()) == ["a", "b"]

    def test_post_map_filter(self, sel):
        out = sel("val").map(lambda v: v * 2).filter(lambda v: v > 20).fetch()
        assert sorted(out) == [40, 60]

    def test_apply_and_unwrap(self, sel):
        assert sel("val", grp="x", tag={"b"}).unwrap().fetch() == 20
        assert sel("val").apply(len).fetch() == 4

    def test_flatten(self, sel):
        flat = sel({"grp": "val"}).flatten().fetch()
        assert ("x", 10) in flat and len(flat) == 4

    def test_reduce(self, sel):
        assert sel("val").reduce(lambda a, b: a + b).fetch() == 65

    def test_to_df_is_plan(self, sel):
        df = sel({"grp": "val"}).sum().to_df()
        assert df.columns == ["grp", "val"]


class TestIO:
    def test_csv_roundtrip(self, spark, tmp_path, sel):
        p = str(tmp_path / "t.csv")
        sel._df.write.mode("overwrite").option("header", True).csv(p)
        back = read_csv(spark, p)
        assert sorted(back.columns) == ["grp", "tag", "val"]
        assert back.count() == 4
        s2 = Select(p + "/", spark=spark) if False else Select(back)
        assert sorted(s2("val").fetch()) == [5, 10, 20, 30]

    def test_orc_roundtrip(self, spark, tmp_path, sel):
        from datatest_spark.sources.io import read_orc

        p = str(tmp_path / "t.orc")
        sel._df.write.mode("overwrite").orc(p)
        back = read_orc(spark, p)
        assert sorted(back.columns) == ["grp", "tag", "val"]
        assert back.count() == 4
        # path-suffix dispatch: the .orc directory routes to the orc reader
        s2 = Select(p, spark=spark)
        assert sorted(s2("val").fetch()) == [5, 10, 20, 30]

    def test_catalog_partitioned_roundtrip(self, spark, tmp_path):
        from datatest_spark.sources.synth import tokenized_sequences

        cat = Catalog(spark, str(tmp_path / "wh"))
        df = tokenized_sequences(spark, 300, seed=9)
        cat.write(df, "seqs", partition_by=("source",))
        back = cat.read("seqs")
        assert back.count() == 300
        parts = cat.partitions("seqs")
        assert any(p.startswith("source=") for p in parts)
        assert cat.snapshot_id("seqs")

    def test_iceberg_gated(self, spark, tmp_path):
        from datatest_spark.sources.io import has_iceberg

        if not has_iceberg(spark):
            with pytest.raises(RuntimeError):
                Catalog(spark, "wh", format="iceberg")


class TestCompat:
    def test_working_directory(self, tmp_path):
        prev = os.getcwd()
        with working_directory(str(tmp_path)):
            assert os.getcwd() == str(tmp_path)
        assert os.getcwd() == prev

    def test_repeating_container(self, sel):
        pair = RepeatingContainer([sel, sel])
        a, b = pair("val").sum().fetch()
        assert a == b == 65

    def test_datatestcase_shim(self, spark):
        import unittest

        class T(DataTestCase):
            def runTest(self):
                self.assertValid(["a", "b"], {"a", "b"})
                with self.accepted(__import__("datatest_spark").Extra("x")):
                    self.assertValid(["a", "x"], {"a"})

        r = unittest.TestResult()
        T().run(r)
        assert r.wasSuccessful(), r.errors or r.failures


class TestQueryOpOrdering:
    """Chain order is honored: pre-agg filters apply to the plan."""

    def test_filter_before_sum(self, sel):
        assert sel("val").filter(lambda v: v > 15).sum().fetch() == 50

    def test_filter_before_grouped_sum(self, sel):
        out = sel({"grp": "val"}).filter(lambda v: v >= 10).sum().fetch()
        assert out == {"x": 30, "y": 30}

    def test_distinct_before_sum(self, spark):
        from datatest_spark.query import Select

        s = Select(spark.createDataFrame([("a", 5), ("a", 5), ("a", 7)], ["g", "v"]))
        assert s("v").distinct().sum().fetch() == 12

    def test_map_before_agg_rejected(self, sel):
        with pytest.raises(NotImplementedError):
            sel("val").map(lambda v: v * 2).sum().fetch()

    def test_filter_after_agg_applies_to_result(self, sel):
        out = sel({"grp": "val"}).sum().flatten().filter(lambda kv: kv[1] > 30).fetch()
        assert out == [("y", 35)]


class TestToDfCompilesOps:
    """Round-2 review regression: to_df() must apply relationally-
    expressible chained ops instead of silently dropping them."""

    def test_filter_applied(self, sel):
        rows = sel("val").filter(lambda v: v > 10).to_df().collect()
        assert sorted(r["val"] for r in rows) == [20, 30]

    def test_distinct_applied(self, sel):
        rows = sel("tag").distinct().to_df().collect()
        assert sorted(r["tag"] for r in rows) == ["a", "b"]

    def test_grouped_agg_applied(self, sel):
        rows = sel({"grp": "val"}).sum().to_df().collect()
        assert {r["grp"]: r["val"] for r in rows} == {"x": 30, "y": 35}

    def test_driver_only_op_rejected(self, sel):
        with pytest.raises(NotImplementedError):
            sel("val").map(lambda v: v + 1).to_df()

    def test_post_agg_filter_rejected(self, sel):
        with pytest.raises(NotImplementedError):
            sel("val").sum().filter(lambda v: v > 10).to_df()


class TestPostFilterShapes:
    """Round-2 review regression: fetch-side filter after an aggregation
    must handle scalar and dict-of-scalar results (it crashed with
    TypeError before)."""

    def test_scalar_kept(self, sel):
        assert sel("val").sum().filter(lambda v: v > 10).fetch() == 65

    def test_scalar_dropped_to_none(self, sel):
        assert sel("val").sum().filter(lambda v: v > 100).fetch() is None

    def test_dict_of_scalars_drops_entries(self, sel):
        out = sel({"grp": "val"}).sum().filter(lambda v: v > 30).fetch()
        assert out == {"y": 35}


class TestReaderOptsForwarding:
    """Review regression: the .orc/.parquet Select branches dropped
    **reader_opts on the floor."""

    def test_orc_merge_schema_option_reaches_reader(self, spark, tmp_path):
        p = str(tmp_path / "ms.orc")
        spark.createDataFrame([(1,)], "a int").write.orc(p)
        spark.createDataFrame([(2, 3)], "a int, b int").write.mode(
            "append"
        ).orc(p)
        merged = Select(p, spark=spark, mergeSchema="true")
        assert "b" in merged.fieldnames
