"""Adversarial hot-group fixtures for the window-based defaults
(r4 VERDICT Next #6): one group/shingle holds ~90% of all rows while
the window exec's in-memory buffer is capped at a few rows, forcing
the spillable-rows path. dense_rank/NTILE/row_number buffer partition
ROWS in an UnsafeExternalSorter (spills to disk); a collect_set frame
would materialize the whole hot set in memory instead. Completion +
correct values here is the spill-safety proof for the claims in
duplicate_spans, quality_bands(exact=True), and vocab_topk.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

HOT = 1800  # rows in the hot group (90%)
COLD = 200

_TIGHT = {
    # buffer at most 16 rows in memory before the window spills; both
    # thresholds govern ExternalAppendOnlyUnsafeRowArray inside
    # WindowExec — the exact buffer the scale claims are about
    "spark.sql.windowExecBufferInMemoryThreshold": "16",
    "spark.sql.windowExecBufferSpillThreshold": "16",
}


@pytest.fixture()
def tight_window_buffers(spark):
    old = {}
    for k, v in _TIGHT.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


class TestDuplicateSpansHotShingle:
    def test_license_header_shingle_spills_and_stays_correct(
        self, tight_window_buffers
    ):
        spark = tight_window_buffers
        from datatest_spark.operators.dedup import duplicate_spans

        # every doc opens with the same 3-gram (the "license header"):
        # ONE shingle holds all HOT docs, the per-doc tail is unique
        docs = spark.range(HOT).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.array(F.lit(1), F.lit(2), F.lit(3)),
                F.array((F.col("id") + 100).cast("int")),
            ).alias("tokens"),
        )
        out = duplicate_spans(docs, k=3, min_docs=2)
        rows = out.collect()
        assert len(rows) == HOT
        for r in rows:
            assert (r["span_start"], r["span_end"]) == (0, 3)
            assert r["n_windows"] == 1
            assert r["max_dup_docs"] == HOT

    def test_window_and_agg_strategies_agree_on_hot_fixture(
        self, tight_window_buffers
    ):
        spark = tight_window_buffers
        from datatest_spark.operators.dedup import duplicate_spans

        docs = spark.range(300).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.array(F.lit(7), F.lit(8), F.lit(9), F.lit(10)),
                F.array((F.col("id") % 5).cast("int")),
            ).alias("tokens"),
        )
        a = sorted(map(tuple, duplicate_spans(
            docs, k=3, min_docs=2, strategy="window").collect()))
        b = sorted(map(tuple, duplicate_spans(
            docs, k=3, min_docs=2, strategy="agg").collect()))
        assert a == b


class TestQualityBandsHotGroup:
    def test_exact_ntile_spills_and_band_sizes_stay_equal(
        self, tight_window_buffers
    ):
        spark = tight_window_buffers
        from datatest_spark.operators.stats import quality_bands

        df = spark.range(HOT).select(
            F.col("id").alias("doc_id"),
            F.lit("hot").alias("source"),
            F.col("id").cast("double").alias("score"),
        ).unionByName(
            spark.range(COLD).select(
                (F.col("id") + 10_000).alias("doc_id"),
                F.lit("cold").alias("source"),
                F.col("id").cast("double").alias("score"),
            )
        )
        out = quality_bands(df, "score", n_bands=10, exact=True)
        per_band = {
            (r["source"], r["band"]): r["n"]
            for r in out.groupBy("source", "band")
            .agg(F.count(F.lit(1)).alias("n")).collect()
        }
        for b in range(1, 11):
            assert per_band[("hot", b)] == HOT // 10
            assert per_band[("cold", b)] == COLD // 10
        rows = {r["doc_id"]: r["band"] for r in out.collect()
                if r["source"] == "hot"}
        assert rows[0] == 1 and rows[HOT - 1] == 10

    def test_approx_default_needs_no_window_on_hot_group(
        self, tight_window_buffers
    ):
        spark = tight_window_buffers
        from datatest_spark.operators.stats import quality_bands

        df = spark.range(HOT).select(
            F.col("id").alias("doc_id"),
            F.lit("hot").alias("source"),
            F.col("id").cast("double").alias("score"),
        )
        out = quality_bands(df, "score", n_bands=10)
        rows = {r["doc_id"]: r["band"] for r in out.collect()}
        assert rows[0] == 1 and rows[HOT - 1] == 10
        # distinct scores + divisible group: value bands == rank bands
        sizes = {}
        for b in rows.values():
            sizes[b] = sizes.get(b, 0) + 1
        assert set(sizes.values()) == {HOT // 10}


class TestVocabTopkHotGroup:
    def test_hot_group_topk_spills_and_stays_correct(
        self, tight_window_buffers
    ):
        spark = tight_window_buffers
        from datatest_spark.operators.text import vocab_topk

        # hot group: 5000 distinct tokens (token id i appears i+1 times
        # via count column exploded), so its window partition is 5000
        # rows against a 16-row buffer; cold group: 10 tokens
        hot = spark.range(5000).select(
            F.lit("hot").alias("source"),
            F.transform(
                F.sequence(F.lit(1), F.lit(3)),
                lambda i: F.col("id").cast("int"),
            ).alias("tokens"),
        )
        # make token ids 4990..4999 strictly dominant in 'hot'
        boost = spark.range(4990, 5000).select(
            F.lit("hot").alias("source"),
            F.transform(
                F.sequence(F.lit(1), F.lit(50)),
                lambda i: F.col("id").cast("int"),
            ).alias("tokens"),
        )
        cold = spark.range(10).select(
            F.lit("cold").alias("source"),
            F.array(F.col("id").cast("int")).alias("tokens"),
        )
        out = vocab_topk(hot.unionByName(boost).unionByName(cold), k=10)
        hot_top = sorted(
            r["token"] for r in out.collect() if r["group"] == "hot"
        )
        assert hot_top == list(range(4990, 5000))
        cold_top = sorted(
            r["token"] for r in out.collect() if r["group"] == "cold"
        )
        assert cold_top == list(range(10))
