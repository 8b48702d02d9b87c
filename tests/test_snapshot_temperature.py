"""snapshot_delta (corpus-version diff by distinct content) and
temperature_mixture_plan (alpha-scaled source sampling)."""

import pytest
from pyspark.sql import functions as F

from datatest_spark.operators.dedup import snapshot_delta
from datatest_spark.operators.packing import temperature_mixture_plan


@pytest.fixture(scope="module")
def snapshots(spark):
    old = spark.createDataFrame(
        [
            (1, "t1", "web"),
            (2, "t2", "web"),
            (3, "t9", "wiki"),
            (4, None, "web"),
        ],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [
            (10, "t2", "web"),
            (11, "t3", "web"),
            (12, "t3", "web"),  # refetched duplicate: ONE distinct content
            (13, "t9", "wiki"),
            (14, "t1", "wiki"),  # t1 moved web -> wiki: removed + added
        ],
        "doc_id long, text string, source string",
    )
    return old, new


def test_snapshot_delta_counts(snapshots):
    old, new = snapshots
    rows = {r["source"]: r for r in snapshot_delta(old, new).collect()}
    web = rows["web"]
    assert (web["n_old"], web["n_new"]) == (2, 2)
    assert web["n_added"] == 1      # t3 (once, despite two docs)
    assert web["n_removed"] == 1    # t1 left web
    assert web["n_common"] == 1     # t2
    wiki = rows["wiki"]
    assert (wiki["n_old"], wiki["n_new"]) == (1, 2)
    assert wiki["n_added"] == 1     # t1 arrived in wiki
    assert wiki["n_removed"] == 0
    assert wiki["n_common"] == 1    # t9


def test_snapshot_delta_hash_parity_and_null_source(snapshots, spark):
    old, new = snapshots
    md5 = sorted(map(tuple, snapshot_delta(old, new, hash_fn="md5").collect()))
    xx = sorted(map(tuple, snapshot_delta(old, new, hash_fn="xxhash64").collect()))
    assert md5 == xx
    nulls = spark.createDataFrame(
        [(1, "x", None)], "doc_id long, text string, source string"
    )
    out = snapshot_delta(nulls, nulls).collect()
    assert out[0]["source"] == "__null__" and out[0]["n_common"] == 1
    with pytest.raises(ValueError):
        snapshot_delta(old, new, hash_fn="sha1")


def test_temperature_shares(spark):
    df = spark.createDataFrame(
        [(i, "a", 100) for i in range(4)] + [(9, "b", 1600)],
        "doc_id long, source string, n_tok long",
    )
    # natural (alpha=1): a has 400 of 2000 tokens -> share 0.2
    nat = {r["source"]: r for r in
           temperature_mixture_plan(df, 1000, alpha=1.0).collect()}
    assert nat["a"]["share"] == pytest.approx(0.2)
    assert nat["a"]["target_tokens"] == 200
    assert nat["a"]["rate"] == pytest.approx(0.5)   # 200 / 400
    # uniform (alpha=0): both sources get half regardless of size
    uni = {r["source"]: r for r in
           temperature_mixture_plan(df, 1000, alpha=0.0).collect()}
    assert uni["a"]["share"] == uni["b"]["share"] == pytest.approx(0.5)
    # 0 < alpha < 1 sits between: the small source gains share
    # (w_a = sqrt(400) = 20, w_b = sqrt(1600) = 40 -> share_a = 1/3)
    mid = {r["source"]: r for r in
           temperature_mixture_plan(df, 1000, alpha=0.5).collect()}
    assert 0.2 < mid["a"]["share"] < 0.5
    assert mid["a"]["share"] == pytest.approx(1 / 3, abs=1e-6)
    assert mid["a"]["share"] + mid["b"]["share"] == pytest.approx(1.0)


def test_temperature_clamp_and_zero_source(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 0)],
        "doc_id long, source string, n_tok long",
    )
    rows = {r["source"]: r for r in
            temperature_mixture_plan(df, 100, alpha=0.7, max_rate=2.0).collect()}
    # b has zero available tokens: present, zero share, zero rate
    assert rows["b"]["available_tokens"] == 0
    assert rows["b"]["share"] == 0.0 and rows["b"]["rate"] == 0.0
    # a takes the whole budget but the rate clamps at 2.0
    assert rows["a"]["target_tokens"] == 100
    assert rows["a"]["rate"] == 2.0


def test_temperature_validation(spark):
    df = spark.createDataFrame(
        [(1, "a", 10)], "doc_id long, source string, n_tok long"
    )
    with pytest.raises(ValueError):
        temperature_mixture_plan(df, -1)
    with pytest.raises(ValueError):
        temperature_mixture_plan(df, 10, alpha=-0.1)
    with pytest.raises(ValueError):
        temperature_mixture_plan(df, 10, max_rate=0)
