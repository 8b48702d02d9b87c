"""DSIR-style importance weighting (text.hashed_bucket_model /
text.dsir_weights): hashed-bucket add-1 unigram models, fixed-point
importance log-ratios, map-only scoring."""

import pytest
from pyspark.sql import functions as F

from datatest_spark.operators.text import dsir_weights, hashed_bucket_model

B = 64


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, ["spark", "sql", "join", "agg"]),
        (2, ["spark", "sql", "window", "scan"]),
        (3, ["cat", "dog", "fish", "bird"]),
        (4, ["cat", "dog", "cow", "hen"]),
        (5, []),
        (6, ["spark", None, "sql"]),
    ]
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


@pytest.fixture(scope="module")
def target(spark):
    rows = [
        (101, ["spark", "sql", "agg", "scan"]),
        (102, ["spark", "sql", "join", "window"]),
    ]
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


def test_model_covers_every_bucket(corpus):
    m = hashed_bucket_model(corpus, n_buckets=B).collect()
    assert len(m) == B
    assert sorted(r["bucket"] for r in m) == list(range(B))
    # every bucket has finite mass (add-1 smoothing): lp is never null
    assert all(r["lp_fixed"] is not None for r in m)


def test_model_matches_duckdb_exactly(corpus):
    """The md5 bucket hash and the fixed-point log-prob formula must be
    bit-reproducible in DuckDB — that is what makes the driver oracle
    possible. Replicate the model in DuckDB and compare exactly."""
    import duckdb

    toks = [
        t
        for r in corpus.select("tokens").collect()
        if r["tokens"]
        for t in r["tokens"]
        if t is not None
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE tok (t VARCHAR)")
    con.executemany("INSERT INTO tok VALUES (?)", [(t,) for t in toks])
    duck = dict(
        con.execute(
            """
            WITH C AS (
                SELECT CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)
                       % {b} AS bucket, COUNT(*) AS c
                FROM tok GROUP BY 1
            ),
            D AS (SELECT CAST(r AS BIGINT) AS bucket
                  FROM range({b}) AS t(r)),
            T AS (SELECT COUNT(*) AS tt FROM tok)
            SELECT d.bucket,
                   CAST(FLOOR((log2(COALESCE(c.c, 0) + 1)
                               - log2(t.tt + {b})) * 1048576.0)
                        AS BIGINT)
            FROM D d LEFT JOIN C c USING (bucket), T t
            """.format(b=B)
        ).fetchall()
    )
    got = {
        r["bucket"]: r["lp_fixed"]
        for r in hashed_bucket_model(corpus, n_buckets=B).collect()
    }
    assert got == duck


def test_weights_rank_target_like_docs_higher(corpus, target):
    rows = {
        r["doc_id"]: r for r in dsir_weights(corpus, target, n_buckets=B).collect()
    }
    # docs 1-2 share the target vocabulary, docs 3-4 don't
    for hi in (1, 2):
        for lo in (3, 4):
            assert (
                rows[hi]["logratio_bits_per_token"]
                > rows[lo]["logratio_bits_per_token"]
            )
    # empty array: nothing to score -> 0 total, null per-token
    assert rows[5]["n_tokens"] == 0
    assert rows[5]["logratio_bits"] == 0.0
    assert rows[5]["logratio_bits_per_token"] is None
    # null elements are dropped, not scored
    assert rows[6]["n_tokens"] == 2


def test_weights_hash_fn_consistent(corpus, target):
    """xxhash64 and md5 bucketings differ, but each must be internally
    consistent: same ordering of clearly target-like vs off-target."""
    for fn in ("md5", "xxhash64"):
        rows = {
            r["doc_id"]: r
            for r in dsir_weights(
                corpus, target, n_buckets=B, hash_fn=fn
            ).collect()
        }
        assert (
            rows[1]["logratio_bits_per_token"]
            > rows[3]["logratio_bits_per_token"]
        )


def test_passthrough_and_validation(corpus, target):
    out = dsir_weights(
        corpus.withColumn("src", F.lit("a")),
        target,
        n_buckets=B,
        passthrough=("src",),
    )
    assert "src" in out.columns
    with pytest.raises(ValueError):
        hashed_bucket_model(corpus, n_buckets=1)
    with pytest.raises(ValueError):
        dsir_weights(corpus, target, hash_fn="sha1")


def test_scoring_is_map_only(corpus, target):
    """The corpus side must not shuffle: delta carrier is a literal
    array at B <= LM_LITERAL_MAX_ENTRIES, so the scored plan over the
    corpus has ZERO exchanges."""
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dsir_weights(corpus, target, n_buckets=B).explain(mode="formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
