"""Property tests for the round-3 quality operators: hypothesis drives
random inputs through ONE Spark job per example and checks the result
against a plain-Python reference (semantic parity with small float
tolerance — bit-exactness is the DuckDB oracle gate's job)."""

import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F  # noqa: F401  (parity with sibling tests)

TOK = st.one_of(st.integers(min_value=0, max_value=9), st.none())
DOC = st.lists(TOK, min_size=0, max_size=20)


def _py_entropy(tokens):
    toks = [t for t in tokens if t is not None]
    n = len(toks)
    if n == 0:
        return (0, 0, None, None)
    counts = Counter(toks)
    s = 0.0
    for tok in sorted(counts):
        c = counts[tok]
        s += c * math.log2(c)
    return (
        n,
        len(counts),
        math.log2(n) - s / n,
        len(counts) / n,
    )


class TestTokenEntropyProperties:
    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(st.lists(DOC, min_size=1, max_size=15))
    def test_matches_python_reference(self, spark, docs):
        from datatest_spark.operators.text import token_entropy

        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(docs)],
            "doc_id long, tokens array<int>",
        )
        got = {r["doc_id"]: r for r in token_entropy(df).collect()}
        for i, d in enumerate(docs):
            n, k, h, ttr = _py_entropy(d)
            r = got[i]
            assert r["n_tokens"] == n
            assert r["n_distinct_tokens"] == k
            if h is None:
                assert r["entropy"] is None and r["ttr"] is None
            else:
                # operator rounds to 4 decimals; allow the half-ulp
                assert abs(r["entropy"] - h) <= 5.1e-5
                assert abs(r["ttr"] - ttr) <= 5.1e-5
                assert r["entropy"] >= -1e-9  # entropy is nonnegative
                # bound holds up to the output's 4-decimal rounding
                assert r["entropy"] <= math.log2(max(k, 1)) + 5.1e-5


class TestChi2Properties:
    @settings(max_examples=100, deadline=None)
    @given(
        st.dictionaries(st.integers(0, 6), st.integers(0, 50),
                        min_size=1, max_size=6),
    )
    def test_nonnegative_and_zero_on_self(self, counts):
        from datatest_spark.operators.drift import chi2_stat

        n = sum(counts.values())
        assert chi2_stat(counts, {}) >= 0.0
        if n > 0:
            q = {b: c / n for b, c in counts.items()}
            assert abs(chi2_stat(counts, q)) < 1e-6
        # monotone sanity: all mass moved to an unseen bucket is worse
        # than the self distribution
        if n > 0:
            q_self = {b: c / n for b, c in counts.items()}
            assert chi2_stat({99: n}, q_self) >= chi2_stat(counts, q_self)


class TestGroupSharesProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(st.lists(st.one_of(st.sampled_from("abcd"), st.none()),
                    min_size=1, max_size=40))
    def test_counts_order_and_cumulative(self, spark, groups):
        from datatest_spark.operators.stats import group_shares

        df = spark.createDataFrame([(g,) for g in groups], "s string")
        rows = group_shares(df, "s").collect()
        want = Counter("__null__" if g is None else g for g in groups)
        assert {r["group"]: r["n"] for r in rows} == dict(want)
        # ranked by n desc then group asc, ranks are 1..k
        keyed = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
        assert [r["group"] for r in sorted(rows, key=lambda r: r["rank"])] \
            == [g for g, _ in keyed]
        # cumulative share ends at 1.0 and is nondecreasing
        cums = [r["cum_share"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert abs(cums[-1] - 1.0) < 1e-9
        assert all(b >= a - 1e-12 for a, b in zip(cums, cums[1:]))


class TestUnigramLoglossProperties:
    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(st.lists(st.lists(st.integers(0, 5), min_size=1, max_size=12),
                    min_size=1, max_size=10))
    def test_self_model_reference(self, spark, docs):
        from datatest_spark.operators.text import unigram_logloss

        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(docs)],
            "doc_id long, tokens array<int>",
        )
        got = {r["doc_id"]: r for r in unigram_logloss(df).collect()}
        vocab = Counter(t for d in docs for t in d)
        total = sum(vocab.values())
        lp = {
            t: math.floor((math.log2(c) - math.log2(total)) * (1 << 20))
            for t, c in vocab.items()
        }
        for i, d in enumerate(docs):
            s = sum(lp[t] for t in d)
            want = (-float(s) / (1 << 20)) / len(d)
            r = got[i]
            assert r["n_oov"] == 0
            assert abs(r["bits_per_token"] - want) <= 5.1e-5
            # cross-entropy of the corpus model is nonnegative
            assert r["bits_per_token"] >= -1e-4
