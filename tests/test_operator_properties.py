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


class TestHashSplitProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(
        st.lists(st.integers(min_value=0, max_value=10_000),
                 min_size=1, max_size=40, unique=True),
        st.lists(st.floats(min_value=0.01, max_value=5.0,
                           allow_nan=False),
                 min_size=1, max_size=4),
    )
    def test_total_function_and_subset_stability(self, spark, ids, ws):
        from datatest_spark.operators.packing import hash_split

        weights = {"s{0}".format(i): w for i, w in enumerate(ws)}
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        rows = {r["doc_id"]: r["split"]
                for r in hash_split(df, weights).collect()}
        # total: every row gets exactly one split from the weight keys
        assert set(rows) == set(ids)
        assert set(rows.values()) <= set(weights)
        # subset stability: assignment is a pure function of the id —
        # any sub-corpus reproduces the same splits
        sub = ids[: max(1, len(ids) // 2)]
        sdf = spark.createDataFrame([(i,) for i in sub], "doc_id long")
        sub_rows = {r["doc_id"]: r["split"]
                    for r in hash_split(sdf, weights).collect()}
        assert sub_rows == {i: rows[i] for i in sub}


class TestSelfRepetitionProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(st.lists(st.lists(st.integers(min_value=0, max_value=3),
                             min_size=0, max_size=16),
                    min_size=1, max_size=8))
    def test_spans_match_python_reference(self, spark, docs):
        from datatest_spark.operators.dedup import self_repetition_spans

        k = 3
        df = spark.createDataFrame(
            [(i, d) for i, d in enumerate(docs)],
            "doc_id long, tokens array<int>",
        )
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
            for r in self_repetition_spans(df, k=k).collect()
        )
        want = []
        for i, d in enumerate(docs):
            seen = set()
            dup_pos = []
            for p in range(max(0, len(d) - k + 1)):
                w = tuple(d[p:p + k])
                if w in seen:
                    dup_pos.append(p)
                else:
                    seen.add(w)
            # merge positions within k into islands
            j = 0
            while j < len(dup_pos):
                start = dup_pos[j]
                end = j
                while (end + 1 < len(dup_pos)
                       and dup_pos[end + 1] <= dup_pos[end] + k):
                    end += 1
                want.append((i, start, dup_pos[end] + k, end - j + 1))
                j = end + 1
        assert got == sorted(want)


class TestMixturePlanProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.tuples(st.integers(min_value=1, max_value=30),   # n docs
                  st.integers(min_value=1, max_value=500)), # len each
        min_size=1, max_size=3,
    ), st.dictionaries(
        st.sampled_from(["a", "b", "c", "ghost"]),
        st.integers(min_value=0, max_value=100_000),
        min_size=0, max_size=4,
    ))
    def test_rates_reproduce_targets(self, spark, corpus, targets):
        from datatest_spark.operators.packing import mixture_plan

        rows_in = []
        i = 0
        for src, (n, ln) in sorted(corpus.items()):
            for _ in range(n):
                rows_in.append((i, src, ln))
                i += 1
        df = spark.createDataFrame(rows_in,
                                   "doc_id long, source string, n long")
        out = {r["source"]: r for r in
               mixture_plan(df, targets, length_col="n").collect()}
        assert set(out) == set(corpus)  # only present sources
        for src, (n, ln) in corpus.items():
            avail = n * ln
            assert out[src]["available_tokens"] == avail
            t = targets.get(src, 0)
            assert out[src]["rate"] == pytest.approx(
                round(t / avail, 6), abs=1e-9
            )


class TestMadOutliersProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(
        # integer values + power-of-two scale + integer shift keep the
        # affine transform EXACT in binary floats — with arbitrary
        # floats the transform itself rounds (e.g. 1e-38 + 1.0 == 1.0)
        # and the equivariance premise fails before the operator runs
        st.lists(
            st.integers(min_value=-10_000, max_value=10_000),
            min_size=3, max_size=25,
        ).map(lambda xs: [float(x) for x in xs]),
        st.integers(min_value=-50, max_value=50).map(float),
        st.sampled_from([0.5, 1.0, 2.0, 4.0]),
    )
    def test_outlier_set_invariant_under_affine_transform(
        self, spark, values, shift, scale
    ):
        # robust z is equivariant under x -> a*x + b (a > 0): median and
        # MAD both scale by a, so the flagged id set must be identical
        from datatest_spark.operators.stats import mad_outliers

        base = spark.createDataFrame(
            [(i, "g", v) for i, v in enumerate(values)],
            "doc_id long, source string, v double",
        )
        moved = spark.createDataFrame(
            [(i, "g", v * scale + shift) for i, v in enumerate(values)],
            "doc_id long, source string, v double",
        )
        a = {r["doc_id"] for r in mad_outliers(base, "v",
                                               threshold=3.0).collect()}
        b = {r["doc_id"] for r in mad_outliers(moved, "v",
                                               threshold=3.0).collect()}
        assert a == b

    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(st.lists(
        st.floats(min_value=-1e4, max_value=1e4,
                  allow_nan=False, allow_infinity=False),
        min_size=3, max_size=25,
    ))
    def test_matches_python_reference(self, spark, values):
        import statistics

        from datatest_spark.operators.stats import mad_outliers

        df = spark.createDataFrame(
            [(i, "g", v) for i, v in enumerate(values)],
            "doc_id long, source string, v double",
        )
        got = {r["doc_id"] for r in mad_outliers(df, "v",
                                                 threshold=3.0).collect()}
        med = statistics.median(values)
        mad = statistics.median(sorted(abs(v - med) for v in values))
        want = set()
        if mad > 0:
            want = {i for i, v in enumerate(values)
                    if abs((v - med) / (1.4826 * mad)) > 3.0}
        assert got == want


class TestQualityBandsProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(st.lists(
        st.floats(min_value=-100, max_value=100,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=40,
    ), st.integers(min_value=1, max_value=8))
    def test_approx_bands_monotone_in_score(self, spark, scores, n_bands):
        from datatest_spark.operators.stats import quality_bands

        df = spark.createDataFrame(
            [(i, "g", s) for i, s in enumerate(scores)],
            "doc_id long, source string, score double",
        )
        rows = {r["doc_id"]: r["band"]
                for r in quality_bands(df, "score",
                                       n_bands=n_bands).collect()}
        # every band in range; equal scores share a band; band order
        # follows score order
        assert all(1 <= b <= n_bands for b in rows.values())
        pairs = sorted(zip(scores, [rows[i] for i in range(len(scores))]))
        for (s1, b1), (s2, b2) in zip(pairs, pairs[1:]):
            assert b1 <= b2
            if s1 == s2:
                assert b1 == b2


class TestScrubTokenSpansProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(st.lists(st.lists(st.integers(0, 3), min_size=8, max_size=24),
                    min_size=2, max_size=8))
    def test_python_reference_and_iterative_convergence(self, spark, docs):
        """(a) Kept tokens equal a plain-Python rebuild of the same span
        cuts; (b) one pass is NOT a fixed point in general (a cut
        splices flanking tokens into new k-grams — this property test
        originally FOUND that), but iterating scrub -> scan converges
        in <= ceil(n/k) + 1 passes because each pass removes >= k
        tokens per flagged doc."""
        from datatest_spark.operators.dedup import (
            duplicate_spans, scrub_token_spans,
        )

        k = 4
        rows = [(i, d) for i, d in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
        spans = duplicate_spans(df, k=k, min_docs=2, hashed=False)
        span_rows = spans.collect()
        out = {r["doc_id"]: r for r in
               scrub_token_spans(df, spans).collect()}

        by_doc = {}
        for r in span_rows:
            by_doc.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"]))
        for i, toks in rows:
            cut = by_doc.get(i, [])
            want = [t for j, t in enumerate(toks)
                    if not any(s <= j < e for s, e in cut)]
            assert out[i]["tokens"] == want
            assert out[i]["n_removed"] == len(toks) - len(want)
        # iterative convergence
        cur = {i: out[i]["tokens"] for i, _ in rows}
        max_passes = max(len(d) for d in docs) // k + 2
        for _ in range(max_passes):
            frame = spark.createDataFrame(
                list(cur.items()), "doc_id long, tokens array<int>"
            )
            sp = duplicate_spans(frame, k=k, min_docs=2, hashed=False)
            if sp.count() == 0:
                break
            cur = {r["doc_id"]: r["tokens"] for r in
                   scrub_token_spans(frame, sp).collect()}
        else:
            raise AssertionError("scrub/scan did not converge")

    def test_sep_token_marks_junctions(self, spark):
        from datatest_spark.operators.dedup import scrub_token_spans

        df = spark.createDataFrame(
            [(1, [10, 11, 12, 13, 14, 15])],
            "doc_id long, tokens array<int>",
        )
        spans = spark.createDataFrame(
            [(1, 1, 3), (1, 5, 6)],
            "doc_id long, span_start int, span_end int",
        )
        row = scrub_token_spans(df, spans, sep_token=-1).collect()[0]
        assert row["tokens"] == [10, -1, 13, 14, -1]
        assert row["n_removed"] == 1  # 3 removed, 2 separators inserted


class TestWeightedSampleProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(
        st.lists(st.integers(1, 1000), min_size=1, max_size=30),
        st.integers(0, 10),
        st.integers(1, 8),
    )
    def test_matches_python_priority_sampling(self, spark, weights, seed, n):
        """The kept set equals a plain-Python replay of priority
        sampling with the same md5-derived u — the draw is a pure
        function of (id, seed, weight)."""
        import hashlib

        from datatest_spark.operators.packing import weighted_sample

        rows = [(i, "g", w) for i, w in enumerate(weights)]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, w int"
        )
        got = {r["doc_id"] for r in weighted_sample(
            df, n, weight_col="w", hash_fn="md5", seed=seed).collect()}

        def prio(i, w):
            h = int(hashlib.md5(
                ("%d#%d" % (i, seed)).encode()).hexdigest()[:4], 16)
            return w / ((h + 1) / 65536.0)

        want = {i for i, _, w in sorted(
            rows, key=lambda r: (-prio(r[0], r[2]), r[0]))[:n]}
        assert got == want


class TestBloomProperties:
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(
        st.lists(st.text(alphabet="abcdef ", min_size=5, max_size=40),
                 min_size=1, max_size=10),
        st.sampled_from(["md5", "xxhash64"]),
    )
    def test_never_false_negative(self, spark, texts, hash_fn):
        """Any doc sharing a shingle with the benchmark MUST be flagged,
        under either hash path — the Bloom guarantee that makes the
        survivors filter safe."""
        from datatest_spark.operators.decontam import (
            bloom_contamination, contamination,
        )

        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        bench = df.limit(max(1, len(rows) // 2))
        corpus = df
        exact = {r["doc_id"] for r in
                 contamination(corpus, bench, k=2).collect()}
        bloom = {r["doc_id"] for r in bloom_contamination(
            corpus, bench, k=2, m_bits=1 << 10, n_hashes=3,
            hash_fn=hash_fn).collect()}
        assert exact <= bloom


class TestHeavyHitterProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(
        st.lists(
            st.tuples(st.sampled_from(["g", "h"]),
                      st.integers(min_value=0, max_value=6)),
            min_size=1, max_size=60,
        ),
        st.floats(min_value=0.05, max_value=0.9),
        st.integers(min_value=1, max_value=8),
    )
    def test_prefilter_equals_direct_and_python(self, spark, rows, phi,
                                                n_buckets):
        from datatest_spark.operators.stats import heavy_hitters

        df = spark.createDataFrame(
            [(g, str(v)) for g, v in rows], "src string, v string"
        )
        fast = sorted(map(tuple, heavy_hitters(
            df, "v", "src", phi=phi, prefilter=True, n_buckets=n_buckets
        ).collect()))
        direct = sorted(map(tuple, heavy_hitters(
            df, "v", "src", phi=phi, prefilter=False
        ).collect()))
        assert fast == direct
        # python reference on the threshold semantics
        want = set()
        per = Counter(rows)
        tot = Counter(g for g, _ in rows)
        for (g, v), c in per.items():
            if c >= phi * tot[g]:
                want.add((g, str(v), c))
        assert {(t[0], t[1], t[2]) for t in fast} == want


class TestFdAuditProperties:
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(st.lists(
        st.tuples(st.integers(min_value=0, max_value=3),
                  st.one_of(st.none(),
                            st.sampled_from(["a", "b", "c"]))),
        min_size=1, max_size=50,
    ))
    def test_g3_matches_python_reference(self, spark, rows):
        from datatest_spark.operators.stats import fd_audit

        df = spark.createDataFrame(rows, "k int, v string")
        got = {r["k"]: r for r in fd_audit(df, "k", "v").collect()}
        by_k = {}
        for k, v in rows:
            by_k.setdefault(k, Counter())[v] += 1
        for k, counts in by_k.items():
            n_rows = sum(counts.values())
            # majority: highest count, then smallest value, None LAST
            best = sorted(
                counts.items(),
                key=lambda kv: (-kv[1], kv[0] is None, kv[0]),
            )[0]
            r = got[k]
            assert r["n_rows"] == n_rows
            assert r["n_distinct_dep"] == len(counts)
            assert r["majority_dep"] == best[0]
            assert r["n_violations"] == n_rows - best[1]


class TestBootstrapProperties:
    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    @given(st.lists(st.integers(min_value=0, max_value=1000),
                    min_size=2, max_size=40),
           st.integers(min_value=0, max_value=3))
    def test_weights_and_interval_match_python_mirror(self, spark, vals,
                                                      seed):
        import hashlib

        from datatest_spark.operators.stats import POISSON1_CDF, bootstrap_ci

        B = 16
        df = spark.createDataFrame(
            [("d%d" % i, float(v)) for i, v in enumerate(vals)],
            "doc_id string, v double",
        )
        (r,) = bootstrap_ci(df, "v", id_col="doc_id", n_boot=B,
                            seed=seed).collect()

        def w(doc_id, b):
            h = hashlib.md5(
                ("%s#%d#%d" % (doc_id, b, seed)).encode()
            ).hexdigest()
            u = (int(h[:4], 16) + 1.0) / 65536.0
            for k, c in enumerate(POISSON1_CDF):
                if u <= c:
                    return k
            return 8

        s = 1 << 20
        means = []
        for b in range(1, B + 1):
            ws = [(w("d%d" % i, b), math.floor(float(v) * s))
                  for i, v in enumerate(vals)]
            ne = sum(x for x, _ in ws)
            if ne > 0:
                means.append(
                    ((sum(x * xf for x, xf in ws) * 1.0) / ne) / s
                )
        means.sort()
        nb = len(means)
        assert r["n_boot_used"] == nb
        if nb:
            lo = means[math.ceil(0.025 * nb) - 1]
            hi = means[math.ceil(0.975 * nb) - 1]
            assert abs(r["ci_lo"] - lo) < 1e-6
            assert abs(r["ci_hi"] - hi) < 1e-6
