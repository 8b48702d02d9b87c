"""Benchmark decontamination — flag / drop training documents that
overlap a held-out evaluation set.

The standard pretraining hygiene pass (GPT-3 appendix C, PaLM §6.1,
both public): a training document is *contaminated* when it shares at
least ``min_hits`` k-word shingles with any benchmark document. The
benchmark side is tiny relative to the corpus (thousands of eval docs
vs 10^9+ training docs), which fixes the distributed shape:

  1. shingle the benchmark once, ``distinct()`` — a set small enough to
     BROADCAST (a few million strings at worst);
  2. shingle the corpus (explode — fans out ~n_words per doc, but the
     very next operator is a map-side-combinable aggregation);
  3. inner broadcast-join corpus shingles against the benchmark set —
     no shuffle of the corpus side at all;
  4. per-doc aggregate of the *matched* shingles only (the join already
     discarded ~99% of the fan-out), one hash exchange on doc_id.

``decontaminate`` then anti-joins the flagged ids away. The flagged set
is usually a small fraction of the corpus but is NOT intrinsically
bounded, so the anti-join is a plain shuffle join and AQE is left to
downgrade it to broadcast when the contaminated set turns out small.

No reference counterpart (the public datatest package has no corpus
operators); engine extension per SURVEY.md §2.12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datatest_spark.operators.dedup import doc_shingles


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    k: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Per contaminated training doc: (doc_id, n_hits, n_bench_docs).

    ``n_hits`` = distinct corpus shingles also present in the benchmark;
    ``n_bench_docs`` = distinct benchmark documents sharing at least one
    shingle. Docs with ``n_hits < min_hits`` are not returned. ``k=13``
    is the published GPT-3 value; use smaller k for short documents.
    """
    bench_sh = doc_shingles(
        benchmark,
        text_col=bench_text_col or text_col,
        id_col=bench_id_col or id_col,
        k=k,
    )
    corpus_sh = doc_shingles(corpus, text_col=text_col, id_col=id_col, k=k)
    return _contamination_from_shingles(corpus_sh, bench_sh, min_hits)


def _contamination_from_shingles(corpus_sh, bench_sh, min_hits):
    """Shared broadcast-join skeleton over (doc_id, shingle) frames —
    steps 1-4 of the module docstring, independent of how the shingles
    were produced (text words or token ids)."""
    bench_set = bench_sh.select(
        F.col("shingle").alias("_b_shingle"),
        F.col("doc_id").alias("_b_doc"),
    ).distinct()
    hits = corpus_sh.join(
        F.broadcast(bench_set),
        corpus_sh["shingle"] == bench_set["_b_shingle"],
        "inner",
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_hits"),
            F.countDistinct("_b_doc").alias("n_bench_docs"),
        )
        .filter(F.col("n_hits") >= min_hits)
    )


def token_shingles(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    k: int = 8,
    hashed: bool = True,
    extra_lengths: tuple = (),
) -> DataFrame:
    """(doc_id, shingle) for every k-token window of a token-id array —
    the tokenized twin of ``dedup.doc_shingles``: decontamination over a
    pretokenized corpus must shingle token ids, not re-derived text.

    Sequences shorter than k yield their whole sequence as ONE shingle
    (a short eval answer must still be matchable); null elements are
    dropped, empty/null arrays yield no rows. ``extra_lengths`` ALSO
    emits exact L-token windows for each L (1 <= L < k) in the SAME
    single pass — one scan and one explode regardless of how many
    lengths are requested. ``hashed=True`` (default) emits xxhash64 of
    the comma-joined ids — 8 bytes per shingle in the broadcast set
    instead of a string; ``hashed=False`` keeps the portable string
    form (cross-engine oracle).

    Scale shape: one explode of ~n_tok rows per doc (x(1 + number of
    extra lengths)); the very next operator in the contamination plan
    is the broadcast semi-join that discards ~99% of the fan-out before
    any exchange.
    """
    if k < 1:
        raise ValueError("token_shingles: k must be >= 1")
    for length in extra_lengths:
        if not 1 <= int(length) < k:
            raise ValueError(
                "token_shingles: extra_lengths must be in [1, k), got "
                "{0!r}".format(length)
            )
    toks = F.transform(
        F.filter(F.col(tokens_col), lambda t: t.isNotNull()),
        lambda t: t.cast("string"),
    )
    n = F.size(toks)

    def _windows(length, whole_short):
        idx = F.sequence(
            F.lit(1), F.greatest(n - length + 1, F.lit(1))
        )
        arr = F.transform(
            idx, lambda i: F.concat_ws(",", F.slice(toks, i, length))
        )
        if whole_short:
            return arr  # short docs fall back to one whole shingle
        return F.when(n >= length, arr).otherwise(
            F.array().cast("array<string>")
        )

    all_windows = F.flatten(
        F.array(
            _windows(k, whole_short=True),
            *[_windows(int(x), whole_short=False) for x in extra_lengths]
        )
    )
    out = (
        df.where(n > 0)
        .select(F.col(id_col).alias("doc_id"),
                F.explode(all_windows).alias("shingle"))
    )
    if hashed:
        out = out.select(
            "doc_id", F.xxhash64(F.col("shingle")).alias("shingle")
        )
    return out


def token_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    bench_tokens_col: str | None = None,
    bench_id_col: str | None = None,
    k: int = 8,
    min_hits: int = 1,
    hashed: bool = True,
    short_lengths: tuple[int, ...] | None = None,
) -> DataFrame:
    """:func:`contamination` over token-id arrays instead of text —
    same published overlap rule, same broadcast shape, applied to the
    north-star payload directly (no detokenization round trip).

    Benchmark docs shorter than k shingle as ONE whole sequence — but a
    whole-sequence shingle of length L can only string-match another
    L-window, so the corpus ALSO emits L-windows for every short
    benchmark length present (a training doc containing a short eval
    answer verbatim must be flagged). The needed lengths are collected
    from the benchmark side (tiny by contract — it gets broadcast;
    note this runs one small Spark job at plan-construction time) and
    all corpus window lengths are produced in ONE scan + explode via
    ``token_shingles(extra_lengths=...)``.

    Pass ``short_lengths`` to skip that eager collect — every other
    operator here is a pure plan builder, and callers composing plans
    lazily (or against a benchmark frame that isn't materializable yet)
    can precompute the distinct sub-k benchmark lengths themselves and
    keep this one lazy too. ``short_lengths=()`` disables short-window
    matching entirely (pure fixed-k overlap).

    Known asymmetry: the reverse case — a CORPUS doc shorter than k
    contained verbatim inside a longer benchmark doc — is not flagged
    (its whole-shingle matches nothing; the benchmark emits no short
    windows). The published rule only flags training docs carrying a
    k-gram, and sub-k training docs are below the overlap granularity;
    closing it would need per-channel tagging so corpus L-windows
    don't spuriously match benchmark L-windows.
    """
    if min_hits < 1:
        raise ValueError("token_contamination: min_hits must be >= 1")
    btc = bench_tokens_col or tokens_col
    bic = bench_id_col or id_col
    bench_sh = token_shingles(
        benchmark, tokens_col=btc, id_col=bic, k=k, hashed=hashed
    )
    if short_lengths is None:
        short = F.size(F.filter(F.col(btc), lambda t: t.isNotNull()))
        short_lengths = tuple(sorted(
            int(r["_l"])
            for r in benchmark.select(short.alias("_l"))
            .where((F.col("_l") > 0) & (F.col("_l") < k))
            .distinct()
            .collect()
        ))
    else:
        bad = [l for l in short_lengths if not (0 < int(l) < k)]
        if bad:
            raise ValueError(
                "token_contamination: short_lengths must lie in (0, k); "
                "got %r" % (bad,)
            )
        short_lengths = tuple(sorted(int(l) for l in set(short_lengths)))
    corpus_sh = token_shingles(
        corpus, tokens_col=tokens_col, id_col=id_col, k=k, hashed=hashed,
        extra_lengths=short_lengths,
    )
    return _contamination_from_shingles(corpus_sh, bench_sh, min_hits)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    k: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """The corpus minus contaminated documents (all corpus columns kept).

    Anti-join on ``id_col``; the right side is the output of
    :func:`contamination`, typically a small fraction of the corpus —
    AQE downgrades the exchange to broadcast at runtime when it is.
    """
    flagged = contamination(
        corpus,
        benchmark,
        text_col=text_col,
        id_col=id_col,
        bench_text_col=bench_text_col,
        bench_id_col=bench_id_col,
        k=k,
        min_hits=min_hits,
    ).select(F.col("doc_id").alias(id_col))  # contamination normalizes the
    # id column name to doc_id; restore the caller's name for the join
    return corpus.join(flagged, id_col, "left_anti")


# literal-array carrier ceiling (elements); past this the bitmap rides a
# one-row broadcast join instead of an inline literal (plan-size guard,
# same two-carrier discipline as text.unigram_logloss)
BLOOM_LITERAL_MAX_WORDS = 4096
# hard ceiling on the collected bitmap: 2^27 bits = 2M longs = 16 MB —
# comfortably broadcastable, refuse silently-huge driver collects past it
BLOOM_MAX_BITS = 1 << 27


def _bloom_hash_pair(v, m_bits: int, hash_fn: str):
    """(h1, h2) for one shingle via Kirsch-Mitzenmacher double hashing
    inputs. ``md5``: ``v`` is the PRE-COMPUTED md5 hex of the shingle
    (materialized once per shingle — recomputing md5 inside every probe
    measured ~2.5x slower at sf0.1); h1/h2 come from its disjoint
    60-bit halves (portable: DuckDB mirrors each as ``CAST('0x' ||
    substr(md5(s), off, 15) AS BIGINT)``). ``xxhash64``: ``v`` is the
    shingle itself; two seeded JVM hashes — the fast production path
    (no hex strings, no conv). h2 is forced odd so it is coprime with
    the power-of-two ``m_bits`` and the probe sequence never
    degenerates into a short cycle."""
    if hash_fn == "md5":
        h1 = F.pmod(
            F.conv(F.substring(v, 1, 15), 16, 10).cast("long"),
            F.lit(m_bits),
        )
        h2 = F.pmod(
            F.conv(F.substring(v, 16, 15), 16, 10).cast("long"),
            F.lit(m_bits),
        ).bitwiseOR(F.lit(1))
    else:
        h1 = F.pmod(F.xxhash64(v), F.lit(m_bits))
        h2 = F.pmod(F.xxhash64(v, F.lit(1)), F.lit(m_bits)).bitwiseOR(
            F.lit(1)
        )
    return h1, h2


def _bloom_positions(v, m_bits: int, n_hashes: int, hash_fn: str):
    h1, h2 = _bloom_hash_pair(v, m_bits, hash_fn)
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(n_hashes)
    ]


def _validate_bloom_params(m_bits: int, n_hashes: int):
    if m_bits < 64 or (m_bits & (m_bits - 1)) != 0:
        raise ValueError(
            "m_bits must be a power of two >= 64, got %r" % (m_bits,)
        )
    if m_bits > BLOOM_MAX_BITS:
        raise ValueError(
            "m_bits=%d exceeds BLOOM_MAX_BITS=%d (the bitmap is "
            "collected to the driver and broadcast)" % (m_bits, BLOOM_MAX_BITS)
        )
    if not 1 <= n_hashes <= 16:
        raise ValueError("n_hashes must be in [1, 16], got %r" % (n_hashes,))


def bloom_bitmap(
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
    hash_fn: str = "xxhash64",
) -> list:
    """Driver-side Bloom bitmap of the benchmark's k-word shingles:
    ``m_bits // 64`` longs (word w holds bits 64w..64w+63).

    Built distributed: shingle the benchmark, explode each shingle to
    its ``n_hashes`` positions, aggregate ``bit_or`` per 64-bit word
    (map-side combinable — at most ``m_bits/64`` rows cross the one
    exchange), collect. The eval side is tiny by definition, so this is
    a sub-second pass; the corpus is never touched.
    """
    _validate_bloom_params(m_bits, n_hashes)
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError("hash_fn must be xxhash64|md5, got %r" % (hash_fn,))
    sh = doc_shingles(
        benchmark, text_col=text_col, id_col=id_col, k=k
    ).select("shingle").distinct()
    v = F.md5(F.col("shingle")) if hash_fn == "md5" else F.col("shingle")
    pos = sh.select(
        F.explode(
            F.array(*_bloom_positions(v, m_bits, n_hashes, hash_fn))
        ).alias("pos")
    )
    words = (
        pos.select(
            F.shiftright(F.col("pos"), 6).alias("w"),
            F.col("pos").bitwiseAND(F.lit(63)).alias("b"),
        )
        .groupBy("w")
        .agg(
            F.bit_or(
                F.element_at(
                    F.array(*[F.lit(m) for m in _BLOOM_BIT_MASKS]),
                    (F.col("b") + 1).cast("int"),
                )
            ).alias("word")
        )
        .collect()
    )
    vals = [0] * (m_bits // 64)
    for r in words:
        vals[int(r["w"])] = int(r["word"])
    return vals


# 1<<i as a signed 64-bit long (bit 63 is the sign bit)
_BLOOM_BIT_MASKS = [(1 << i) if i < 63 else -(2 ** 63) for i in range(64)]


def bloom_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    k: int = 13,
    min_hits: int = 1,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
    bitmap: list | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Approximate decontamination via a broadcast Bloom filter —
    (doc_id, n_shingles, n_hits): ``n_hits`` = distinct corpus shingles
    whose ``n_hashes`` bit probes ALL hit the benchmark bitmap; rows
    with ``n_hits < min_hits`` are dropped.

    Guarantee: ZERO false negatives — every shingle actually present in
    the benchmark has all its bits set, so every doc flagged by
    :func:`contamination` (min_hits=1 semantics) is flagged here. False
    positives occur at the classic rate ``(fill_ratio)^n_hashes`` per
    probed shingle; size ``m_bits`` ~10x the expected distinct eval
    shingles for ~1% per-shingle FP at n_hashes=5. Use this as the
    cheap first pass at the 10^12 scale and confirm survivors' flags
    with the exact broadcast join if FPs matter.

    Why it beats the exact join at scale: the probe is MAP-ONLY — the
    corpus side has no explode, no join and no exchange at all. Each
    doc's distinct-shingle array is tested in one codegen'd
    ``F.filter`` over Column bit arithmetic; the only data movement is
    the bitmap itself (``m_bits/8`` bytes, e.g. 128 KiB at 2^20), vs
    broadcasting every eval shingle STRING (tens of MB) for the exact
    join. Measured at sf0.1 (same load window): probe 5.4s vs exact
    join 5.7s — compute parity already at 43k docs; the asymptotic win
    is the per-executor broadcast footprint when the eval set reaches
    millions of shingles. ``hash_fn="xxhash64"`` (default) is the
    production path; ``"md5"`` is the DuckDB-oracle form. The bitmap rides an inline literal array up to
    ``BLOOM_LITERAL_MAX_WORDS`` words, else a one-row broadcast
    cross-join (same two-carrier discipline as the unigram LM).

    Pass a prebuilt ``bitmap`` (from :func:`bloom_bitmap`, e.g. persisted
    beside a benchmark registry) to skip the build and decontaminate
    against frozen eval sets without ever reading them.
    """
    _validate_bloom_params(m_bits, n_hashes)
    if min_hits < 1:
        raise ValueError("min_hits must be >= 1, got %r" % (min_hits,))
    if bitmap is None:
        bitmap = bloom_bitmap(
            benchmark,
            text_col=bench_text_col or text_col,
            id_col=bench_id_col or id_col,
            k=k,
            m_bits=m_bits,
            n_hashes=n_hashes,
            hash_fn=hash_fn,
        )

    from datatest_spark.operators.dedup import shingles_col

    probed, _hit, _extra = _bloom_probe(
        corpus, bitmap, m_bits, n_hashes, hash_fn
    )
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    sh_arr = F.coalesce(
        shingles_col(t, k), F.array().cast("array<string>")
    )
    probe_arr = _probe_values(sh_arr, hash_fn)
    return (
        probed.select(
            F.col(id_col).alias("doc_id"),
            F.size(sh_arr).alias("n_shingles"),
            F.size(F.filter(probe_arr, _hit)).alias("n_hits"),
        )
        .filter(F.col("n_hits") >= F.lit(min_hits))
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    k: int = 13,
    min_hits: int = 1,
    m_bits: int = 1 << 20,
    n_hashes: int = 5,
    bitmap: list | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Survivors of the Bloom probe, all original columns intact — and
    unlike :func:`decontaminate` (groupBy + anti-join), this is a PURE
    FILTER: the hit-count condition evaluates inline on the scan, so
    dropping contaminated docs from a 10^12-row corpus costs zero
    exchanges end-to-end. The Bloom FP direction is the SAFE one for
    dropping: a false positive discards a clean doc (recall loss bounded
    by the FP rate), never keeps a contaminated one.
    """
    if min_hits < 1:
        raise ValueError("min_hits must be >= 1, got %r" % (min_hits,))
    if bitmap is None:
        bitmap = bloom_bitmap(
            benchmark,
            text_col=bench_text_col or text_col,
            id_col=bench_id_col or id_col,
            k=k,
            m_bits=m_bits,
            n_hashes=n_hashes,
            hash_fn=hash_fn,
        )
    return _bloom_filter_survivors(
        corpus, bitmap, text_col, k, min_hits, m_bits, n_hashes, hash_fn
    )


def _probe_values(sh_arr, hash_fn: str):
    """Probe-input array for a shingle array: md5 pre-materializes ONE
    hex per shingle (the probe then only slices/convs it — recomputing
    md5 inside every bit test measured ~2.5x slower at sf0.1);
    xxhash64 probes the shingle strings directly (the JVM hash is
    cheap)."""
    if hash_fn == "md5":
        return F.transform(sh_arr, lambda s: F.md5(s))
    return sh_arr


def _bloom_probe(corpus, bitmap, m_bits, n_hashes, hash_fn="xxhash64"):
    """Shared probe construction: returns (probed_frame, hit(shingle)
    Column predicate, carrier_col_to_drop_or_None). The bitmap rides an
    inline literal array up to BLOOM_LITERAL_MAX_WORDS words, else a
    one-row broadcast cross-join (the unigram-LM two-carrier
    discipline)."""
    _validate_bloom_params(m_bits, n_hashes)
    n_words = len(bitmap)
    if n_words != m_bits // 64:
        raise ValueError(
            "bitmap has %d words, m_bits=%d needs %d"
            % (n_words, m_bits, m_bits // 64)
        )
    extra = None
    if n_words <= BLOOM_LITERAL_MAX_WORDS:
        bits_col = F.array(*[F.lit(int(w)) for w in bitmap])
        probed = corpus
    else:
        spark = corpus.sparkSession
        carrier = spark.createDataFrame(
            [([int(w) for w in bitmap],)], "_bloom_bits array<long>"
        )
        probed = corpus.crossJoin(F.broadcast(carrier))
        bits_col = F.col("_bloom_bits")
        extra = "_bloom_bits"
    masks = F.array(*[F.lit(m) for m in _BLOOM_BIT_MASKS])

    def _hit(v):
        cond = F.lit(True)
        for pos in _bloom_positions(v, m_bits, n_hashes, hash_fn):
            word = F.element_at(
                bits_col, (F.shiftright(pos, 6) + 1).cast("int")
            )
            mask = F.element_at(
                masks, (pos.bitwiseAND(F.lit(63)) + 1).cast("int")
            )
            cond = cond & (word.bitwiseAND(mask) != 0)
        return cond

    return probed, _hit, extra


def _bloom_filter_survivors(
    corpus, bitmap, text_col, k, min_hits, m_bits, n_hashes,
    hash_fn="xxhash64",
):
    from datatest_spark.operators.dedup import shingles_col

    probed, _hit, extra = _bloom_probe(
        corpus, bitmap, m_bits, n_hashes, hash_fn
    )
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    sh_arr = F.coalesce(
        shingles_col(t, k), F.array().cast("array<string>")
    )
    probe_arr = _probe_values(sh_arr, hash_fn)
    out = probed.filter(
        F.size(F.filter(probe_arr, _hit)) < F.lit(min_hits)
    )
    return out.drop(extra) if extra else out
