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
    ).select(
        F.col("shingle").alias("_b_shingle"),
        F.col("doc_id").alias("_b_doc"),
    ).distinct()
    corpus_sh = doc_shingles(corpus, text_col=text_col, id_col=id_col, k=k)
    hits = corpus_sh.join(
        F.broadcast(bench_sh),
        corpus_sh["shingle"] == bench_sh["_b_shingle"],
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
