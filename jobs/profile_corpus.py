"""spark-submit corpus data-card job: one pass of audit operators, one
JSON report.

    spark-submit --py-files dist/datatest_spark.zip jobs/profile_corpus.py \
        --input /path/tokens [--baseline-source web] [--output card.json]

Composes the AUDIT operators over the north-star table (doc_id string,
tokens array<int>, n_tok int, source string) into a machine-readable
"data card":

  stats       per-source wide stats pass (count/nulls/HLL/min/max/
              quantiles) — ONE shuffle
  shares      corpus mixture (per-source share, cumulative, rank)
  ci          per-source mean n_tok with a deterministic
              Poisson-bootstrap 95% interval
  drift       per-source PSI + binned KS + directional Mann-Whitney z
              of n_tok vs --baseline-source
  hot_tokens  phi-heavy-hitter token ids per source (bucket-prefilter
              path — the exchange never carries the vocabulary)
  prefix      per-position token entropy over the first --max-pos
              positions (templated-prefix detector)
  concentration  scalar mixture alarms: Gini / HHI / top-source share
  dedup_impact   per-source docs+tokens lost to exact token-sequence
                 dedup (effective counts for a token-budget mixture)
  inspection     deterministic k-per-source min-hash sample ids
                 (reproducible eyeballing, stable under appends)
  surprisal      per-source surprisal shape (mean/std/max bits) under
                 the corpus's own unigram LM — the concatenation-
                 artifact lens (map-only scoring, |sources|-row agg)

Every stage is the library operator the per-operator tests and DuckDB
oracles pin; this file only wires them and collects the tiny aggregate
outputs (every frame here is bounded by |sources|, positions, or
heavy-hitter counts — never corpus rows).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="tokens table (parquet)")
    p.add_argument("--output", default=None,
                   help="optional path for the JSON card (also printed)")
    p.add_argument("--baseline-source", default=None,
                   help="drift baseline source (default: largest source)")
    p.add_argument("--phi", type=float, default=0.001,
                   help="heavy-hitter threshold fraction")
    p.add_argument("--max-pos", type=int, default=16,
                   help="positions profiled by the prefix-entropy audit")
    p.add_argument("--n-tok-hi", type=float, default=4096.0,
                   help="histogram upper bound for the drift lenses")
    p.add_argument("--nbins", type=int, default=10)
    p.add_argument("--inspect-k", type=int, default=5,
                   help="rows per source in the inspection sample")
    p.add_argument("--compare", default=None,
                   help="optional PRIOR snapshot (parquet) — adds the "
                   "versioning lenses: schema_drift (column/status/"
                   "null-rate movement) and band_migration (n_tok "
                   "quality-band flow, approx boundaries)")
    p.add_argument("--bands", type=int, default=4,
                   help="bands for the --compare migration matrix")
    return p


def _rows(df):
    return [r.asDict(recursive=True) for r in df.collect()]


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    from datatest_spark.operators import dedup, drift, packing, stats, text

    spark = SparkSession.builder.appName(
        "datatest_spark.profile"
    ).getOrCreate()
    df = spark.read.parquet(args.input)

    shares = stats.group_shares(df, "source")
    share_rows = _rows(shares)
    # baseline = the rank-1 (largest) source BY CONTRACT, not by collect()
    # row order — output order of an un-sorted frame is a plan artifact
    baseline = args.baseline_source or next(
        (r["group"] for r in share_rows if r["rank"] == 1), None
    )

    card = {
        "input": args.input,
        "n_rows": sum(r["n"] for r in share_rows),
        "baseline_source": baseline,
        "shares": share_rows,
        "stats": _rows(
            stats.column_stats(df, ("source",), ["doc_id", "tokens",
                                                 "n_tok", "source"])
        ),
        "ci_n_tok": _rows(
            stats.bootstrap_ci(df, "n_tok", "source", id_col="doc_id")
        ),
        "prefix_entropy": _rows(
            text.position_entropy(df, "tokens", max_pos=args.max_pos)
        ),
        "hot_tokens": _rows(
            stats.heavy_hitters(
                df.select("source", F.explode("tokens").alias("tok")),
                "tok", "source", phi=args.phi,
            )
        ),
        "concentration": _rows(stats.concentration_indices(df, "source")),
        "dedup_impact": _rows(
            dedup.dedup_impact(
                df, key_col=F.col("tokens").cast("string"),
                weight_col="n_tok",
            )
        ),
        "inspection": _rows(
            packing.inspection_sample(df, k=args.inspect_k).select(
                "source", "doc_id", "n_tok", "rank"
            )
        ),
        # per-source surprisal shape under the corpus's own unigram LM:
        # a source whose mean_std spikes is stitching boilerplate to
        # garbage even when its mean bits look normal (scoring is
        # map-only; this agg is |sources| rows)
        "surprisal": _rows(
            text.unigram_surprisal_profile(
                df, tokens_col="tokens", passthrough=("source",)
            )
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.round(F.avg("bits_mean"), 4).alias("mean_bits"),
                F.round(F.avg("bits_std"), 4).alias("mean_std"),
                F.round(F.max("bits_max"), 4).alias("max_bits"),
                F.sum("n_oov").alias("n_oov"),
            )
        ),
    }
    if args.compare:
        from datatest_spark.operators import checks

        prior = spark.read.parquet(args.compare)
        card["versioning"] = {
            "prior": args.compare,
            "schema_drift": _rows(checks.schema_drift(prior, df)),
        }
        # migration needs the score on BOTH sides; a prior without it
        # is precisely what schema_drift just reported — don't crash
        if "n_tok" in prior.columns and "n_tok" in df.columns:
            card["versioning"]["band_migration"] = _rows(
                stats.band_migration(prior, df, "n_tok",
                                     n_bands=args.bands)
            )
    if baseline is not None:
        kw = dict(value_col="n_tok", group_col="source",
                  baseline_group=baseline, lo=0.0, hi=args.n_tok_hi,
                  nbins=args.nbins)
        card["drift"] = {
            "ks": _rows(drift.ks_from_histogram(df, **kw)),
            "mwu": _rows(drift.mwu_from_histogram(df, **kw)),
            "emd": _rows(drift.emd_from_histogram(df, **kw)),
            "js": _rows(drift.js_from_histogram(df, **kw)),
        }
    out = json.dumps(card, default=str, sort_keys=True)
    print(out)
    if args.output:
        with open(args.output, "w") as fh:
            fh.write(out + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
