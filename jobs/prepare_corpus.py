"""spark-submit end-to-end training-corpus preparation job.

    spark-submit --py-files dist/datatest_spark.zip jobs/prepare_corpus.py \
        --input /path/tokens --output /path/prepared \
        --target-tokens web=1000000,wiki=500000 [--benchmark /path/bench]

Composes the pipeline operators over the north-star table
(doc_id string, tokens array<int>, n_tok int, source string):

  1. exact dedup       keep the min-id doc per (xxhash64(tokens), n_tok)
                       — one map-side-combinable agg, 16 B/row keys
  2. quality gates     token-run + entropy map-only gates CHAINED via
                       passthrough into one scan projection
  3. decontamination   token-id shingle overlap vs an optional benchmark
                       table (eval side broadcast; corpus never shuffles
                       pre-join)
  4. mixture           token-budget solver -> deterministic hash
                       sampling per source
  5. split             deterministic train/val/test hash split
                       (domain-tagged, decorrelated from sampling)
  6. write             parquet partitioned by split

Every stage is the library operator — this file only wires them, so the
plan the job runs is the plan the per-operator tests and oracles pin.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="tokens table (parquet)")
    p.add_argument("--output", required=True, help="output dir (parquet)")
    p.add_argument("--benchmark", default=None,
                   help="optional benchmark tokens table for decontam")
    p.add_argument("--target-tokens", default=None, metavar="SRC=N,...",
                   help="per-source token budgets for the mixture; "
                        "omit to keep every surviving doc")
    p.add_argument("--splits", default="train=0.9,val=0.05,test=0.05",
                   metavar="NAME=W,...")
    p.add_argument("--max-run-frac", type=float, default=0.5,
                   help="gate: max fraction of tokens in the longest "
                        "same-token run")
    p.add_argument("--min-entropy", type=float, default=0.5,
                   help="gate: min unigram entropy (bits) for docs of "
                        ">= 16 tokens")
    p.add_argument("--contam-k", type=int, default=8,
                   help="token-shingle width for decontamination")
    p.add_argument("--seed", type=int, default=0)
    return p


def _parse_kv(spec, cast):
    out = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        if not k or not v:
            raise ValueError("malformed KEY=VALUE item: %r" % (part,))
        out[k.strip()] = cast(v)
    return out


def prepare(spark, args):
    from datatest_spark.operators.packing import (
        hash_split, mixture_plan, mixture_sample,
    )
    from datatest_spark.operators.text import token_entropy, token_run_stats

    df = spark.read.parquet(args.input)

    # 1. exact dedup on the token payload: hash+size key, min-id winner
    key = [F.xxhash64("tokens").alias("_th"), F.col("n_tok")]
    winners = (
        df.select(F.col("doc_id"), *key)
        .groupBy("_th", "n_tok")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    df = df.join(winners, "doc_id", "left_semi")

    # 2. map-only quality gates chained into one scan
    gated = token_run_stats(
        df, passthrough=("tokens", "n_tok", "source")
    )
    gated = gated.where(
        F.coalesce(F.col("max_run_frac") <= args.max_run_frac, F.lit(True))
    )
    gated = token_entropy(
        gated.select("doc_id", "tokens", "n_tok", "source"),
        passthrough=("tokens", "n_tok", "source"),
    )
    gated = gated.where(
        (F.col("n_tokens") < 16)
        | F.coalesce(F.col("entropy") >= args.min_entropy, F.lit(True))
    ).select("doc_id", "tokens", "n_tok", "source")

    # 3. optional decontamination against a benchmark table
    if args.benchmark:
        from datatest_spark.operators.decontam import token_contamination

        bench = spark.read.parquet(args.benchmark)
        hits = token_contamination(
            gated, bench, k=args.contam_k
        ).select("doc_id")
        gated = gated.join(hits, "doc_id", "left_anti")

    # 4. mixture: budget solver feeds the deterministic sampler
    if args.target_tokens:
        targets = _parse_kv(args.target_tokens, int)
        plan = mixture_plan(gated, targets, length_col="n_tok")
        rates = {
            r["source"]: r["rate"] for r in plan.collect()
        }
        gated = mixture_sample(gated, rates, seed=args.seed)

    # 5. deterministic split, decorrelated from the sampling hash
    out = hash_split(gated, _parse_kv(args.splits, float), seed=args.seed)

    # 6. write partitioned by split
    out.write.mode("overwrite").partitionBy("split").parquet(args.output)
    counts = {
        r["split"]: r["n"]
        for r in spark.read.parquet(args.output)
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print("prepare_corpus: wrote %s -> %s" % (counts, args.output))
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(
        "datatest_spark.prepare_corpus"
    ).getOrCreate()
    return prepare(spark, args)


if __name__ == "__main__":
    sys.exit(main())
