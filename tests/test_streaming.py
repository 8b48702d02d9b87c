"""Streaming wrapper: file-source micro-batches drive the suite via
foreachBatch (memory-synchronous smoke per pyspark guide)."""

import pytest
from pyspark.sql import functions as F

from datatest_spark.plans.suite import north_star_suite
from datatest_spark.schema import INPUT_SCHEMA
from datatest_spark.sources.synth import ALLOWED_SOURCES, tokenized_sequences
from datatest_spark.streaming.incremental import IncrementalValidator


@pytest.mark.spark
def test_incremental_validation(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    tokenized_sequences(spark, 500, seed=5, bad_source_rate=0.01).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(INPUT_SCHEMA).parquet(src)
    suite = north_star_suite(ALLOWED_SOURCES)
    iv = IncrementalValidator(suite, out)

    q = (
        stream.writeStream.foreachBatch(iv)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert iv.batches_seen and sum(n for _, n in iv.batches_seen) == 500
    verdicts = spark.read.parquet(out + "/verdicts")
    assert verdicts.filter("check_id = 'referential' AND status = 'fail'").count() > 0
    violations = spark.read.parquet(out + "/violations")
    assert violations.filter("kind = 'extra'").count() > 0
