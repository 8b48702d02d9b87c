"""Canonical engine schemas (SURVEY.md §1.1, §1.3; BASELINE.json input_hint).

Declared StructTypes for the engine's binding input table and its three
output tables (violations, verdicts, checkpoint manifest).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Binding input schema: pre-tokenized training sequences (BASELINE.json:15).
INPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("n_tok", T.IntegerType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

# One row per difference (SURVEY.md §1.3 "violation row").
VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("check_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # missing|extra|invalid|deviation
        T.StructField("partition_key", T.StringType(), True),
        T.StructField("group_key", T.StringType(), True),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("expected", T.StringType(), True),
        T.StructField("deviation", T.DoubleType(), True),
        T.StructField("detail", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

VIOLATION_COLUMNS = [f.name for f in VIOLATION_SCHEMA.fields]

# Per-partition verdicts (SURVEY.md §1.3).
VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_key", T.StringType(), True),
        T.StructField("check_id", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # pass|fail|accepted
        T.StructField("n_violations", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
    ]
)

# Checkpoint manifest rows (SURVEY.md §1.3, C3).
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_key", T.StringType(), True),
        T.StructField("input_snapshot_id", T.StringType(), True),
        T.StructField("input_files_hash", T.StringType(), True),
        T.StructField("checks_done", T.ArrayType(T.StringType()), False),
        T.StructField("metrics", T.MapType(T.StringType(), T.DoubleType()), True),
        T.StructField("completed_at", T.TimestampType(), True),
    ]
)


def assert_schema(df, expected, check_nullability=False):
    """Schema conformance gate: raise TypeError on name/type mismatch.

    Field order matters (the declared StructType is the contract); extra
    columns are rejected. Nullability is advisory unless asked for, since
    parquet round-trips relax it.
    """
    actual = df.schema
    a_fields = [(f.name, f.dataType) for f in actual.fields]
    e_fields = [(f.name, f.dataType) for f in expected.fields]
    if a_fields != e_fields:
        raise TypeError(
            "schema mismatch:\n  actual:   {0}\n  expected: {1}".format(
                actual.simpleString(), expected.simpleString()
            )
        )
    if check_nullability:
        for af, ef in zip(actual.fields, expected.fields):
            if af.nullable and not ef.nullable:
                raise TypeError(
                    "column {0} is nullable but declared non-null".format(af.name)
                )
    return df
