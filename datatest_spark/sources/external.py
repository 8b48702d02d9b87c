"""External sources beyond the native Spark readers (SURVEY S3/S4):
Excel workbooks and DBAPI2 cursors, mirroring the reference's
``get_reader`` vintage loaders (ref:datatest/_load/get_reader.py) with
Spark-first semantics.

Scale notes: Excel and DBAPI2 are *driver-side* ingestion paths by
nature (a workbook or a cursor is not a splittable distributed source) —
appropriate for dimension/lookup tables, which is what the reference
used them for. The 100-TB path for relational data is ``load_jdbc``,
which plans a parallel partitioned scan executor-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_excel(spark: SparkSession, path, sheet_name=0, **pandas_opts) -> DataFrame:
    """Read an Excel sheet into a DataFrame (``Select('f.xlsx')`` parity).

    Goes through ``pandas.read_excel`` (Arrow batch into Spark). Requires
    the optional ``openpyxl`` dependency; without it a clear ImportError
    names the missing piece instead of a deep pandas stack.
    """
    import pandas as pd

    if "engine" not in pandas_opts and str(path).endswith(".xlsx"):
        # pin the engine: pandas otherwise content-sniffs first and
        # raises an opaque ValueError instead of the missing-dep error
        pandas_opts["engine"] = "openpyxl"
    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name, **pandas_opts)
    except ImportError as exc:
        dep = "xlrd" if str(path).endswith(".xls") else "openpyxl"
        raise ImportError(
            "Excel sources need the optional '{0}' dependency "
            "(pip install {0}); underlying error: {1}".format(dep, exc)
        ) from exc
    return spark.createDataFrame(pdf)


def load_dbapi(spark: SparkSession, cursor, arraysize: int = 10_000,
               schema=None) -> DataFrame:
    """Normalize an already-executed DBAPI2 cursor into a DataFrame (S3).

    Column names come from ``cursor.description``; rows are drained in
    ``fetchmany(arraysize)`` batches (never ``fetchall`` — bounded driver
    memory per batch). ``schema`` (DDL string or StructType) pins types
    for empty result sets or lossy drivers; otherwise types are inferred
    from the data.
    """
    if cursor.description is None:
        raise ValueError(
            "cursor has no result set; execute a SELECT before load_dbapi()"
        )
    cols = [d[0] for d in cursor.description]
    rows = []
    while True:
        batch = cursor.fetchmany(arraysize)
        if not batch:
            break
        rows.extend(tuple(r) for r in batch)
    if schema is not None:
        return spark.createDataFrame(rows, schema)
    if not rows:
        # no data and no declared schema: all-string is the only safe bet;
        # build the StructType directly — cursor column names like
        # 'COUNT(*)' are not valid DDL identifiers
        from pyspark.sql import types as T

        struct = T.StructType(
            [T.StructField(c, T.StringType(), True) for c in cols]
        )
        return spark.createDataFrame(rows, struct)
    return spark.createDataFrame(rows, cols)


def load_jdbc(spark: SparkSession, url: str, table: str,
              partition_column=None, lower_bound=None, upper_bound=None,
              num_partitions=None, **properties) -> DataFrame:
    """Parallel JDBC scan — the at-scale relational path.

    With ``partition_column`` + bounds + ``num_partitions`` Spark issues
    one range-predicated query per partition (executor-side, no driver
    bottleneck); without them the scan is a single connection, fine for
    dimension tables only. Untested in this sandbox (no JDBC driver jar);
    thin documented pass-through to ``spark.read.jdbc``.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions or 8)
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()


def is_dbapi_cursor(obj) -> bool:
    """Duck-typed DBAPI2 cursor test (description + fetchmany)."""
    return hasattr(obj, "fetchmany") and hasattr(obj, "description")
