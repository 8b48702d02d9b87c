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
               schema=None, spill_threshold: int = 500_000,
               spill_dir=None) -> DataFrame:
    """Normalize an already-executed DBAPI2 cursor into a DataFrame (S3).

    Column names come from ``cursor.description``; rows are drained in
    ``fetchmany(arraysize)`` batches. Result sets up to
    ``spill_threshold`` rows are held in one driver-side list (the
    dimension/lookup-table case this path exists for). Beyond the
    threshold the drain switches to a spill file: each batch is appended
    to a spill parquet file through an Arrow ``ParquetWriter`` (so driver
    memory holds ONE batch at a time, not the full result set) and the
    frame is read back through the distributed parquet reader. ``schema``
    (DDL string or StructType) pins types for empty result sets or lossy
    drivers; otherwise types are inferred from the data (in the spill
    case, from the first spilled chunk).

    ``spill_dir`` is where the spill file lands. The default (a
    driver-local temp dir) only works when executors share the driver's
    filesystem — local mode, or single-node standalone. ON A REAL
    CLUSTER pass a path on shared storage (HDFS/S3/NFS) writable by the
    driver and readable by executors; a driver-local default there
    fails at first action with FileNotFoundException on the executors.
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
        if len(rows) > spill_threshold:
            return _spill_cursor_to_parquet(spark, cursor, cols, rows,
                                            arraysize, schema, spill_dir)
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


def _spill_cursor_to_parquet(spark, cursor, cols, pending, arraysize, schema,
                             spill_dir=None):
    """Drain the rest of ``cursor`` through a temp parquet file so driver
    memory stays bounded at one fetchmany batch (+ the pre-threshold
    ``pending`` rows, written first). When ``schema`` is given, the Arrow
    writer schema is derived from it up front (to_arrow_schema), so an
    all-null-early column cannot mis-fix the file schema as ``null``;
    without it the schema is fixed by the first written chunk and later
    chunks are cast to it, so a column that is all-null early and typed
    later fails loudly rather than silently widening. Duplicate cursor
    column names (``SELECT a, b AS a``) are written under mangled names
    and aliased back after the read — parquet/Spark reject duplicates,
    and a dict-keyed table build would silently drop a column."""
    import atexit
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    # mangle duplicate column names for the parquet roundtrip only
    seen, safe_cols = {}, []
    for c in cols:
        n = seen.get(c, 0)
        seen[c] = n + 1
        safe_cols.append(c if n == 0 else "%s__dup%d" % (c, n))

    arrow_schema = None
    if schema is not None:
        from pyspark.sql.pandas.types import to_arrow_schema

        target = spark.createDataFrame([], schema).schema
        if len(target) != len(cols):
            raise ValueError(
                "schema has %d fields but cursor returns %d columns"
                % (len(target), len(cols))
            )
        arrow_schema = to_arrow_schema(target)
        arrow_schema = pa.schema(
            [f.with_name(n) for f, n in zip(arrow_schema, safe_cols)]
        )

    if spill_dir is not None:
        # caller-provided shared storage (required on multi-node
        # clusters): driver writes via Arrow, executors read via Spark
        os.makedirs(spill_dir, exist_ok=True)
        tmpdir = tempfile.mkdtemp(prefix="dbapi_", dir=spill_dir)
    else:
        tmpdir = tempfile.mkdtemp(prefix="datatest_spark_dbapi_")
    atexit.register(shutil.rmtree, tmpdir, ignore_errors=True)
    path = tmpdir + "/spill.parquet"
    writer = None
    try:
        chunk = pending
        while chunk:
            arrays = [
                pa.array(
                    [r[i] for r in chunk],
                    type=None if arrow_schema is None else arrow_schema.types[i],
                )
                for i in range(len(cols))
            ]
            table = pa.Table.from_arrays(arrays, names=safe_cols)
            if writer is None:
                writer = pq.ParquetWriter(path, arrow_schema or table.schema)
            if table.schema != writer.schema:
                table = table.cast(writer.schema)
            writer.write_table(table)
            chunk = [tuple(r) for r in cursor.fetchmany(arraysize)]
    finally:
        if writer is not None:
            writer.close()
    df = spark.read.parquet(path)
    if schema is not None:
        df = df.select(
            *[
                df[s].cast(f.dataType).alias(f.name)
                for s, f in zip(safe_cols, target)
            ]
        )
    else:
        df = df.select(
            *[df[s].alias(c) for s, c in zip(safe_cols, cols)]
        )
    return df


def load_dbf(spark: SparkSession, path, encoding: str = "cp1252") -> DataFrame:
    """Read a dBase .dbf table (``Select('f.dbf')`` parity — the last
    format in the reference's ``get_reader`` matrix,
    ref:datatest/_load/get_reader.py, which used the optional ``dbfread``
    dep). Pure-Python, no optional dependency: the dBase III layout is a
    fixed 32-byte header + 32-byte field descriptors + fixed-width ASCII
    records, documented publicly for four decades.

    Driver-side by nature (a .dbf is a small legacy artifact, not a
    splittable source) — dimension/lookup tables only, like Excel above.
    Types map C→string, N/F→long/double (by decimal count), L→boolean,
    D→date; deleted rows (0x2A flag) are skipped.
    """
    import datetime

    from pyspark.sql import types as T

    with open(path, "rb") as fh:
        head = fh.read(32)
        if len(head) < 32:
            raise ValueError("not a dbf file (truncated header): %s" % path)
        nrec = int.from_bytes(head[4:8], "little")
        hlen = int.from_bytes(head[8:10], "little")
        rlen = int.from_bytes(head[10:12], "little")
        fields = []
        for _ in range((hlen - 33) // 32):
            fd = fh.read(32)
            if fd[:1] == b"\r":
                break
            name = fd[:11].split(b"\x00")[0].decode("ascii").strip()
            fields.append((name, chr(fd[11]), fd[16], fd[17]))
        if sum(f[2] for f in fields) + 1 != rlen:
            raise ValueError(
                "dbf field widths don't add up to the declared record "
                "length — unsupported variant or corrupt file: %s" % path
            )
        fh.seek(hlen)
        rows = []
        for _ in range(nrec):
            rec = fh.read(rlen)
            if len(rec) < rlen or rec[:1] == b"\x1a":
                break
            if rec[:1] == b"*":  # deleted-row flag
                continue
            off, vals = 1, []
            for _name, ftype, flen, fdec in fields:
                raw, off = rec[off:off + flen], off + flen
                vals.append(_dbf_value(raw, ftype, fdec, encoding, datetime))
            rows.append(tuple(vals))

    def spark_type(ftype, fdec):
        if ftype == "L":
            return T.BooleanType()
        if ftype == "D":
            return T.DateType()
        if ftype in ("N", "F"):
            return T.LongType() if (ftype == "N" and fdec == 0) else T.DoubleType()
        return T.StringType()

    struct = T.StructType(
        [T.StructField(n, spark_type(t, d), True) for n, t, _l, d in fields]
    )
    return spark.createDataFrame(rows, struct)


def _dbf_value(raw, ftype, fdec, encoding, datetime):
    text = raw.decode(encoding, errors="replace").strip()
    if ftype == "L":
        return (True if text in "TtYy" else False) if text and text != "?" else None
    if not text:
        return None
    if ftype == "D":
        # '00000000' is the common null-date convention; truncated or
        # corrupt residue ('2021', '') likewise reads as NULL, not a crash
        try:
            return datetime.date(int(text[:4]), int(text[4:6]), int(text[6:8]))
        except ValueError:
            return None
    if ftype in ("N", "F"):
        if set(text) == {"*"}:  # asterisk fill = numeric-overflow null
            return None
        try:
            if ftype == "F" or fdec > 0:
                return float(text)
            # N with 0 declared decimals maps to LongType (spark_type);
            # a sloppy writer's '3.5' must coerce (truncate), not hand a
            # float to a long column and crash createDataFrame
            return int(text) if "." not in text else int(float(text))
        except ValueError:
            return None  # garbage residue reads as NULL, per lenient policy
    return text


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
