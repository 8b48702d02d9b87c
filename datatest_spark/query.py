"""Legacy query layer — ``Select`` / ``Query`` / ``Result`` (SURVEY §3.3).

The reference's earlier vintages shipped a small query engine
(``ref:datatest/_query/query.py``, later the ``squint`` package): a
``Select`` loads a source into in-memory SQLite; ``select()`` builds a
deferred ``Query`` op-chain; aggregation methods append steps; execution
compiles to a SQLite SELECT and reshapes rows per an *evaluation type*
(list / dict / set / tuple).

Here the execution store is Spark and the planner is Catalyst — each
op-chain compiles to a DataFrame plan lazily; ``fetch()``/``execute()``
runs it and reshapes into the reference's container conventions:

  * ``select('A')``            -> list of values
  * ``select(['A', 'B'])``     -> list of lists  (list selection = list rows)
  * ``select(('A', 'B'))``     -> list of tuples (tuple selection = tuple rows)
  * ``select({'A': 'B'})``     -> dict {a: [b, ...]} (mapping = group-by key)
  * ``select({('A','B'): 'C'})`` -> composite keys
  * kwargs are where-filters whose values may be predicate objects (P1-P9)

Aggregations (`sum/avg/min/max/count/distinct`) collapse the inner lists;
grouped selections aggregate per key (one ``groupBy`` plan — no driver
loops). A ``Query`` is immutable; every method returns a new one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .predicates import Predicate, compile_predicate


def _filter_condition(df, pred, col_name):
    """The one filter-compile dispatch (callable -> pandas-UDF match,
    everything else -> native Column predicate), shared by kwargs-where,
    fetch()'s pre-aggregation filters, and to_df()."""
    inner = pred.obj if isinstance(pred, Predicate) else pred
    if callable(inner) and not isinstance(inner, type) and not hasattr(inner, "pattern"):
        from .predicates import compile_callable

        return compile_callable(pred, F.col(col_name))
    return compile_predicate(
        pred, F.col(col_name), dtype=dict(df.dtypes).get(col_name)
    )


def _compile_where(df, kwargs):
    cond = None
    for col, req in kwargs.items():
        c = _filter_condition(df, req, col)
        cond = c if cond is None else (cond & c)
    return df.filter(cond) if cond is not None else df


class Select(object):
    """A queryable source: DataFrame, csv/json/parquet/Excel path, DBAPI2
    cursor, or table name.

    ``Select(path)`` mirrors the reference's loader dispatch
    (``Select('f.csv')``, ``Select('f.xlsx')``, ``Select(cursor)`` —
    ref:datatest/_load/get_reader.py) with Spark readers; the
    in-memory-SQLite store is replaced by the DataFrame itself (not
    ported by design — SURVEY S5).
    """

    def __init__(self, source, spark: SparkSession | None = None, **reader_opts):
        from .sources.external import (
            is_dbapi_cursor,
            load_dbapi,
            load_dbf,
            load_excel,
        )

        if isinstance(source, DataFrame):
            self._df = source
        else:
            spark = spark or SparkSession.getActiveSession()
            if spark is None:
                raise RuntimeError("no active SparkSession for Select()")
            if is_dbapi_cursor(source):
                self._df = load_dbapi(spark, source, **reader_opts)
                return
            s = str(source)
            if s.endswith(".csv"):
                # .options() so datasource options outside csv()'s fixed
                # keyword set forward instead of raising TypeError
                self._df = (
                    spark.read.option("header", reader_opts.pop("header", True))
                    .option("inferSchema", reader_opts.pop("inferSchema", True))
                    .options(**reader_opts)
                    .csv(s)
                )
            elif s.endswith(".json"):
                self._df = spark.read.options(**reader_opts).json(s)
            elif s.endswith((".xlsx", ".xls")):
                self._df = load_excel(spark, s, **reader_opts)
            elif s.lower().endswith(".dbf"):
                # case-insensitive: DOS-era 8.3 names are uppercase (DATA.DBF)
                self._df = load_dbf(spark, s, **reader_opts)
            elif s.endswith(".orc"):
                # options(): DataFrameReader.orc() itself only accepts a
                # fixed keyword set and would TypeError on anything else
                self._df = spark.read.options(**reader_opts).orc(s)
            elif s.endswith(".parquet") or "/" in s:
                self._df = spark.read.parquet(s, **reader_opts)
            else:
                self._df = spark.table(s)

    @property
    def fieldnames(self):
        return list(self._df.columns)

    def __call__(self, columns, **where):
        return Query(self._df, columns, where)

    def create_index(self, *columns):  # reference API parity: no-op hint
        """SQLite-vintage API; on Spark this is a repartition hint."""
        self._df = self._df.repartition(*[F.col(c) for c in columns])
        return self


def _normalize_selection(columns):
    """-> (key_cols or None, value_cols, value_container, key_is_tuple)."""
    if isinstance(columns, dict):
        if len(columns) != 1:
            raise ValueError("mapping selection takes one {key: value} pair")
        (k, v), = columns.items()
        keys = list(k) if isinstance(k, (tuple, list)) else [k]
        v_keys, v_vals, v_container, _ = _normalize_selection(v)
        if v_keys is not None:
            raise ValueError("nested mapping selections are not supported")
        return keys, v_vals, v_container, isinstance(k, tuple)
    if isinstance(columns, tuple):
        return None, list(columns), tuple, False
    if isinstance(columns, list):
        inner = columns[0] if columns and isinstance(columns[0], (list, tuple)) else None
        if inner is not None:
            return None, list(inner), (tuple if isinstance(columns[0], tuple) else list), False
        return None, list(columns), list, False
    return None, [columns], None, False  # scalar selection -> bare values


class Query(object):
    """Deferred op-chain over a DataFrame (immutable)."""

    def __init__(self, df, columns, where, _ops=None):
        self._df = df
        self._columns = columns
        self._where = dict(where or {})
        self._ops = list(_ops or [])

    def _chain(self, op):
        return Query(self._df, self._columns, self._where, self._ops + [op])

    # -- chainable ops (F3, F4, A1-A6) ------------------------------------
    def filter(self, predicate):
        return self._chain(("filter", predicate))

    def map(self, func):
        return self._chain(("map", func))

    def sum(self):
        return self._chain(("agg", "sum"))

    def avg(self):
        return self._chain(("agg", "avg"))

    def min(self):
        return self._chain(("agg", "min"))

    def max(self):
        return self._chain(("agg", "max"))

    def count(self):
        return self._chain(("agg", "count"))

    def distinct(self):
        return self._chain(("distinct", None))

    def apply(self, func):
        return self._chain(("apply", func))

    def flatten(self):
        return self._chain(("flatten", None))

    def unwrap(self):
        return self._chain(("unwrap", None))

    def reduce(self, func):
        return self._chain(("reduce", func))

    # -- execution ----------------------------------------------------------
    _AGG_FN = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
               "count": F.count}

    def to_df(self) -> DataFrame:
        """The compiled Spark plan with every relationally-expressible
        chained op applied: filter (as a row filter on the value column),
        distinct, and a trailing aggregation. Ops that only exist
        driver-side on fetched containers — map/apply/flatten/unwrap/
        reduce, or a filter chained after an aggregation — raise
        NotImplementedError instead of being silently dropped."""
        keys, vals, _container, _ = _normalize_selection(self._columns)
        df = _compile_where(self._df, self._where)
        agg = None
        distinct = False
        for op, arg in self._ops:
            if op == "agg":
                if agg is not None:
                    raise NotImplementedError(
                        "chained aggregations have no single relational form"
                    )
                agg = arg
            elif op == "distinct":
                if agg is not None:
                    raise NotImplementedError("distinct() after an aggregation")
                distinct = True
            elif op == "filter":
                if agg is not None:
                    raise NotImplementedError(
                        "filter() after an aggregation has no relational "
                        "form; fetch() applies it driver-side"
                    )
                if len(vals) != 1:
                    raise NotImplementedError(
                        "relational filter needs a single value column"
                    )
                df = df.filter(_filter_condition(df, arg, vals[0]))
            else:
                raise NotImplementedError(
                    "{0}() has no relational form; use fetch()".format(op)
                )
        if agg is not None:
            if distinct and agg != "count":
                df = df.select(*(keys or []), *vals).distinct()
            if distinct and agg == "count":
                exprs = [F.countDistinct(F.col(v)).alias(v) for v in vals]
            elif agg == "count":
                exprs = [F.count(F.col(v)).alias(v) for v in vals]
            else:
                exprs = [self._AGG_FN[agg](F.col(v)).alias(v) for v in vals]
            return df.groupBy(*keys).agg(*exprs) if keys else df.agg(*exprs)
        sel = df.select(*(keys or []), *vals)
        return sel.distinct() if distinct else sel

    def fetch(self):
        keys, vals, container, key_is_tuple = _normalize_selection(self._columns)
        df = _compile_where(self._df, self._where)

        # Honor chain order: ops BEFORE an aggregation apply to the plan
        # (filter/distinct compile to DataFrame ops); ops after apply to
        # the fetched result. map/apply before an agg have no relational
        # form — rejected with a clear error rather than silently
        # reordered.
        agg = None
        post = []
        distinct = False
        for i, (op, arg) in enumerate(self._ops):
            later_agg = any(o == "agg" for o, _ in self._ops[i + 1:])
            if op == "agg":
                agg = arg
            elif op == "distinct":
                if any(o == "agg" for o, _ in self._ops[:i]) :
                    raise NotImplementedError("distinct() after an aggregation")
                distinct = True
            elif later_agg:
                if op == "filter":
                    if len(vals) != 1:
                        raise NotImplementedError(
                            "pre-aggregation filter needs a single value column"
                        )
                    df = df.filter(_filter_condition(df, arg, vals[0]))
                else:
                    raise NotImplementedError(
                        "{0}() before an aggregation has no relational form; "
                        "chain it after the aggregate".format(op)
                    )
            else:
                post.append((op, arg))

        if agg is not None:
            if distinct and agg != "count":
                # distinct-then-aggregate: reduce to distinct rows first
                df = df.select(*(keys or []), *vals).distinct()
            if agg == "count":
                exprs = [F.count(F.col(v)).alias(v) for v in vals]
            else:
                exprs = [self._AGG_FN[agg](F.col(v)).alias(v) for v in vals]
            if distinct and agg == "count":
                exprs = [F.countDistinct(F.col(v)).alias(v) for v in vals]
            if keys:
                rows = df.groupBy(*keys).agg(*exprs).collect()
                out = {}
                for r in rows:
                    k = tuple(r[c] for c in keys) if key_is_tuple or len(keys) > 1 else r[keys[0]]
                    v = tuple(r[c] for c in vals) if container is tuple else (
                        [r[c] for c in vals] if container is list else r[vals[0]]
                    )
                    out[k] = v
                result = out
            else:
                r = df.agg(*exprs).collect()[0]
                result = (
                    tuple(r[c] for c in vals) if container is tuple
                    else [r[c] for c in vals] if container is list
                    else r[vals[0]]
                )
        else:
            sel = df.select(*(keys or []), *vals)
            if distinct:
                sel = sel.distinct()
            rows = sel.collect()
            if keys:
                out = {}
                for r in rows:
                    k = tuple(r[c] for c in keys) if key_is_tuple or len(keys) > 1 else r[keys[0]]
                    v = (
                        tuple(r[c] for c in vals) if container is tuple
                        else [r[c] for c in vals] if container is list
                        else r[vals[0]]
                    )
                    out.setdefault(k, []).append(v)
                result = out
            else:
                result = [
                    tuple(r[c] for c in vals) if container is tuple
                    else [r[c] for c in vals] if container is list
                    else r[vals[0]]
                    for r in rows
                ]

        for op, arg in post:
            result = self._apply_post(op, arg, result)
        return result

    execute = fetch

    @staticmethod
    def _apply_post(op, arg, result):
        import functools

        if op == "map":
            if isinstance(result, dict):
                return {k: [arg(x) for x in v] if isinstance(v, list) else arg(v)
                        for k, v in result.items()}
            if isinstance(result, list):
                return [arg(x) for x in result]
            return arg(result)
        if op == "filter":
            pred = arg if callable(arg) else Predicate(arg)
            if isinstance(result, dict):
                # list values filter their elements; scalar values (post-
                # aggregation groups) keep or drop the whole entry
                out = {}
                for k, v in result.items():
                    if isinstance(v, list):
                        out[k] = [x for x in v if pred(x)]
                    elif pred(v):
                        out[k] = v
                return out
            if isinstance(result, list):
                return [x for x in result if pred(x)]
            # ungrouped aggregation: scalar in, scalar-or-None out
            return result if pred(result) else None
        if op == "apply":
            return arg(result)
        if op == "flatten":
            if isinstance(result, dict):
                return [
                    (k, x)
                    for k, v in result.items()
                    for x in (v if isinstance(v, list) else [v])
                ]
            return result
        if op == "unwrap":
            if isinstance(result, list) and len(result) == 1:
                return result[0]
            return result
        if op == "reduce":
            if isinstance(result, dict):
                return {k: functools.reduce(arg, v) for k, v in result.items()}
            return functools.reduce(arg, result)
        raise ValueError("unknown op {0}".format(op))


class Result(list):
    """Reference API parity: fetch() already returns plain containers, so
    Result is only a typed alias used by the DataTestCase shim."""

    def __init__(self, iterable=(), evaluation_type=list):
        super().__init__(iterable)
        self.evaluation_type = evaluation_type
