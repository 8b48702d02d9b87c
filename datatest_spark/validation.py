"""``validate()`` / ``valid()`` — the primary entry points (SURVEY.md §3.1).

Mirrors the reference's five-stage pipeline (``ref:datatest/validation.py``)
distributed: normalize → compile requirement → Catalyst plan → execute →
raise-adapter. Python inputs (lists, dicts, pandas) are normalized into
DataFrames on the active session so there is exactly one engine path; the
raise-adapter collects a bounded sample of violation rows and raises a
``ValidationError`` whose ``.differences`` carry reference-shaped
difference objects (list for element data, dict for grouped data).
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .differences import Deviation, Extra, Invalid, Missing, ValidationError
from .requirements import (
    RequiredApprox,
    RequiredFuzzy,
    RequiredInterval,
    RequiredMapping,
    RequiredOrder,
    RequiredPredicate,
    RequiredSet,
    RequiredSubset,
    RequiredSuperset,
    RequiredUnique,
    get_requirement,
)
from .schema import assert_schema

_COLLECT_CAP = 100_000


def _active_spark():
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("no active SparkSession; create one before validate()")
    return spark


def _normalize(data):
    """Normalize input to (DataFrame, value_columns, group_col).

    Reference parity (ref:datatest/_normalize.py, S1–S2): pandas objects go
    through Arrow; python mappings become (key, value) rows with the key as
    a *column* (SURVEY §1.1); iterables of tuples become multi-column rows.
    """
    if isinstance(data, DataFrame):
        return data, list(data.columns), None
    spark = _active_spark()
    try:
        import pandas as pd

        if isinstance(data, pd.DataFrame):
            df = spark.createDataFrame(data)
            return df, list(df.columns), None
        if isinstance(data, (pd.Series, pd.Index)):
            df = spark.createDataFrame(pd.DataFrame({"value": list(data)}))
            return df, ["value"], None
    except ImportError:
        pass
    try:
        import numpy as np

        if isinstance(data, np.ndarray):
            rows = data.tolist()
            data = rows
    except ImportError:
        pass
    if isinstance(data, Mapping):
        rows = []
        for k, v in data.items():
            if isinstance(v, Iterable) and not isinstance(v, (str, bytes, tuple)):
                for el in v:
                    rows.append((k, el))
            else:
                rows.append((k, v))
        df = spark.createDataFrame(rows, ["key", "value"])
        return df, ["key", "value"], "key"
    if isinstance(data, Iterable) and not isinstance(data, (str, bytes)):
        rows = list(data)
        if rows and isinstance(rows[0], tuple):
            ncol = len(rows[0])
            cols = ["c{0}".format(i) for i in range(ncol)]
            df = spark.createDataFrame(rows, cols)
            return df, cols, None
        df = spark.createDataFrame([(r,) for r in rows], ["value"])
        return df, ["value"], None
    raise TypeError("cannot normalize data of type {0}".format(type(data).__name__))


def _value_is_stringy(df, violations_value_source=None):
    """True if the underlying value column is string-typed (skip numeric
    re-parsing in the raise-adapter)."""
    if violations_value_source is None:
        return False
    for f in df.schema.fields:
        if f.name == violations_value_source:
            return isinstance(f.dataType, T.StringType)
    return False


def _rows_to_differences(rows, stringy_value, key_map=None):
    """Violation rows -> difference objects; dict when group keys present."""

    def _unstr(s):
        if s is None or not isinstance(s, str) or stringy_value:
            return s
        try:
            return int(s)
        except ValueError:
            pass
        try:
            return float(s)
        except ValueError:
            return s

    def build(row):
        k = row["kind"]
        if k == "missing":
            return Missing(_unstr(row["value"]))
        if k == "extra":
            return Extra(_unstr(row["value"]))
        if k == "invalid":
            if row["expected"] is None:
                return Invalid(_unstr(row["value"]))
            return Invalid(_unstr(row["value"]), _unstr(row["expected"]))
        exp = row["expected"]
        exp_n = None
        if exp is not None:
            try:
                exp_n = int(exp)
            except (TypeError, ValueError):
                try:
                    exp_n = float(exp)
                except (TypeError, ValueError):
                    exp_n = None
        dev = row["deviation"]
        if (
            dev is not None
            and math.isfinite(dev)
            and dev == int(dev)
            and (exp_n is None or isinstance(exp_n, int))
        ):
            dev = int(dev)
        return Deviation(dev, exp_n)

    grouped = any(r["group_key"] is not None for r in rows)
    if not grouped:
        return [build(r) for r in rows]
    out = {}
    for r in rows:
        gk = r["group_key"]
        if key_map and gk in key_map:
            gk = key_map[gk]
        out.setdefault(gk, []).append(build(r))
    return out


def _run(data, requirement, description=None, columns=None, id_col=None,
         group_col=None, limit=_COLLECT_CAP, _req_obj=None):
    req_pre = _req_obj if _req_obj is not None else (
        get_requirement(requirement) if not isinstance(requirement, DataFrame) else None
    )
    # In-memory sequences vs an order requirement use the reference's
    # exact difflib alignment driver-side (SURVEY O1); the Spark plan is
    # the positional at-scale variant for DataFrames.
    if (
        isinstance(req_pre, RequiredOrder)
        and not isinstance(data, DataFrame)
        and isinstance(data, (list, tuple))
    ):
        diffs = req_pre.differences_python(data)
        return ValidationError(diffs, description) if diffs else None
    df, cols, inferred_group = _normalize(data)
    if columns is not None:
        cols = [columns] if isinstance(columns, str) else list(columns)
    req = _req_obj if _req_obj is not None else get_requirement(requirement)
    gcol = group_col or (
        inferred_group if isinstance(req, RequiredMapping) else None
    )
    if isinstance(req, RequiredMapping) and gcol is None and len(cols) >= 2:
        gcol = cols[0]
    plan = req.violations(df, columns=cols, id_col=id_col, group_col=gcol)
    rows = [r.asDict() for r in plan.limit(limit).collect()]
    if not rows:
        return None
    value_src = None
    vcols = [c for c in cols if c != gcol and c != id_col]
    if len(vcols) == 1:
        value_src = vcols[0]
    stringy = _value_is_stringy(df, value_src)
    key_map = None
    if isinstance(req, RequiredMapping):
        key_map = {str(k): k for k in req.mapping}
    diffs = _rows_to_differences(rows, stringy, key_map)
    return ValidationError(diffs, description)


class _ValidateAPI(object):
    """Callable ``validate`` with method attributes (ref ``validation.py`` X/V table)."""

    def __call__(self, data, requirement, description=None, columns=None,
                 id_col=None, group_col=None):
        err = _run(data, requirement, description, columns, id_col, group_col)
        if err is not None:
            raise err

    # --- method surface (V2–V11) -----------------------------------------
    def predicate(self, data, predicate, description=None, **kw):
        err = _run(data, None, description, _req_obj=RequiredPredicate(predicate), **kw)
        if err is not None:
            raise err

    def regex(self, data, pattern, flags=0, description=None, **kw):
        import re

        rx = re.compile(pattern, flags) if isinstance(pattern, str) else pattern
        err = _run(data, None, description, _req_obj=RequiredPredicate(rx), **kw)
        if err is not None:
            raise err

    def approx(self, data, requirement, places=7, delta=None, description=None, **kw):
        err = _run(
            data, None, description,
            _req_obj=RequiredApprox(requirement, places=places, delta=delta), **kw
        )
        if err is not None:
            raise err

    def fuzzy(self, data, requirement, cutoff=0.6, description=None, **kw):
        err = _run(
            data, None, description,
            _req_obj=RequiredFuzzy(requirement, cutoff=cutoff), **kw
        )
        if err is not None:
            raise err

    def interval(self, data, min=None, max=None, description=None, **kw):
        err = _run(
            data, None, description, _req_obj=RequiredInterval(min, max), **kw
        )
        if err is not None:
            raise err

    def set(self, data, requirement, description=None, **kw):
        err = _run(data, None, description, _req_obj=RequiredSet(requirement), **kw)
        if err is not None:
            raise err

    def subset(self, data, requirement, description=None, **kw):
        err = _run(data, None, description, _req_obj=RequiredSubset(requirement), **kw)
        if err is not None:
            raise err

    def superset(self, data, requirement, description=None, **kw):
        err = _run(
            data, None, description, _req_obj=RequiredSuperset(requirement), **kw
        )
        if err is not None:
            raise err

    def unique(self, data, description=None, **kw):
        err = _run(data, None, description, _req_obj=RequiredUnique(), **kw)
        if err is not None:
            raise err

    def order(self, data, sequence, order_by=None, description=None, **kw):
        err = _run(
            data, None, description,
            _req_obj=RequiredOrder(sequence, order_by=order_by), **kw
        )
        if err is not None:
            raise err

    def schema(self, df, struct_type, check_nullability=False):
        """Engine extension: declared-StructType conformance (P2 at scale)."""
        assert_schema(df, struct_type, check_nullability)


validate = _ValidateAPI()


def valid(data, requirement, **kw):
    """True iff validation finds no differences (V12). Short-circuits with
    ``isEmpty()`` — no driver-side collection of violations."""
    df, cols, inferred_group = _normalize(data)
    columns = kw.get("columns")
    if columns is not None:
        cols = [columns] if isinstance(columns, str) else list(columns)
    req = get_requirement(requirement)
    gcol = kw.get("group_col") or (
        inferred_group if isinstance(req, RequiredMapping) else None
    )
    if isinstance(req, RequiredMapping) and gcol is None and len(cols) >= 2:
        gcol = cols[0]
    plan = req.violations(
        df, columns=cols, id_col=kw.get("id_col"), group_col=gcol
    )
    return plan.isEmpty()
