"""Predicate — the scalar expression language (SURVEY.md §2.2, P1–P9).

Re-expresses the reference's ``Predicate`` matcher
(``ref:datatest/_predicate.py``) in two coupled forms:

  * a **pure-Python matcher** (``Predicate.__call__``) with exact reference
    semantics — used for acceptance key/args filtering, for python-object
    inputs, and as the test oracle;
  * a **Spark Column compiler** (``compile_predicate``) producing a boolean
    ``pyspark.sql.Column`` so the hot path stays JVM-side (no per-row Python).

Predicate forms:
  P1 scalar        → NaN-safe equality
  P2 type          → isinstance / cast-check
  P3 regex         → re.search / rlike
  P4 set           → membership / isin
  P5 callable      → truthy f(value)  (Column path via pandas_udf, see
                     operators/rowpred.py — callables are the slow path)
  P6 True / False  → truthiness
  P7 tuple         → elementwise over row tuples
  P8 Ellipsis      → wildcard
  P9 ~Predicate    → negation
"""

from __future__ import annotations

import math
import re
from numbers import Number

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_regex_type = type(re.compile(""))


def _is_nan(x):
    return isinstance(x, float) and math.isnan(x)


def _match_scalar(req, value):
    """NaN-safe equality (P1)."""
    if _is_nan(req):
        return _is_nan(value)
    try:
        return bool(req == value)
    except Exception:
        return False


def _matcher(obj):
    """Return a python-side matcher function for one (non-tuple) predicate form."""
    if obj is Ellipsis:
        return lambda v: True
    if isinstance(obj, type):
        return lambda v: isinstance(v, obj)
    if isinstance(obj, _regex_type):
        return lambda v: isinstance(v, str) and bool(obj.search(v))
    if isinstance(obj, (set, frozenset)):
        return lambda v: v in obj
    if obj is True:
        return lambda v: v is True or (bool(v) and v == 1)
    if obj is False:
        return lambda v: v is False or (not bool(v) and v == 0)
    if isinstance(obj, Predicate):
        return obj
    if callable(obj):
        return lambda v: bool(obj(v))
    return lambda v: _match_scalar(obj, v)


class Predicate(object):
    """Callable predicate with reference matching semantics.

    ``Predicate(obj)(value) -> bool``; ``~Predicate(obj)`` negates (P9).
    """

    def __init__(self, obj, _negated=False):
        if isinstance(obj, Predicate):
            self.obj = obj.obj
            self._negated = obj._negated != _negated
        else:
            self.obj = obj
            self._negated = _negated
        if isinstance(self.obj, tuple):
            self._fns = tuple(_matcher(o) for o in self.obj)
            self._is_tuple = True
        else:
            self._fns = _matcher(self.obj)
            self._is_tuple = False

    def __call__(self, value):
        if self._is_tuple:
            if not isinstance(value, (tuple, list)) or len(value) != len(self._fns):
                result = False
            else:
                result = all(fn(v) for fn, v in zip(self._fns, value))
        else:
            result = bool(self._fns(value))
        return (not result) if self._negated else result

    def __invert__(self):
        return Predicate(self.obj, _negated=not self._negated)

    def __eq__(self, other):
        if not isinstance(other, Predicate):
            return NotImplemented
        return self.obj == other.obj and self._negated == other._negated

    def __repr__(self):
        inner = getattr(self.obj, "pattern", self.obj)
        return "{0}Predicate({1!r})".format("~" if self._negated else "", inner)


_SPARK_TYPE_FOR_PY = {
    int: "bigint",
    float: "double",
    str: "string",
    bool: "boolean",
}


_NUMERIC_DTYPES = ("tinyint", "smallint", "int", "bigint", "float", "double")


def compile_predicate(obj, col, dtype=None):
    """Compile a predicate form to a boolean Column over ``col`` (P1–P9).

    ``col`` may be a Column or a column name. ``dtype`` (the column's Spark
    dtype string, when the caller knows it) disambiguates forms whose
    semantics depend on the column type — True/False predicates on numeric
    columns must match Python's ``v == True`` (only 1/1.0, not any truthy
    numeric) and never match strings. Callables are NOT handled here
    (they need a pandas_udf and a declared dtype — see
    ``operators/rowpred.py``); passing one raises TypeError so callers fall
    back to the vectorized-UDF path explicitly.
    """
    if isinstance(col, str):
        col = F.col(col)

    if isinstance(obj, Predicate):
        inner = compile_predicate(obj.obj, col, dtype)
        return ~inner if obj._negated else inner
    if obj is Ellipsis:
        return F.lit(True)
    if isinstance(obj, type):
        if obj not in _SPARK_TYPE_FOR_PY:
            raise TypeError("unsupported type predicate: {0!r}".format(obj))
        # Cast-check (P2): value is "of type T" if it casts cleanly. NULL
        # fails, matching the python oracle (isinstance(None, T) is False).
        # For strongly-typed DataFrames the schema check is the real gate;
        # this covers string-typed columns.
        target = _SPARK_TYPE_FOR_PY[obj]
        return col.try_cast(target).isNotNull()
    if isinstance(obj, _regex_type):
        return col.rlike(obj.pattern)
    if isinstance(obj, (set, frozenset)):
        vals = list(obj)
        if any(_is_nan(v) for v in vals):
            non_nan = [v for v in vals if not _is_nan(v)]
            cond = F.isnan(col)
            if non_nan:
                cond = cond | col.isin(non_nan)
            return cond
        return col.isin(vals)
    if obj is True or obj is False:
        # Python matcher parity: v == True holds only for True/1/1.0;
        # strings never equal booleans. try_cast('boolean') would accept
        # any string Spark parses as boolean ('t', 'yes') and map numeric
        # 5 to true — divergent. Branch on the column dtype when known.
        if dtype is not None and (
            dtype in _NUMERIC_DTYPES or dtype.startswith("decimal")
        ):
            return col.eqNullSafe(F.lit(1 if obj else 0))
        if dtype == "boolean":
            return col.eqNullSafe(F.lit(obj))
        if dtype is not None:
            return F.lit(False)  # strings/dates/... never equal a boolean
        return col.try_cast("boolean").eqNullSafe(F.lit(obj))
    if isinstance(obj, Column):
        return obj
    if isinstance(obj, tuple):
        raise TypeError("tuple predicates compile per-column; use compile_row_predicate")
    if callable(obj):
        raise TypeError(
            "callable predicates need the vectorized-UDF path (operators/rowpred)"
        )
    # P1 scalar: NaN-safe equality. Only JVM-expressible literals are
    # accepted — anything else gets a clear error instead of a py4j crash.
    if _is_nan(obj):
        return F.isnan(col)
    if obj is not None and not isinstance(
        obj, (str, bytes, bool, int, float, complex)
    ):
        import datetime
        import decimal

        if not isinstance(
            obj, (datetime.date, datetime.datetime, decimal.Decimal)
        ):
            raise TypeError(
                "unsupported requirement object: {0!r} (not a literal, type, "
                "regex, set, mapping, list, or callable)".format(obj)
            )
    return col.eqNullSafe(F.lit(obj))


def compile_row_predicate(obj, cols, dtypes=None):
    """Compile a tuple predicate (P7/P8) over a list of Columns/names.

    ``dtypes`` (parallel to ``cols``) threads the per-column Spark dtype
    through to the element compiles — same True/False-vs-numeric parity
    as the single-column path."""
    if isinstance(obj, Predicate):
        inner = compile_row_predicate(obj.obj, cols, dtypes)
        return ~inner if obj._negated else inner
    if dtypes is None:
        dtypes = [None] * len(cols)
    if not isinstance(obj, tuple):
        if len(cols) != 1:
            raise ValueError("non-tuple predicate against {0} columns".format(len(cols)))
        return compile_predicate(obj, cols[0], dtypes[0])
    if len(obj) != len(cols):
        raise ValueError(
            "tuple predicate length {0} != column count {1}".format(len(obj), len(cols))
        )
    conjuncts = []
    for p, c, dt in zip(obj, cols, dtypes):
        if p is Ellipsis:
            continue
        inner = p.obj if isinstance(p, Predicate) else p
        if (
            callable(inner)
            and not isinstance(inner, type)
            and not isinstance(inner, _regex_type)
        ):
            conjuncts.append(compile_callable(p, c))
        else:
            conjuncts.append(compile_predicate(p, c, dt))
    if not conjuncts:
        return F.lit(True)
    out = conjuncts[0]
    for c in conjuncts[1:]:
        out = out & c
    return out


def compile_callable(obj, col):
    """Column for a callable predicate (P5) — vectorized pandas UDF.

    Applies full Predicate matching semantics per batch (Arrow transfer);
    a difference-returning callable bool-coerces truthy and counts as a
    MATCH in this filter context — identical to the driver-side
    ``Predicate.__call__`` and to ``_apply_post``'s truthiness test (the
    difference-materializing form lives in operators/rowpred.py).
    """
    pred = obj if isinstance(obj, Predicate) else Predicate(obj)

    @F.pandas_udf(T.BooleanType())
    def _match(s: pd.Series) -> pd.Series:
        import math

        out = []
        for v in s:
            # Arrow surfaces numeric nulls as NaN; the driver-side matcher
            # sees Python None for missing values, so normalize for parity
            # (same rule as operators/rowpred.callable_violations)
            if v is None or (isinstance(v, float) and math.isnan(v)):
                v = None
            try:
                r = pred(v)
            except Exception:
                r = False
            # pred is always a Predicate, whose __call__ bool-coerces —
            # r is a plain bool by the time it lands here
            out.append(bool(r))
        return pd.Series(out, dtype="bool")

    if isinstance(col, str):
        col = F.col(col)
    return _match(col)


def is_numeric_scalar(obj):
    """True if a failed equality against ``obj`` should yield a Deviation."""
    return isinstance(obj, Number) and not isinstance(obj, bool)
