"""Difference classes — the validation output vocabulary.

Re-expresses the reference's difference objects (``ref:datatest/differences.py``,
see SURVEY.md §2.8) as plain dataclass-like value objects used by the
driver-side ``ValidationError`` adapter, plus helpers to map them to/from the
distributed *violation row* representation (SURVEY.md §1.3).

Invariants pinned by tests/test_differences.py (D1–D5):
  * equality and hashing by ``(type, args)``;
  * ``repr`` round-trips through ``eval``;
  * ``Deviation`` requires numeric, non-zero deviation (NaN allowed) and a
    numeric (or None/empty) expected value.
"""

from __future__ import annotations

import math
from numbers import Number


class NOVALUE(object):
    """Sentinel for an omitted value (mirrors the reference's _NOVALUE)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "<no value>"

    def __bool__(self):
        return False


NOVALUE = NOVALUE()


def _nan_aware_eq(a, b):
    """Equality where NaN == NaN (the reference compares args NaN-aware)."""
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
    return a == b


class BaseDifference(object):
    """Base class: value object identified by (class, args)."""

    __slots__ = ()

    @property
    def args(self):
        raise NotImplementedError

    def __eq__(self, other):
        if type(self) is not type(other):
            return NotImplemented
        sargs, oargs = self.args, other.args
        if len(sargs) != len(oargs):
            return False
        return all(_nan_aware_eq(a, b) for a, b in zip(sargs, oargs))

    def __ne__(self, other):
        result = self.__eq__(other)
        if result is NotImplemented:
            return result
        return not result

    def __hash__(self):
        # hash(5) == hash(5.0) in Python, matching the int/float-tolerant
        # __eq__; unhashable args fall back to their reprs.
        try:
            return hash((type(self).__name__, self.args))
        except TypeError:
            return hash((type(self).__name__, tuple(repr(a) for a in self.args)))

    def __repr__(self):
        cls = type(self).__name__
        return "{0}({1})".format(cls, ", ".join(repr(a) for a in self.args))


class Missing(BaseDifference):
    """A required element that is absent from the data."""

    __slots__ = ("_args",)

    def __init__(self, value):
        self._args = (value,)

    @property
    def args(self):
        return self._args


class Extra(BaseDifference):
    """An element present in the data but not allowed by the requirement."""

    __slots__ = ("_args",)

    def __init__(self, value):
        self._args = (value,)

    @property
    def args(self):
        return self._args


class Invalid(BaseDifference):
    """An element that failed a predicate; optionally carries the expected."""

    __slots__ = ("_args",)

    def __init__(self, invalid, expected=NOVALUE):
        if expected is NOVALUE:
            self._args = (invalid,)
        else:
            self._args = (invalid, expected)

    @property
    def args(self):
        return self._args

    @property
    def invalid(self):
        return self._args[0]

    @property
    def expected(self):
        return self._args[1] if len(self._args) > 1 else NOVALUE

    def __repr__(self):
        cls = type(self).__name__
        if len(self._args) == 1:
            return "{0}({1!r})".format(cls, self._args[0])
        return "{0}({1!r}, expected={2!r})".format(cls, *self._args)


def _is_numeric(x):
    return isinstance(x, Number) and not isinstance(x, bool)


class Deviation(BaseDifference):
    """Numeric difference ``actual - expected``.

    Construction rules (reference parity, SURVEY.md D4):
      * ``deviation`` must be numeric and non-zero (NaN is allowed);
      * ``expected`` must be numeric, or None/'' (the empty-vs-number cases);
      * if ``expected`` is empty, any non-empty numeric deviation is allowed;
      * zero or empty deviation with numeric expected raises ValueError.
    """

    __slots__ = ("_args",)

    def __init__(self, deviation, expected):
        dev_empty = deviation is None or deviation == ""
        exp_empty = expected is None or expected == ""

        if exp_empty:
            if dev_empty or not _is_numeric(deviation):
                raise ValueError(
                    "deviation must be a non-empty number when expected is empty, "
                    "got deviation={0!r}, expected={1!r}".format(deviation, expected)
                )
        else:
            if not _is_numeric(expected):
                raise ValueError(
                    "expected must be numeric or empty, got {0!r}".format(expected)
                )
            ok = _is_numeric(deviation) and (
                deviation != 0 or (isinstance(deviation, float) and math.isnan(deviation))
            )
            if not ok:
                raise ValueError(
                    "deviation must be a non-zero number, got {0!r}".format(deviation)
                )
        self._args = (deviation, expected)

    @property
    def args(self):
        return self._args

    @property
    def deviation(self):
        return self._args[0]

    @property
    def expected(self):
        return self._args[1]

    @property
    def percent_deviation(self):
        dev, exp = self._args
        if not _is_numeric(dev):
            return 0.0
        if isinstance(dev, float) and math.isnan(dev):
            return float("nan")
        if not _is_numeric(exp) or exp == 0:
            return 0.0 if not dev else float("nan")
        return dev / exp

    def __repr__(self):
        dev, exp = self._args
        if _is_numeric(dev) and not (isinstance(dev, float) and math.isnan(dev)) and dev > 0:
            dev_repr = "+{0!r}".format(dev)
        else:
            dev_repr = repr(dev)
        return "Deviation({0}, {1!r})".format(dev_repr, exp)


class ValidationError(AssertionError):
    """Raised when validation finds differences.

    Mirrors the reference's exception surface (``ref:datatest/validation.py``):
    ``.differences`` is a list (element data) or dict (grouped data) of
    difference objects; ``.description`` is the optional message. ``__str__``
    truncates long difference lists (SURVEY.md O2).
    """

    _TRUNCATE_AT = 16

    def __init__(self, differences, description=None):
        if isinstance(differences, dict):
            norm = {
                k: (list(v) if isinstance(v, (list, tuple)) else [v])
                for k, v in differences.items()
            }
            flat_count = sum(len(v) for v in norm.values())
        else:
            norm = list(differences)
            flat_count = len(norm)
        if not flat_count:
            raise ValueError("differences must not be empty")
        self._differences = norm
        self.description = description
        super().__init__(norm, description)

    @property
    def differences(self):
        return self._differences

    def __len__(self):
        if isinstance(self._differences, dict):
            return sum(len(v) for v in self._differences.values())
        return len(self._differences)

    def __str__(self):
        desc = self.description or "validation failed"
        if isinstance(self._differences, dict):
            lines = []
            for k, v in self._differences.items():
                lines.append("    {0!r}: {1},".format(k, v))
        else:
            lines = ["    {0},".format(d) for d in self._differences]
        total = len(lines)
        if total > self._TRUNCATE_AT:
            shown = lines[: self._TRUNCATE_AT]
            shown.append("    ... ({0} differences total)".format(len(self)))
            lines = shown
        return "{0} ({1} difference{2}): [\n{3}\n]".format(
            desc, len(self), "s" if len(self) != 1 else "", "\n".join(lines)
        )
