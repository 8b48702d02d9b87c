"""Thin reference-API compatibility helpers (SURVEY S6, F7, X1).

``working_directory`` and ``RepeatingContainer`` are plain-Python
utilities in the reference; ``DataTestCase`` is the unittest shim — all
three exist so test code written against the reference runs unchanged.
"""

from __future__ import annotations

import os
import unittest
from functools import wraps

from .acceptances import accepted
from .validation import validate


class working_directory(object):
    """Context manager / decorator that chdirs relative to a file
    (ref:datatest/_working_directory.py): test-relative data paths."""

    def __init__(self, path):
        if os.path.isfile(path):
            path = os.path.dirname(path)
        self._path = path
        self._previous = None

    def __enter__(self):
        self._previous = os.getcwd()
        os.chdir(self._path)
        return self

    def __exit__(self, exc_type, exc, tb):
        os.chdir(self._previous)
        return False

    def __call__(self, func):
        @wraps(func)
        def wrapper(*args, **kwargs):
            with working_directory(self._path):
                return func(*args, **kwargs)

        return wrapper


class RepeatingContainer(object):
    """Broadcast one method/operator chain across N objects
    (ref:datatest/_repeatingcontainer.py): compare several sources with
    a single pipeline. Returns a new RepeatingContainer of results;
    unpack with ``a, b = container``."""

    def __init__(self, items):
        self._items = list(items)

    def __iter__(self):
        return iter(self._items)

    def __len__(self):
        return len(self._items)

    def __getattr__(self, name):
        attrs = [getattr(x, name) for x in self._items]
        if all(callable(a) for a in attrs):
            def call(*args, **kwargs):
                return RepeatingContainer([a(*args, **kwargs) for a in attrs])

            return call
        return RepeatingContainer(attrs)

    def __getitem__(self, key):
        return RepeatingContainer([x[key] for x in self._items])

    def __call__(self, *args, **kwargs):
        return RepeatingContainer([x(*args, **kwargs) for x in self._items])

    def __repr__(self):
        return "RepeatingContainer({0!r})".format(self._items)


class DataTestCase(unittest.TestCase):
    """unittest shim (ref:datatest/case.py): ``assertValid`` plus
    ``accepted*`` conveniences delegating to the engine."""

    def assertValid(self, data, requirement, msg=None):
        validate(data, requirement, description=msg)

    def accepted(self, obj):
        return accepted(obj)

    def acceptedTolerance(self, lower, upper=None):
        return accepted.tolerance(lower, upper)

    def acceptedPercent(self, lower, upper=None):
        return accepted.percent(lower, upper)

    def acceptedCount(self, number):
        return accepted.count(number)

    def acceptedKeys(self, predicate):
        return accepted.keys(predicate)

    def acceptedArgs(self, predicate):
        return accepted.args(predicate)

    def acceptedFuzzy(self, cutoff=0.6):
        return accepted.fuzzy(cutoff)


def mandatory(test_method):
    """``@mandatory`` (ref:datatest/runner.py X3): a failing mandatory
    test stops the whole run — later tests depend on its invariant
    (e.g. schema conformance gates every value check).

    Works with ``DataTestRunner`` below; under pytest the equivalent is
    running with ``-x`` or ordering mandatory tests first in a session
    fixture (documented in COVERAGE.md §2.11).
    """
    test_method.__datatest_mandatory__ = True
    return test_method


class _MandatoryStopResult(unittest.TextTestResult):
    """TextTestResult that stops the run when a @mandatory test fails."""

    def _is_mandatory(self, test):
        method = getattr(test, getattr(test, "_testMethodName", ""), None)
        return bool(getattr(method, "__datatest_mandatory__", False))

    def addFailure(self, test, err):
        super().addFailure(test, err)
        if self._is_mandatory(test):
            self.stop()

    def addError(self, test, err):
        super().addError(test, err)
        if self._is_mandatory(test):
            self.stop()


class DataTestRunner(unittest.TextTestRunner):
    """unittest runner honoring ``@mandatory`` (ref:datatest/runner.py)."""

    resultclass = _MandatoryStopResult


def main(module="__main__", **kwargs):
    """``datatest.main()`` parity: unittest.main with DataTestRunner."""
    kwargs.setdefault("testRunner", DataTestRunner)
    return unittest.main(module=module, **kwargs)
