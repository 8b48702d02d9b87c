"""datatest 0.9.x ``allowed_*`` acceptance aliases (vintage API).

Old test suites written against the pre-1.0 reference use module-level
``allowed_missing()`` / ``allowed_deviation(...)`` context managers
(ref:datatest 0.9.x ``datatest/allowance.py``). Each alias maps onto the
modern ``accepted`` factory (SURVEY §3.2 / T-family), so vintage suites
run unchanged against the distributed engine — same context-manager
semantics, same composition operators.
"""

from __future__ import annotations

from .acceptances import accepted
from .differences import Deviation, Extra, Invalid, Missing


def allowed_missing():
    """0.9.x alias for ``accepted(Missing)``."""
    return accepted(Missing)


def allowed_extra():
    """0.9.x alias for ``accepted(Extra)``."""
    return accepted(Extra)


def allowed_invalid():
    """0.9.x alias for ``accepted(Invalid)``."""
    return accepted(Invalid)


def allowed_deviation(lower, upper=None):
    """0.9.x alias for ``accepted.tolerance(lower[, upper])``."""
    return accepted.tolerance(lower, upper)


def allowed_percent_deviation(lower, upper=None):
    """0.9.x alias for ``accepted.percent(lower[, upper])``."""
    return accepted.percent(lower, upper)


def allowed_specific(differences):
    """0.9.x alias for ``accepted(list_or_dict_of_differences)``."""
    return accepted(differences)


def allowed_key(function):
    """0.9.x alias for ``accepted.keys(function)``."""
    return accepted.keys(function)


def allowed_args(function):
    """0.9.x alias for ``accepted.args(function)``."""
    return accepted.args(function)


def allowed_limit(number):
    """0.9.x alias for ``accepted.count(number)``."""
    return accepted.count(number)


__all__ = [
    "allowed_missing", "allowed_extra", "allowed_invalid",
    "allowed_deviation", "allowed_percent_deviation", "allowed_specific",
    "allowed_key", "allowed_args", "allowed_limit",
]
