"""datatest_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the reference validation library's
semantics (validate(), Missing/Extra/Invalid/Deviation differences,
accepted() tolerances — see SURVEY.md) as distributed constraint
evaluation over tables of pre-tokenized training sequences, built on the
DataFrame API so Catalyst/Tungsten own the physical plan.
"""

from .acceptances import accepted
from .differences import (
    Deviation,
    Extra,
    Invalid,
    Missing,
    NOVALUE,
    ValidationError,
)
from .predicates import Predicate
from .schema import (
    INPUT_SCHEMA,
    MANIFEST_SCHEMA,
    VERDICT_SCHEMA,
    VIOLATION_SCHEMA,
    assert_schema,
)
from .session import get_spark
from .validation import valid, validate

__all__ = [
    "accepted",
    "assert_schema",
    "Deviation",
    "Extra",
    "get_spark",
    "INPUT_SCHEMA",
    "Invalid",
    "MANIFEST_SCHEMA",
    "Missing",
    "NOVALUE",
    "Predicate",
    "valid",
    "validate",
    "ValidationError",
    "VERDICT_SCHEMA",
    "VIOLATION_SCHEMA",
]

__version__ = "0.1.0"
