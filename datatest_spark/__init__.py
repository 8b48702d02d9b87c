"""datatest_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-expression of the reference validation library's
semantics (validate(), Missing/Extra/Invalid/Deviation differences,
accepted() tolerances — see SURVEY.md) as distributed constraint
evaluation over tables of pre-tokenized training sequences, built on the
DataFrame API so Catalyst/Tungsten own the physical plan.
"""

from .acceptances import accepted
from .compat import (
    DataTestCase,
    DataTestRunner,
    RepeatingContainer,
    main,
    mandatory,
    working_directory,
)
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
from .query import Query, Select
from .session import get_spark
from .validation import valid, validate
from .vintage import (
    allowed_args,
    allowed_deviation,
    allowed_extra,
    allowed_invalid,
    allowed_key,
    allowed_limit,
    allowed_missing,
    allowed_percent_deviation,
    allowed_specific,
)

__all__ = [
    "accepted",
    "allowed_args",
    "allowed_deviation",
    "allowed_extra",
    "allowed_invalid",
    "allowed_key",
    "allowed_limit",
    "allowed_missing",
    "allowed_percent_deviation",
    "allowed_specific",
    "assert_schema",
    "DataTestCase",
    "DataTestRunner",
    "Deviation",
    "Extra",
    "get_spark",
    "INPUT_SCHEMA",
    "Invalid",
    "main",
    "mandatory",
    "MANIFEST_SCHEMA",
    "Missing",
    "NOVALUE",
    "Predicate",
    "Query",
    "RepeatingContainer",
    "Select",
    "valid",
    "validate",
    "ValidationError",
    "VERDICT_SCHEMA",
    "VIOLATION_SCHEMA",
    "working_directory",
]

__version__ = "0.1.0"
