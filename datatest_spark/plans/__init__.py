from .spec import SpecError, suite_from_spec, suite_from_spec_file
from .suite import SuiteResult, ValidationSuite, north_star_suite

__all__ = [
    "SpecError",
    "SuiteResult",
    "ValidationSuite",
    "north_star_suite",
    "suite_from_spec",
    "suite_from_spec_file",
]
