from .suite import SuiteResult, ValidationSuite, north_star_suite

__all__ = ["SuiteResult", "ValidationSuite", "north_star_suite"]
