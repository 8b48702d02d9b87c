"""Fuzzy string matching (V5/T9) — difflib parity via vectorized pandas UDF.

The reference uses ``difflib.SequenceMatcher(None, a, b).ratio()`` with a
cutoff (``ref:datatest/_predicate.py`` fuzzy / ``acceptances.py``
AcceptedFuzzy). There is no JVM equivalent with identical semantics, so the
exact kernel runs as an Arrow-batched pandas UDF (the sanctioned slow path,
BASELINE.json:15). It is applied acceptance-side — on violation rows, never
the full table — per SURVEY.md §7.3.4. A native ``levenshtein``-based
approximation is provided for plan-only contexts and is parity-tested
against the exact kernel in tests/test_validation.py.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def fuzzy_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    def ratio(x, y):
        if x is None or y is None:
            return 0.0
        return SequenceMatcher(None, str(x), str(y)).ratio()

    return pd.Series([ratio(x, y) for x, y in zip(a, b)], dtype="float64")


def fuzzy_ratio_py(a, b):
    """Driver-side exact kernel (shared by the python oracle + acceptances)."""
    if a is None or b is None:
        return 0.0
    return SequenceMatcher(None, str(a), str(b)).ratio()


def fuzzy_ratio_native(a_col, b_col):
    """Native approximation: 1 - levenshtein/greatest(len). JVM-side, for
    large-scale pre-filtering; NOT difflib-identical (documented)."""
    a_len = F.length(a_col)
    b_len = F.length(b_col)
    denom = F.greatest(a_len, b_len)
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a_col, b_col).cast("double") / denom.cast("double")
    )
