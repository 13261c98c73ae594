"""Grouped-aggregate pandas UDFs (the UDAF extension surface).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves the type hints at decoration time, and PEP-563 stringified
hints break its signature introspection (UNSUPPORTED_SIGNATURE).
Construction is lazy (inside :func:`quartile_udafs`) because the
decorator also needs an active SparkSession.

Cross-engine exactness: naive ``np.percentile`` differs from DuckDB's
``percentile_cont`` in the last ulp (different lerp evaluation
order), so the quartiles are computed on integer cents with integer
interpolation — quartile fractions are quarters, so
``4*a + (b-a)*k`` (k = 4*frac in 0..3) is exact bigint math; the one
final division by 400 is the same IEEE double op in both engines.
"""

import pandas as pd


def _quartile_scaled(v: pd.Series, numerator: int) -> int:
    """4x-scaled integer-cents continuous quartile: numerator is 1
    (p25) or 3 (p75); pos = numerator*(n-1)/4 over the sorted cents.

    Rounding matches SQL round() (half-AWAY-from-zero) — np.rint is
    half-to-even and disagrees on exact .5 cents; NULLs are dropped
    first, mirroring the oracle's `value is not null` filter."""
    import numpy as np

    x = v.dropna().to_numpy() * 100
    away = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))
    cents = np.sort(away.astype(np.int64))
    n = len(cents)
    if n == 0:
        return 0
    t = numerator * (n - 1)
    lo, k = divmod(t, 4)
    a = int(cents[lo])
    b = int(cents[lo + 1]) if lo + 1 < n else a
    return 4 * a + (b - a) * k


def quartile_udafs():
    """Build (p25, p75) GROUPED_AGG pandas UDFs (needs a live
    SparkSession)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def p25_udaf(v: pd.Series) -> float:
        return _quartile_scaled(v, 1) / 400.0

    @pandas_udf("double")
    def p75_udaf(v: pd.Series) -> float:
        return _quartile_scaled(v, 3) / 400.0

    return p25_udaf, p75_udaf
