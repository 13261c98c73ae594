"""Grouped-aggregate pandas UDFs (the UDAF extension surface).

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves the type hints at decoration time, and PEP-563 stringified
hints break its signature introspection (UNSUPPORTED_SIGNATURE).
Construction is lazy (inside :func:`quartile_udafs`) because the
decorator also needs an active SparkSession.

Cross-engine exactness: naive ``np.percentile`` differs from DuckDB's
``percentile_cont`` in the last ulp (different lerp evaluation
order), so the quartiles are computed on an exact integer grid with
integer interpolation — quartile fractions are quarters, so
``4*a + (b-a)*k`` (k = 4*frac in 0..3) is exact bigint math; the one
final division by 256 (a power of two — an exact exponent shift) is
the same IEEE double op in both engines.

The grid is floor(value * 64): a power-of-two multiply is exact for
any finite double and floor carries no tie semantics — unlike the
previous round(value*100) half-away emulation, which is only
engine-portable when the data never lands on a half-cent (the r7
driver flagged exactly that idiom; r8 sweep).
"""

import pandas as pd

#: power-of-two quantization grid shared with EVENT_IQR_SQL
QUARTILE_GRID = 64


def _quartile_scaled(v: pd.Series, numerator: int) -> int:
    """4x-scaled integer-64ths continuous quartile: numerator is 1
    (p25) or 3 (p75); pos = numerator*(n-1)/4 over the sorted grid
    values. NULLs are dropped first, mirroring the oracle's
    `value is not null` filter."""
    import numpy as np

    x = np.floor(v.dropna().to_numpy() * QUARTILE_GRID)
    g = np.sort(x.astype(np.int64))
    n = len(g)
    if n == 0:
        return 0
    t = numerator * (n - 1)
    lo, k = divmod(t, 4)
    a = int(g[lo])
    b = int(g[lo + 1]) if lo + 1 < n else a
    return 4 * a + (b - a) * k


def quartile_udafs():
    """Build (p25, p75) GROUPED_AGG pandas UDFs (needs a live
    SparkSession)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def p25_udaf(v: pd.Series) -> float:
        return _quartile_scaled(v, 1) / (4.0 * QUARTILE_GRID)

    @pandas_udf("double")
    def p75_udaf(v: pd.Series) -> float:
        return _quartile_scaled(v, 3) / (4.0 * QUARTILE_GRID)

    return p25_udaf, p75_udaf
