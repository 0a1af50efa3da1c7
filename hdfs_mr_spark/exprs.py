"""Shared expression helpers — determinism kernel for the hash-match oracle.

Why decimals: parquet doubles are bit-identical inputs to both engines,
and IEEE scalar ops (+,-,*,/ on two operands) are deterministic, so any
*per-row* double expression matches bit-for-bit across Spark and DuckDB.
What differs is *aggregation order* (parallel partial sums vs serial).
Casting the per-row value to a decimal and summing decimals makes the
aggregate exact and order-independent in both engines; casting the exact
decimal result back to double yields identical doubles. This keeps every
checked aggregate hash-exact without lossy rounding (SURVEY.md §5.2
determinism rules).

The decimal cast itself is safe: testdata money/rate columns are exact
2-dp values (measured), so per-row products have ≤4 decimal digits and a
scale-8 decimal is ~1e5 looser than the double's 1e-13 error.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,8)"


def _dec(scale: int) -> str:
    return f"decimal(38,{scale})"


def dsum(c: Column, scale: int = 8) -> Column:
    """Order-independent exact sum of a double column, returned as double.

    ``scale`` must satisfy ``|value| * 10^scale < 2^53`` so the double→
    decimal scaling is exact in every engine (DuckDB scales via double
    multiply); use scale=4 for squared/cross-product magnitudes ~1e10.
    """
    return F.sum(c.cast(_dec(scale))).cast("double")


def davg(c: Column, scale: int = 8) -> Column:
    """Order-independent exact mean of a double column, as double."""
    return (F.sum(c.cast(_dec(scale))).cast("double") / F.count(c)).cast("double")


def sql_dsum(x: str, scale: int = 8) -> str:
    """DuckDB rendering of :func:`dsum` over expression ``x``."""
    return f"CAST(SUM(CAST({x} AS DECIMAL(38,{scale}))) AS DOUBLE)"


def sql_davg(x: str, scale: int = 8) -> str:
    """DuckDB rendering of :func:`davg` over expression ``x``."""
    return (
        f"CAST(CAST(SUM(CAST({x} AS DECIMAL(38,{scale}))) AS DOUBLE)"
        f" / COUNT({x}) AS DOUBLE)"
    )
