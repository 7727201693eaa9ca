"""Deterministic float aggregation helpers.

Double summation is order-dependent, and Spark's and DuckDB's summation
orders differ — so a raw ``sum(double)`` can never hash-match an oracle
exactly. The engine's convention: cast each addend to a fixed-scale
decimal (exact, order-insensitive addition), sum, and cast the final
total back to double. Per-row double arithmetic (products, IEEE ops) is
bit-deterministic across engines, so only the *aggregation* needs the
decimal detour. Averages are computed as (decimal-sum as double) /
count, which is a single deterministic double division.

At scale this costs one widened column per aggregate — decimal sums
still combine map-side (partial aggregation) and stay in Tungsten.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Deterministic average: exact decimal sum / count, in doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    """Oracle-SQL twin of :func:`dsum`."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    """Oracle-SQL twin of :func:`davg`."""
    return (
        f"CAST(sum(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"
        f" / count({expr}) AS {alias}"
    )


def dround(col: Column, scale: int) -> Column:
    """Deterministic decimal rounding of a double: floor(x*10^s + 0.5)/10^s.

    Engines disagree on ``round(double, n)`` half-way handling (Spark
    goes through BigDecimal HALF_UP, DuckDB rounds the decimal string) —
    this formulation is pure IEEE double arithmetic, bit-identical
    everywhere. Intended for non-negative values.
    """
    m = float(10**scale)
    return F.floor(col * m + F.lit(0.5)) / m


def sql_dround(expr: str, scale: int) -> str:
    """Oracle-SQL twin of :func:`dround` (no alias)."""
    m = float(10**scale)
    return f"floor(({expr}) * {m} + 0.5) / {m}"
