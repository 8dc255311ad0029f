"""Cross-engine-exact floating-point aggregation helpers.

Problem: SUM over doubles is order-dependent; Spark's partition-parallel
sums and DuckDB's sequential sums differ in the last bits, so a value
hash over raw double aggregates is flaky and ROUND() near a half-way
boundary can diverge.

Discipline: the source doubles encode exact decimals (prices with 2dp,
discount/tax with 2dp, their products with 4/6dp). So we cast the
ROW-LEVEL expression to DECIMAL with 2 guard digits of scale (the
per-row double error ~1e-12 is far below the cast's rounding boundary),
SUM the decimals exactly (order-independent), and cast the final sum to
DOUBLE. Both engines then produce bit-identical results. The same
per-row cast discipline is mirrored in the oracle SQL strings.

This costs one decimal cast per row — at 100 TB that is still a
map-side, codegen'd expression with partial aggregation; no extra
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column, scale: int, precision: int = 18) -> Column:
    """Row-level cast to an exact decimal with guard digits."""
    return col.cast(f"decimal({precision},{scale})")


def dsum(col: Column, scale: int) -> Column:
    """Order-independent SUM: exact decimal sum, returned as double."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column, scale: int) -> Column:
    """Order-independent AVG: exact decimal sum / count, as double."""
    return (F.sum(dec(col, scale)).cast("double") / F.count(F.lit(1))).cast("double")


def sql_dsum(expr: str, scale: int, alias: str, precision: int = 18) -> str:
    """DuckDB oracle fragment mirroring :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, scale: int, alias: str, precision: int = 18) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"
        f" / COUNT(*) AS DOUBLE) AS {alias}"
    )
