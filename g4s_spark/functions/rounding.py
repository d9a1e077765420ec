"""Portable rounding shared between Spark queries and DuckDB oracles.

Spark's F.round goes through BigDecimal's shortest-decimal representation
(HALF_UP on the printed value); DuckDB rounds the raw binary double. On a
boundary value like 0.53875 (binary ≈ 0.5387499…) they disagree. The
floor-based formula below is computed identically on both engines —
bit-for-bit given identical input doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(c: Column, digits: int = 2) -> Column:
    scale = 10 ** digits
    return F.floor(c * scale + F.lit(0.5)) / scale


def pround_sql(expr: str, digits: int = 2) -> str:
    scale = 10 ** digits
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
