"""Shared money-column float discipline.

The revenue expression is load-bearing correctness, not convenience: one
IEEE double multiply per row, then EXACT decimal accumulation, so sums can
never flip on summation order (SURVEY §7 trap 5). Every plan module that
aggregates lineitem revenue must build the column here — a precision
change then happens in one place (plus the mirroring oracle SQL, which
states the same CAST textually).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def revenue_decimal() -> Column:
    """``l_extendedprice * (1 - l_discount)`` as DECIMAL(18,6)."""
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
