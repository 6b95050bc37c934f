"""Declared query registry — the oracle-checked inventory of SURVEY.md §2B.

Every operator the engine claims is registered here twice:

- ``QUERIES[name]``: a callable ``(spark, sf_dir) -> DataFrame`` building the
  Spark plan,
- ``ORACLES[name]``: the equivalent ANSI SQL DuckDB runs on the same parquet
  tables (omitted for genuinely non-SQL-expressible ops → the driver records
  a weaker rows-only check).

Column names and float rounding must agree between the two: the driver's
compare sorts columns by name and value-hashes, so every computed column is
aliased identically on both sides and floats are rounded to a fixed
precision (SURVEY §7 trap 5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
