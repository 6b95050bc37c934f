"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real registry lives in
``create_proposals_using_vector_db_public_spark.plans`` — every operator
from SURVEY.md §2 registers a Spark plan builder and (when SQL-expressible)
a DuckDB oracle there.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from create_proposals_using_vector_db_public_spark.plans import (  # noqa: E402
    ORACLES,
    QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact brute-force L2 top-k over the embeddings table
    (reference semantics R17-R19) on /root/testdata/sf0.001."""
    return QUERIES["q_knn"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; non-SQL ops
    (streaming/multimodal/ML-UDF paths) are omitted → rows-only checks."""
    return dict(ORACLES)
