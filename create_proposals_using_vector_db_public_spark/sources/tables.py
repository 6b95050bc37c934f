"""Parquet star-schema sources.

The driver materializes deterministic TPC-H-ish tables plus ``events``,
``documents`` and ``embeddings`` as one parquet file per table
(TESTDATA.md). At 100 TB each of these would be a partitioned parquet/Delta
dataset; reading stays identical (``spark.read.parquet(path)``) and all the
engine's filters/projections push down to the scan, so nothing here needs to
change with scale — only the physical layout (partitioning columns,
file sizing) of the warehouse does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
