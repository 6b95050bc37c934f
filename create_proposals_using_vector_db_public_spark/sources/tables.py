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
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table carries parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright. Read the nanos as a raw long
    (legacy conf) and expose:

    - ``ts_ns``  : bigint nanoseconds since epoch (full precision),
    - ``ts_us``  : bigint microseconds — matches DuckDB's precision, which
      truncates TIMESTAMP_NS to its native µs TIMESTAMP on read, so every
      oracle comparison/ordering uses ``ts_us``,
    - ``ts``     : a real TIMESTAMP column (µs) for human-facing use.

    Integer timestamps keep all ordering/bucketing arithmetic
    timezone-independent — rendering via the session timezone is the #1
    cross-engine divergence for time queries.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        df.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts_us", F.expr("ts_ns div 1000"))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
