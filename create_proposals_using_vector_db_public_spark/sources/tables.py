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
    """The events table carries parquet TIMESTAMP(NANOS). Spark's reader
    behavior differs by version — Spark ≤4.0 rejects nanos unless the
    legacy ``nanosAsLong`` conf maps them to raw bigint; Spark 4.1+ reads
    them natively as TIMESTAMP_NTZ (truncated to µs, exactly like DuckDB
    truncates TIMESTAMP_NS to its native µs on read). Handle both and
    expose a stable schema:

    - ``ts_ns``  : bigint nanoseconds since epoch,
    - ``ts_us``  : bigint microseconds — matches DuckDB ``epoch_us(ts)``,
      so every oracle comparison/ordering uses ``ts_us``,
    - ``ts``     : a real TIMESTAMP column (µs) for human-facing use.

    Integer timestamps keep all ordering/bucketing arithmetic
    timezone-independent; the session timezone is pinned to UTC so the
    NTZ→instant interpretation and ``to_date``/``date_format`` rendering
    agree with DuckDB's naive-timestamp semantics — session-timezone
    rendering is the #1 cross-engine divergence for time queries.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:  # honored on Spark ≤4.0; accepted-but-ignored on 4.1+
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":  # legacy nanosAsLong path
        df = df.withColumnRenamed("ts", "ts_ns").withColumn(
            # FLOOR division (pmod is non-negative), matching the 4.1+
            # native nanos->micros truncation for pre-epoch values too —
            # `div` alone truncates toward zero and would differ by 1µs
            "ts_us", F.expr("(ts_ns - pmod(ts_ns, 1000)) div 1000")
        )
    else:  # timestamp_ntz (or timestamp): fields are the UTC wall clock
        df = (
            df.withColumn(
                "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
            )
            .withColumn("ts_ns", F.col("ts_us") * F.lit(1000))
            .drop("ts")
        )
    return df.withColumn("ts", F.timestamp_micros(F.col("ts_us")))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
