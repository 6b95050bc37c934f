"""Streaming declared queries — run real Structured Streaming jobs
(Trigger.AvailableNow → memory sink) and return their batch results.

q_stream_tumbling carries a full DuckDB oracle: with AvailableNow every
row is in one logical run and complete-mode output emits every window, so
the streaming result equals the batch tumbling aggregation exactly.
q_stream_dedup is rows-only (kept-row identity depends on arrival order)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..streaming import available_now_to_memory, stream_parquet, watermark_dedup
from .registry import query

_EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # TIMESTAMP(NANOS) read as raw long
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The file-stream source requires a DIRECTORY (it watches for new
    # files); testdata is read-only, so stage a symlink to the single
    # events.parquet in a per-sf temp dir — the "watched folder".
    import os

    stage = f"/tmp/spark_graft_stream/{os.path.basename(sf_dir.rstrip('/'))}/events"
    os.makedirs(stage, exist_ok=True)
    link = f"{stage}/events.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = stream_parquet(spark, stage, _EVENTS_SCHEMA)
    return raw.withColumn("ts_us", F.expr("ts div 1000"))


_STREAM_TUMBLING_ORACLE = """
SELECT (epoch_us(ts) // 21600000000) * 21600 AS window_start_s,
       event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       round(sum(value), 4) AS total_value
FROM events
GROUP BY 1, 2
"""


@query("q_stream_tumbling", oracle=_STREAM_TUMBLING_ORACLE)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6h windows computed by an actual streaming query
    (readStream → stateful agg → AvailableNow → memory sink). Equals the
    batch q_stream_window result, and the oracle proves it — the
    batch/stream unification Spark promises, demonstrated."""
    ev = _events_stream(spark, sf_dir)
    win = (F.floor(F.col("ts_us") / 21_600_000_000) * 21_600).cast("bigint")
    agg = ev.groupBy(win.alias("window_start_s"), "event_type").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
    return available_now_to_memory(agg, output_mode="complete")


@query("q_stream_dedup")  # rows-only: kept row depends on arrival order
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark on a compound key — R9's duplicate
    skip with watermark-bounded state. Counted per event_type so the result
    shape is stable even though kept-row identity is arrival-dependent."""
    ev = _events_stream(spark, sf_dir).withColumn(
        "ts_t", F.timestamp_micros(F.col("ts_us"))
    )
    deduped = watermark_dedup(
        ev, ["user_id", "event_type"], watermark_col="ts_t", delay="365 days"
    )
    out = available_now_to_memory(deduped, output_mode="append")
    return out.groupBy("event_type").agg(F.count("*").alias("distinct_users"))
