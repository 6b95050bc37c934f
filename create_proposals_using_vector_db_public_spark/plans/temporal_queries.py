"""Temporal-join declared queries: as-of join and range join over the
events stream (both sides derived from events — users 0-149, January 2024).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import joins as J
from ..sources import load_table
from .registry import query

_ASOF_ORACLE = """
WITH purchases AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
  FROM events WHERE event_type = 'purchase'
), signups AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'signup'
)
SELECT p.event_id, p.user_id,
       round(p.value, 6) AS purchase_value,
       (SELECT max(s.ts_us) FROM signups s
        WHERE s.user_id = p.user_id AND s.ts_us <= p.ts_us) AS asof_signup_ts_us
FROM purchases p
"""


@query("q_asof_join", oracle=_ASOF_ORACLE)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase gets the timestamp of the latest
    signup-type event at-or-before it for the same user. Implemented with
    the union+window trick (operators.joins.asof_join) — one shuffle on
    user_id, no inequality join, scales to two huge tables."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts_us", F.round("value", 6).alias("purchase_value")
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts_us").alias("signup_ts"), F.col("ts_us").alias("sts")
    )
    out = J.asof_join(
        purchases,
        signups,
        key_cols=["user_id"],
        left_ts="ts_us",
        right_ts="signup_ts",
        right_payload=["sts"],
    )
    return out.select(
        "event_id",
        "user_id",
        "purchase_value",
        F.col("asof_sts").alias("asof_signup_ts_us"),
    )


_RANGE_ORACLE = """
WITH windows AS (
  SELECT user_id, epoch_us(ts) AS w_start, epoch_us(ts) + 86400000000 AS w_end
  FROM events WHERE event_type = 'signup'
), errs AS (
  SELECT user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'error'
)
SELECT w.user_id, w.w_start, w.w_end,
       CAST(count(e.ts_us) AS BIGINT) AS n_errors
FROM windows w
LEFT JOIN errs e
  ON e.user_id = w.user_id AND e.ts_us >= w.w_start AND e.ts_us < w.w_end
GROUP BY w.user_id, w.w_start, w.w_end
"""


@query("q_range_join", oracle=_RANGE_ORACLE)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: error events counted inside each user's 24h post-signup
    window. Equality on user_id keeps it a hash join with the time range as
    a filter — never a nested loop."""
    e = load_table(spark, sf_dir, "events")
    windows = e.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts_us").alias("w_start"),
        (F.col("ts_us") + 86_400_000_000).alias("w_end"),
    )
    errs = e.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts_us").alias("e_ts")
    )
    out = J.range_join_count(
        windows,
        errs.withColumnRenamed("e_user", "user_id"),
        key_cols=["user_id"],
        window_start="w_start",
        window_end="w_end",
        event_ts="e_ts",
        count_alias="n_errors",
    )
    return out
