"""Behavioral / product-analytics declared queries over the events
stream: ordered-funnel conversion, cohort retention, and SCD2 validity
intervals. The patterns every event warehouse runs daily, expressed so
each is one-or-two shuffles keyed by user and every output is integer
or epoch-microsecond exact (hash-stable at any scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# --- ordered funnel ----------------------------------------------------------

_FUNNEL_ORACLE = """
WITH s AS (
  SELECT user_id, min(epoch_us(ts)) AS us FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), v AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS us
  FROM events e JOIN s ON e.user_id = s.user_id AND epoch_us(e.ts) > s.us
  WHERE e.event_type = 'view' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS us
  FROM events e JOIN v ON e.user_id = v.user_id AND epoch_us(e.ts) > v.us
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT stage, n_users FROM (
  SELECT 1 AS ord, 'signup' AS stage, CAST(count(*) AS BIGINT) AS n_users
  FROM s
  UNION ALL
  SELECT 2, 'view_after_signup', CAST(count(*) AS BIGINT) FROM v
  UNION ALL
  SELECT 3, 'purchase_after_view', CAST(count(*) AS BIGINT) FROM p
) ORDER BY ord
"""


@query("q_funnel", oracle=_FUNNEL_ORACLE)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who signed up → first view STRICTLY AFTER
    the signup → first purchase strictly after that view. Each stage is
    min-timestamp per user then an inner join to the previous stage with
    a time inequality — the ordering constraint that separates a funnel
    from three independent counts.

    Scale shape: every stage is one partial+final min-aggregate keyed by
    user_id and one same-key join — co-partitioned after the first
    shuffle, so stages 2..n reuse the user_id partitioning (no new
    shuffle under AQE). Nothing wider than (user_id, ts) ever moves."""
    e = load_table(spark, sf_dir, "events")

    def first_after(ev: str, prev: DataFrame | None) -> DataFrame:
        cur = e.filter(F.col("event_type") == ev).select("user_id", "ts_us")
        if prev is not None:
            cur = cur.join(prev, "user_id").filter(
                F.col("ts_us") > F.col("us")
            ).select("user_id", "ts_us")
        return cur.groupBy("user_id").agg(F.min("ts_us").alias("us"))

    s = first_after("signup", None)
    v = first_after("view", s)
    p = first_after("purchase", v)
    rows = [
        s.agg(F.lit(1).alias("ord"), F.lit("signup").alias("stage"),
              F.count("*").alias("n_users")),
        v.agg(F.lit(2).alias("ord"), F.lit("view_after_signup").alias("stage"),
              F.count("*").alias("n_users")),
        p.agg(F.lit(3).alias("ord"),
              F.lit("purchase_after_view").alias("stage"),
              F.count("*").alias("n_users")),
    ]
    out = rows[0].unionByName(rows[1]).unionByName(rows[2])
    return out.orderBy("ord").select("stage", "n_users")


# --- cohort retention --------------------------------------------------------

_RETENTION_ORACLE = """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT e.user_id,
         strftime(f.d0, '%Y-%m-%d') AS cohort_day,
         CAST((CAST(e.ts AS DATE) - f.d0) // 7 AS BIGINT) AS week_offset
  FROM events e JOIN first f ON e.user_id = f.user_id
)
SELECT cohort_day, week_offset,
       CAST(count(*) AS BIGINT) AS n_active
FROM act
GROUP BY cohort_day, week_offset
"""


@query("q_retention", oracle=_RETENTION_ORACLE)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    once per (cohort, weeks-since-first-seen) cell — the triangle chart
    behind every retention dashboard. Day arithmetic is integer
    (datediff // 7), so cells are hash-exact.

    Scale shape: first-seen is a min-aggregate on user_id; the activity
    join is same-key (co-partitioned); the distinct collapses each
    user's events to ≤ n_weeks rows BEFORE the final cell count, keeping
    the last aggregation's input |users| × weeks, not |events|."""
    e = load_table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d0"))
    act = (
        e.select("user_id", F.to_date("ts").alias("d"))
        .join(first, "user_id")
        .select(
            "user_id",
            F.date_format("d0", "yyyy-MM-dd").alias("cohort_day"),
            F.floor(F.datediff("d", "d0") / 7).cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return act.groupBy("cohort_day", "week_offset").agg(
        F.count("*").alias("n_active")
    )


# --- SCD2 validity intervals -------------------------------------------------

_SCD2_ORACLE = """
WITH base AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us
  FROM events WHERE user_id < 20
)
SELECT user_id, event_type,
       ts_us AS valid_from_us,
       lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_type)
         AS valid_to_us,
       lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_type)
         IS NULL AS is_current
FROM base
"""


@query("q_scd2", oracle=_SCD2_ORACLE)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval construction: turn a change-event stream into
    [valid_from, valid_to) dimension rows via lead() — each state's
    validity closes when the next state opens; the open row is
    is_current. The warehouse pattern for time-travel joins (pair with
    q_asof_join / q_range_join to query an entity AS OF a timestamp).

    Scale shape: one window partitioned by the entity key — parallel per
    entity, no global sort; ties on ts broken by event_type so intervals
    are deterministic (ADVICE r1's keep_first lesson applied here from
    the start)."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select("user_id", "event_type", "ts_us")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_type")
    nxt = F.lead("ts_us").over(w)
    return e.select(
        "user_id", "event_type",
        F.col("ts_us").alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


# --- sequence transition mining ----------------------------------------------

_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, count(*) AS c
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, CAST(c AS BIGINT) AS n_transitions,
       round(c / sum(c) OVER (PARTITION BY prev_type), 6) AS p_transition
FROM pairs
"""


@query("q_transitions", oracle=_TRANSITIONS_ORACLE)
def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: lag() pairs consecutive events (ties broken by event_id so
    sequences are deterministic), then global (prev → next) counts and
    row-normalized probabilities — the session-flow model behind
    next-action prediction and funnel drop-off analysis.

    Scale shape: one shuffle keys the stream by user for the lag window;
    the pair count is a partial+final aggregate over |event types|² rows;
    the probability normalization windows over that tiny matrix. The
    probability is one bigint/bigint division — IEEE-identical on both
    engines."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wp), 6
        ).alias("p_transition"),
    )


# --- event-pattern matching (CEP-lite) ---------------------------------------
#
# MATCH_RECOGNIZE-style sequence patterns without a CEP engine: encode
# each user's totally-ordered event history as a character string (one
# char per event type), then count regex matches. Two patterns: the
# contiguous motif 'vcp' (view,click,purchase back-to-back) and the
# gapped funnel 'v[^p]*c[^p]*p' (view then click then purchase with no
# intervening purchase). Both regexes compile to the same DFA semantics
# in Java regex and RE2 — match ends are forced to the first 'p' after a
# qualifying v..c, so non-overlapping counts agree exactly.

_EVENT_PATTERN_ORACLE = """
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), ''
                    ORDER BY epoch_us(ts), event_id) AS s
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(length(s) AS BIGINT) AS n_events,
       CAST(len(regexp_extract_all(s, 'vcp')) AS BIGINT) AS n_contig,
       CAST(len(regexp_extract_all(s, 'v[^p]*c[^p]*p')) AS BIGINT)
         AS n_funnel
FROM seq
"""


@query("q_event_pattern", oracle=_EVENT_PATTERN_ORACLE)
def q_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-sequence pattern counts: contiguous view→click→
    purchase motifs and gapped no-purchase-in-between funnels, via regex
    over the character-encoded ordered history.

    Determinism: the sequence is assembled by sort_array over
    (ts_us, event_id, char) structs — a value sort, NOT collection order,
    so any partitioning yields the same string (event_id breaks
    timestamp ties totally). Scale shape: one shuffle of (user_id, 8-byte
    ts, 8-byte id, 1 char) rows; per-user history assembly is the
    irreducible grouped sort every sequence-analytics job pays. The
    regex runs once per user on the assembled string, JVM-side."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts_us",
        "event_id",
        F.substring("event_type", 1, 1).alias("ch"),
    )
    seq = e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts_us", "event_id", "ch"))
                ),
                lambda x: x["ch"],
            ),
            "",
        ).alias("s")
    )
    return seq.select(
        "user_id",
        F.length("s").cast("bigint").alias("n_events"),
        F.regexp_count("s", F.lit("vcp")).cast("bigint").alias("n_contig"),
        F.regexp_count("s", F.lit("v[^p]*c[^p]*p")).cast("bigint").alias(
            "n_funnel"
        ),
    )
