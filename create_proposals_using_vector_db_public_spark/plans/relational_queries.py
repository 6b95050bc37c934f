"""Relational-substrate declared queries over the driver star schema.

These are the [extension] inventory of SURVEY.md §2B: the relational
primitives every 2A operator decomposes into, each as a declared,
oracle-checked query. Scale notes are per-query; the common themes:
filters/projections push to the parquet scan, small dimensions broadcast,
aggregations are partial+final automatically, and AQE handles skew.

Type parity rules with DuckDB (learned empirically, see tools/parity.py):
- DuckDB ``sum(INTEGER)`` → HUGEINT, so oracles cast to BIGINT,
- both engines' ``count(*)`` → BIGINT,
- float aggregates rounded on both sides (SURVEY §7 trap 5),
- ``row_number``/``rank`` cast to INTEGER in oracles (Spark emits int32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.money import money_double, revenue_decimal
from ..sources import load_table
from .registry import query


# --- scans / projection / filter -------------------------------------------

_SCAN_FILTER_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity,
       round(l_extendedprice * (1 - l_discount), 6) AS revenue,
       l_returnflag
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-06-01'
  AND l_shipdate <  TIMESTAMP '1995-09-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q_scan_filter", oracle=_SCAN_FILTER_ORACLE)
def q_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped scan: every predicate and the 6-column projection
    push down to the parquet reader (verified via .explain: PushedFilters +
    pruned ReadSchema) — at 100 TB this reads a fraction of the table."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1995-06-01")
        & (F.col("l_shipdate") < "1995-09-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
            "revenue"
        ),
        "l_returnflag",
    )


# Registered early (inside the driver's bounded correctness window — see
# plans/__init__.py): the approx sketch needs a fresh driver check after the
# oracle redesign below; both engines run their own HLL and agree on the
# deterministic (exact count, within-tolerance boolean) output.
_APPROX_DISTINCT_ORACLE = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
         / CAST(count(DISTINCT l_partkey) AS DOUBLE) <= 0.05 AS approx_ok
FROM lineitem
GROUP BY l_returnflag
"""


@query("q_approx_distinct", oracle=_APPROX_DISTINCT_ORACLE)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct — at 100 TB the exact-distinct shuffle is the
    bottleneck and HLL sketches are the answer. Raw HLL estimates are
    engine-specific, so the oracle-checked output is (exact count,
    approx-within-5% boolean): each engine runs its OWN sketch (Spark HLL++
    rsd=0.02, DuckDB HLL) and both must land inside the tolerance — the
    sketch path is genuinely exercised while the compared values stay
    deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", 0.02).alias("__approx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("__approx") - F.col("exact_parts"))
                / F.col("exact_parts").cast("double")
                <= 0.05
            ).alias("approx_ok"),
        )
    )


_PROJECT_ORACLE = """
SELECT o_orderkey,
       round(o_totalprice * 1.1, 6) AS taxed_price,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS bucket
FROM orders
WHERE o_orderstatus = 'O'
"""


@query("q_project", oracle=_PROJECT_ORACLE)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 1.1, 6).alias("taxed_price"),
        F.year("o_orderdate").alias("order_year"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .otherwise("small")
        .alias("bucket"),
    )


# --- joins ------------------------------------------------------------------

_JOIN_BROADCAST_ORACLE = """
SELECT n.n_nationkey, n.n_name, r.r_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name <> 'EUROPE'
"""


@query("q_join_broadcast", oracle=_JOIN_BROADCAST_ORACLE)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension⋈dimension with an explicit broadcast hint — zero shuffle.
    At 100 TB the same hint keeps any fact⋈small-dim join shuffle-free."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") != "EUROPE")
        .select("n_nationkey", "n_name", "r_name")
    )


_JOIN_SHUFFLE_ORACLE = """
SELECT n.n_name,
       CAST(count(*) AS BIGINT) AS order_cnt,
       (CAST(floor(sum(CAST(o.o_totalprice AS DECIMAL(14,2)))) AS DOUBLE) + CAST(sum(CAST(o.o_totalprice AS DECIMAL(14,2))) - floor(sum(CAST(o.o_totalprice AS DECIMAL(14,2)))) AS DOUBLE))
         AS total_spend
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
GROUP BY n.n_name
"""


@query("q_join_shuffle", oracle=_JOIN_SHUFFLE_ORACLE)
def q_join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact⋈dim star join + aggregation. orders⋈customer shuffles on
    custkey (both large at scale); nation broadcasts; the groupBy is
    partial+final so only 25 rows cross the last shuffle."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "1995-01-01"
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("order_cnt"),
            money_double(
                F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            ).alias("total_spend"),
        )
    )


_SEMI_ORACLE = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
"""


@query("q_semi", oracle=_SEMI_ORACLE)
def q_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_ANTI_ORACLE = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
"""


@query("q_anti", oracle=_ANTI_ORACLE)
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no high-value orders — the anti-join shape used by the
    ingest pipeline's unchanged-file skip (R11) and key dedup (R9). The
    filter keeps the result non-empty at every SF (an unconditioned version
    matches zero rows — every customer has some order)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


_OUTER_ORACLE = """
SELECT c.c_custkey,
       CAST(count(o.o_orderkey) AS BIGINT) AS order_cnt,
       round(coalesce((CAST(floor(sum(CAST(o.o_totalprice AS DECIMAL(14,2)))) AS DOUBLE) + CAST(sum(CAST(o.o_totalprice AS DECIMAL(14,2))) - floor(sum(CAST(o.o_totalprice AS DECIMAL(14,2)))) AS DOUBLE)), 0.0), 6) AS total_spend
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
"""


@query("q_outer", oracle=_OUTER_ORACLE)
def q_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.round(
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
                    .cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("total_spend"),
        )
    )


# --- aggregation ------------------------------------------------------------

# Money sums go through exact DECIMAL accumulation: double sums of ~1e9
# magnitude drift in the last ulp between engines (summation order), and
# at that magnitude the ulp EXCEEDS the 6dp rounding — an exact-hash gate
# fails at sf>=0.1. DECIMAL(14,2) casts are lossless for the 2dp columns;
# the per-row double products (exactly <=6dp values) cast losslessly to
# DECIMAL(18,6). Averages derive from the same exact sums.
#
# The exact decimal sum is emitted as a BARE double cast, never
# round(cast(sum), d): decimal->double conversion is nearest-even on both
# engines (identical bits from identical sums at ANY magnitude), while a
# post-round multiplies by 10^d first — once |sum|*10^d exceeds 2^53 the
# two engines' round() implementations disagree in the last ulp (Spark
# goes through BigDecimal of the shortest repr, DuckDB through scaled
# float arithmetic). Measured at sf1: TPC-H Q1 sum_charge ~2.8e10 diverged
# by 4 micro-units ONLY in the rounded form. Below 2^53/10^d the round is
# a no-op on these on-grid values, so dropping it changes nothing at
# small SF and fixes every larger one. round(...) stays correct for
# magnitude-bounded outputs (averages, ratios, per-entity sums).
_AGG_BASIC_ORACLE = """
SELECT l_returnflag, l_linestatus,
       (CAST(floor(sum(CAST(l_quantity AS DECIMAL(14,2)))) AS DOUBLE) + CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) - floor(sum(CAST(l_quantity AS DECIMAL(14,2)))) AS DOUBLE))
         AS sum_qty,
       (CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(14,2)))) AS DOUBLE) + CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) - floor(sum(CAST(l_extendedprice AS DECIMAL(14,2)))) AS DOUBLE))
         AS sum_base_price,
       (CAST(floor(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6)))) AS DOUBLE) + CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) - floor(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6)))) AS DOUBLE))
         AS sum_disc_price,
       (CAST(floor(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           AS DECIMAL(18,6)))) AS DOUBLE) + CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           AS DECIMAL(18,6))) - floor(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           AS DECIMAL(18,6)))) AS DOUBLE))
         AS sum_charge,
       round((CAST(floor(sum(CAST(l_quantity AS DECIMAL(14,2)))) AS DOUBLE) + CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) - floor(sum(CAST(l_quantity AS DECIMAL(14,2)))) AS DOUBLE))
             / count(*), 6) AS avg_qty,
       round((CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(14,2)))) AS DOUBLE) + CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) - floor(sum(CAST(l_extendedprice AS DECIMAL(14,2)))) AS DOUBLE))
             / count(*), 6) AS avg_price,
       round((CAST(floor(sum(CAST(l_discount AS DECIMAL(14,2)))) AS DOUBLE) + CAST(sum(CAST(l_discount AS DECIMAL(14,2))) - floor(sum(CAST(l_discount AS DECIMAL(14,2)))) AS DOUBLE))
             / count(*), 6) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("q_agg_basic", oracle=_AGG_BASIC_ORACLE)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the canonical wide-scan aggregation. Partial aggregation
    (map-side combine) means only |groups| x |partitions| rows shuffle —
    the plan that survives 100x scale unchanged. Money sums accumulate in
    exact decimals so results are order-independent (see oracle comment)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02"
    )
    dqty = F.col("l_quantity").cast("decimal(14,2)")
    dprice = F.col("l_extendedprice").cast("decimal(14,2)")
    ddisc = F.col("l_discount").cast("decimal(14,2)")
    disc_price = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(18,6)")
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    ).cast("decimal(18,6)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_double(F.sum(dqty)).alias("sum_qty"),
        money_double(F.sum(dprice)).alias("sum_base_price"),
        money_double(F.sum(disc_price)).alias("sum_disc_price"),
        money_double(F.sum(charge)).alias("sum_charge"),
        F.round(money_double(F.sum(dqty)) / F.count("*"), 6).alias("avg_qty"),
        F.round(money_double(F.sum(dprice)) / F.count("*"), 6).alias(
            "avg_price"
        ),
        F.round(money_double(F.sum(ddisc)) / F.count("*"), 6).alias(
            "avg_disc"
        ),
        F.count("*").alias("count_order"),
    )


_AGG_DISTINCT_ORACLE = """
SELECT l_returnflag,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS distinct_supps
FROM lineitem
GROUP BY l_returnflag
"""


@query("q_agg_distinct", oracle=_AGG_DISTINCT_ORACLE)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
    )


_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS cnt,
       round(sum(l_quantity), 6) AS sum_qty,
       CAST(grouping(l_returnflag) + 2 * grouping(l_linestatus) AS BIGINT)
         AS grouping_lvl
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("q_rollup", oracle=_ROLLUP_ORACLE)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        (
            F.grouping("l_returnflag") + F.lit(2) * F.grouping("l_linestatus")
        ).cast("bigint").alias("grouping_lvl"),
    )


# --- window -----------------------------------------------------------------

_TOPK_PER_GROUP_ORACLE = """
SELECT c_custkey, o_orderkey, o_totalprice, order_rank
FROM (
  SELECT o.o_custkey AS c_custkey, o.o_orderkey, o.o_totalprice,
         CAST(row_number() OVER (
           PARTITION BY o.o_custkey
           ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
         ) AS INTEGER) AS order_rank
  FROM orders o
)
WHERE order_rank <= 3
"""


@query("q_topk_per_group", oracle=_TOPK_PER_GROUP_ORACLE)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. Partitioned window — shuffles once on
    custkey, streams each partition; no global sort. The R19 rank
    generalized to grouped ranking."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("order_rank", F.row_number().over(w))
        .filter(F.col("order_rank") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            "order_rank",
        )
    )


_WINDOW_RUNNING_ORACLE = """
SELECT user_id, event_id,
       round(sum(value) OVER (
         PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 4) AS running_value,
       CAST(lag(event_type) OVER (
         PARTITION BY user_id ORDER BY ts ASC, event_id ASC
       ) AS VARCHAR) AS prev_type
FROM events
WHERE user_id < 50
"""


@query("q_window_running", oracle=_WINDOW_RUNNING_ORACLE)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag per user over event time — the sessionization
    building block; one shuffle on user_id. Orders by ts_us (bigint µs) to
    match the oracle's µs timestamp precision exactly."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").asc(), F.col("event_id").asc()
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_value"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


# --- set ops ----------------------------------------------------------------

_UNION_INCR_ORACLE = """
SELECT lang, CAST(count(*) AS BIGINT) AS doc_cnt
FROM (
  SELECT doc_id, lang FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id, lang FROM documents WHERE doc_id % 3 = 1
)
GROUP BY lang
"""


@query("q_union_incr", oracle=_UNION_INCR_ORACLE)
def q_union_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two batch slices then aggregate — the incremental
    old ∪ new ingest shape (R12/R14)."""
    d = load_table(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 3 == 0).select("doc_id", "lang")
    b = d.filter(F.col("doc_id") % 3 == 1).select("doc_id", "lang")
    return a.unionByName(b).groupBy("lang").agg(F.count("*").alias("doc_cnt"))


_EXCEPT_ORACLE = """
SELECT doc_id, source FROM documents WHERE doc_id % 2 = 0
EXCEPT ALL
SELECT doc_id, source FROM documents WHERE doc_id % 4 = 0
"""


@query("q_except", oracle=_EXCEPT_ORACLE)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exceptAll — the deleted-rows shape of the delete/rebuild path (R13)."""
    d = load_table(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "source")
    b = d.filter(F.col("doc_id") % 4 == 0).select("doc_id", "source")
    return a.exceptAll(b)


# --- string / json / date ---------------------------------------------------

_STRING_ORACLE = """
SELECT p_partkey,
       lower(p_name) AS name_lower,
       substr(p_name, 1, 10) AS name_prefix,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       CAST(length(p_name) AS INTEGER) AS name_len,
       replace(p_brand, 'Brand#', 'B') AS brand_short
FROM part
WHERE p_name LIKE '%a%' AND p_type NOT LIKE 'SMALL%'
"""


@query("q_string", oracle=_STRING_ORACLE)
def q_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%a%") & ~F.col("p_type").like("SMALL%")
    ).select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.regexp_extract("p_name", r"([a-z]+)", 1).alias("first_word"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias(
            "brand_short"
        ),
    )


_JSON_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 6) AS avg_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY event_type
"""


@query("q_json_props", oracle=_JSON_ORACLE)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction from the events.props JSON column —
    get_json_object stays JVM-side; at scale prefer from_json with an
    explicit schema once the shape is known."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.withColumn("k", k)
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


_DATE_AGG_ORACLE = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
       CAST(count(*) AS BIGINT) AS order_cnt,
       (CAST(floor(sum(CAST(o_totalprice AS DECIMAL(14,2)))) AS DOUBLE) + CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) - floor(sum(CAST(o_totalprice AS DECIMAL(14,2)))) AS DOUBLE))
         AS month_total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1994-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY 1
"""


@query("q_date_agg", oracle=_DATE_AGG_ORACLE)
def q_date_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders per month. The month key is rendered as an ISO string — a
    concrete dtype both engines canonicalize identically (DATE surfaces as
    python date objects from Spark but datetime64 from DuckDB)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= "1994-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "order_month"
            )
        )
        .agg(
            F.count("*").alias("order_cnt"),
            money_double(
                F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
            ).alias("month_total"),
        )
    )


_FROM_JSON_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
            THEN 'high' ELSE 'low' END AS k_band
FROM events
WHERE event_id < 2000 AND json_extract_string(props, '$.k') IS NOT NULL
"""


@query("q_from_json", oracle=_FROM_JSON_ORACLE)
def q_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing: from_json with an explicit schema (vs
    q_json_props' per-path get_json_object). One parse per row regardless
    of how many fields are consumed — the right shape when a props column
    has many keys."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    parsed = e.withColumn("p", F.from_json("props", "k INT"))
    return (
        parsed.filter(F.col("p.k").isNotNull())
        .select(
            "event_id",
            F.col("p.k").alias("k"),
            F.when(F.col("p.k") >= 50, "high").otherwise("low").alias("k_band"),
        )
    )


_WINDOW_RANGE_ORACLE = """
SELECT user_id, event_id,
       round(sum(value) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
       ), 6) AS rolling_1h_value
FROM events
WHERE user_id < 30
"""


@query("q_window_range", oracle=_WINDOW_RANGE_ORACLE)
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: rolling 1-hour sum per user ordered by event
    time. Value-based frames are tie-safe (all rows at equal ts share a
    frame) so no tiebreak column is needed — unlike ROWS frames."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("rolling_1h_value"),
    )


_NTILE_ORACLE = """
SELECT c_custkey,
       CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS INTEGER)
         AS balance_quartile,
       round(percent_rank() OVER (ORDER BY c_acctbal DESC, c_custkey ASC), 6)
         AS balance_pctrank
FROM customer
"""


@query("q_ntile", oracle=_NTILE_ORACLE)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile + percent-rank assignment (deterministic via custkey
    tiebreak — ntile over a non-total order differs between engines)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("balance_pctrank"),
    )


_INTERSECT_ORACLE = """
SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 0
INTERSECT
SELECT doc_id, lang FROM documents WHERE doc_id % 3 = 0
"""


@query("q_intersect", oracle=_INTERSECT_ORACLE)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    b = d.filter(F.col("doc_id") % 3 == 0).select("doc_id", "lang")
    return a.intersect(b)


# Tumbling window via pure integer arithmetic on epoch-µs — timezone-proof
# and precision-exact on both engines (6h = 21_600_000_000 µs).
_STREAM_WINDOW_ORACLE = """
SELECT (epoch_us(ts) // 21600000000) * 21600 AS window_start_s,
       event_type,
       CAST(count(*) AS BIGINT) AS cnt,
       round(sum(value), 4) AS total_value
FROM events
GROUP BY 1, 2
"""


@query("q_stream_window", oracle=_STREAM_WINDOW_ORACLE)
def q_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts over event time — the batch form of the
    Structured Streaming windowed aggregation in streaming/ (same grouping;
    the streaming variant uses F.window + a watermark for late data)."""
    e = load_table(spark, sf_dir, "events")
    window_start = (F.floor(F.col("ts_us") / 21_600_000_000) * 21_600).cast(
        "bigint"
    )
    return (
        e.groupBy(window_start.alias("window_start_s"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


# Decimal-exact measure sums (the q_agg_basic discipline), then melted to
# long form. The oracle spells unpivot as UNION ALL — identical algebra,
# portable across engines.
_UNPIVOT_ORACLE = """
WITH base AS (
  SELECT l_returnflag,
         (CAST(floor(sum(CAST(l_quantity AS DECIMAL(14,2)))) AS DOUBLE) + CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) - floor(sum(CAST(l_quantity AS DECIMAL(14,2)))) AS DOUBLE))
           AS sum_qty,
         (CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(14,2)))) AS DOUBLE) + CAST(sum(CAST(l_extendedprice AS DECIMAL(14,2))) - floor(sum(CAST(l_extendedprice AS DECIMAL(14,2)))) AS DOUBLE))
           AS sum_price,
         (CAST(floor(sum(CAST(l_discount AS DECIMAL(14,2)))) AS DOUBLE) + CAST(sum(CAST(l_discount AS DECIMAL(14,2))) - floor(sum(CAST(l_discount AS DECIMAL(14,2)))) AS DOUBLE))
           AS sum_disc
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS amount FROM base
UNION ALL
SELECT l_returnflag, 'sum_price' AS measure, sum_price AS amount FROM base
UNION ALL
SELECT l_returnflag, 'sum_disc' AS measure, sum_disc AS amount FROM base
"""


@query("q_unpivot", oracle=_UNPIVOT_ORACLE)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long melt via DataFrame.unpivot — the inverse of q_pivot.
    Melting AFTER aggregation keeps the unpivot input at |groups| rows (a
    constant), so the row multiplication by |measures| is free at any
    scale; melting raw lineitem first would triple the shuffled bytes for
    the same answer."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag").agg(
        money_double(F.sum(F.col("l_quantity").cast("decimal(14,2)"))).alias("sum_qty"),
        money_double(
            F.sum(F.col("l_extendedprice").cast("decimal(14,2)"))
        ).alias("sum_price"),
        money_double(F.sum(F.col("l_discount").cast("decimal(14,2)"))).alias("sum_disc"),
    )
    return base.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="amount",
    )


# {tbl} parameterizes the identifier only; the algebra text is shared.
_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS cnt,
       (CAST(floor(sum(CAST(l_quantity AS DECIMAL(14,2)))) AS DOUBLE) + CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) - floor(sum(CAST(l_quantity AS DECIMAL(14,2)))) AS DOUBLE))
         AS sum_qty
FROM {tbl}
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@query("q_grouping_sets", oracle=_GROUPING_SETS_SQL.format(tbl="lineitem"))
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form rollup and cube compile
    to. Spark expands to one Expand node feeding a single hash aggregate:
    rows are replicated |sets| times map-side but partially aggregated
    before the shuffle, so the wire cost is |groups|, not |rows| x |sets|."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__gsets_lineitem")
    return spark.sql(_GROUPING_SETS_SQL.format(tbl="__gsets_lineitem"))


# --- full outer join ---------------------------------------------------------

_FULL_OUTER_ORACLE = """
SELECT coalesce(a.o_custkey, b.c_custkey) AS custkey,
       a.order_cnt,
       b.acctbal
FROM (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS order_cnt
  FROM orders GROUP BY o_custkey
) a
FULL JOIN (
  SELECT c_custkey, round(c_acctbal, 6) AS acctbal
  FROM customer WHERE c_acctbal > 5000
) b ON a.o_custkey = b.c_custkey
"""


@query("q_full_outer", oracle=_FULL_OUTER_ORACLE)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with all three row classes present: customers with
    orders and a high balance (matched), with orders only (right-null),
    and with a high balance but no orders (left-null — TPC-H leaves a
    third of customers orderless). Completes the join-type inventory
    (inner/broadcast, shuffle, semi, anti, left outer, full outer,
    as-of, range). Full outer cannot broadcast either side — both sides
    must shuffle on the key — so at scale the win is aggregating BEFORE
    the join (as here: the orders side arrives pre-collapsed to one row
    per customer) rather than outer-joining raw fact rows."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    a = o.groupBy("o_custkey").agg(F.count("*").alias("order_cnt"))
    b = c.filter(F.col("c_acctbal") > 5000).select(
        "c_custkey", F.round("c_acctbal", 6).alias("acctbal")
    )
    return a.join(b, a.o_custkey == b.c_custkey, "full").select(
        F.coalesce("o_custkey", "c_custkey").alias("custkey"),
        "order_cnt",
        "acctbal",
    )


# --- six-table star join (TPC-H Q5 shape) ------------------------------------

_MULTIWAY_ORACLE = """
SELECT n.n_name,
       (CAST(floor(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,6)))) AS DOUBLE) + CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,6))) - floor(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,6)))) AS DOUBLE)) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
               AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
"""


@query("q_join_multiway", oracle=_MULTIWAY_ORACLE)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: local-supplier revenue per nation — the canonical
    six-table star join (customer⋈orders⋈lineitem⋈supplier⋈nation⋈region)
    with the same-nation constraint that makes join ORDER matter.

    Scale shape: region/nation/supplier are broadcast (dims); the
    customer⋈orders⋈lineitem chain carries the two real shuffles, with
    the region+date predicates applied before any fact-side join so
    Catalyst pushes them into the scans. Revenue accumulates in exact
    decimals (the q_agg_basic discipline) so the hash holds at any
    scale."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    facts = (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .select("c_nationkey", "l_suppkey", "l_extendedprice", "l_discount")
    )
    j = facts.join(
        F.broadcast(dims),
        (facts.l_suppkey == dims.s_suppkey)
        & (facts.c_nationkey == dims.s_nationkey),
    )
    return j.groupBy("n_name").agg(
        money_double(F.sum(revenue_decimal())).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- ranking-function suite --------------------------------------------------

_WINDOW_SUITE_ORACLE = """
SELECT o_orderkey,
       o_orderpriority,
       CAST(rank() OVER w AS BIGINT) AS price_rank,
       CAST(dense_rank() OVER w AS BIGINT) AS price_dense_rank,
       round(percent_rank() OVER w, 6) AS price_pct_rank,
       round(cume_dist() OVER w, 6) AS price_cume_dist,
       round(first_value(o_totalprice) OVER w, 2) AS group_max_price
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey ASC)
"""


@query("q_window_suite", oracle=_WINDOW_SUITE_ORACLE)
def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking functions in one pass: rank / dense_rank /
    percent_rank / cume_dist / first_value sharing a single window spec
    (completes the surface next to row_number, ntile, lag/lead, and
    running/RANGE frames). One shuffle keyed by the partition column;
    percent_rank and cume_dist are integer-ratio divisions — IEEE-exact
    on both engines. Ties broken by the key so every rank is
    deterministic."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("bigint").alias("price_rank"),
        F.dense_rank().over(w).cast("bigint").alias("price_dense_rank"),
        F.round(F.percent_rank().over(w), 6).alias("price_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
        F.round(F.first("o_totalprice").over(w), 2).alias("group_max_price"),
    )


# --- VARIANT semi-structured type (Spark 4) ----------------------------------

_VARIANT_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k
FROM events
GROUP BY event_type
"""


@query("q_variant_json", oracle=_VARIANT_ORACLE)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's VARIANT type for semi-structured data: parse_json once
    into the binary variant encoding, then variant_get typed extraction —
    the engine-native path that replaces per-access string re-parsing
    (q_json_props shows get_json_object; q_from_json the static-schema
    struct; this completes the trio with the schema-flexible one).

    Scale note: VARIANT parses each props string ONCE and shreds fields
    on access from the binary form — with many extractions per row this
    beats repeated get_json_object scans of the raw text. Extraction is
    typed (bigint), so the aggregate is integer-exact."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json(F.col("props")).alias("vp")
    ).select(
        "event_type",
        F.variant_get(F.col("vp"), "$.k", "bigint").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )
