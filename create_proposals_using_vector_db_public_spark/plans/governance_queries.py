"""Data-governance declared queries, round 2 batch 8: k-anonymity /
l-diversity audit over a generalization ladder, and per-record
re-identification risk.

A corpus pipeline that ships training data carries the same governance
obligations as any data product: before release, measure how identifying
the quasi-identifier columns are and how much generalization is needed.
k-anonymity (Sweeney 2002) and l-diversity (Machanavasjhala et al. 2006)
are the public-textbook metrics.

Everything is exact integer arithmetic: account balances become integer
cents (shifted non-negative so Spark's truncating ``div`` and DuckDB's
flooring ``//`` agree), bucket widths are ladder constants, and the one
float (1/group_size risk) is a single exact-integer division both engines
perform identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

# Generalization ladder: bucket widths in cents ($10000, $1000, $100, $1).
# The fixture flips both k_ok and l_ok inside this ladder at every SF
# (coarse widths pass, the $1 width always has singleton groups).
_WIDTHS = (100_000_000 // 100, 100_000, 10_000, 100)
_K = 3
_L = 2
# acctbal >= -999.99 → cents >= -99_999; shifting by 1e6 keeps every
# bucket id non-negative so truncating and flooring division agree.
_SHIFT = 1_000_000

_KANON_ORACLE = f"""
WITH c AS (
  SELECT CAST(round(c_acctbal * 100) AS BIGINT) + {_SHIFT} AS cents,
         c_mktsegment AS seg
  FROM customer
), ex AS (
  SELECT unnest({list(_WIDTHS)!r}) AS width, cents, seg FROM c
), g AS (
  SELECT width, cents // width AS b,
         count(*) AS n, count(DISTINCT seg) AS l
  FROM ex GROUP BY width, b
)
SELECT CAST(width AS BIGINT) AS width_cents,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(n) AS BIGINT) AS min_group_n,
       CAST(sum(CASE WHEN n < {_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS k_violations,
       sum(CASE WHEN n < {_K} THEN 1 ELSE 0 END) = 0 AS k_ok,
       CAST(sum(CASE WHEN l < {_L} THEN 1 ELSE 0 END) AS BIGINT)
         AS l_violations,
       sum(CASE WHEN l < {_L} THEN 1 ELSE 0 END) = 0 AS l_ok
FROM g GROUP BY width
"""


@query("q_k_anonymity", oracle=_KANON_ORACLE)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity + l-diversity audit across a 4-step generalization
    ladder of the account-balance quasi-identifier (sensitive attribute:
    market segment). Per width: group count, smallest group, k<3
    violations, l<2 violations, and the pass booleans — the table a
    release decision reads to pick the coarsest safe generalization.

    Scale shape: one scan, a 4x explode (one row per ladder step), then
    two stacked aggregations — (width, bucket) partial+final, then per
    width. Shuffle keys are (int, int); segment strings reduce to a
    distinct-count before the second aggregate. At 100 TB this is a
    cheap single-pass audit."""
    c = load_table(spark, sf_dir, "customer").select(
        (F.round(F.col("c_acctbal") * 100).cast("long") + _SHIFT).alias(
            "cents"
        ),
        F.col("c_mktsegment").alias("seg"),
    )
    ex = c.select(
        F.explode(F.array(*[F.lit(w) for w in _WIDTHS])).alias("width"),
        "cents",
        "seg",
    )
    g = ex.select(
        "width", F.expr("cents div width").alias("b"), "seg"
    ).groupBy("width", "b").agg(
        F.count("*").alias("n"), F.countDistinct("seg").alias("l")
    )
    kv = F.sum(F.when(F.col("n") < _K, 1).otherwise(0))
    lv = F.sum(F.when(F.col("l") < _L, 1).otherwise(0))
    return g.groupBy("width").agg(
        F.count("*").alias("n_groups"),
        F.min("n").alias("min_group_n"),
        kv.alias("k_violations"),
        (kv == 0).alias("k_ok"),
        lv.alias("l_violations"),
        (lv == 0).alias("l_ok"),
    ).select(
        F.col("width").cast("long").alias("width_cents"),
        "n_groups",
        "min_group_n",
        "k_violations",
        "k_ok",
        "l_violations",
        "l_ok",
    )


# --- per-record re-identification risk ---------------------------------------

_RISK_WIDTH = 10_000  # $100 buckets: group sizes vary at every SF

_RISK_ORACLE = f"""
WITH c AS (
  SELECT c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) + {_SHIFT} AS cents
  FROM customer
), g AS (
  SELECT cents // {_RISK_WIDTH} AS b, count(*) AS n
  FROM c GROUP BY b
)
SELECT c.c_custkey, CAST(g.n AS BIGINT) AS group_n,
       round(1.0 / g.n, 6) AS risk
FROM c JOIN g ON c.cents // {_RISK_WIDTH} = g.b
ORDER BY risk DESC, c.c_custkey ASC
LIMIT 20
"""


@query("q_reident_risk", oracle=_RISK_ORACLE)
def q_reident_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prosecutor-model re-identification risk per record (1/equivalence-
    class size) at the $100 generalization, top-20 riskiest records — the
    row-level view behind q_k_anonymity's aggregate verdicts.

    The group-size table is |buckets|-sized and broadcast back onto the
    records; the risk is one exact integer division. TakeOrdered gives
    the top-20 without a global sort."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (
            (F.round(F.col("c_acctbal") * 100).cast("long") + _SHIFT)
        ).alias("cents"),
    ).withColumn("b", F.expr(f"cents div {_RISK_WIDTH}"))
    g = c.groupBy("b").agg(F.count("*").alias("group_n"))
    return (
        c.join(F.broadcast(g), "b")
        .select(
            "c_custkey",
            "group_n",
            F.round(1.0 / F.col("group_n"), 6).alias("risk"),
        )
        .orderBy(F.col("risk").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
