"""Unit tests for the profiling + maintenance query families
(plans/profiling_queries.py, plans/maintenance_queries.py): compaction
file-count reduction, CDC last-writer-wins determinism, zone-map
superset safety, and the integer outlier-algebra identity."""

import glob
import math
import os
import tempfile

import pyspark.sql.functions as F

from create_proposals_using_vector_db_public_spark.plans.maintenance_queries import (
    q_compaction,
)

SF = "/root/testdata/sf0.001"


def test_compaction_reduces_file_count(spark):
    out = q_compaction(spark, SF).collect()[0]
    # the query exposes its uuid-suffixed staging dir (glob+mtime guessing
    # would race a concurrent session's staging)
    base = q_compaction.last_base
    small = glob.glob(f"{base}/small/*.parquet")
    big = glob.glob(f"{base}/big/*.parquet")
    assert len(small) > len(big), (len(small), len(big))
    assert len(big) <= 2
    # nothing lost or duplicated across the rewrite
    src = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_orderstatus") == "O")
        .count()
    )
    assert out.n_rows == src


def test_cdc_apply_keeps_exactly_last_write(spark):
    rows = [
        # user 1: upsert then tombstone -> dropped
        (1, 10, "click", 100, 5.0),
        (1, 11, "error", 200, 6.0),
        # user 2: tombstone then upsert -> kept with last value
        (2, 20, "error", 100, 1.0),
        (2, 21, "view", 300, 2.5),
        # user 3: ts tie broken by event_id (higher id wins)
        (3, 30, "click", 100, 1.0),
        (3, 31, "click", 100, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, "
        "ts_us long, value double"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    last = (
        df.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select("user_id", "event_id", "value")
        .collect()
    )
    state = {r.user_id: (r.event_id, r.value) for r in last}
    assert 1 not in state
    assert state[2] == (21, 2.5)
    assert state[3] == (31, 9.0)


def test_outlier_integer_algebra_matches_float_zscore(spark):
    # the squared integer inequality == |x-mean| > 2*stddev_samp on floats
    vals = [100, 102, 98, 101, 99, 500]  # 500 is the outlier
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / (n - 1)
    flagged_float = [v for v in vals if abs(v - mean) > 2 * math.sqrt(var)]
    s, q = sum(vals), sum(v * v for v in vals)
    flagged_int = [
        v for v in vals
        if (n * v - s) ** 2 * (n - 1) > 4 * n * (n * q - s * s)
    ]
    assert flagged_int == flagged_float == [500]


def _zone_keep_ratio(li, zone):
    z = li.groupBy(zone.alias("zone_id")).agg(
        F.min("l_shipdate").alias("zmin"), F.max("l_shipdate").alias("zmax")
    )
    kept = z.filter(
        (F.col("zmin") <= "1996-03-31") & (F.col("zmax") >= "1996-01-01")
    ).select("zone_id")
    pred = (F.col("l_shipdate") >= "1996-01-01") & (
        F.col("l_shipdate") <= "1996-03-31"
    )
    pruned_count = (
        li.withColumn("zone_id", zone)
        .join(F.broadcast(kept), "zone_id", "left_semi")
        .filter(pred)
        .count()
    )
    return kept.count(), z.count(), pruned_count


def test_zonemap_pruning_is_result_invariant_and_needs_clustering(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    direct = li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") <= "1996-03-31")
    ).count()

    # clustered zones (by the predicate column): skip most, lose nothing
    month_zone = (
        F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1
    ).cast("bigint")
    kept, total, pruned = _zone_keep_ratio(li, month_zone)
    assert pruned == direct
    assert kept < total / 4, (kept, total)

    # random layout (orderkey blocks): stats span everything, zero skipping
    kept_r, total_r, pruned_r = _zone_keep_ratio(li, F.expr("l_orderkey div 64"))
    assert pruned_r == direct
    assert kept_r == total_r
