"""Semantic pins for the round-2 profiling/behavior/temporal additions:
EWMA weight math on a hand-computed series, transition probabilities
summing to one, IVM delta algebra on a toy table, and the fail-loud
policy for corrupt stores."""

import os
import pickle
import tempfile

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from create_proposals_using_vector_db_public_spark.plans import QUERIES
from create_proposals_using_vector_db_public_spark.sources import pickle_store

SF = "/root/testdata/sf0.001"


def test_ewma_fixed_depth_weights(spark):
    # one user, 3 events, v100 = 100, 200, 400 (cents)
    rows = [(1, 1, 1000, 100), (1, 2, 2000, 200), (1, 3, 3000, 400)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, v100 long"
    )
    depth = 8
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    num = F.col("v100") * F.lit(2 ** (depth - 1))
    den = F.lit(2 ** (depth - 1))
    for j in range(1, depth):
        lj = F.lag("v100", j).over(w)
        wgt = 2 ** (depth - 1 - j)
        num = num + F.coalesce(lj, F.lit(0)) * F.lit(wgt)
        den = den + F.when(lj.isNull(), 0).otherwise(wgt)
    got = {
        r.event_id: r.e
        for r in df.select(
            "event_id", F.round(num / den / 100, 6).alias("e")
        ).collect()
    }
    # row 3: (400*128 + 200*64 + 100*32) / (128+64+32) / 100
    assert got[3] == round((400 * 128 + 200 * 64 + 100 * 32) / 224 / 100, 6)
    # row 1: no history -> its own value
    assert got[1] == 1.0


def test_transition_probabilities_row_normalize(spark):
    from create_proposals_using_vector_db_public_spark.plans.behavior_queries import (
        q_transitions,
    )

    out = q_transitions(spark, "/root/testdata/sf0.001").collect()
    by_prev = {}
    for r in out:
        by_prev.setdefault(r.prev_type, []).append(r.p_transition)
    for prev, ps in by_prev.items():
        assert abs(sum(ps) - 1.0) < 1e-4, (prev, sum(ps))


def test_ivm_delta_algebra_equals_full_join(spark):
    a = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "ak long, k long"
    )
    b = spark.createDataFrame([(0, "x"), (1, "y"), (2, "z")], "k long, v string")
    a_old, d_a = a.filter(F.col("ak") % 5 != 0), a.filter(F.col("ak") % 5 == 0)
    b_old, d_b = b.filter(F.col("k") != 1), b.filter(F.col("k") == 1)
    full = a.join(b, "k").count()
    inc = (
        a_old.join(b_old, "k")
        .unionByName(d_a.join(b_old, "k"))
        .unionByName(a_old.join(d_b, "k"))
        .unionByName(d_a.join(d_b, "k"))
        .count()
    )
    assert inc == full


def test_corrupt_pickle_store_fails_loudly(spark):
    path = os.path.join(
        tempfile.mkdtemp(prefix="pickle_corrupt_"), "doc_data.pkl"
    )
    with open(path, "wb") as f:
        f.write(b"not a pickle at all")
    with pytest.raises(Exception):
        pickle_store.read_doc_data(spark, path).collect()
    # and a structurally-wrong store (missing keys) also fails, not
    # silently yields zero rows
    with open(path, "wb") as f:
        pickle.dump({"names": []}, f)
    with pytest.raises(Exception):
        pickle_store.read_doc_data(spark, path).collect()


# --- event-pattern matching --------------------------------------------------

def test_event_pattern_counts_on_literal_sequence(spark, tmp_path):
    """Hand-checkable history: 'vcpvxcp'-style sequences with known
    contiguous and gapped match counts, arrival order scrambled to prove
    the sort_array assembly."""
    import os

    rows = [
        # user 1 ordered: v c p v c p  -> contig 2, funnel 2
        (1, 10, 1, "view"), (1, 20, 2, "click"), (1, 30, 3, "purchase"),
        (1, 40, 4, "view"), (1, 50, 5, "click"), (1, 60, 6, "purchase"),
        # user 2 ordered: v e c s p -> contig 0, funnel 1 (gapped)
        (2, 10, 7, "view"), (2, 20, 8, "error"), (2, 30, 9, "click"),
        (2, 40, 10, "signup"), (2, 50, 11, "purchase"),
        # user 3 ordered: v p c p -> funnel 0 (purchase intervenes before c)
        (3, 10, 12, "view"), (3, 20, 13, "purchase"), (3, 30, 14, "click"),
        (3, 40, 15, "purchase"),
    ]
    import random

    rng = random.Random(7)
    rng.shuffle(rows)
    df = spark.createDataFrame(
        [(u, e, t, ty) for (u, t, e, ty) in rows],
        "user_id: long, event_id: long, us: long, event_type: string",
    ).select(
        "user_id", "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "event_type",
        F.lit(0.0).alias("value"), F.lit("{}").alias("props"),
    )
    p = str(tmp_path / "events.parquet")
    df.write.parquet(p)
    out = {
        r["user_id"]: r
        for r in QUERIES["q_event_pattern"](spark, str(tmp_path)).collect()
    }
    assert out[1]["n_contig"] == 2 and out[1]["n_funnel"] == 2
    assert out[2]["n_contig"] == 0 and out[2]["n_funnel"] == 1
    assert out[3]["n_contig"] == 0 and out[3]["n_funnel"] == 0
    assert out[2]["n_events"] == 5


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")
def test_event_pattern_fixture_counts_vary(spark):
    rows = QUERIES["q_event_pattern"](spark, SF).collect()
    assert len(rows) > 0
    funnels = {r["n_funnel"] for r in rows}
    assert len(funnels) > 1, "pattern counts are constant — vacuous"
