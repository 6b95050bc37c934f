"""Semantic invariants for the batch-6 OLAP shapes, collocations, and BPE
merge induction (plans/olap_queries.py, text/assembly additions) beyond
the DuckDB value parity that tools/parity.py already enforces."""

import pyspark.sql.functions as F

from create_proposals_using_vector_db_public_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_top_revenue_is_the_argmax(spark):
    rows = QUERIES["q_top_revenue"](spark, SF).collect()
    assert rows, "top-revenue supplier set must be non-empty"
    # every returned supplier carries the same revenue...
    assert len({r.total_revenue for r in rows}) == 1
    # ...and it must BE the maximum per-supplier revenue, independently
    # recomputed (a regression returning the min-tied set would otherwise
    # still pass the single-value check)
    li = spark.read.parquet(f"{SF}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-07-01")
    )
    expected = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("r")
        )
        .agg(F.max(F.round(F.col("r").cast("double"), 6)))
        .collect()[0][0]
    )
    assert rows[0].total_revenue == expected


def test_min_cost_supplier_is_deterministic_under_repartition(spark):
    """The argmin window orders by a TOTAL order (acctbal, suppkey), so the
    survivor set must be identical under different parallelism."""
    a = {tuple(r) for r in QUERIES["q_min_cost_supplier"](spark, SF).collect()}
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = {
            tuple(r)
            for r in QUERIES["q_min_cost_supplier"](spark, SF).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_market_share_is_a_proportion(spark):
    rows = QUERIES["q_market_share"](spark, SF).collect()
    assert rows
    assert all(0.0 <= r.mkt_share <= 1.0 for r in rows)


def test_promo_share_bounds_and_priority_mix_partition(spark):
    shares = QUERIES["q_promo_share"](spark, SF).collect()
    assert shares and all(0.0 <= r.promo_share <= 100.0 for r in shares)
    mix = QUERIES["q_priority_mix"](spark, SF)
    # high + low must partition the joined rows exactly
    total = mix.agg(
        F.sum(F.col("high_line_count") + F.col("low_line_count"))
    ).collect()[0][0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-07-01")
    )
    assert total == li.count()


def test_bpe_merges_rank_contract(spark):
    rows = QUERIES["q_bpe_merges"](spark, SF).collect()
    assert len(rows) == 20
    by_rank = sorted(rows, key=lambda r: r.merge_rank)
    assert [r.merge_rank for r in by_rank] == list(range(1, 21))
    freqs = [r.pair_freq for r in by_rank]
    assert freqs == sorted(freqs, reverse=True)
    # the end-of-word marker must participate (BPE's word-final pairs)
    assert any(r.sym2 == "</w>" for r in rows)


def test_collocations_lift_identity(spark):
    """Independence baseline: lift of a pair must equal
    (n_pair/nb) / ((c1/t)*(c2/t)) recomputed from raw token counts in
    plain Python (same IEEE op order; tolerance absorbs the rounding-mode
    difference between F.round and Python round)."""
    import re
    from collections import Counter

    rows = QUERIES["q_collocations"](spark, SF).collect()
    assert rows
    assert all(r.n_pair >= 5 and r.lift > 0 for r in rows)

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    uni, bi = Counter(), Counter()
    for (text,) in docs:
        toks = [t.strip() for t in re.split(r"\s+", text) if t.strip()]
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    nb, t = sum(bi.values()), sum(uni.values())
    for r in rows:
        expected = (bi[(r.w1, r.w2)] / nb) / (
            (uni[r.w1] / t) * (uni[r.w2] / t)
        )
        assert r.n_pair == bi[(r.w1, r.w2)]
        assert abs(r.lift - expected) < 1e-5, (r, expected)
