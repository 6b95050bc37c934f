"""Semantic invariants for the batch-7 decision-support shapes
(plans/decision_queries.py — the Q3/Q6/Q7/Q9/Q10/Q11/Q13/Q16/Q19/Q21
analogues) beyond the DuckDB value parity tools/parity.py enforces."""

import pyspark.sql.functions as F

from create_proposals_using_vector_db_public_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_ship_priority_topk_contract(spark):
    rows = QUERIES["q_ship_priority"](spark, SF).collect()
    assert 0 < len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    # the cut must be the TRUE top-10: the worst kept revenue beats (or
    # ties) every revenue outside the cut, recomputed independently
    li = spark.read.parquet(f"{SF}/lineitem.parquet").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    c = spark.read.parquet(f"{SF}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    all_rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c.select("c_custkey"), o["o_custkey"] == F.col("c_custkey"), "left_semi")
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ).cast("double"),
                6,
            ).alias("revenue")
        )
        .collect()
    )
    outside = [
        r.revenue for r in all_rev if r.l_orderkey not in {x.l_orderkey for x in rows}
    ]
    if outside:
        assert min(revs) >= max(outside)


def test_forecast_revenue_matches_filtered_recompute(spark):
    row = QUERIES["q_forecast_revenue"](spark, SF).collect()[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    assert row.n_lines == li.count() > 0
    assert row.revenue_delta > 0


def test_nation_volume_directions_and_years(spark):
    rows = QUERIES["q_nation_volume"](spark, SF).collect()
    # both directions and both years populated at every SF (the pair was
    # chosen for that — sf0.001 has suppliers in only 10 nations)
    assert {(r.supp_nation, r.cust_nation, r.l_year) for r in rows} == {
        ("NATION_12", "NATION_13", "1996"),
        ("NATION_12", "NATION_13", "1997"),
        ("NATION_13", "NATION_12", "1996"),
        ("NATION_13", "NATION_12", "1997"),
    }
    assert all(r.revenue > 0 for r in rows)


def test_important_parts_threshold_is_global(spark):
    rows = QUERIES["q_important_parts"](spark, SF).collect()
    assert rows
    pv = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("v")
        )
        .collect()
    )
    total = sum(float(r.v) for r in pv)
    thr = 1.2 * total / len(pv)
    kept = {r.l_partkey for r in rows}
    # allow float-recompute slack only AT the boundary; membership must
    # agree for values clearly on either side
    for r in pv:
        v = float(r.v)
        if v > thr * 1.0001:
            assert r.l_partkey in kept
        elif v < thr * 0.9999:
            assert r.l_partkey not in kept


def test_order_dist_counts_every_customer_once(spark):
    rows = QUERIES["q_order_dist"](spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r.custdist for r in rows) == n_cust
    assert all(r.c_count >= 0 for r in rows)


def test_supplier_cnt_excludes_blacklist(spark):
    df = QUERIES["q_supplier_cnt"](spark, SF)
    rows = df.collect()
    assert rows
    n_ok_supp = (
        spark.read.parquet(f"{SF}/supplier.parquet")
        .filter(F.col("s_acctbal") >= 1000.0)
        .count()
    )
    assert all(0 < r.supplier_cnt <= n_ok_supp for r in rows)
    assert all(r.p_size in {1, 9, 19, 29, 39, 49} for r in rows)
    assert all(r.p_brand != "Brand#1" for r in rows)


def test_waiting_supplier_sole_fault_semantics(spark):
    rows = QUERIES["q_waiting_supplier"](spark, SF).collect()
    assert rows and all(r.numwait > 0 for r in rows)
    # cross-check one qualifying order end-to-end in plain Python
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
        .collect()
    )
    finished = {
        r.o_orderkey
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
        .collect()
    }
    from collections import defaultdict

    by_order = defaultdict(list)
    for r in li:
        if r.l_orderkey in finished:
            by_order[r.l_orderkey].append(r)
    expected = defaultdict(int)
    for lines in by_order.values():
        supps = {x.l_suppkey for x in lines}
        r_supps = {x.l_suppkey for x in lines if x.l_returnflag == "R"}
        if len(supps) > 1 and len(r_supps) == 1:
            culprit = next(iter(r_supps))
            expected[culprit] += sum(
                1 for x in lines if x.l_returnflag == "R"
            )
    snames = {
        r.s_suppkey: r.s_name
        for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()
    }
    expected_by_name = defaultdict(int)
    for k, v in expected.items():
        expected_by_name[snames[k]] += v
    assert {r.s_name: r.numwait for r in rows} == dict(expected_by_name)


def test_disjunct_filter_pushes_both_sides(spark):
    df = QUERIES["q_disjunct_filter"](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    # the implied per-side disjunctions must reach BOTH parquet scans
    assert any("l_quantity" in ln for ln in pushed)
    assert any("p_brand" in ln for ln in pushed)
    row = df.collect()[0]
    assert row.n_lines > 0 and row.revenue > 0
