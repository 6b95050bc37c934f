"""Unit tests for the layout/corpus-statistics query family
(plans/layout_queries.py): chunk-window boundary semantics, Morton
interleave math, and salted-join == plain-join equivalence."""

import pyspark.sql.functions as F
import pytest

from create_proposals_using_vector_db_public_spark.functions import text as T
from create_proposals_using_vector_db_public_spark.plans.layout_queries import (
    _CHUNK_STRIDE,
    _CHUNK_WIDTH,
    _SALT,
    _z_terms,
)


def _morton_ref(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_chunk_windows_cover_all_tokens_with_overlap(spark):
    n_tokens = 100
    text = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    toked = df.select("doc_id", T.tokens("text").alias("toks")).withColumn(
        "n", F.size("toks")
    )
    starts = F.sequence(F.lit(0), F.col("n") - 1, F.lit(_CHUNK_STRIDE))
    rows = (
        toked.select(F.explode(starts).alias("start"), "toks", "n")
        .select(
            "start",
            F.slice("toks", F.col("start") + 1, F.lit(_CHUNK_WIDTH)).alias("c"),
        )
        .collect()
    )
    # starts advance by stride and stop before n
    assert [r.start for r in rows] == list(range(0, n_tokens, _CHUNK_STRIDE))
    # every token appears in some window; consecutive windows overlap by
    # width - stride tokens; the tail window is short, never empty
    seen = [t for r in rows for t in r.c]
    assert set(seen) == {f"w{i}" for i in range(n_tokens)}
    assert all(1 <= len(r.c) <= _CHUNK_WIDTH for r in rows)
    overlap = _CHUNK_WIDTH - _CHUNK_STRIDE
    assert rows[0].c[-overlap:] == rows[1].c[:overlap]


def test_morton_interleave_matches_reference_python(spark):
    cases = [(0, 0), (255, 255), (1, 0), (0, 1), (170, 85), (200, 13)]
    df = spark.createDataFrame(cases, "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", F.expr(_z_terms("x", "y")).alias("z")
        ).collect()
    }
    for x, y in cases:
        assert got[(x, y)] == _morton_ref(x, y), (x, y)
    # z-order locality: the max z within a quadrant is below the min z of
    # the next quadrant level only for aligned power-of-two boxes; check
    # the defining bit property instead: top bits of z == interleave of
    # top bits of (x, y)
    assert _morton_ref(128, 128) == 3 << 14


def test_salted_join_equals_plain_join(spark):
    # one hot key (42) with many fact rows, plus cold keys
    dim = spark.createDataFrame(
        [(42, 1), (7, 2), (9, 3)], "k int, attr int"
    )
    fact = spark.createDataFrame(
        [(i, 42 if i % 4 != 0 else (7 if i % 8 == 0 else 9), i * 1.0)
         for i in range(200)],
        "fid int, k int, v double",
    )
    plain = (
        fact.join(dim, "k").groupBy("attr").agg(
            F.count("*").alias("n"), F.round(F.sum("v"), 6).alias("s")
        )
    ).collect()
    dim_rep = dim.select(
        "k", "attr",
        F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1))).alias("salt"),
    )
    fact_s = fact.withColumn(
        "salt", F.pmod(F.xxhash64("fid"), F.lit(_SALT)).cast("int")
    )
    salted = (
        fact_s.join(
            dim_rep,
            (fact_s.k == dim_rep.k) & (fact_s.salt == dim_rep.salt),
        )
        .groupBy("attr")
        .agg(F.count("*").alias("n"), F.round(F.sum("v"), 6).alias("s"))
    ).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
    # the salt column actually spreads the hot key across distinct values
    n_salts = (
        fact_s.filter(F.col("k") == 42).select("salt").distinct().count()
    )
    assert n_salts > 1
