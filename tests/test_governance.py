"""Pins for the governance family: the generalization ladder must
actually flip from failing to passing on the fixture (a one-sided audit
proves nothing), and the risk metric must be 1/group-size."""

import os

import pytest

from create_proposals_using_vector_db_public_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata absent"
)


def test_ladder_flips_k_and_l_on_fixture(spark):
    rows = {
        r["width_cents"]: r for r in QUERIES["q_k_anonymity"](spark, SF).collect()
    }
    assert len(rows) == 4
    oks = [rows[w]["k_ok"] for w in sorted(rows)]
    assert True in oks and False in oks, "k_ok never flips on the ladder"
    loks = [rows[w]["l_ok"] for w in sorted(rows)]
    assert True in loks and False in loks, "l_ok never flips on the ladder"
    # coarser generalization can only merge groups: group count monotone
    widths = sorted(rows, reverse=True)
    counts = [rows[w]["n_groups"] for w in widths]
    assert counts == sorted(counts)
    # the $1 width always has singleton groups
    assert rows[100]["min_group_n"] == 1 and rows[100]["k_ok"] is False


def test_reident_risk_is_reciprocal_group_size(spark):
    rows = QUERIES["q_reident_risk"](spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["risk"] == round(1.0 / r["group_n"], 6)
    # ordered riskiest-first, custkey tiebreak
    risks = [(-r["risk"], r["c_custkey"]) for r in rows]
    assert risks == sorted(risks)
