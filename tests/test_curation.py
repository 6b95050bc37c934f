"""Semantics pins for the batch-8 curation family: Gopher quality rules,
CCNet line dedup, SemDeDup, n-gram diversity — literal-DataFrame cases for
the operator logic plus non-vacuousness checks on the driver fixture (a
rule that never fires on the fixture proves nothing)."""

import os

import pytest

from pyspark.sql import functions as F

from create_proposals_using_vector_db_public_spark.operators import dedup as D
from create_proposals_using_vector_db_public_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

needs_fixture = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata absent"
)


# --- Gopher rules on literal docs -------------------------------------------

def test_gopher_rules_semantics(spark, tmp_path):
    docs = [
        # 60 clean words incl. two stopwords -> passes everything
        (1, "the a " + " ".join(["word"] * 58)),
        # too short (10 words)
        (2, "the a " + " ".join(["word"] * 8)),
        # mean word length too low: 60 one-char words (mean 1 < 3.75)
        (3, "the a " + " ".join(["x"] * 58)),
        # mean word length too high (mean > 5)
        (4, "the a " + " ".join(["extraordinary"] * 58)),
        # no stopwords
        (5, " ".join(["word"] * 60)),
    ]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    ).write.parquet(p)
    out = {
        r["doc_id"]: r
        for r in QUERIES["q_gopher_quality"](spark, str(tmp_path)).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["ok_count"] is False
    assert out[3]["keep"] is False and out[3]["ok_meanlen"] is False
    assert out[4]["keep"] is False and out[4]["ok_meanlen"] is False
    assert out[5]["keep"] is False and out[5]["ok_stop"] is False
    # the rules that did not fail must individually pass
    assert out[2]["ok_stop"] is True
    assert out[5]["ok_count"] is True and out[5]["ok_meanlen"] is True


# --- line dedup keep-first ----------------------------------------------------

def test_line_dedup_keeps_first_occurrence(spark, tmp_path):
    """Two docs sharing an identical 3-word line: the line counts as kept
    only in the lower-doc_id document."""
    shared = "alpha beta gamma"
    docs = [
        (10, shared + " delta epsilon zeta"),   # lines: shared, 'delta epsilon zeta'
        (20, shared + " eta theta iota"),       # lines: shared(dup), 'eta theta iota'
    ]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    ).write.parquet(p)
    out = {
        r["doc_id"]: r
        for r in QUERIES["q_line_dedup"](spark, str(tmp_path)).collect()
    }
    assert out[10]["n_lines"] == 2 and out[10]["n_kept"] == 2
    assert out[20]["n_lines"] == 2 and out[20]["n_kept"] == 1
    assert out[20]["kept_ratio"] == 0.5


# --- SemDeDup keep step -------------------------------------------------------

def test_semdedup_drops_higher_id_near_duplicate(spark):
    """Same cluster: near-identical vectors -> higher id dropped; the
    orthogonal vector survives. Different cluster: identical vector is NOT
    compared, so it survives."""
    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [1.0, 0.0001]),   # cosine ~1 with id 1 -> dropped
        (3, 0, [0.0, 1.0]),      # orthogonal -> kept
        (4, 1, [1.0, 0.0]),      # identical to id 1 but other cluster -> kept
    ]
    df = spark.createDataFrame(
        rows, "vec_id: long, centroid_id: long, embedding: array<double>"
    )
    kept = sorted(
        r["vec_id"]
        for r in D.semdedup_keep(df, threshold=0.9).collect()
    )
    assert kept == [1, 3, 4]


def test_semdedup_transitive_chain_keeps_only_min_id(spark):
    """A,B,C mutually similar: only the minimum id survives (B and C each
    have a lower-id near-duplicate; the rule is not 'pairwise greedy')."""
    rows = [
        (1, 0, [1.0, 0.0]),
        (2, 0, [1.0, 0.001]),
        (3, 0, [1.0, 0.002]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id: long, centroid_id: long, embedding: array<double>"
    )
    kept = sorted(
        r["vec_id"] for r in D.semdedup_keep(df, threshold=0.9).collect()
    )
    assert kept == [1]


# --- non-vacuousness on the driver fixture -----------------------------------

@needs_fixture
def test_gopher_rules_discriminate_on_fixture(spark):
    agg = (
        QUERIES["q_gopher_quality"](spark, SF)
        .agg(
            F.count("*").alias("n"),
            *[
                F.sum(F.col(c).cast("long")).alias(c)
                for c in ("ok_count", "ok_meanlen", "ok_stop", "keep")
            ],
        )
        .collect()[0]
    )
    for c in ("ok_count", "ok_meanlen", "ok_stop", "keep"):
        assert 0 < agg[c] < agg["n"], f"rule {c} is vacuous on the fixture"


@needs_fixture
def test_line_dedup_removes_lines_on_fixture(spark):
    agg = (
        QUERIES["q_line_dedup"](spark, SF)
        .agg(F.sum("n_lines").alias("t"), F.sum("n_kept").alias("k"))
        .collect()[0]
    )
    assert 0 < agg["k"] < agg["t"]


@needs_fixture
def test_semdedup_drops_some_keeps_most_on_fixture(spark):
    kept = QUERIES["q_semdedup"](spark, SF).count()
    total = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert 0 < kept < total
    assert kept > total // 2  # tau=0.3 trims the tail, not the corpus


# --- bounded-ncent production config (round 10) ------------------------------

def test_semdedup_ncent_formula():
    """The centroid-count formula at its three regimes: floor (small n),
    proportional (mid), cap-bound (production). The knee is exactly
    n = cap * csize = 200k; the capped and default configs must agree
    everywhere at or below it."""
    from create_proposals_using_vector_db_public_spark.plans.curation_queries import (
        _SEMDEDUP_NCENT_CAP,
        _semdedup_ncent,
    )

    for n, want_default in [(1, 32), (500, 32), (20_000, 32),
                            (100_000, 160), (200_000, 320)]:
        assert _semdedup_ncent(n) == want_default
        assert _semdedup_ncent(n, _SEMDEDUP_NCENT_CAP) == want_default
    # above the knee the configs diverge: default keeps growing, cap binds
    assert _semdedup_ncent(250_000) == 400
    assert _semdedup_ncent(250_000, _SEMDEDUP_NCENT_CAP) == 320
    assert _semdedup_ncent(600_000) == 960
    assert _semdedup_ncent(600_000, _SEMDEDUP_NCENT_CAP) == 320


def test_semdedup_ncent_config_mutual_exclusion():
    """cap and sqrt_coef name different configs of the same knob; a
    caller passing both is confused and must hear about it loudly
    instead of getting an uncapped result (round-11 ADVICE). Passing
    either alone — or neither — stays valid."""
    import pytest

    from create_proposals_using_vector_db_public_spark.plans.curation_queries import (
        _SEMDEDUP_NCENT_CAP,
        _SEMDEDUP_SQRT_COEF,
        _semdedup_ncent,
    )

    with pytest.raises(ValueError, match="mutually exclusive"):
        _semdedup_ncent(
            600_000, cap=_SEMDEDUP_NCENT_CAP, sqrt_coef=_SEMDEDUP_SQRT_COEF
        )
    # the three legal call shapes are unchanged by the guard
    assert _semdedup_ncent(600_000) == 960
    assert _semdedup_ncent(600_000, cap=_SEMDEDUP_NCENT_CAP) == 320
    assert _semdedup_ncent(600_000, sqrt_coef=_SEMDEDUP_SQRT_COEF) == 735


def test_semdedup_ncent_sqrt_formula():
    """The round-11 sqrt config: ncent = max(32, floor(0.95*sqrt(n))).
    Floors at 32 with the other configs at the driver's sf0.001/sf0.01,
    diverges from the default's floor already at sf0.1 (n=2000 -> 42,
    the binding-point parity SF), and lands at 735 at the sf30
    measurement point (n=600k) — between the default's 960 and the
    cap's 320, as the optimum of T(c) = a*n*c + p*n^2/c must."""
    from create_proposals_using_vector_db_public_spark.plans.curation_queries import (
        _SEMDEDUP_SQRT_COEF,
        _semdedup_ncent,
    )

    def sq(n):
        return _semdedup_ncent(n, sqrt_coef=_SEMDEDUP_SQRT_COEF)

    assert sq(20) == 32        # sf0.001
    assert sq(200) == 32       # sf0.01 — coincides with the default: the
    assert sq(500) == 32       # driver row checks the shared plan
    assert sq(2_000) == 42     # sf0.1 — binding vs the default's 32
    assert sq(20_000) == 134   # sf1
    assert sq(200_000) == 424  # sf10
    assert sq(600_000) == 735  # sf30 — the round-11 measurement point


def test_semdedup_sqrt_oracle_is_one_surgical_edit():
    """Same construction invariant as the capped oracle: the sqrt oracle
    must be the default text with EXACTLY the ncent scalar-subquery
    expression swapped — nothing else may differ."""
    import re

    from create_proposals_using_vector_db_public_spark.plans.curation_queries import (
        _SEMDEDUP_ORACLE,
        _SEMDEDUP_SQRT_ORACLE,
    )

    sqrt_expr = "greatest(32, CAST(floor(0.95 * sqrt(count(*))) AS BIGINT))"
    assert sqrt_expr in _SEMDEDUP_SQRT_ORACLE
    # the default text has sqrt() only in the L2 distance, never in ncent
    assert "floor(0.95 * sqrt" not in _SEMDEDUP_ORACLE

    def residue(text, expr_pat):
        return re.sub(r"\s+", " ", re.sub(expr_pat, "<NCENT>", text)).strip()

    assert residue(
        _SEMDEDUP_ORACLE, r"greatest\(32,\s*count\(\*\) // 625\)"
    ) == residue(_SEMDEDUP_SQRT_ORACLE, re.escape(sqrt_expr))


@needs_fixture
def test_semdedup_sqrt_identical_at_floor(spark):
    """At the driver fixture SF (n=20 embeddings) every ncent formula
    floors at 32, so the sqrt config must return the exact same kept set
    as the paper-proportional default."""
    a = {tuple(r) for r in QUERIES["q_semdedup"](spark, SF).collect()}
    b = {tuple(r) for r in QUERIES["q_semdedup_sqrt"](spark, SF).collect()}
    assert a == b and len(a) > 0


def test_semdedup_capped_oracle_is_one_surgical_edit():
    """The capped oracle must be the default oracle text with EXACTLY the
    ncent scalar-subquery expression swapped — nothing else may differ,
    so q_semdedup's round-9-verified text transfers structurally to the
    capped variant."""
    from create_proposals_using_vector_db_public_spark.plans.curation_queries import (
        _SEMDEDUP_CAPPED_ORACLE,
        _SEMDEDUP_ORACLE,
    )

    assert "least(greatest(32, count(*) // 625), 320)" in _SEMDEDUP_CAPPED_ORACLE
    assert "least(" not in _SEMDEDUP_ORACLE
    # removing the one edited expression from each text leaves identical
    # residue (whitespace-normalized: the substitution joins two lines)
    import re

    def residue(text, expr_pat):
        return re.sub(r"\s+", " ", re.sub(expr_pat, "<NCENT>", text)).strip()

    assert residue(
        _SEMDEDUP_ORACLE, r"greatest\(32,\s*count\(\*\) // 625\)"
    ) == residue(
        _SEMDEDUP_CAPPED_ORACLE,
        r"least\(greatest\(32, count\(\*\) // 625\), 320\)",
    )


@needs_fixture
def test_semdedup_capped_identical_below_knee(spark):
    """At every driver SF the corpus is far below the 200k-vector knee,
    so the production capped config must return the exact same kept set
    as the paper-proportional default (both at the 32-centroid floor)."""
    a = {tuple(r) for r in QUERIES["q_semdedup"](spark, SF).collect()}
    b = {tuple(r) for r in QUERIES["q_semdedup_capped"](spark, SF).collect()}
    assert a == b and len(a) > 0


@needs_fixture
def test_ngram_diversity_ratio_bounds(spark):
    rows = QUERIES["q_ngram_diversity"](spark, SF).collect()
    assert len(rows) == 20  # one per source
    for r in rows:
        assert 0 < r["n_distinct"] <= r["n_ngrams"]
        assert 0.0 < r["distinct_ratio"] <= 1.0
    # the corpus repeats trigrams across docs, so at least one source < 1
    assert any(r["distinct_ratio"] < 1.0 for r in rows)
