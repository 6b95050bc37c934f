"""Semantic invariants for the training-data selection operators
(plans/selection_queries.py) beyond DuckDB value parity."""

import pyspark.sql.functions as F

from create_proposals_using_vector_db_public_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_corpus_shuffle_is_a_permutation(spark):
    rows = QUERIES["q_corpus_shuffle"](spark, SF).collect()
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n
    assert len({r.doc_id for r in rows}) == n
    # (shard, pos) addresses are unique and dense within each shard
    addr = {(r.shard, r.pos) for r in rows}
    assert len(addr) == n
    from collections import defaultdict

    per_shard = defaultdict(list)
    for r in rows:
        per_shard[r.shard].append(r.pos)
    for shard, poss in per_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # the permutation must not be the identity-ish doc_id order: within a
    # shard, position order must disagree with id order somewhere
    scrambled = any(
        [p for _, p in sorted((r.doc_id, r.pos) for r in rows if r.shard == s)]
        != sorted(p for r in rows if r.shard == s for p in [r.pos])
        for s in per_shard
    )
    assert scrambled


def test_corpus_shuffle_deterministic_across_runs(spark):
    a = {(r.doc_id, r.shard, r.pos) for r in QUERIES["q_corpus_shuffle"](spark, SF).collect()}
    b = {(r.doc_id, r.shard, r.pos) for r in QUERIES["q_corpus_shuffle"](spark, SF).collect()}
    assert a == b


def test_dsir_select_driver_fixture_contract(spark):
    """On the driver fixture every language shares one 31-term vocabulary,
    so there is no lexical signal to prefer — what must hold there is the
    exact plumbing: one score per doc, positive integers, a non-trivial
    above-mean split, and run-to-run determinism."""
    rows = QUERIES["q_dsir_select"](spark, SF).collect()
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n
    assert all(isinstance(r.dsir_score, int) and r.dsir_score > 0 for r in rows)
    sel = {r.doc_id for r in rows if r.selected}
    assert sel and len(sel) < n, "above-mean split must be non-trivial"
    again = {r.doc_id for r in QUERIES["q_dsir_select"](spark, SF).collect() if r.selected}
    assert sel == again


def test_dsir_scores_prefer_target_vocabulary(spark):
    """The semantic claim, proven where it is testable: on a corpus whose
    target and background domains use (mostly) disjoint vocabularies, the
    mean importance ratio must rank every in-domain doc above every
    out-of-domain doc, with a mixed doc strictly between."""
    from create_proposals_using_vector_db_public_spark.operators.selection import (
        dsir_scores,
    )

    docs = spark.createDataFrame(
        [
            (0, "physics quantum energy field physics", "target"),
            (1, "quantum field theory energy quantum", "target"),
            (2, "recipe butter flour sugar oven", "bg"),
            (3, "butter oven recipe sugar flour bake", "bg"),
            (4, "soccer goal match team player", "bg"),
            (5, "physics energy butter sugar", "mixed"),
        ],
        ["doc_id", "text", "domain"],
    )
    scores = {
        r.doc_id: r.dsir_score
        for r in dsir_scores(docs, F.col("domain") == "target").collect()
    }
    target, mixed, bg = (
        min(scores[0], scores[1]),
        scores[5],
        max(scores[2], scores[3], scores[4]),
    )
    assert target > mixed > bg


def test_negative_sample_contract(spark):
    rows = QUERIES["q_negative_sample"](spark, SF).collect()
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    # K rows per anchor, never the anchor itself, ids in range
    assert len(rows) == 4 * n
    assert all(r.neg_id != r.doc_id for r in rows)
    assert all(0 <= r.neg_id < n for r in rows)
    from collections import Counter

    per_anchor = Counter(r.doc_id for r in rows)
    assert set(per_anchor.values()) == {4}
    # negatives are spread, not collapsed onto a few ids: at least half
    # the id space is used as a negative somewhere
    assert len({r.neg_id for r in rows}) > n // 2


def test_temperature_sample_contract(spark):
    """alpha=0.5 temperature resampling invariants: the rarest language
    keeps rate 1e6 (every doc survives the hash threshold), rates fall
    monotonically with language size (rate = sqrt(n_min/n_lang)), and no
    language keeps more docs than it has."""
    from create_proposals_using_vector_db_public_spark.plans import QUERIES

    rows = {
        r.lang: r
        for r in QUERIES["q_temperature_sample"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows
    n_min = min(r.n_docs for r in rows.values())
    for r in rows.values():
        assert 0 <= r.n_kept <= r.n_docs
        if r.n_docs == n_min:
            assert r.rate6 == 1_000_000 and r.n_kept == r.n_docs
    by_size = sorted(rows.values(), key=lambda r: r.n_docs)
    for a, b in zip(by_size, by_size[1:]):
        assert a.rate6 >= b.rate6  # bigger language, smaller keep rate
