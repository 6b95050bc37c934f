"""Corpus-assembly invariants: decontamination recall on planted leaks,
packing arithmetic consistency, Bloom filter no-false-negative guarantee.
(Value-level parity vs DuckDB is covered by tools/parity.py; these pin
the semantic contracts that must hold at ANY scale.)"""

import os

import pytest

from create_proposals_using_vector_db_public_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata absent"
)


def test_decontaminate_flags_every_planted_leak(spark):
    from create_proposals_using_vector_db_public_spark.sources import load_table

    bench_ids = {
        r.doc_id
        for r in load_table(spark, SF, "documents")
        .filter("doc_id % 23 = 0")
        .select("doc_id")
        .collect()
    }
    assert bench_ids, "fixture must contain eval-set docs"
    pairs = {
        (r.train_id, r.bench_id): r.n_shared
        for r in QUERIES["q_decontaminate"](spark, SF).collect()
    }
    # Every planted contaminated doc (eval text behind a novel prefix) must
    # be flagged against exactly its source benchmark doc — the recall
    # contract; a decontamination pass with misses is worse than none.
    for b in bench_ids:
        assert (500000 + b, b) in pairs, f"planted leak {500000 + b} missed"
        assert pairs[(500000 + b, b)] >= 1


def test_pack_sequences_window_arithmetic(spark):
    rows = QUERIES["q_pack_sequences"](spark, SF).collect()
    assert rows
    for r in rows:
        # windows * budget + tail reassembles the stream exactly
        assert r.n_windows * 256 + r.tail_tokens == r.total_tokens
        assert 0 <= r.tail_tokens < 256
        assert 0 <= r.n_straddlers <= r.n_docs


def test_bloom_join_never_drops_a_true_match(spark):
    row = QUERIES["q_bloom_join"](spark, SF).collect()[0]
    # Bloom filters admit false positives, never false negatives: every
    # true semi-join match must survive the bitmap pre-filter.
    assert row.n_true_matches > 0
    assert row.n_candidates >= row.n_true_matches
    assert (
        row.n_false_positives == row.n_candidates - row.n_true_matches
    )
    assert row.n_candidates <= row.n_orders
