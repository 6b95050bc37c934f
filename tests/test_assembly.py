"""Corpus-assembly invariants: decontamination recall on planted leaks,
packing arithmetic consistency, Bloom filter no-false-negative guarantee.
(Value-level parity vs DuckDB is covered by tools/parity.py; these pin
the semantic contracts that must hold at ANY scale.)"""

import os

import pytest

from create_proposals_using_vector_db_public_spark.plans import QUERIES
from create_proposals_using_vector_db_public_spark.plans.plant import PLANT_DECON_OFFSET

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
        leak = PLANT_DECON_OFFSET + b
        assert (leak, b) in pairs, f"planted leak {leak} missed"
        assert pairs[(leak, b)] >= 1


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


def test_bpe_merge_device_handles_adjacent_repeats(spark):
    """The doubled-delimiter encoding ('|a||b||</w>|') must make a single
    replace() equal Sennrich greedy left-to-right merge application —
    including immediately adjacent occurrences, where a single-delimiter
    encoding skips every second match (ADVICE r2: 'abab' -> [ab,a,b])."""
    from pyspark.sql import functions as F

    cases = [
        # (word, merge_a, merge_b, expected symbols incl </w>)
        ("abab", "a", "b", 3),    # [ab, ab, </w>]
        ("bbbb", "b", "b", 3),    # [bb, bb, </w>]
        ("bbbbb", "b", "b", 4),   # [bb, bb, b, </w>] greedy left-to-right
        ("aaa", "a", "a", 3),     # [aa, a, </w>]
        ("abc", "a", "b", 3),     # [ab, c, </w>]
        ("xbab", "a", "b", 4),    # [x, b, ab, </w>] no false overlap
    ]
    df = spark.createDataFrame(cases, "wd string, a string, b string, want int")
    enc = df.withColumn(
        "s0",
        F.concat(F.regexp_replace("wd", "(.)", "|$1|"), F.lit("|</w>|")),
    ).withColumn(
        "s1",
        F.replace(
            F.col("s0"),
            F.concat(F.lit("|"), F.col("a"), F.lit("||"), F.col("b"), F.lit("|")),
            F.concat(F.lit("|"), F.col("a"), F.col("b"), F.lit("|")),
        ),
    ).withColumn(
        "got",
        F.shiftright(
            (
                F.length("s1")
                - F.length(F.replace(F.col("s1"), F.lit("|"), F.lit("")))
            ).cast("long"),
            1,
        ),
    )
    for r in enc.collect():
        assert r.got == r.want, f"{r.wd}: {r.s1} -> {r.got}, want {r.want}"


def test_format_roundtrip_xml_precondition_fires(spark, tmp_path):
    """q_format_roundtrip must fail loudly (not silently diverge) on a
    corpus containing a document XML 1.0 cannot represent — empty string
    (reads back as null from an empty element) or control characters."""
    for bad_text in ("", "has\x0bvertical tab"):
        d = spark.createDataFrame(
            [(1, "fine doc", "en", "s", 8), (2, bad_text, "en", "s", len(bad_text))],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )
        sf_dir = str(tmp_path / f"sf_{len(bad_text)}")
        d.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
        with pytest.raises(ValueError, match="XML 1.0 cannot represent"):
            QUERIES["q_format_roundtrip"](spark, sf_dir).collect()
