"""ML-UDF and multimodal plumbing (stubbed decode, real Arrow paths)."""

import math

from pyspark.sql import functions as F

from create_proposals_using_vector_db_public_spark.operators import ml
from create_proposals_using_vector_db_public_spark.operators import multimodal as MM


def test_embedder_udf_shape_and_zero_vector(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "")],
                               "doc_id: long, text: string")
    out = {r["doc_id"]: r["embedding"]
           for r in ml.with_embeddings(df, dim=32).collect()}
    assert len(out[1]) == 32
    assert math.isclose(sum(x * x for x in out[1]), 1.0, rel_tol=1e-4)
    assert out[2] == [0.0] * 32  # R8: empty text -> zero vector


def test_embedder_deterministic(spark):
    df = spark.createDataFrame([(1, "same text")], "doc_id: long, text: string")
    a = ml.with_embeddings(df, dim=16).head()["embedding"]
    b = ml.with_embeddings(df, dim=16).head()["embedding"]
    assert a == b


def test_keyword_udf_fallback(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine")],
        "doc_id: long, text: string",
    )
    kws = df.select(ml.keyword_udf(8)(F.col("text")).alias("k")).head()["k"]
    assert kws == ["one", "two", "three", "four", "five", "six", "seven", "eight"]


def test_prompt_roundtrip_and_sections():
    p = ml.build_prompt(["ai", "automation"], "quick note")
    assert "ai, automation" in p and "[MERMAID]" in p
    plan, mermaid = ml.split_sections("[PLAN] do things [MERMAID] graph TD;")
    assert plan == "do things" and mermaid == "graph TD;"
    # tolerate missing delimiter (reference would crash: app_callapi.py:246)
    plan2, mermaid2 = ml.split_sections("no sections here")
    assert mermaid2 == ""


def test_generation_requires_key(monkeypatch):
    import pytest

    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    with pytest.raises(RuntimeError, match="OPENAI_API_KEY"):
        ml.generate_proposal("hi")


def test_export_docx_bytes():
    data = ml.export_docx("line1\nline2")
    assert isinstance(data, bytes) and len(data) > 0


def test_blob_table_and_features(spark):
    df = spark.createDataFrame(
        [(0, "abc"), (1, "defg"), (2, "")], "doc_id: long, text: string"
    )
    blobs = MM.make_blob_table(df)
    rows = {r["blob_id"]: r for r in blobs.collect()}
    assert rows[0]["media_type"] == "image" and rows[2]["media_type"] == "video"
    assert bytes(rows[1]["content"]) == b"defg"

    feats = {r["blob_id"]: r for r in MM.extract_features(blobs).collect()}
    assert feats[0]["width"] == 1 + 3 % 640
    assert feats[0]["height"] == 1 + ord("a") % 480
    assert math.isclose(sum(feats[1]["histogram"]), 1.0, rel_tol=1e-9)
    assert feats[2]["width"] == 0 and sum(feats[2]["histogram"]) == 0.0


def test_frame_sample(spark):
    df = spark.createDataFrame([(2, "0123456789ab")], "doc_id: long, text: string")
    frames = MM.frame_sample(MM.make_blob_table(df), n_frames=4).collect()
    assert len(frames) == 4
    assert [f["offset"] for f in sorted(frames, key=lambda r: r["frame_idx"])] == [
        0, 3, 6, 9,
    ]


def test_rows_only_invariant_columns_all_true(spark):
    """The 4 rows-only registry queries now emit self-asserting invariant
    columns (VERDICT r2 item 2): every boolean must be True on the
    fixture, and running the query at all proves no invariant raised."""
    import os

    import pytest

    SF = "/root/testdata/sf0.001"
    if not os.path.isdir(SF):
        pytest.skip("driver testdata absent")
    from create_proposals_using_vector_db_public_spark.plans import QUERIES

    expected = {
        "q_udf_embed": ["dim_ok", "zero_iff_empty", "norm_ok"],
        "q_udf_embed_knn": [
            "rank_ok", "dist_monotone_ok", "self_match_ok", "cosine_ok",
        ],
        "q_udf_keywords": ["kw_count_ok", "kw_nonempty_ok", "kw_blank_ok"],
        "q_multimodal_features": ["media_ok", "dims_ok", "hist_ok"],
    }
    for name, cols in expected.items():
        df = QUERIES[name](spark, SF)
        rows = df.collect()
        assert rows, f"{name} returned no rows"
        for c in cols:
            assert all(getattr(r, c) is True for r in rows), f"{name}.{c}"


def test_checked_invariant_column_raises_on_violation(spark):
    """_checked must FAIL the query on a violated invariant, not emit
    False — the property that upgrades rows-only checks from 'returns
    rows' to 'returns verified rows'."""
    import pytest

    from create_proposals_using_vector_db_public_spark.plans.udf_queries import _checked

    df = spark.range(3).select(
        _checked(F.col("id") < 2, "id must stay below 2").alias("ok")
    )
    with pytest.raises(Exception, match="invariant violated"):
        df.collect()
