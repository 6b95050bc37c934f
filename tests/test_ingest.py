"""Ingestion operators vs the reference's observed behavior
(R1/R2/R5/R6/R8-R13)."""

from pyspark.sql import functions as F

from create_proposals_using_vector_db_public_spark.operators import ingest as I


def test_filter_ingestible_skips_locks_and_extensions(spark):
    df = spark.createDataFrame(
        [("a.pdf",), ("b.docx",), ("~$b.docx",), ("c.txt",), ("~$a.pdf",)],
        "file_name: string",
    )
    kept = [r["file_name"] for r in I.filter_ingestible(df).collect()]
    # app.py:121 extension filter + app.py:35-36 lock-file skip
    assert sorted(kept) == ["a.pdf", "b.docx"]


def test_split_paragraphs_trim_dropempty_index(spark):
    df = spark.createDataFrame(
        [("f1", "  hello \n\n world \n"), ("f2", "")],
        "file_name: string, text: string",
    )
    rows = I.split_paragraphs(df).collect()
    got = {(r["file_name"], r["paragraph_idx"]): r["paragraph"] for r in rows}
    # app.py:24,33: strip + drop empty; position BEFORE dropping (posexplode)
    assert got == {("f1", 0): "hello", ("f1", 2): "world"}


def test_skip_unchanged(spark):
    scanned = spark.createDataFrame(
        [("a", "h1"), ("b", "h2_new"), ("c", "h3")],
        "file_name: string, file_sha256: string",
    )
    state = spark.createDataFrame(
        [("a", "h1"), ("b", "h2_old")],
        "file_name: string, file_sha256: string",
    )
    kept = sorted(
        r["file_name"] for r in I.skip_unchanged(scanned, state).collect()
    )
    # unchanged 'a' skipped; changed 'b' and new 'c' survive (app_callapi:139)
    assert kept == ["b", "c"]


def test_skip_existing_chunks(spark):
    new = spark.createDataFrame(
        [("f", 0, "x"), ("f", 1, "y")],
        "file_name: string, paragraph_idx: int, text: string",
    )
    existing = spark.createDataFrame(
        [("f", 0, "x_old")],
        "file_name: string, paragraph_idx: int, text: string",
    )
    kept = I.skip_existing_chunks(new, existing).collect()
    assert len(kept) == 1 and kept[0]["paragraph_idx"] == 1  # app.py:98-99


def test_upsert_delete_then_insert(spark):
    existing = spark.createDataFrame(
        [("f1", 0, "old0"), ("f1", 1, "old1"), ("f2", 0, "keep")],
        "file_name: string, paragraph_idx: int, text: string",
    )
    incoming = spark.createDataFrame(
        [("f1", 0, "new0")],
        "file_name: string, paragraph_idx: int, text: string",
    )
    out = I.upsert_files(existing, incoming).collect()
    texts = sorted(r["text"] for r in out)
    # ALL old f1 rows dropped, replaced wholesale (app_callapi.py:140-142)
    assert texts == ["keep", "new0"]


def test_delete_files(spark):
    df = spark.createDataFrame(
        [("f1", 1), ("f2", 2), ("f3", 3)], "file_name: string, v: int"
    )
    kept = sorted(
        r["file_name"] for r in I.delete_files(df, ["f2"]).collect()
    )
    assert kept == ["f1", "f3"]


def test_zero_vector_for_empty_text(spark):
    df = spark.createDataFrame(
        [("", [9.0, 9.0]), ("hi", [1.0, 2.0]), (None, [5.0, 5.0])],
        "paragraph: string, embedding: array<float>",
    )
    rows = I.zero_vector_for_empty(df, dim=2).collect()
    by_text = {r["paragraph"]: r["embedding"] for r in rows}
    assert by_text[""] == [0.0, 0.0]        # app_callapi.py:112
    assert by_text[None] == [0.0, 0.0]
    assert by_text["hi"] == [1.0, 2.0]
