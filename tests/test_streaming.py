"""Structured Streaming semantics: one-shot folder scan (AvailableNow),
watermark dedup, incremental file pickup across runs."""

import os
import shutil

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from create_proposals_using_vector_db_public_spark import streaming as S

SCHEMA = StructType(
    [
        StructField("file_name", StringType()),
        StructField("text", StringType()),
        StructField("ts", TimestampType()),
    ]
)


@pytest.fixture()
def watch_dir(spark, tmp_path):
    d = str(tmp_path / "watched")
    os.makedirs(d)
    return d


def _write_file(spark, d, name, rows):
    df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
    df.write.mode("append").parquet(f"{d}/{name}")


def test_available_now_chunking_pipeline(spark, watch_dir):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    _write_file(
        spark,
        watch_dir,
        "batch1",
        [("f1.docx", "hello\n\nworld", t0), ("f2.docx", "solo", t0)],
    )
    stream = S.stream_parquet(spark, f"{watch_dir}/batch1", SCHEMA)
    chunks = S.stream_chunks(stream, text_col="text")
    out = S.available_now_to_memory(chunks, output_mode="append")
    rows = {(r["file_name"], r["paragraph_idx"]): r["paragraph"] for r in out.collect()}
    assert rows == {
        ("f1.docx", 0): "hello",
        ("f1.docx", 2): "world",
        ("f2.docx", 0): "solo",
    }


def test_watermark_dedup_drops_duplicate_keys(spark, watch_dir):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    _write_file(
        spark,
        watch_dir,
        "b",
        [
            ("f1", "a", t0),
            ("f1", "a", t0 + dt.timedelta(minutes=1)),  # dup key within watermark
            ("f2", "b", t0),
        ],
    )
    stream = S.stream_parquet(spark, f"{watch_dir}/b", SCHEMA)
    deduped = S.watermark_dedup(stream, ["file_name"], "ts", delay="1 hour")
    out = S.available_now_to_memory(deduped, output_mode="append")
    assert sorted(r["file_name"] for r in out.collect()) == ["f1", "f2"]


def test_incremental_pickup_across_runs(spark, watch_dir, tmp_path):
    """The reference's re-scan semantics (app_callapi.py:165-174): a second
    AvailableNow run from the SAME checkpoint processes only files that
    arrived after the first run — no reprocessing, no loss."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_file(spark, watch_dir, "a.parquet", [("f1.docx", "one", t0)])
    stream = S.stream_parquet(spark, f"{watch_dir}/*.parquet", SCHEMA)
    S.available_now_to_parquet(stream, out, ckpt)
    batch1 = spark.read.parquet(out).collect()
    assert sorted(r["file_name"] for r in batch1) == ["f1.docx"]

    # a new file arrives between runs; f1 must NOT be reprocessed
    _write_file(
        spark,
        watch_dir,
        "b.parquet",
        [("f2.docx", "two", t0), ("f3.docx", "three", t0)],
    )
    stream2 = S.stream_parquet(spark, f"{watch_dir}/*.parquet", SCHEMA)
    S.available_now_to_parquet(stream2, out, ckpt)
    batch2 = spark.read.parquet(out).collect()
    assert sorted(r["file_name"] for r in batch2) == [
        "f1.docx",
        "f2.docx",
        "f3.docx",
    ]  # exactly-once: one row per file across both runs


def test_windowed_event_counts(spark, watch_dir):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 30, 0)
    rows = [
        ("e", "x", t0),
        ("e", "x", t0 + dt.timedelta(minutes=10)),
        ("e", "x", t0 + dt.timedelta(hours=7)),
    ]
    df = spark.createDataFrame(rows, SCHEMA).withColumn("value", F.lit(1.0)).withColumn(
        "event_type", F.col("file_name")
    )
    d = f"{watch_dir}/events"
    df.coalesce(1).write.parquet(d)
    stream = (
        spark.readStream.format("parquet").schema(df.schema).load(d)
    )
    win = S.windowed_event_counts(stream, ts_col="ts", window="6 hours")
    out = S.available_now_to_memory(win, output_mode="complete")
    counts = sorted(r["cnt"] for r in out.collect())
    assert counts == [1, 2]  # two tumbling windows: 2 early + 1 late event


def test_stateful_counts_survive_across_runs(spark, watch_dir, tmp_path):
    """applyInPandasWithState: per-key totals live in the checkpointed
    state store, so a second AvailableNow run CONTINUES the counts instead
    of restarting them (the reference's dict-in-driver state, made durable)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_file(
        spark,
        watch_dir,
        "a.parquet",
        [("a", "x", t0), ("a", "y", t0), ("a", "z", t0), ("b", "w", t0)],
    )
    stream = S.stream_parquet(spark, f"{watch_dir}/*.parquet", SCHEMA)
    counts = S.running_counts_stateful(stream, key_col="file_name", ts_col="ts")
    S.run_update_to_parquet(counts, out, ckpt)
    r1 = {r["file_name"]: r["n_events"] for r in spark.read.parquet(out).collect()}
    assert r1 == {"a": 3, "b": 1}

    t1 = t0 + dt.timedelta(hours=1)
    _write_file(spark, watch_dir, "b.parquet", [("a", "q", t1), ("a", "r", t1)])
    stream2 = S.stream_parquet(spark, f"{watch_dir}/*.parquet", SCHEMA)
    counts2 = S.running_counts_stateful(stream2, key_col="file_name", ts_col="ts")
    S.run_update_to_parquet(counts2, out, ckpt)
    rows = spark.read.parquet(out).collect()
    # batch 2 emitted only key 'a', with the CUMULATIVE total 3+2=5
    assert max(r["n_events"] for r in rows if r["file_name"] == "a") == 5
    assert max(r["n_events"] for r in rows if r["file_name"] == "b") == 1


def test_watermark_drops_late_event_across_runs(spark, watch_dir, tmp_path):
    """Append-mode windowed agg with a 10-minute watermark, driven by two
    AvailableNow runs off one checkpoint: run 1 ingests on-time events and
    advances the watermark past the first window's end; run 2 ingests one
    LATE event inside that closed window plus one fresh event. The closed
    window must finalize WITHOUT the late row — bounded state + late-data
    drop, the semantics that let event-time aggs run forever at scale."""
    import datetime as dt

    d = f"{watch_dir}/events"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def run_once():
        stream = S.stream_parquet(
            spark, f"{d}/*.parquet", SCHEMA
        ).withColumn("value", F.lit(1.0)).withColumn(
            "event_type", F.lit("e")
        )
        win = S.windowed_event_counts(
            stream, ts_col="ts", window="30 minutes", watermark="10 minutes"
        )
        flat = win.select(
            F.col("win.start").alias("w_start"), "event_type", "cnt"
        )
        S.available_now_to_parquet(flat, out, ckpt)

    # run 1: two events in [12:00,12:30) + one at 13:00 (watermark -> 12:50)
    _write_file(spark, d, "a.parquet", [
        ("a", "x", t0),
        ("a", "x", t0 + dt.timedelta(minutes=5)),
        ("a", "x", t0 + dt.timedelta(hours=1)),
    ])
    run_once()
    # run 2: a LATE event at 12:10 (before the 12:50 watermark — must be
    # dropped) and a fresh on-time event at 13:05
    _write_file(spark, d, "b.parquet", [
        ("b", "late", t0 + dt.timedelta(minutes=10)),
        ("b", "x", t0 + dt.timedelta(hours=1, minutes=5)),
    ])
    run_once()

    got = {
        r.w_start: r.cnt for r in spark.read.parquet(out).collect()
    }
    # the [12:00,12:30) window finalized with ONLY the 2 on-time events;
    # the late 12:10 row did not resurrect or inflate it
    assert got.get(t0) == 2, got


def test_stream_upsert_versioned_across_runs(spark, watch_dir, tmp_path):
    """Streaming R12: two AvailableNow runs from one checkpoint against a
    versioned parquet store. Run 2 carries a CHANGED file — its old rows
    must be fully replaced (delete-then-insert, app_callapi.py:140-142)
    while untouched files survive, and every committed version stays a
    readable immutable snapshot."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    _write_file(
        spark,
        watch_dir,
        "batch1.parquet",
        [("a.docx", "a v1 p0", t0), ("a.docx", "a v1 p1", t0),
         ("b.docx", "b v1 p0", t0)],
    )
    stream = S.stream_parquet(spark, f"{watch_dir}/*.parquet", SCHEMA)
    S.stream_upsert_to_versioned(stream, table, ckpt)
    v0 = S.read_versioned(spark, table)
    assert v0.count() == 3

    # a.docx re-arrives changed (one paragraph now); b.docx untouched
    _write_file(
        spark, watch_dir, "batch2.parquet", [("a.docx", "a v2 p0", t0)]
    )
    stream2 = S.stream_parquet(spark, f"{watch_dir}/*.parquet", SCHEMA)
    S.stream_upsert_to_versioned(stream2, table, ckpt)

    cur = S.read_versioned(spark, table)
    rows = sorted((r["file_name"], r["text"]) for r in cur.collect())
    assert rows == [
        ("a.docx", "a v2 p0"),  # old a-rows gone, replaced wholesale
        ("b.docx", "b v1 p0"),  # untouched file survives
    ]
    # both snapshots committed and independently readable (time travel)
    import os

    assert os.path.exists(f"{table}/v0") and os.path.exists(f"{table}/v1")
    assert spark.read.parquet(f"{table}/v0").count() == 3


def test_stream_upsert_retention_prunes_old_versions(spark, watch_dir, tmp_path):
    """keep_versions bounds the store: only the newest N snapshot dirs
    survive a commit."""
    import datetime as dt
    import os

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    _write_file(spark, watch_dir, "b1.parquet", [("a.docx", "v1", t0)])
    stream = S.stream_parquet(spark, f"{watch_dir}/*.parquet", SCHEMA)
    S.stream_upsert_to_versioned(stream, table, ckpt, keep_versions=1)
    _write_file(spark, watch_dir, "b2.parquet", [("a.docx", "v2", t0)])
    stream2 = S.stream_parquet(spark, f"{watch_dir}/*.parquet", SCHEMA)
    S.stream_upsert_to_versioned(stream2, table, ckpt, keep_versions=1)

    assert not os.path.isdir(f"{table}/v0")  # pruned
    cur = S.read_versioned(spark, table)
    assert [r["text"] for r in cur.collect()] == ["v2"]


def test_commit_version_and_as_of_read(spark, tmp_path):
    """Batch commit path + time travel: commit_version returns 0,1,2;
    read_versioned_as_of(v) reproduces each committed snapshot exactly;
    a never-written version fails loudly."""
    import pytest

    table = str(tmp_path / "table")
    d1 = spark.createDataFrame(
        [("a.docx", "a v1"), ("b.docx", "b v1")], "file_name string, text string"
    )
    d2 = spark.createDataFrame([("a.docx", "a v2")], "file_name string, text string")
    assert S.commit_version(d1, table) == 0
    assert S.commit_version(d2, table) == 1

    v0 = sorted((r.file_name, r.text) for r in S.read_versioned_as_of(spark, table, 0).collect())
    v1 = sorted((r.file_name, r.text) for r in S.read_versioned_as_of(spark, table, 1).collect())
    assert v0 == [("a.docx", "a v1"), ("b.docx", "b v1")]
    assert v1 == [("a.docx", "a v2"), ("b.docx", "b v1")]
    with pytest.raises(ValueError, match="version 7 not available"):
        S.read_versioned_as_of(spark, table, 7)


def test_as_of_read_refuses_vacuumed_version(spark, tmp_path):
    """Retention + time travel: a version pruned by keep_versions must
    raise on as-of read (CURRENT fallback would be a correctness bug)."""
    import pytest

    table = str(tmp_path / "table")
    d1 = spark.createDataFrame([("a.docx", "v1")], "file_name string, text string")
    d2 = spark.createDataFrame([("a.docx", "v2")], "file_name string, text string")
    S.commit_version(d1, table, keep_versions=1)
    S.commit_version(d2, table, keep_versions=1)
    with pytest.raises(ValueError, match="version 0 not available"):
        S.read_versioned_as_of(spark, table, 0)
    assert [r.text for r in S.read_versioned_as_of(spark, table, 1).collect()] == ["v2"]


def test_commit_version_rejects_keep_versions_zero(spark, tmp_path):
    """keep_versions=0 on the shared commit path would delete the
    snapshot just committed — must be rejected at the public API, not
    only in the streaming wrapper."""
    import pytest

    d = spark.createDataFrame([("a.docx", "v1")], "file_name string, text string")
    with pytest.raises(ValueError, match="keep_versions must be >= 1"):
        S.commit_version(d, str(tmp_path / "t"), keep_versions=0)


def test_versioned_store_random_commit_sequences(spark, tmp_path):
    """Commit-protocol property: for a random sequence of upsert batches,
    every retained version read back AS OF equals a Python dict replay of
    delete-then-insert semantics (all rows of a re-arriving file replaced
    wholesale, untouched files preserved), and CURRENT always equals the
    last committed version. Deterministic seed — hypothesis would rebuild
    a SparkSession-heavy store per example; a seeded sweep of 3 sequences
    covers overlap/disjoint/repeat patterns at trivial cost."""
    import random

    rnd = random.Random(42)
    files = [f"f{i}.docx" for i in range(5)]
    for seq in range(3):
        table = str(tmp_path / f"store_{seq}")
        replay: dict[str, list[tuple[str, int]]] = {}
        snapshots = []
        for commit in range(4):
            chosen = rnd.sample(files, rnd.randint(1, 3))
            rows = [
                (f, rnd.randint(0, 9) + 10 * commit)
                for f in chosen
                for _ in range(rnd.randint(1, 2))
            ]
            batch = spark.createDataFrame(
                rows, "file_name string, paragraph_idx long"
            )
            v = S.commit_version(batch, table)
            assert v == commit
            # python replay: delete-then-insert per arriving file
            for f in chosen:
                replay[f] = []
            for f, p in rows:
                replay[f].append((f, p))
            snapshots.append(sorted(r for rs in replay.values() for r in rs))
        for v, want in enumerate(snapshots):
            got = sorted(
                (r.file_name, r.paragraph_idx)
                for r in S.read_versioned_as_of(spark, table, v).collect()
            )
            assert got == want, f"seq {seq} version {v}"
        cur = sorted(
            (r.file_name, r.paragraph_idx)
            for r in S.read_versioned(spark, table).collect()
        )
        assert cur == snapshots[-1]


def test_events_stream_accepts_relative_sf_dir(spark):
    """The events file-stream stages a symlink in /tmp; a RELATIVE sf_dir
    must be absolutized before it becomes the link target, or the link is
    broken (resolves against /tmp, not the driver cwd) and every
    streaming query silently drains 0 rows. Caught at sf1: parity with
    `.localdata/sf1` returned spark=0 for all 7 streaming queries while
    the same data via an absolute path passed."""
    sf_abs = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_abs):
        pytest.skip("driver testdata absent")
    from create_proposals_using_vector_db_public_spark.plans import QUERIES

    # relative to the session cwd (Spark's JVM resolves batch reads there,
    # so those worked all along; only the /tmp symlink target broke)
    rel = os.path.relpath(sf_abs, os.getcwd())
    assert not os.path.isabs(rel)
    n = QUERIES["q_stream_dedup"](spark, rel).count()
    assert n > 0
