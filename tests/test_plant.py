"""The planted-corpus offset guard (plans/plant.py).

The offsets exist because an id collision between a planted copy and a
real document silently merges the two inside grouped-by-id signature
aggregates (the sf10 scale proof caught q_dedup_minhash diverging that
way with the old 1e5 offsets at 500k docs). These tests pin the guard's
loud-fail behavior so the failure mode can never go silent again.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from create_proposals_using_vector_db_public_spark.plans.plant import (
    PLANT_COPY_OFFSET,
    PLANT_NEAR_OFFSET,
    assert_plantable,
)


def _write_docs(tmp_path, max_id, stats=True):
    t = pa.table({
        "doc_id": pa.array([0, 1, max_id], pa.int64()),
        "text": ["a", "b", "c"],
    })
    pq.write_table(t, tmp_path / "documents.parquet", write_statistics=stats)


def test_ok_below_offset(tmp_path):
    _write_docs(tmp_path, PLANT_COPY_OFFSET - 1)
    assert_plantable(str(tmp_path))  # no raise


def test_raises_on_collision(tmp_path):
    _write_docs(tmp_path, PLANT_COPY_OFFSET)
    with pytest.raises(ValueError, match="offset collision"):
        assert_plantable(str(tmp_path))


def test_raises_without_footer_stats(tmp_path):
    # writers that omit stats fall back to scanning the id column
    _write_docs(tmp_path, PLANT_COPY_OFFSET + 7, stats=False)
    with pytest.raises(ValueError, match="offset collision"):
        assert_plantable(str(tmp_path))


def test_fixtures_are_plantable():
    # the driver's own fixture tables must clear the guard
    assert_plantable("/root/testdata/sf0.01")
    assert_plantable("/root/testdata/sf0.01", table="embeddings", col="vec_id")


def test_offsets_are_distinct_and_int64_exact():
    assert PLANT_NEAR_OFFSET != PLANT_COPY_OFFSET
    # offsets stay exact even through a double cast (< 2^53) — the float
    # parity rule the whole oracle suite relies on
    assert float(2 * PLANT_NEAR_OFFSET) == 2 * PLANT_NEAR_OFFSET < 2**53
