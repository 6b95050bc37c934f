"""Planted-duplicate fixture constants shared by the dedup / curation /
assembly query families.

Every dedup-family query runs over a *planted corpus*: a fixture table
unioned with deterministic copies whose ids are ``real_id + offset``. The
offset MUST exceed every real id in the table — a collision silently
merges a planted copy with an unrelated real document inside any
grouped-by-id stage (the MinHash / SimHash signature aggregates group by
doc_id), while the per-row DuckDB oracles keep the two rows separate.
That is exactly the scale-only divergence the round-4 sf10 proof caught:
500k docs overflowed the old ``100_000`` offset (q_dedup_minhash
spark=9592 vs duck=24958) while every driver SF (<= 5k docs) stayed
green, as did sf1 (50k docs).

``10**12`` gives headroom for a trillion-document corpus — far past 100
TB of text — while staying in exact int64/BIGINT range in both engines
(and exact even through a double cast: < 2^53). ``assert_plantable``
backstops the constant: it reads the parquet footer max statistic for
the id column (driver-side metadata only, no Spark job, microseconds)
and fails loudly at plan-build time if a future fixture ever outgrows
the offset, instead of silently producing merged signatures again.
"""

from __future__ import annotations

import pathlib

import pyarrow.parquet as pq

PLANT_COPY_OFFSET = 10**12  # exact copies       (id + 1e12)
PLANT_NEAR_OFFSET = 2 * 10**12  # near copies   (id + 2e12, tail appended)
PLANT_PII_OFFSET = 3 * 10**12  # PII-tailed variants (id + 3e12)
PLANT_DECON_OFFSET = 4 * 10**12  # planted benchmark-contaminated rows (id + 4e12)


def _footer_max(path: pathlib.Path, col: str) -> int | None:
    md = pq.ParquetFile(path).metadata
    mx: int | None = None
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            c = row_group.column(ci)
            if c.path_in_schema != col:
                continue
            st = c.statistics
            if st is None or not st.has_min_max:
                return None  # stats absent -> caller falls back to a scan
            mx = st.max if mx is None else max(mx, st.max)
    return mx


def assert_plantable(sf_dir: str, table: str = "documents", col: str = "doc_id") -> None:
    """Raise if ``max(col)`` in the fixture table reaches PLANT_COPY_OFFSET.

    Footer-statistics first (no data read); falls back to reading just the
    id column when a writer omitted stats. Called once per planted-corpus
    plan build.
    """
    p = pathlib.Path(sf_dir) / f"{table}.parquet"
    files = sorted(p.rglob("*.parquet")) if p.is_dir() else [p]
    mx: int | None = None
    for f in files:
        m = _footer_max(f, col)
        if m is None:  # pragma: no cover - stats are present for all fixtures
            import pyarrow.compute as pc

            m = pc.max(pq.read_table(f, columns=[col])[col]).as_py()
        mx = m if mx is None else max(mx, m)
    if mx is not None and mx >= PLANT_COPY_OFFSET:
        raise ValueError(
            f"planted-corpus offset collision: max({table}.{col}) = {mx} "
            f">= PLANT_COPY_OFFSET = {PLANT_COPY_OFFSET}; raise the offsets "
            "in plans/plant.py (engine and oracle move together)"
        )
