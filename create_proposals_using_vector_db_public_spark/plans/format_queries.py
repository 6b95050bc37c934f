"""Multi-format source/sink coverage: CSV, JSON-lines, and ORC.

The reference's only persistence is pickle + a FAISS file
(app.py:161-168); the Spark engine's native sinks are columnar files.
q_sink_roundtrip / q_partitioned_sink already prove parquet (the
primary format); this module proves the interchange formats a real
lake ingests from — CSV and JSONL — plus ORC as the second columnar
format, each through a full write → read-with-explicit-schema → verify
cycle.

The verification aggregate is order-independent and exact: row count,
BIGINT sum of a numeric column, and a sum of md5-derived int64s over
the text column (functions.hashing.h64 — portable to DuckDB), so any
row lost, duplicated, or corrupted by quoting/escaping changes the
value hash.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..sources import load_table
from .registry import query

_FORMATS = ("csv", "json", "orc")

_FORMAT_ORACLE = f"""
WITH stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         CAST(sum({H.d_h64("text", nchars=12)}) AS BIGINT) AS content_sum
  FROM documents
)
SELECT fmt, n_rows, sum_chars, content_sum
FROM stats, (VALUES ('csv'), ('json'), ('orc')) AS f(fmt)
"""


@query("q_format_roundtrip", oracle=_FORMAT_ORACLE)
def q_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write documents to CSV (quoted/escaped), JSON-lines, and ORC;
    read each back with an explicit schema (never inference — at 100 TB
    schema inference is a full extra scan); prove byte-level fidelity
    per format with exact order-independent aggregates.

    Scale notes: CSV/JSON are row formats with no column pruning or
    predicate pushdown — the plan shows ReadSchema covering all read
    columns either way — which is exactly why the pipeline lands them
    into parquet once and never re-reads the originals; ORC keeps
    columnar pruning. Writes shard per-partition (no single-writer
    bottleneck); the explicit-schema read parallelizes by file split."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_fmt_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    schema = "doc_id bigint, text string, lang string, n_chars bigint"
    outs = []
    for fmt in _FORMATS:
        path = os.path.join(base, fmt)
        shutil.rmtree(path, ignore_errors=True)
        w = d.write.mode("overwrite").format(fmt)
        if fmt == "csv":
            w = w.option("header", "true")
        w.save(path)
        r = spark.read.format(fmt)
        if fmt == "csv":
            r = r.option("header", "true")
        back = r.schema(schema).load(path)
        outs.append(
            back.agg(
                F.count("*").alias("n_rows"),
                F.sum("n_chars").alias("sum_chars"),
                # 48-bit per-row hashes: the BIGINT sum stays exact (no
                # overflow) up to ~30k-row tables x 2^48
                F.sum(H.h64("text", nchars=12)).alias("content_sum"),
            ).select(F.lit(fmt).alias("fmt"), "*")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# --- schema evolution (mergeSchema read) -------------------------------------
#
# The lakehouse reality: files written before a column existed live next
# to files written after. A v1 partition (doc_id, lang) and a v2
# partition (doc_id, lang, n_chars) must read as ONE table with the new
# column null for old files — Spark's mergeSchema. The oracle replays the
# evolution as a typed UNION.

_EVOLUTION_ORACLE = """
WITH merged AS (
  SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
  FROM documents WHERE doc_id < 250
  UNION ALL
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id >= 250
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) - count(n_chars) AS BIGINT) AS n_missing,
       CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS sum_chars
FROM merged GROUP BY lang
"""


@query("q_schema_evolution", oracle=_EVOLUTION_ORACLE)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write two generations of the documents table (v1 lacks n_chars),
    read both directories as one dataset with mergeSchema=true, and
    aggregate across the evolved schema — old rows surface the added
    column as null.

    Scale notes: mergeSchema's cost is footer-reads across files (a
    metadata operation, not a data scan); production tables pin the
    merged schema in a catalog instead of re-merging per query — the
    explicit-schema read path q_format_roundtrip uses. Aggregates follow
    the exact-integer discipline."""
    d = load_table(spark, sf_dir, "documents")
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_evo_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    shutil.rmtree(base, ignore_errors=True)
    d.filter(F.col("doc_id") < 250).select("doc_id", "lang").write.parquet(
        f"{base}/gen=1"
    )
    d.filter(F.col("doc_id") >= 250).select(
        "doc_id", "lang", "n_chars"
    ).write.parquet(f"{base}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/gen=1", f"{base}/gen=2"
    )
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.count("n_chars")).alias("n_missing"),
        F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).alias("sum_chars"),
    )
