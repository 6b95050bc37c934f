"""Training-corpus assembly queries, round-2 batch 3: benchmark
decontamination and sequence packing.

These are the two passes that sit between a cleaned/deduped corpus and
the tokenizer: drop training documents that leak evaluation-benchmark
text (the GPT-3 appendix-C n-gram overlap rule), then account for how
the surviving token stream packs into fixed-length training windows.

Both are pure built-in-Column plans and both carry exact DuckDB oracles:
hashes are the repo's portable md5-prefix integers
(functions/hashing.py), packing is all integer arithmetic, so every
value hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import hashing as H
from ..functions import text as T
from ..functions.hashing import d_h64
from ..sources import load_table
from .registry import query

# DuckDB mirror of functions.text.tokens (same as pipeline_queries._WORDS_SQL).
_WORDS_SQL = (
    "list_filter(list_transform(string_split_regex(text, '\\s+'), "
    "w -> trim(w)), w -> length(w) > 0)"
)

# --- benchmark decontamination -----------------------------------------------

# Production decontamination uses 13-gram overlap (GPT-3 appendix C); the
# synthetic docs bottom out at 10 words, so the declared query runs N=8 —
# the operator takes N as a parameter, nothing about the plan changes.
_DECON_N = 8
_DECON_HEX = 12  # 48-bit gram fingerprints: equality-join only, no arithmetic
_DECON_PREFIX = "decon probe prefix "

_DECON_GRAMS_SQL = f"""
  SELECT DISTINCT doc_id,
         {d_h64('gram', seed='decon', nchars=_DECON_HEX)} AS h
  FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(w) >= {_DECON_N} THEN
             list_transform(range(1, len(w) - {_DECON_N - 2}),
                            i -> array_to_string(w[i:i+{_DECON_N - 1}], ' '))
           ELSE [] END) AS gram
    FROM (SELECT doc_id, {_WORDS_SQL} AS w FROM {{src}})
  )
"""

_DECON_ORACLE = f"""
WITH bench AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 23 = 0
), train AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 500000 AS doc_id, '{_DECON_PREFIX}' || text AS text
  FROM bench
), bg AS ({_DECON_GRAMS_SQL.format(src='bench')}
), tg AS ({_DECON_GRAMS_SQL.format(src='train')}
)
SELECT t.doc_id AS train_id, b.doc_id AS bench_id,
       CAST(count(*) AS BIGINT) AS n_shared
FROM tg t JOIN bg b USING (h)
WHERE t.doc_id <> b.doc_id
GROUP BY 1, 2
"""


def _gram_set(df: DataFrame, n: int) -> DataFrame:
    """Distinct (doc_id, 48-bit word-n-gram fingerprint) pairs. Texts are
    dropped before any shuffle — only 8-byte hashes move."""
    return (
        df.select(
            "doc_id", F.explode(T.word_shingles("text", n)).alias("gram")
        )
        .select(
            "doc_id", H.h64("gram", seed="decon", nchars=_DECON_HEX).alias("h")
        )
        .distinct()
    )


@query("q_decontaminate", oracle=_DECON_ORACLE)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing word
    n-grams with an evaluation set (the GPT-3 appendix-C rule; the same
    pass every serious pretraining pipeline runs). The eval set is a
    deterministic slice of `documents`; planted contaminated rows (eval
    text behind a novel prefix) guarantee true positives the oracle
    reproduces exactly.

    Scale shape: the eval side is benchmarks — thousands of docs against
    a 100 TB corpus — so its distinct gram set BROADCASTS and the whole
    pass is a map-side hash semi-join over the training scan: no shuffle
    of training grams at all, and only the (rare) matching pairs reach
    the final small aggregation. Gram texts never move; 8-byte
    fingerprints do."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 23 == 0)
    planted = bench.select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.lit(_DECON_PREFIX), F.col("text")).alias("text"),
    )
    train = d.unionByName(planted)

    bg = _gram_set(bench, _DECON_N).withColumnRenamed("doc_id", "bench_id")
    tg = _gram_set(train, _DECON_N).withColumnRenamed("doc_id", "train_id")
    hits = tg.join(F.broadcast(bg), "h").filter(
        F.col("train_id") != F.col("bench_id")
    )
    return hits.groupBy("train_id", "bench_id").agg(
        F.count("*").alias("n_shared")
    )


# --- sequence packing accounting ---------------------------------------------

_PACK_BUDGET = 256  # tokens per training window

_PACK_ORACLE = f"""
WITH t AS (
  SELECT source, doc_id, CAST(len({_WORDS_SQL}) AS BIGINT) AS n
  FROM documents
), c AS (
  SELECT source, n,
         sum(n) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM t
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       CAST(max(cum) // {_PACK_BUDGET} AS BIGINT) AS n_windows,
       CAST(max(cum) % {_PACK_BUDGET} AS BIGINT) AS tail_tokens,
       CAST(sum(CASE WHEN (cum - 1) // {_PACK_BUDGET}
                       > (cum - n) // {_PACK_BUDGET}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
FROM c
GROUP BY source
"""


@query("q_pack_sequences", oracle=_PACK_ORACLE)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing accounting: each source's token
    stream, concatenated in doc_id order, is cut into fixed
    {budget}-token training windows (the GPT-2 packing scheme); report
    per-source window counts, tail waste, and how many documents
    straddle a window boundary (the cross-document-attention
    contamination metric that motivates doc-boundary-aware packing).

    Scale shape: packing only needs WITHIN-PARTITION contiguity — bins
    never span sources/shards — so the window runs partitioned by source
    with no global sort; at 100 TB you sub-shard big sources the same
    way. All integer arithmetic (truncating div == floor on non-negative
    operands in both engines), so the oracle is hash-exact."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "source", "doc_id", T.word_count("text").cast("bigint").alias("n")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.select("source", "n", F.sum("n").over(w).alias("cum"))
    b = F.lit(_PACK_BUDGET)
    straddle = (
        F.expr(f"(cum - 1) div {_PACK_BUDGET}")
        > F.expr(f"(cum - n) div {_PACK_BUDGET}")
    ).cast("long")
    return c.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").alias("total_tokens"),
        F.expr(f"max(cum) div {_PACK_BUDGET}").alias("n_windows"),
        (F.max("cum") % b).alias("tail_tokens"),
        F.sum(straddle).alias("n_straddlers"),
    )
