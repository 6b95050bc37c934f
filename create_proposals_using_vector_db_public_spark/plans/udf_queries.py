"""Rows-only declared queries for the Python-UDF surfaces: the pandas_udf
embedder (R7/R8), keyword extraction (R15), and multimodal feature
extraction. Not SQL-expressible (Arrow-batched Python execution), so the
driver records rows-only checks — value-level coverage of the same
semantics lives in the oracle-checked q_stub_* queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..operators import ml, multimodal as MM
from ..sources import load_table
from .registry import query


@query("q_udf_embed")  # rows-only: pandas_udf path
def q_udf_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7/R8 through the real Arrow-batched pandas_udf plumbing (hash
    fallback embedder in this container): embeds a slice of documents and
    reports per-row norm + dim so the check is shape-meaningful."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    emb = ml.with_embeddings(d.select("doc_id", "text"), dim=64)
    return emb.select(
        "doc_id",
        F.size("embedding").alias("dim"),
        F.round(V.l2_norm(V.as_double_array("embedding")), 4).alias("norm"),
    )


@query("q_udf_embed_knn")  # rows-only: nondeterministic across impls
def q_udf_embed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full search pipeline (R7→R17→R18→R19) over UDF
    embeddings: embed, take doc 0 as the query, exact L2 top-5."""
    from ..operators import knn as K

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    emb = ml.with_embeddings(d.select("doc_id", "text"), dim=64)
    qv = [
        float(x)
        for x in emb.filter(F.col("doc_id") == 0).select("embedding").head()[0]
    ]
    return K.knn(emb.drop("text"), qv, k=5, id_col="doc_id")


@query("q_udf_keywords")  # rows-only: KeyBERT-or-fallback path
def q_udf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R15 through the pandas_udf (falls back to first-8 tokens here)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    kw = d.select("doc_id", ml.keyword_udf(8)(F.col("text")).alias("keywords"))
    return kw.select("doc_id", F.size("keywords").alias("n_keywords"),
                     F.array_join("keywords", " ").alias("joined"))


@query("q_multimodal_features")  # rows-only: mapInPandas over binary blobs
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column multimodal plumbing: text bytes → blob table →
    mapInPandas feature extraction (stub decode, real Arrow batching)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    blobs = MM.make_blob_table(d)
    feats = MM.extract_features(blobs)
    return feats.select(
        "blob_id",
        "media_type",
        "n_bytes",
        "width",
        "height",
        F.round(F.aggregate("histogram", F.lit(0.0), lambda a, x: a + x), 4).alias(
            "hist_sum"
        ),
    )


@query("q_multimodal_frames")  # rows-only
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for 'video' blobs: one row per sampled frame
    with byte offsets."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    blobs = MM.make_blob_table(d)
    return MM.frame_sample(blobs, n_frames=4)
