"""Retrieval-serving operators: BM25 scoring with a dynamic term set,
reciprocal-rank fusion, and maximal-marginal-relevance re-ranking.

The reference is a document-retrieval app (top-k vector search feeding an
LLM, ``app.py:178-186``); these are the standard IR compositions a
production retrieval layer adds on top of the flagship kNN: lexical+vector
hybrid search (RRF), result diversification (MMR), and pseudo-relevance-
feedback expansion (built from :func:`bm25_scores` in the plans layer).
All are public-textbook algorithms (Robertson BM25; Cormack et al. 2009
RRF; Carbonell & Goldstein 1998 MMR).

Scale shape: these run AFTER candidate generation, so their inputs are
top-k-bounded (tens of rows per query) — the expensive part is the
upstream scan/kNN, which keeps its heap-top-k / posting-list shapes. BM25
itself is posting-list shaped: the term filter collapses the corpus to
|query_terms| postings before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions import vectors as V

BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60


def bm25_scores(
    docs: DataFrame,
    query_terms: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    postings: DataFrame | None = None,
) -> DataFrame:
    """BM25 score per document for a *dynamic* query-term set (a 1-column
    ``term`` DataFrame, always broadcast, deduplicated to IN-set
    semantics) — the data-dependent variant of the fixed-term q_bm25,
    needed by pseudo-relevance feedback where the expanded term set is
    computed, not literal.

    Returns (id_col, score) with the raw double score — callers round at
    their declared precision. Corpus stats (avgdl, n_docs) are a 1-row
    broadcast; document lengths join on the id; only the filtered
    postings (|terms| per doc at most) ever aggregate. Pass ``postings``
    (an exploded (id, term) frame) when the caller runs several BM25
    passes over the same corpus — the tokenize/explode scan then happens
    once, not per pass.
    """
    terms = (
        postings
        if postings is not None
        else docs.select(
            F.col(id_col), F.explode(T.tokens(text_col)).alias("term")
        )
    )
    dl = terms.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(F.avg("dl").alias("avgdl"), F.count("*").alias("n_docs"))
    # distinct: the declared semantics are an IN-set (the oracles' WHERE
    # term IN ...); a duplicated input term must not double-count postings
    qterms = terms.join(
        F.broadcast(query_terms.select("term").distinct()), "term"
    )
    tf = qterms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = qterms.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    )
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(idf * tf_part).alias("score"))
    )


def rrf_fuse(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    left_rank: str = "rank_lex",
    right_rank: str = "rank_vec",
    k: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked candidate lists (Cormack et
    al. 2009): full-outer join on the id, score = Σ 1/(k + rank) over the
    lists that contain the doc. Deterministic: the score is one or two
    exact double divisions added once (no order-dependent accumulation),
    rounded to 6dp; ties break on the id. Both inputs are top-k-bounded,
    so the join is trivially small at serving time."""
    fused = left.join(right, id_col, "full_outer").select(
        id_col,
        left_rank,
        right_rank,
        F.round(
            F.coalesce(1.0 / (k + F.col(left_rank)), F.lit(0.0))
            + F.coalesce(1.0 / (k + F.col(right_rank)), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused.orderBy(F.col("rrf").desc(), F.col(id_col).asc())


def mmr_select(
    cand: DataFrame,
    k: int,
    lam: float = 0.5,
    id_col: str = "doc_id",
    vec_col: str = "emb",
    rel_col: str = "rel",
) -> DataFrame:
    """Maximal-marginal-relevance selection (Carbonell & Goldstein 1998):
    greedily pick ``k`` items maximizing lam*relevance − (1−lam)*max
    cosine-similarity to the already-selected set. Returns (id, rel,
    mmr_rank).

    The greedy loop is unrolled into the plan (one argmax + one bounded
    join per step, like q_pagerank's unrolled iterations) — nothing is
    collected to the driver. Candidates are top-k-bounded upstream, so
    every step's join is tens-of-rows; lam=0.5 and the 6dp-rounded sims
    make each step's argmax deterministic (ties on the rounded score break
    by id). Each step's ``selected`` is localCheckpoint-ed (it is <= k
    tiny rows): the loop body references it ~4 times, so an uncached
    chain would grow the logical plan ~4^k and re-execute every prior
    step — checkpointing keeps planning and execution linear in k.
    eager=False so building/explaining the plan runs NO jobs (measured
    equivalent to eager at k=8; an unchecked chain at k=8 hangs the
    analyzer) — materialization happens at the first real action.

    ``cand`` itself is also checkpointed: the loop references it 2x per
    step, so an expensive upstream candidate pipeline (q_e2e_rag's full
    gate→BM25→kNN→RRF chain) would otherwise re-execute ~2k times —
    measured 737s → 15s at sf0.01 for the e2e composition."""
    base = cand.select(id_col, vec_col, rel_col).localCheckpoint(eager=False)
    selected = (
        base.orderBy(F.col(rel_col).desc(), F.col(id_col).asc())
        .limit(1)
        .withColumn("mmr_rank", F.lit(1))
        .localCheckpoint(eager=False)
    )
    for step in range(2, k + 1):
        sel_vecs = F.broadcast(
            selected.select(
                F.col(id_col).alias("__sid"), F.col(vec_col).alias("__semb")
            )
        )
        rem = base.join(selected.select(id_col), id_col, "left_anti")
        maxsim = (
            rem.crossJoin(sel_vecs)
            .withColumn(
                "__sim",
                F.round(V.cosine_sim(f"`{vec_col}`", "__semb"), 6),
            )
            .groupBy(id_col)
            .agg(F.max("__sim").alias("__ms"))
        )
        nxt = (
            rem.join(maxsim, id_col)
            .withColumn(
                "__score",
                F.round(
                    lam * F.col(rel_col) - (1.0 - lam) * F.col("__ms"), 6
                ),
            )
            # a candidate whose similarity to EVERY selected item is
            # undefined (zero-norm vector → NULL cosine → NULL max → NULL
            # score) cannot be MMR-ranked — skip it explicitly. Without
            # this filter the desc sort's NULLS-LAST would still pick such
            # a row when it is the only candidate left, ranking it by id
            # rather than by MMR (caught by the greedy-reference property
            # test's zero-vector example).
            .filter(F.col("__score").isNotNull())
            .orderBy(F.col("__score").desc(), F.col(id_col).asc())
            .limit(1)
            .select(id_col, vec_col, rel_col)
            .withColumn("mmr_rank", F.lit(step))
        )
        selected = selected.unionByName(nxt).localCheckpoint(eager=False)
    return selected.select(id_col, rel_col, "mmr_rank")
