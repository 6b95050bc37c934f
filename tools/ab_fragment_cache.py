"""A/B harness for a design question every 100 TB pipeline owner asks:
should the engine runtime-cache the two corpus-derived fragments that
many retrieval/text queries rebuild from parquet — the inverted-index
postings explode ``documents → (doc_id, term)`` and the stub document
embeddings — so Spark's CacheManager substitutes the materialized
fragment into every query whose canonicalized plan contains it?

Answer (measured round 8, recorded in SCALE.md "Round-8 design
decision"): NO — not as a runtime cache. The substitution mechanism
itself works exactly as designed (one cached postings fragment shows up
as 28 InMemoryTableScan sites inside q_query_expansion's executed plan),
and warm single-occurrence consumers gain 0.1–0.5 s each at sf0.1. But
the multi-occurrence plans REGRESS: InMemoryTableScan is a codegen
boundary, so each of the many fragment instances becomes a columnar
cache read instead of a whole-stage-codegen-fused tokenize+aggregate
pipeline over the (small, pruned) parquet scan — and fused recompute is
cheaper than cache reads until the text column is large enough that
re-tokenizing dominates. Net headline effect ≈ 0 at bench scale, with
the regression concentrated in the two most expensive serving queries.
At 100 TB a .cache() of corpus postings would not pass a size gate
anyway; the scale-correct mechanism for fragment reuse there is the
engine's existing SINK path — persist the derived postings/embeddings
table once (an inverted-index / embedding-store build, the shape
q_sink_roundtrip and the pickle sidecar already exercise) and read it
back pruned, which keeps every consumer on an ordinary pushdown scan.

Usage:
    python tools/ab_fragment_cache.py [sf_dir] [passes]

Prints one JSON line: {"arm_a": {query: [pass_sec, ...]}, "arm_b": ...,
"cache_build_sec": ..., "sf_dir": ..., "passes": N}. Arm A is the
status quo (no fragment cache); arm B caches + materializes both
fragments before the timed passes. Each arm gets its own SparkSession
and the same sf0.001 codegen warm-up bench.py uses.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from create_proposals_using_vector_db_public_spark.functions import text as T
from create_proposals_using_vector_db_public_spark.plans import QUERIES
from create_proposals_using_vector_db_public_spark.session import get_spark
from create_proposals_using_vector_db_public_spark.sources import load_table

# every registry query that rebuilds one of the two fragments
# (enumerated by grep over plans/ — see SCALE.md for the site list)
AB_QUERIES = [
    "q_query_expansion",   # postings ×2 BM25 passes + expansion mining
    "q_e2e_rag",           # postings feed gate + BM25 arm
    "q_tfidf",             # postings
    "q_bm25",              # postings
    "q_rare_terms",        # postings
    "q_map_ops",           # postings
    "q_stub_embed",        # embeddings
    "q_stub_knn",          # embeddings
    "q_rrf_fusion",        # embeddings (vector arm)
    "q_mmr_rerank",        # embeddings
    "q_pickle_roundtrip",  # embeddings (sidecar write)
]

WARM_DIR = "/root/testdata/sf0.001"


def _fragments(spark, sf_dir: str):
    d = load_table(spark, sf_dir, "documents")
    postings = d.select("doc_id", F.explode(T.tokens("text")).alias("term"))
    emb = T.stub_embeddings_df(d, "doc_id", "text")
    return postings, emb


def run_arm(label: str, sf_dir: str, passes: int, warm_cache: bool):
    spark = get_spark(f"ab_fragment_{label}", shuffle_partitions=32)
    if os.path.isdir(WARM_DIR):
        for name in AB_QUERIES:
            QUERIES[name](spark, WARM_DIR).count()
    build = None
    if warm_cache:
        postings, emb = _fragments(spark, sf_dir)
        t0 = time.time()
        postings.cache().count()
        emb.cache().count()
        build = round(time.time() - t0, 3)
    out: dict[str, list[float]] = {name: [] for name in AB_QUERIES}
    for _ in range(passes):
        for name in AB_QUERIES:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).count()
            out[name].append(round(time.time() - t0, 3))
    spark.stop()
    return out, build


def main() -> None:
    # Arm order is configurable (and recorded in the JSON) because a fixed
    # A-then-B execution shares one host time window: slow monotonic host
    # drift would bias the comparison in a fixed direction. Run once with
    # each order (or use --order=ba for the counter-run) so drift cancels.
    order = "ab"
    argv = [a for a in sys.argv[1:] if not a.startswith("--order=")]
    for a in sys.argv[1:]:
        if a.startswith("--order="):
            order = a.split("=", 1)[1]
    if order not in ("ab", "ba"):
        raise SystemExit(f"--order must be ab or ba, got {order!r}")
    # any other --flag (e.g. a bare '--order ba' split by the shell) must
    # error, not silently become the positional sf_dir / crash int(passes)
    bad = [a for a in argv if a.startswith("--")]
    if bad:
        raise SystemExit(f"unrecognized flags {bad}; only --order=ab|ba is supported")
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    passes = int(argv[1]) if len(argv) > 1 else 3
    if order == "ab":
        arm_a, _ = run_arm("a", sf_dir, passes, warm_cache=False)
        arm_b, build = run_arm("b", sf_dir, passes, warm_cache=True)
    else:
        arm_b, build = run_arm("b", sf_dir, passes, warm_cache=True)
        arm_a, _ = run_arm("a", sf_dir, passes, warm_cache=False)
    print(
        json.dumps(
            {
                "arm_a": arm_a,
                "arm_b": arm_b,
                "order": order,
                "arm_a_total_min": round(
                    sum(min(v) for v in arm_a.values()), 3
                ),
                "arm_b_total_min": round(
                    sum(min(v) for v in arm_b.values()), 3
                ),
                "cache_build_sec": build,
                "sf_dir": sf_dir,
                "passes": passes,
            }
        )
    )


if __name__ == "__main__":
    main()
