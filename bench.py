"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line on stdout: {"metric": ..., "value": total_sec,
"unit": "sec", "queries": {name: min_sec}, "sf": ...}. The per-pass raw
times ({"passes": {name: [p0_sec, p1_sec]}}) go to stderr so the final
stdout line stays inside the driver's tail capture (VERDICT r10 item 3).

Each query is executed to completion (count-materialized — results stay
distributed, nothing is collected to the driver beyond the row count, which
is how a 100 TB run would be measured too).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from create_proposals_using_vector_db_public_spark.plans import QUERIES
from create_proposals_using_vector_db_public_spark.session import get_spark

HEADLINE = [
    "q_scan_filter",      # pushdown scan
    "q_agg_basic",        # TPC-H Q1 wide agg
    "q_join_shuffle",     # star join
    "q_topk_per_group",   # partitioned window
    "q_knn",              # flagship exact kNN
    "q_knn_join",         # batch kNN
    "q_stub_knn",         # text→vector→kNN
    "q_dedup_minhash",    # MinHash LSH
    "q_dedup_simhash",    # SimHash banding
    "q_dedup_fingerprint",  # normalize+hash dedup
    "q_stream_window",    # tumbling window agg
    "q_json_props",       # semi-structured extraction
    "q_tfidf",            # posting-list scoring
    "q_asof_join",        # temporal as-of composition
    "q_sessionize",       # gap sessionization
    # round-2 additions (r1 entries above are unchanged for comparability)
    "q_winnow_dups",      # rolling-hash passage fingerprints
    "q_ann_ivf_kmeans",   # trained-codebook IVF ANN
    "q_ann_recall",       # batch ANN + exact kNN + recall join
    "q_chunk_fixed",      # token-window chunking (zero-shuffle scan op)
    "q_zorder_layout",    # Morton-key clustering boxes
    "q_decontaminate",    # broadcast n-gram eval-overlap scan
    "q_bloom_join",       # bitmap runtime join filter
    "q_e2e_corpus",       # scrub→dedup→chunk→embed composition
    "q_ann_pq",           # product-quantization ADC search
    # round-2 batch 4
    "q_join_multiway",    # TPC-H Q5 six-table star join
    "q_pagerank",         # iterative same-key join (3 rounds, integer ranks)
    "q_cdc_apply",        # keyed window, last-writer-wins
    "q_profile",          # one-scan multi-distinct profiling
    # round-2 batch 5
    "q_avg_subquery",     # decorrelated scalar subquery (Q17 shape)
    "q_interval_overlap", # bucket-blocked interval join
    "q_cms_heavy",        # count-min sketch build + probe
    # round-2 batch 6
    "q_market_share",     # TPC-H Q8 seven-table star, dims broadcast
    "q_large_orders",     # Q18 HAVING-driven join pruning
    "q_collocations",     # bigram lift, array-local zip
    "q_bpe_merges",       # BPE merge-pair induction over word types
    "q_dq_audit",         # fused one-pass-per-table DQ gate
    # round-2 batch 8
    "q_gopher_quality",   # zero-shuffle integer quality rules
    "q_line_dedup",       # CCNet line dedup, hashed-key window
    "q_semdedup",         # cluster-blocked semantic dedup
    "q_rrf_fusion",       # hybrid BM25 + vector fusion
    "q_k_anonymity",      # generalization-ladder governance audit
    "q_event_pattern",    # CEP regex over ordered histories
    "q_ann_rerank",       # SQ8 coarse scan + exact re-rank
    "q_dedup_incremental",  # crawl-vs-index MinHash classification
    "q_minhash_eval",     # LSH precision/recall pricing
    # round-3 additions: the expensive serving/retrieval + graph tail
    # (VERDICT r2 item 3 — a regression here was invisible to BENCH_r02)
    "q_e2e_rag",          # retrieve→rerank→assemble capstone
    "q_mmr_rerank",       # greedy MMR unroll (k sequential jobs)
    "q_query_expansion",  # PRF double-BM25 pass
    "q_graph_degree",     # co-order edge build + degree dist
    "q_triangle_count",   # oriented-wedge closure join
    "q_reident_risk",     # quasi-identifier group-size risk
    "q_dataset_card",     # corpus-wide multi-stat report
    # round-5 additions
    "q_minhash_wide_eval",  # production-shaped 16/4 LSH pricing
    "q_temperature_sample",  # alpha=0.5 language-mix resampling
    # round-10 addition (the round-7 precedent: every new query gets a
    # round-over-round wall-time trace; identical to q_semdedup at every
    # sub-knee SF, so its bench value doubles as a same-plan control)
    "q_semdedup_capped",  # bounded-centroid SemDeDup production config
    # round-11 addition (same precedent; at sf0.1 its ncent is 42 vs the
    # siblings' 32, so it is a near-same-plan control, not an identical one)
    "q_semdedup_sqrt",    # compute-optimal sqrt(n)-centroid SemDeDup
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    # Opt-in subset for big-SF scale runs (e.g. the sf10 family sweep where
    # the by-construction-quadratic exact-kNN baselines would dominate the
    # wall clock): comma-separated query names. Default — the driver's
    # path — is the full headline list, unchanged.
    headline = HEADLINE
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        requested = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in requested if n not in QUERIES]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY unknown queries: {unknown}")
        headline = requested
    spark = get_spark("bench", shuffle_partitions=32)
    # Warm each query's codegen/JIT at the tiny SF first: whole-stage
    # codegen compiles per plan shape, and first-run JIT otherwise dominates
    # the measured time at local scale. Timings below are steady-state
    # compute at the target SF.
    if os.path.isdir(warm_dir):
        for name in headline:
            try:
                QUERIES[name](spark, warm_dir).count()
            except Exception:
                pass

    # Two timed passes, report the min per query: this box suffers
    # multi-minute host-level contention episodes (parallel throughput
    # drops ~10x while single-core work is unaffected); min-of-two samples
    # two time windows and measures the engine, not the noisy neighbor.
    passes: dict[str, list[float]] = {name: [] for name in headline}
    for _pass in range(2):
        for name in headline:
            t0 = time.time()
            n = QUERIES[name](spark, sf_dir).count()
            dt = time.time() - t0
            passes[name].append(round(dt, 3))
            print(f"# pass{_pass} {name}: {dt:.2f}s ({n} rows)", file=sys.stderr)
    timings = {name: min(ts) for name, ts in passes.items()}
    total = sum(timings.values())

    # Both raw pass times per query go to STDERR: when a driver-recorded
    # run diverges from a builder re-run on the same code, a large
    # pass0/pass1 spread here shows host contention directly instead of
    # leaving it to inference (VERDICT r3 §perf). They must NOT ride on
    # the final stdout line — the driver tail-captures stdout and the
    # ~2.7 KB passes dict pushed the round-10 one-liner past the capture
    # (BENCH_r10 `parsed: null`, VERDICT r10 item 3). The committed
    # per-round raw JSONs under tools/bench_local/ carry passes too.
    print(json.dumps({"passes": passes}), file=sys.stderr)
    # The driver-parsed line: compact {metric, value, unit, queries, sf}
    # ONLY, printed last on stdout.
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
