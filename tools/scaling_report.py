"""Measured-scaling report: given two bench.py JSON outputs at different
scale factors, emit the per-query and per-family scaling exponents

    alpha = log(t_hi / t_lo) / log(sf_hi / sf_lo)

so alpha = 1.0 is perfectly linear in data size, < 1 means fixed costs
still dominate at the lower SF, and anything materially above ~1.2 on a
data-bound query is a candidate super-linear defect (the q_dedup_embedding
quadratic found by the round-4 sf1 proof showed up here as alpha ≈ 2).

Usage:
    python tools/scaling_report.py BENCH_LO.json BENCH_HI.json

Reads the "queries" (min-of-passes) map from each file; both runs must
come from the same machine, back-to-back, for the ratio to mean anything
(bench.py emits raw per-pass times in "passes" so contention is visible).
"""

from __future__ import annotations

import json
import math
import sys

# Same-shuffle-shape families: queries whose dominant physical stage is the
# same kind of work, so a shared exponent is meaningful. Order = SCALE.md.
FAMILIES: dict[str, list[str]] = {
    "scan/filter/chunk (zero-shuffle)": [
        "q_scan_filter", "q_chunk_fixed", "q_gopher_quality", "q_json_props",
    ],
    "aggregation (partial+final)": [
        "q_agg_basic", "q_profile", "q_dq_audit", "q_dataset_card",
    ],
    "shuffle joins (incl. multiway star)": [
        "q_join_shuffle", "q_join_multiway", "q_market_share",
        "q_large_orders", "q_avg_subquery",
    ],
    "windows / top-k / sessionize": [
        "q_topk_per_group", "q_sessionize", "q_cdc_apply", "q_event_pattern",
    ],
    "exact kNN / brute-force vector": [
        "q_knn", "q_knn_join", "q_stub_knn",
    ],
    "ANN (IVF / PQ / rerank / recall)": [
        "q_ann_ivf_kmeans", "q_ann_pq", "q_ann_recall", "q_ann_rerank",
    ],
    "dedup pair stages (LSH band joins)": [
        "q_dedup_minhash", "q_dedup_simhash", "q_dedup_fingerprint",
        "q_winnow_dups", "q_dedup_incremental", "q_minhash_eval",
        "q_line_dedup", "q_semdedup",
    ],
    "text scoring (tfidf / colloc / BPE)": [
        "q_tfidf", "q_collocations", "q_bpe_merges",
    ],
    "retrieval serving (multi-stage chains)": [
        "q_rrf_fusion", "q_e2e_rag", "q_mmr_rerank", "q_query_expansion",
    ],
    "graph (edge build / iterate / close)": [
        "q_graph_degree", "q_pagerank", "q_triangle_count",
    ],
    "sketches / sampling": [
        "q_cms_heavy", "q_bloom_join", "q_decontaminate",
    ],
    "temporal / interval": [
        "q_asof_join", "q_interval_overlap", "q_stream_window",
    ],
    "layout / governance / composition": [
        "q_zorder_layout", "q_k_anonymity", "q_reident_risk",
        "q_e2e_corpus",
    ],
}


def main() -> None:
    lo_path, hi_path = sys.argv[1], sys.argv[2]
    lo = json.load(open(lo_path))
    hi = json.load(open(hi_path))
    sf_lo, sf_hi = float(lo["sf"]), float(hi["sf"])
    ratio = sf_hi / sf_lo
    qlo, qhi = lo["queries"], hi["queries"]

    def alpha(name: str) -> float | None:
        if name not in qlo or name not in qhi:
            return None
        # Below ~0.3s the timing is dominated by fixed per-job cost
        # (scheduling, codegen lookup), not data; exponent is meaningless.
        if qlo[name] < 0.05:
            return None
        return math.log(qhi[name] / qlo[name]) / math.log(ratio)

    print(f"| family | sf{sf_lo} s | sf{sf_hi} s | exponent | per-query |")
    print("|---|---|---|---|---|")
    covered: set[str] = set()
    for fam, names in FAMILIES.items():
        names = [n for n in names if n in qlo and n in qhi]
        covered.update(names)
        if not names:
            continue
        t_lo = sum(qlo[n] for n in names)
        t_hi = sum(qhi[n] for n in names)
        fam_a = math.log(t_hi / t_lo) / math.log(ratio)
        per = ", ".join(
            f"{n.removeprefix('q_')} {alpha(n):.2f}" if alpha(n) is not None
            else f"{n.removeprefix('q_')} –"
            for n in names
        )
        print(f"| {fam} | {t_lo:.2f} | {t_hi:.2f} | **{fam_a:.2f}** | {per} |")

    rest = sorted(set(qlo) & set(qhi) - covered)
    if rest:
        t_lo = sum(qlo[n] for n in rest)
        t_hi = sum(qhi[n] for n in rest)
        fam_a = math.log(t_hi / t_lo) / math.log(ratio)
        per = ", ".join(
            f"{n.removeprefix('q_')} {alpha(n):.2f}" if alpha(n) is not None
            else f"{n.removeprefix('q_')} –"
            for n in rest
        )
        print(f"| (other headline) | {t_lo:.2f} | {t_hi:.2f} | **{fam_a:.2f}** | {per} |")

    t_lo = sum(qlo.values())
    t_hi = sum(qhi.values())
    print(
        f"| **all headline** | **{t_lo:.2f}** | **{t_hi:.2f}** | "
        f"**{math.log(t_hi / t_lo) / math.log(ratio):.2f}** | |"
    )


if __name__ == "__main__":
    main()
