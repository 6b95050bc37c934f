"""Registry-wide physical-plan audit: compile EVERY declared query and
flag scale-killer shapes, with an explicit allowlist for the queries
whose "suspicious" operator is the intended design (documented per
entry). Complements tests/test_plans.py (which pins a handful of
load-bearing plans in depth) with breadth: a new query that silently
compiles to a cartesian product fails this audit before it ever meets
100 TB.

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.001 — plans,
not data, are under audit, so the smallest SF keeps it fast)
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from create_proposals_using_vector_db_public_spark.plans import QUERIES
from create_proposals_using_vector_db_public_spark.session import get_spark

# query -> {flag: reason} for intentional uses of a flagged operator.
ALLOW: dict[str, dict[str, str]] = {
    # brute-force batch kNN IS a broadcast cross product of the tiny
    # query set by design; IVF/LSH/PQ are the plans that avoid it
    "q_knn_join": {"nested_loop": "broadcast query-set cross product"},
    "q_ann_recall": {"nested_loop": "exact side is knn_join by design"},
    "q_udf_embed_knn": {"nested_loop": "stub-embed batch kNN"},
    "q_stub_knn": {"nested_loop": "single query vector vs corpus"},
    "q_knn": {"nested_loop": "single broadcast query vector"},
    "q_knn_cosine": {"nested_loop": "single broadcast query vector"},
    "q_rank_l2": {"nested_loop": "single broadcast query vector"},
    "q_cosine_topk": {"nested_loop": "single broadcast query vector"},
    # 1-row broadcast parameter / stats tables crossJoined on purpose
    # (threshold, grid, codebook, global totals) — bounded by construction
    "q_ann_ivf": {"nested_loop": "1-row query parameter cross join"},
    "q_semdedup": {
        "nested_loop": "broadcast centroid-assignment cross join "
        "(ivf_assign, ncent = max(32, n//625) scales with the corpus); "
        "the within-cluster pair stage is a SortMergeJoin on the "
        "cluster key"
    },
    # same plan body as q_semdedup (round 13 removed the keep-stage
    # checkpoint, so the assignment subtree — with its bounded broadcast
    # cross join — is now visible in all three configs' rendered plans;
    # exchange reuse executes it once)
    "q_semdedup_capped": {
        "nested_loop": "broadcast centroid-assignment cross join "
        "(ivf_assign; same plan body as q_semdedup, capped ncent)"
    },
    "q_semdedup_sqrt": {
        "nested_loop": "broadcast centroid-assignment cross join "
        "(ivf_assign; same plan body as q_semdedup, sqrt ncent)"
    },
    "q_ann_ivf_kmeans": {"nested_loop": "1-row query parameter"},
    "q_rrf_fusion": {
        "nested_loop": "1-row stub query vector + 1-row corpus stats "
        "broadcast cross joins"
    },
    "q_mmr_rerank": {
        "nested_loop": "1-row query vector; per-step joins against the "
        "<=5-row selected set (greedy MMR unroll)"
    },
    "q_query_expansion": {
        "nested_loop": "1-row corpus-stats broadcast cross joins in both "
        "BM25 passes"
    },
    "q_ann_lsh": {"nested_loop": "1-row query parameter"},
    "q_bpe_encode": {
        "nested_loop": "1-row pivoted merge-table broadcast cross join"
    },
    "q_ann_rerank": {
        "nested_loop": "1-row SQ grid + query-codes broadcast cross joins"
    },
    "q_minhash_eval": {
        "nested_loop": "two 1-row metric aggregates cross joined"
    },
    "q_minhash_wide_eval": {
        "nested_loop": "two 1-row metric aggregates cross joined"
    },
    "q_simhash_eval": {
        "nested_loop": "two 1-row metric aggregates cross joined"
    },
    "q_winnow_eval": {
        "nested_loop": "two 1-row metric aggregates cross joined"
    },
    "q_dataset_card": {
        "nested_loop": "two 1-row summary aggregates cross joined"
    },
    "q_ann_pq": {"nested_loop": "1-row query + codebook broadcast"},
    "q_ann_ivfpq": {"nested_loop": "1-row query + codebook broadcast"},
    "q_pq_recall": {"nested_loop": "1-row query + codebook broadcast"},
    "q_sq_recall": {"nested_loop": "1-row grid/query broadcasts"},
    "q_cust_no_orders": {"nested_loop": "1-row scalar-average threshold"},
    "q_important_parts": {"nested_loop": "1-row global value threshold"},
    "q_dsir_select": {"nested_loop": "1-row above-mean threshold"},
    "q_negative_sample": {"nested_loop": "1-row id-space size parameter"},
    "q_collocations": {"nested_loop": "1-row vocabulary-map broadcast"},
    "q_zonemap_prune": {"nested_loop": "1-row zone-count aggregates"},
    "q_compaction": {"nested_loop": "1-row checksum aggregate"},
    "q_vocab_coverage": {"nested_loop": "1-row vocab parameter"},
    "q_decontaminate": {"nested_loop": "broadcast eval n-gram set"},
    "q_domain_mix": {"nested_loop": "1-row mix-weight table"},
    "q_cms_heavy": {"nested_loop": "1-row sketch broadcast"},
    "q_hll_merge": {"nested_loop": "1-row merged-sketch aggregate"},
    "q_ols": {"nested_loop": "1-row moment sums"},
    "q_contingency": {"nested_loop": "1-row chi-square totals"},
    "q_anomaly": {"nested_loop": "group-moment table broadcast"},
    "q_skyline": {"nested_loop": "1-row frontier aggregate"},
    "q_pack_sequences": {"nested_loop": "1-row window accounting"},
    "q_e2e_corpus": {"nested_loop": "1-row corpus-stats broadcast"},
    "q_dedup_embedding": {"nested_loop": "1-row hyperplane set"},
    "q_stratified_sample": {"nested_loop": "1-row per-stratum rates"},
    "q_sample_hash": {"nested_loop": "1-row sampling parameter"},
    "q_quality_score": {"nested_loop": "1-row corpus thresholds"},
    "q_trigram_typicality": {"nested_loop": "frequency-table broadcast"},
    "q_ivm_join": {"nested_loop": "1-row delta counts"},
    "q_table_diff": {"nested_loop": "1-row diff summary"},
    "q_format_roundtrip": {"nested_loop": "1-row checksum compare"},
    "q_pickle_roundtrip": {"nested_loop": "1-row store checksum"},
    "q_schema_evolution": {"nested_loop": "1-row generation counts"},
    "q_scalar_subquery": {"nested_loop": "decorrelated 1-row scalar"},
    "q_avg_subquery": {"nested_loop": "1-row threshold (Q17)"},
    "q_incremental_agg": {"nested_loop": "1-row delta/total compare"},
    "q_bloom_join": {"nested_loop": "1-row bitmap broadcast"},
    "q_dq_audit": {"nested_loop": "1-row per-table check vectors"},
    "q_profile": {"nested_loop": "1-row profile unpivot"},
    "q_winnow_dups": {"nested_loop": "1-row fingerprint params"},
    "q_dup_clusters": {"nested_loop": "1-row cluster summary"},
    "q_multimodal_meta": {"nested_loop": "1-row metadata summary"},
    "q_pagerank": {"nested_loop": "|nodes|-row rank-state broadcast"},
    "q_tfidf": {"nested_loop": "1-row corpus-size (N) for idf"},
    "q_bm25": {"nested_loop": "1-row (N, avgdl) stats"},
    "q_rare_terms": {"nested_loop": "1-row corpus-total for rarity"},
    "q_gap_fill": {"nested_loop": "bounded days x event-types densify grid"},
    "q_triangle_count": {"nested_loop": "two 1-row count aggregates"},
    "q_yoy_growth": {"single_partition_window": "|months|-row calendar"},
    "q_top_revenue": {"single_partition_window": "|suppliers|-row max"},
    "q_collocations_w": {},
}
# whole-table windows over DIMENSION-BOUNDED aggregates are fine; these
# queries declare them (see each docstring)
_WINDOW_OK = {
    "q_yoy_growth", "q_top_revenue", "q_collocations", "q_share_of_parent",
    "q_skyline", "q_bpe_merges", "q_pack_sequences", "q_heavy_hitters",
    "q_rare_terms", "q_vocab_coverage", "q_domain_mix", "q_cms_heavy",
    "q_incremental_agg", "q_winnow_dups", "q_centroid_label",
    "q_dup_clusters", "q_table_diff", "q_zorder_layout", "q_ewma_smooth",
    "q_transitions", "q_histogram",
}

FLAGS = {
    "cartesian": re.compile(r"CartesianProduct"),
    "nested_loop": re.compile(r"BroadcastNestedLoopJoin"),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit", shuffle_partitions=8)
    problems: list[str] = []
    for name, fn in QUERIES.items():
        try:
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001 - report, don't abort the audit
            problems.append(f"{name}: explain failed: {e}")
            continue
        for flag, rx in FLAGS.items():
            if rx.search(plan) and flag not in ALLOW.get(name, {}):
                problems.append(f"{name}: unexpected {flag}")
        if (
            "Window" in plan
            and "No Partition" not in plan  # warning text not in plan
            and re.search(r"^\(\d+\) Window", plan, flags=re.M)
            and not re.search(r"PartitionSpec|partitionBy", plan)
        ):
            # formatted plans show 'Window [..], [partition-cols], [order]'
            # in details; a window with NO partition columns shows empty
            # second bracket — flag unless declared dimension-bounded
            for m in re.finditer(r"^\(\d+\) Window\n(?:.*\n){0,6}", plan, re.M):
                block = m.group(0)
                if re.search(r"windowspecdefinition\(\w", block):
                    continue  # partitioned window
                if name not in _WINDOW_OK:
                    problems.append(f"{name}: single-partition window")
                break
    spark.stop()
    if problems:
        print("PLAN AUDIT FINDINGS:")
        for p in problems:
            print("  " + p)
        print(f"{len(problems)} finding(s)")
        return 1
    print(f"plan audit clean: {len(QUERIES)} queries, 0 findings")
    return 0


if __name__ == "__main__":
    sys.exit(main())
