"""Dump formatted physical plans for the headline queries → tools/plans/.

Used to verify, per SURVEY §4 / the scale mandate:
- predicate pushdown + column pruning reach the parquet scan
  (PushedFilters / ReadSchema),
- small sides broadcast (BroadcastHashJoin / BroadcastExchange),
- aggregations are partial+final (HashAggregate x2),
- top-k compiles to TakeOrderedAndProject (no global sort),
- WholeStageCodegen spans cover the hot expressions.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from create_proposals_using_vector_db_public_spark.plans import QUERIES
from create_proposals_using_vector_db_public_spark.session import get_spark

NAMES = sys.argv[2:] or [
    "q_scan_filter",
    "q_agg_basic",
    "q_join_shuffle",
    "q_join_broadcast",
    "q_topk_per_group",
    "q_knn",
    "q_knn_join",
    "q_dedup_minhash",
    "q_tfidf",
    "q_stream_window",
    # round-2 batch 5
    "q_exists_corr",
    "q_avg_subquery",
    "q_interval_overlap",
    "q_cms_heavy",
    "q_domain_mix",
    "q_ols",
    # round-2 batch 6
    "q_top_revenue",
    "q_large_orders",
    "q_min_cost_supplier",
    "q_market_share",
    "q_collocations",
    "q_bpe_merges",
    "q_dq_audit",
    # round-2 batch 8
    "q_gopher_quality",
    "q_line_dedup",
    "q_semdedup",
    "q_ngram_diversity",
    "q_rrf_fusion",
    "q_query_expansion",
    "q_k_anonymity",
    "q_event_pattern",
    "q_bpe_encode",
    "q_prefix_complete",
    "q_variant_json",
    # round-3 additions
    "q_snapshot_read",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain", shuffle_partitions=8)
    for name in NAMES:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}")
    spark.stop()


if __name__ == "__main__":
    main()
