"""Price the SemDeDup centroid-count configurations, stage-decomposed.

The round-9 sf30 probe proved the paper-proportional default
(ncent = max(32, n // 625), the shape Abbas et al. 2023 themselves run —
clusters proportional to corpus) makes the exact brute-force ASSIGNMENT
stage n x ncent = n^2/625: quadratic total compute (measured stage ratio
8.66x for 3x data, `tools/bench_local/spot_sf30_diag_r9.json`). The
round-9 verdict ordered the bounded configuration priced as a measured
operating point, not prose. This tool is that measurement:

For each SF dir (run them ascending, all in ONE host window — the only
way scaling exponents survive this box's documented 1.1-1.5x day-to-day
drift), BOTH configs run with a persisted stage boundary:

  stage 1 (assignment): `ivf_assign` (broadcast centroids, map-side
          argmin) materialized via persist + count;
  stage 2 (pairs):      `semdedup_keep` (within-cluster cosine join)
          on the persisted assignment, materialized via count.

Configs whose ncent coincide (everywhere at or below the knee
n = cap * 625 = 200k vectors) still both run — the duplicate arm is a
free same-window control on measurement noise. At the LARGEST sf_dir the
kept id-sets of both configs are collected (a few hundred ids — the only
collect in the tool, of a final result) and the quality delta recorded:
kept-set symmetric difference plus precision/recall of the capped
config's DROPPED set against the default's dropped set (the round-9
verdict's requested form).

What the cap buys and what it costs (both measured, neither hidden):
assignment compute is pinned at <= n * cap (alpha = 1 in n from the knee
on), while pair compute above the knee grows as n^2/cap instead of the
default's 625n. The cap is a compute-budget dial; with no budget pinned,
total work n*ncent + n^2/ncent is minimized at ncent ~ sqrt(n) (total
~ n^1.5 — the exact-semantics lower envelope of this one-level family:
unit-norm embeddings make Elkan-style norm pruning vacuous, and an
approximate router changes near-tie assignments, breaking the DuckDB
oracle). The JSON therefore also reports the sqrt(n) prediction derived
from the measured per-unit stage costs, so SCALE.md can state the
unbudgeted optimum without registering a third config.

Usage:
  python tools/semdedup_price.py SF_DIR [SF_DIR ...] [--out FILE]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from create_proposals_using_vector_db_public_spark.operators import dedup as D  # noqa: E402
from create_proposals_using_vector_db_public_spark.operators import knn as K  # noqa: E402
from create_proposals_using_vector_db_public_spark.plans.curation_queries import (  # noqa: E402
    _SEMDEDUP_NCENT_CAP,
    _SEMDEDUP_TAU,
    _semdedup_ncent,
)
from create_proposals_using_vector_db_public_spark.session import get_spark  # noqa: E402
from create_proposals_using_vector_db_public_spark.sources import load_table  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def run_config(spark, sf_dir: str, cap: int | None, collect_kept: bool):
    """One stage-decomposed SemDeDup run; returns the measurement dict
    (and the kept id set when collect_kept)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    ncent = _semdedup_ncent(n, cap)
    cents = emb.filter(F.col("vec_id") < ncent).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    t0 = time.time()
    assigned = K.ivf_assign(emb.select("vec_id", "embedding"), cents).persist()
    assigned.count()
    t_assign = time.time() - t0
    t1 = time.time()
    kept_df = D.semdedup_keep(assigned, threshold=_SEMDEDUP_TAU)
    kept_ids = None
    if collect_kept:
        kept_rows = kept_df.collect()
        kept = len(kept_rows)
        kept_ids = {r["vec_id"] for r in kept_rows}
    else:
        kept = kept_df.count()
    t_pairs = time.time() - t1
    assigned.unpersist()
    return {
        "n": n,
        "ncent": ncent,
        "assign_sec": round(t_assign, 1),
        "pairs_sec": round(t_pairs, 1),
        "total_sec": round(t_assign + t_pairs, 1),
        "kept": kept,
    }, kept_ids


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = None
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        elif a.startswith("--only="):
            # isolate one config in a fresh JVM — the adjudication run for
            # wall-vs-compute gaps (a 450 s arm churns the heap the next
            # arm inherits; an isolated re-run separates engine cost from
            # JVM history, the q_graph_degree-precedent method)
            only = a.split("=", 1)[1]
            if only not in ("default", "capped"):
                raise SystemExit("--only must be default or capped")
        elif a.startswith("--"):
            raise SystemExit(f"unrecognized flag {a!r}; --out=FILE --only=CFG")
    if not args:
        raise SystemExit(__doc__)
    sf_dirs = args

    spark = get_spark("semdedup_price", shuffle_partitions=32)
    result: dict = {
        "probe": "round-10 bounded-ncent SemDeDup pricing (one host window, "
        "ascending SFs, persisted stage boundary; duplicate sub-knee arms "
        "are same-window controls)",
        "cap": _SEMDEDUP_NCENT_CAP,
        "tau": _SEMDEDUP_TAU,
        "configs": {},
    }
    kept_sets: dict = {}
    last = sf_dirs[-1]
    for sf_dir in sf_dirs:
        tag = os.path.basename(sf_dir.rstrip("/"))
        for cname, cap in (("default", None), ("capped", _SEMDEDUP_NCENT_CAP)):
            if only is not None and cname != only:
                continue
            m, kept_ids = run_config(spark, sf_dir, cap, collect_kept=sf_dir == last)
            result["configs"].setdefault(cname, {})[tag] = m
            if kept_ids is not None:
                kept_sets[cname] = (kept_ids, m["n"])
            print(f"{tag} {cname}: {json.dumps(m)}", flush=True)

    # quality delta at the largest SF: kept symmetric difference +
    # precision/recall of the capped DROPPED set vs the default's
    if len(kept_sets) == 2:
        (kd, n), (kc, n2) = kept_sets["default"], kept_sets["capped"]
        assert n == n2
        union = len(kd | kc)
        inter_dropped = n - union  # |Dd & Dc| = n - |Kd u Kc|
        dd, dc = n - len(kd), n - len(kc)
        result["quality_delta_at_largest"] = {
            "sf_dir": last,
            "kept_default": len(kd),
            "kept_capped": len(kc),
            "kept_symmetric_diff": len(kd ^ kc),
            "kept_jaccard": round(len(kd & kc) / union, 6) if union else 1.0,
            "dropped_default": dd,
            "dropped_capped": dc,
            "dropped_precision_capped_vs_default": round(inter_dropped / dc, 6)
            if dc
            else 1.0,
            "dropped_recall_capped_vs_default": round(inter_dropped / dd, 6)
            if dd
            else 1.0,
        }

    # measured per-unit stage costs at the largest SF -> sqrt(n) prediction
    try:
        md = result["configs"]["default"][os.path.basename(last.rstrip("/"))]
        n, ncent = md["n"], md["ncent"]
        assign_per_ndotk = md["assign_sec"] / (n * ncent)
        pairs_per_pair = md["pairs_sec"] / (n * n / ncent)
        opt = int(math.sqrt(n))
        result["sqrt_n_prediction_at_largest"] = {
            "ncent_opt": opt,
            "predicted_assign_sec": round(assign_per_ndotk * n * opt, 1),
            "predicted_pairs_sec": round(pairs_per_pair * n * n / opt, 1),
            "note": "derived from the default config's measured per-unit "
            "stage costs at the largest SF; the unbudgeted compute-optimal "
            "setting of the SAME knob (total ~ n^1.5), not a third config",
        }
    except (KeyError, ZeroDivisionError):
        pass

    blob = json.dumps(result, indent=1)
    print(blob)
    if out_path:
        with open(out_path, "w") as f:
            f.write(blob + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
