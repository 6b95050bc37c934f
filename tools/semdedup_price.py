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
kept id-sets of all configs are collected (a few hundred ids each — the
only collect in the tool, of a final result, outside the timed region)
and the pairwise quality deltas recorded: kept-set symmetric difference,
kept-identity Jaccard (the discriminating statistic), plus dropped-set
precision/recall (base-rate dominated — reported for continuity with the
round-9 verdict's requested form, not as the headline).

Round 11 adds the THIRD arm: sqrt (ncent = max(32, floor(0.95*sqrt(n))),
the registered q_semdedup_sqrt config) — the measurement that validates
or refutes the round-10 cost model's predicted unbudgeted optimum
(431 s at sf30 from T(n,c) ~= a*n*c + p*n^2/c).

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
    _SEMDEDUP_SQRT_COEF,
    _SEMDEDUP_TAU,
    _semdedup_ncent,
)
from create_proposals_using_vector_db_public_spark.session import get_spark  # noqa: E402
from create_proposals_using_vector_db_public_spark.sources import load_table  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def run_config(
    spark,
    sf_dir: str,
    cap: int | None,
    sqrt_coef: float | None,
    collect_kept: bool,
):
    """One stage-decomposed SemDeDup run; returns the measurement dict
    (and the kept id set when collect_kept)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    ncent = _semdedup_ncent(n, cap, sqrt_coef)
    cents = emb.filter(F.col("vec_id") < ncent).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    t0 = time.time()
    assigned = K.ivf_assign(emb.select("vec_id", "embedding"), cents).persist()
    assigned.count()
    t_assign = time.time() - t0
    # pairs_sec times count() at EVERY SF (round-10 ADVICE: the last point
    # of the scaling curve used to wrap a collect() instead, giving the
    # curve's final point different measurement semantics than the rest);
    # the kept-id collect for the quality delta happens OUTSIDE the timed
    # region, off the already-computed persisted assignment.
    t1 = time.time()
    # kept_df is persisted BEFORE the timed count (round-11 ADVICE): the
    # quality-delta collect at the largest SF otherwise re-executes the
    # whole pair stage — ~minutes of duplicated wall per collecting arm
    # at sf30. Persisting in EVERY arm at EVERY SF keeps the timed
    # count()'s semantics uniform across the sweep (the round-10 lesson:
    # never give one point of the curve different measurement semantics);
    # the cache write itself is negligible — kept_df is the narrow
    # (vec_id, centroid_id) survivor set, ~1k rows at sf30.
    kept_df = D.semdedup_keep(assigned, threshold=_SEMDEDUP_TAU).persist()
    kept = kept_df.count()
    t_pairs = time.time() - t1
    kept_ids = None
    if collect_kept:
        kept_ids = {r["vec_id"] for r in kept_df.collect()}
    kept_df.unpersist()
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
            if only not in ("default", "capped", "sqrt"):
                raise SystemExit("--only must be default, capped, or sqrt")
        elif a.startswith("--"):
            raise SystemExit(f"unrecognized flag {a!r}; --out=FILE --only=CFG")
    if not args:
        raise SystemExit(__doc__)
    sf_dirs = args

    spark = get_spark("semdedup_price", shuffle_partitions=32)
    result: dict = {
        "probe": "bounded/sqrt-ncent SemDeDup pricing (one host window, "
        "ascending SFs, persisted stage boundary; duplicate sub-knee arms "
        "are same-window controls; uniform count() stage timing)",
        # Measurement-semantics version (round-12 ADVICE): the round-12
        # kept_df-persist change moved the cache-materialization write
        # INSIDE the timed pairs_sec region, so pairs timings from this
        # tool are not strictly comparable with the pre-round-12 committed
        # records (semdedup_price_r10/r11.json carry no such field and
        # predate the boundary). Bump this string whenever the timed
        # region's semantics change again, so cross-round comparisons can
        # detect the boundary mechanically instead of by reading comments.
        "timing_semantics": "persisted-kept r12",
        "cap": _SEMDEDUP_NCENT_CAP,
        "sqrt_coef": _SEMDEDUP_SQRT_COEF,
        "tau": _SEMDEDUP_TAU,
        "configs": {},
    }
    kept_sets: dict = {}
    last = sf_dirs[-1]
    arms = (
        ("default", None, None),
        ("capped", _SEMDEDUP_NCENT_CAP, None),
        ("sqrt", None, _SEMDEDUP_SQRT_COEF),
    )
    for sf_dir in sf_dirs:
        tag = os.path.basename(sf_dir.rstrip("/"))
        for cname, cap, coef in arms:
            if only is not None and cname != only:
                continue
            m, kept_ids = run_config(
                spark, sf_dir, cap, coef, collect_kept=sf_dir == last
            )
            result["configs"].setdefault(cname, {})[tag] = m
            if kept_ids is not None:
                kept_sets[cname] = (kept_ids, m["n"])
            print(f"{tag} {cname}: {json.dumps(m)}", flush=True)

    # quality delta at the largest SF, every config pair that ran: kept
    # symmetric difference + kept-identity Jaccard (the discriminating
    # statistic — dropped precision/recall is base-rate dominated when
    # both configs drop ~all of the corpus, round-10 ADVICE) + dropped-set
    # precision/recall of the SECOND config vs the first
    pairs = [
        (a, b)
        for i, a in enumerate(kept_sets)
        for b in list(kept_sets)[i + 1:]
    ]
    for ca, cb in pairs:
        (ka, n), (kb, n2) = kept_sets[ca], kept_sets[cb]
        assert n == n2
        union = len(ka | kb)
        inter_dropped = n - union  # |Da & Db| = n - |Ka u Kb|
        da, db = n - len(ka), n - len(kb)
        result.setdefault("quality_delta_at_largest", {})[f"{cb}_vs_{ca}"] = {
            "sf_dir": last,
            f"kept_{ca}": len(ka),
            f"kept_{cb}": len(kb),
            "kept_symmetric_diff": len(ka ^ kb),
            "kept_jaccard": round(len(ka & kb) / union, 6) if union else 1.0,
            f"dropped_{ca}": da,
            f"dropped_{cb}": db,
            "dropped_precision": round(inter_dropped / db, 6) if db else 1.0,
            "dropped_recall": round(inter_dropped / da, 6) if da else 1.0,
        }

    # measured per-unit stage costs at the largest SF -> sqrt(n) prediction.
    # Round-10 ADVICE: derive unit costs from EVERY arm that ran (each
    # config's n*c and n^2/c units are known exactly), average them, and
    # report the per-arm values so cross-arm spread is visible instead of
    # asserting a single-arm number.
    try:
        tag = os.path.basename(last.rstrip("/"))
        per_arm_a, per_arm_p = {}, {}
        for cname, cfg in result["configs"].items():
            if tag not in cfg:
                continue
            m = cfg[tag]
            n, ncent = m["n"], m["ncent"]
            per_arm_a[cname] = m["assign_sec"] / (n * ncent)
            per_arm_p[cname] = m["pairs_sec"] / (n * n / ncent)
        a_unit = sum(per_arm_a.values()) / len(per_arm_a)
        p_unit = sum(per_arm_p.values()) / len(per_arm_p)
        n = result["configs"][next(iter(per_arm_a))][tag]["n"]
        opt = int(math.sqrt(n * p_unit / a_unit))
        result["sqrt_n_prediction_at_largest"] = {
            "unit_costs_per_arm": {
                c: {"assign_per_unit": round(per_arm_a[c], 10),
                    "pairs_per_unit": round(per_arm_p[c], 10)}
                for c in per_arm_a
            },
            "assign_per_unit_avg": round(a_unit, 10),
            "pairs_per_unit_avg": round(p_unit, 10),
            "ncent_opt": opt,
            "predicted_assign_sec": round(a_unit * n * opt, 1),
            "predicted_pairs_sec": round(p_unit * n * n / opt, 1),
            "note": "c* = sqrt(n*p/a) from per-unit stage costs averaged "
            "across every arm in this window; compare against the sqrt "
            "arm's measured row when it ran (q_semdedup_sqrt pins the "
            "registered coefficient at 0.95)",
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
