"""Price a near-dup detector configuration on the planted-truth harness.

Reproduces the SCALE.md detector-pricing tables for configurations that
are not registered queries (the registered evals pin the defaults:
q_minhash_eval 8/2, q_minhash_wide_eval 16/4, q_simhash_eval 64-bit).
Non-default knobs — e.g. the 128-bit SimHash width or the full 128/16
MinHash production config — run through the exact same corpus builder
and exact-Jaccard-verified truth (`plans/dedup_queries._pair_eval`), so
a printed precision/recall row here is measured on identical ground
truth to the oracle-checked defaults.

Usage:
  python tools/price_dedup.py simhash --bits 128 --hamming 3 SF_DIR [SF_DIR ...]
  python tools/price_dedup.py minhash --hashes 128 --bands 16 SF_DIR [SF_DIR ...]

Each SF dir gets one warm pass (plan compile + cache fill) and one timed
pass, matching the SCALE.md convention (warm, isolated). The timed pass
reports the detector and the evaluation harness SEPARATELY:
detector_wall materializes the emitted pair stream alone (count — the
number comparable to a bench timing), then eval_wall prices the
exact-Jaccard truth join on top. Rows recorded before round 7 (the
SCALE.md round-6 128-bit SimHash table) printed a single warm_wall that
summed both — noted there, not comparable to detector-only timings.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from create_proposals_using_vector_db_public_spark.operators import dedup as D  # noqa: E402
from create_proposals_using_vector_db_public_spark.plans import dedup_queries as DQ  # noqa: E402
from create_proposals_using_vector_db_public_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("detector", choices=["simhash", "minhash"])
    ap.add_argument("sf_dirs", nargs="+")
    ap.add_argument("--bits", type=int, default=D.SIMHASH_BITS)
    ap.add_argument("--hamming", type=int, default=3)
    ap.add_argument("--hashes", type=int, default=D.MINHASH_NUM_HASHES)
    ap.add_argument("--bands", type=int, default=D.MINHASH_BANDS)
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()

    spark = get_spark("price_dedup", shuffle_partitions=32)
    for sf_dir in args.sf_dirs:
        corpus = DQ._corpus(spark, sf_dir)
        n_docs = corpus.count()
        det_dt = eval_dt = 0.0
        row = None
        for _ in range(2):  # warm then timed; keep the second
            t0 = time.time()
            if args.detector == "simhash":
                emitted = D.simhash_dedup_pairs(
                    corpus, id_col="doc_id", text_col="text",
                    max_hamming=args.hamming, bits=args.bits,
                ).select("id_a", "id_b")
            else:
                emitted = D.minhash_dedup_pairs(
                    corpus, id_col="doc_id", text_col="text",
                    threshold=args.threshold,
                    num_hashes=args.hashes, bands=args.bands,
                ).select("id_a", "id_b")
            # detector cost alone: PERSIST then materialize the pair
            # stream (count — nothing collected) BEFORE starting the
            # planted-truth evaluation, so detector_wall is comparable
            # to a bench/SCALE.md detector timing and the evaluation
            # below reads the cached pairs instead of re-running the
            # detector pipeline. eval_wall therefore prices the harness
            # itself (exact-Jaccard truth join + metric collect) alone —
            # never added to, and never re-including, the detector's
            # number. (The pair stream is tiny: ~2e4 rows at 500k docs.)
            emitted = emitted.persist()
            emitted.count()
            det_dt = time.time() - t0
            t1 = time.time()
            row = DQ._pair_eval(spark, sf_dir, corpus, emitted).collect()[0]
            eval_dt = time.time() - t1
            emitted.unpersist(blocking=False)
        cfg = (
            f"bits={args.bits} hamming<={args.hamming}"
            if args.detector == "simhash"
            else f"hashes={args.hashes} bands={args.bands} j>={args.threshold}"
        )
        print(
            f"RESULT {args.detector} {cfg} {sf_dir} docs={n_docs} "
            f"emitted={row['n_emitted']} precision={row['precision']} "
            f"truth={row['n_truth']} found={row['n_found']} "
            f"recall={row['recall']} detector_wall={det_dt:.1f}s "
            f"eval_wall={eval_dt:.1f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
