"""Result-cardinality audit across scale factors.

Runs every registered query at two SFs and reports the result-row-count
ratio against the data-size ratio. A query whose RESULT grows faster than
its INPUT (superlinear ratio) is a latent scale bug: at 100 TB it emits an
unboundedly large answer (the classic failure is an unblocked pair join).
Fixed-size results (top-k, per-group rollups over bounded key spaces)
ratio ~1 and are fine.

Usage:
    python tools/cardinality_audit.py [small_sf_dir big_sf_dir] [name ...]

Defaults to sf0.01 -> sf0.1 (10x data) and all registered queries.
Exit code 1 if any query exceeds the superlinear threshold (ratio > data
ratio * slack); the offender list prints either way.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from create_proposals_using_vector_db_public_spark.plans import QUERIES
from create_proposals_using_vector_db_public_spark.session import get_spark

SLACK = 1.5  # result may grow up to data_ratio * SLACK before flagging


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dirs = [a for a in args if "/" in a]
    names = [a for a in args if "/" not in a]
    small = dirs[0] if len(dirs) > 0 else "/root/testdata/sf0.01"
    big = dirs[1] if len(dirs) > 1 else "/root/testdata/sf0.1"
    sf = lambda d: float(d.rstrip("/").rsplit("sf", 1)[-1])  # noqa: E731
    data_ratio = sf(big) / sf(small)
    todo = names or list(QUERIES)

    spark = get_spark("cardinality_audit", shuffle_partitions=32)
    flagged: list[tuple[str, int, int, float]] = []
    for name in todo:
        try:
            n_small = QUERIES[name](spark, small).count()
            n_big = QUERIES[name](spark, big).count()
        except Exception as e:  # audit must not die on one query
            print(f"err  {name}: {type(e).__name__}: {e}")
            continue
        # zero baseline: ANY rows appearing at the big SF is unbounded
        # growth relative to 0 — flag it (inf), don't mask it as x1
        ratio = (
            (n_big / n_small)
            if n_small
            else (float("inf") if n_big else 1.0)
        )
        line = f"{name}: {n_small} -> {n_big} rows (x{ratio:.1f})"
        if ratio > data_ratio * SLACK:
            flagged.append((name, n_small, n_big, ratio))
            print("FLAG " + line)
        else:
            print("ok   " + line)
    spark.stop()

    print(
        f"\n{len(todo) - len(flagged)}/{len(todo)} within x"
        f"{data_ratio * SLACK:.0f} (data x{data_ratio:.0f}, slack {SLACK})"
    )
    if flagged:
        print("superlinear results:")
        for name, a, b, r in flagged:
            print(f"  {name}: {a} -> {b} (x{r:.1f})")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
