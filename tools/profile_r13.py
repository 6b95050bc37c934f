"""Per-query stage-level profiler for the round-13 optimization pass.

Runs the requested headline queries once (after a sf0.001 warmup) with the
Spark event log enabled and one job description per query, then parses the
event log into a per-query breakdown:

- wall: end-to-end count() wall time (what bench.py measures),
- n_jobs / n_stages / n_tasks: scheduling volume,
- task_time: sum of executor run time across tasks (the real compute),
- stage_wall: sum of (stage completion - submission) — serialized stage time,
- gaps: wall - stage_wall  ≈ driver-side time (planning, broadcasts,
  AQE re-planning, job submission latency) — the overhead bucket that
  dominates tiny-SF measurements when it is large,
- shuffle_read/write bytes.

Usage: python tools/profile_r13.py [sf_dir] q_a q_b ...
Writes JSON to tools/bench_local/profile_r13.json (merging over runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from create_proposals_using_vector_db_public_spark.plans import QUERIES
from create_proposals_using_vector_db_public_spark.session import get_spark

EV_DIR = "/tmp/spark-events-r13"
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_local", "profile_r13.json"
)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    names = args or ["q_pagerank", "q_query_expansion", "q_dedup_simhash"]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    os.makedirs(EV_DIR, exist_ok=True)
    import shutil

    for f in os.listdir(EV_DIR):
        p = os.path.join(EV_DIR, f)
        shutil.rmtree(p) if os.path.isdir(p) else os.unlink(p)
    spark = get_spark(
        "profile_r13",
        shuffle_partitions=32,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EV_DIR,
            "spark.eventLog.compress": "false",
        },
    )
    warm = "/root/testdata/sf0.001"
    for name in names:
        try:
            QUERIES[name](spark, warm).count()
        except Exception:
            pass

    sc = spark.sparkContext
    walls: dict[str, float] = {}
    for name in names:
        sc.setJobDescription(f"r13:{name}")
        t0 = time.time()
        QUERIES[name](spark, sf_dir).count()
        walls[name] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
    spark.stop()

    # --- parse the event log -------------------------------------------------
    ev_files = []
    for root, _dirs, files in os.walk(EV_DIR):
        for f in files:
            if "appstatus" not in f:
                ev_files.append(os.path.join(root, f))
    job_query: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    per: dict[str, dict] = {
        n: {
            "wall": walls[n],
            "n_jobs": 0,
            "n_stages": 0,
            "n_tasks": 0,
            "task_time": 0.0,
            "stage_wall": 0.0,
            "shuffle_read_mb": 0.0,
            "shuffle_write_mb": 0.0,
            "stages": [],
        }
        for n in names
    }
    for path in ev_files:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                k = ev.get("Event")
                if k == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )
                    if desc.startswith("r13:"):
                        q = desc[4:]
                        if q in per:
                            job_query[ev["Job ID"]] = q
                            per[q]["n_jobs"] += 1
                            for sid in ev.get("Stage IDs", []):
                                stage_job[sid] = ev["Job ID"]
                elif k == "SparkListenerStageCompleted":
                    info = ev["Stage Info"]
                    sid = info["Stage ID"]
                    jid = stage_job.get(sid)
                    q = job_query.get(jid) if jid is not None else None
                    if q is None or "Completion Time" not in info:
                        continue
                    dur = (info["Completion Time"] - info["Submission Time"]) / 1e3
                    per[q]["n_stages"] += 1
                    per[q]["n_tasks"] += info.get("Number of Tasks", 0)
                    per[q]["stage_wall"] += dur
                    per[q]["stages"].append(
                        {
                            "id": sid,
                            "name": info.get("Stage Name", "")[:60],
                            "sec": round(dur, 3),
                            "tasks": info.get("Number of Tasks", 0),
                        }
                    )
                elif k == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    jid = stage_job.get(sid)
                    q = job_query.get(jid) if jid is not None else None
                    if q is None:
                        continue
                    m = ev.get("Task Metrics") or {}
                    per[q]["task_time"] += m.get("Executor Run Time", 0) / 1e3
                    srm = m.get("Shuffle Read Metrics") or {}
                    swm = m.get("Shuffle Write Metrics") or {}
                    per[q]["shuffle_read_mb"] += (
                        srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
                    ) / 1e6
                    per[q]["shuffle_write_mb"] += swm.get(
                        "Shuffle Bytes Written", 0
                    ) / 1e6

    for n, d in per.items():
        d["task_time"] = round(d["task_time"], 3)
        d["stage_wall"] = round(d["stage_wall"], 3)
        d["gap"] = round(d["wall"] - d["stage_wall"], 3)
        d["shuffle_read_mb"] = round(d["shuffle_read_mb"], 2)
        d["shuffle_write_mb"] = round(d["shuffle_write_mb"], 2)
        d["stages"].sort(key=lambda s: -s["sec"])
        d["stages"] = d["stages"][:12]

    prev = {}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            prev = json.load(fh)
    prev.update({n: per[n] for n in names})
    with open(OUT, "w") as fh:
        json.dump(prev, fh, indent=1)
    for n in names:
        d = per[n]
        print(
            f"{n}: wall={d['wall']}s jobs={d['n_jobs']} stages={d['n_stages']} "
            f"tasks={d['n_tasks']} stage_wall={d['stage_wall']}s "
            f"task_time={d['task_time']}s gap={d['gap']}s "
            f"shuf r/w={d['shuffle_read_mb']}/{d['shuffle_write_mb']}MB"
        )
        for s in d["stages"][:6]:
            print(f"   stage {s['id']} {s['sec']}s x{s['tasks']}  {s['name']}")


if __name__ == "__main__":
    main()
