#!/usr/bin/env python3
"""Generate a driver-shaped synthetic dataset at an arbitrary scale factor.

The driver ships read-only parquet at sf0.001/0.01/0.1 (TESTDATA.md); scale
experiments above that need local data. This generator mirrors the driver
tables' schemas and measured distributions (sampled from
/root/testdata/sf0.1 — see the per-table notes) so plan shapes, join
cardinalities, and selectivities carry over:

  region(5) nation(25)  — fixed dimension tables
  customer  150k*sf      supplier  10k*sf     part  200k*sf
  orders    1.5M*sf      lineitem  ~6M*sf (1-7 lines/order, avg ~4)
  events    1M*sf (ts-sorted over 30 days; value ~ Exp(mean 50))
  documents 50k*sf (word salad over a Heaps'-law vocabulary —
             31 words at <=5000 docs (the driver fixture's own vocab),
             V = 31*sqrt(n/5000) above; ~0.16% planted exact dups)
  embeddings 20k*sf (64-dim unit float32, 10 labels, weak label signal:
             intra-label mean cosine ~0.004 as in the driver data)

Content differs from the driver's (its seed/generator are unknown) — that is
fine for the scale proof: parity.py compares Spark vs DuckDB on the SAME
parquet, whichever files they are.

Usage: python tools/gen_sf.py SF OUTDIR   (e.g. 1 /root/repo/.localdata/sf1)
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
])
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
# exactly the driver fixture's name vocabulary (sampled from sf0.1) so
# name-predicate queries (e.g. q_product_profit's %widget%) stay non-vacuous
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = [0.41, 0.15, 0.15, 0.145, 0.145]

DAY_US = 86_400_000_000  # one day in microseconds
ORDER_MIN = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
ORDER_DAYS = (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype(int)
SHIP_MIN = np.datetime64("1995-01-02").astype("datetime64[us]").astype(np.int64)
SHIP_DAYS = (np.datetime64("2001-11-04") - np.datetime64("1995-01-02")).astype(int)
EVENT_MIN = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
EVENT_SPAN_US = 30 * DAY_US


def _ts(col_us: np.ndarray) -> pa.Array:
    return pa.array(col_us, type=pa.timestamp("us"))


def _write(out: str, name: str, table: pa.Table, only=None) -> None:
    if only is not None and name not in only:
        return
    path = os.path.join(out, f"{name}.parquet")
    # Small row groups: a single fat row group makes the file
    # byte-splittable in name only — every Spark scan split except the one
    # containing the row-group start is empty, so compute-dense projections
    # serialize onto one core (measured at sf10: 19 empty tasks + 1 doing
    # all 500k docs' n-grams). Real 100 TB tables are thousands of files /
    # row groups; the fixture should be splittable the same way. The
    # text/vector tables get 8k-row groups (their per-row COMPUTE dwarfs
    # their bytes — tokenize/n-gram/dot chains), the relational tables 64k.
    rg = 1 << 13 if name in ("documents", "embeddings") else 1 << 16
    pq.write_table(table, path, row_group_size=rg)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def generate(sf: float, out: str, seed: int = 42, only=None) -> None:
    """only=None writes every table; only={names} still REPLAYS the full
    RNG draw sequence (so any subset is bit-identical to a full run) but
    skips the parquet writes for the other tables."""
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_user = int(150_000 * sf / 10)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }), only)
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }), only)

    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }), only)

    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    }), only)

    # p_retailprice follows the driver's 900 + (key % 1000)/10 ramp
    pk = np.arange(n_part)
    _write(out, "part", pa.table({
        "p_partkey": pa.array(pk, pa.int64()),
        "p_name": [f"{ADJS[rng.integers(0, len(ADJS))]} "
                   f"{NOUNS[rng.integers(0, len(NOUNS))]}" for _ in range(n_part)],
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(0, 25, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (pk % 1000) / 10.0, 1),
    }), only)

    odate_us = ORDER_MIN + rng.integers(0, ORDER_DAYS + 1, n_ord) * DAY_US
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts(odate_us),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }), only)

    # lineitem: 1-7 lines per order (avg ~4, matching the driver's 4.08);
    # shipdate independent-uniform over its own shifted window (the driver
    # data shows gap range -2399..+2496 days, mean +48 — i.e. independence).
    lines = rng.integers(1, 8, n_ord)
    n_li = int(lines.sum())
    l_orderkey = np.repeat(np.arange(n_ord), lines)
    l_linenumber = np.concatenate([np.arange(1, k + 1) for k in lines]) \
        if n_ord else np.array([], dtype=np.int64)
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts(SHIP_MIN + rng.integers(0, SHIP_DAYS + 1, n_li) * DAY_US),
    }), only)

    ev_ts = np.sort(EVENT_MIN + rng.integers(0, EVENT_SPAN_US, n_ev))
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": _ts(ev_ts),
        "user_id": pa.array(rng.integers(0, n_user, n_ev), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
    }), only)

    # Heaps'-law vocabulary growth: V(n) = 31*sqrt(n/5000), anchored so
    # every SF at or below the driver's sf0.1 (5000 docs) reproduces the
    # 31-word fixture vocabulary AND the identical RNG draw sequence. A
    # FIXED vocab saturates the 3-word-gram space as the corpus grows: by
    # sf10 (500k docs) every shingle appears in hundreds of documents, so
    # DF-capped detectors (winnowing's stop-gram guard) correctly treat
    # ALL fingerprints as boilerplate and the planted-dup fixtures go
    # vacuous (0 emitted pairs — measured in the round-4 sf10 proof).
    # Real corpora grow vocabulary with size (Heaps' law, beta~0.5);
    # mirroring that keeps gram document-frequency — and therefore
    # detector discrimination — scale-invariant.
    n_vocab = max(len(VOCAB), round(len(VOCAB) * (n_doc / 5000.0) ** 0.5))
    vocab = VOCAB if n_vocab == len(VOCAB) else np.concatenate(
        [VOCAB, np.array([f"lex{i:05d}" for i in range(n_vocab - len(VOCAB))])]
    )
    nwords = rng.integers(10, 101, n_doc)
    flat = vocab[rng.integers(0, n_vocab, int(nwords.sum()))]
    bounds = np.concatenate([[0], np.cumsum(nwords)])
    texts = [" ".join(flat[bounds[i]:bounds[i + 1]]) for i in range(n_doc)]
    # plant ~0.16% exact duplicates of earlier docs (driver sf0.1: 4992/5000)
    for i in rng.choice(np.arange(1, n_doc), max(1, int(0.0016 * n_doc)),
                        replace=False):
        texts[i] = texts[rng.integers(0, i)]
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(LANGS[rng.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array([f"src{i % 20}" for i in range(n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), only)

    # weak label signal: v = noise + 0.5*center[label]; intra-label mean
    # cosine = a^2/(64+a^2) ~ 0.004, matching the measured driver value
    labels = rng.integers(0, 10, n_emb)
    centers = rng.normal(0, 1, (10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = rng.normal(0, 1, (n_emb, 64)) + 0.5 * centers[labels]
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), only)

    with open(os.path.join(out, "MANIFEST.json"), "w") as f:
        json.dump({"sf": sf, "seed": seed, "generator": "tools/gen_sf.py",
                   "lineitem_rows": n_li}, f)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--only")]
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    sf = float(args[0]) if args else 1.0
    out = args[1] if len(args) > 1 else f"/root/repo/.localdata/sf{args[0]}"
    print(f"generating sf={sf} -> {out}" + (f" (only {sorted(only)})" if only else ""))
    generate(sf, out, only=only)
