"""Synthetic scale-up fixture generator for SCALING.md (round-5
verdict item #2): reproduces the driver testdata's schemas and
MARGINAL distributions (measured from /root/testdata/sf0.1 — see the
constants below) at arbitrary scale factors, so wall-time scaling
exponents can be measured across a data decade the driver fixtures
don't cover (sf0.3, sf1).

NOT the driver's generator and NOT bit-compatible with it: values are
drawn from the same families (unit-norm 64-dim embeddings; 30-word
uniform vocab documents with 5% mutated near-dup copies and ~0.16%
exact dups; zero-truncated-Poisson(4) lineitems per order; uniform
orderdates 1995..2001-08; exponential event values, 100 events/user)
but with this script's own seed stream. The validity check is
empirical: scripts/run_scaling.py compares synthetic-sf0.1 timings
against real-sf0.1 timings before trusting the larger scales.

Usage: python scripts/gen_scaledata.py SF [outdir]
       (outdir defaults to /tmp/scaledata/sf{SF})

Writes one parquet per table; region/nation are fixed dims copied
from the real sf0.1 fixture. Deterministic per (sf, seed).
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REAL = "/root/testdata/sf0.1"
SEED = 42

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.42, 0.145, 0.145, 0.145, 0.145]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "P", "F"]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
P_ADJ = ["large", "hot", "blue", "green", "small", "dark", "light", "red"]
P_NOUN = ["ring", "bolt", "gear", "cog", "wheel", "pin", "rod", "cap"]
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]

EPOCH_1995 = np.datetime64("1995-01-01")
ORDER_SPAN_D = 2404  # 1995-01-01 .. 2001-08-01
EV_T0 = np.datetime64("2024-01-01T00:00:00")
EV_SPAN_US = 30 * 86_400 * 1_000_000  # January 2024


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    # word counts chosen so char lengths land ~U(50, 560) with the
    # ~5.3 chars/word (incl. space) of the 30-word vocab
    n_words = rng.integers(10, 105, size=n)
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 10 and r < 0.0016:  # exact dup of an earlier doc
            texts.append(texts[rng.integers(0, i)])
            continue
        if i > 10 and r < 0.05 + 0.0016:  # near-dup: mutate 2 words
            w = texts[rng.integers(0, i)].split(" ")
            for _ in range(2):
                w[rng.integers(0, len(w))] = "dup"
            texts.append(" ".join(w))
            continue
        idx = rng.integers(0, len(VOCAB), size=int(n_words[i]))
        texts.append(" ".join(VOCAB[j] for j in idx))
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs.tolist()),
        "source": pa.array([f"src{int(x)}" for x in rng.integers(0, 20, size=n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n), pa.int32()),
    })


def gen_events(rng: np.random.Generator, n: int) -> pa.Table:
    n_users = max(15, n // 67)
    us = np.sort(rng.integers(0, EV_SPAN_US, size=n))
    ts = EV_T0 + us.astype("timedelta64[us]")
    value = np.round(np.minimum(rng.exponential(50.0, size=n), 560.0), 2)
    return pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
        "event_type": pa.array(rng.choice(EVENT_TYPES, size=n).tolist()),
        "value": pa.array(value, pa.float64()),
        "props": pa.array([f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, size=n)]),
    })


def gen_customer(rng: np.random.Generator, n: int) -> pa.Table:
    return pa.table({
        "c_custkey": pa.array(np.arange(n), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
        "c_nationkey": pa.array(rng.integers(0, 25, size=n), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, size=n), 2)),
        "c_mktsegment": pa.array(rng.choice(SEGMENTS, size=n).tolist()),
    })


def gen_supplier(rng: np.random.Generator, n: int) -> pa.Table:
    return pa.table({
        "s_suppkey": pa.array(np.arange(n), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
        "s_nationkey": pa.array(rng.integers(0, 25, size=n), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, size=n), 2)),
    })


def gen_part(rng: np.random.Generator, n: int) -> pa.Table:
    adj = rng.integers(0, len(P_ADJ), size=n)
    noun = rng.integers(0, len(P_NOUN), size=n)
    return pa.table({
        "p_partkey": pa.array(np.arange(n), pa.int64()),
        "p_name": pa.array([f"{P_ADJ[a]} {P_NOUN[b]}" for a, b in zip(adj, noun)]),
        "p_brand": pa.array([f"Brand#{int(x)}" for x in rng.integers(1, 26, size=n)]),
        "p_type": pa.array(rng.choice(P_TYPES, size=n).tolist()),
        "p_size": pa.array(rng.integers(1, 51, size=n), pa.int32()),
        "p_retailprice": pa.array(np.round(900.0 + (np.arange(n) % 1000) * 0.1, 2)),
    })


def gen_orders(rng: np.random.Generator, n: int, n_cust: int) -> pa.Table:
    days = rng.integers(0, ORDER_SPAN_D, size=n)
    odate = EPOCH_1995 + days.astype("timedelta64[D]")
    return pa.table({
        "o_orderkey": pa.array(np.arange(n), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, size=n), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(STATUSES, size=n).tolist()),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, size=n), 2)),
        "o_orderdate": pa.array(odate.astype("datetime64[us]"), pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(PRIORITIES, size=n).tolist()),
    }), days


def gen_lineitem(
    rng: np.random.Generator, order_days: np.ndarray, n_part: int, n_supp: int
) -> pa.Table:
    per_order = np.maximum(1, rng.poisson(4.0, size=len(order_days)))
    m = int(per_order.sum())
    okeys = np.repeat(np.arange(len(order_days)), per_order)
    odays = np.repeat(order_days, per_order)
    linenum = np.concatenate([np.arange(1, k + 1) for k in per_order])
    qty = rng.integers(1, 51, size=m).astype(np.float64)
    price = np.round(qty * rng.uniform(900, 2100, size=m), 2)
    ship = EPOCH_1995 + (odays + rng.integers(1, 96, size=m)).astype("timedelta64[D]")
    return pa.table({
        "l_orderkey": pa.array(okeys, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, size=m), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, size=m), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array(np.round(rng.integers(0, 11, size=m) * 0.01, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, size=m) * 0.01, 2)),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], size=m).tolist()),
        "l_linestatus": pa.array(rng.choice(["O", "F"], size=m).tolist()),
        "l_shipdate": pa.array(ship.astype("datetime64[us]"), pa.timestamp("us")),
    })


def generate(sf: float, outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    for name in ("region", "nation"):  # fixed dims
        shutil.copyfile(f"{REAL}/{name}.parquet", f"{outdir}/{name}.parquet")
    _write(outdir, "customer", gen_customer(rng, n_cust))
    _write(outdir, "supplier", gen_supplier(rng, n_supp))
    _write(outdir, "part", gen_part(rng, n_part))
    orders, days = gen_orders(rng, n_orders, n_cust)
    _write(outdir, "orders", orders)
    _write(outdir, "lineitem", gen_lineitem(rng, days, n_part, n_supp))
    _write(outdir, "events", gen_events(rng, n_events))
    _write(outdir, "documents", gen_documents(rng, n_docs))
    _write(outdir, "embeddings", gen_embeddings(rng, n_emb))


if __name__ == "__main__":
    sf = float(sys.argv[1])
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/scaledata/sf{sf}"
    print(f"generating sf={sf} -> {outdir}")
    generate(sf, outdir)
