"""Deterministic scale-experiment data generator.

Reproduces the driver's synthetic star schema (TESTDATA.md — tables
region nation customer supplier part orders lineitem events documents
embeddings) at scale factors the driver doesn't ship (sf1, sf10), so
the bench can measure how query wall-time scales across two decades of
data instead of arguing from plan shapes.

Schema, value domains and distributions were sampled from the driver's
read-only sf0.1 parquet (same column names/types, same categorical
domains, same date ranges, same 31-word document vocabulary, same
10-centroid unit-norm embedding structure). Row counts scale linearly
with sf exactly as the driver's do (lineitem ~6M/sf, orders 1.5M/sf,
customer 150k/sf, part 200k/sf, supplier 10k/sf, events 1M/sf,
documents 50k/sf); embeddings follow the driver's observed x4/decade
curve (500@sf0.01, 2000@sf0.1 -> 8000@sf1, 32000@sf10).

Not byte-identical to the driver's generator (seed/stream unknown) —
this data is for SCALING measurement, not oracle correctness, which
stays pinned at the driver's sf0.01. Near-dup structure is injected
explicitly (0.5%% exact dupes + 1%% 2-word-mutated near-dups) so dedup
candidate-count telemetry has signal at every sf.

Writes chunked parquet (1M-row groups) so Spark gets real input splits.

Usage: python tools/gen_scale_data.py <sf> <out_dir>
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array(
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window".split()
)
PNAME_ADJ = np.array("large hot blue old cold red new small".split())
PNAME_NOUN = np.array("ring bolt plate rod widget anvil gizmo gear".split())
PTYPE = np.array("ECONOMY PROMO MEDIUM SMALL LARGE STANDARD".split())
MKTSEG = np.array("AUTOMOBILE HOUSEHOLD BUILDING FURNITURE MACHINERY".split())
OPRIO = np.array(
    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
)
EVENT_TYPES = np.array("click view purchase signup error".split())
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

CHUNK = 2_000_000
# 250k-row groups: a row group is Spark's minimum input split, so a
# 1M-row table written as ONE group serializes its scan on one core no
# matter how many executors exist (measured: xml_parse 11.8s at sf1 with
# a 1-group events table vs 5.0s at sf10 with 10 groups). 250k rows
# ~ 8-30 MB per group keeps every table >= 4-way parallel at sf1 while
# staying far above the tiny-row-group metadata overhead regime.
ROW_GROUP = 250_000

DAY_US = 86_400_000_000  # microseconds per day


def _ts_us(base_day: str, day_offsets_us: np.ndarray) -> pa.Array:
    base = np.datetime64(base_day, "us").astype("int64")
    return pa.array(base + day_offsets_us, type=pa.timestamp("us"))


def write(out: Path, name: str, batches) -> None:
    writer = None
    n = 0
    for batch in batches:
        tbl = pa.table(batch)
        if writer is None:
            writer = pq.ParquetWriter(
                out / f"{name}.parquet", tbl.schema, compression="snappy"
            )
        writer.write_table(tbl, row_group_size=ROW_GROUP)
        n += tbl.num_rows
    writer.close()
    print(f"  {name}: {n:,} rows")


def main() -> None:
    sf = float(sys.argv[1])
    out = Path(sys.argv[2])
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = int(50_000 * sf)
    # driver's embeddings grow ~x4 per decade: 500@0.01, 2000@0.1
    n_emb = int(2000 * 4 ** np.log10(sf / 0.1))

    write(out, "region", [{
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }])
    write(out, "nation", [{
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array(rng.integers(0, 5, 25), pa.int32()),
    }])
    write(out, "customer", [{
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": MKTSEG[rng.integers(0, 5, n_cust)],
    }])
    write(out, "supplier", [{
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }])
    adj = PNAME_ADJ[rng.integers(0, len(PNAME_ADJ), n_part)]
    noun = PNAME_NOUN[rng.integers(0, len(PNAME_NOUN), n_part)]
    write(out, "part", [{
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": PTYPE[rng.integers(0, len(PTYPE), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
    }])

    # orders: keep o_orderdate (days since 1995-01-01) for lineitem
    order_day = rng.integers(0, 2404, n_orders)  # 1995-01-01..2001-08-01
    def order_batches():
        for lo in range(0, n_orders, CHUNK):
            hi = min(lo + CHUNK, n_orders)
            m = hi - lo
            yield {
                "o_orderkey": np.arange(lo, hi, dtype=np.int64),
                "o_custkey": rng.integers(0, n_cust, m),
                "o_orderstatus": np.array(list("FOP"))[rng.integers(0, 3, m)],
                "o_totalprice": np.round(rng.uniform(1000, 500_000, m), 2),
                "o_orderdate": _ts_us("1995-01-01", order_day[lo:hi] * DAY_US),
                "o_orderpriority": OPRIO[rng.integers(0, 5, m)],
            }
    write(out, "orders", order_batches())

    # lineitem: 1..7 lines per order (avg ~4, matching driver's 4.08)
    lines_per = rng.integers(1, 8, n_orders)
    okeys_all = np.repeat(np.arange(n_orders, dtype=np.int64), lines_per)
    lnum_all = (
        np.arange(okeys_all.size) -
        np.repeat(np.cumsum(lines_per) - lines_per, lines_per) + 1
    )
    def lineitem_batches():
        for lo in range(0, okeys_all.size, CHUNK):
            hi = min(lo + CHUNK, okeys_all.size)
            m = hi - lo
            ok = okeys_all[lo:hi]
            ship = order_day[ok] + rng.integers(1, 121, m)
            yield {
                "l_orderkey": ok,
                "l_partkey": rng.integers(0, n_part, m),
                "l_suppkey": rng.integers(0, n_supp, m),
                "l_linenumber": pa.array(lnum_all[lo:hi], pa.int32()),
                "l_quantity": rng.integers(1, 51, m).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900, 105_000, m), 2),
                "l_discount": rng.integers(0, 11, m) / 100.0,
                "l_tax": rng.integers(0, 9, m) / 100.0,
                "l_returnflag": np.array(list("NAR"))[rng.integers(0, 3, m)],
                "l_linestatus": np.array(list("OF"))[rng.integers(0, 2, m)],
                "l_shipdate": _ts_us("1995-01-01", ship * DAY_US),
            }
    write(out, "lineitem", lineitem_batches())

    # events: 30 days of 2024-01, users = customers/10
    n_users = max(int(n_cust / 10), 1)
    def event_batches():
        for lo in range(0, n_events, CHUNK):
            hi = min(lo + CHUNK, n_events)
            m = hi - lo
            us = rng.integers(0, 30 * DAY_US, m)  # already microseconds
            yield {
                "event_id": np.arange(lo, hi, dtype=np.int64),
                "ts": _ts_us("2024-01-01", np.sort(us) if lo == 0 else us),
                "user_id": rng.integers(0, n_users, m),
                "event_type": EVENT_TYPES[rng.integers(0, 5, m)],
                "value": np.round(rng.uniform(0, 200, m), 2),
                "props": np.char.add(
                    np.char.add(
                        '{"k": ', rng.integers(0, 100, m).astype("U3")
                    ), "}"
                ),
            }
    write(out, "events", event_batches())

    # documents: 10..100 words from the 31-word vocab; inject dup structure
    nw = rng.integers(10, 101, n_docs)
    widx = rng.integers(0, len(VOCAB), int(nw.sum()))
    starts = np.cumsum(nw) - nw
    texts = [
        " ".join(VOCAB[widx[s:s + k]]) for s, k in zip(starts, nw)
    ]
    n_exact = int(0.005 * n_docs)
    n_near = int(0.01 * n_docs)
    src = rng.integers(0, max(n_docs - n_exact - n_near, 1), n_exact + n_near)
    for j in range(n_exact):  # exact dupes of earlier docs
        texts[n_docs - n_exact - n_near + j] = texts[src[j]]
    for j in range(n_near):  # near-dups: mutate 2 words
        w = texts[src[n_exact + j]].split()
        for pos in rng.integers(0, len(w), 2):
            w[pos] = VOCAB[rng.integers(0, len(VOCAB))]
        texts[n_docs - n_near + j] = " ".join(w)
    lang = np.array(["en", "zh", "es", "fr", "de"])[
        rng.choice(5, n_docs, p=[0.41, 0.15, 0.15, 0.15, 0.14])
    ]
    write(out, "documents", [{
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": lang,
        "source": [f"src{i}" for i in rng.integers(0, 20, n_docs)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }])

    # embeddings: 64-dim unit-norm around 10 centroids
    centroids = rng.normal(size=(10, 64))
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    label = rng.integers(0, 10, n_emb)
    vec = centroids[label] + rng.normal(scale=0.35, size=(n_emb, 64))
    vec = (vec / np.linalg.norm(vec, axis=1, keepdims=True)).astype(np.float32)
    write(out, "embeddings", [{
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(vec), pa.list_(pa.float32())),
        "label": pa.array(label, pa.int32()),
    }])


if __name__ == "__main__":
    main()
