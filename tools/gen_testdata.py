"""Synthetic testdata generator — the driver-recipe shape at any SF.

Regenerates the ten driver tables (`TESTDATA.md`) with identical schemas
(parquet physical types included: BIGINT ids, INTEGER small ints,
timestamp[us], list<float> embeddings) and the same value families
(TPC-H-ish dimensions, 5 event types over Jan-2024, word-salad documents
with planted exact+near duplicates, unit-norm clustered embeddings) at a
caller-chosen scale factor. Row counts scale linearly from the observed
sf0.1 counts.

The correctness gate (`tools/check.py`) compares Spark vs DuckDB over the
SAME files, so matching the driver's exact RNG stream is not required —
what matters is schema parity and the distribution families the gates
exercise (duplicate clusters for dedup, language/source mix for grouping,
cluster structure for ANN). Used for the round-6 sf1 scale soak:

    python tools/gen_testdata.py 1.0 /root/repo/testdata_sf1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# rows per table at sf=1 (10x the observed /root/testdata/sf0.1 counts)
SF1_ROWS = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,  # target; actual is orders x Uniform{1..7} lines
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ORDERSTATUS = ["O", "F", "P"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "MEDIUM", "STANDARD", "PROMO"]
PADJ = ["large", "hot", "blue", "red", "small", "green", "dim", "light"]
PNOUN = ["ring", "bolt", "screw", "washer", "nut", "cap", "pin", "rod"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data vector join shuffle plan stage task disk cache memory skew "
    "broadcast limit index page block"
).split()

US_DAY = 86_400_000_000  # microseconds per day
EPOCH_1995 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
EPOCH_2024 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"  {name}: {table.num_rows} rows -> {path}", flush=True)


def _ts_us(int_us: np.ndarray) -> pa.Array:
    return pa.array(int_us, type=pa.timestamp("us"))


def gen_dims(out_dir: str, rng: np.random.Generator, sf: float) -> dict:
    n_cust = max(1, int(SF1_ROWS["customer"] * sf))
    n_supp = max(1, int(SF1_ROWS["supplier"] * sf))
    n_part = max(1, int(SF1_ROWS["part"] * sf))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": np.round(rng.uniform(0, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": np.round(rng.uniform(0, 10_000, n_supp), 2),
    }))

    adj = np.array(PADJ)[rng.integers(0, len(PADJ), n_part)]
    noun = np.array(PNOUN)[rng.integers(0, len(PNOUN), n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.char.add(
            "Brand#", rng.integers(1, 26, n_part).astype(str)),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": np.round(
            900.0 + (np.arange(n_part) % 1000) / 10.0, 2),
    }))
    return {"n_cust": n_cust, "n_supp": n_supp, "n_part": n_part}


def gen_facts(out_dir: str, rng: np.random.Generator, sf: float, dims: dict):
    n_ord = max(1, int(SF1_ROWS["orders"] * sf))
    odate_us = EPOCH_1995 + (
        rng.integers(0, 2404, n_ord) * US_DAY  # 1995-01-01 .. 2001-08-01
    )
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(
            rng.integers(0, dims["n_cust"], n_ord).astype(np.int64)),
        "o_orderstatus": pa.array(
            np.array(ORDERSTATUS)[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(900, 500_000, n_ord), 2),
        "o_orderdate": _ts_us(odate_us),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: per-order 1..7 lines (mean 4 -> ~4x orders, the sf0.1 ratio)
    nlines = rng.integers(1, 8, n_ord)
    okey = np.repeat(np.arange(n_ord, dtype=np.int64), nlines)
    lnum = (np.concatenate([np.arange(k) for k in nlines]) + 1).astype(np.int32)
    n_li = len(okey)
    ship_us = np.repeat(odate_us, nlines) + (
        rng.integers(1, 96, n_li) * US_DAY
    )
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okey),
        "l_partkey": pa.array(
            rng.integers(0, dims["n_part"], n_li).astype(np.int64)),
        "l_suppkey": pa.array(
            rng.integers(0, dims["n_supp"], n_li).astype(np.int64)),
        "l_linenumber": pa.array(lnum),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 100_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_us(ship_us),
    }))


def gen_events(out_dir: str, rng: np.random.Generator, sf: float, dims: dict):
    n = max(1, int(SF1_ROWS["events"] * sf))
    n_users = max(1, dims["n_cust"] // 10)
    ts_us = EPOCH_2024 + rng.integers(0, 30 * US_DAY, n)
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": _ts_us(np.sort(ts_us)),
        "user_id": pa.array(rng.integers(0, n_users, n).astype(np.int64)),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n)]),
        "value": np.round(
            np.minimum(rng.exponential(80.0, n), 600.0), 2),
        "props": np.char.add(
            np.char.add('{"k": ', rng.integers(0, 100, n).astype(str)), "}"),
    }))


def gen_documents(out_dir: str, rng: np.random.Generator, sf: float):
    n = max(10, int(SF1_ROWS["documents"] * sf))
    vocab = np.array(VOCAB)
    lens = rng.integers(8, 101, n)
    texts: list[str] = []
    for k in lens:
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), k)]))
    # planted duplicate structure (drives the dedup gate family):
    # ~4% near-dups (copy an earlier doc, mutate ~10% of words) and
    # ~0.2% exact dups of an earlier doc.
    n_near = n * 4 // 100
    n_exact = max(1, n * 2 // 1000)
    for i in rng.integers(n // 2, n, n_near):
        src = int(rng.integers(0, n // 2))
        words = texts[src].split()
        n_mut = max(1, len(words) // 10)
        for j in rng.integers(0, len(words), n_mut):
            words[int(j)] = str(vocab[int(rng.integers(0, len(vocab)))])
        texts[int(i)] = " ".join(words)
    for i in rng.integers(n // 2, n, n_exact):
        texts[int(i)] = texts[int(rng.integers(0, n // 2))]

    langs = np.array(LANGS)[
        rng.choice(len(LANGS), n, p=LANG_P)
    ]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": texts,
        "lang": pa.array(langs),
        "source": np.char.add("src", rng.integers(0, 20, n).astype(str)),
        "n_chars": pa.array(
            np.array([len(t) for t in texts], dtype=np.int64)),
    }))


def gen_embeddings(out_dir: str, rng: np.random.Generator, sf: float):
    n = max(10, int(SF1_ROWS["embeddings"] * sf))
    dim, n_labels = 64, 10
    centers = rng.normal(0, 1, (n_labels, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, n_labels, n).astype(np.int32)
    vecs = centers[labels] + rng.normal(0, 0.45, (n, dim))
    # ~2% near-duplicate vectors (tiny perturbations of an earlier row) so
    # the near-dup/semdedup gates have real positives at every SF
    n_dup = n * 2 // 100
    dup_at = rng.integers(n // 2, n, n_dup)
    dup_src = rng.integers(0, n // 2, n_dup)
    vecs[dup_at] = vecs[dup_src] + rng.normal(0, 0.01, (n_dup, dim))
    labels[dup_at] = labels[dup_src]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs32 = vecs.astype(np.float32)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs32.ravel(), pa.float32()), dim
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(labels),
    }))


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out_dir = sys.argv[2] if len(sys.argv) > 2 else f"testdata_sf{sf:g}"
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    print(f"generating sf={sf} seed={seed} -> {out_dir}")
    dims = gen_dims(out_dir, rng, sf)
    gen_facts(out_dir, rng, sf, dims)
    gen_events(out_dir, rng, sf, dims)
    gen_documents(out_dir, rng, sf)
    gen_embeddings(out_dir, rng, sf)
    print("done")


if __name__ == "__main__":
    main()
