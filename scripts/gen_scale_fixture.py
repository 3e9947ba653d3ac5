"""Generate a scale-probe fixture mimicking the driver testdata shapes.

The driver ships sf0.001/0.01/0.1 only; the 100 TB design claims need at
least one decade of measured scaling beyond that.  This generator produces
the FOUR tables the heavy headline queries read (documents, embeddings,
events, orders) at an arbitrary multiple of the driver's sf0.1 sizes, with
the same schemas and the distributional features that drive those queries'
cost:

  * documents — 31-word vocab (copied from the driver data), char lengths
    ~U(44, 577), ~5%% of docs are light word-mutations of an earlier doc
    (calibrated: the driver corpus yields minhash-verified pairs at
    ~0.05/doc at BOTH sf0.01 and sf0.1, i.e. a constant per-doc near-dup
    rate), plus ~0.2%% exact duplicates.
  * embeddings — 64-dim float32, 10 Gaussian clusters (labels 0-9).
  * events — uniform timestamps over 30 days (micros parquet unit, like
    driver generations >= round 4), users scaled with size so per-user
    event density (and hence session structure) is scale-invariant.
  * orders — only the columns the probed queries read: o_orderkey
    (contiguous, feeds oracle_fixtures.overlap_reads) and o_custkey
    (feeds _derived_edges for G2/G3).

Because the generator differs from the driver's (seed, RNG), scaling
exponents are computed BETWEEN TWO FIXTURES FROM THIS GENERATOR (x1 vs
x10), never fixture-vs-driver; the x1 run doubles as a sanity anchor
against the driver's sf0.1 timings.

Usage: python scripts/gen_scale_fixture.py OUTDIR SCALE [SEED]
  SCALE 1.0 == driver-sf0.1 sizes (5k docs / 2k emb / 100k events / 150k
  orders); SCALE 10 == the decade probe.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
])
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
EVENT_TYPES = np.array(["view", "click", "purchase", "signup", "error"])

ROW_GROUP = 65536


def _write(path: str, table: pa.Table) -> None:
    pq.write_table(table, path, row_group_size=ROW_GROUP, compression="snappy")
    print(f"  wrote {path}: {table.num_rows} rows")


def gen_documents(outdir: str, n: int, rng: np.random.Generator) -> None:
    # word counts ~U(8, 102) -> char lengths ~U(44, 577) at ~5.6 chars/word
    n_words = rng.integers(8, 103, size=n)
    texts: list[str] = []
    near_dup = rng.random(n) < 0.05
    exact_dup = rng.random(n) < 0.002
    for i in range(n):
        if i > 0 and exact_dup[i]:
            texts.append(texts[rng.integers(0, i)])
            continue
        if i > 0 and near_dup[i]:
            src = texts[rng.integers(max(0, i - 1000), i)].split(" ")
            w = np.array(src)
            k = max(1, int(0.05 * len(w)))
            idx = rng.choice(len(w), size=k, replace=False)
            w[idx] = VOCAB[rng.integers(0, len(VOCAB), size=k)]
            texts.append(" ".join(w))
            continue
        texts.append(" ".join(VOCAB[rng.integers(0, len(VOCAB), size=n_words[i])]))
    lang = LANGS[rng.choice(len(LANGS), size=n, p=LANG_P)]
    source = np.char.add("src", rng.integers(0, 20, size=n).astype(str))
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array(source, pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    })
    _write(os.path.join(outdir, "documents.parquet"), tbl)


def gen_embeddings(outdir: str, n: int, rng: np.random.Generator) -> None:
    dim, k = 64, 10
    centers = rng.standard_normal((k, dim))
    labels = rng.integers(0, k, size=n)
    vecs = (centers[labels] + 0.5 * rng.standard_normal((n, dim))).astype(np.float32)
    flat = pa.array(vecs.reshape(-1), pa.float32())
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(flat, dim).cast(
            pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })
    _write(os.path.join(outdir, "embeddings.parquet"), tbl)


def gen_events(outdir: str, n: int, n_users: int, rng: np.random.Generator) -> None:
    span_us = 30 * 24 * 3600 * 1_000_000
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = np.sort(rng.integers(0, span_us, size=n)) + base
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
        "event_type": pa.array(
            EVENT_TYPES[rng.integers(0, len(EVENT_TYPES), size=n)], pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 200, size=n), 2), pa.float64()),
        "props": pa.array(
            np.char.add(np.char.add('{"k": ', rng.integers(0, 100, size=n).astype(str)),
                        "}"), pa.string()),
    })
    _write(os.path.join(outdir, "events.parquet"), tbl)


def gen_orders(outdir: str, n: int, n_cust: int, rng: np.random.Generator) -> None:
    tbl = pa.table({
        "o_orderkey": pa.array(np.arange(n), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, size=n), pa.int64()),
    })
    _write(os.path.join(outdir, "orders.parquet"), tbl)


def main() -> None:
    outdir = sys.argv[1]
    scale = float(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 20240814
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    sizes = {
        "documents": int(5000 * scale),
        "embeddings": int(2000 * scale),
        "events": int(100_000 * scale),
        "users": int(1500 * scale),
        "orders": int(150_000 * scale),
        "customers": int(15_000 * scale),
    }
    print(f"generating scale={scale} fixture in {outdir}: {sizes}")
    gen_documents(outdir, sizes["documents"], rng)
    gen_embeddings(outdir, sizes["embeddings"], rng)
    gen_events(outdir, sizes["events"], sizes["users"], rng)
    gen_orders(outdir, sizes["orders"], sizes["customers"], rng)
    with open(os.path.join(outdir, "FIXTURE.json"), "w") as fh:
        json.dump({"scale": scale, "seed": seed, "sizes": sizes}, fh)


if __name__ == "__main__":
    main()
