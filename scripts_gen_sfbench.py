"""Generate an APPROXIMATE larger-scale measurement corpus.

/root/testdata/sf* are driver-generated and read-only; no generator
ships with them.  For optimization measurements beyond sf0.1 we
synthesize a corpus with the same schemas, marginal distributions and
file layout (ONE parquet row group per table, like the originals — the
layout property that round 8's spread work exists for):

- documents: uniform 30-word vocab + a rare ``dup`` marker token (5%%
  of docs), lengths U[10,100], lang {en .44, zh .15, es .146, de .14,
  fr .124}, source=src{i%%20}, 0.16%% of docs exact-duplicated (8
  groups / 5000 observed at sf0.1).
- embeddings: unit-norm N(0,1)/|.| 64-dim float32, labels U{0..9};
  count = 0.4 x docs.
- events: 20 x docs rows over a fixed 30-day window (exponential
  inter-arrival), users = 0.3 x docs, five event types, value ~ |N|*40
  capped, props {"k": U[0,99]}.

This is NOT the driver's data: per-query seconds here are comparable
run-to-run locally, not to driver artifacts byte-for-byte.  Usage:

    python scripts_gen_sfbench.py --sf 1.0 --out /tmp/sfbench/sf1.0
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "de", "fr"]
LANG_P = [0.44, 0.15, 0.146, 0.14, 0.124]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    lengths = rng.integers(10, 101, size=n)
    total = int(lengths.sum())
    words = rng.integers(0, len(VOCAB), size=total)
    offs = np.concatenate(([0], np.cumsum(lengths)))
    vocab = np.array(VOCAB)
    has_dup = rng.random(n) < 0.05
    texts = []
    for i in range(n):
        toks = vocab[words[offs[i]:offs[i + 1]]]
        if has_dup[i]:
            toks = toks.copy()
            toks[int(rng.integers(0, len(toks)))] = "dup"
        texts.append(" ".join(toks))
    # exact-duplicate groups: 8 per 5000 docs, pair-sized
    n_groups = max(1, round(n * 8 / 5000))
    pick = rng.choice(n, size=2 * n_groups, replace=False)
    for a, b in pick.reshape(-1, 2):
        texts[int(b)] = texts[int(a)]
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs.tolist(), pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    V = rng.standard_normal((n, 64)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(V), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n).tolist(), pa.int64()),
    })


def gen_events(n: int, n_users: int, rng: np.random.Generator) -> pa.Table:
    window_s = 30 * 24 * 3600.0
    dt = rng.exponential(window_s / n, size=n)
    ts = np.datetime64("2024-01-01") + (
        np.cumsum(dt) * 1e6).astype("timedelta64[us]")
    value = np.minimum(np.abs(rng.standard_normal(n)) * 40.0, 560.0)
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(
            rng.integers(0, n_users, size=n).tolist(), pa.int64()),
        "event_type": pa.array(
            rng.choice(EVENT_TYPES, size=n).tolist(), pa.string()),
        "value": pa.array(np.round(value, 2), pa.float64()),
        "props": pa.array(
            [json.dumps({"k": int(k)})
             for k in rng.integers(0, 100, size=n)], pa.string()),
    })


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    n_docs = int(round(args.sf * 50000))
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    # one row group per table, matching the driver files' layout
    for name, tbl in (
        ("documents", gen_documents(n_docs, rng)),
        ("embeddings", gen_embeddings(int(n_docs * 0.4), rng)),
        ("events", gen_events(n_docs * 20, int(n_docs * 0.3), rng)),
    ):
        pq.write_table(tbl, os.path.join(args.out, f"{name}.parquet"),
                       row_group_size=1 << 31, compression="snappy")
        print(name, tbl.num_rows)


if __name__ == "__main__":
    main()
