"""Posting-block codec: delta + varint encoding with per-block maxes.

The reference's segment format (Tantivy, selected by Toshi at
``toshi-types/src/query/term.rs:38`` / ``requests.http:15``) stores
postings as delta-encoded doc-id runs in bitpacked/varint blocks with
per-block skip data.  This module is our equivalent physical format,
expressed as a parquet table of binary block payloads:

    (field, term, salt, block_id, first_doc, last_doc, count,
     max_tf, doc_deltas: binary, tfs: binary)

- doc ids within a (field, term, salt) run are sorted and
  delta-encoded (first delta is relative to first_doc).
- deltas and tfs are LEB128 varints, encoded/decoded with fully
  vectorized numpy (no per-value Python in the hot path).
- per-block ``max_tf`` + ``last_doc`` are the skip/upper-bound data
  used by the block-max top-k path (SURVEY.md §4 — block-max WAND).

Block size 128 mirrors the classic posting-block layout.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

BLOCK_SIZE = 128

BLOCKS_SCHEMA = (
    "field string, term string, salt int, block_id int, first_doc long, "
    "last_doc long, count int, max_tf int, doc_deltas binary, tfs binary"
)

DECODED_SCHEMA = "field string, term string, doc_id long, tf int"


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, fully vectorized."""
    v = values.astype(np.uint64, copy=True)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbytes = np.ones(v.shape, dtype=np.int64)
    thresh = np.uint64(1 << 7)
    tmp = v.copy()
    while True:
        mask = tmp >= thresh
        if not mask.any():
            break
        nbytes[mask] += 1
        tmp = tmp >> np.uint64(7)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    max_b = int(nbytes.max())
    for k in range(max_b):
        mask = nbytes > k
        chunk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes → uint64 array, fully vectorized."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_terminal = (b & 0x80) == 0
    # value id of each byte: number of terminals strictly before it
    value_id = np.concatenate(([0], np.cumsum(is_terminal)[:-1]))
    n_values = int(is_terminal.sum())
    # byte position within its value
    starts_mask = np.concatenate(([True], is_terminal[:-1]))
    idx = np.arange(b.size, dtype=np.int64)
    start_idx = idx[starts_mask]
    pos_in_value = idx - start_idx[value_id]
    acc = np.zeros(n_values, dtype=np.uint64)
    np.add.at(
        acc,
        value_id,
        (b & 0x7F).astype(np.uint64) << (7 * pos_in_value).astype(np.uint64),
    )
    return acc


def encode_run(
    doc_ids: np.ndarray, tfs: np.ndarray
) -> list[tuple[int, int, int, int, int, bytes, bytes]]:
    """One sorted (field, term, salt) posting run → block rows.

    Returns [(block_id, first_doc, last_doc, count, max_tf,
              doc_deltas, tfs_bytes)].
    """
    order = np.argsort(doc_ids, kind="mergesort")
    d = doc_ids[order].astype(np.int64)
    t = tfs[order].astype(np.int64)
    blocks = []
    for bi, off in enumerate(range(0, d.size, BLOCK_SIZE)):
        dd = d[off : off + BLOCK_SIZE]
        tt = t[off : off + BLOCK_SIZE]
        deltas = np.empty(dd.size, dtype=np.uint64)
        deltas[0] = 0
        if dd.size > 1:
            deltas[1:] = np.diff(dd).astype(np.uint64)
        blocks.append(
            (
                bi,
                int(dd[0]),
                int(dd[-1]),
                int(dd.size),
                int(tt.max()),
                varint_encode(deltas),
                varint_encode(tt.astype(np.uint64)),
            )
        )
    return blocks


def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: one (field, term, salt) group → block rows."""
    field = pdf["field"].iloc[0]
    term = pdf["term"].iloc[0]
    salt = int(pdf["salt"].iloc[0]) if "salt" in pdf.columns else 0
    rows = encode_run(pdf["doc_id"].values, pdf["tf"].values)
    return pd.DataFrame(
        {
            "field": field,
            "term": term,
            "salt": salt,
            "block_id": [r[0] for r in rows],
            "first_doc": [r[1] for r in rows],
            "last_doc": [r[2] for r in rows],
            "count": [r[3] for r in rows],
            "max_tf": [r[4] for r in rows],
            "doc_deltas": [r[5] for r in rows],
            "tfs": [r[6] for r in rows],
        }
    )


def decode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: block rows → (field, term, doc_id, tf) rows."""
    for pdf in batches:
        fields, terms, doc_ids, tfs = [], [], [], []
        for row in pdf.itertuples(index=False):
            deltas = varint_decode(bytes(row.doc_deltas)).astype(np.int64)
            docs = np.cumsum(deltas) + row.first_doc
            t = varint_decode(bytes(row.tfs)).astype(np.int32)
            fields.append(np.full(docs.size, row.field, dtype=object))
            terms.append(np.full(docs.size, row.term, dtype=object))
            doc_ids.append(docs)
            tfs.append(t)
        if not fields:
            continue
        yield pd.DataFrame(
            {
                "field": np.concatenate(fields),
                "term": np.concatenate(terms),
                "doc_id": np.concatenate(doc_ids),
                "tf": np.concatenate(tfs),
            }
        )


def encode_blocks_df(postings_salted):
    """postings (field, term, doc_id, tf, salt) → blocks DataFrame.

    groupBy + applyInPandas: each (field, term, salt) run is encoded by
    one task; salting keeps head-term runs bounded (builder.py).
    """
    return postings_salted.select(
        "field", "term", "salt", "doc_id", "tf"
    ).groupBy("field", "term", "salt").applyInPandas(
        lambda pdf: encode_group(pdf), BLOCKS_SCHEMA
    )


def decode_blocks_df(blocks):
    """blocks DataFrame → postings (field, term, doc_id, tf)."""
    return blocks.mapInPandas(decode_partition, DECODED_SCHEMA)
