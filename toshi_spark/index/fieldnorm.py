"""Fieldnorm byte-quantization (Tantivy-style 1-byte doc lengths).

Tantivy stores each document's fieldnorm (kept-token count) as ONE
byte via a 256-entry lookup table, so BM25's length normalization sees
the quantized length, not the exact one.  This module implements the
scheme behind an index option (default OFF — exact lengths remain the
default, and every existing oracle pins exact mode).

Scheme: the Lucene SmallFloat "byte4" family — a byte float with a
4-bit mantissa, offset so small values encode exactly:

- lengths 0..23 encode exactly (ids 0..23);
- length n >= 24 encodes y = n - 24 keeping only its top 4 significant
  bits (floor), i.e. id = 24 + (mantissa3 | (shift+1) << 3) where
  shift = bit_length(y) - 4; decode reverses it.

Encode is monotonic, decode(encode(n)) <= n, and the byte range tops
out exactly at 255 for n = 2^31 - 1.  The full 256-entry decode table
is committed at ``tests/golden/fieldnorm_table.json``; tests pin it.

PROVENANCE NOTE: Tantivy 0.19's own ``FIELD_NORMS_TABLE``
(``src/fieldnorm/code.rs``) is not vendored in the reference and this
sandbox has no network, so its exact entries cannot be verified here.
This module therefore pins the publicly documented Lucene-SmallFloat
construction (the scheme Tantivy's is modeled on); swapping in
Tantivy's exact table later is a one-constant change validated by the
committed golden.
"""

from __future__ import annotations

import numpy as np

NUM_FREE_VALUES = 24  # lengths below this encode exactly
_MAX_FIELDNORM = 2**31 - 1


def fieldnorm_to_id(n: int) -> int:
    """Exact length → byte id (0..255). Monotonic non-decreasing."""
    n = min(max(int(n), 0), _MAX_FIELDNORM)
    if n < NUM_FREE_VALUES:
        return n
    y = n - NUM_FREE_VALUES
    numbits = y.bit_length()
    if numbits < 4:
        return NUM_FREE_VALUES + y
    shift = numbits - 4
    return NUM_FREE_VALUES + (((y >> shift) & 0x07) | ((shift + 1) << 3))


def id_to_fieldnorm(i: int) -> int:
    """Byte id → quantized length (the stored fieldnorm value)."""
    if i < NUM_FREE_VALUES:
        return i
    e = i - NUM_FREE_VALUES
    bits = e & 0x07
    shift = (e >> 3) - 1
    if shift == -1:
        return NUM_FREE_VALUES + bits
    return NUM_FREE_VALUES + ((bits | 0x08) << shift)


FIELD_NORMS_TABLE: list[int] = [id_to_fieldnorm(i) for i in range(256)]


def quantize(n: int) -> int:
    """decode(encode(n)): the length BM25 sees in quantized mode."""
    return id_to_fieldnorm(fieldnorm_to_id(n))


def quantize_array(a: np.ndarray) -> np.ndarray:
    """Vectorized ``quantize`` over an int array (pandas_udf kernel).

    Bit lengths come from ``np.frexp`` — exact for integers < 2^53 in
    float64, so no log2 rounding hazards at power-of-two boundaries.
    """
    a = np.clip(np.asarray(a, dtype=np.int64), 0, _MAX_FIELDNORM)
    y = a - NUM_FREE_VALUES
    _, numbits = np.frexp(np.maximum(y, 1).astype(np.float64))
    shift = np.maximum(numbits - 4, 0)
    q = (np.maximum(y, 0) >> shift) << shift
    return np.where(a < NUM_FREE_VALUES, a, NUM_FREE_VALUES + q)
