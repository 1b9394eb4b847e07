"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern: image/audio/video are ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over ``mapInPandas`` so each batch moves as one
Arrow buffer (binary columns are the case where Arrow batching matters
most — no per-row serialization of megabyte payloads).

The actual codec step is STUBBED: the image/audio libraries are not in
this container, so ``decode_image`` raises ``NotImplementedError``
unless PIL is importable, and the tested path uses a deterministic
byte-level feature extractor.  The Spark-side plumbing — schema,
batching, partition sizing — is real.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, content_hash string, feat array<double>"
)

_N_BINS = 8


def attach_binary(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: payload binary + metadata struct."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            F.length(F.col(text_col)).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Real decode — gated on the codec library being present."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "image codec not available in this environment; "
            "use extract_features (deterministic byte-level path)"
        ) from e


def _byte_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a feature extractor: normalized
    byte-value histogram over _N_BINS bins."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(_N_BINS)
    hist, _ = np.histogram(arr, bins=_N_BINS, range=(0, 256))
    return hist / arr.size


def _extract_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    for pdf in batches:
        feats, hashes, sizes = [], [], []
        for payload in pdf["payload"]:
            b = bytes(payload)
            feats.append(_byte_features(b).tolist())
            hashes.append(hashlib.md5(b).hexdigest())
            sizes.append(len(b))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "content_hash": hashes,
                "feat": feats,
            }
        )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary column."""
    return binary_df.select("doc_id", "payload").mapInPandas(
        _extract_partition, FEATURE_SCHEMA
    )


RESIZE_SCHEMA = "doc_id long, payload binary, n_bytes long"


def resize(binary_df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """'Resize' the payload to a fixed byte budget (mapInPandas).

    The real image resize (PIL/opencv) is not available in this
    container, so the transform is a deterministic stand-in: uniform
    byte subsampling down to ``target_bytes`` (shorter payloads pass
    through).  The Spark-side plumbing — binary in/binary out, Arrow
    batching, schema — is the real pattern a decode→resize stage uses.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, sizes = [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if len(b) > target_bytes:
                    # integer arithmetic (not linspace): i*(L-1)//(T-1)
                    # is exactly reproducible in the SQL oracle
                    idx = (np.arange(target_bytes, dtype=np.int64)
                           * (len(b) - 1)) // (target_bytes - 1)
                    b = bytes(np.frombuffer(b, dtype=np.uint8)[idx])
                outs.append(b)
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": outs,
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        _resize, RESIZE_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_no int, frame binary"


def frame_sample(binary_df: DataFrame, frame_bytes: int = 32,
                 every: int = 4) -> DataFrame:
    """Sample every ``every``-th fixed-size frame from the payload.

    Video decode is not available here, so a 'frame' is a deterministic
    fixed-size byte window — the one-row-in/N-rows-out (flatMap) shape,
    output cardinality, and Arrow batching are exactly what a real
    frame sampler needs; swap the slicer for a codec when present.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max(1, len(b) // frame_bytes)
                for fno in range(0, n_frames, every):
                    ids.append(int(doc_id))
                    nos.append(fno)
                    frames.append(b[fno * frame_bytes:(fno + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_no": pd.Series(nos, dtype="int32"),
                    "frame": frames,
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        _frames, FRAME_SCHEMA
    )
