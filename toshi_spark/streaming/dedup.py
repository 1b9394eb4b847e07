"""Stateful streaming dedup: emit each content hash exactly once.

The training-pipeline shape of Structured Streaming state: a stream of
documents is keyed by content hash and passed through
``applyInPandasWithState``; per-key state records whether the hash was
already emitted, so re-crawls and duplicate batches are suppressed
ACROSS micro-batches (the state store persists via the checkpoint —
this is the part a stateless `dropDuplicates` within a batch cannot
do without unbounded watermark state management by hand).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("content_hash", StringType()),
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)
STATE_SCHEMA = StructType([StructField("emitted", LongType())])


def _dedup_fn(key, pdf_iter, state: GroupState):
    import pandas as pd

    if state.exists:
        (emitted,) = state.get
    else:
        emitted = 0
    out = []
    for pdf in pdf_iter:
        if emitted == 0 and len(pdf) > 0:
            first = pdf.sort_values("doc_id").iloc[:1]
            out.append(first[["content_hash", "doc_id", "text"]])
            emitted = 1
    state.update((emitted,))
    if out:
        yield pd.concat(out)


def stream_dedup(
    spark: SparkSession,
    source_dir: str,
    source_schema: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """readStream(json) → keep first occurrence of each text hash."""
    src = spark.readStream.schema(source_schema).json(source_dir)
    hashed = src.select(
        F.md5(F.encode(F.col("text"), "utf-8")).alias("content_hash"),
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
    )
    deduped = hashed.groupBy("content_hash").applyInPandasWithState(
        _dedup_fn,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        while q.isActive:
            time.sleep(0.2)
    return q
