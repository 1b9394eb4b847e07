"""Deterministic, scalable docId assignment.

Toshi/Tantivy assign doc ids by single-writer arrival order
(reference: single ``IndexWriter`` behind a mutex,
``toshi-server/src/handle.rs:27-34``).  A distributed build has no
arrival order, so we pin a deterministic one: docId = rank of the
document under a total order on a unique key (the corpus ``url``).

A naive ``row_number() OVER (ORDER BY url)`` is a single-partition
window — a non-starter at 10^12 docs.  Instead we use the classic
two-pass scheme, which is fully parallel:

1. range-partition by the key (``repartitionByRange`` samples the key
   distribution, so partitions are balanced);
2. count rows per partition (small job over partition ids only);
3. broadcast the cumulative offsets; per-partition local sort + local
   row index + offset = global rank.

Cost: one shuffle + one lightweight count pass.  No global sort
materialization, no driver bottleneck.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def assign_doc_ids(
    df: DataFrame,
    order_col: str = "url",
    num_partitions: int | None = None,
    out_col: str = "doc_id",
) -> DataFrame:
    """Add a dense 0-based ``doc_id`` = rank of ``order_col`` (ascending).

    Deterministic across runs and cluster sizes (depends only on the
    data and ``num_partitions``); ``order_col`` must be unique.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(num_partitions, F.col(order_col))
    # PERSIST the ranged layout before the counts pass: the count job
    # and the rank pass MUST observe the identical partitioning.
    # repartitionByRange samples the key distribution per execution —
    # without materialization the two jobs can plan different range
    # boundaries, and offsets computed from one applied to the other
    # silently produce duplicate/missing doc ids (observed at 500k:
    # 486,433 distinct ids for 500,000 rows).
    with_pid = ranged.withColumn("__pid", F.spark_partition_id()).persist()
    counts = {
        r["__pid"]: r["cnt"]
        for r in with_pid.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boff = df.sparkSession.sparkContext.broadcast(offsets)

    out_fields = with_pid.schema.fieldNames()
    out_fields.remove("__pid")
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in with_pid.schema.fields
        if f.name != "__pid"
    ) + f", `{out_col}` long"

    def _rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # All batches in one call belong to one partition; sort the
        # partition locally and add offset + local index.
        rows = list(batches)
        if not rows:
            return
        pdf = pd.concat(rows, ignore_index=True)
        pid = int(pdf["__pid"].iloc[0])
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        pdf[out_col] = pdf.index + boff.value.get(pid, 0)
        yield pdf.drop(columns=["__pid"])

    return with_pid.mapInPandas(_rank, schema)
