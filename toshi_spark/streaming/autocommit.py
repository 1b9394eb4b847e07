"""Auto-commit ingest: Structured Streaming micro-batches → segments.

Mirrors Toshi's auto-commit watcher (``toshi-server/src/commit.rs:
11-28``): a background tick commits pending writes every
``auto_commit_duration`` seconds unless a bulk is in flight.  The
Spark-native equivalent is a file-source stream with a processing-time
trigger where each micro-batch becomes one committed segment
(foreachBatch → build + manifest append); readers see data exactly at
commit boundaries (ReloadPolicy::OnCommit ≡ reading only committed
manifest entries).

``availableNow`` drives the same code path to completion synchronously
for tests and backfills.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from ..index.builder import build_index
from ..index.merge import run_merge
from ..index.segments import Manifest, segment_id_for, write_segment


def stream_ingest(
    spark: SparkSession,
    source_dir: str,
    source_schema: str,
    index_dir: str,
    id_col: str = "doc_id",
    text_fields: list[str] | str = "text",
    index_name: str = "stream",
    checkpoint_dir: str | None = None,
    trigger_seconds: float | None = None,
    available_now: bool = True,
    max_files_per_trigger: int = 16,
    merge_policy: dict | None = None,
):
    """readStream(json dir) → one segment per non-empty micro-batch.

    Returns the StreamingQuery; callers stop() it (or it drains fully
    under availableNow).  Streaming checkpointing (offsets) composes
    with our manifest: offsets say WHAT was read, the manifest says
    WHAT was committed — the batch id is baked into the segment id, so
    a replayed batch (foreachBatch is at-least-once) is SKIPPED when
    its segment id is already committed, and Manifest.entries() dedupes
    by id as defense in depth.

    ``merge_policy`` — dict of :func:`..index.merge.run_merge` policy
    dials (``min_merge_size`` / ``min_layer_size`` /
    ``level_log_size``); when set, compaction runs AFTER each committed
    batch, exactly when the log-merge policy says a bucket is due.
    One segment per micro-batch is precisely the 256-tiny-segment
    pathology scripts_segments_scale.py measured (8× query cost), so a
    long-running watcher must compact or it degrades.  Running the
    merge inside foreachBatch serializes it with ingest — ONE writer
    mutates the manifest (Toshi runs merges on background threads; the
    micro-batch boundary is the Spark-native equivalent trigger and
    removes writer-writer races by construction).  Readers race only
    the atomic ``replace_all`` rename: they see members-only or
    merged-only, never both (pinned by test_streaming_merge.py).
    """
    if checkpoint_dir is None:
        checkpoint_dir = index_dir + "/_stream_checkpoint"

    src = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        seg_id = segment_id_for(index_name, f"batch-{batch_id}", "stream")
        # foreachBatch is at-least-once: a crash between the manifest
        # append and the streaming checkpoint replays the batch.  The
        # batch id is baked into the segment id, so the committed set
        # tells us whether this batch already landed — skip instead of
        # re-appending (a duplicate manifest entry would double-load
        # the segment's postings and corrupt tf/df)
        if seg_id in Manifest(index_dir).committed_ids():
            return
        tables = build_index(batch_df, id_col=id_col,
                             text_fields=text_fields)
        write_segment(spark, tables, index_dir, seg_id,
                      opstamp=batch_id + 1)
        if merge_policy is not None:
            run_merge(spark, index_dir, index_name=index_name,
                      **merge_policy)

    writer = (
        src.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    q = writer.start()
    if available_now:
        while q.isActive:
            time.sleep(0.2)
    return q
