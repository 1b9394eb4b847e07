"""Watermarked windowed aggregation over an event stream.

The training-pipeline shape of event-time processing in Structured
Streaming: events carry an event-time column, a WATERMARK bounds how
late data may arrive, and tumbling windows aggregate per key.  State
for a window is kept only until the watermark passes its end — that
bound is what makes the aggregation runnable forever at 100 TB/day
(without it, window state grows without limit).

Late-data semantics (Spark-defined, pinned by the test):
- an event later than ``watermark_delay`` behind the max event time
  seen so far is DROPPED (its window has already been finalized);
- an event within the delay updates its (still-open) window.

Sink is append-mode parquet: a window row is emitted exactly once,
when the watermark passes the window end (the exactly-once contract a
downstream consumer wants).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F


def stream_windowed_counts(
    spark: SparkSession,
    source_dir: str,
    source_schema: str,
    out_dir: str,
    checkpoint_dir: str,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window_duration: str = "1 hour",
    watermark_delay: str = "30 minutes",
    available_now: bool = True,
):
    """readStream(json dir) → watermark → tumbling window counts → parquet.

    Returns after the availableNow drain (or returns the query handle
    when ``available_now=False``).  Output rows:
    (window_start, window_end, <key>, n_events).
    """
    src = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", 16)
        .json(source_dir)
    )
    agg = (
        src.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("w"),
            F.col(key_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        # awaitTermination re-raises the stream's exception — a failed
        # query (bad schema, unwritable sink) must surface instead of
        # returning silently with partial/empty parquet output
        q.awaitTermination()
        if q.exception() is not None:
            raise q.exception()
    return q
