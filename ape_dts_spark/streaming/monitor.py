"""Streaming monitor: watermarked windowed counters over the change stream.

The reference's monitor subsystem (dt-common/src/monitor/, counters flushed
on an interval: rps, bytes, delay) is a side-channel aggregation over the
same event flow.  Spark-first that is a Structured Streaming windowed
aggregation with a watermark: tumbling event-time windows over the change
stream's commit timestamps, counting rows/ops/bytes per window, tolerating
late files up to the watermark and emitting finalized windows exactly once
(append mode).

This is also the engine's example of the watermark + windowed-agg pattern
for late data — the piece of the Structured Streaming surface the CDC
`foreachBatch` tail (stream.py) does not exercise.

Scale: the aggregation state is O(windows x ops) — constant per key — and
the watermark bounds state retention; at 10^10 events the stream partitions
fan the pre-aggregation across executors and only (window, op) partials
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rate_monitor_frame(
    changes: DataFrame,
    ts_col: str = "warc_ts",
    op_col: str = "op",
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    payload_col: str | None = "html",
) -> DataFrame:
    """changes (streaming or batch) -> per (window, op) counters.

    Output: window_start, window_end, op, n_events, n_bytes.  On a
    streaming frame the watermark makes append-mode output final per
    window; on a batch frame the same expression is the backfill/audit
    query (withWatermark is a no-op for batch plans).
    """
    sized = changes.withColumn(
        "_bytes",
        F.coalesce(F.octet_length(F.col(payload_col)), F.lit(0)).cast("long")
        if payload_col in changes.columns
        else F.lit(0).cast("long"),
    )
    if changes.isStreaming:
        sized = sized.withWatermark(ts_col, watermark_delay)
    win = F.window(F.col(ts_col), window_duration)
    return (
        sized.groupBy(win.alias("w"), F.col(op_col).alias("op"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_bytes").alias("n_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n_events",
            "n_bytes",
        )
    )


def start_rate_monitor(
    spark: SparkSession,
    changes_path: str,
    out_path: str,
    checkpoint_dir: str,
    ts_col: str = "warc_ts",
    op_col: str = "op",
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    available_now: bool = True,
):
    """Tail the change directory and append finalized windows to parquet.

    append output mode = a window row is written once, after the watermark
    passes its end — the streaming-native analog of the reference's
    interval-flushed counters (no double counting on restart: the streaming
    checkpoint owns the source offsets).
    """
    schema = spark.read.parquet(changes_path).schema
    stream = spark.readStream.schema(schema).parquet(changes_path)
    agg = rate_monitor_frame(
        stream,
        ts_col=ts_col,
        op_col=op_col,
        window_duration=window_duration,
        watermark_delay=watermark_delay,
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
