"""Structured Streaming over the ``events`` table.

The reference has no streaming surface (SURVEY.md §2.5) — this is the
engine's Spark-native extension for continuous pipelines: file-source
streams, watermarked tumbling-window aggregation, and an
``Trigger.AvailableNow``-style batch-replay harness so tests and the oracle
can pin results.

``events.ts`` is parquet TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ — see
sources/catalog.py); the stream converts to TimestampType once at
ingestion. ``ts_micros`` also accepts the legacy epoch-nanos bigint layout
so synthetic test frames keep working.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampNTZType()),  # parquet timestamp[us], not UTC-adjusted
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def ts_micros(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-micros bigint for an event-time column, whatever its physical
    type: TIMESTAMP / TIMESTAMP_NTZ (current testdata: parquet
    timestamp[us]) or epoch-nanos bigint (the legacy nanosAsLong layout).
    Every path is session-timezone-independent — the NTZ wall time is
    measured against an NTZ epoch literal, never cast through LTZ — so the
    integers match DuckDB's ``epoch_us(ts)`` in any session. (Registration
    still pins UTC, sources/catalog.py: hour-window *display* columns like
    e1's window_start render in the session zone.)"""
    t = df.schema[col].dataType
    if isinstance(t, T.LongType):
        # integer division by 1000 is exact on bigint nanos → micros
        return F.expr(f"{col} div 1000")
    if isinstance(t, T.TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
        )
    return F.unix_micros(F.col(col).cast("timestamp"))


def _with_event_time(df: DataFrame) -> DataFrame:
    return df.withColumn("event_time", F.timestamp_micros(ts_micros(df)))


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over events parquet. ``path`` may be a directory of
    part-files (production layout) or a single ``*.parquet`` file (the test
    tables) — the single-file case streams its parent dir with a glob filter.
    maxFilesPerTrigger bounds per-micro-batch work (backpressure knob)."""
    import os

    reader = (
        spark.readStream.schema(EVENTS_SCHEMA).option("maxFilesPerTrigger", 1)
    )
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return _with_event_time(reader.parquet(path))


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + value sums per event_type with late-data
    watermark. Works on both a stream (stateful, incremental) and a batch
    DataFrame (identical results — used by tests and the oracle check)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("event_time", watermark)
    return (
        src.groupBy(F.window("event_time", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows per user (gap-based). Batch variant uses a window
    function; streaming uses ``F.session_window`` — same session boundaries."""
    if events.isStreaming:
        return (
            events.withWatermark("event_time", f"{2 * gap_minutes} minutes")
            .groupBy(F.session_window("event_time", f"{gap_minutes} minutes"), "user_id")
            # round exactly like the batch branch below (r14 review
            # catch: an unrounded stream sum differs from batch on fp
            # representation, e.g. 0.30000000000000004 vs 0.3)
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("sum_value"))
        )
    from pyspark.sql import Window

    # order by (ts, event_id) so tie-handling is deterministic and the
    # DuckDB oracle can replay session assignment exactly; gap arithmetic
    # runs on exact integer micros regardless of the source ts type
    events = events.withColumn("_tsu", ts_micros(events))
    w = Window.partitionBy("user_id").orderBy("_tsu", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.withColumn("prev_ts", F.lag("_tsu").over(w))
        .withColumn(
            "new_session",
            (F.col("prev_ts").isNull() | ((F.col("_tsu") - F.col("prev_ts")) > gap_us)).cast("int"),
        )
        .withColumn("session_id", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
    )


def correlate_events(events: DataFrame, type_a: str = "view",
                     type_b: str = "purchase",
                     within_minutes: int = 10) -> DataFrame:
    """Stream-stream (or batch) event correlation: pair every ``type_a``
    event with the same user's ``type_b`` events that follow within
    ``within_minutes`` — the attribution-join shape (view→purchase,
    signup→first-error, …).

    Streaming: a watermarked stream-stream INNER join with an event-time
    range condition — Spark bounds the join state to the watermark +
    interval, so state does not grow with the stream. Batch: the identical
    join expression (used by tests and the DuckDB oracle; event_time is
    exact micros from the nanos source, so the boundary arithmetic replays
    engine-portably).

    Output: (user_id, a_id, b_id, lag_us) with lag_us in (0, interval].
    """
    interval = f"INTERVAL {int(within_minutes)} MINUTES"
    a = events.filter(F.col("event_type") == type_a).select(
        F.col("user_id"),
        F.col("event_id").alias("a_id"),
        F.col("event_time").alias("a_time"),
    )
    b = events.filter(F.col("event_type") == type_b).select(
        F.col("user_id").alias("b_user"),
        F.col("event_id").alias("b_id"),
        F.col("event_time").alias("b_time"),
    )
    if events.isStreaming:
        a = a.withWatermark("a_time", f"{2 * within_minutes} minutes")
        b = b.withWatermark("b_time", f"{2 * within_minutes} minutes")
    return (
        a.join(
            b,
            on=[
                a["user_id"] == b["b_user"],
                b["b_time"] > a["a_time"],
                b["b_time"] <= F.col("a_time") + F.expr(interval),
            ],
        )
        .select(
            "user_id", "a_id", "b_id",
            (F.unix_micros("b_time") - F.unix_micros("a_time")).alias("lag_us"),
        )
    )


def run_stream_to_memory(stream_df: DataFrame, query_name: str,
                         output_mode: str = "append") -> DataFrame:
    """Drain a stream with an available-now trigger into a memory sink and
    return the materialized result (test harness path).

    ``output_mode`` must match the stream's shape: "append" for joins /
    ``applyInPandasWithState`` appends / watermarked aggregations,
    "complete" for unwatermarked aggregations (e.g. a bare
    ``windowed_event_counts``), "update" for running-stats streams — Spark
    rejects a mismatch at ``start()``. (An earlier revision hardcoded
    "complete", which only the windowed-counts shape accepted.)"""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
