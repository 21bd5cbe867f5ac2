"""Structured Streaming tests: stream results must equal batch results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_substrait_spark.streaming import events as ev
from tests.conftest import SF_DIR, rows_set


@pytest.fixture(scope="module")
def batch_events(spark):
    return ev._with_event_time(spark.table("events"))


def test_windowed_counts_batch(spark, batch_events):
    out = ev.windowed_event_counts(batch_events)
    rows = out.collect()
    assert out.columns == ["window_start", "event_type", "n", "sum_value"]
    assert sum(r["n"] for r in rows) == spark.table("events").count()


def test_stream_equals_batch(spark, batch_events, tmp_path):
    stream = ev.read_events_stream(spark, f"{SF_DIR}/events.parquet")
    windowed = ev.windowed_event_counts(stream)
    with_sink = (
        windowed.writeStream.format("memory").queryName("ev_counts")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    with_sink.awaitTermination(120)
    got = spark.table("ev_counts")
    expect = ev.windowed_event_counts(batch_events)
    assert rows_set(got) == rows_set(expect)


def test_correlate_events_stream_equals_batch(spark, batch_events):
    # stream-stream interval join (watermarked, state bounded by watermark +
    # interval) must emit exactly the batch join's pairs
    stream = ev.read_events_stream(spark, f"{SF_DIR}/events.parquet")
    out = ev.correlate_events(stream)
    q = (out.writeStream.format("memory").queryName("correlated")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("correlated")
    expect = ev.correlate_events(batch_events)
    assert rows_set(got) == rows_set(expect)
    assert got.columns == ["user_id", "a_id", "b_id", "lag_us"]


def test_stateful_running_stats_stream_equals_batch(spark, batch_events):
    from datafusion_substrait_spark.streaming import stateful

    stream = ev.read_events_stream(spark, f"{SF_DIR}/events.parquet")
    out = stateful.running_user_stats(stream)
    q = (out.writeStream.format("memory").queryName("user_stats")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # last emitted row per user == batch aggregate
    got = (spark.table("user_stats")
           .withColumn("_r", F.monotonically_increasing_id())
           .groupBy("user_id").agg(F.max_by(F.struct("n_events", "sum_value", "max_value"),
                                            "_r").alias("s"))
           .select("user_id", "s.n_events", "s.sum_value", "s.max_value"))
    expect = stateful.running_user_stats(spark.table("events"))
    assert rows_set(got) == rows_set(expect)


def test_streaming_dedup_first_seen_wins(spark, batch_events):
    from datafusion_substrait_spark.streaming import stateful

    stream = ev.read_events_stream(spark, f"{SF_DIR}/events.parquet")
    out = stateful.streaming_exact_dedup(stream)
    q = (out.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("dedup_stream")
    # one row per fingerprint, and it is the min-event_id row (single-file
    # stream arrives in event order, matching the batch min-id choice)
    expect = stateful.streaming_exact_dedup(spark.table("events"))
    assert rows_set(got) == rows_set(expect)


def test_sessionize_batch(spark, batch_events):
    out = ev.sessionize(batch_events)
    rows = out.collect()
    assert len(rows) > 0
    # every user's events are fully assigned to sessions
    total = sum(r["n_events"] for r in rows)
    assert total == spark.table("events").count()
