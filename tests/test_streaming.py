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


def test_sessionize_batch(spark, batch_events):
    out = ev.sessionize(batch_events)
    rows = out.collect()
    assert len(rows) > 0
    # every user's events are fully assigned to sessions
    total = sum(r["n_events"] for r in rows)
    assert total == spark.table("events").count()
