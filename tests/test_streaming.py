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


def test_ts_micros_all_three_layouts(spark):
    """ts_micros must dispatch on the ts column's physical type: epoch-nanos
    bigint (legacy nanosAsLong layout), TIMESTAMP_NTZ (current parquet
    timestamp[us] testdata), and plain TIMESTAMP — all yielding the same
    epoch-micros integers (round-4 regression: an entry wrapper hard-coded
    the bigint arithmetic and broke when the testdata layout changed)."""
    import datetime

    from pyspark.sql import types as T

    us = 1_700_000_123_456_789  # an arbitrary instant, micro precision
    dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=us)

    legacy = spark.createDataFrame(
        [(us * 1000,)], T.StructType([T.StructField("ts", T.LongType())]))
    ntz = spark.createDataFrame(
        [(dt,)], T.StructType([T.StructField("ts", T.TimestampNTZType())]))
    ltz = spark.createDataFrame(
        [(dt,)], T.StructType([T.StructField("ts", T.TimestampType())]))

    for df in (legacy, ntz, ltz):
        assert df.select(ev.ts_micros(df).alias("us")).head()[0] == us


def test_ts_micros_ntz_independent_of_session_timezone(spark):
    """The NTZ path measures wall time against an NTZ epoch literal, so a
    non-UTC session must produce the same integers DuckDB's epoch_us gives
    (previously the NTZ→LTZ cast silently shifted by the session offset)."""
    import datetime

    from pyspark.sql import types as T

    us = 86_400_000_000  # 1970-01-02 00:00:00
    dt = datetime.datetime(1970, 1, 2)
    ntz = spark.createDataFrame(
        [(dt,)], T.StructType([T.StructField("ts", T.TimestampNTZType())]))

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert ntz.select(ev.ts_micros(ntz).alias("us")).head()[0] == us
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_register_testdata_pins_events_ts_contract(spark, tmp_path):
    """register_testdata must fail loudly when events.ts has a layout the
    event-time operators cannot dispatch on (e.g. a string column), instead
    of letting a later query die with DATATYPE_MISMATCH-at-a-distance."""
    import os
    import shutil

    import pytest

    from datafusion_substrait_spark.plans.proto import SubstraitError
    from datafusion_substrait_spark.sources import catalog

    bad_dir = str(tmp_path / "badsf")
    os.makedirs(bad_dir)
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}")],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(os.path.join(bad_dir, "events.parquet"))

    bound = catalog.testdata_dir(spark)
    with pytest.raises(SubstraitError, match="events.ts"):
        catalog.register_testdata(spark, bad_dir, tables=("events",),
                                  allow_rebind=True)
    # restore the session binding for the rest of the suite
    catalog.register_testdata(spark, bound, allow_rebind=True)
    shutil.rmtree(bad_dir, ignore_errors=True)


def test_stateful_ops_survive_null_columns(spark, tmp_path):
    """NULL user_id / value / event_type rows must not crash the streaming
    UDFs (int(NaN) / non-nullable int64 Series once killed the query) and
    must emit the same rows as the batch path."""
    from datafusion_substrait_spark.streaming import stateful

    rows = [
        (1, "2024-01-01 10:00:00", None, "click", None, None),
        (2, "2024-01-01 10:01:00", None, "click", None, None),   # dup of 1's fp
        (3, "2024-01-01 10:02:00", 7, None, 1.5, None),
        (4, "2024-01-01 10:03:00", 7, None, None, None),         # dup of 3's fp
        (5, "2024-01-01 10:04:00", 8, "view", None, None),       # all-NULL values
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    path = str(tmp_path / "null_events")
    df.coalesce(1).write.parquet(path)

    stream = ev.read_events_stream(spark, path)

    out = stateful.running_user_stats(stream)
    q = (out.writeStream.format("memory").queryName("null_stats")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.table("null_stats")
           .withColumn("_r", F.monotonically_increasing_id())
           .groupBy("user_id")
           .agg(F.max_by(F.struct("n_events", "sum_value", "max_value"),
                         "_r").alias("s"))
           .select("user_id", "s.n_events", "s.sum_value", "s.max_value"))
    expect = stateful.running_user_stats(df)
    assert rows_set(got) == rows_set(expect)
    # the all-NULL-value user emits NULL sum/max, like the batch aggregate
    nulluser = {r.user_id: (r.sum_value, r.max_value) for r in got.collect()}
    assert nulluser[8] == (None, None)
    assert nulluser[None][0] is None

    out2 = stateful.streaming_exact_dedup(stream)
    q2 = (out2.writeStream.format("memory").queryName("null_dedup")
          .outputMode("append").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    got2 = spark.table("null_dedup")
    expect2 = stateful.streaming_exact_dedup(df)
    assert rows_set(got2) == rows_set(expect2)
    assert got2.count() == 3  # (NULL,click), (7,NULL), (8,view)


def test_corpus_hygiene_ops_work_on_streams(spark):
    """The narrow-map corpus-hygiene operators (PII scrub/detect, URL
    blocklist, bloom decontamination's verify-free probe) run unchanged
    on a Structured Streaming source — they are pure projections/filters
    with no batch-only plan shape — and the streamed result equals the
    batch result. (remove_boilerplate_lines needs a corpus-wide
    aggregation + self-join, which streaming forbids by design; it stays
    a batch stage.)"""
    from datafusion_substrait_spark.operators import contamination, pii

    docs_path = f"{SF_DIR}/documents.parquet"
    batch = spark.read.parquet(docs_path).select("doc_id", "text")
    schema = batch.schema
    # single-file test layout: stream the parent dir with a glob filter
    # (the file source wants a directory), same trick as read_events_stream
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "documents.parquet")
              .parquet(f"{SF_DIR}")
              .select("doc_id", "text"))

    bench = batch.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "text")

    scrubbed = pii.scrub_pii(stream)
    detected = pii.detect_pii(scrubbed)   # chained hygiene stages
    blocked = pii.filter_blocked_domains(stream, ["blocked.example"])
    # bloom_decontaminate's anti-join shape is batch-only (stream-stream
    # anti-joins are unsupported); bloom_contamination_flag IS the
    # streaming shape — a pure narrow map with identical verify=False
    # semantics, filterable in-stream
    flag_stream = (contamination.bloom_contamination_flag(
        stream, bench, n=5)
        .filter(~F.col("is_contaminated")).select("doc_id"))
    flag_batch = (contamination.bloom_contamination_flag(
        batch, bench, n=5)
        .filter(~F.col("is_contaminated")).select("doc_id"))
    # and the flag's survivor set equals bloom_decontaminate(verify=False)
    decon_batch = contamination.bloom_decontaminate(
        batch, bench, n=5, verify=False).select("doc_id")
    assert rows_set(flag_batch) == rows_set(decon_batch)

    # r8 narrow text ops stream unchanged too: markup stripping and the
    # Gopher rule gate are pure per-row projections
    from datafusion_substrait_spark.operators import text as text_ops

    stripped = text_ops.strip_markup(stream)
    gated = (text_ops.gopher_quality_flags(stream)
             .filter(~F.col("gopher_flagged")).select("doc_id"))

    for name, sdf, expect in [
        ("pii_scrub_detect", detected, pii.detect_pii(pii.scrub_pii(batch))),
        ("blocklist", blocked, pii.filter_blocked_domains(
            batch, ["blocked.example"])),
        ("bloom_flag", flag_stream, flag_batch),
        ("strip_markup", stripped, text_ops.strip_markup(batch)),
        ("gopher_gate", gated,
         text_ops.gopher_quality_flags(batch)
         .filter(~F.col("gopher_flagged")).select("doc_id")),
    ]:
        q = (sdf.writeStream.format("memory").queryName(f"hyg_{name}")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = spark.table(f"hyg_{name}")
        assert rows_set(got) == rows_set(expect), name


def test_streaming_hamming_store_daily_append_loop(spark, tmp_path):
    """The daily-append near-dup loop end-to-end AS A STREAM (r9):
    file-arrival binaryFile stream → image_phash → foreachBatch
    (hamming_pairs_increment, then append_to_hamming_store) across ≥2
    micro-batch generations. The union of per-batch increments must
    equal the new-touching subset of the full batch hamming_pairs over
    store ∪ all streamed files — regardless of how the files split into
    micro-batches (each pair is emitted exactly once, when its latest
    member arrives)."""
    import os

    import numpy as np

    from datafusion_substrait_spark.operators import (dedup, incremental,
                                                      multimodal)
    from datafusion_substrait_spark.sources.catalog import register_binary_dir
    from tests.test_operators import _encode_png

    rng = np.random.default_rng(47)
    scan = (list(range(5)) * 7)[:32]

    def png(img):
        return bytes(_encode_png(img.tolist(), 0, scan))

    def noised(b):
        return np.clip(b.astype(int) + rng.integers(-2, 3, b.shape),
                       0, 255).astype(np.uint8)

    base = [rng.integers(0, 256, (32, 32), np.uint8) for _ in range(4)]
    store_dir = tmp_path / "store_gen"
    crawl = tmp_path / "crawl_gen"
    store_dir.mkdir()
    crawl.mkdir()
    # store generation: one noised copy of each base image
    for i, b in enumerate(base):
        (store_dir / f"s{i}.png").write_bytes(png(noised(b)))
    # streamed generations: two more copies of each base (near-dups of
    # the store AND of each other), staggered mtimes so the file source
    # splits them deterministically across micro-batches
    files = []
    for g in range(2):
        for i, b in enumerate(base):
            p = crawl / f"g{g}_{i}.png"
            p.write_bytes(png(noised(b)))
            files.append((p, 1_700_000_000 + g * 1000 + i))
    for p, mt in files:
        os.utime(p, (mt, mt))

    for t in ("sh_store_hbuckets", "sh_store_h_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    old = multimodal.image_phash(
        register_binary_dir(spark, "sh_gen0", str(store_dir), glob="*.png"))
    incremental.write_hamming_store(old, "sh_store", key_col="key",
                                    sig_col="phash", n_buckets=4)

    got_pairs: set = set()
    batch_ids: list[int] = []

    def process(batch_df, epoch_id):
        sigs = multimodal.image_phash(
            batch_df.select(F.xxhash64("path").alias("key"),
                            F.col("content").alias("payload")))
        inc = incremental.hamming_pairs_increment(sigs, "sh_store",
                                                  max_hamming=6)
        got_pairs.update((r.key_a, r.key_b, r.hamming)
                         for r in inc.collect())
        incremental.append_to_hamming_store(sigs, "sh_store")
        batch_ids.append(epoch_id)

    schema = spark.read.format("binaryFile").load(str(crawl)).schema
    q = (spark.readStream.format("binaryFile")
         .option("pathGlobFilter", "*.png")
         .option("maxFilesPerTrigger", 4)
         .schema(schema).load(str(crawl))
         .writeStream.foreachBatch(process)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    assert len(batch_ids) >= 2, f"expected >=2 micro-batches: {batch_ids}"

    new = multimodal.image_phash(
        register_binary_dir(spark, "sh_new", str(crawl), glob="*.png"))
    new_keys = {r.key for r in new.select("key").collect()}
    full = {(r.key_a, r.key_b, r.hamming)
            for r in dedup.hamming_pairs(
                old.unionByName(new), key_col="key", sig_col="phash",
                max_hamming=6, out_prefix="key").collect()}
    want = {p for p in full if p[0] in new_keys or p[1] in new_keys}
    assert got_pairs == want and got_pairs
    # and the store now holds everything: a fresh increment of an
    # already-seen near-dup family finds its neighbors in ONE probe
    assert spark.table("sh_store_hbuckets").count() > 0


def test_binary_ingestion_streams_with_phash_parity(spark, tmp_path):
    """File-arrival streaming ingestion for multimodal payloads: the
    binaryFile source readStreams over a crawl directory and the
    Arrow-batched perceptual-hash map runs unchanged on it — streamed
    (key, phash) equals the batch register_binary_dir path."""
    import numpy as np

    from datafusion_substrait_spark.operators import multimodal
    from datafusion_substrait_spark.sources.catalog import register_binary_dir
    from tests.test_operators import _encode_png

    rng = np.random.default_rng(43)
    scan = (list(range(5)) * 7)[:32]
    d = tmp_path / "crawl"
    d.mkdir()
    for n in range(3):
        img = rng.integers(0, 256, (32, 32), np.uint8)
        (d / f"img{n}.png").write_bytes(
            bytes(_encode_png(img.tolist(), 0, scan)))

    batch = register_binary_dir(spark, "crawl_b", str(d), glob="*.png")
    want = rows_set(multimodal.image_phash(batch))

    stream = (spark.readStream.format("binaryFile")
              .option("pathGlobFilter", "*.png")
              .schema(spark.read.format("binaryFile").load(str(d)).schema)
              .load(str(d))
              .select(F.xxhash64("path").alias("key"),
                      F.col("content").alias("payload")))
    out = multimodal.image_phash(stream)
    q = (out.writeStream.format("memory").queryName("stream_phash")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = rows_set(spark.table("stream_phash"))
    assert got == want and got


def _nan_safe_rows(df):
    """rows_set that can compare NaN cells (NaN != NaN would make two
    identical result sets unequal)."""
    out = set()
    for r in df.collect():
        out.add(tuple("NaN" if isinstance(v, float) and v != v else v
                      for v in r))
    return out


def test_running_stats_nan_values_stream_equals_batch(spark, tmp_path):
    """r15 (VERDICT r14 #4): the last-row≡batch invariant must hold on a
    planted-NaN corpus. NaN and NULL are indistinguishable after the
    Arrow transfer into the state function, so the distinction rides a
    JVM-side isnan sentinel; a user who ever saw NaN emits NaN sum/max
    exactly like the batch aggregate (sum propagates NaN, max ranks NaN
    greatest), and NaN still counts as non-NULL."""
    from datafusion_substrait_spark.streaming import stateful

    nan = float("nan")
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0, None),
        (2, "2024-01-01 10:01:00", 1, "click", nan, None),
        (3, "2024-01-01 10:02:00", 1, "click", 2.0, None),
        (4, "2024-01-01 10:03:00", 2, "view", nan, None),   # NaN-only user
        (5, "2024-01-01 10:04:00", 3, "view", None, None),
        (6, "2024-01-01 10:05:00", 3, "view", 5.0, None),   # NULL+real mix
        (7, "2024-01-01 10:06:00", 4, "view", None, None),  # all-NULL user
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    path = str(tmp_path / "nan_events")
    df.coalesce(1).write.parquet(path)

    stream = ev.read_events_stream(spark, path)
    out = stateful.running_user_stats(stream)
    q = (out.writeStream.format("memory").queryName("nan_stats")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.table("nan_stats")
           .withColumn("_r", F.monotonically_increasing_id())
           .groupBy("user_id")
           .agg(F.max_by(F.struct("n_events", "sum_value", "max_value"),
                         "_r").alias("s"))
           .select("user_id", "s.n_events", "s.sum_value", "s.max_value"))
    expect = stateful.running_user_stats(df)
    assert _nan_safe_rows(got) == _nan_safe_rows(expect)
    by_uid = {r.user_id: (r.n_events, r.sum_value, r.max_value)
              for r in got.collect()}
    assert by_uid[1][0] == 3
    assert by_uid[1][1] != by_uid[1][1] and by_uid[1][2] != by_uid[1][2]
    assert by_uid[2][1] != by_uid[2][1]              # NaN-only → NaN, not NULL
    assert by_uid[3] == (2, 5.0, 5.0)                # NULLs skipped
    assert by_uid[4][1] is None and by_uid[4][2] is None


def test_stream_dedup_tie_break_matches_batch(spark, tmp_path):
    """r15 (ADVICE r14, low): two DISTINCT rows sharing a fingerprint
    AND an event_id inside one micro-batch must elect the same row the
    batch branch's (event_id, user_id, value nulls-first) ordering
    elects — bare idxmin used to pick whichever arrived first."""
    from datafusion_substrait_spark.streaming import stateful

    rows = [
        # fp (1, click): same event_id, values 2.0 then 1.0 — batch picks 1.0
        (100, "2024-01-01 10:00:00", 1, "click", 2.0, None),
        (100, "2024-01-01 10:00:01", 1, "click", 1.0, None),
        # fp (2, view): same event_id, NULL arrives second — nulls-first wins
        (200, "2024-01-01 10:01:00", 2, "view", 3.0, None),
        (200, "2024-01-01 10:01:01", 2, "view", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    path = str(tmp_path / "tie_events")
    df.coalesce(1).write.parquet(path)

    stream = ev.read_events_stream(spark, path)
    out = stateful.streaming_exact_dedup(stream)
    q = (out.writeStream.format("memory").queryName("tie_dedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("tie_dedup")
    expect = stateful.streaming_exact_dedup(df)
    assert rows_set(got) == rows_set(expect)
    by_uid = {r.user_id: r.value for r in got.collect()}
    assert by_uid[1] == 1.0 and by_uid[2] is None


def test_stream_dedup_nan_values_match_batch(spark, tmp_path):
    """r15 parallel of the running_user_stats NaN fix: the elected row's
    NaN value must survive into the stream output (Arrow turns NaN into
    NULL in both directions without the sentinel), and NaN must rank
    GREATEST in the election exactly like Spark's batch ordering (NULL
    first, real values, NaN last)."""
    nan = float("nan")
    rows = [
        # fp (1, click), tied event_id: real value beats NaN (NaN greatest)
        (100, "2024-01-01 10:00:00", 1, "click", nan, None),
        (100, "2024-01-01 10:00:01", 1, "click", 7.0, None),
        # fp (2, view), tied event_id: NULL beats NaN (nulls first)
        (200, "2024-01-01 10:01:00", 2, "view", nan, None),
        (200, "2024-01-01 10:01:01", 2, "view", None, None),
        # fp (3, view): NaN-only — the output row must carry NaN, not NULL
        (300, "2024-01-01 10:02:00", 3, "view", nan, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    path = str(tmp_path / "nan_dedup_events")
    df.coalesce(1).write.parquet(path)

    from datafusion_substrait_spark.streaming import stateful

    stream = ev.read_events_stream(spark, path)
    out = stateful.streaming_exact_dedup(stream)
    q = (out.writeStream.format("memory").queryName("nan_dedup2")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("nan_dedup2")
    expect = stateful.streaming_exact_dedup(df)
    assert _nan_safe_rows(got) == _nan_safe_rows(expect)
    by_uid = {r.user_id: r.value for r in got.collect()}
    assert by_uid[1] == 7.0
    assert by_uid[2] is None
    assert by_uid[3] != by_uid[3]  # genuine NaN preserved


def test_elect_key_bigint_precision_above_2_53():
    """r16 (ADVICE r15): the cross-micro-batch election key compared ids
    as float64, so bigints above 2^53 differing only in low bits tied and
    the election could pick a different row than the batch row_number.
    Python-int comparison is exact; pin it on ids float() cannot tell
    apart, in both orderings."""
    import numpy as np

    from datafusion_substrait_spark.streaming.stateful import _elect_key

    big, bigger = 2**53, 2**53 + 1   # float64 rounds the odd one down
    assert float(big) == float(bigger)
    lo = {"event_id": np.int64(7), "user_id": np.int64(big),
          "value": 1.0, "_vnan": False}
    hi = {"event_id": np.int64(7), "user_id": np.int64(bigger),
          "value": 1.0, "_vnan": False}
    assert _elect_key(lo) < _elect_key(hi)
    # event_id precision too — exact when the column arrives int64
    # (no same-batch NULL); a NULL in the same batch degrades the whole
    # column to float64 at the Arrow hop BEFORE _elect_key runs, which
    # no election key can undo (documented residual, stateful.py)
    e_lo = dict(lo, event_id=np.int64(big))
    e_hi = dict(lo, event_id=np.int64(bigger))
    assert _elect_key(e_lo) < _elect_key(e_hi)
    # NULL user_id still ranks first, NaN value still ranks last
    nul = dict(lo, user_id=float("nan"))
    assert _elect_key(nul) < _elect_key(lo)
    nanv = dict(lo, value=float("nan"), _vnan=True)
    assert _elect_key(lo) < _elect_key(nanv)


def test_warn_inexact_ids_flags_float64_degraded_bigints():
    """r17 (ADVICE r16): the >2^53-with-same-batch-NULL residual is
    upstream of any election code and unfixable there — but it IS
    detectable. _warn_inexact_ids must warn exactly when a column is
    BOTH float64-degraded and carries >2^53 magnitudes, and stay silent
    for exact int64/Int64 batches and for small float64 values (where
    rounding is lossless)."""
    import warnings

    import pandas as pd

    from datafusion_substrait_spark.streaming.stateful import (
        _warn_inexact_ids,
    )

    degraded = pd.DataFrame({
        "event_id": pd.Series([float(2**53 + 2), None], dtype="float64"),
        "user_id": pd.Series([1.0, 2.0], dtype="float64")})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _warn_inexact_ids(degraded)
    assert len(w) == 1 and "event_id" in str(w[0].message) \
        and "2^53" in str(w[0].message)

    # per-BATCH, not once-per-worker (review catch r17): under the
    # DEFAULT filters a second degraded batch hours later must still
    # warn — the per-location registry dedup would otherwise silence
    # every divergence window after the first in a reused worker
    with warnings.catch_warnings(record=True) as w:
        warnings.resetwarnings()  # default filters, fresh registry view
        _warn_inexact_ids(degraded)
        _warn_inexact_ids(degraded)
    assert len(w) == 2, [str(x.message) for x in w]

    exact_int = pd.DataFrame({
        "event_id": pd.Series([2**53 + 2], dtype="int64"),
        "user_id": pd.Series([2**60], dtype="int64")})
    small_float = pd.DataFrame({
        "event_id": pd.Series([7.0, None], dtype="float64"),
        "user_id": pd.Series([3.0], dtype="float64").reindex(range(2))})
    for pdf in (exact_int, small_float):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            _warn_inexact_ids(pdf)
        assert not w, [str(x.message) for x in w]


def test_state_or_default_tolerates_pre_r15_4_field_state():
    """r16 (ADVICE r15): the r15 NaN fix widened running_user_stats'
    state schema 4→5 fields; a pre-r15 checkpoint that slips past the
    state-store schema check must unpack with hn=False, not crash the
    query. The docstring carries the discard-the-checkpoint migration
    note; this pins the defensive unpack."""
    from datafusion_substrait_spark.streaming.stateful import (
        _state_or_default,
    )

    assert _state_or_default(None) == (0, 0.0, float("-inf"), 0, False)
    assert _state_or_default((3, 1.5, 9.0, 2)) == (3, 1.5, 9.0, 2, False)
    assert _state_or_default((3, 1.5, 9.0, 2, True)) == (3, 1.5, 9.0, 2, True)


def test_stream_dedup_bigint_tie_above_2_53_matches_batch(spark, tmp_path):
    """r16 end-to-end pin for the ADVICE r15 precision fix: two rows tied
    on (fingerprint, event_id) whose user_ids differ only below float64
    precision (2^53 vs 2^53+1) — the election must pick the smaller id's
    row exactly like the batch row_number, in-batch and drained."""
    big = 2**53
    df = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", big + 1, "click", 1.0, ""),
         (10, "2024-01-01 00:00:01", big, "click", 2.0, "")],
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    path = str(tmp_path / "bigid_events")
    df.coalesce(1).write.parquet(path)

    from datafusion_substrait_spark.streaming import stateful

    want = {(r.event_id, r.user_id, r.value) for r in
            stateful.streaming_exact_dedup(
                df, fingerprint_cols=("event_type",)).collect()}
    stream = ev.read_events_stream(spark, path)
    out = stateful.streaming_exact_dedup(stream,
                                         fingerprint_cols=("event_type",))
    q = (out.writeStream.format("memory").queryName("bigid_dedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.event_id, r.user_id, r.value)
           for r in spark.table("bigid_dedup").collect()}
    assert got == want == {(10, big, 2.0)}
