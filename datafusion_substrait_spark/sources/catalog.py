"""Catalog registration: named tables over file sources.

The reference resolves ``NamedTable`` names against the session catalog
(``ctx.table``, consumer.rs:339); tables enter the catalog via
``ctx.register_csv`` (tests/roundtrip.rs:294-297). Spark temp views play that
role here — but Spark's *optimized* logical plan collapses a temp view into
its underlying file relation, losing the name. This module therefore keeps a
process-wide path→name map filled at registration time, which the producer
uses to recover the NamedTable name from a scan's root path (the analogue of
DataFusion keeping ``table_name`` on its TableScan node, producer.rs:104-107).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_substrait_spark.plans.proto import SubstraitError

_PATH_TO_NAME: dict[str, str] = {}

# session id → sf_dir its testdata views are bound to. Temp-view registration
# silently rebinds names (createOrReplaceTempView), so callers that mix scale
# factors in one session would otherwise read the wrong tables without any
# error; this record lets register_testdata refuse (or knowingly rebind) and
# lets entry()-style callers reuse whatever the session is already bound to.
# WeakKeyDictionary: keyed by the live session OBJECT, not id(spark) — a
# stopped session's id can be reused by CPython for a brand-new session,
# which would then inherit a stale binding (or be spuriously refused), and
# an id-keyed dict also grows unboundedly across session restarts.
_SESSION_SF_DIR: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _norm(path: str) -> str:
    p = path.removeprefix("file://").removeprefix("file:")
    return os.path.abspath(p).rstrip("/")


def register_parquet(spark: SparkSession, name: str, path: str) -> DataFrame:
    """``spark.read.parquet(path)`` + temp view + name recovery (≡ register_csv
    in tests/roundtrip.rs:294-297, with parquet as the idiomatic Spark format)."""
    df = spark.read.parquet(path)
    df.createOrReplaceTempView(name)
    _PATH_TO_NAME[_norm(path)] = name
    return df


def register_csv(spark: SparkSession, name: str, path: str, schema=None) -> DataFrame:
    reader = spark.read.option("header", "true")
    df = reader.schema(schema).csv(path) if schema is not None else \
        reader.option("inferSchema", "true").csv(path)
    df.createOrReplaceTempView(name)
    _PATH_TO_NAME[_norm(path)] = name
    return df


def register_json(spark: SparkSession, name: str, path: str, schema=None) -> DataFrame:
    """JSON-lines source + temp view + name recovery. Pass an explicit
    schema in production — inference is a full extra pass over the data."""
    reader = spark.read
    df = reader.schema(schema).json(path) if schema is not None else reader.json(path)
    df.createOrReplaceTempView(name)
    _PATH_TO_NAME[_norm(path)] = name
    return df


def register_binary_dir(spark: SparkSession, name: str, path: str,
                        glob: str | None = None,
                        recursive: bool = False) -> DataFrame:
    """Raw-payload ingestion for the multimodal pipeline: Spark's
    built-in ``binaryFile`` source over a directory of image/audio/video
    files, registered as a temp view with columns (key, path, length,
    modificationTime, payload) — ``payload`` feeds ``image_phash`` /
    ``extract_image_metadata`` / ``decode_audio`` / frame sampling
    directly, and ``key = xxhash64(path)`` gives the stable 64-bit join
    key every downstream operator expects (paths are unique within a
    crawl snapshot; the hash is deterministic across runs and engines
    that share the file listing).

    Scale notes: binaryFile is a real FileFormat — the scan parallelizes
    over files, prunes on the lazily-materialized ``content`` column
    (metadata-only queries never read payload bytes), and
    ``pathGlobFilter``/``recursiveFileLookup`` push into the listing.
    One file = one row; shard huge corpora into subdirs and pass
    ``recursive=True``."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path).select(
        F.xxhash64("path").alias("key"), "path", "length",
        "modificationTime", F.col("content").alias("payload"))
    df.createOrReplaceTempView(name)
    return df


def register_orc(spark: SparkSession, name: str, path: str) -> DataFrame:
    """ORC source + temp view + name recovery (schema from file metadata,
    same pushdown/pruning properties as parquet)."""
    df = spark.read.orc(path)
    df.createOrReplaceTempView(name)
    _PATH_TO_NAME[_norm(path)] = name
    return df


def register_view(name: str, path: str) -> None:
    """Record name recovery for an externally created view/relation."""
    _PATH_TO_NAME[_norm(path)] = name


def table_name_for_path(path: str) -> str:
    name = _PATH_TO_NAME.get(_norm(path))
    if name is None:
        raise SubstraitError(
            f"scan over unregistered path {path!r}: register the table via "
            "datafusion_substrait_spark.sources.catalog so its NamedTable name "
            "is recoverable (≡ producer.rs:104-107 table_name)"
        )
    return name


def testdata_dir(spark: SparkSession) -> str | None:
    """The sf_dir this session's testdata views are bound to (None if never
    registered). Callers that only need *some* consistent scale factor —
    e.g. ``entry()`` smoke paths — should reuse this instead of forcing a
    re-registration that would clobber views other code is reading."""
    return _SESSION_SF_DIR.get(spark)


def register_testdata(spark: SparkSession, sf_dir: str,
                      tables: tuple[str, ...] = (
                          "region", "nation", "customer", "supplier", "part",
                          "orders", "lineitem", "events", "documents", "embeddings",
                      ), allow_rebind: bool = False) -> dict[str, DataFrame]:
    """Register the driver's synthetic TPC-H-ish tables (TESTDATA.md).

    Raises if the session is already bound to a *different* sf_dir, because
    ``createOrReplaceTempView`` would silently swap every table out from
    under concurrent readers (the round-1 cross-SF clobbering bug). Pass
    ``allow_rebind=True`` to rebind deliberately.
    """
    bound = _SESSION_SF_DIR.get(spark)
    norm_dir = _norm(sf_dir)
    if bound is not None and bound != norm_dir and not allow_rebind:
        raise SubstraitError(
            f"session testdata views are bound to {bound!r}; refusing to "
            f"silently rebind them to {sf_dir!r} (pass allow_rebind=True "
            "to swap scale factors deliberately)"
        )
    # Validate the events.ts contract BEFORE any session state changes
    # (views replaced OR the timezone conf below): a failed registration
    # must not leave the session half-rebound or half-configured.
    events_path = os.path.join(sf_dir, "events.parquet")
    if "events" in tables and os.path.exists(events_path):
        _assert_events_ts_type(spark.read.parquet(events_path))
    # `events.ts` is parquet timestamp[us], which Spark reads as
    # TIMESTAMP_NTZ. Event-time integer arithmetic goes through
    # streaming.events.ts_micros (type-dispatching NTZ/LTZ/legacy-bigint →
    # epoch-micros, itself session-timezone-independent); UTC is pinned
    # here for the DISPLAY side — rendered timestamp columns like e1's
    # window_start must match DuckDB's naive wall clock.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out = {}
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            out[t] = register_parquet(spark, t, p)
    _SESSION_SF_DIR[spark] = norm_dir
    return out


def _assert_events_ts_type(events: DataFrame) -> None:
    """Pin the events.ts physical-type contract at the only place it can
    drift: registration. ts must be a timestamp (current testdata layout:
    parquet timestamp[us] → TIMESTAMP_NTZ) or the legacy epoch-nanos
    bigint — streaming.events.ts_micros dispatches on exactly these.
    Failing loudly here beats the DATATYPE_MISMATCH-at-a-distance a silent
    layout change caused in round 4."""
    from pyspark.sql import types as T

    if "ts" not in events.columns:
        raise SubstraitError(
            f"events table has no 'ts' column (columns: {events.columns}) — "
            "the testdata layout changed; update streaming.events and this "
            "assertion together"
        )
    t = events.schema["ts"].dataType
    if not isinstance(t, (T.TimestampNTZType, T.TimestampType, T.LongType)):
        raise SubstraitError(
            f"events.ts has unsupported type {t}: expected TIMESTAMP_NTZ/"
            "TIMESTAMP (parquet timestamp[us]) or epoch-nanos BIGINT (legacy "
            "nanosAsLong layout) — update streaming.events.ts_micros and this "
            "assertion together if the testdata layout really changed"
        )
