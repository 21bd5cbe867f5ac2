"""Serializer: SQL → plan bytes on disk, and back.

≡ ``src/serializer.rs``: ``serialize`` (serializer.rs:12-22) runs the SQL,
extracts the (optimized) logical plan, produces the interchange plan and
writes encoded bytes; ``deserialize`` (serializer.rs:24-33) reads bytes back
into a plan message. Two encodings:

* ``fmt="json"`` (default) — canonical proto3-JSON (plans/proto.py).
* ``fmt="proto"`` — binary protobuf wire format (plans/wire.py), matching
  the reference's prost encoding of the same messages.

``deserialize`` auto-detects: a JSON plan's first byte is ``{`` (0x7b),
which as a wire tag would be field 15 / wire type 3 (group start) — a
combination no substrait message uses, so sniffing one byte is unambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datafusion_substrait_spark.plans import proto, wire
from datafusion_substrait_spark.plans.consumer import from_substrait_plan
from datafusion_substrait_spark.plans.producer import to_substrait_plan


def serialize(sql: str, spark: SparkSession, path: str,
              fmt: str = "json") -> None:
    """SQL text → optimized plan → interchange bytes at ``path``
    (serializer.rs:12-22). ``fmt``: "json" or "proto" (binary wire)."""
    if fmt not in ("json", "proto"):
        raise proto.SubstraitError(f"unknown serialize format {fmt!r}")
    df = spark.sql(sql)
    plan = to_substrait_plan(df)
    payload = proto.dumps(plan) if fmt == "json" else wire.encode_plan(plan)
    with open(path, "wb") as f:
        f.write(payload)


def deserialize(path: str) -> dict:
    """Bytes at ``path`` → validated plan dict (serializer.rs:24-33).
    Accepts both encodings (format sniffed, see module docstring)."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:1] == b"{":
        return proto.loads(raw)
    return wire.decode_plan(raw)


def roundtrip(df: DataFrame, spark: SparkSession | None = None) -> DataFrame:
    """produce → (bytes) → consume, in memory: the reference test harness's
    path (tests/roundtrip.rs:247-262). Returns the re-executable DataFrame."""
    spark = spark or df.sparkSession
    plan = proto.loads(proto.dumps(to_substrait_plan(df)))
    return from_substrait_plan(spark, plan)
