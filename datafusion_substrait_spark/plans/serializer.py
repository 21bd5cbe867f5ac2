"""Serializer: SQL → plan bytes on disk, and back.

≡ ``src/serializer.rs``: ``serialize`` (serializer.rs:12-22) runs the SQL,
extracts the (optimized) logical plan, produces the interchange plan and
writes encoded bytes; ``deserialize`` (serializer.rs:24-33) reads bytes back
into a plan message. Encoding here is canonical JSON (see plans/proto.py);
the reference uses prost protobuf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datafusion_substrait_spark.plans import proto
from datafusion_substrait_spark.plans.consumer import from_substrait_plan
from datafusion_substrait_spark.plans.producer import to_substrait_plan


def serialize(sql: str, spark: SparkSession, path: str) -> None:
    """SQL text → optimized plan → interchange bytes at ``path``
    (serializer.rs:12-22)."""
    df = spark.sql(sql)
    plan = to_substrait_plan(df)
    with open(path, "wb") as f:
        f.write(proto.dumps(plan))


def deserialize(path: str) -> dict:
    """Bytes at ``path`` → validated plan dict (serializer.rs:24-33)."""
    with open(path, "rb") as f:
        return proto.loads(f.read())


def roundtrip(df: DataFrame, spark: SparkSession | None = None) -> DataFrame:
    """produce → (bytes) → consume, in memory: the reference test harness's
    path (tests/roundtrip.rs:247-262). Returns the re-executable DataFrame."""
    spark = spark or df.sparkSession
    plan = proto.loads(proto.dumps(to_substrait_plan(df)))
    return from_substrait_plan(spark, plan)
