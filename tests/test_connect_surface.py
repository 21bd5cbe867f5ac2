"""Spark Connect surface invariants (docs/spark_connect_spike.md).

A live Connect session needs grpcio (not available here), so the
testable part of the spike is a SOURCE invariant: the consume path is
written entirely against the public DataFrame API and must stay free of
the py4j bridge, because that is exactly what makes
``from_substrait_plan`` expected-to-work on a Connect session. The
produce path's single, fenced ``_jdf`` use is asserted too, so the
Connect error stays accurate about where the boundary is.
"""

from __future__ import annotations

import os
import re

PKG = os.path.join(os.path.dirname(__file__), os.pardir,
                   "datafusion_substrait_spark")

# attribute accesses that only exist on classic (JVM-bridged) sessions
_BRIDGE = re.compile(r"\b_jdf\b|\b_jvm\b|\b_jsc\b|\bsparkContext\b")

# the consume/serialize/catalog surface must work without the bridge
CONNECT_CLEAN = [
    "plans/consumer.py",
    "plans/serializer.py",
    "plans/wire.py",
    "plans/proto.py",
    "plans/types.py",
    "sources/catalog.py",
    "functions/ops.py",
    "functions/registry.py",
]


def _code_lines(path):
    """Source lines with comments and docstrings stripped (the spike doc
    discusses the bridge by name; only CODE uses count)."""
    with open(path) as fh:
        src = fh.read()
    # drop triple-quoted blocks, then per-line comments
    src = re.sub(r'"""(?:.|\n)*?"""', "", src)
    src = re.sub(r"'''(?:.|\n)*?'''", "", src)
    for line in src.splitlines():
        yield line.split("#", 1)[0]


def test_consume_path_has_no_jvm_bridge():
    offenders = []
    for rel in CONNECT_CLEAN:
        path = os.path.join(PKG, rel)
        for i, line in enumerate(_code_lines(path), 1):
            if _BRIDGE.search(line):
                offenders.append(f"{rel}:{i}: {line.strip()}")
    assert not offenders, (
        "the consume path must stay free of the py4j bridge so it keeps "
        "working on Spark Connect (docs/spark_connect_spike.md):\n"
        + "\n".join(offenders)
    )


def test_consume_path_runs_on_a_live_connect_session(tmp_path):
    """Executable witness for the spike's Finding 1 (r7 VERDICT
    directive 8): the moment an environment has the Connect client's
    grpc stack, this test produces plan bytes on a CLASSIC session
    (the producer needs the JVM bridge), then deserializes and CONSUMES
    them on a real Spark Connect session — proving the consume path
    truly needs nothing beyond the public DataFrame API. In this
    container it self-skips at the grpcio import."""
    import pytest

    pytest.importorskip("grpc")
    pytest.importorskip("google.protobuf")

    from pyspark.sql import SparkSession

    from datafusion_substrait_spark.plans.consumer import from_substrait_plan
    from datafusion_substrait_spark.plans.serializer import (deserialize,
                                                             serialize)
    from datafusion_substrait_spark.sources.catalog import register_testdata

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                            "/root/testdata/sf0.001")
    sql = ("SELECT r_regionkey, upper(r_name) AS rname "
           "FROM region WHERE r_regionkey > 0")
    plan_path = str(tmp_path / "q.plan")

    classic = (SparkSession.builder.master("local[2]")
               .config("spark.sql.shuffle.partitions", "2")
               .config("spark.sql.session.timeZone", "UTC")
               .config("spark.ui.enabled", "false").getOrCreate())
    try:
        register_testdata(classic, sf_dir)
        serialize(sql, classic, plan_path)
        expect = sorted(map(tuple, classic.sql(sql).collect()))
    finally:
        classic.stop()

    # builder.remote("local") spawns a local Connect server in-process
    connect = SparkSession.builder.remote("local").getOrCreate()
    try:
        register_testdata(connect, sf_dir)
        got = sorted(map(tuple, from_substrait_plan(
            connect, deserialize(plan_path)).collect()))
    finally:
        connect.stop()
    assert got == expect and got


def test_producer_bridge_use_is_single_and_fenced():
    """to_substrait_plan's JVM-bridge dependency is exactly one call,
    guarded by the up-front Connect detection that raises a named
    SubstraitError (producer.py) — not scattered accesses that would
    fail with opaque AttributeErrors mid-walk."""
    path = os.path.join(PKG, "plans", "producer.py")
    uses = [line.strip() for line in _code_lines(path)
            if re.search(r"\b_jdf\b", line)]
    assert len(uses) == 2, uses  # the hasattr fence + the one real use
    assert any("hasattr" in u for u in uses), uses
    assert any("optimizedPlan" in u for u in uses), uses
