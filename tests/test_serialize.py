"""Port of tests/serialize.rs (serialize_simple_select, serialize.rs:13-36):
SQL → plan bytes on disk → deserialize → consume → same results as direct.
"""

from __future__ import annotations

import json
import os

from datafusion_substrait_spark import deserialize, from_substrait_plan, serialize
from tests.conftest import assert_same_result


def test_serialize_roundtrip_file(spark, tmp_path):
    sql = "SELECT n_nationkey, n_name FROM nation"
    path = os.path.join(tmp_path, "simple_select.substrait.json")
    serialize(sql, spark, path)

    # bytes on disk are canonical proto3-JSON (field-name compatible)
    with open(path, "rb") as f:
        raw = json.load(f)
    # a function-free plan has no extensions key (canonical form omits
    # empty repeated fields, matching proto3 wire presence)
    assert set(raw) == {"relations", "version"}
    assert "root" in raw["relations"][0]

    plan = deserialize(path)
    assert_same_result(spark.sql(sql), from_substrait_plan(spark, plan))


def test_deserialize_rejects_garbage(spark, tmp_path):
    import pytest

    from datafusion_substrait_spark import SubstraitError

    p = os.path.join(tmp_path, "bad.json")
    with open(p, "w") as f:
        f.write('{"relations": []}')
    with pytest.raises(SubstraitError):
        deserialize(p)
