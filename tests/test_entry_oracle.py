"""Local replica of the driver's t2 correctness gate: run every
``__spark_entry__.queries()`` entry and its DuckDB oracle side-by-side,
compare row count + column names + order-insensitive values.

Default SF for CI speed is sf0.001; run with
``SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01`` for the driver-equivalent
check. Float columns compare exactly after the in-query rounding — if that
ever drifts, the assertion message shows the max delta so the rounding margin
can be revisited.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(rows):
    out = []
    for row in rows:
        canon_row = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    canon_row.append("NaN")
                else:
                    canon_row.append(round(v, 9))
            else:
                canon_row.append(v)
        out.append(tuple(str(x) for x in canon_row))
    return sorted(out)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY_KEYS = sorted(set(entrymod.queries()) - set(ORACLE_KEYS))


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = ddb.sql(entrymod.oracle_sql()[name])
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    # order-insensitive, column-name-aligned compare (driver sorts by name)
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_vals = _canon([[r[i] for i in s_idx] for r in spark_rows])
    d_vals = _canon([[r[i] for i in d_idx] for r in duck_rows])
    mismatches = [i for i, (a, b) in enumerate(zip(s_vals, d_vals)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} value mismatches; first: "
        f"spark={s_vals[mismatches[0]]} duck={d_vals[mismatches[0]]}"
    )


def test_every_entry_has_an_oracle():
    """Invariant, not a skip: every queries() entry carries a DuckDB oracle
    so the driver's strong (rows+schema+hash) check covers all of them.
    If this fires, either add the oracle_sql() entry or consciously accept
    a weaker rows-only driver check (and re-add a run-only test here)."""
    assert not ROWS_ONLY_KEYS, f"entries without an oracle: {ROWS_ONLY_KEYS}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_entry_does_not_clobber_session_views(spark):
    """Round-1 regression: entry() hard-coded sf0.001 and re-registered every
    temp view over a session bound to another scale factor, so later tests
    silently read the wrong tables. entry() must reuse the bound dir."""
    from datafusion_substrait_spark.sources import catalog

    before = spark.table("events").count()
    entrymod.entry(spark)
    assert catalog.testdata_dir(spark) == os.path.abspath(SF_DIR).rstrip("/")
    assert spark.table("events").count() == before
    expect = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).count()
    assert before == expect


def test_register_testdata_refuses_silent_rebind(spark):
    from datafusion_substrait_spark.plans.proto import SubstraitError
    from datafusion_substrait_spark.sources import catalog

    other = ("/root/testdata/sf0.01"
             if os.path.abspath(SF_DIR) != "/root/testdata/sf0.01"
             else "/root/testdata/sf0.001")
    with pytest.raises(SubstraitError, match="refusing"):
        catalog.register_testdata(spark, other)
    # session binding unchanged
    assert catalog.testdata_dir(spark) == os.path.abspath(SF_DIR).rstrip("/")
