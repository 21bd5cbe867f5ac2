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


def _canon_row(row):
    canon_row = []
    for v in row:
        if isinstance(v, float):
            if math.isnan(v):
                canon_row.append("NaN")
            else:
                canon_row.append(round(v, 9))
        else:
            canon_row.append(v)
    return tuple(str(x) for x in canon_row)


def _canon(rows):
    return sorted(_canon_row(r) for r in rows)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY_KEYS = sorted(set(entrymod.queries()) - set(ORACLE_KEYS))

# Entries whose ORACLE is scoped to the driver's small SFs (<= 0.01) by
# design, skipped by the opt-in bench-scale (sf0.1) run of this gate:
#   - d2/d4/d6 replay exact all-pairs Jaccard in DuckDB: 125k pair
#     intersections at 500 docs but 12.5M at sf0.1's 5000 docs (d6 adds a
#     recursive-CTE closure on top), and
#   - d2/d6 compare an LSH candidate generator against that EXACT graph.
#     Recall is deterministically 1 at sf0.01 — every qualifying pair is a
#     planted near-dup with J >= 0.92, band-collision probability
#     1-(1-J^4)^8 ~ 1-1e-9 — but sf0.1 contains organic borderline pairs
#     (J barely >= 0.35, collision probability ~0.11) the banding is
#     *contractually allowed* to miss, so exact graph equality is the wrong
#     check there. The Spark side's scale behavior is pinned separately by
#     tests/test_scale_stress.py.
SMALL_SF_ORACLE_KEYS = {"d2_minhash_pairs", "d4_neardup_pairs",
                        "d6_dedup_clusters", "d7_incremental_dedup"}

# Columns that are approximate BY CONTRACT (sketch outputs). Exact at the
# driver's sf0.01 — group sizes sit below the GK summary's exactness bound,
# so the driver's hash compare is still strict there — but genuinely
# approximate at sf0.1 (observed rel. drift ~4e-5 at accuracy=100000, whose
# guarantee is on RANK error <= n/accuracy, not value). 1e-3 relative is a
# generous value-space proxy; everything else in the row stays exact.
APPROX_COLS = {"q26_stats": {"p50": 1e-3, "p90": 1e-3}}
_N_DOCS = None


def _docs_rows() -> int:
    global _N_DOCS
    if _N_DOCS is None:
        _N_DOCS = duckdb.sql(
            f"select count(*) from '{os.path.join(SF_DIR, 'documents.parquet')}'"
        ).fetchone()[0]
    return _N_DOCS


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    if name in SMALL_SF_ORACLE_KEYS and _docs_rows() > 1000:
        pytest.skip(f"{name}: exact all-pairs DuckDB oracle is scoped to "
                    f"sf<=0.01 (cost + LSH recall contract); {_docs_rows()} "
                    f"docs exceeds its design scale")
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
    approx = APPROX_COLS.get(name, {})
    exact_cols = [c for c in sorted(spark_cols) if c not in approx]
    s_idx = [spark_cols.index(c) for c in exact_cols]
    d_idx = [duck_cols.index(c) for c in exact_cols]
    s_keys = [_canon_row([r[i] for i in s_idx]) for r in spark_rows]
    d_keys = [_canon_row([r[i] for i in d_idx]) for r in duck_rows]
    s_vals, d_vals = sorted(s_keys), sorted(d_keys)
    mismatches = [i for i, (a, b) in enumerate(zip(s_vals, d_vals)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} value mismatches; first: "
        f"spark={s_vals[mismatches[0]]} duck={d_vals[mismatches[0]]}"
    )
    if approx:
        # pair rows via the exact columns (must be a unique key for the
        # tolerant compare to be well-defined), then bound relative error
        s_order = sorted(range(len(spark_rows)), key=lambda i: s_keys[i])
        d_order = sorted(range(len(duck_rows)), key=lambda i: d_keys[i])
        assert len(set(s_keys)) == len(s_keys), (
            f"{name}: exact columns do not key rows uniquely; "
            f"tolerant compare undefined"
        )
        for col, rtol in approx.items():
            si, di = spark_cols.index(col), duck_cols.index(col)
            for srow, drow in zip(s_order, d_order):
                a, b = spark_rows[srow][si], duck_rows[drow][di]
                denom = max(abs(a), abs(b), 1e-12)
                assert abs(a - b) / denom <= rtol, (
                    f"{name}.{col}: |{a} - {b}| rel error "
                    f"{abs(a - b) / denom:.2e} > {rtol}"
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
