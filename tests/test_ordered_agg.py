"""AggregateFunction.sorts rebuild on consume (r12, VERDICT r11 #3).

The reference never writes this field (producer.rs emits a plain
AggregateFunction; consumer.rs never reads ``sorts``), but foreign
producers do: DuckDB's substrait extension and DataFusion both encode
``array_agg(x ORDER BY y)`` / ``first(x ORDER BY y)`` with per-measure
SortFields. Before r12 the consumer fenced every sorted measure; these
tests pin the exact rebuild for the order-sensitive aggregates Spark CAN
express (array_agg / first_value / last_value via
``array_sort(collect_list(struct(keys…, value)), cmp)``) and the named
fences for the forms it can't (ordered DISTINCT, other aggregate names,
comparator sorts).

Plans are hand-authored the way a foreign producer would write them
(JSON IR + the binary wire + the foreign encoding from test_wire).
"""

from __future__ import annotations

import pytest

from datafusion_substrait_spark.plans import wire
from datafusion_substrait_spark.plans.proto import SubstraitError
from datafusion_substrait_spark.plans.consumer import from_substrait_plan

from tests.test_emit import I64, STR, field, read_rel  # noqa: E402

ASC_NF = "SORT_DIRECTION_ASC_NULLS_FIRST"
ASC_NL = "SORT_DIRECTION_ASC_NULLS_LAST"
DESC_NF = "SORT_DIRECTION_DESC_NULLS_FIRST"
DESC_NL = "SORT_DIRECTION_DESC_NULLS_LAST"


def agg_plan(input_rel: dict, group_fields: list[int], measures: list[dict],
             out_names: list[str], extensions: dict[int, str]) -> dict:
    rel = {"aggregate": {
        "input": input_rel,
        "groupings": [{"groupingExpressions": [field(i)
                                               for i in group_fields]}],
        "measures": measures,
    }}
    return {
        "relations": [{"root": {"input": rel, "names": out_names}}],
        "extensions": [{"extensionFunction": {"functionAnchor": a, "name": n}}
                       for a, n in extensions.items()],
    }


def measure(anchor: int, arg_fields: list[int], sorts: list[dict],
            filter_expr: dict | None = None, invocation: str | None = None,
            ) -> dict:
    body: dict = {
        "functionReference": anchor,
        "arguments": [{"value": field(i)} for i in arg_fields],
        "sorts": sorts,
        "phase": "AGGREGATION_PHASE_INITIAL_TO_RESULT",
    }
    if invocation:
        body["invocation"] = invocation
    out: dict = {"measure": body}
    if filter_expr is not None:
        out["filter"] = filter_expr
    return out


def sort(i: int, direction: str) -> dict:
    return {"expr": field(i), "direction": direction}


@pytest.fixture(scope="module")
def nulls_table(spark):
    """(g, k, k2, v) with nulls in both the sort key and the value — the
    branches the struct rebuild must keep exact."""
    spark.createDataFrame(
        [(0, 3, 1, "a"), (0, 1, 2, "b"), (0, None, 3, "c"),
         (0, 2, 4, None), (1, 5, 1, "x"), (1, 5, 2, "y"),
         (1, None, 3, None), (2, 7, 1, "only")],
        "g bigint, k bigint, k2 bigint, v string",
    ).createOrReplaceTempView("ordered_agg_probe")
    yield "ordered_agg_probe"
    spark.catalog.dropTempView("ordered_agg_probe")


PROBE_NAMES = ["g", "k", "k2", "v"]
PROBE_TYPES = [I64, I64, I64, STR]


def _consume_grouped(spark, plan):
    got = from_substrait_plan(spark, plan)
    return {r[0]: tuple(r[1:]) for r in got.collect()}


# --- the rebuild, against live data ------------------------------------------

def test_array_agg_ordered_on_tpch(spark, tables):
    plan = agg_plan(
        read_rel("nation", ["n_nationkey", "n_name", "n_regionkey"],
                 [I64, STR, I64]),
        [2], [measure(1, [1], [sort(0, DESC_NL)])],
        ["rk", "names_desc"], {1: "array_agg"})
    got = _consume_grouped(spark, plan)
    want = {r.n_regionkey: (r.names,) for r in spark.sql(
        "SELECT n_regionkey, array_sort(collect_list(struct(n_nationkey, "
        "n_name)), (a, b) -> CASE WHEN a.n_nationkey < b.n_nationkey THEN 1 "
        "WHEN a.n_nationkey > b.n_nationkey THEN -1 ELSE 0 END) AS s "
        "FROM nation GROUP BY 1").selectExpr(
            "n_regionkey", "transform(s, x -> x.n_name) AS names").collect()}
    assert got == want


@pytest.mark.parametrize("direction,want0", [
    (ASC_NF, [None, 1, 2, 3]),   # k order within group 0
    (ASC_NL, [1, 2, 3, None]),
    (DESC_NF, [None, 3, 2, 1]),
    (DESC_NL, [3, 2, 1, None]),
])
def test_array_agg_all_four_directions(spark, nulls_table, direction, want0):
    """All four SortField direction enums rebuild exactly, including null
    sort-key placement (aggregating k itself so order is observable)."""
    plan = agg_plan(read_rel(nulls_table, PROBE_NAMES, PROBE_TYPES),
                    [0], [measure(1, [1], [sort(1, direction)])],
                    ["g", "ks"], {1: "array_agg"})
    got = _consume_grouped(spark, plan)
    assert got[0] == (want0,)


def test_array_agg_keeps_null_values(spark, nulls_table):
    """Null VALUES are kept in order (DuckDB/DataFusion array_agg
    semantics; the struct wrapper is what preserves them — plain
    collect_list would silently drop the null elements)."""
    plan = agg_plan(read_rel(nulls_table, PROBE_NAMES, PROBE_TYPES),
                    [0], [measure(1, [3], [sort(1, ASC_NL)])],
                    ["g", "vs"], {1: "array_agg"})
    got = _consume_grouped(spark, plan)
    assert got[0] == (["b", None, "a", "c"],)   # k=1,2,3,null → b,null,a,c
    assert got[1] == (["x", "y", None],)
    assert got[2] == (["only"],)


def test_multikey_mixed_directions(spark, nulls_table):
    """Two sort keys with opposing directions: k ASC_NULLS_LAST then
    k2 DESC — the nested-CASE comparator threads tie-breaks exactly.
    Group 1 has a k tie (5, 5) broken by k2 DESC."""
    plan = agg_plan(read_rel(nulls_table, PROBE_NAMES, PROBE_TYPES),
                    [0],
                    [measure(1, [2], [sort(1, ASC_NL), sort(2, DESC_NF)])],
                    ["g", "k2s"], {1: "array_agg"})
    got = _consume_grouped(spark, plan)
    assert got[1] == ([2, 1, 3],)   # (5,2), (5,1) tie on k → k2 desc; null-k last
    assert got[0] == ([2, 4, 1, 3],)


def test_first_last_value_ordered(spark, nulls_table):
    """first_value/last_value with sorts: the x of the first/last row in
    the explicit order, RESPECTING null values (group 1's last row by
    k ASC_NULLS_LAST has a null v — the rebuild must return that null,
    not the last non-null)."""
    plan = agg_plan(
        read_rel(nulls_table, PROBE_NAMES, PROBE_TYPES), [0],
        [measure(1, [3], [sort(1, ASC_NL)]),
         measure(2, [3], [sort(1, ASC_NL)])],
        ["g", "first_v", "last_v"],
        {1: "first_value", 2: "last_value"})
    got = _consume_grouped(spark, plan)
    assert got[0] == ("b", "c")
    assert got[1] == ("x", None)    # null-k row sorts last; its v IS null
    assert got[2] == ("only", "only")


def test_ordered_measure_with_filter(spark, nulls_table):
    """Per-measure FILTER composes with sorts as ROW exclusion (the
    null-struct drop), including on first_value — sound here, unlike the
    unordered fence, because the explicit sort defines which surviving
    row is first. A group with every row filtered out yields NULL
    (SQL aggregate-over-empty, matching DuckDB), not []."""
    gt1 = {"scalarFunction": {"functionReference": 3,
                              "arguments": [{"value": field(1)},
                                            {"value": {"literal": {"i64": "6"}}}]}}
    plan = agg_plan(
        read_rel(nulls_table, PROBE_NAMES, PROBE_TYPES), [0],
        [measure(1, [3], [sort(1, ASC_NL)], filter_expr=gt1),
         measure(2, [3], [sort(1, ASC_NL)], filter_expr=gt1)],
        ["g", "vs", "first_v"],
        {1: "array_agg", 2: "first_value", 3: "gt"})
    got = _consume_grouped(spark, plan)
    assert got[2] == (["only"], "only")         # k=7 > 6 survives
    assert got[0] == (None, None)               # all rows filtered → NULL
    assert got[1] == (None, None)


def test_ordered_agg_matches_duckdb(spark, nulls_table):
    """Differential: the same ordered aggregate in DuckDB over the same
    rows (unique sort keys per group — tie order is unspecified in both
    engines)."""
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.sql("CREATE TABLE t AS FROM (VALUES (0, 3, 'a'), (0, 1, 'b'), "
            "(0, 2, NULL), (1, 9, 'z'), (1, 4, NULL)) v(g, k, v)")
    spark.createDataFrame(
        [(0, 3, "a"), (0, 1, "b"), (0, 2, None), (1, 9, "z"), (1, 4, None)],
        "g bigint, k bigint, v string",
    ).createOrReplaceTempView("ordered_agg_ddb")
    try:
        plan = agg_plan(
            read_rel("ordered_agg_ddb", ["g", "k", "v"], [I64, I64, STR]),
            [0],
            [measure(1, [2], [sort(1, DESC_NL)]),
             measure(2, [2], [sort(1, ASC_NL)]),
             measure(3, [2], [sort(1, ASC_NL)])],
            ["g", "vs", "first_v", "last_v"],
            {1: "array_agg", 2: "first_value", 3: "last_value"})
        got = _consume_grouped(spark, plan)
        want = {r[0]: (r[1], r[2], r[3]) for r in con.sql(
            "SELECT g, array_agg(v ORDER BY k DESC), first(v ORDER BY k), "
            "last(v ORDER BY k) FROM t GROUP BY g").fetchall()}
        assert got == want
    finally:
        spark.catalog.dropTempView("ordered_agg_ddb")


# --- both wires ---------------------------------------------------------------

def _wire_plan() -> dict:
    return agg_plan(
        read_rel("nation", ["n_nationkey", "n_name", "n_regionkey"],
                 [I64, STR, I64]),
        [2], [measure(1, [1], [sort(0, DESC_NL)])],
        ["rk", "names_desc"], {1: "array_agg"})


def test_sorted_measure_survives_binary_wire(spark, tables):
    plan = _wire_plan()
    decoded = wire.decode_plan(wire.encode_plan(plan))
    assert _consume_grouped(spark, decoded) == _consume_grouped(spark, plan)


def test_sorted_measure_survives_foreign_encoding(spark, tables):
    from tests.test_wire import _foreign_encode

    plan = _wire_plan()
    foreign = _foreign_encode("Plan", plan)
    decoded = wire.decode_plan(foreign)
    assert wire.canonical(decoded) == wire.canonical(plan)
    assert _consume_grouped(spark, decoded) == _consume_grouped(spark, plan)


# --- the retained fences -------------------------------------------------------

def _expect_fence(spark, plan, match: str):
    with pytest.raises(SubstraitError, match=match):
        from_substrait_plan(spark, plan)


def test_ordered_distinct_foreign_key_stays_fenced(spark, nulls_table):
    """r16 narrowed the DISTINCT+ORDER BY fence to the genuinely
    ambiguous case: sort key ≠ the aggregated argument (dedup keeps an
    unspecified row's key). Aggregating v ordered by k must still fence;
    multi-key sorts too."""
    plan = agg_plan(read_rel(nulls_table, PROBE_NAMES, PROBE_TYPES),
                    [0],
                    [measure(1, [3], [sort(1, ASC_NL)],
                             invocation="AGGREGATION_INVOCATION_DISTINCT")],
                    ["g", "vs"], {1: "array_agg"})
    _expect_fence(spark, plan, "ordered DISTINCT")
    multi = agg_plan(read_rel(nulls_table, PROBE_NAMES, PROBE_TYPES),
                     [0],
                     [measure(1, [3], [sort(3, ASC_NL), sort(1, ASC_NL)],
                              invocation="AGGREGATION_INVOCATION_DISTINCT")],
                     ["g", "vs"], {1: "array_agg"})
    _expect_fence(spark, multi, "ordered DISTINCT")


@pytest.fixture(scope="module")
def dups_table(spark):
    """(g, v) with duplicate values AND nulls per group — the surface
    ordered-DISTINCT (key ≡ value) must dedup-then-sort exactly."""
    spark.createDataFrame(
        [(0, 3), (0, 1), (0, 3), (0, None), (0, 1), (0, None), (0, 2),
         (1, 5), (1, 5), (2, None), (2, None)],
        "g bigint, v bigint",
    ).createOrReplaceTempView("ordered_distinct_probe")
    yield "ordered_distinct_probe"
    spark.catalog.dropTempView("ordered_distinct_probe")


@pytest.mark.parametrize("direction,dsql", [
    (ASC_NF, "ASC NULLS FIRST"), (ASC_NL, "ASC NULLS LAST"),
    (DESC_NF, "DESC NULLS FIRST"), (DESC_NL, "DESC NULLS LAST"),
])
def test_ordered_distinct_same_key_matches_duckdb(spark, dups_table,
                                                  direction, dsql):
    """r16: array_agg(DISTINCT v ORDER BY v) — the single well-defined
    ordered-DISTINCT form — consumes exactly: duplicates collapse, ONE
    null element survives and lands per the direction enum, all-null
    groups yield [NULL], verified against DuckDB's native form."""
    import duckdb

    plan = agg_plan(read_rel(dups_table, ["g", "v"], [I64, I64]),
                    [0],
                    [measure(1, [1], [sort(1, direction)],
                             invocation="AGGREGATION_INVOCATION_DISTINCT")],
                    ["g", "vs"], {1: "array_agg"})
    got = _consume_grouped(spark, plan)
    con = duckdb.connect()
    con.sql("CREATE VIEW t AS SELECT * FROM (VALUES "
            "(0,3),(0,1),(0,3),(0,NULL),(0,1),(0,NULL),(0,2),"
            "(1,5),(1,5),(2,NULL),(2,NULL)) AS t(g, v)")
    want = {g: (vs,) for g, vs in con.sql(
        f"SELECT g, array_agg(DISTINCT v ORDER BY v {dsql}) "
        "FROM t GROUP BY g").fetchall()}
    assert got == want


def test_ordered_distinct_first_last_and_filter(spark, dups_table):
    """first/last over the deduped sorted set, FILTER composing BEFORE
    the dedup (SQL order), and an all-rows-filtered group yielding NULL
    — against DuckDB."""
    import duckdb

    gt1 = {"scalarFunction": {"functionReference": 9, "arguments": [
        {"value": field(1)},
        {"value": {"literal": {"i64": 1}}}]}}
    plan = agg_plan(
        read_rel(dups_table, ["g", "v"], [I64, I64]),
        [0],
        [measure(1, [1], [sort(1, ASC_NL)],
                 invocation="AGGREGATION_INVOCATION_DISTINCT"),
         measure(2, [1], [sort(1, ASC_NL)],
                 invocation="AGGREGATION_INVOCATION_DISTINCT"),
         measure(3, [1], [sort(1, ASC_NL)], filter_expr=gt1,
                 invocation="AGGREGATION_INVOCATION_DISTINCT")],
        ["g", "first_v", "last_v", "agg_gt1"],
        {1: "first_value", 2: "last_value", 3: "array_agg", 9: "gt"})
    got = _consume_grouped(spark, plan)
    con = duckdb.connect()
    con.sql("CREATE VIEW t AS SELECT * FROM (VALUES "
            "(0,3),(0,1),(0,3),(0,NULL),(0,1),(0,NULL),(0,2),"
            "(1,5),(1,5),(2,NULL),(2,NULL)) AS t(g, v)")
    want = {g: rest for g, *rest in map(tuple, con.sql(
        "SELECT g, first(DISTINCT v ORDER BY v ASC NULLS LAST), "
        "last(DISTINCT v ORDER BY v ASC NULLS LAST), "
        "array_agg(DISTINCT v ORDER BY v ASC NULLS LAST) "
        "  FILTER (WHERE v > 1) "
        "FROM t GROUP BY g").fetchall())}
    assert {k: tuple(v) for k, v in got.items()} \
        == {k: tuple(v) for k, v in want.items()}


@pytest.mark.parametrize("band", range(0, 20, 5))
def test_ordered_distinct_random_multisets_vs_duckdb(spark, band):
    """r16 seeded differential sweep for the ordered-DISTINCT rebuild on
    NULL-heavy data (the foreign fuzzer composes the form over non-null
    TPC-H ints only): random multisets with ~30% NULLs and heavy
    duplication, all four directions, optional FILTER, array_agg and
    first/last — each seed compared against DuckDB's native form."""
    import duckdb
    import random

    con = duckdb.connect()
    dirs = [(ASC_NF, "ASC NULLS FIRST"), (ASC_NL, "ASC NULLS LAST"),
            (DESC_NF, "DESC NULLS FIRST"), (DESC_NL, "DESC NULLS LAST")]
    for seed in range(band, band + 5):
        r = random.Random(seed)
        rows = [(r.randint(0, 2),
                 None if r.random() < 0.3 else r.randint(-3, 3))
                for _ in range(r.randint(1, 25))]
        direction, dsql = r.choice(dirs)
        name = r.choice(["array_agg", "first_value", "last_value"])
        dfn = {"array_agg": "array_agg", "first_value": "first",
               "last_value": "last"}[name]
        use_filter = r.random() < 0.4
        view = f"od_probe_{seed}"
        spark.createDataFrame(rows, "g bigint, v bigint") \
            .createOrReplaceTempView(view)
        gt = {"scalarFunction": {"functionReference": 9, "arguments": [
            {"value": field(1)}, {"value": {"literal": {"i64": 0}}}]}}
        plan = agg_plan(
            read_rel(view, ["g", "v"], [I64, I64]), [0],
            [measure(1, [1], [sort(1, direction)],
                     filter_expr=gt if use_filter else None,
                     invocation="AGGREGATION_INVOCATION_DISTINCT")],
            ["g", "out"], {1: name, 9: "gt"})
        got = _consume_grouped(spark, plan)
        vals = ", ".join(
            f"({g}, {'NULL' if v is None else v})" for g, v in rows)
        fsql = " FILTER (WHERE v > 0)" if use_filter else ""
        want = {g: (o,) for g, o in con.sql(
            f"SELECT g, {dfn}(DISTINCT v ORDER BY v {dsql}){fsql} "
            f"FROM (VALUES {vals}) AS t(g, v) GROUP BY g").fetchall()}
        assert got == want, \
            f"seed {seed} ({name} {dsql} filter={use_filter}) diverged"
        spark.catalog.dropTempView(view)


def test_ordered_distinct_same_key_through_binary_wire(spark, dups_table):
    plan = agg_plan(read_rel(dups_table, ["g", "v"], [I64, I64]),
                    [0],
                    [measure(1, [1], [sort(1, DESC_NF)],
                             invocation="AGGREGATION_INVOCATION_DISTINCT")],
                    ["g", "vs"], {1: "array_agg"})
    decoded = wire.decode_plan(wire.encode_plan(plan))
    assert wire.canonical(decoded) == wire.canonical(plan)
    assert _consume_grouped(spark, decoded) == _consume_grouped(spark, plan)


def test_ordered_unsupported_name_stays_fenced(spark, nulls_table):
    plan = agg_plan(read_rel(nulls_table, PROBE_NAMES, PROBE_TYPES),
                    [0], [measure(1, [1], [sort(1, ASC_NL)])],
                    ["g", "s"], {1: "sum"})
    _expect_fence(spark, plan, "no exact Spark rebuild")


def test_ordered_comparator_sort_stays_fenced(spark, nulls_table):
    plan = agg_plan(read_rel(nulls_table, PROBE_NAMES, PROBE_TYPES),
                    [0],
                    [measure(1, [3],
                             [{"expr": field(1),
                               "comparisonFunctionReference": 9}])],
                    ["g", "vs"], {1: "array_agg"})
    _expect_fence(spark, plan, "comparison function")


def test_ordered_bad_arity_stays_fenced(spark, nulls_table):
    plan = agg_plan(read_rel(nulls_table, PROBE_NAMES, PROBE_TYPES),
                    [0], [measure(1, [1, 3], [sort(1, ASC_NL)])],
                    ["g", "vs"], {1: "array_agg"})
    _expect_fence(spark, plan, "expects 1 argument")
