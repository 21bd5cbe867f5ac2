"""RelCommon.emit output remapping on consume (r11, VERDICT r10 top directive).

The reference never emits or reads ``RelCommon.emit`` — its RelCommon is
always ``direct`` (producer.rs writes ``RelCommon{emit_kind: Direct}``,
consumer.rs:122-137 consumes ProjectRel as expressions-are-the-output).
Spec-conformant foreign producers (DuckDB's substrait extension, Isthmus,
newer DataFusion) DO emit output mappings: a ProjectRel arrives as
input ++ expressions plus an ``emit.outputMapping`` selecting the visible
columns. Before r11 the mapping was parsed by the wire codec but silently
ignored on consume — wrong columns, no error. These tests pin the r11
behavior: honor the mapping on every rel kind (trailing ordinal select),
adopt the spec input++expressions ordinal space on ProjectRel when emit is
present, and hard-fence the unrepresentable forms.

Plans here are hand-authored the way a foreign producer would write them
(JSON IR + binary wire + the foreign-encoding variant from test_wire).
"""

from __future__ import annotations

import pytest

from datafusion_substrait_spark import to_substrait_plan
from datafusion_substrait_spark.plans import proto, wire
from datafusion_substrait_spark.plans.consumer import from_substrait_plan
from tests.conftest import rows_set


# --- hand-authored plan helpers ---------------------------------------------

I64 = {"i64": {"nullability": "NULLABILITY_NULLABLE"}}
STR = {"string": {"nullability": "NULLABILITY_NULLABLE"}}


def read_rel(table: str, names: list[str], types: list[dict],
             emit: list[int] | None = None) -> dict:
    body = {
        "common": _common(emit),
        "baseSchema": {"names": names, "struct": {"types": types}},
        "namedTable": {"names": [table]},
    }
    return {"read": body}


def _common(emit: list[int] | None) -> dict:
    if emit is None:
        return {"direct": {}}
    return {"emit": {"outputMapping": emit}}


def field(i: int) -> dict:
    return {"selection": {"directReference": {"structField": {"field": i}},
                          "rootReference": {}}}


def plan_of(rel: dict, names: list[str], extensions=None) -> dict:
    p: dict = {"relations": [{"root": {"input": rel, "names": names}}]}
    if extensions:
        p["extensions"] = [
            {"extensionFunction": {"functionAnchor": a, "name": n}}
            for a, n in extensions.items()
        ]
    return p


NATION_NAMES = ["n_nationkey", "n_name", "n_regionkey"]
NATION_TYPES = [I64, STR, I64]


# --- ProjectRel: spec input++expressions space under emit --------------------

def test_project_emit_spec_ordinal_space(spark, tables):
    """A foreign ProjectRel: expressions=[n_nationkey+100], emit=[1, 3]
    → output (n_name, n_nationkey+100). Ordinal 3 = n_in(3) + expr 0,
    proving the input++expressions space (the reference's direct convention
    would misread ordinal 1 as an expression index and fail on 3)."""
    rel = {"project": {
        "common": _common([1, 3]),
        "input": read_rel("nation", NATION_NAMES, NATION_TYPES),
        "expressions": [{"scalarFunction": {
            "functionReference": 1,
            "arguments": [{"value": field(0)},
                          {"value": {"literal": {"i64": "100"}}}],
        }}],
    }}
    plan = plan_of(rel, ["name", "key100"], {1: "add"})
    got = from_substrait_plan(spark, plan)
    assert got.columns == ["name", "key100"]
    want = spark.sql(
        "SELECT n_name AS name, n_nationkey + 100 AS key100 FROM nation")
    assert rows_set(got) == rows_set(want)


def test_project_emit_duplicate_and_reorder(spark, tables):
    """Spec-legal duplicate ordinals: emit=[3, 0, 3] emits the expression
    twice around a passthrough input column."""
    rel = {"project": {
        "common": _common([3, 0, 3]),
        "input": read_rel("nation", NATION_NAMES, NATION_TYPES),
        "expressions": [{"scalarFunction": {
            "functionReference": 1,
            "arguments": [{"value": field(2)},
                          {"value": {"literal": {"i64": "7"}}}],
        }}],
    }}
    plan = plan_of(rel, ["a", "k", "b"], {1: "multiply"})
    got = from_substrait_plan(spark, plan)
    want = spark.sql("SELECT n_regionkey * 7 AS a, n_nationkey AS k, "
                     "n_regionkey * 7 AS b FROM nation")
    assert rows_set(got) == rows_set(want)


def test_project_direct_keeps_reference_convention(spark, tables):
    """No emit → the reference's expressions-are-the-output convention must
    be untouched (parity with consumer.rs:122-137 and every r1-r10 plan)."""
    rel = {"project": {
        "common": {"direct": {}},
        "input": read_rel("nation", NATION_NAMES, NATION_TYPES),
        "expressions": [field(1), field(0)],
    }}
    got = from_substrait_plan(spark, plan_of(rel, ["n_name", "n_nationkey"]))
    want = spark.sql("SELECT n_name, n_nationkey FROM nation")
    assert rows_set(got) == rows_set(want)


# --- emit over the passthrough / leaf / multi-input rel kinds ----------------

def test_read_emit_after_projection_mask(spark, tables):
    """ReadRel with BOTH a projection mask and emit: emit ordinals index the
    post-mask space (mask [2,1,0] then emit [2,1] → n_nationkey, n_name)."""
    body = read_rel("nation", NATION_NAMES, NATION_TYPES, emit=[2, 1])
    body["read"]["projection"] = {"select": {"structItems": [
        {"field": 2}, {"field": 1}, {"field": 0}]}}
    got = from_substrait_plan(spark, plan_of(body, ["k", "nm"]))
    want = spark.sql("SELECT n_nationkey AS k, n_name AS nm FROM nation")
    assert rows_set(got) == rows_set(want)


def test_filter_emit_prunes_columns(spark, tables):
    """FilterRel passthrough space: emit=[1] over a 3-col input → 1 col."""
    rel = {"filter": {
        "common": _common([1]),
        "input": read_rel("nation", NATION_NAMES, NATION_TYPES),
        "condition": {"scalarFunction": {
            "functionReference": 1,
            "arguments": [{"value": field(0)},
                          {"value": {"literal": {"i64": "10"}}}],
        }},
    }}
    got = from_substrait_plan(spark, plan_of(rel, ["nm"], {1: "lt"}))
    want = spark.sql("SELECT n_name AS nm FROM nation WHERE n_nationkey < 10")
    assert rows_set(got) == rows_set(want)


def test_join_emit_selects_across_sides(spark, tables):
    """JoinRel: emit ordinals over left++right — [1, 4] picks n_name from
    the left and r_name (combined ordinal 4) from the right (left width
    3, right width 2)."""
    rel = {"join": {
        "common": _common([1, 4]),
        "left": read_rel("nation", NATION_NAMES, NATION_TYPES),
        "right": read_rel("region", ["r_regionkey", "r_name"], [I64, STR]),
        "type": proto.JOIN_TYPE_INNER,
        "expression": {"scalarFunction": {
            "functionReference": 1,
            "arguments": [{"value": field(2)}, {"value": field(3)}],
        }},
    }}
    got = from_substrait_plan(spark, plan_of(rel, ["nat", "reg"], {1: "equal"}))
    want = spark.sql("SELECT n_name AS nat, r_name AS reg FROM nation "
                     "JOIN region ON n_regionkey = r_regionkey")
    assert rows_set(got) == rows_set(want)


def test_aggregate_emit_measure_before_key(spark, tables):
    """AggregateRel space = groupings ++ measures; emit=[1, 0] flips them."""
    rel = {"aggregate": {
        "common": _common([1, 0]),
        "input": read_rel("nation", NATION_NAMES, NATION_TYPES),
        "groupings": [{"groupingExpressions": [field(2)]}],
        "measures": [{"measure": {
            "functionReference": 1, "phase": "AGGREGATION_PHASE_INITIAL_TO_RESULT",
            "arguments": [{"value": field(0)}],
        }}],
    }}
    got = from_substrait_plan(spark, plan_of(rel, ["n", "rk"], {1: "count"}))
    want = spark.sql("SELECT count(n_nationkey) AS n, n_regionkey AS rk "
                     "FROM nation GROUP BY n_regionkey")
    assert rows_set(got) == rows_set(want)


def test_fetch_and_sort_emit(spark, tables):
    """Emit composes through stacked rels: sort(emit=[1,0]) under a fetch
    whose own emit drops to 1 column."""
    sort = {"sort": {
        "common": _common([1, 0]),
        "input": read_rel("nation", NATION_NAMES, NATION_TYPES),
        "sorts": [{"expr": field(0),
                   "direction": "SORT_DIRECTION_ASC_NULLS_FIRST"}],
    }}
    rel = {"fetch": {"common": _common([0]), "input": sort,
                     "offset": 0, "count": 5}}
    got = from_substrait_plan(spark, plan_of(rel, ["nm"]))
    want = spark.sql(
        "SELECT n_name AS nm FROM nation ORDER BY n_nationkey LIMIT 5")
    assert rows_set(got) == rows_set(want)


def test_set_emit(spark, tables):
    """SetRel: emit over the (left-named) union space."""
    half = read_rel("nation", NATION_NAMES, NATION_TYPES)
    rel = {"set": {"common": _common([1]),
                   "op": "SET_OP_UNION_ALL", "inputs": [half, half]}}
    got = from_substrait_plan(spark, plan_of(rel, ["nm"]))
    want = spark.sql("SELECT n_name AS nm FROM nation "
                     "UNION ALL SELECT n_name FROM nation")
    assert rows_set(got) == rows_set(want)


# --- the two wires -----------------------------------------------------------

def _emit_bearing_plan() -> tuple[dict, str]:
    rel = {"project": {
        "common": _common([0, 3]),
        "input": read_rel("nation", NATION_NAMES, NATION_TYPES),
        "expressions": [{"scalarFunction": {
            "functionReference": 1,
            "arguments": [{"value": field(2)},
                          # int form (the canonical/wire convention; the
                          # consumer also accepts protobuf-JSON strings)
                          {"value": {"literal": {"i64": 1}}}],
        }}],
    }}
    plan = plan_of(rel, ["k", "rk1"], {1: "add"})
    sql = "SELECT n_nationkey AS k, n_regionkey + 1 AS rk1 FROM nation"
    return plan, sql


def test_emit_survives_binary_wire(spark, tables):
    plan, sql = _emit_bearing_plan()
    decoded = wire.decode_plan(wire.encode_plan(plan))
    got = from_substrait_plan(spark, decoded)
    assert rows_set(got) == rows_set(spark.sql(sql))


def test_emit_survives_foreign_encoding(spark, tables):
    """The second-conformant-serializer variant (descending field order,
    unpacked repeated scalars — emit.outputMapping IS a repeated varint, so
    this exercises the unpacked decode of the mapping itself)."""
    from tests.test_wire import _foreign_encode

    plan, sql = _emit_bearing_plan()
    foreign = _foreign_encode("Plan", plan)
    assert foreign != wire.encode_plan(plan)
    decoded = wire.decode_plan(foreign)
    assert wire.canonical(decoded) == wire.canonical(plan)
    got = from_substrait_plan(spark, decoded)
    assert rows_set(got) == rows_set(spark.sql(sql))


# --- fences -------------------------------------------------------------------

def test_emit_out_of_range_is_an_error(spark, tables):
    rel = {"filter": {
        "common": _common([3]),  # width is 3 → max ordinal 2
        "input": read_rel("nation", NATION_NAMES, NATION_TYPES),
        "condition": {"literal": {"boolean": True}},
    }}
    with pytest.raises(proto.SubstraitError, match=r"outside.*width 3"):
        from_substrait_plan(spark, plan_of(rel, ["x"]))


def test_emit_negative_ordinal_is_an_error(spark, tables):
    body = read_rel("nation", NATION_NAMES, NATION_TYPES, emit=[-1])
    with pytest.raises(proto.SubstraitError, match=r"outside"):
        from_substrait_plan(spark, plan_of(body, ["x"]))


def test_emit_empty_mapping_is_fenced(spark, tables):
    body = read_rel("nation", NATION_NAMES, NATION_TYPES)
    body["read"]["common"] = {"emit": {}}
    with pytest.raises(proto.SubstraitError, match="empty outputMapping"):
        from_substrait_plan(spark, plan_of(body, []))


def test_direct_plus_emit_is_fenced(spark, tables):
    body = read_rel("nation", NATION_NAMES, NATION_TYPES)
    body["read"]["common"] = {"direct": {}, "emit": {"outputMapping": [0]}}
    with pytest.raises(proto.SubstraitError, match="both direct and emit"):
        from_substrait_plan(spark, plan_of(body, ["x"]))


def test_own_producer_never_emits_emit(spark, tables):
    """Produce-side stays on the reference's direct convention — no rel in a
    produced plan may carry RelCommon.emit (consume-side honoring is for
    foreign plans only)."""
    plan = to_substrait_plan(spark.sql(
        "SELECT n_regionkey, count(*) AS n FROM nation "
        "WHERE n_nationkey > 3 GROUP BY n_regionkey ORDER BY n_regionkey"))

    def walk(rel: dict):
        kind = proto.rel_kind(rel)
        body = rel[kind]
        assert "emit" not in (body.get("common") or {}), kind
        for k in ("input", "left", "right"):
            if k in body:
                walk(body[k])
        for i in body.get("inputs", []):
            walk(i)

    root, _ = proto.root_of(plan)
    walk(root)


def test_window_emit(spark, tables):
    """Window rel space = input ++ window columns; emit=[3, 0] keeps only
    the window value and the key."""
    rel = {"window": {
        "common": _common([3, 0]),
        "input": read_rel("nation", NATION_NAMES, NATION_TYPES),
        "partitionExpressions": [field(2)],
        "windowFunctions": [{
            "functionReference": 1,
            "phase": "AGGREGATION_PHASE_INITIAL_TO_RESULT",
            "invocation": "AGGREGATION_INVOCATION_ALL",
            "arguments": [{"value": field(0)}],
            "boundsType": "BOUNDS_TYPE_ROWS",
            "lowerBound": {"unbounded": {}},
            "upperBound": {"unbounded": {}},
        }],
    }}
    got = from_substrait_plan(spark, plan_of(rel, ["s", "k"], {1: "sum"}))
    want = spark.sql(
        "SELECT sum(n_nationkey) OVER (PARTITION BY n_regionkey) AS s, "
        "n_nationkey AS k FROM nation")
    assert rows_set(got) == rows_set(want)


def test_extension_single_emit(spark, tables):
    """Emit applies uniformly to extension rels: a LocalSortRel (an
    ExtensionSingleRel) under emit=[1] projects to one column."""
    from datafusion_substrait_spark.plans import proto as P
    inner = read_rel("nation", NATION_NAMES, NATION_TYPES)
    rel = P.local_sort_rel(
        inner, [{"expr": field(0),
                 "direction": "SORT_DIRECTION_ASC_NULLS_FIRST"}])
    kind = P.rel_kind(rel)
    rel[kind]["common"] = _common([1])
    got = from_substrait_plan(spark, plan_of(rel, ["nm"]))
    want = spark.sql("SELECT n_name AS nm FROM nation")
    assert rows_set(got) == rows_set(want)


def test_cross_rel_consumes_and_takes_emit(spark, tables):
    """CrossRel (r11): foreign producers emit it directly (our producer
    keeps inner-on-true). Output space is left++right; emit composes."""
    rel = {"cross": {
        "common": {"direct": {}},
        "left": read_rel("nation", NATION_NAMES, NATION_TYPES),
        "right": read_rel("region", ["r_regionkey", "r_name"], [I64, STR]),
    }}
    got = from_substrait_plan(
        spark, plan_of(rel, ["k", "nm", "rk", "rrk", "rn"]))
    want = spark.sql("SELECT n_nationkey k, n_name nm, n_regionkey rk, "
                     "r_regionkey rrk, r_name rn FROM nation CROSS JOIN region")
    assert rows_set(got) == rows_set(want)

    rel["cross"]["common"] = _common([4, 1])
    got2 = from_substrait_plan(spark, plan_of(rel, ["rn", "nm"]))
    want2 = spark.sql("SELECT r_name AS rn, n_name AS nm "
                      "FROM nation CROSS JOIN region")
    assert rows_set(got2) == rows_set(want2)

    # and through both wires
    rel["cross"]["common"] = {"direct": {}}
    plan = plan_of(rel, ["k", "nm", "rk", "rrk", "rn"])
    from tests.test_wire import _foreign_encode
    for blob in (wire.encode_plan(plan), _foreign_encode("Plan", plan)):
        got3 = from_substrait_plan(spark, wire.decode_plan(blob))
        assert rows_set(got3) == rows_set(want)
