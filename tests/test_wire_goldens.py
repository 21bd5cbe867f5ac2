"""Byte-level golden fixtures for the wire codec (plans/wire.py).

The codec's schema table is a transcription of the public Substrait spec
(github.com/substrait-io/substrait, proto/substrait/*.proto at v0.53); its
other tests roundtrip through the codec itself, so a transcription slip in
a field number would self-cancel (encode and decode share the table) and
stay invisible. These goldens break that loop: every byte below is
assembled by an INDEPENDENT mini-encoder in this file, with each field
number written out literally from the spec message definitions — a second,
separate transcription. For a wrong byte to pass, the same slip would have
to be made twice, in two differently-structured encodings.

Eight representative plans (the shapes the producer emits in practice,
plus the foreign-producer conventions the consumer honors):
  G1 read + filter + aggregate      G5 sample over scatter exchange
  G2 inner join of two reads        G6 set op + sort + fetch
  G3 window (running sum)           G7 higher-order fn + lambda (r10)
  G4 virtual table, literal rows    G8 RelCommon.emit remap (r11)

Each golden asserts three ways: encode_plan(ir) == bytes (encoder),
decode_plan(bytes) == ir (decoder), and from_substrait_plan(ir) executes
(the fixture is a real consumable plan, not synthetic junk).

Spec citations: plan.proto (Plan/PlanRel/RelRoot/Version),
extensions/extensions.proto (SimpleExtensionDeclaration),
algebra.proto (Rel/ReadRel/FilterRel/AggregateRel/JoinRel/ProjectRel/
ExchangeRel/ExtensionSingleRel/ConsistentPartitionWindowRel/Expression/
Literal/FieldReference/SortField/AggregateFunction/FunctionArgument/
MaskExpression/SetRel/SortRel/FetchRel), type.proto (Type/NamedStruct).
"""

from __future__ import annotations

import base64
import datetime
import hashlib
import json
import os
import struct
from decimal import Decimal

from datafusion_substrait_spark import from_substrait_plan
from datafusion_substrait_spark.plans import wire

# ---------------------------------------------------------------------------
# independent mini-encoder: protobuf wire primitives per the public encoding
# spec (protobuf.dev/programming-guides/encoding). Deliberately NOT imported
# from plans.wire — these are the second implementation.
# ---------------------------------------------------------------------------


def uv(n: int) -> bytes:
    """Base-128 varint."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def tag(num: int, wt: int) -> bytes:
    return uv((num << 3) | wt)


def LD(num: int, *parts: bytes) -> bytes:
    """Length-delimited field (wire type 2): submessages, strings."""
    p = b"".join(parts)
    return tag(num, 2) + uv(len(p)) + p


def VI(num: int, n: int) -> bytes:
    """Varint field (wire type 0): ints, bools, enums."""
    return tag(num, 0) + uv(n)


def ST(num: int, s: str) -> bytes:
    b = s.encode("utf-8")
    return tag(num, 2) + uv(len(b)) + b


def BY(num: int, b: bytes) -> bytes:
    return tag(num, 2) + uv(len(b)) + b


def D64(num: int, x: float) -> bytes:
    """double field (wire type 1, fixed64 little-endian)."""
    return tag(num, 1) + struct.pack("<d", x)


# ---------------------------------------------------------------------------
# shared fragments, field numbers from the spec
# ---------------------------------------------------------------------------

NULLABLE, REQUIRED = 1, 2  # type.proto Type.Nullability enum values

# type.proto Type oneof kind: bool=1, i32=5, i64=7, string=12, date=16,
# decimal=24. Scalar payloads carry nullability at field 2
# (type_variation_reference=1); Decimal is scale=1, precision=2,
# variation=3, nullability=4 (the spec's unusual scale-first order).
T_BOOL = LD(1, VI(2, NULLABLE))
T_I32 = LD(5, VI(2, NULLABLE))
T_I64 = LD(7, VI(2, NULLABLE))
T_STR = LD(12, VI(2, NULLABLE))
T_DATE = LD(16, VI(2, NULLABLE))


def t_dec(precision: int, scale: int) -> bytes:
    return LD(24, VI(1, scale) + VI(2, precision) + VI(4, NULLABLE))


I32_IR = {"i32": {"nullability": "NULLABILITY_NULLABLE"}}
STR_IR = {"string": {"nullability": "NULLABILITY_NULLABLE"}}


def sel(f: int) -> bytes:
    """Expression{selection=2: FieldReference{direct_reference=1:
    ReferenceSegment{struct_field=2: StructField{field=1}},
    root_reference=4: RootReference{}}} (algebra.proto)."""
    return LD(2, LD(1, LD(2, VI(1, f))), LD(4, b""))


def sel_ir(f: int) -> dict:
    return {"selection": {"directReference": {"structField": {"field": f}},
                          "rootReference": {}}}


def field_ref(f: int) -> bytes:
    """Bare FieldReference (ExchangeRel scatter fields carry these, not
    full Expressions)."""
    return LD(1, LD(2, VI(1, f))) + LD(4, b"")


def call(anchor: int, *args: bytes) -> bytes:
    """Expression{scalar_function=3: ScalarFunction{function_reference=1,
    arguments=4 repeated FunctionArgument{value=3: Expression}}}."""
    return LD(3, VI(1, anchor), *[LD(4, LD(3, a)) for a in args])


def call_ir(anchor: int, *args: dict) -> dict:
    return {"scalarFunction": {"functionReference": anchor,
                               "arguments": [{"value": a} for a in args]}}


def read_rel(names: list[str], types_b: list[bytes], mask: list[int],
             table: str) -> bytes:
    """Rel{read=1: ReadRel{common=1, base_schema=2, projection=4,
    named_table=7}} (algebra.proto ReadRel; type.proto NamedStruct
    names=1/struct=2; Type.Struct types=1/nullability=3; MaskExpression
    select=1/maintain_singular_struct=2; StructSelect struct_items=1;
    StructItem field=1; NamedTable names=1)."""
    common = LD(1, LD(1, b""))  # RelCommon{direct=1: {}}
    base_schema = LD(
        2,
        *[ST(1, n) for n in names],
        LD(2, *[LD(1, t) for t in types_b], VI(3, REQUIRED)),
    )
    projection = LD(4, LD(1, *[LD(1, VI(1, i)) for i in mask]), VI(2, 1))
    named_table = LD(7, ST(1, table))
    return LD(1, common, base_schema, projection, named_table)


def read_ir(names: list[str], types_ir: list[dict], mask: list[int],
            table: str) -> dict:
    return {"read": {
        "common": {"direct": {}},
        "baseSchema": {
            "names": list(names),
            "struct": {"nullability": "NULLABILITY_REQUIRED",
                       "types": list(types_ir)},
        },
        "projection": {"select": {"structItems": [{"field": i}
                                                  for i in mask]},
                       "maintainSingularStruct": True},
        "namedTable": {"names": [table]},
    }}


NATION = (["n_nationkey", "n_name", "n_regionkey"], [T_I32, T_STR, T_I32],
          [I32_IR, STR_IR, I32_IR])
REGION = (["r_regionkey", "r_name"], [T_I32, T_STR], [I32_IR, STR_IR])

COMMON = LD(1, LD(1, b""))  # RelCommon{direct=1:{}} at field 1 of any rel
COMMON_IR = {"direct": {}}

VERSION = LD(6, VI(2, 53), ST(5, "datafusion-substrait-spark v0.1"))
VERSION_IR = {"minorNumber": 53, "producer": "datafusion-substrait-spark v0.1"}


def ext_fn(anchor: int, name: str) -> bytes:
    """Plan.extensions=2: SimpleExtensionDeclaration{extension_function=3:
    ExtensionFunction{extension_uri_reference=1, function_anchor=2,
    name=3}} (extensions.proto)."""
    return LD(2, LD(3, VI(1, 0), VI(2, anchor), ST(3, name)))


def ext_fn_ir(anchor: int, name: str) -> dict:
    return {"extensionFunction": {"extensionUriReference": 0,
                                  "functionAnchor": anchor, "name": name}}


def root(rel: bytes, names: list[str]) -> bytes:
    """Plan.relations=3: PlanRel{root=2: RelRoot{input=1, names=2}}
    (plan.proto)."""
    return LD(3, LD(2, LD(1, rel), *[ST(2, n) for n in names]))


def check(golden: bytes, ir: dict, spark) -> "DataFrame":
    assert wire.encode_plan(ir) == golden, (
        "encoder bytes diverge from the hand-assembled golden")
    assert wire.decode_plan(golden) == ir, (
        "decoder output diverges from the authored IR")
    return from_substrait_plan(spark, ir)


# ---------------------------------------------------------------------------
# G1: read + filter + aggregate (the reference's flagship shape,
# producer.rs:74-202)
# ---------------------------------------------------------------------------


def build_g1_read_filter_aggregate():
    names, types_b, types_ir = NATION
    read_b = read_rel(names, types_b, [0, 2], "nation")
    read_d = read_ir(names, types_ir, [0, 2], "nation")

    # Rel{filter=2: FilterRel{common=1, input=2, condition=3}}
    cond_b = call(0, sel(1), LD(1, VI(5, 1)))  # equal(f1, Literal{i32=5: 1})
    cond_d = call_ir(0, sel_ir(1), {"literal": {"i32": 1}})
    filt_b = LD(2, COMMON, LD(2, read_b), LD(3, cond_b))
    filt_d = {"filter": {"common": COMMON_IR, "input": read_d,
                         "condition": cond_d}}

    # Rel{aggregate=4: AggregateRel{common=1, input=2,
    #   groupings=3: Grouping{grouping_expressions=1},
    #   measures=4: Measure{measure=1: AggregateFunction{
    #     function_reference=1, phase=4, invocation=6, arguments=7}}}}
    measure_b = LD(4, LD(1, VI(1, 1), VI(4, 3), VI(6, 1),
                         LD(7, LD(3, sel(0)))))
    # phase=4 INITIAL_TO_RESULT(3); invocation=6 ALL(1)
    agg_b = LD(4, COMMON, LD(2, filt_b),
               LD(3, LD(1, sel(1))), measure_b)
    agg_d = {"aggregate": {
        "common": COMMON_IR, "input": filt_d,
        "groupings": [{"groupingExpressions": [sel_ir(1)]}],
        "measures": [{"measure": {
            "functionReference": 1,
            "phase": "AGGREGATION_PHASE_INITIAL_TO_RESULT",
            "invocation": "AGGREGATION_INVOCATION_ALL",
            "arguments": [{"value": sel_ir(0)}],
        }}],
    }}

    golden = (ext_fn(0, "equal") + ext_fn(1, "sum")
              + root(agg_b, ["rk", "s"]) + VERSION)
    ir = {"version": VERSION_IR,
          "relations": [{"root": {"input": agg_d, "names": ["rk", "s"]}}],
          "extensions": [ext_fn_ir(0, "equal"), ext_fn_ir(1, "sum")]}
    return golden, ir


def test_golden_read_filter_aggregate(spark, tables):
    golden, ir = build_g1_read_filter_aggregate()
    df = check(golden, ir, spark)
    rows = df.collect()
    assert df.columns == ["rk", "s"]
    # nation has 5 nations in region 1; sum of their keys is a fixed value
    assert len(rows) == 1 and rows[0].rk == 1


# ---------------------------------------------------------------------------
# G2: inner join of two reads (algebra.proto JoinRel)
# ---------------------------------------------------------------------------


def build_g2_join():
    n_names, n_types_b, n_types_ir = NATION
    r_names, r_types_b, r_types_ir = REGION
    left_b = read_rel(n_names, n_types_b, [0, 2], "nation")
    left_d = read_ir(n_names, n_types_ir, [0, 2], "nation")
    right_b = read_rel(r_names, r_types_b, [0, 1], "region")
    right_d = read_ir(r_names, r_types_ir, [0, 1], "region")

    # Rel{join=6: JoinRel{common=1, left=2, right=3, expression=4,
    # type=6 enum JOIN_TYPE_INNER=1}}; the join ordinal space is
    # left-then-right, so f1 = n_regionkey, f2 = r_regionkey
    cond_b = call(0, sel(1), sel(2))
    cond_d = call_ir(0, sel_ir(1), sel_ir(2))
    join_b = LD(6, COMMON, LD(2, left_b), LD(3, right_b),
                LD(4, cond_b), VI(6, 1))
    join_d = {"join": {"common": COMMON_IR, "left": left_d,
                       "right": right_d, "expression": cond_d,
                       "type": "JOIN_TYPE_INNER"}}

    out_names = ["nk", "nrk", "rk", "rn"]
    golden = ext_fn(0, "equal") + root(join_b, out_names) + VERSION
    ir = {"version": VERSION_IR,
          "relations": [{"root": {"input": join_d, "names": out_names}}],
          "extensions": [ext_fn_ir(0, "equal")]}
    return golden, ir


def test_golden_join(spark, tables):
    golden, ir = build_g2_join()
    df = check(golden, ir, spark)
    out_names = ["nk", "nrk", "rk", "rn"]
    assert df.columns == out_names
    rows = df.collect()
    assert len(rows) == 25  # every nation matches exactly one region
    assert all(r.nrk == r.rk for r in rows)


# ---------------------------------------------------------------------------
# G3: window — running sum (algebra.proto ConsistentPartitionWindowRel)
# ---------------------------------------------------------------------------


def build_g3_window():
    names, types_b, types_ir = NATION
    read_b = read_rel(names, types_b, [1, 0, 2], "nation")
    read_d = read_ir(names, types_ir, [1, 0, 2], "nation")

    # WindowRelFunction keeps Expression.WindowFunction's numbering:
    # function_reference=1, upper_bound=4, lower_bound=5, phase=6,
    # arguments=9, invocation=10, bounds_type=12.
    # Bound oneof: preceding=1, following=2, current_row=3, unbounded=4.
    wfn_b = LD(3,                      # windowFunctions=3 (repeated)
               VI(1, 0),               # sum anchor
               LD(4, LD(3, b"")),      # upperBound: current_row
               LD(5, LD(4, b"")),      # lowerBound: unbounded
               VI(6, 3),               # phase INITIAL_TO_RESULT
               LD(9, LD(3, sel(1))),   # arguments: n_nationkey
               VI(10, 1),              # invocation ALL
               VI(12, 1))              # boundsType ROWS
    # Rel{window=17: {common=1, input=2, window_functions=3,
    # partition_expressions=4, sorts=5}}; SortField{expr=1, direction=2
    # enum ASC_NULLS_FIRST=1}
    win_b = LD(17, COMMON, LD(2, read_b), wfn_b,
               LD(4, sel(2)), LD(5, LD(1, sel(1)), VI(2, 1)))
    win_d = {"window": {
        "common": COMMON_IR, "input": read_d,
        "windowFunctions": [{
            "functionReference": 0,
            "upperBound": {"currentRow": {}},
            "lowerBound": {"unbounded": {}},
            "phase": "AGGREGATION_PHASE_INITIAL_TO_RESULT",
            "arguments": [{"value": sel_ir(1)}],
            "invocation": "AGGREGATION_INVOCATION_ALL",
            "boundsType": "BOUNDS_TYPE_ROWS",
        }],
        "partitionExpressions": [sel_ir(2)],
        "sorts": [{"expr": sel_ir(1),
                   "direction": "SORT_DIRECTION_ASC_NULLS_FIRST"}],
    }}

    # Rel{project=7: {common=1, input=2, expressions=3}} keeps (n_name,
    # the appended window column at ordinal 3)
    proj_b = LD(7, COMMON, LD(2, win_b), LD(3, sel(0)), LD(3, sel(3)))
    proj_d = {"project": {"common": COMMON_IR, "input": win_d,
                          "expressions": [sel_ir(0), sel_ir(3)]}}

    golden = ext_fn(0, "sum") + root(proj_b, ["n_name", "rt"]) + VERSION
    ir = {"version": VERSION_IR,
          "relations": [{"root": {"input": proj_d,
                                  "names": ["n_name", "rt"]}}],
          "extensions": [ext_fn_ir(0, "sum")]}
    return golden, ir


def test_golden_window(spark, tables):
    golden, ir = build_g3_window()
    df = check(golden, ir, spark)
    assert df.columns == ["n_name", "rt"]
    assert df.count() == 25
    # running sum within each region must be monotone non-decreasing
    # (keys are non-negative); the max running total is the region's sum
    import pyspark.sql.functions as F
    nat = spark.table("nation")
    expect = {r.n_regionkey: r.s for r in
              nat.groupBy("n_regionkey").agg(
                  F.sum("n_nationkey").alias("s")).collect()}
    got = {r.n_name: r.rt for r in df.collect()}
    per_region_max = {}
    for r in nat.collect():
        per_region_max[r.n_regionkey] = max(
            per_region_max.get(r.n_regionkey, -1), got[r.n_name])
    assert per_region_max == expect


# ---------------------------------------------------------------------------
# G4: virtual table with literal rows (algebra.proto ReadRel.VirtualTable;
# Literal oneof numbering incl. the gaps: boolean=1, i64=7, string=12,
# date=16, decimal=24, null=29)
# ---------------------------------------------------------------------------


def build_g4_virtual_table():
    dec_pos = (12345).to_bytes(16, "little", signed=True)    # 123.45
    dec_neg = (-12345).to_bytes(16, "little", signed=True)   # -123.45
    b64_pos = base64.b64encode(dec_pos).decode("ascii")
    b64_neg = base64.b64encode(dec_neg).decode("ascii")

    # Literal.Decimal{value=1 bytes, precision=2, scale=3}
    row1 = LD(1, (LD(1, VI(7, 7))            # i64 7
                  + LD(1, ST(12, "x"))        # string "x"
                  + LD(1, VI(1, 1))           # boolean true
                  + LD(1, VI(16, 19000))      # date: epoch days
                  + LD(1, LD(24, BY(1, dec_pos), VI(2, 5), VI(3, 2)))))
    # Literal{null=29: Type} carries the full Type message
    row2 = LD(1, (LD(1, LD(29, T_I64))        # typed NULL i64
                  + LD(1, ST(12, "y"))
                  + LD(1, VI(1, 0))           # boolean false
                  + LD(1, VI(16, 0))          # epoch date
                  + LD(1, LD(24, BY(1, dec_neg), VI(2, 5), VI(3, 2)))))

    # ReadRel{common=1, base_schema=2, virtual_table=5:
    # VirtualTable{values=1 repeated Literal.Struct{fields=1}}}
    base_schema = LD(2,
                     ST(1, "a"), ST(1, "b"), ST(1, "c"),
                     ST(1, "d"), ST(1, "e"),
                     LD(2, LD(1, T_I64), LD(1, T_STR), LD(1, T_BOOL),
                        LD(1, T_DATE), LD(1, t_dec(5, 2)),
                        VI(3, REQUIRED)))
    vt_b = LD(1, COMMON, base_schema, LD(5, row1 + row2))

    i64_ir = {"i64": {"nullability": "NULLABILITY_NULLABLE"}}
    dec_t_ir = {"decimal": {"scale": 2, "precision": 5,
                            "nullability": "NULLABILITY_NULLABLE"}}
    vt_d = {"read": {
        "common": COMMON_IR,
        "baseSchema": {
            "names": ["a", "b", "c", "d", "e"],
            "struct": {"nullability": "NULLABILITY_REQUIRED",
                       "types": [
                           i64_ir, STR_IR,
                           {"bool": {"nullability": "NULLABILITY_NULLABLE"}},
                           {"date": {"nullability": "NULLABILITY_NULLABLE"}},
                           dec_t_ir]},
        },
        "virtualTable": {"values": [
            {"fields": [
                {"i64": 7}, {"string": "x"}, {"boolean": True},
                {"date": 19000},
                {"decimal": {"value": b64_pos, "precision": 5, "scale": 2}},
            ]},
            {"fields": [
                {"null": i64_ir}, {"string": "y"}, {"boolean": False},
                {"date": 0},
                {"decimal": {"value": b64_neg, "precision": 5, "scale": 2}},
            ]},
        ]},
    }}

    names = ["a", "b", "c", "d", "e"]
    golden = root(vt_b, names) + VERSION
    ir = {"version": VERSION_IR,
          "relations": [{"root": {"input": vt_d, "names": names}}]}
    return golden, ir


def test_golden_virtual_table(spark):
    golden, ir = build_g4_virtual_table()
    df = check(golden, ir, spark)
    rows = sorted(map(tuple, df.collect()), key=repr)
    assert rows == sorted([
        (7, "x", True, datetime.date(1970, 1, 1)
         + datetime.timedelta(days=19000), Decimal("123.45")),
        (None, "y", False, datetime.date(1970, 1, 1), Decimal("-123.45")),
    ], key=repr)


# ---------------------------------------------------------------------------
# G5: sample over a scatter exchange (algebra.proto ExchangeRel;
# ExtensionSingleRel carrying our SampleRel through google.protobuf.Any)
# ---------------------------------------------------------------------------


def build_g5_sample_over_exchange():
    names, types_b, types_ir = NATION
    read_b = read_rel(names, types_b, [1, 2], "nation")
    read_d = read_ir(names, types_ir, [1, 2], "nation")

    # Rel{exchange=15: ExchangeRel{common=1, input=2, partition_count=3,
    # scatter_by_fields=5: ScatterFields{fields=1 repeated FieldReference}}}
    exch_b = LD(15, COMMON, LD(2, read_b), VI(3, 3),
                LD(5, LD(1, field_ref(1))))
    exch_d = {"exchange": {
        "common": COMMON_IR, "input": read_d, "partitionCount": 3,
        "scatterByFields": {"fields": [
            {"directReference": {"structField": {"field": 1}},
             "rootReference": {}}]},
    }}

    proj_b = LD(7, COMMON, LD(2, exch_b), LD(3, sel(0)))
    proj_d = {"project": {"common": COMMON_IR, "input": exch_d,
                          "expressions": [sel_ir(0)]}}

    # ExtensionSingleRel{common=1, input=2, detail=3: Any{type_url=1,
    # value=2}}; SampleRel (our numbering): lower=1 double, upper=2 double,
    # with_replacement=3 bool, seed=4 int64
    url = "type.googleapis.com/spark.substrait_spark.SampleRel"
    sample_payload = D64(1, 0.0) + D64(2, 0.5) + VI(3, 0) + VI(4, 7)
    any_b = LD(3, ST(1, url) + BY(2, sample_payload))
    ext_b = LD(9, COMMON, LD(2, proj_b), any_b)  # Rel{extension_single=9}
    ext_d = {"extensionSingle": {
        "common": COMMON_IR, "input": proj_d,
        "detail": {"@type": url, "lowerBound": 0.0, "upperBound": 0.5,
                   "withReplacement": False, "seed": 7},
    }}

    golden = root(ext_b, ["n_name"]) + VERSION
    ir = {"version": VERSION_IR,
          "relations": [{"root": {"input": ext_d, "names": ["n_name"]}}]}
    return golden, ir


def test_golden_sample_over_exchange(spark, tables):
    golden, ir = build_g5_sample_over_exchange()
    df = check(golden, ir, spark)
    assert df.columns == ["n_name"]
    n = df.count()
    assert 0 <= n <= 25           # a 50% sample of 25 nations
    assert df.count() == n        # seeded: stable across evaluations


# ---------------------------------------------------------------------------
# G6: set op over two reads, sorted and fetched (algebra.proto
# SetRel/SortRel/FetchRel — completes consumable Rel-kind coverage of the
# golden suite; CrossRel is wire-decodable but deliberately not consumable,
# the producer emits cross joins as inner-on-true)
# ---------------------------------------------------------------------------


def build_g6_setop_sort_fetch():
    n_names, n_types_b, n_types_ir = NATION
    r_names, r_types_b, r_types_ir = REGION
    a_b = read_rel(n_names, n_types_b, [2], "nation")
    a_d = read_ir(n_names, n_types_ir, [2], "nation")
    b_b = read_rel(r_names, r_types_b, [0], "region")
    b_d = read_ir(r_names, r_types_ir, [0], "region")

    # Rel{set=8: SetRel{common=1, inputs=2 repeated, op=3 enum
    # SET_OP_UNION_DISTINCT=5}}
    set_b = LD(8, COMMON, LD(2, a_b), LD(2, b_b), VI(3, 5))
    set_d = {"set": {"common": COMMON_IR, "inputs": [a_d, b_d],
                     "op": "SET_OP_UNION_DISTINCT"}}

    # Rel{sort=5: SortRel{common=1, input=2, sorts=3: SortField{expr=1,
    # direction=2 enum DESC_NULLS_LAST=4}}}
    sort_b = LD(5, COMMON, LD(2, set_b), LD(3, LD(1, sel(0)), VI(2, 4)))
    sort_d = {"sort": {"common": COMMON_IR, "input": set_d,
                       "sorts": [
                           {"expr": sel_ir(0),
                            "direction": "SORT_DIRECTION_DESC_NULLS_LAST"},
                       ]}}

    # Rel{fetch=3: FetchRel{common=1, input=2, offset=3, count=4}}
    fetch_b = LD(3, COMMON, LD(2, sort_b), VI(3, 1), VI(4, 3))
    fetch_d = {"fetch": {"common": COMMON_IR, "input": sort_d,
                         "offset": 1, "count": 3}}

    golden = root(fetch_b, ["k"]) + VERSION
    ir = {"version": VERSION_IR,
          "relations": [{"root": {"input": fetch_d, "names": ["k"]}}]}
    return golden, ir


def test_golden_setop_sort_fetch(spark, tables):
    golden, ir = build_g6_setop_sort_fetch()
    df = check(golden, ir, spark)
    assert df.columns == ["k"]
    rows = [r.k for r in df.collect()]
    # 5 distinct region keys (0..4) union-distinct 5 region keys -> 0..4;
    # desc-sorted, skip 1, take 3 -> [3, 2, 1]
    assert rows == [3, 2, 1]

# ---------------------------------------------------------------------------
# G7: higher-order function with the lambda encoding (r10) — transform over
# an Expression.Nested.List, the lambda riding as extension call
# lambda(n_params, body) with lambda_var(depth, index) bound refs. Pins the
# lambda surface's WIRE bytes independently of the codec's own table.
# ---------------------------------------------------------------------------


def build_g7_lambda_transform():
    names, types_b, types_ir = NATION
    read_b = read_rel(names, types_b, [1], "nation")
    read_d = read_ir(names, types_ir, [1], "nation")

    # transform([f0, f0], x -> upper(x)); anchors: 0=transform, 1=lambda,
    # 2=lambda_var, 3=upper. Explicit presence: zero-valued i32 literals
    # (depth 0, index 0) ARE written (the codec encodes fields present in
    # the IR even at proto3 defaults, plans/wire.py header).
    lit0_b, lit0_d = LD(1, VI(5, 0)), {"literal": {"i32": 0}}
    lit1_b, lit1_d = LD(1, VI(5, 1)), {"literal": {"i32": 1}}
    lvar_b = call(2, lit0_b, lit0_b)
    lvar_d = call_ir(2, lit0_d, lit0_d)
    lam_b = call(1, lit1_b, call(3, lvar_b))
    lam_d = call_ir(1, lit1_d, call_ir(3, lvar_d))
    # Expression{nested=13: Nested{list=4: NestedList{values=1 rep}}}
    arr_b = LD(13, LD(4, LD(1, sel(0)), LD(1, sel(0))))
    arr_d = {"nested": {"list": {"values": [sel_ir(0), sel_ir(0)]}}}
    expr_b = call(0, arr_b, lam_b)
    expr_d = call_ir(0, arr_d, lam_d)

    # Rel{project=7: ProjectRel{common=1, input=2, expressions=3}} —
    # output is exactly the expression list (reference convention)
    proj_b = LD(7, COMMON, LD(2, read_b), LD(3, sel(0)), LD(3, expr_b))
    proj_d = {"project": {"common": COMMON_IR, "input": read_d,
                          "expressions": [sel_ir(0), expr_d]}}

    golden = (ext_fn(0, "transform") + ext_fn(1, "lambda")
              + ext_fn(2, "lambda_var") + ext_fn(3, "upper")
              + root(proj_b, ["name", "arr"]) + VERSION)
    ir = {"version": VERSION_IR,
          "relations": [{"root": {"input": proj_d,
                                  "names": ["name", "arr"]}}],
          "extensions": [ext_fn_ir(0, "transform"), ext_fn_ir(1, "lambda"),
                         ext_fn_ir(2, "lambda_var"), ext_fn_ir(3, "upper")]}
    return golden, ir


def test_golden_lambda_transform(spark, tables):
    golden, ir = build_g7_lambda_transform()
    df = check(golden, ir, spark)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        # transform([name, name], x -> upper(x)) == [UPPER, UPPER]
        assert r[1] == [r[0].upper(), r[0].upper()]


# ---------------------------------------------------------------------------
# G8: RelCommon.emit output remapping (r11) — a ProjectRel in the SPEC
# convention (ordinal space input++expressions) whose emit.outputMapping is
# a PACKED repeated int32. Pins the emit bytes independently of the codec
# table AND the consume-side honor path (before r11 the mapping was
# silently ignored).
# ---------------------------------------------------------------------------


def emit_common(mapping: list[int]) -> bytes:
    """RelCommon{emit=2: Emit{output_mapping=1 repeated int32, PACKED}}
    (algebra.proto RelCommon; packed is proto3's default scalar encoding,
    matching plans/wire.py's writer)."""
    payload = b"".join(uv(v) for v in mapping)
    return LD(1, LD(2, tag(1, 2) + uv(len(payload)) + payload))


def build_g8_emit_project():
    names, types_b, types_ir = NATION
    read_b = read_rel(names, types_b, [2, 1], "nation")
    read_d = read_ir(names, types_ir, [2, 1], "nation")

    # add(f0, i32 100) appended to the 2-col input → spec ordinal space
    # (f0=n_regionkey, f1=n_name, f2=f0+100); emit [2, 0] reorders the
    # expression before the passthrough
    expr_b = call(0, sel(0), LD(1, VI(5, 100)))
    expr_d = call_ir(0, sel_ir(0), {"literal": {"i32": 100}})
    proj_b = LD(7, emit_common([2, 0]), LD(2, read_b), LD(3, expr_b))
    proj_d = {"project": {"common": {"emit": {"outputMapping": [2, 0]}},
                          "input": read_d, "expressions": [expr_d]}}

    golden = ext_fn(0, "add") + root(proj_b, ["rk100", "rk"]) + VERSION
    ir = {"version": VERSION_IR,
          "relations": [{"root": {"input": proj_d,
                                  "names": ["rk100", "rk"]}}],
          "extensions": [ext_fn_ir(0, "add")]}
    return golden, ir


def test_golden_emit_project(spark, tables):
    golden, ir = build_g8_emit_project()
    df = check(golden, ir, spark)
    rows = df.collect()
    assert df.columns == ["rk100", "rk"]
    assert len(rows) > 0
    for r in rows:
        assert r.rk100 == r.rk + 100


# ---------------------------------------------------------------------------
# Fixture pack: the goldens as committed .bin files + manifest, so any
# EXTERNAL Substrait implementation can be pointed at real plan bytes
# without reading this test module (tests/wire_fixtures/README.md has the
# contract). Regenerate with `python -m tests.test_wire_goldens`.
# ---------------------------------------------------------------------------

GOLDENS = {
    "g1_read_filter_aggregate": (
        build_g1_read_filter_aggregate,
        "ReadRel(named nation, projection mask) -> FilterRel(equal(f1, "
        "i32 1)) -> AggregateRel(group f1, sum(f0)); two extension "
        "function anchors"),
    "g2_join": (
        build_g2_join,
        "JoinRel INNER of two masked named reads (nation x region) on "
        "equal(f1, f2) in the left-then-right ordinal space"),
    "g3_window": (
        build_g3_window,
        "ConsistentPartitionWindowRel: running sum over rows "
        "unbounded-preceding..current, partitioned + sorted, then a "
        "ProjectRel keeping (n_name, window column)"),
    "g4_virtual_table": (
        build_g4_virtual_table,
        "ReadRel.VirtualTable with two Literal.Struct rows covering i64, "
        "string, boolean, date, decimal(5,2) LE-bytes and a typed NULL"),
    "g5_sample_over_exchange": (
        build_g5_sample_over_exchange,
        "ExchangeRel scatter_by_fields -> ProjectRel -> "
        "ExtensionSingleRel carrying SampleRel via google.protobuf.Any "
        "(type.googleapis.com/spark.substrait_spark.SampleRel)"),
    "g6_setop_sort_fetch": (
        build_g6_setop_sort_fetch,
        "SetRel UNION_DISTINCT of two reads -> SortRel DESC_NULLS_LAST "
        "-> FetchRel offset 1 count 3"),
    "g7_lambda_transform": (
        build_g7_lambda_transform,
        "ProjectRel with transform(Nested.List[f0, f0], lambda(1, "
        "upper(lambda_var(0, 0)))) — the r10 higher-order-function "
        "encoding: lambdas as extension calls, de-Bruijn bound refs"),
    "g8_emit_project": (
        build_g8_emit_project,
        "ProjectRel in the spec input++expressions convention with "
        "RelCommon.emit{output_mapping=[2, 0] packed int32} reordering "
        "the appended add(f0, 100) before the passthrough column"),
}

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "wire_fixtures")


def test_fixture_pack_matches_goldens():
    """The committed fixture pack IS the hand-assembled goldens: each
    .bin must be byte-identical to its builder's output (no drift between
    what external implementations see and what the tests pin), decode
    back to the authored IR, and be listed in the manifest."""
    with open(os.path.join(FIXTURE_DIR, "manifest.json")) as fh:
        manifest = json.load(fh)
    assert set(manifest["plans"]) == set(GOLDENS)
    assert manifest["message"] == "substrait.Plan"
    for name, (builder, description) in GOLDENS.items():
        golden, ir = builder()
        with open(os.path.join(FIXTURE_DIR, f"{name}.bin"), "rb") as fh:
            on_disk = fh.read()
        assert on_disk == golden, f"{name}.bin drifted from the builder"
        assert wire.decode_plan(on_disk) == ir, name
        entry = manifest["plans"][name]
        assert entry["file"] == f"{name}.bin"
        assert entry["sha256"] == hashlib.sha256(golden).hexdigest(), name
        assert entry["description"] == description


def _write_fixture_pack() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    plans = {}
    for name, (builder, description) in GOLDENS.items():
        golden, _ = builder()
        with open(os.path.join(FIXTURE_DIR, f"{name}.bin"), "wb") as fh:
            fh.write(golden)
        plans[name] = {"file": f"{name}.bin",
                       "sha256": hashlib.sha256(golden).hexdigest(),
                       "size_bytes": len(golden),
                       "description": description}
    manifest = {
        "message": "substrait.Plan",
        "encoding": "protobuf binary (proto3 wire format)",
        "spec": "substrait v0.53 (version.minor_number = 53)",
        "producer": VERSION_IR["producer"],
        "extension_note": (
            "g5 carries a producer-specific SampleRel inside "
            "ExtensionSingleRel.detail (google.protobuf.Any, type_url "
            "type.googleapis.com/spark.substrait_spark.SampleRel); "
            "implementations without that extension should still "
            "decode the Any envelope and may skip the node"),
        "plans": plans,
    }
    with open(os.path.join(FIXTURE_DIR, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    _write_fixture_pack()
    print(f"wrote {len(GOLDENS)} fixtures to {FIXTURE_DIR}")
