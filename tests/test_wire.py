"""Binary protobuf wire format tests (plans/wire.py).

Three layers:
1. Wire primitives against hand-computed byte goldens from the protobuf
   encoding spec (varint, tags, two's-complement int64, fixed64).
2. A hand-assembled golden message (Version) checked byte-for-byte.
3. ``decode(encode(plan)) == plan`` over every rel/expression shape the
   producer emits, driven by real Catalyst plans, plus the disk path
   (serialize fmt="proto" → deserialize → consume → same results).
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from datafusion_substrait_spark.plans import proto, wire
from datafusion_substrait_spark.plans.consumer import from_substrait_plan
from datafusion_substrait_spark.plans.producer import to_substrait_plan
from datafusion_substrait_spark.plans.serializer import deserialize, serialize

from conftest import assert_same_result


# -- 1. wire primitives ------------------------------------------------------


def test_uvarint_goldens():
    # protobuf encoding doc examples
    assert wire.encode_uvarint(0) == b"\x00"
    assert wire.encode_uvarint(1) == b"\x01"
    assert wire.encode_uvarint(127) == b"\x7f"
    assert wire.encode_uvarint(128) == b"\x80\x01"
    assert wire.encode_uvarint(300) == b"\xac\x02"
    assert wire.decode_uvarint(b"\xac\x02", 0) == (300, 2)


def test_negative_int64_is_ten_bytes():
    # int64 -1 = 2^64-1 → ten 0xff-leading varint bytes, per spec
    b = wire._encode_scalar("i64", -1)
    assert b == b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    v, pos = wire._decode_scalar("i64", b, 0, 0)
    assert (v, pos) == (-1, 10)


def test_tag_bytes():
    # field 1, wire type 2 (len) → 0x0a; field 2 varint → 0x10
    assert wire._tag(1, 2) == b"\x0a"
    assert wire._tag(2, 0) == b"\x10"
    # field 16 needs a 2-byte tag: (16<<3)|0 = 128
    assert wire._tag(16, 0) == b"\x80\x01"


def test_fixed64_double():
    assert wire._encode_scalar("f64", 1.0) == b"\x00\x00\x00\x00\x00\x00\xf0?"


def test_golden_version_message():
    # Version { minor_number = 2 (varint): 53 ; producer = 5 (len): "x" }
    # tags: (2<<3)|0 = 0x10 ; (5<<3)|2 = 0x2a
    msg = {"minorNumber": 53, "producer": "x"}
    assert wire.encode_message("Version", msg) == b"\x10\x35\x2a\x01x"
    assert wire.decode_message("Version", b"\x10\x35\x2a\x01x") == msg


def test_packed_repeated_uint32():
    # GenerateRel.required_child_indices = 4, packed → tag (4<<3)|2 = 0x22
    b = wire.encode_message("GenerateRel", {"requiredChildIndices": [0, 1, 300]})
    assert b == b"\x22\x04\x00\x01\xac\x02"
    assert wire.decode_message("GenerateRel", b) == {
        "requiredChildIndices": [0, 1, 300]}
    # unpacked form must decode identically (proto compatibility rule)
    unpacked = b"\x20\x00\x20\x01\x20\xac\x02"
    assert wire.decode_message("GenerateRel", unpacked) == {
        "requiredChildIndices": [0, 1, 300]}


def test_unknown_fields_skipped():
    # append an unknown field 99 (varint) to a Version message: still decodes
    payload = wire.encode_message("Version", {"minorNumber": 53})
    unknown = wire._tag(99, 0) + wire.encode_uvarint(7)
    assert wire.decode_message("Version", payload + unknown) == {
        "minorNumber": 53}


def test_unmapped_ir_field_raises():
    with pytest.raises(proto.SubstraitError, match="no wire mapping"):
        wire.encode_message("Version", {"minorNumber": 1, "bogus": 2})


# -- 3. produced-plan roundtrips --------------------------------------------


def _wire_roundtrip(df):
    plan = to_substrait_plan(df)
    encoded = wire.encode_plan(plan)
    decoded = wire.decode_plan(encoded)
    # empty repeated fields have no wire representation (proto3) — the
    # contract is equality after empty-list elision on the source side
    assert decoded == wire.canonical(plan), \
        "wire roundtrip must reproduce the IR dict (modulo empty lists)"
    return decoded


def test_wire_roundtrip_read_filter_project(spark, tables):
    df = (tables["orders"].filter(F.col("o_totalprice") > 1000)
          .select("o_orderkey", (F.col("o_totalprice") * 2).alias("dbl")))
    decoded = _wire_roundtrip(df)
    assert_same_result(df, from_substrait_plan(spark, decoded))


def test_wire_roundtrip_agg_distinct_filter_sort_fetch(spark, tables):
    df = (tables["orders"]
          .groupBy("o_orderstatus")
          .agg(F.countDistinct("o_custkey").alias("cd"),
               F.sum("o_totalprice").alias("s"),
               F.max(F.when(F.col("o_totalprice") > 100,
                            F.col("o_totalprice"))).alias("mx"))
          .orderBy(F.col("s").desc_nulls_last())
          .limit(3))
    decoded = _wire_roundtrip(df)
    assert_same_result(df, from_substrait_plan(spark, decoded))


def test_wire_roundtrip_joins_and_sets(spark, tables):
    n, r = tables["nation"], tables["region"]
    df = (n.join(r, n["n_regionkey"] == r["r_regionkey"], "left")
          .select("n_name", "r_name"))
    decoded = _wire_roundtrip(df)
    assert_same_result(df, from_substrait_plan(spark, decoded))
    u = (n.select("n_name").unionAll(r.select(F.col("r_name").alias("n_name"))))
    decoded = _wire_roundtrip(u)
    assert_same_result(u, from_substrait_plan(spark, decoded))


def test_wire_roundtrip_window(spark, tables):
    from pyspark.sql.window import Window
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    df = tables["orders"].select(
        "o_orderkey", F.row_number().over(w).alias("rn"))
    decoded = _wire_roundtrip(df)
    assert_same_result(df, from_substrait_plan(spark, decoded))


def test_wire_roundtrip_literals_case_in(spark, tables):
    df = tables["lineitem"].select(
        F.when(F.col("l_quantity") > 25, F.lit("big"))
         .otherwise(F.lit("small")).alias("sz"),
        F.col("l_shipdate"),
        (F.col("l_extendedprice") * F.lit(0.5)).alias("half"),
        F.lit(None).cast("bigint").alias("nl"),
    ).filter(F.col("l_returnflag").isin("A", "N"))
    decoded = _wire_roundtrip(df)
    assert_same_result(df, from_substrait_plan(spark, decoded))


def test_wire_roundtrip_decimal_literal(spark, tables):
    import decimal as d
    df = tables["orders"].select(
        (F.col("o_totalprice") + F.lit(d.Decimal("12.34"))).alias("p"))
    decoded = _wire_roundtrip(df)
    assert_same_result(df, from_substrait_plan(spark, decoded))


def test_wire_roundtrip_rollup_and_explode(spark, tables):
    df = (tables["orders"]
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(F.sum("o_totalprice").alias("s")))
    decoded = _wire_roundtrip(df)
    assert_same_result(df, from_substrait_plan(spark, decoded))
    ex = tables["documents"].select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")).limit(7)
    decoded = _wire_roundtrip(ex)
    assert_same_result(ex, from_substrait_plan(spark, decoded))


def test_wire_roundtrip_scalar_subquery(spark, tables):
    tables["orders"].createOrReplaceTempView("orders")
    df = spark.sql(
        "SELECT o_orderkey FROM orders "
        "WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)")
    decoded = _wire_roundtrip(df)
    assert_same_result(df, from_substrait_plan(spark, decoded))


def test_wire_binary_is_compact(spark, tables):
    df = (tables["orders"].filter(F.col("o_totalprice") > 1000)
          .groupBy("o_orderstatus").agg(F.sum("o_totalprice").alias("s")))
    plan = to_substrait_plan(df)
    assert len(wire.encode_plan(plan)) < len(proto.dumps(plan))


# -- disk path ---------------------------------------------------------------


def test_serialize_proto_format_disk_roundtrip(spark, tables):
    sql = ("SELECT o_orderstatus, sum(o_totalprice) AS s FROM orders "
           "GROUP BY o_orderstatus")
    direct = spark.sql(sql)
    with tempfile.TemporaryDirectory() as d:
        pj, pb = os.path.join(d, "p.json"), os.path.join(d, "p.bin")
        serialize(sql, spark, pj, fmt="json")
        serialize(sql, spark, pb, fmt="proto")
        raw = open(pb, "rb").read()
        assert raw[:1] != b"{", "binary format must not be JSON"
        plan_j, plan_b = deserialize(pj), deserialize(pb)
        assert wire.canonical(plan_j) == plan_b, \
            "both formats must decode to the same IR"
        assert_same_result(direct, from_substrait_plan(spark, plan_b))


def test_serialize_unknown_format_raises(spark):
    with pytest.raises(proto.SubstraitError, match="unknown serialize format"):
        serialize("SELECT 1", spark, "/tmp/x", fmt="yaml")


def test_wire_roundtrip_virtual_table(spark, tables):
    # VALUES → ReadRel{virtualTable}: Literal.Struct rows over the wire,
    # including a typed null; and the zero-row constant-folded-empty form
    df = spark.sql("SELECT * FROM VALUES (1, 'a'), (2, NULL) AS t(k, v)")
    decoded = _wire_roundtrip(df)
    assert_same_result(df, from_substrait_plan(spark, decoded))

    empty = tables["orders"].filter(F.col("o_totalprice") < F.col("o_totalprice")) \
        .select("o_orderkey")
    decoded = _wire_roundtrip(empty)
    assert_same_result(empty, from_substrait_plan(spark, decoded))


def test_wire_roundtrip_sample(spark, tables):
    # SampleRel rides the same Any envelope as GenerateRel
    df = spark.sql(
        "SELECT o_orderkey FROM orders TABLESAMPLE (20 PERCENT) REPEATABLE (5)"
    )
    decoded = _wire_roundtrip(df)
    assert_same_result(df, from_substrait_plan(spark, decoded))


def test_wire_roundtrip_exchange(spark, tables):
    # ExchangeRel: scatter-by-fields and round-robin, both over the wire
    df = (spark.table("orders").repartition(4, "o_custkey")
          .select("o_orderkey", "o_custkey"))
    decoded = _wire_roundtrip(df)
    assert_same_result(df, from_substrait_plan(spark, decoded))

    rr = spark.table("nation").repartition(3).select("n_name")
    decoded = _wire_roundtrip(rr)
    assert_same_result(rr, from_substrait_plan(spark, decoded))


def test_cast_wire_field_number_matches_spec():
    # Expression.cast is field 11 in the public spec (7 is
    # switch_expression); tag byte = (11 << 3) | 2 = 0x5a. An earlier
    # transcription used 7, which conformant tooling would read as a
    # SwitchExpression.
    body = wire.encode_message("Expression", {
        "cast": {"type": {"i64": {"nullability": "NULLABILITY_NULLABLE"}},
                 "input": {"literal": {"i32": 1}},
                 "failureBehavior": "FAILURE_BEHAVIOR_THROW_EXCEPTION"}})
    assert body[0] == 0x5A


def test_length_delimited_wire_type_enforced():
    # a str field encoded with a varint wire type must raise, not silently
    # decode its value byte as a length prefix
    buf = wire._tag(5, wire._WT_VARINT) + wire.encode_uvarint(0)
    with pytest.raises(wire.SubstraitError, match="wire type"):
        wire.decode_message("Version", buf)


def test_spec_valid_unsupported_fields_fail_loudly():
    """Silently skipping a spec-valid feature we can't consume hollows the
    expression out and errors far away; the decoder must name the feature
    at the byte layer instead."""
    for num, pat in ((5, "window_function"), (9, "multi_or_list")):
        buf = bytes([(num << 3) | 2, 0])
        with pytest.raises(proto.SubstraitError, match=pat):
            wire.decode_message("Expression", buf)
    with pytest.raises(proto.SubstraitError, match="masked_reference"):
        wire.decode_message("FieldReference", bytes([(2 << 3) | 2, 0]))


def _foreign_encode(schema_name: str, msg: dict) -> bytes:
    """A SECOND conformant proto3 serializer with different legal choices
    than plans/wire.py: fields emitted in DESCENDING field-number order
    (field order is not significant in proto3) and repeated varint
    scalars written UNPACKED (one tag per element). A foreign Substrait
    implementation is free to make exactly these choices, so our decoder
    must consume them — this is the strongest foreign-decode check
    available without external Substrait bindings (the documented r7+
    external blocker)."""
    schema = wire.MESSAGES[schema_name]
    out = bytearray()
    extra = set(msg) - set(schema)
    assert not extra, f"{schema_name}: unmapped fields {extra}"
    for name, spec in sorted(schema.items(), key=lambda kv: -kv[1][0]):
        if name not in msg:
            continue
        num, kind = spec[0], spec[1]
        repeated = len(spec) > 2
        values = msg[name] if repeated else [msg[name]]
        for v in values:
            if kind.startswith("m:"):
                body = _foreign_encode(kind[2:], v)
                out += (wire._tag(num, wire._WT_LEN)
                        + wire.encode_uvarint(len(body)) + body)
            elif kind == "any":
                body = wire._encode_any(v)
                out += (wire._tag(num, wire._WT_LEN)
                        + wire.encode_uvarint(len(body)) + body)
            elif kind.startswith("e:"):
                out += (wire._tag(num, wire._WT_VARINT)
                        + wire.encode_uvarint(wire.ENUMS[kind[2:]][v]))
            else:
                # unpacked even when repeated (legal; wire.py writes packed)
                out += (wire._tag(num, wire._wire_type(kind))
                        + wire._encode_scalar(kind, v))
    return bytes(out)


def test_foreign_encoding_choices_decode_and_execute(spark, tables):
    """decode_plan must accept byte streams from serializers that made
    different (conformant) choices: reversed field order + unpacked
    repeated scalars, over real produced plans covering reads, filters,
    aggregates, joins, windows, generate, set ops, and the r10 lambda
    encoding."""
    sqls = [
        "SELECT o_orderstatus, round(sum(o_totalprice), 2) AS s, "
        "count(DISTINCT o_custkey) AS n FROM orders "
        "WHERE o_orderkey % 3 = 0 GROUP BY o_orderstatus",
        "SELECT c_mktsegment, n_name, count(*) AS n FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY c_mktsegment, n_name",
        "SELECT o_custkey, row_number() OVER (PARTITION BY o_orderstatus "
        "ORDER BY o_totalprice, o_orderkey) AS rn FROM orders",
        "SELECT part, count(*) AS n FROM (SELECT "
        "explode(transform(split(o_orderpriority, '-'), x -> lower(x))) "
        "AS part FROM orders) GROUP BY part",
        "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' "
        "UNION SELECT o_orderkey FROM orders WHERE o_custkey < 50",
        "SELECT aggregate(split(o_orderpriority, '-'), 0, "
        "(a, x) -> a + length(x)) AS k FROM orders "
        "ORDER BY k, o_orderkey LIMIT 25",
    ]
    for sql in sqls:
        df = spark.sql(sql)
        ir = to_substrait_plan(df)
        foreign = _foreign_encode("Plan", ir)
        assert foreign != wire.encode_plan(ir), "variant must differ"
        decoded = wire.decode_plan(foreign)
        assert wire.canonical(decoded) == wire.canonical(ir), sql
        assert_same_result(df, from_substrait_plan(spark, decoded))


def test_foreign_optimization_any_is_opaque_not_fatal(spark, tables):
    """Spec: an AdvancedExtension *optimization* 'may be ignored by a
    consumer' — so a third-party Any there must decode opaquely (and
    re-encode byte-faithfully), not kill the plan. Extension-rel `detail`
    Anys stay strict: the rel is meaningless without a consumable detail."""
    import base64

    df = (spark.table("orders")
          .join(F.broadcast(spark.table("customer")),
                F.col("o_custkey") == F.col("c_custkey"))
          .select("o_orderkey", "c_name"))
    ir = to_substrait_plan(df)

    def find_join(rel):
        if "join" in rel:
            return rel["join"]
        for v in rel.values():
            if isinstance(v, dict):
                r = find_join(v)
                if r is not None:
                    return r
        return None

    j = find_join(ir["relations"][0]["root"]["input"])
    foreign = {"@type": "type.googleapis.com/io.foreign.JoinOpt",
               "@opaqueValue": base64.b64encode(b"\x08\x2a").decode()}
    j["advancedExtension"]["optimization"].insert(0, foreign)

    blob = wire.encode_plan(ir)
    back = wire.decode_plan(blob)
    assert back == ir  # opaque entry roundtrips byte-faithfully
    # JSON consume ignores the foreign optimization, keeps OUR hint
    out = from_substrait_plan(spark, back)
    assert "Broadcast" in out._jdf.queryExecution().executedPlan().toString()

    # strict contract unchanged where the Any IS the semantics: an
    # extensionSingle detail with an unregistered type still fails loudly
    sampled = to_substrait_plan(
        spark.table("orders").sample(0.5, seed=3).select("o_orderkey"))

    def find_single(rel):
        if "extensionSingle" in rel:
            return rel["extensionSingle"]
        for v in rel.values():
            if isinstance(v, dict):
                r = find_single(v)
                if r is not None:
                    return r
        return None

    es = find_single(sampled["relations"][0]["root"]["input"])
    es["detail"] = {"@type": "type.googleapis.com/io.foreign.Rel"}
    with pytest.raises(wire.SubstraitError, match="unregistered Any type"):
        wire.encode_plan(sampled)
