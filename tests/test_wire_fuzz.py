"""Property-based fuzz of the hand-rolled protobuf wire primitives.

`plans/wire.py` is the one place in the repo where a byte-level bug could
silently corrupt plans (the codec is hand-written because protobuf bindings
aren't installable — SURVEY.md §7), so the primitives get adversarial
random coverage on top of test_wire.py's byte goldens: varint/two's-
complement/scalar roundtrips over the full value domains, and
garbage-input decoding must fail with SubstraitError, never IndexError or
a silent wrong value.
"""

from __future__ import annotations

import base64
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_substrait_spark.plans.proto import SubstraitError
from datafusion_substrait_spark.plans import wire


@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
@settings(max_examples=300, deadline=None)
def test_uvarint_roundtrip(n):
    buf = wire.encode_uvarint(n)
    got, pos = wire.decode_uvarint(buf, 0)
    assert got == n and pos == len(buf)


@given(st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1))
@settings(max_examples=300, deadline=None)
def test_i64_twos_complement_roundtrip(n):
    buf = wire._encode_scalar("i64", n)
    got, pos = wire._decode_scalar("i64", buf, 0, wire._WT_VARINT)
    assert got == n and pos == len(buf)


@given(st.floats(allow_nan=True, allow_infinity=True))
@settings(max_examples=200, deadline=None)
def test_f64_roundtrip(x):
    buf = wire._encode_scalar("f64", x)
    got, _ = wire._decode_scalar("f64", buf, 0, wire._WT_FIXED64)
    assert (math.isnan(x) and math.isnan(got)) or got == x


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_str_roundtrip(s):
    buf = wire._encode_scalar("str", s)
    got, pos = wire._decode_scalar("str", buf, 0, wire._WT_LEN)
    assert got == s and pos == len(buf)


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_bytes_roundtrip(b):
    b64 = base64.b64encode(b).decode("ascii")
    buf = wire._encode_scalar("bytes", b64)
    got, pos = wire._decode_scalar("bytes", buf, 0, wire._WT_LEN)
    assert got == b64 and pos == len(buf)


@given(st.binary(max_size=64), st.integers(min_value=0, max_value=64))
@settings(max_examples=300, deadline=None)
def test_uvarint_decode_never_crashes_on_garbage(buf, pos):
    """Any (buf, pos) must either decode cleanly inside the buffer or raise
    SubstraitError — no IndexError, no infinite loop, no >10-byte reads."""
    try:
        got, end = wire.decode_uvarint(buf, pos)
    except SubstraitError:
        return
    assert 0 <= got
    assert pos < end <= min(len(buf), pos + 10)


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_message_decode_rejects_or_survives_garbage(raw):
    """decode_message over a real schema on random bytes must raise
    SubstraitError (or produce a dict for coincidentally-valid input) —
    never leak a raw struct.error/IndexError/UnicodeDecodeError."""
    try:
        out = wire.decode_message("Plan", raw)
    except SubstraitError:
        return
    assert isinstance(out, dict)


def test_plan_wire_roundtrip_still_exact(spark):
    """End-anchor: a real produced plan survives encode_plan→decode_plan
    with canonical equality (the fuzz above covers the primitives; this
    pins the composition)."""
    from datafusion_substrait_spark import to_substrait_plan

    df = spark.sql("""
        SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS s
        FROM orders WHERE o_totalprice BETWEEN 100 AND 300000
        GROUP BY o_orderstatus ORDER BY o_orderstatus LIMIT 5
    """)
    plan = to_substrait_plan(df)  # already a proto3-JSON-shaped dict
    blob = wire.encode_plan(plan)
    assert wire.canonical(wire.decode_plan(blob)) == wire.canonical(plan)


# ---------------------------------------------------------------------------
# schema-driven composed-message fuzz: random VALID messages for every
# schema in the wire table; decode∘encode must be idempotent and encode
# deterministic. (Oneof groups aren't marked in the table, so a generated
# dict can carry two members of one oneof — wire-legal, decoder keeps the
# last — which is why the property is idempotence rather than strict
# equality with the input; the golden tests in test_wire.py pin semantics.)
# ---------------------------------------------------------------------------

from hypothesis import strategies as hst


def _scalar_strategy(kind):
    if kind == "u32":
        return hst.integers(0, (1 << 32) - 1)
    if kind == "u64":
        return hst.integers(0, (1 << 64) - 1)
    if kind == "i32":
        return hst.integers(-(1 << 31), (1 << 31) - 1)
    if kind == "i64":
        return hst.integers(-(1 << 63), (1 << 63) - 1)
    if kind == "bool":
        return hst.booleans()
    if kind == "f32":
        return hst.floats(allow_nan=False, width=32)
    if kind == "f64":
        return hst.floats(allow_nan=False)
    if kind == "str":
        return hst.text(max_size=30)
    if kind == "bytes":
        return hst.binary(max_size=30).map(
            lambda b: base64.b64encode(b).decode("ascii"))
    return None  # any / rawbytes: internal kinds, not generated


@st.composite
def _message(draw, schema_name, depth=3):
    schema = wire.MESSAGES[schema_name]
    msg = {}
    for name, spec in schema.items():
        if not draw(hst.booleans()):
            continue  # exercise field-presence combinations
        kind, repeated = spec[1], len(spec) > 2
        if kind.startswith("m:"):
            if depth <= 0:
                continue
            strat = _message(kind[2:], depth=depth - 1)
        elif kind.startswith("e:"):
            strat = hst.sampled_from(sorted(wire.ENUMS[kind[2:]]))
        else:
            strat = _scalar_strategy(kind)
            if strat is None:
                continue
        if repeated:
            vals = draw(hst.lists(strat, min_size=1, max_size=3))
            msg[name] = vals
        else:
            msg[name] = draw(strat)
    return msg


@given(hst.sampled_from(sorted(wire.MESSAGES)).flatmap(
    lambda s: hst.tuples(hst.just(s), _message(s))))
@settings(max_examples=300, deadline=None)
def test_every_schema_roundtrips_idempotently(named):
    schema_name, msg = named
    e1 = wire.encode_message(schema_name, msg)
    d1 = wire.decode_message(schema_name, e1)
    e2 = wire.encode_message(schema_name, d1)
    d2 = wire.decode_message(schema_name, e2)
    assert d2 == d1, (schema_name, msg)
    assert e2 == wire.encode_message(schema_name, d2)
