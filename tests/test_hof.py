"""Higher-order (lambda) functions through the interchange (r10).

The reference has no lambda surface at all (its scalar consume is the fixed
26-name table, consumer.rs:37-71); this is the engine's extension closing
the r9 verdict's top capability gap. Encoding: a Catalyst LambdaFunction
rides as the extension call ``lambda(n_params: i32, body)`` and a
NamedLambdaVariable as ``lambda_var(depth: i32, index: i32)`` (de Bruijn,
depth 0 = innermost), so nested lambdas and outer-column capture roundtrip
without carrying exprIds across the plan boundary. Both helpers are plain
extension scalar functions — the binary wire codec needs no new cases.

Generalizes the reference's roundtrip contract (tests/roundtrip.rs:247-262)
to the lambda grammar; the one-snippet-per-name coverage lives in
test_function_battery.py, deeper shapes here.
"""

from __future__ import annotations

import copy

import pytest

from datafusion_substrait_spark import (SubstraitError, from_substrait_plan,
                                        roundtrip, to_substrait_plan)
from datafusion_substrait_spark.plans import wire
from tests.conftest import assert_same_result


def check(spark, sql: str) -> None:
    """JSON roundtrip AND binary-wire roundtrip, value-compared."""
    df = spark.sql(sql)
    plan = to_substrait_plan(df)
    assert_same_result(df, from_substrait_plan(spark, plan))
    wired = wire.decode_plan(wire.encode_plan(plan))
    assert_same_result(df, from_substrait_plan(spark, wired))


BASE = "FROM orders WHERE o_orderkey % 11 = 0"


def test_nested_lambdas_with_outer_capture(spark):
    # 2-deep: inner body references BOTH lambda frames and a relation column
    check(spark, f"""
        SELECT o_orderkey,
               transform(split(o_orderpriority, '-'), x ->
                   transform(split(o_orderstatus, ''), y ->
                       concat(x, y, o_orderpriority))) AS c
        {BASE}""")
    # 3-deep, inner refers to all three frames by distinct depths
    check(spark, f"""
        SELECT transform(split(o_orderpriority, '-'), a ->
                   transform(array(a), b ->
                       transform(array(b), c2 ->
                           concat(a, b, c2)))) AS c
        {BASE}""")


def test_index_aware_transform_and_filter(spark):
    check(spark, f"""
        SELECT transform(split(o_orderpriority, '-'),
                         (x, i) -> concat(x, '#', i)) AS c
        {BASE}""")
    check(spark, f"""
        SELECT filter(split(o_orderpriority, '-'),
                      (x, i) -> i > 0) AS c
        {BASE}""")


def test_aggregate_with_finish_and_reduce_alias(spark):
    check(spark, f"""
        SELECT aggregate(sequence(1, CAST(o_orderkey % 7 + 1 AS INT)),
                         CAST(0 AS BIGINT),
                         (acc, v) -> acc + v,
                         acc -> acc * 100) AS c
        {BASE}""")
    # reduce() parses to the same ArrayAggregate node
    check(spark, f"""
        SELECT reduce(split(o_orderpriority, '-'), '',
                      (acc, x) -> concat(acc, '|', x)) AS c
        {BASE}""")


def test_array_compact_unfenced(spark):
    # the optimizer rewrites array_compact to ArrayFilter(x -> isnotnull(x));
    # that lambda now rides the encoding (was a documented r9 fence)
    check(spark, f"""
        SELECT array_compact(array(o_orderkey, NULL, o_custkey,
                                   nullif(o_orderkey, o_orderkey))) AS c
        {BASE}""")


def test_array_sort_default_and_custom_comparator(spark):
    # default comparator is itself a 2-param lambda filled in by the parser
    check(spark, f"SELECT array_sort(split(o_orderpriority, '-')) AS c {BASE}")
    check(spark, f"""
        SELECT array_sort(split(o_orderpriority, '-'), (l, r) ->
            CASE WHEN length(l) < length(r) THEN -1
                 WHEN length(l) > length(r) THEN 1 ELSE 0 END) AS c
        {BASE}""")


def test_hof_composes_with_relations(spark):
    # lambda columns flowing through join + aggregate + sort, the shapes a
    # real array-heavy pipeline produces
    check(spark, """
        SELECT c.c_mktsegment AS seg,
               count(*) AS n,
               sum(aggregate(sequence(1, CAST(o.o_orderkey % 5 + 1 AS INT)),
                             0, (acc, v) -> acc + v)) AS s
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE exists(split(o.o_orderpriority, '-'), x -> length(x) >= 3)
        GROUP BY c.c_mktsegment
        ORDER BY seg""")


def test_lambda_vs_duckdb_values(spark):
    """Differential value check: the same lambda pipeline in DuckDB's
    list_transform/list_filter must produce identical rows (the model for
    the driver-visible q28 widening)."""
    import duckdb

    from tests.conftest import SF_DIR

    df = spark.sql("""
        SELECT o_orderkey,
               transform(split(o_orderpriority, '-'), x -> lower(x)) AS lw,
               filter(split(o_orderpriority, '-'), x -> length(x) > 2) AS fl,
               aggregate(split(o_orderpriority, '-'), 0,
                         (acc, x) -> acc + length(x)) AS tot
        FROM orders WHERE o_orderkey % 13 = 0""")
    got = sorted((tuple(r) for r in roundtrip(df).collect()), key=repr)
    con = duckdb.connect()
    want_rows = con.sql("""
        SELECT o_orderkey,
               list_transform(string_split(o_orderpriority, '-'),
                              x -> lower(x)) AS lw,
               list_filter(string_split(o_orderpriority, '-'),
                           x -> length(x) > 2) AS fl,
               list_reduce(list_prepend(0,
                   list_transform(string_split(o_orderpriority, '-'),
                                  x -> length(x))),
                   (acc, x) -> acc + x) AS tot
        FROM read_parquet('{SF_DIR}/orders.parquet')
        WHERE o_orderkey % 13 = 0""".replace("{SF_DIR}", SF_DIR)).fetchall()
    want = sorted((tuple(r) for r in want_rows), key=repr)
    assert got == want and len(got) > 0


def test_exists_legacy_two_valued_form_fences(spark):
    """followThreeValuedLogic is a node FIELD riding a legacy conf; the
    consumer rebuilds the session default (3VL), so the legacy form must
    translate-or-error, not silently change NULL handling."""
    conf = "spark.sql.legacy.followThreeValuedLogicInArrayExists"
    spark.conf.set(conf, "false")
    try:
        df = spark.sql(
            "SELECT exists(array(o_orderkey, NULL), x -> x > 99) AS c "
            "FROM orders")
        with pytest.raises(SubstraitError, match="followThreeValuedLogic"):
            to_substrait_plan(df)
    finally:
        spark.conf.unset(conf)
    # and the default form still produces
    df = spark.sql(
        "SELECT exists(array(o_orderkey, NULL), x -> x > 99) AS c "
        "FROM orders")
    assert_same_result(df, roundtrip(df))


def _hof_plan(spark):
    return to_substrait_plan(spark.sql(
        "SELECT transform(split(o_orderpriority, '-'), x -> upper(x)) AS c "
        "FROM orders"))


def _walk_fns(d, out):
    if isinstance(d, dict):
        if "scalarFunction" in d:
            out.append(d["scalarFunction"])
        for v in d.values():
            _walk_fns(v, out)
    elif isinstance(d, list):
        for v in d:
            _walk_fns(v, out)


def test_malformed_lambda_encodings_error_cleanly(spark):
    plan = _hof_plan(spark)
    anchors = {d["extensionFunction"]["name"]: d["extensionFunction"][
        "functionAnchor"] for d in plan["extensions"]}
    assert {"transform", "lambda", "lambda_var"} <= set(anchors)

    # (a) a bare lambda outside any HOF argument position
    p = copy.deepcopy(plan)
    fns = []
    _walk_fns(p, fns)
    hof = next(f for f in fns if f["functionReference"] == anchors["transform"])
    hof["functionReference"] = anchors["lambda"]
    with pytest.raises(SubstraitError, match="direct argument"):
        from_substrait_plan(spark, p)

    # (b) lambda_var depth pointing past the open frames
    p = copy.deepcopy(plan)
    fns = []
    _walk_fns(p, fns)
    for f in fns:
        if f["functionReference"] == anchors["lambda_var"]:
            f["arguments"][0]["value"]["literal"]["i32"] = 7
    with pytest.raises(SubstraitError, match="out of scope"):
        from_substrait_plan(spark, p)

    # (c) lambda arity the host HOF does not allow — caught by the
    # position-shape validation BEFORE pyspark could raise a raw JVM
    # AnalysisException mid-build
    p = copy.deepcopy(plan)
    fns = []
    _walk_fns(p, fns)
    for f in fns:
        if f["functionReference"] == anchors["lambda"]:
            f["arguments"][0]["value"]["literal"]["i32"] = 4
    with pytest.raises(SubstraitError, match=r"allows \[1, 2\]"):
        from_substrait_plan(spark, p)

    # (d) a lambda sitting at a DATA argument position
    p = copy.deepcopy(plan)
    fns = []
    _walk_fns(p, fns)
    hof = next(f for f in fns if f["functionReference"] == anchors["transform"])
    lam = next(a["value"] for a in hof["arguments"]
               if a["value"].get("scalarFunction", {}).get(
                   "functionReference") == anchors["lambda"])
    hof["arguments"][0] = {"value": lam}
    with pytest.raises(SubstraitError, match="no lambda at argument 0"):
        from_substrait_plan(spark, p)


def test_consumed_hof_keeps_catalyst_form(spark):
    """The consumed plan must execute the SAME JVM HigherOrderFunction —
    no python UDF, no interpreted fallback introduced by the roundtrip."""
    df = spark.sql(
        "SELECT sum(aggregate(sequence(1, CAST(o_orderkey % 5 + 1 AS INT)), "
        "0, (acc, v) -> acc + v)) AS s FROM orders")
    back = roundtrip(df)
    phys = back._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in phys and "BatchEvalPython" not in phys
    assert "aggregate(" in phys or "lambdafunction" in phys.lower()
    assert_same_result(df, back)


def test_hof_in_window_join_condition_and_measure_filter(spark):
    """Lambdas must ride wherever rex() is reachable: window-function
    arguments, join conditions, and per-measure FILTER predicates."""
    # window: aggregate-fold as the windowed measure's argument
    check(spark, """
        SELECT o_orderkey,
               sum(aggregate(split(o_orderpriority, '-'), 0,
                             (acc, x) -> acc + length(x)))
                   OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS w
        FROM orders WHERE o_custkey < 300""")
    # join condition: non-equi exists() over the left side's array
    check(spark, """
        SELECT o_orderkey, c_custkey
        FROM orders JOIN customer
          ON o_custkey = c_custkey
         AND exists(split(o_orderpriority, '-'),
                    x -> length(x) = length(c_mktsegment) - 5)
        WHERE o_orderkey % 17 = 0""")
    # aggregate measure FILTER with a forall() predicate
    check(spark, """
        SELECT o_orderstatus,
               count(*) FILTER (WHERE forall(split(o_orderpriority, '-'),
                                             x -> length(x) >= 1)) AS n
        FROM orders GROUP BY o_orderstatus""")
    # HOF as the grouping key itself
    check(spark, """
        SELECT aggregate(split(o_orderpriority, '-'), 0,
                         (a, x) -> a + length(x)) AS k, count(*) AS n
        FROM orders GROUP BY 1""")
    # HOF in the sort key + CASE nested inside a lambda body
    check(spark, """
        SELECT o_orderkey,
               transform(split(o_orderpriority, '-'), x ->
                   CASE WHEN length(x) > 2 THEN upper(x) ELSE x END) AS c
        FROM orders
        ORDER BY exists(split(o_orderpriority, '-'), x -> x = 'LOW'),
                 o_orderkey
        LIMIT 20""")
