"""Completeness battery for the scalar-function translation tables.

One SQL expression per substrait function name in the producer's tables
(functions/ops.py). The test (a) asserts every produce-table name has a
snippet — so adding a table entry without coverage fails loudly — and
(b) roundtrips the snippets, asserting each name actually lands in the
produced plan's extension registry. This is the systematic form of the
reference's per-operator roundtrip tests (tests/roundtrip.rs).
"""

from __future__ import annotations

import pytest

from datafusion_substrait_spark import roundtrip, to_substrait_plan
from datafusion_substrait_spark.functions import ops
from tests.conftest import assert_same_result

# substrait name -> SQL expression (over orders; aliased by position below).
# Predicates ride as boolean select items, so one SELECT covers many names.
SNIPPETS: dict[str, str] = {
    # comparisons
    "equal": "o_orderkey = 7",
    "not_equal": "o_orderkey != 7",
    "lt": "o_orderkey < 50",
    "lte": "o_orderkey <= 50",
    "gt": "o_orderkey > 50",
    "gte": "o_orderkey >= 50",
    # arithmetic
    "add": "o_orderkey + 1",
    "subtract": "o_orderkey - 1",
    "multiply": "o_orderkey * 3",
    "divide": "o_totalprice / 2.0",
    "div": "o_orderkey div 7",
    "mod": "o_orderkey % 13",
    "negate": "-o_totalprice",
    # boolean
    "and": "(o_orderkey > 2 AND o_custkey > 2)",
    "or": "(o_orderkey > 2 OR o_custkey > 2)",
    # NOT of a comparison/conjunction gets rewritten (De Morgan, inverted
    # operators); Not(StartsWith) has no negated table entry so it survives
    # as a bare `not` call
    "not": "(o_orderpriority NOT LIKE '1%')",
    # LIKE family (Catalyst lowers anchored patterns to these classes)
    "like": "o_orderpriority LIKE '%URG%T'",
    "not_like": "o_orderpriority NOT LIKE '%URG%T'",
    "starts_with": "o_orderpriority LIKE '1%'",
    "ends_with": "o_orderpriority LIKE '%LOW'",
    "contains": "o_orderpriority LIKE '%HIGH%'",
    # null-safe equality / null checks
    "is_not_distinct_from": "o_orderstatus <=> 'F'",
    "is_distinct_from": "(NOT (o_orderstatus <=> 'F'))",
    "is_null": "(nullif(o_orderstatus, 'F') IS NULL)",
    "is_not_null": "(nullif(o_orderstatus, 'F') IS NOT NULL)",
    # regex
    "regex_match": "o_orderpriority RLIKE '^[1-3]'",
    "regex_not_match": "o_orderpriority NOT RLIKE '^[1-3]'",
    "regex_imatch": "o_orderpriority RLIKE '(?i)urgent'",
    "regex_not_imatch": "o_orderpriority NOT RLIKE '(?i)urgent'",
    # bitwise
    "bitwise_and": "o_orderkey & 255",
    "bitwise_or": "o_orderkey | 4096",
    "bitwise_xor": "o_orderkey ^ o_custkey",
    "bitwise_not": "~o_orderkey",
    "bitwise_shift_left": "shiftleft(o_orderkey, 2)",
    "bitwise_shift_right": "shiftright(o_orderkey, 2)",
    # dates
    "date_add": "date_add(o_orderdate, 30)",
    "date_sub": "date_sub(o_orderdate, 7)",
    "date_diff": "datediff(date_add(o_orderdate, 3), o_orderdate)",
    "year": "year(o_orderdate)",
    "month": "month(o_orderdate)",
    "day": "day(o_orderdate)",
    # date/time parts (r9 part 2)
    "hour": "hour(CAST(o_orderdate AS TIMESTAMP))",
    "minute": "minute(CAST(o_orderdate AS TIMESTAMP))",
    "second": "second(CAST(o_orderdate AS TIMESTAMP))",
    "day_of_week": "dayofweek(o_orderdate)",
    "day_of_year": "dayofyear(o_orderdate)",
    "quarter": "quarter(o_orderdate)",
    "week_of_year": "weekofyear(o_orderdate)",
    "last_day": "last_day(o_orderdate)",
    "add_months": "add_months(o_orderdate, 2)",
    "trunc_date": "trunc(o_orderdate, 'MM')",
    "date_trunc": "date_trunc('month', o_orderdate)",
    "months_between": "months_between(o_orderdate, date_add(o_orderdate, 45))",
    "date_format": "date_format(o_orderdate, 'yyyy-MM')",
    "get_json_object": 'get_json_object(concat(\'{"k":\', '
                       "CAST(o_orderkey AS STRING), '}'), '$.k')",
    # math
    "abs": "abs(o_totalprice - 100000)",
    "floor": "floor(o_totalprice)",
    "ceil": "ceil(o_totalprice)",
    "sqrt": "round(sqrt(o_totalprice), 4)",
    "round": "round(o_totalprice, 1)",
    # math battery (r9): both directions run the SAME JVM builders, so
    # values compare bit-identical without rounding
    "exp": "exp(o_totalprice / 1e6)",
    "ln": "ln(o_totalprice)",
    "log10": "log10(o_totalprice)",
    "log2": "log2(o_totalprice)",
    "sin": "sin(o_totalprice)",
    "cos": "cos(o_totalprice)",
    "tan": "tan(o_totalprice)",
    "asin": "asin(o_totalprice / 1e9)",
    "acos": "acos(o_totalprice / 1e9)",
    "atan": "atan(o_totalprice)",
    "sinh": "sinh(o_totalprice / 1e6)",
    "cosh": "cosh(o_totalprice / 1e6)",
    "tanh": "tanh(o_totalprice / 1e6)",
    "sign": "sign(o_totalprice - 100000)",
    "degrees": "degrees(o_totalprice / 1e6)",
    "radians": "radians(o_totalprice)",
    "power": "power(o_totalprice, 0.5)",
    "atan2": "atan2(o_totalprice, o_orderkey)",
    # r11 produce-sweep additions
    "cbrt": "cbrt(o_totalprice)",
    "expm1": "expm1(o_custkey % 3)",
    "log1p": "log1p(o_totalprice)",
    "rint": "rint(o_totalprice)",
    "hypot": "hypot(o_totalprice, 2.0)",
    "bround": "bround(o_totalprice, 1)",
    "from_unixtime": "from_unixtime(o_orderkey)",
    "format_string": "format_string('%s-%d', o_orderstatus, o_orderkey)",
    "str_to_map": "str_to_map(o_orderpriority, '-', ':')",
    "regexp_instr": "regexp_instr(o_orderpriority, '[A-Z]+')",
    # r11 sweep batch 2
    "timestamp_seconds": "timestamp_seconds(o_orderkey)",
    "timestamp_micros": "timestamp_micros(o_orderkey)",
    "unix_date": "unix_date(CAST(o_orderdate AS DATE))",
    "date_from_unix_date": "date_from_unix_date(CAST(o_orderkey % 9999 AS INT))",
    "unix_micros": "unix_micros(timestamp_micros(o_orderkey))",
    "monthname": "monthname(o_orderdate)",
    "dayname": "dayname(o_orderdate)",
    "to_unix_timestamp": "to_unix_timestamp(o_orderdate)",
    "find_in_set": "find_in_set(o_orderstatus, 'F,O,P')",
    "mask": "mask(o_orderpriority)",
    # strings
    "lower": "lower(o_orderpriority)",
    "upper": "upper(o_orderpriority)",
    "char_length": "length(o_orderpriority)",
    "md5": "md5(o_orderstatus)",
    "trim": "trim(o_orderpriority)",
    "ltrim": "ltrim(o_orderpriority)",
    "rtrim": "rtrim(o_orderpriority)",
    "initcap": "initcap(o_orderpriority)",
    "str_concat": "concat(o_orderstatus, o_orderpriority)",
    "substring": "substring(o_orderpriority, 1, 3)",
    "replace": "replace(o_orderpriority, '-', '_')",
    "concat_ws": "concat_ws(':', o_orderstatus, o_orderpriority)",
    # string/encoding/hash battery (r9 part 2)
    "lpad": "lpad(o_orderpriority, 12, '*')",
    "rpad": "rpad(o_orderpriority, 12, '*')",
    "repeat": "repeat(o_orderstatus, 3)",
    "reverse": "reverse(o_orderpriority)",
    "ascii": "ascii(o_orderstatus)",
    "chr": "char(o_orderkey % 26 + 65)",
    "instr": "instr(o_orderpriority, '-')",
    "translate": "translate(o_orderpriority, '-', '_')",
    "substring_index": "substring_index(o_orderpriority, '-', 1)",
    "levenshtein": "levenshtein(o_orderstatus, o_orderpriority)",
    "factorial": "factorial(CAST(o_orderkey % 10 AS INT))",
    "hex": "hex(o_orderkey)",
    "unhex": "unhex(hex(o_orderkey))",
    "bin": "bin(o_orderkey)",
    "conv": "conv(CAST(o_orderkey AS STRING), 10, 16)",
    "crc32": "crc32(CAST(o_orderstatus AS BINARY))",
    "sha1": "sha1(CAST(o_orderstatus AS BINARY))",
    "sha2": "sha2(CAST(o_orderstatus AS BINARY), 256)",
    "coalesce": "coalesce(nullif(o_orderstatus, 'F'), 'FB')",
    "greatest": "greatest(o_orderkey, o_custkey, 5)",
    "least": "least(o_orderkey, o_custkey, 5)",
    # arrays (via split)
    "regexp_split": "split(o_orderpriority, '-')",
    # literal-delimiter split + the guarded-CASE default encoding (r11):
    # split_part desugars to ElementAt(StringSplitSQL(..), n, '')
    "string_split": "split_part(o_orderpriority, '-', 2)",
    # 0-based lenient indexing (get() = GetArrayItem failOnError=false);
    # the ANSI arr[i] strict form produces as element_at(arr, i+1) instead
    # (pinned in test_interchange_edges), so only get() rides array_get
    "array_get": "get(split(o_orderpriority, '-'), 1)",
    "array_contains": "array_contains(split(o_orderpriority, '-'), 'LOW')",
    "size": "size(split(o_orderpriority, '-'))",
    # the CASE barrier keeps SimplifyExtractValueOps from folding the
    # access into a CASE over the CreateMap; NULL-on-missing semantics
    # pinned by the 'zzz' probe
    "map_get": "(CASE WHEN o_orderkey > 0 THEN map(o_orderstatus, o_orderkey) "
               "END)['zzz']",
    "sort_array": "sort_array(split(o_orderpriority, '-'))",
    "array_join": "array_join(split(o_orderpriority, '-'), '+')",
    # complex-type constructors (r8): field/key NAMES ride as interleaved
    # literal args, so they survive the roundtrip (schema-equal, pinned
    # in test_interchange_edges)
    "named_struct": "struct(o_orderstatus AS s, o_totalprice AS p)",
    "map": "map('k', o_totalprice, 'j', o_totalprice * 2)",
    # r9 part 3 (expression-gap sweep)
    "element_at": "element_at(split(o_orderpriority, '-'), 1)",
    # failOnError=false rides the try_ name (NULL on OOB, value-checked
    # by the out-of-range index)
    "try_element_at": "try_element_at(split(o_orderpriority, '-'), 9)",
    "format_number": "format_number(o_totalprice, 2)",
    "unix_timestamp": "unix_timestamp(CAST(o_orderdate AS TIMESTAMP))",
    "octet_length": "octet_length(o_orderpriority)",
    "bit_length": "bit_length(o_orderstatus)",
    "array_distinct": "array_distinct(split(o_orderpriority, '-'))",
    "array_max": "array_max(split(o_orderpriority, '-'))",
    "array_min": "array_min(split(o_orderpriority, '-'))",
    "bit_count": "bit_count(o_orderkey)",
    "is_nan": "isnan(acos(o_totalprice + 2))",
    "soundex": "soundex(o_orderpriority)",
    "regexp_extract": "regexp_extract(o_orderpriority, '([A-Z]+)', 1)",
    # regexp_count desugars to size(regexp_extract_all(...)) — two names
    "regexp_extract_all": "regexp_count(o_orderpriority, '[A-Z]')",
    "regexp_replace": "regexp_replace(o_orderpriority, '[aeiou]', '*')",
    "locate": "position('-' IN o_orderpriority)",
    "slice": "slice(split(o_orderpriority, '-'), 1, 1)",
    "overlay": "overlay(o_orderpriority PLACING 'ZZ' FROM 2)",
    "width_bucket": "width_bucket(o_totalprice, 0, 500000, 10)",
    # TRY-mode arithmetic: evalMode rides as the try_* names; the
    # overflow/zero rows make the NULL-on-error semantics value-checked
    "try_add": "try_add(o_orderkey, 9223372036854775807)",
    "try_subtract": "try_subtract(o_orderkey, -9223372036854775808)",
    "try_multiply": "try_multiply(o_orderkey, 9223372036854775807)",
    "try_divide": "try_divide(o_totalprice, o_custkey - o_custkey)",
    "try_mod": "try_mod(o_orderkey, o_custkey - o_custkey)",
    # SQL hash functions (seed pinned to 42 by the producer fence)
    "murmur3_hash": "hash(o_orderstatus, o_orderkey)",
    "xxhash64": "xxhash64(o_orderstatus)",
    # collection battery (r9 part 4); map_keys/map_values need the CASE
    # barrier or SimplifyExtractValueOps folds them over the CreateMap
    "map_keys": "map_keys(CASE WHEN o_orderkey > 0 THEN "
                "map(o_orderstatus, o_orderkey) END)",
    "map_values": "map_values(CASE WHEN o_orderkey > 0 THEN "
                  "map(o_orderstatus, o_orderkey) END)",
    "flatten": "flatten(array(split(o_orderpriority, '-'), "
               "split(o_orderstatus, '-')))",
    "array_position": "array_position(split(o_orderpriority, '-'), 'LOW')",
    "array_remove": "array_remove(split(o_orderpriority, '-'), 'LOW')",
    "arrays_overlap": "arrays_overlap(split(o_orderpriority, '-'), "
                      "split(o_orderstatus, '-'))",
    "array_union": "array_union(split(o_orderpriority, '-'), "
                   "split(o_orderstatus, '-'))",
    "array_intersect": "array_intersect(split(o_orderpriority, '-'), "
                       "split(o_orderstatus, '-'))",
    "array_except": "array_except(split(o_orderpriority, '-'), "
                    "split(o_orderstatus, '-'))",
    "array_repeat": "array_repeat(o_orderstatus, 2)",
    "sequence": "sequence(1, CAST(o_orderkey % 5 + 1 AS INT))",
    # higher-order functions (r10): lambdas ride the lambda(n, body) /
    # lambda_var(depth, index) extension encoding; deeper shapes (nesting,
    # outer-column capture, index-aware transform) are pinned in
    # tests/test_hof.py
    "transform": "transform(split(o_orderpriority, '-'), x -> upper(x))",
    "filter": "filter(split(o_orderpriority, '-'), x -> length(x) > 2)",
    "exists": "exists(split(o_orderpriority, '-'), x -> x = 'LOW')",
    "forall": "forall(split(o_orderpriority, '-'), x -> length(x) > 0)",
    "aggregate": "aggregate(sequence(1, CAST(o_orderkey % 5 + 1 AS INT)), "
                 "0, (acc, v) -> acc + v)",
    "zip_with": "zip_with(split(o_orderpriority, '-'), "
                "split(o_orderpriority, '-'), (a, b) -> concat(a, b))",
    "map_filter": "map_filter(map('a', o_orderkey, 'b', o_custkey), "
                  "(k, v) -> v > 100)",
    "transform_keys": "transform_keys(map('a', o_orderkey), "
                      "(k, v) -> upper(k))",
    "transform_values": "transform_values(map('a', o_orderkey), "
                        "(k, v) -> v * 2)",
    "map_zip_with": "map_zip_with(map('a', o_orderkey), map('a', o_custkey), "
                    "(k, v1, v2) -> coalesce(v1, 0) + coalesce(v2, 0))",
    "array_sort": "array_sort(split(o_orderpriority, '-'), (l, r) -> "
                  "CASE WHEN l < r THEN -1 WHEN l > r THEN 1 ELSE 0 END)",
}


def test_every_produce_table_name_has_a_snippet():
    produced_names = (
        set(ops.CATALYST_BINARY_TO_NAME.values())
        | set(ops.CATALYST_NOT_TO_NAME.values())
        | set(ops.CATALYST_UNARY_TO_NAME.values())
        | set(ops.CATALYST_NARY_TO_NAME.values())
        | set(ops.CATALYST_HOF_TO_NAME.values())
        # literal-"(?i)" RLike patterns produce the imatch pair
        | {"regex_imatch", "regex_not_imatch"}
    )
    missing = produced_names - set(SNIPPETS)
    assert not missing, (
        f"produce-table names with no battery snippet: {sorted(missing)} — "
        "add one so the function's roundtrip stays pinned"
    )


_BATCH = 12


@pytest.mark.parametrize("start", range(0, len(SNIPPETS), _BATCH))
def test_function_battery_roundtrips(spark, start):
    items = sorted(SNIPPETS.items())[start:start + _BATCH]
    select = ", ".join(f"({expr}) AS c{i}" for i, (_, expr) in enumerate(items))
    sql = f"SELECT o_orderkey, {select} FROM orders WHERE o_orderkey % 5 = 0"
    df = spark.sql(sql)
    plan = to_substrait_plan(df)
    registered = {d["extensionFunction"]["name"]
                  for d in plan.get("extensions", [])}
    for name, _ in items:
        assert name in registered, (
            f"{name!r} not in the produced plan's extension registry — "
            "Catalyst rewrote the snippet or the table entry is dead"
        )
    assert_same_result(df, roundtrip(df))
