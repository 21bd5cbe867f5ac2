"""Scalar + aggregate function tables, both translation directions.

The scalar core is the reference's 26 binary operators
(``operator_to_name`` producer.rs:288-318 ⇄ ``name_to_op`` consumer.rs:37-71)
— we use the Substrait-spec spelling ``subtract`` on BOTH sides rather than
replicating the reference's roundtrip-breaking ``"substract"`` typo
(producer.rs:297 vs consumer.rs:46; SURVEY.md §2.3).

Extensions beyond the reference (needed for real Catalyst optimized plans,
which inject null guards / coercions the reference never sees):
``not``, ``is_null``, ``is_not_null`` (unary), n-ary ``str_concat``,
``coalesce``, ``abs``, ``negate``.

Aggregates: the reference hardcodes no list — any name DataFusion 15's
``AggregateFunction::from_str`` resolves is accepted (consumer.rs:401-407).
We implement that effective set per the SURVEY.md §2.4 table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from datafusion_substrait_spark.plans.proto import SubstraitError

# ---------------------------------------------------------------------------
# produce direction: Catalyst expression class simpleName → substrait name
# (≡ operator_to_name, producer.rs:288-318)
# ---------------------------------------------------------------------------

CATALYST_BINARY_TO_NAME: dict[str, str] = {
    "EqualTo": "equal",
    "LessThan": "lt",
    "LessThanOrEqual": "lte",
    "GreaterThan": "gt",
    "GreaterThanOrEqual": "gte",
    "Add": "add",
    "Subtract": "subtract",
    "Multiply": "multiply",
    "Divide": "divide",
    "IntegralDivide": "div",  # integer division, trunc-toward-zero semantics
    "Remainder": "mod",
    # NO Pmod entry: pmod(a, b) != a % b for negative operands, so mapping
    # it to "mod" would silently change results — it falls to the
    # catch-all unsupported-expression error instead
    "And": "and",
    "Or": "or",
    "Like": "like",
    "RLike": "regex_match",
    # Catalyst optimizes LIKE 'A%' / '%A' / '%A%' into these
    "StartsWith": "starts_with",
    "EndsWith": "ends_with",
    "Contains": "contains",
    "EqualNullSafe": "is_not_distinct_from",
    "BitwiseAnd": "bitwise_and",
    "BitwiseOr": "bitwise_or",
    "BitwiseXor": "bitwise_xor",
    "ShiftLeft": "bitwise_shift_left",
    "ShiftRight": "bitwise_shift_right",
    "DateAdd": "date_add",
    "DateSub": "date_sub",
    "DateDiff": "date_diff",  # (end, start) argument order on both sides
    "Pow": "power",
    "Atan2": "atan2",
    # r11 produce-sweep additions
    "Hypot": "hypot",
    "BRound": "bround",            # half-even rounding (scale rides as arg)
    # (sec, format); like unix_timestamp, the timeZoneId node field rides
    # the SESSION zone (UTC-pinned), not the plan
    "FromUnixTime": "from_unixtime",
    "ToUnixTimestamp": "to_unix_timestamp",  # same session-zone convention
    "FindInSet": "find_in_set",
    # date/time + string/hash battery (r9, part 2)
    "AddMonths": "add_months",
    "TruncDate": "trunc_date",      # (date, format-literal)
    # (format, timestamp) — Catalyst's TruncTimestamp arg order matches
    # SQL date_trunc(fmt, ts); like UnixTimestamp, the timeZoneId node
    # field rides the SESSION zone (UTC-pinned by register_testdata),
    # not the plan (r11, surfaced by the differential date tier)
    "TruncTimestamp": "date_trunc",
    "StringRepeat": "repeat",
    "StringInstr": "instr",         # (str, substr) → 1-based position
    "Levenshtein": "levenshtein",   # 2-arg form (threshold form is 3-child
                                    # and fails arity cleanly)
    "Sha2": "sha2",                 # (binary, numBits-literal)
    # 0-based array indexing. Consumed as F.get (NULL on out-of-bounds),
    # so only the LENIENT form (failOnError=false, i.e. get()) produces
    # this name; the strict ANSI arr[i] form is rewritten by the producer
    # to strict element_at(arr, i+1) when the ordinal is a non-negative
    # literal (value-identical incl. throw-on-OOB) and fenced otherwise
    # — see producer._binary (r10, ADVICE).
    "GetArrayItem": "array_get",
    # m[k]: NULL on missing key in BOTH ANSI modes (SPARK-40066), which
    # try_element_at reproduces exactly on consume
    "GetMapValue": "map_get",
    "ArrayContains": "array_contains",
    "ArrayPosition": "array_position",
    "ArrayRemove": "array_remove",
    "ArraysOverlap": "arrays_overlap",
    "ArrayUnion": "array_union",
    "ArrayIntersect": "array_intersect",
    "ArrayExcept": "array_except",
    "ArrayRepeat": "array_repeat",
    # raw-crawl JSON extraction + timestamp formatting (2-child forms;
    # DateFormatClass' optional timezone rides session state, not a child)
    "GetJsonObject": "get_json_object",
    "DateFormatClass": "date_format",
    # r9 part 3 (found by the expression-gap sweep)
    # Substrait functions_string.yaml string_split: LITERAL-delimiter
    # split (split_part's array source). Produce fences a non-literal /
    # empty delimiter; consume rebuilds via regex split over the
    # \Q..\E-quoted delimiter (r11)
    "StringSplitSQL": "string_split",
    "ElementAt": "element_at",    # 1-based arrays / map keys; the
                                  # split_part default-value form encodes
                                  # as a guarded CASE (producer, r11)
    "FormatNumber": "format_number",
    # epoch seconds; like timestamp literals, tz-sensitive parsing rides
    # the SESSION zone (UTC-pinned by register_testdata), not the plan
    "UnixTimestamp": "unix_timestamp",
}

# Not(inner-class) → negated substrait name (producer's NotEq/NotLike/… forms)
CATALYST_NOT_TO_NAME: dict[str, str] = {
    "EqualTo": "not_equal",
    "Like": "not_like",
    "RLike": "regex_not_match",
    "EqualNullSafe": "is_distinct_from",
}

CATALYST_UNARY_TO_NAME: dict[str, str] = {
    "Not": "not",
    "IsNull": "is_null",
    "IsNotNull": "is_not_null",
    "UnaryMinus": "negate",
    "Abs": "abs",
    "Floor": "floor",
    "Ceil": "ceil",
    "Sqrt": "sqrt",
    "Lower": "lower",
    "Upper": "upper",
    "Length": "char_length",
    "Year": "year",
    "Month": "month",
    "DayOfMonth": "day",
    "Md5": "md5",
    # trimStr is an Option-child: these classes are unary in the common
    # no-trim-string form; the 2-child form fails arity and errors cleanly
    "StringTrim": "trim",
    "StringTrimLeft": "ltrim",
    "StringTrimRight": "rtrim",
    "InitCap": "initcap",
    "BitwiseNot": "bitwise_not",
    # size(array|map); ANSI-era semantics (size(NULL) = NULL) on both sides
    "Size": "size",
    # math battery (r9): substrait-spec spellings; consumed by the
    # same-named Spark builders, so values are bit-identical both ways
    "Exp": "exp",
    "Log": "ln",
    # r11 produce-sweep additions (math unaries every SQL dialect has)
    "Cbrt": "cbrt",
    "Expm1": "expm1",
    "Log1p": "log1p",
    "Rint": "rint",
    # r11 sweep batch 2: epoch/date conversions (pure integer math — no
    # session-zone sensitivity except where noted on the binary table)
    "SecondsToTimestamp": "timestamp_seconds",
    "MicrosToTimestamp": "timestamp_micros",
    "UnixDate": "unix_date",
    "DateFromUnixDate": "date_from_unix_date",
    "UnixMicros": "unix_micros",
    "MonthName": "monthname",
    "DayName": "dayname",
    "Log10": "log10",
    "Log2": "log2",
    "Sin": "sin",
    "Cos": "cos",
    "Tan": "tan",
    "Asin": "asin",
    "Acos": "acos",
    "Atan": "atan",
    "Sinh": "sinh",
    "Cosh": "cosh",
    "Tanh": "tanh",
    "Signum": "sign",
    "ToDegrees": "degrees",
    "ToRadians": "radians",
    # date/time parts
    "Hour": "hour",
    "Minute": "minute",
    "Second": "second",
    "DayOfWeek": "day_of_week",
    "DayOfYear": "day_of_year",
    "Quarter": "quarter",
    "WeekOfYear": "week_of_year",
    "LastDay": "last_day",
    # string / numeric encodings + hashes
    "Reverse": "reverse",           # strings AND arrays, both sides
    "Ascii": "ascii",
    "Chr": "chr",
    "Factorial": "factorial",
    "Hex": "hex",
    "Unhex": "unhex",
    "Bin": "bin",
    "Crc32": "crc32",
    "Sha1": "sha1",
    # r9 part 3
    "OctetLength": "octet_length",
    # collection battery (r9 part 4)
    "MapKeys": "map_keys",
    "MapValues": "map_values",
    "Flatten": "flatten",
    # NO ArrayCompact: the optimizer rewrites it to ArrayFilter with an
    # isnotnull LAMBDA pre-produce — which now rides the lambda encoding
    # (CATALYST_HOF_TO_NAME below), un-fencing array_compact (r10)
    "BitLength": "bit_length",
    "ArrayDistinct": "array_distinct",
    "ArrayMax": "array_max",
    "ArrayMin": "array_min",
    "BitwiseCount": "bit_count",
    "IsNaN": "is_nan",
    "SoundEx": "soundex",
}

CATALYST_NARY_TO_NAME: dict[str, str] = {
    "Concat": "str_concat",
    "Coalesce": "coalesce",
    "Substring": "substring",
    "Round": "round",
    "Greatest": "greatest",
    "Least": "least",
    "ConcatWs": "concat_ws",  # separator literal special-cased on consume
    "StringReplace": "replace",
    "StringSplit": "regexp_split",  # (str, pattern, limit) — Spark's split()
    "SortArray": "sort_array",      # (array, asc) — asc rides as a literal
    "ArrayJoin": "array_join",      # (array, delimiter)
    # complex-type constructors (r8): Catalyst's children are already the
    # interleaved (name/key literal, value, …) the Spark builders take, so
    # user STRUCT FIELD NAMES survive the roundtrip as literal arguments —
    # the core Expression.Nested.Struct is positional and would drop them
    "CreateNamedStruct": "named_struct",
    "CreateMap": "map",
    # r11 produce-sweep additions (variadic / 3-child forms)
    "FormatString": "format_string",
    "StringToMap": "str_to_map",
    "RegExpInStr": "regexp_instr",
    "Mask": "mask",  # (str, upper, lower, digit, other) — defaults ride
                     # as the literal children Catalyst materializes
    # r9 part 2: 3-child string/date forms
    "StringLPad": "lpad",
    "StringRPad": "rpad",
    "StringTranslate": "translate",
    "SubstringIndex": "substring_index",
    "Sequence": "sequence",            # (start, stop[, step])
    "Conv": "conv",                    # (num-string, from-base, to-base)
    "MonthsBetween": "months_between",  # (d1, d2, roundOff-literal)
    # r9 part 3: regex family (Java regex both directions — the produce
    # side is the same engine, so patterns need no dialect mapping),
    # locate/slice/overlay/width_bucket positional forms
    "RegExpExtract": "regexp_extract",
    "RegExpExtractAll": "regexp_extract_all",
    "RegExpReplace": "regexp_replace",   # (str, pattern, rep, pos)
    "StringLocate": "locate",            # (substr, str, start)
    "Slice": "slice",                    # (array, 1-based start, length)
    "Overlay": "overlay",                # (str, replace, pos, len)
    "WidthBucket": "width_bucket",
}

# ---------------------------------------------------------------------------
# higher-order functions (r10): Catalyst class → extension scalar name.
# A Catalyst LambdaFunction child rides as the extension call
# ``lambda(n_params: i32, body)``; a NamedLambdaVariable in the body rides
# as ``lambda_var(depth: i32, index: i32)`` — de-Bruijn-style (depth 0 =
# innermost enclosing lambda), so NESTED lambdas roundtrip without carrying
# Catalyst exprIds across the plan boundary. Both helper names are plain
# extension scalar functions, so the binary wire codec handles them for
# free. The reference has no lambda surface (catch-all, consumer.rs:69);
# this closes the r9 verdict's top capability gap.
# ---------------------------------------------------------------------------

CATALYST_HOF_TO_NAME: dict[str, str] = {
    "ArrayTransform": "transform",
    "ArrayFilter": "filter",           # also array_compact's optimized form
    "ArrayExists": "exists",           # followThreeValuedLogic fence (producer)
    "ArrayForAll": "forall",
    "ArrayAggregate": "aggregate",     # SQL aggregate() AND reduce()
    "ZipWith": "zip_with",
    "MapFilter": "map_filter",
    "TransformKeys": "transform_keys",
    "TransformValues": "transform_values",
    "MapZipWith": "map_zip_with",
    "ArraySort": "array_sort",         # comparator lambda (default or custom)
}

# lambda argument shape per HOF: {arg position: allowed n_params}. The
# consumer validates against this BEFORE building, so a corrupted plan
# (lambda at a data position, or an arity the builder would only reject
# later as a JVM AnalysisException) fails as a clean SubstraitError.
HOF_LAMBDA_SHAPE: dict[str, dict[int, set[int]]] = {
    "transform": {1: {1, 2}},        # (x) or (x, i)
    "filter": {1: {1, 2}},
    "exists": {1: {1}},
    "forall": {1: {1}},
    "aggregate": {2: {2}, 3: {1}},   # merge(acc, x), finish(acc)
    "zip_with": {2: {2}},
    "map_filter": {1: {2}},          # (k, v)
    "transform_keys": {1: {2}},
    "transform_values": {1: {2}},
    "map_zip_with": {2: {3}},        # (k, v1, v2)
    "array_sort": {1: {2}},          # comparator(l, r)
}

# consume: positional (Columns and rebuilt python lambdas, in child order)
HOF_CONSUME: dict[str, Callable[..., Column]] = {
    "transform": F.transform,
    "filter": F.filter,
    "exists": F.exists,
    "forall": F.forall,
    "aggregate": F.aggregate,
    "zip_with": F.zip_with,
    "map_filter": F.map_filter,
    "transform_keys": F.transform_keys,
    "transform_values": F.transform_values,
    "map_zip_with": F.map_zip_with,
    "array_sort": F.array_sort,
}

# ---------------------------------------------------------------------------
# consume direction: substrait name → Column builder (≡ consumer.rs:37-71)
# ---------------------------------------------------------------------------


def _integral_divide(a: Column, b: Column) -> Column:
    """``a div b`` with trunc-toward-zero semantics, exact over full-range
    int64: subtracting the truncated remainder first (`%` keeps the
    dividend's sign, exact on decimals) makes the decimal quotient
    mathematically integral, so the division's scale-6 HALF_UP rounding can
    never move it. (The previous floor/ceil of the ROUNDED raw quotient was
    off by one whenever a/b landed within 5e-7 of an integer, e.g.
    1999999 div 2000000 → 1 instead of 0.) Double division is no
    alternative — it loses low bits past 2^53."""
    al, bl = a.cast("decimal(38,0)"), b.cast("decimal(38,0)")
    return ((al - al % bl) / bl).cast("bigint")


SCALAR_CONSUME: dict[str, Callable[..., Column]] = {
    "equal": lambda a, b: a == b,
    "not_equal": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
    "add": lambda a, b: a + b,
    "subtract": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "divide": lambda a, b: a / b,
    "mod": lambda a, b: a % b,
    "div": _integral_divide,
    "and": lambda a, b: a & b,
    "or": lambda a, b: a | b,
    "like": lambda a, b: F.like(a, b),
    "starts_with": lambda a, b: F.startswith(a, b),
    "ends_with": lambda a, b: F.endswith(a, b),
    "contains": lambda a, b: F.contains(a, b),
    "not_like": lambda a, b: ~F.like(a, b),
    "regex_match": lambda a, b: F.rlike(a, b),
    "regex_imatch": lambda a, b: F.rlike(a, F.concat(F.lit("(?i)"), b)),
    "regex_not_match": lambda a, b: ~F.rlike(a, b),
    "regex_not_imatch": lambda a, b: ~F.rlike(a, F.concat(F.lit("(?i)"), b)),
    "is_distinct_from": lambda a, b: ~a.eqNullSafe(b),
    "is_not_distinct_from": lambda a, b: a.eqNullSafe(b),
    "bitwise_and": lambda a, b: a.bitwiseAND(b),
    "bitwise_or": lambda a, b: a.bitwiseOR(b),
    "bitwise_xor": lambda a, b: a.bitwiseXOR(b),
    # call_function, not F.shiftleft/right: the python wrappers demand a
    # plain-int bit count, but consumed plans pass it as a Column (e.g. the
    # grouping() bit-extraction over a reconstructed grouping_id)
    "bitwise_shift_left": lambda a, b: F.call_function("shiftleft", a, b),
    "bitwise_shift_right": lambda a, b: F.call_function("shiftright", a, b),
    "str_concat": lambda *args: F.concat(*args),
    "coalesce": lambda *args: F.coalesce(*args),
    "not": lambda a: ~a,
    "is_null": lambda a: a.isNull(),
    "is_not_null": lambda a: a.isNotNull(),
    "negate": lambda a: -a,
    "abs": lambda a: F.abs(a),
    "floor": lambda a: F.floor(a),
    "ceil": lambda a: F.ceil(a),
    "sqrt": lambda a: F.sqrt(a),
    "lower": lambda a: F.lower(a),
    "upper": lambda a: F.upper(a),
    "char_length": lambda a: F.length(a),
    "year": lambda a: F.year(a),
    "month": lambda a: F.month(a),
    "day": lambda a: F.dayofmonth(a),
    "md5": lambda a: F.md5(a),
    "substring": lambda a, b, c: a.substr(b, c),
    "greatest": lambda *args: F.greatest(*args),
    "least": lambda *args: F.least(*args),
    "trim": lambda a: F.trim(a),
    "ltrim": lambda a: F.ltrim(a),
    "rtrim": lambda a: F.rtrim(a),
    "initcap": lambda a: F.initcap(a),
    "bitwise_not": lambda a: F.bitwise_not(a),
    "date_add": lambda a, b: F.date_add(a, b),
    "date_sub": lambda a, b: F.date_sub(a, b),
    "date_diff": lambda a, b: F.datediff(a, b),
    "array_get": lambda a, b: F.get(a, b),  # 0-based, NULL on OOB
    "map_get": lambda a, b: F.try_element_at(a, b),  # NULL on missing key
    "array_contains": lambda a, b: F.array_contains(a, b),
    "size": lambda a: F.size(a),
    "exp": lambda a: F.exp(a),
    "ln": lambda a: F.log(a),
    "log10": lambda a: F.log10(a),
    "log2": lambda a: F.log2(a),
    "sin": lambda a: F.sin(a),
    "cos": lambda a: F.cos(a),
    "tan": lambda a: F.tan(a),
    "asin": lambda a: F.asin(a),
    "acos": lambda a: F.acos(a),
    "atan": lambda a: F.atan(a),
    "sinh": lambda a: F.sinh(a),
    "cosh": lambda a: F.cosh(a),
    "tanh": lambda a: F.tanh(a),
    "sign": lambda a: F.signum(a),
    "degrees": lambda a: F.degrees(a),
    "radians": lambda a: F.radians(a),
    "power": lambda a, b: F.pow(a, b),
    "atan2": lambda a, b: F.atan2(a, b),
    "hour": lambda a: F.hour(a),
    "minute": lambda a: F.minute(a),
    "second": lambda a: F.second(a),
    "day_of_week": lambda a: F.dayofweek(a),
    "day_of_year": lambda a: F.dayofyear(a),
    "quarter": lambda a: F.quarter(a),
    "week_of_year": lambda a: F.weekofyear(a),
    "last_day": lambda a: F.last_day(a),
    "add_months": lambda a, b: F.call_function("add_months", a, b),
    # call_function for the rest: the python wrappers demand plain
    # int/str operands (format strings, pad chars, bases, numBits), but
    # consumed plans carry them as literal Columns — JVM-side SQL name
    # resolution binds either
    "trunc_date": lambda a, b: F.call_function("trunc", a, b),
    "date_trunc": lambda a, b: F.call_function("date_trunc", a, b),
    # r11 produce-sweep additions
    "cbrt": lambda a: F.cbrt(a),
    "expm1": lambda a: F.expm1(a),
    "log1p": lambda a: F.log1p(a),
    "rint": lambda a: F.call_function("rint", a),
    "hypot": lambda a, b: F.hypot(a, b),
    "bround": lambda a, b: F.call_function("bround", a, b),
    "from_unixtime": lambda a, b: F.call_function("from_unixtime", a, b),
    "format_string": lambda *a: F.call_function("format_string", *a),
    "str_to_map": lambda *a: F.call_function("str_to_map", *a),
    "regexp_instr": lambda *a: F.call_function("regexp_instr", *a),
    "timestamp_seconds": lambda a: F.timestamp_seconds(a),
    "timestamp_micros": lambda a: F.call_function("timestamp_micros", a),
    "unix_date": lambda a: F.call_function("unix_date", a),
    "date_from_unix_date": lambda a: F.call_function("date_from_unix_date", a),
    "unix_micros": lambda a: F.call_function("unix_micros", a),
    "monthname": lambda a: F.call_function("monthname", a),
    "dayname": lambda a: F.call_function("dayname", a),
    "to_unix_timestamp": lambda a, b: F.call_function("to_unix_timestamp",
                                                      a, b),
    "find_in_set": lambda a, b: F.call_function("find_in_set", a, b),
    "mask": lambda *a: F.call_function("mask", *a),
    "get_json_object": lambda a, b: F.call_function("get_json_object", a, b),
    "date_format": lambda a, b: F.call_function("date_format", a, b),
    "element_at": lambda a, b: F.call_function("element_at", a, b),
    "try_element_at": lambda a, b: F.try_element_at(a, b),
    "format_number": lambda a, b: F.call_function("format_number", a, b),
    "unix_timestamp": lambda a, b: F.call_function("unix_timestamp", a, b),
    "octet_length": lambda a: F.octet_length(a),
    "bit_length": lambda a: F.bit_length(a),
    "array_distinct": lambda a: F.array_distinct(a),
    "array_max": lambda a: F.array_max(a),
    "array_min": lambda a: F.array_min(a),
    "bit_count": lambda a: F.bit_count(a),
    "is_nan": lambda a: F.isnan(a),
    "soundex": lambda a: F.soundex(a),
    "regexp_extract": lambda a, b, c: F.call_function("regexp_extract", a, b, c),
    "regexp_extract_all": lambda a, b, c:
        F.call_function("regexp_extract_all", a, b, c),
    "regexp_replace": lambda a, b, c, d:
        F.call_function("regexp_replace", a, b, c, d),
    "locate": lambda a, b, c: F.call_function("locate", a, b, c),
    "slice": lambda a, b, c: F.call_function("slice", a, b, c),
    "overlay": lambda a, b, c, d: F.call_function("overlay", a, b, c, d),
    "width_bucket": lambda a, b, c, d:
        F.call_function("width_bucket", a, b, c, d),
    "try_add": lambda a, b: F.try_add(a, b),
    "try_subtract": lambda a, b: F.try_subtract(a, b),
    "try_multiply": lambda a, b: F.try_multiply(a, b),
    "try_divide": lambda a, b: F.try_divide(a, b),
    "try_mod": lambda a, b: F.try_mod(a, b),
    "murmur3_hash": lambda *args: F.hash(*args),
    "xxhash64": lambda *args: F.xxhash64(*args),
    "map_keys": lambda a: F.map_keys(a),
    "map_values": lambda a: F.map_values(a),
    "flatten": lambda a: F.flatten(a),
    "array_position": lambda a, b: F.array_position(a, b),
    "array_remove": lambda a, b: F.array_remove(a, b),
    "arrays_overlap": lambda a, b: F.arrays_overlap(a, b),
    "array_union": lambda a, b: F.array_union(a, b),
    "array_intersect": lambda a, b: F.array_intersect(a, b),
    "array_except": lambda a, b: F.array_except(a, b),
    "array_repeat": lambda a, b: F.array_repeat(a, b),
    "sequence": lambda *args: F.sequence(*args),  # 2- or 3-arg (step)
    "repeat": lambda a, b: F.call_function("repeat", a, b),
    "instr": lambda a, b: F.call_function("instr", a, b),
    "levenshtein": lambda a, b: F.levenshtein(a, b),
    "sha2": lambda a, b: F.call_function("sha2", a, b),
    "reverse": lambda a: F.reverse(a),
    "ascii": lambda a: F.ascii(a),
    "chr": lambda a: F.call_function("chr", a),
    "factorial": lambda a: F.factorial(a),
    "hex": lambda a: F.hex(a),
    "unhex": lambda a: F.unhex(a),
    "bin": lambda a: F.bin(a),
    "crc32": lambda a: F.crc32(a),
    "sha1": lambda a: F.sha1(a),
    "lpad": lambda a, b, c: F.call_function("lpad", a, b, c),
    "rpad": lambda a, b, c: F.call_function("rpad", a, b, c),
    "translate": lambda a, b, c: F.call_function("translate", a, b, c),
    "substring_index": lambda a, b, c: F.call_function("substring_index", a, b, c),
    "conv": lambda a, b, c: F.call_function("conv", a, b, c),
    "months_between": lambda a, b, c: F.call_function("months_between", a, b, c),
    "replace": lambda a, b, c: F.replace(a, b, c),
    # call_function: the F.split/F.sort_array wrappers want pattern/limit/
    # asc as python values, but consumed plans pass everything as Columns
    "regexp_split": lambda a, b, c: F.call_function("split", a, b, c),
    "sort_array": lambda a, b: F.call_function("sort_array", a, b),
    "array_join": lambda a, b: F.call_function("array_join", a, b),
    # round's scale argument is special-cased in the consumer (needs a python
    # int for F.round); this entry covers the scale-0 unary form
    "round": lambda a: F.round(a),
    # complex-type constructors: interleaved (name/key, value, …) varargs
    "named_struct": lambda *args: F.named_struct(*args),
    "map": lambda *args: F.create_map(*args),
}

# Foreign-producer compatibility alias: the reference's PRODUCER emits the
# typo "substract" (producer.rs:297) that even its own consumer rejects
# (name_to_op only knows "subtract", consumer.rs:46) — the documented
# roundtrip-breaking asymmetry. We PRODUCE the spec spelling, but a plan
# produced by the reference must still consume here.
SCALAR_CONSUME["substract"] = SCALAR_CONSUME["subtract"]

# concat_ws is NOT here: the consumer special-cases it (separator must be
# a python str for F.concat_ws) before apply_scalar is ever reached
_VARARG = {"str_concat", "coalesce", "greatest", "least", "named_struct",
           "map", "murmur3_hash", "xxhash64", "sequence",
           "format_string", "str_to_map", "regexp_instr", "mask"}


def apply_scalar(name: str, args: list[Column]) -> Column:
    fn = SCALAR_CONSUME.get(name)
    if fn is None:
        raise SubstraitError(f"unknown scalar function {name!r} (≡ consumer.rs:69)")
    if name not in _VARARG:
        import inspect

        expected = len(inspect.signature(fn).parameters)
        if len(args) != expected:
            raise SubstraitError(
                f"scalar function {name!r} expects {expected} args, got {len(args)} "
                "(reference asserts arity 2, consumer.rs:531; we report instead)"
            )
    return fn(*args)


# ---------------------------------------------------------------------------
# aggregates (SURVEY.md §2.4: DataFusion 15 from_str set)
# ---------------------------------------------------------------------------

# produce: Catalyst AggregateFunction.prettyName() → substrait name
CATALYST_AGG_TO_NAME: dict[str, str] = {
    "count": "count",
    "sum": "sum",
    "avg": "avg",
    "mean": "avg",
    "min": "min",
    "max": "max",
    "median": "median",
    "approx_count_distinct": "approx_distinct",
    "collect_list": "array_agg",
    "var_samp": "var",
    "var_pop": "var_pop",
    "stddev_samp": "stddev",
    "stddev": "stddev_samp",
    "stddev_pop": "stddev_pop",
    "covar_samp": "covar",
    "covar_pop": "covar_pop",
    "corr": "corr",
    "percentile_approx": "approx_percentile_cont",
    "percentile": "percentile",  # Spark desugars median() to percentile(c, 0.5)
    "first": "first_value",
    "last": "last_value",
    # the SQL window spellings: First/Last prettyName is "first_value"/
    # "last_value" unless the FUNC_ALIAS tag says "first"/"last" (how the
    # aggregate-call form presents) — both arrive here
    "first_value": "first_value",
    "last_value": "last_value",
}

# consume: substrait name → (plain builder, distinct builder | None)
AGG_CONSUME: dict[str, Callable[..., Column]] = {
    "count": F.count,
    "sum": F.sum,
    "avg": F.avg,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "median": F.median,
    "approx_distinct": F.approx_count_distinct,
    "array_agg": F.collect_list,
    "var": F.var_samp,
    "variance": F.var_samp,
    "var_pop": F.var_pop,
    "stddev": F.stddev_samp,
    "stddev_samp": F.stddev_samp,
    "stddev_pop": F.stddev_pop,
    "covar": F.covar_samp,
    "covariance": F.covar_samp,
    "covar_pop": F.covar_pop,
    "corr": F.corr,
    "approx_percentile_cont": F.percentile_approx,
    "percentile": F.percentile,
    "approx_median": lambda c: F.percentile_approx(c, 0.5),
    "grouping": F.grouping,
    "first_value": lambda c: F.first(c, ignorenulls=False),
    "last_value": lambda c: F.last(c, ignorenulls=False),
}

# distinct variants with native Spark support; anything else goes through the
# consumer's precompute-then-``F.expr("fn(DISTINCT col)")`` fallback.
AGG_CONSUME_DISTINCT: dict[str, Callable[..., Column]] = {
    "count": F.count_distinct,
    "sum": F.sum_distinct,
    "min": F.min,   # DISTINCT is a no-op for min/max
    "max": F.max,
}
