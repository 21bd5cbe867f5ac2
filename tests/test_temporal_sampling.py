"""As-of join (operators/temporal.py) and deterministic sampling
(operators/sampling.py): planted-truth correctness, direction/tolerance
semantics, shuffle-count plan quality, and cross-run determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_substrait_spark.operators import sampling, temporal
from datafusion_substrait_spark.plans.proto import SubstraitError


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


@pytest.fixture(scope="module")
def planted(spark):
    left = _mk(spark, [
        (1, 10, "l-a"), (1, 20, "l-b"), (1, 5, "l-c"),   # key 1
        (2, 15, "l-d"),                                   # key 2: no match
        (3, 30, "l-e"),                                   # key 3: exact-ts tie
    ], ["k", "ts", "lval"])
    right = _mk(spark, [
        (1, 8, 0.8), (1, 18, 1.8),    # key 1: two versions
        (3, 30, 3.0),                  # key 3: at exactly left ts
        (4, 1, 4.0),                   # key 4: right-only, must not appear
    ], ["k", "ts", "rval"])
    return left, right


def test_asof_backward_planted(planted):
    left, right = planted
    out = temporal.asof_join(left, right, on="k", ts_col="ts",
                             right_cols=["rval"])
    got = {(r.k, r.ts): (r.ts_r, r.rval_r) for r in out.collect()}
    assert got == {
        (1, 10): (8, 0.8),     # nearest at-or-before
        (1, 20): (18, 1.8),
        (1, 5): (None, None),  # left row before any right: kept, nulls
        (2, 15): (None, None),  # key with no right rows: kept, nulls
        (3, 30): (30, 3.0),    # inclusive equal-ts match
    }


def test_asof_forward_planted(planted):
    left, right = planted
    out = temporal.asof_join(left, right, on="k", ts_col="ts",
                             right_cols=["rval"], direction="forward")
    got = {(r.k, r.ts): (r.ts_r, r.rval_r) for r in out.collect()}
    assert got == {
        (1, 10): (18, 1.8),    # nearest at-or-after
        (1, 20): (None, None),
        (1, 5): (8, 0.8),
        (2, 15): (None, None),
        (3, 30): (30, 3.0),    # inclusive both directions
    }


def test_asof_tolerance(planted):
    left, right = planted
    out = temporal.asof_join(left, right, on="k", ts_col="ts",
                             right_cols=["rval"], tolerance=2)
    got = {(r.k, r.ts): (r.ts_r, r.rval_r) for r in out.collect()}
    # (1,10) is 2 past (1,8): inside; (1,20) is 2 past (1,18): inside;
    # tighten to 1 and both fall out but rows stay
    assert got[(1, 10)] == (8, 0.8) and got[(1, 20)] == (18, 1.8)
    tight = temporal.asof_join(left, right, on="k", ts_col="ts",
                               right_cols=["rval"], tolerance=1)
    got = {(r.k, r.ts): (r.ts_r, r.rval_r) for r in tight.collect()}
    assert got[(1, 10)] == (None, None)
    assert got[(3, 30)] == (30, 3.0)  # distance 0 always inside


def test_asof_bad_direction(planted):
    left, right = planted
    with pytest.raises(SubstraitError, match="backward/forward"):
        temporal.asof_join(left, right, on="k", ts_col="ts",
                           direction="sideways")


def test_asof_single_shuffle(planted):
    """The union-window shape must shuffle exactly once (on the key) —
    a range-join rewrite or per-side repartition would show extra
    exchanges and die at scale."""
    left, right = planted
    out = temporal.asof_join(left, right, on="k", ts_col="ts",
                             right_cols=["rval"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_asof_row_count_is_left_count(spark, tables):
    e = tables["events"]
    clicks = e.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts")
    views = (e.filter(F.col("event_type") == "view")
             .groupBy("user_id", "ts").agg(F.max("value").alias("value")))
    out = temporal.asof_join(clicks, views, on="user_id", ts_col="ts",
                             right_cols=["value"])
    assert out.count() == clicks.count()
    # matched ts must never exceed the left ts (backward contract)
    assert out.filter(F.col("ts_r") > F.col("ts")).count() == 0


# -- sampling ----------------------------------------------------------------


def test_hash_sample_deterministic_and_stable(tables):
    docs = tables["documents"]
    a = sampling.hash_sample(docs, "doc_id", 0.3).select("doc_id")
    b = sampling.hash_sample(docs.repartition(7), "doc_id", 0.3).select("doc_id")
    ids_a = {r.doc_id for r in a.collect()}
    ids_b = {r.doc_id for r in b.collect()}
    assert ids_a == ids_b, "sample must not depend on partitioning"
    n = docs.count()
    assert 0.15 * n < len(ids_a) < 0.45 * n  # loose binomial bound


def test_hash_sample_edge_rates(tables):
    docs = tables["documents"]
    assert sampling.hash_sample(docs, "doc_id", 1.0).count() == docs.count()
    assert sampling.hash_sample(docs, "doc_id", 0.0).count() == 0
    with pytest.raises(SubstraitError, match="rate"):
        sampling.hash_sample(docs, "doc_id", 1.5)


def test_hash_sample_salt_varies_draw(tables):
    docs = tables["documents"]
    a = {r.doc_id for r in
         sampling.hash_sample(docs, "doc_id", 0.3, salt="a").collect()}
    b = {r.doc_id for r in
         sampling.hash_sample(docs, "doc_id", 0.3, salt="b").collect()}
    assert a != b, "different salts must draw different samples"


def test_stratified_rates_apply_per_stratum(tables):
    docs = tables["documents"]
    out = sampling.stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 0.0}, default_rate=1.0)
    kept = out.groupBy("lang").count().collect()
    langs = {r.lang: r["count"] for r in kept}
    totals = {r.lang: r["count"]
              for r in docs.groupBy("lang").count().collect()}
    assert "en" not in langs, "rate-0 stratum must vanish"
    for lang, n in totals.items():
        if lang != "en":
            assert langs[lang] == n, "default rate 1.0 keeps everything else"


def test_sample_is_narrow_map(tables):
    """The keep-decision must not shuffle: filter over a scan only."""
    out = sampling.hash_sample(tables["documents"], "doc_id", 0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_asof_null_left_ts_matches_nothing(spark):
    """A NULL-ts left row has no temporal position: it must keep NULL right
    columns in BOTH directions (forward once handed it a phantom smallest-ts
    match because desc ordering puts NULLs last)."""
    left = spark.createDataFrame(
        [(1, None, "l-null"), (1, 10, "l-real")], "k bigint, ts bigint, lval string")
    right = spark.createDataFrame([(1, 8, 0.8)], "k bigint, ts bigint, rval double")
    for direction in ("backward", "forward"):
        out = {r.lval: (r.ts_r, r.rval_r)
               for r in temporal.asof_join(left, right, on="k", ts_col="ts",
                                           right_cols=["rval"],
                                           direction=direction).collect()}
        assert out["l-null"] == (None, None), (direction, out)
    # and the real row still matches where it should
    back = {r.lval: r.ts_r for r in temporal.asof_join(
        left, right, on="k", ts_col="ts", right_cols=["rval"]).collect()}
    assert back["l-real"] == 8


def test_asof_null_keys_do_not_match_each_other(spark):
    """NULL join keys must not pair up (equi-join semantics; DuckDB ASOF
    agrees) even though Window.partitionBy groups NULLs together."""
    left = spark.createDataFrame(
        [(None, 10, "l-nullkey")], "k bigint, ts bigint, lval string")
    right = spark.createDataFrame(
        [(None, 5, 0.5)], "k bigint, ts bigint, rval double")
    out = temporal.asof_join(left, right, on="k", ts_col="ts",
                             right_cols=["rval"]).collect()
    assert len(out) == 1 and out[0].ts_r is None and out[0].rval_r is None


def test_asof_salted_hot_key_matches_plain(spark):
    """Planted hot key (one key = 50% of left rows): the salted path must
    return EXACTLY the plain path's rows — identical matches, tolerance,
    and no-match NULLs — while splitting the hot key across salt buckets."""
    hot = [(1, ts, f"hot-{ts}") for ts in range(0, 200, 2)]    # 100 rows
    cold = [(k, ts, f"c{k}-{ts}") for k in range(2, 27)
            for ts in (7, 99, 150, 171)]                        # 100 rows
    left = spark.createDataFrame(hot + cold, "k bigint, ts bigint, lval string")
    right = spark.createDataFrame(
        [(k, ts, float(k) + ts / 1000.0) for k in range(1, 20)
         for ts in (5, 50, 120)], "k bigint, ts bigint, rval double")

    for direction in ("backward", "forward"):
        for tol in (None, 10):
            plain = temporal.asof_join(
                left, right, on="k", ts_col="ts", right_cols=["rval"],
                direction=direction, tolerance=tol)
            salted = temporal.asof_join_salted(
                left, right, on="k", ts_col="ts", right_cols=["rval"],
                direction=direction, tolerance=tol, salt=4)
            assert salted.columns == plain.columns
            a = sorted(map(tuple, plain.collect()), key=repr)
            b = sorted(map(tuple, salted.collect()), key=repr)
            assert a == b, (direction, tol)


def test_asof_salted_null_semantics_match_plain(spark):
    """NULL keys / NULL timestamps behave identically in both paths: the
    composite struct key must not let field-level NULLs pair up."""
    left = spark.createDataFrame(
        [(None, 10, "l-nullkey"), (1, None, "l-nullts"), (1, 10, "l-real")],
        "k bigint, ts bigint, lval string")
    right = spark.createDataFrame(
        [(None, 5, 0.5), (1, None, 9.9), (1, 8, 0.8)],
        "k bigint, ts bigint, rval double")
    plain = sorted(map(tuple, temporal.asof_join(
        left, right, on="k", ts_col="ts", right_cols=["rval"]).collect()),
        key=repr)
    salted = sorted(map(tuple, temporal.asof_join_salted(
        left, right, on="k", ts_col="ts", right_cols=["rval"],
        salt=3).collect()), key=repr)
    assert plain == salted
    got = {r[2]: (r[3], r[4]) for r in salted}
    assert got["l-nullkey"] == (None, None)
    assert got["l-nullts"] == (None, None)
    assert got["l-real"] == (8, 0.8)


def test_asof_salted_rejects_bad_salt(spark):
    left = spark.createDataFrame([(1, 10, "x")], "k bigint, ts bigint, lval string")
    with pytest.raises(SubstraitError, match="salt"):
        temporal.asof_join_salted(left, left, on="k", ts_col="ts", salt=0)


# --- sequence packing ----------------------------------------------------------

def test_pack_sequences_planted(spark):
    from datafusion_substrait_spark.operators import packing

    rows = [(i, "tok " * c) for i, c in
            [(0, 60), (1, 50), (2, 10), (3, 0), (4, 100), (5, 30)]]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: (r.shard, r.bin_id, r.bin_offset, r.n_tokens)
           for r in packing.pack_sequences(df, max_tokens=100,
                                           n_shards=2).collect()}
    # shard 0: docs 0 (60), 2 (10), 4 (100) in key order ->
    #   starts 0, 60, 70 -> bins 0, 0, 0; doc 4 straddles into bin 1
    assert out[0] == (0, 0, 0, 60)
    assert out[2] == (0, 0, 60, 10)
    assert out[4] == (0, 0, 70, 100)
    # shard 1: docs 1 (50), 3 (0), 5 (30) -> starts 0, 50, 50
    assert out[1] == (1, 0, 0, 50)
    assert out[3] == (1, 0, 50, 0)   # zero-token doc: slot, no budget
    assert out[5] == (1, 0, 50, 30)
    # deterministic across partitionings
    a = sorted(map(tuple, packing.pack_sequences(
        df.repartition(1), 100, n_shards=2).collect()))
    b = sorted(map(tuple, packing.pack_sequences(
        df.repartition(7), 100, n_shards=2).collect()))
    assert a == b
    # stats: shard 0 bin 0 has 3 docs starting, 170 tokens started
    stats = {(r.shard, r.bin_id): (r.n_docs, r.tokens_started)
             for r in packing.bin_stats(
                 packing.pack_sequences(df, 100, n_shards=2), 100).collect()}
    assert stats[(0, 0)] == (3, 170)
    assert stats[(1, 0)] == (3, 80)
    import pytest as _p
    with _p.raises(ValueError, match="max_tokens"):
        packing.pack_sequences(df, 0)


def test_pack_sequences_shuffled_order(spark):
    """order_col packs the stream in a caller-supplied order — here the
    deterministic-shuffle md5 order (the per-epoch composition) — with
    offsets replayed exactly by a DuckDB window in the same order, and
    the default path unchanged."""
    import duckdb

    from datafusion_substrait_spark.operators import packing

    rows = [(i, "tok " * c) for i, c in
            [(0, 60), (1, 50), (2, 10), (3, 0), (4, 100), (5, 30)]]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    shuffled = df.withColumn(
        "epoch_key", F.md5(F.concat(F.lit("v"), F.col("doc_id").cast("string"),
                                    F.lit("epoch1"))))
    got = sorted(map(tuple, packing.pack_sequences(
        shuffled, 100, n_shards=2, order_col="epoch_key")
        .select("doc_id", "shard", "bin_id", "bin_offset").collect()))
    want = sorted(duckdb.sql("""
        WITH d AS (
            SELECT * FROM (VALUES (0, 60), (1, 50), (2, 10), (3, 0),
                                  (4, 100), (5, 30)) AS t(doc_id, n)
        ), o AS (
            SELECT doc_id, n, doc_id % 2 AS shard,
                   md5('v' || CAST(doc_id AS VARCHAR) || 'epoch1') AS ek
            FROM d
        ), s AS (
            SELECT doc_id, shard,
                   sum(n) OVER (PARTITION BY shard ORDER BY ek, doc_id
                                ROWS UNBOUNDED PRECEDING) - n AS st
            FROM o
        )
        SELECT doc_id, CAST(shard AS INT) AS shard,
               CAST(floor(st / 100) AS BIGINT) AS bin_id,
               CAST(st % 100 AS BIGINT) AS bin_offset
        FROM s
    """).fetchall())
    assert got == want and got
    # order really differs from the key-ordered default for this salt
    default = sorted(map(tuple, packing.pack_sequences(
        df, 100, n_shards=2)
        .select("doc_id", "shard", "bin_id", "bin_offset").collect()))
    assert got != default


def test_pack_sequences_matches_duckdb_replay(spark, tables):
    """Exact assignment replay: same shard (key mod), same key order,
    same exclusive-cumsum binning, over the whitespace token count."""
    import os

    import duckdb

    from datafusion_substrait_spark.operators import packing
    from tests.conftest import SF_DIR

    docs = tables["documents"].select("doc_id", "text")
    got = sorted(map(tuple, packing.pack_sequences(
        docs, max_tokens=512, n_shards=8).collect()))
    docs_pq = os.path.join(SF_DIR, "documents.parquet")
    rows = duckdb.sql(f"""
        WITH t AS (
            -- the SAME alnum tokenizer as operators.text.token_count —
            -- a whitespace split only coincides on punctuation-free text
            SELECT doc_id,
                   CAST(len(list_filter(
                            regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                            x -> x <> '')) AS BIGINT) AS n_tokens,
                   CAST(doc_id % 8 AS INT) AS shard
            FROM '{docs_pq}'
        ), c AS (
            SELECT doc_id, n_tokens, shard,
                   sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens AS start
            FROM t
        )
        SELECT doc_id, n_tokens, shard,
               CAST(floor(start / 512) AS BIGINT) AS bin_id,
               CAST(start % 512 AS BIGINT) AS bin_offset
        FROM c
    """).fetchall()
    assert got == sorted(map(tuple, rows)) and got


def test_target_mix_sample(spark):
    from datafusion_substrait_spark.operators import sampling

    rows = ([(i, "en") for i in range(600)]
            + [(600 + i, "de") for i in range(300)]
            + [(900 + i, "fr") for i in range(100)]
            + [(1000 + i, "xx") for i in range(50)])
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = sampling.target_mix_sample(
        df, "doc_id", "lang", {"en": 0.5, "de": 0.3, "fr": 0.2})
    got = {r.lang: r.cnt for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # T = min(600/.5, 300/.3, 100/.2) = 500 -> fr is the binding stratum:
    # rate 1.0, kept EXACTLY; en/de land near 250/150 with hash jitter
    assert got.get("fr") == 100
    assert "xx" not in got                     # unnamed strata dropped
    assert 190 <= got.get("en", 0) <= 310
    assert 100 <= got.get("de", 0) <= 200
    # deterministic: same call, same rows
    again = sampling.target_mix_sample(
        df, "doc_id", "lang", {"en": 0.5, "de": 0.3, "fr": 0.2})
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # relative weights normalize: {5, 3, 2} == {0.5, 0.3, 0.2}
    rel = sampling.target_mix_sample(
        df, "doc_id", "lang", {"en": 5, "de": 3, "fr": 2})
    assert sorted(map(tuple, rel.collect())) == sorted(map(tuple, out.collect()))
    # total caps the output size
    capped = sampling.target_mix_sample(
        df, "doc_id", "lang", {"en": 0.5, "de": 0.3, "fr": 0.2}, total=100)
    assert capped.count() < 150
    with pytest.raises(ValueError, match="positive"):
        sampling.target_mix_sample(df, "doc_id", "lang", {"en": 0.0})
    with pytest.raises(ValueError, match="absent"):
        sampling.target_mix_sample(df, "doc_id", "lang", {"zz": 1.0})
    with pytest.raises(ValueError, match="at least one"):
        sampling.target_mix_sample(df, "doc_id", "lang", {})


def test_chunk_documents_planted(spark):
    from datafusion_substrait_spark.operators import packing

    toks = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(0, toks), (1, "one"), (2, ""), (3, "...!!")],
        "doc_id bigint, text string")
    # non-overlapping: windows [0..3] [4..7] [8..9]
    out = {(r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
           for r in packing.chunk_documents(df, chunk_tokens=4).collect()}
    assert out[(0, 0)] == (4, "w0 w1 w2 w3")
    assert out[(0, 1)] == (4, "w4 w5 w6 w7")
    assert out[(0, 2)] == (2, "w8 w9")          # short tail window
    assert out[(1, 0)] == (1, "one")
    # docs 2 (empty) and 3 (punctuation-only -> zero tokens) emit nothing
    assert {k for k, _ in out} == {0, 1}
    # overlapping windows: stride 2, starts 0,2,4,6,8
    ov = {r.chunk_id: (r.n_tokens, r.chunk_text)
          for r in packing.chunk_documents(
              df.filter("doc_id = 0"), chunk_tokens=4, stride=2).collect()}
    assert ov[1] == (4, "w2 w3 w4 w5")
    assert ov[4] == (2, "w8 w9")
    assert len(ov) == 5
    # every token lands in >= 1 window
    covered = " ".join(ov[i][1] for i in sorted(ov))
    assert all(f"w{i}" in covered.split() for i in range(10))
    with pytest.raises(ValueError, match="chunk_tokens"):
        packing.chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError, match="stride"):
        packing.chunk_documents(df, chunk_tokens=4, stride=-1)


def test_chunk_documents_is_shuffle_free(spark, tables):
    """The chunker must stay a narrow map: tokenize + explode + slice,
    no Exchange anywhere (embarrassingly parallel at 100 TB)."""
    from datafusion_substrait_spark.operators import packing

    out = packing.chunk_documents(
        tables["documents"].select("doc_id", "text"), chunk_tokens=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_asof_join_differential_vs_pandas_merge_asof(spark):
    """Differential oracle for the asof family (r15): pandas
    ``merge_asof`` implements the same point-in-time contract (backward/
    forward, inclusive ties, tolerance, left-join semantics) as an
    INDEPENDENT implementation — seeded random frames must agree
    exactly. Right side deduped to unique (key, ts) per the documented
    determinism contract; every 5th seed also pins the salted variant
    against the plain one on the same frame."""
    import random

    import pandas as pd

    from datafusion_substrait_spark.operators import temporal

    def nrm(v):
        return None if v is None or (isinstance(v, float) and v != v) \
            else int(v)

    for seed in range(25):
        rnd = random.Random(seed)
        n_l, n_r = rnd.randint(1, 40), rnd.randint(0, 30)
        lrows = [(rnd.randint(0, 4), rnd.randint(0, 100), i)
                 for i in range(n_l)]
        seen = set()
        rrows = []
        for j in range(n_r):
            kt = (rnd.randint(0, 4), rnd.randint(0, 100))
            if kt in seen:
                continue
            seen.add(kt)
            rrows.append((kt[0], kt[1], 1000 + j))
        direction = rnd.choice(["backward", "forward"])
        tolerance = rnd.choice([None, rnd.randint(1, 30)])

        left = spark.createDataFrame(lrows, "k bigint, ts bigint, lval bigint")
        right = spark.createDataFrame(
            rrows or [(None, None, None)],
            "k bigint, ts bigint, rval bigint")
        if not rrows:
            right = right.filter("k is not null")
        got = {
            (r.k, r.ts, r.lval, nrm(r.ts_r), nrm(r.rval_r))
            for r in temporal.asof_join(
                left, right, on="k", ts_col="ts",
                direction=direction, tolerance=tolerance).collect()
        }

        lp = pd.DataFrame(lrows, columns=["k", "ts", "lval"]).sort_values("ts")
        rp = pd.DataFrame(rrows, columns=["k", "ts", "rval"]).sort_values("ts")
        merged = pd.merge_asof(
            lp, rp, on="ts", by="k", direction=direction,
            suffixes=("", "_r"),
            tolerance=tolerance if tolerance is not None else None,
        ) if len(rp) else lp.assign(rval=None)
        want = set()
        for row in merged.itertuples(index=False):
            rv = nrm(getattr(row, "rval", None))
            # merge_asof keeps only the matched VALUE column; the matched
            # right ts equals the asof lookup result, reconstructable from
            # rval's uniqueness (1000+j keys the right row)
            ts_r = None if rv is None else next(
                t for (k2, t, v2) in rrows if v2 == rv)
            want.add((row.k, row.ts, row.lval, ts_r, rv))
        assert got == want, f"seed {seed} ({direction}, tol={tolerance})"

        if seed % 5 == 0 and rrows:
            salted = {
                (r.k, r.ts, r.lval, nrm(r.ts_r), nrm(r.rval_r))
                for r in temporal.asof_join_salted(
                    left, right, on="k", ts_col="ts",
                    direction=direction, tolerance=tolerance,
                    salt=3).collect()
            }
            assert salted == got, f"salted diverged at seed {seed}"
