"""DSIR importance-resampling selection (operators/selection.py).

Evidence strategy: the portable (md5-bucket) path is replayed END-TO-END
in DuckDB — profiles, smoothing floors, per-doc log-weights, Gumbel
top-k — the same in-suite-oracle pattern as t10's TF-IDF replay. The
xxhash64 default is value-checked by the planted direction test (the
hash scheme changes bucket ids, not the method's discrimination).
"""

from __future__ import annotations

import os
import statistics

import duckdb
import pytest
from pyspark.sql import functions as F

from datafusion_substrait_spark.operators import selection
from tests.conftest import SF_DIR

B = 1024
ALPHA = 1.0

_GRAMS = """
SELECT doc_id, CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
       ELSE list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
       END AS g
FROM (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS t
      FROM read_parquet('{pq}') {where})
"""


def _profile_sql(pq: str, where: str = "") -> str:
    return f"""
    WITH grams AS ({_GRAMS.format(pq=pq, where=where)}),
    b AS (SELECT (CAST(concat('0x', substr(md5(u.g2), 1, 8)) AS BIGINT) % {B}) AS bucket
          FROM grams, unnest(g) AS u(g2)),
    c AS (SELECT bucket, count(*) AS cnt FROM b GROUP BY bucket),
    t AS (SELECT sum(cnt) AS tt FROM c)
    SELECT bucket, (cnt + {ALPHA}) / (tt + {ALPHA} * {B}) AS p, cnt FROM c, t
    """


def _weights_sql(pq: str) -> str:
    # floors exactly as Spark's _floor_attach: α/(Σcnt + αB), never the
    # Σp reconstruction (its cancellation can flip a 6dp rounding)
    return f"""
    WITH tp AS ({_profile_sql(pq, "WHERE lang = 'en'")}),
    rp AS ({_profile_sql(pq)}),
    tfl AS (SELECT {ALPHA} / (sum(cnt) + {ALPHA} * {B}) AS f FROM tp),
    rfl AS (SELECT {ALPHA} / (sum(cnt) + {ALPHA} * {B}) AS f FROM rp),
    grams AS ({_GRAMS.format(pq=pq, where="")}),
    eb AS (SELECT doc_id,
                  (CAST(concat('0x', substr(md5(u.g2), 1, 8)) AS BIGINT) % {B}) AS bucket
           FROM grams, unnest(g) AS u(g2)),
    lr AS (SELECT doc_id, ln(coalesce(tp.p, tfl.f)) - ln(coalesce(rp.p, rfl.f)) AS lr
           FROM eb LEFT JOIN tp USING (bucket) LEFT JOIN rp USING (bucket), tfl, rfl)
    SELECT doc_id, CAST(count(lr) AS BIGINT) AS n_grams,
           round(coalesce(sum(lr), 0), 6) AS log_weight
    FROM lr GROUP BY doc_id
    """


def _spark_weights(tables, portable=True):
    docs = tables["documents"].select("doc_id", "text", "lang")
    tp = selection.bucket_profile(docs.filter(F.col("lang") == "en"),
                                  n_buckets=B, portable=portable)
    rp = selection.bucket_profile(docs, n_buckets=B, portable=portable)
    return selection.dsir_log_weights(docs, tp, rp, n_buckets=B,
                                      portable=portable)


def test_dsir_weights_match_duckdb_replay(spark, tables):
    """Exact portable-path replay: md5 buckets, add-α smoothing, derived
    smoothing floors for absent buckets, 6dp-rounded per-doc sums."""
    pq = os.path.join(SF_DIR, "documents.parquet")
    got = sorted(map(tuple, _spark_weights(tables).collect()))
    want = sorted(duckdb.sql(_weights_sql(pq)).fetchall())
    assert got == want and got


def test_dsir_gumbel_sample_matches_duckdb_replay(spark, tables):
    pq = os.path.join(SF_DIR, "documents.parquet")
    sel = selection.dsir_sample(_spark_weights(tables), k=50)
    got = sorted(map(tuple, sel.select("doc_id", "gumbel_score").collect()))
    want = sorted(duckdb.sql(f"""
        WITH w AS ({_weights_sql(pq)}),
        g AS (SELECT doc_id, round(log_weight - ln(-ln(
                  (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                        AS BIGINT) + 1.0) / {16 ** 12 + 1}.0)), 6) AS s
              FROM w)
        SELECT doc_id, s FROM g ORDER BY s DESC, doc_id LIMIT 50
    """).fetchall())
    assert got == want and len(got) == 50


@pytest.mark.parametrize("portable", [True, False])
def test_dsir_direction_and_determinism(spark, tables, portable):
    """Target-resemblance must drive the weight: docs in the target lang
    score higher on average (both hash schemes), and the whole pipeline
    is partitioning-independent."""
    w = _spark_weights(tables, portable=portable)
    langs = {r.doc_id: r.lang for r in
             tables["documents"].select("doc_id", "lang").collect()}
    rows = {r.doc_id: r.log_weight for r in w.collect()}
    assert len(rows) == len(langs)  # every doc keeps a row
    en = [rows[d] for d, l in langs.items() if l == "en"]
    other = [rows[d] for d, l in langs.items() if l != "en"]
    assert statistics.mean(en) > statistics.mean(other) + 1.0
    docs = tables["documents"].select("doc_id", "text", "lang")
    tp = selection.bucket_profile(docs.filter(F.col("lang") == "en"),
                                  n_buckets=B, portable=portable)
    rp = selection.bucket_profile(docs, n_buckets=B, portable=portable)
    a = sorted(map(tuple, selection.dsir_log_weights(
        docs.repartition(1), tp, rp, n_buckets=B, portable=portable).collect()))
    b = sorted(map(tuple, selection.dsir_log_weights(
        docs.repartition(13), tp, rp, n_buckets=B, portable=portable).collect()))
    assert a == b


def test_dsir_planted_identical_corpora_are_neutral(spark):
    """target == raw ⇒ every present bucket's ratio is exactly 1, so all
    log-weights are 0 regardless of content."""
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta gamma delta delta"), (2, None)],
        "doc_id bigint, text string")
    p = selection.bucket_profile(df, n_buckets=64)
    w = {r.doc_id: (r.n_grams, r.log_weight)
         for r in selection.dsir_log_weights(df, p, p, n_buckets=64).collect()}
    assert w[0] == (2, 0.0) and w[1] == (3, 0.0)
    assert w[2] == (0, 0.0)  # NULL text: neutral row, not dropped


def test_dsir_floor_exact_at_full_bucket_coverage(spark):
    """Regression (r7 ADVICE): with every bucket present, the old Σp
    reconstruction of the smoothing floor was α·0/(1−1) = 0/0 → NaN.
    bucket_profile now carries cnt so the floor is computed exactly as
    α/(T+αB); n_buckets=1 guarantees full coverage."""
    import math

    df = spark.createDataFrame([(0, "a b c d")],
                               "doc_id bigint, text string")
    p = selection.bucket_profile(df, n_buckets=1)  # T = 3 bigrams
    row = selection._floor_attach(p, p, 1.0, 1).collect()[0]
    assert math.isfinite(row["_tfloor"]) and math.isfinite(row["_rfloor"])
    assert abs(row["_tfloor"] - 1.0 / (3 + 1)) < 1e-12
    # and the weights pipeline stays neutral/finite end-to-end
    w = {r.doc_id: r.log_weight
         for r in selection.dsir_log_weights(df, p, p, n_buckets=1).collect()}
    assert w[0] == 0.0


def test_dsir_error_contracts(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="n_buckets"):
        selection.bucket_profile(df, n_buckets=0)
    with pytest.raises(ValueError, match="alpha"):
        selection.bucket_profile(df, alpha=0.0)
    p = selection.bucket_profile(df)
    with pytest.raises(ValueError, match="k"):
        selection.dsir_sample(selection.dsir_log_weights(df, p, p), k=0)


def test_dsir_plan_shapes(spark, tables):
    """100 TB gates: the ratio table broadcasts into the corpus-sized
    explode (never a shuffle of the grams against it), the per-doc sum
    keeps its map-side partial phase, and the Gumbel top-k runs as
    TakeOrderedAndProject — no global sort of the corpus."""
    w = _spark_weights(tables)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan or "partial_sum" in plan
    sel = selection.dsir_sample(w, k=10)
    splan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in splan
