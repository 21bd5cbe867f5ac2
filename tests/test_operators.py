"""Tests for the pipeline operators (dedup / similarity / text / multimodal).

Correctness is checked against either a DuckDB replay of the same logic
(the driver's t2 style) or an in-Python reference computation on collected
rows (small SF only — the operators themselves never collect).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datafusion_substrait_spark.operators import dedup, multimodal, similarity, text


# --- text -------------------------------------------------------------------

def test_token_count_matches_python(spark, tables):
    import re

    got = {
        r["doc_id"]: r["n"]
        for r in tables["documents"].select(
            "doc_id", text.token_count(F.col("text")).alias("n")
        ).collect()
    }
    for row in tables["documents"].select("doc_id", "text").collect():
        expect = len([t for t in re.split(r"[^a-z0-9]+", row["text"].lower()) if t])
        assert got[row["doc_id"]] == expect


def test_quality_features_ranges(spark, tables):
    out = text.quality_features(tables["documents"]).collect()
    assert len(out) == tables["documents"].count()
    for r in out:
        assert r["n_tokens"] > 0
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0


def test_word_ngrams_lambda_bind_matches_inline_spelling(spark, tables):
    """r17 regression test (named for what it prevents): word_ngrams binds
    the token array ONCE per row as a lambda variable (one-element
    transform). The pre-r17 spelling referenced the tokens(...) subtree
    from inside the per-gram slice lambda, re-splitting the whole document
    per OUTPUT GRAM (no CSE across the HOF boundary — measured 3.59 s vs
    0.33 s for the sf0.1 gram projection). Pins (a) bit-identity against
    an in-test reconstruction of the inline spelling, including the
    short-document fallback and NULL text, and (b) that exactly one
    `split(` survives in the optimized plan (the inline spelling carries
    three)."""
    from datafusion_substrait_spark.operators.text import tokens

    def inline_word_ngrams(t, n=3):
        toks = tokens(t)
        cnt = F.size(toks)
        return F.when(cnt < n, F.array(F.array_join(toks, " "))).otherwise(
            F.transform(
                F.sequence(F.lit(0), cnt - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        )

    docs = tables["documents"].select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(9001, "a b"), (9002, ""), (9003, None), (9004, "one two three")],
            "doc_id bigint, text string"))
    new = docs.select("doc_id", text.word_ngrams(F.col("text"), 3).alias("g"))
    old = docs.select("doc_id", inline_word_ngrams(F.col("text"), 3).alias("g"))
    assert new.schema == old.schema
    got = {r["doc_id"]: r["g"] for r in new.collect()}
    want = {r["doc_id"]: r["g"] for r in old.collect()}
    assert got == want
    # plan probe on a single (non-union) branch: the union pushes the
    # projection into both children, doubling every occurrence count
    plan = tables["documents"].select(
        "doc_id", text.word_ngrams(F.col("text"), 3).alias("g"))\
        ._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1, plan


def test_lang_id_deterministic_and_total(spark, tables):
    out = text.lang_id(tables["documents"])
    assert out.count() == tables["documents"].count()
    langs = {r["lang_pred"] for r in out.select("lang_pred").distinct().collect()}
    assert langs <= {"en", "fr", "de", "es", "und"}


def test_fingerprint_is_md5(spark, tables):
    import hashlib
    import re

    row = tables["documents"].select("doc_id", "text").first()
    got = text.fingerprint(tables["documents"]).filter(
        F.col("doc_id") == row["doc_id"]
    ).first()["fingerprint"]
    norm = re.sub(r"\s+", " ", row["text"].lower())
    assert got == hashlib.md5(norm.encode()).hexdigest()


# --- dedup ------------------------------------------------------------------

def test_exact_dedup_removes_planted_duplicates(spark, tables):
    docs = tables["documents"].select("doc_id", "text")
    dup = docs.limit(5).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    survivors = dedup.exact_dedup(docs.unionAll(dup))
    # planted copies have larger ids → originals survive; count unchanged
    assert survivors.count() == docs.count()
    assert survivors.filter(F.col("doc_id") >= 100000).count() == 0


def test_minhash_finds_planted_near_duplicates(spark, tables):
    docs = tables["documents"].select("doc_id", "text").limit(50)
    # plant: doc_id+500 is doc with a tiny suffix edit → near-dup
    edited = docs.select(
        (F.col("doc_id") + 500).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    pairs = dedup.minhash_lsh_pairs(
        docs.unionAll(edited), threshold=0.5
    ).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    planted = {(r["doc_id"], r["doc_id"] + 500) for r in docs.collect()}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"minhash recall too low: {recall}"
    for r in pairs:
        assert r["jaccard"] >= 0.5


def test_minhash_jaccard_is_exact_on_candidates(spark, tables):
    docs = tables["documents"].select("doc_id", "text").limit(30)
    edited = docs.select(
        (F.col("doc_id") + 500).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
    )
    both = docs.unionAll(edited)
    pairs = dedup.minhash_lsh_pairs(both, threshold=0.3).collect()
    texts = {r["doc_id"]: r["text"] for r in both.collect()}

    def shingles(t, n=5):
        import re
        norm = re.sub(r"\s+", " ", t.lower())
        return {norm[i:i + n] for i in range(max(1, len(norm) - n + 1))}

    for r in pairs[:10]:
        a, b = shingles(texts[r["doc_a"]]), shingles(texts[r["doc_b"]])
        expect = len(a & b) / len(a | b)
        assert abs(r["jaccard"] - expect) < 1e-4


def test_simhash_near_duplicates(spark, tables):
    docs = tables["documents"].select("doc_id", "text").limit(40)
    copies = docs.select((F.col("doc_id") + 500).alias("doc_id"), "text")
    pairs = dedup.simhash_pairs(docs.unionAll(copies), max_hamming=3).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    planted = {(r["doc_id"], r["doc_id"] + 500) for r in docs.collect()}
    assert planted <= found  # identical docs have hamming 0 and must all appear


def test_dedup_clusters_connected_components(spark):
    # chain 1-2-3-4-5 (diameter 4, forces multiple propagation rounds),
    # a separate pair, and a triangle with redundant edges
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["doc_a", "doc_b"],
    )
    got = {r["node"]: r["cluster_id"]
           for r in dedup.dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_dedup_clusters_long_chain_converges(spark):
    """A planted 1000-link chain (diameter 1000 — the template-drift
    pathology: each near-dup pairs only with its neighbors) must converge
    within max_iter=20: pointer doubling covers ≥ 2d+1 distance per
    round, where r8's one-hop propagation needed ~1000 rounds and raised."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1000)], ["doc_a", "doc_b"])
    got = dedup.dedup_clusters(pairs, max_iter=20)
    assert got.filter(F.col("cluster_id") != 0).count() == 0
    assert got.count() == 1001


def test_hamming_pairs_edge_contracts(spark):
    """All-NULL signatures produce an empty (not failing) result;
    identical signatures pair at hamming 0 exactly once despite
    colliding in all four bands (the distinct contract); a pair differing
    in every band is never generated (the pigeonhole recall fence)."""
    from datafusion_substrait_spark.operators.dedup import hamming_pairs

    allnull = spark.createDataFrame([(1, None), (2, None)],
                                    "key bigint, sig bigint")
    assert hamming_pairs(allnull, key_col="key", sig_col="sig",
                         out_prefix="key").count() == 0

    same = spark.createDataFrame([(1, 77), (2, 77), (3, None)],
                                 "key bigint, sig bigint")
    got = [(r.key_a, r.key_b, r.hamming) for r in hamming_pairs(
        same, key_col="key", sig_col="sig", out_prefix="key").collect()]
    assert got == [(1, 2, 0)]  # once, not once per colliding band

    # one bit flipped in EVERY 16-bit band: hamming 4 but zero shared
    # bands — the documented band-colliding-subset contract
    a = 0x0001000100010001
    spread = spark.createDataFrame([(1, 0), (2, a)],
                                   "key bigint, sig bigint")
    assert hamming_pairs(spread, key_col="key", sig_col="sig",
                         max_hamming=8, out_prefix="key").count() == 0


def test_deterministic_shuffle_null_keys_stable(spark):
    """NULL keys share one hash (the null-safe 'n' tag) and the key
    tie-break keeps the order fully deterministic across partitionings —
    NULL keys must not crash or wander."""
    from datafusion_substrait_spark.operators import sampling

    df = spark.createDataFrame(
        [(None,), (1,), (2,), (None,), (3,)], "doc_id bigint")
    a = [r.doc_id for r in sampling.deterministic_shuffle(
        df, "doc_id").collect()]
    b = [r.doc_id for r in sampling.deterministic_shuffle(
        df.repartition(5), "doc_id").collect()]
    assert a == b and sorted(x for x in a if x is not None) == [1, 2, 3]
    assert a.count(None) == 2


def test_perceptual_hash_against_independent_reference(spark):
    """ahash/dhash checked against an independent nested-loop
    implementation on a 64×64 image (NN-resample is the identity there,
    so the reference needs only exact 8×8 block means), plus invariance
    and error contracts."""
    import numpy as np

    from datafusion_substrait_spark.operators import multimodal

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (64, 64), np.uint8)
    png = _encode_png(img.tolist(), 0, (list(range(5)) * 13)[:64])  # gray PNG

    def block_means(g):
        return [[float(np.mean(g[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8]))
                 for c in range(g.shape[1] // 8)] for r in range(8)]

    got_a = multimodal.perceptual_hash(png, "ahash")
    grid = block_means(img.astype(np.float64))
    mean = sum(sum(row) for row in grid) / 64.0
    want = 0
    for r in range(8):
        for c in range(8):
            if grid[r][c] > mean:
                want |= 1 << (r * 8 + c)
    want = want - (1 << 64) if want >= (1 << 63) else want
    assert got_a == want

    got_d = multimodal.perceptual_hash(png, "dhash")
    # dhash pools a 72-wide grid: on a 64-wide image the NN resample
    # repeats columns, so only verify structural properties here —
    # determinism and 64-bit signedness
    assert got_d == multimodal.perceptual_hash(png, "dhash")
    assert -(1 << 63) <= got_d < (1 << 63)

    # undecodable → None; bad kind → error
    assert multimodal.perceptual_hash(b"not an image", "ahash") is None
    with pytest.raises(ValueError, match="kind"):
        multimodal.perceptual_hash(png, "phash9000")


def test_synthetic_payload_ahash_closed_form():
    """The d7 phash-leg oracle contract: on attach_synthetic_image_payload's
    constant-block PNGs, the REAL decode→ahash path equals the closed form
    bit i = digest[i%32]*32 > sum(digest) (block means and grid.mean() are
    exact in float32 — integer sums < 2^24, /64 and /32 are power-of-two
    exact), so DuckDB can replay the signature from sha256(text) hex."""
    import hashlib

    import numpy as np

    from datafusion_substrait_spark.operators import multimodal

    for text in ("0", "17", "99", "hello world", ""):
        digest = hashlib.sha256(text.encode("utf-8")).digest()
        grid = np.frombuffer(digest * 2, np.uint8).reshape(8, 8)
        img = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
        png = multimodal._encode_gray_png(img.tobytes(), 64, 64)
        s = sum(digest)
        v = 0
        for i in range(64):
            if digest[i % 32] * 32 > s:
                v |= 1 << i
        want = v - (1 << 64) if v >= (1 << 63) else v
        assert multimodal.perceptual_hash(png, "ahash") == want


def test_synthetic_video_payload_ahash_closed_form():
    """The d7 vphash-leg oracle contract: on attach_synthetic_video_payload's
    block-pattern MJPEG frames, the REAL container walk + JPEG decode +
    aHash equals the digest bit mask (bit i = (digest[i%32] >> (i//32)) & 1;
    0 when all blocks are equal) — 32/224 survive the flat-q16 quantizer
    exactly and the grid mean sits strictly between them."""
    import hashlib

    from datafusion_substrait_spark.operators import multimodal

    for text in ("v0", "v17", "v99", "hello", ""):
        digest = hashlib.sha256(text.encode("utf-8")).digest()
        bits = [(digest[i % 32] >> (i // 32)) & 1 for i in range(64)]
        blocks = [[224 if bits[r * 8 + c] else 32 for c in range(8)]
                  for r in range(8)]
        jpg = multimodal._encode_const_block_jpeg(blocks)
        avi = multimodal._mjpeg_avi_container([jpg] * 3, 64, 64)
        frames = multimodal.avi_mjpeg_frames(avi)
        assert frames == [jpg] * 3  # real container walk
        if all(b == bits[0] for b in bits):
            want = 0
        else:
            v = sum(1 << i for i in range(64) if bits[i])
            want = v - (1 << 64) if v >= (1 << 63) else v
        assert multimodal.perceptual_hash(jpg, "ahash") == want, text


def test_image_neardup_pairs_finds_planted_copies(spark):
    """A noised re-encode of an image must pair with its original at
    small Hamming; an unrelated image must not; undecodable payloads get
    NULL phash and never pair; deterministic across partitionings."""
    import numpy as np

    from datafusion_substrait_spark.operators import multimodal

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (32, 32), np.uint8)
    noised = base.copy()
    noised[0, 0] ^= 3
    noised[13, 7] ^= 2     # tiny perturbation: block means barely move
    other = 255 - base      # inverted: every ahash bit flips
    scan = (list(range(5)) * 7)[:32]
    rows = [
        (1, _encode_png(base.tolist(), 0, scan)),
        (2, _encode_png(noised.tolist(), 0, scan)),
        (3, _encode_png(other.tolist(), 0, scan)),
        (4, b"corrupt \x00 payload"),
    ]
    df = spark.createDataFrame(rows, "key bigint, payload binary")
    sigs = {r.key: r.phash for r in multimodal.image_phash(df).collect()}
    assert sigs[4] is None and sigs[1] is not None
    assert bin((sigs[1] ^ sigs[2]) & ((1 << 64) - 1)).count("1") <= 4

    pairs = multimodal.image_neardup_pairs(df, max_hamming=6)
    got = {(r.key_a, r.key_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(3 not in p and 4 not in p for p in got)
    a = sorted(map(tuple, multimodal.image_neardup_pairs(
        df.repartition(1), max_hamming=6).collect()))
    b = sorted(map(tuple, multimodal.image_neardup_pairs(
        df.repartition(5), max_hamming=6).collect()))
    assert a == b


def test_video_neardup_pairs_planted(spark):
    """Clip of JPEG-encoded planted frames: a noised re-encode pairs
    with the original at small Hamming, a one-frame-corrupted copy still
    pairs (majority vote), the inverted clip and an undecodable payload
    never pair; zero-decodable-frame clips keep a NULL phash row."""
    import numpy as np

    from datafusion_substrait_spark.operators import multimodal
    from tests.test_jpeg import _encode_jpeg

    rng = np.random.default_rng(17)
    base = rng.integers(0, 256, (32, 32), np.uint8)
    noised = np.clip(base.astype(int) + rng.integers(-2, 3, base.shape),
                     0, 255).astype(np.uint8)
    jb = _encode_jpeg(base, q_val=8)
    jn = _encode_jpeg(noised, q_val=8)
    ji = _encode_jpeg(255 - base, q_val=8)
    rows = [
        (1, _mjpeg_mp4_fixture([jb, jb, jb])),
        (2, _mjpeg_mp4_fixture([jn, jn, jn])),
        (3, _mjpeg_mp4_fixture([jb, b"\xff\xd8corrupt\xff\xd9", jb])),
        (4, _mjpeg_mp4_fixture([ji, ji, ji])),
        (5, b"not a video container"),
    ]
    df = spark.createDataFrame(rows, "key bigint, payload binary")
    sigs = {r.key: r.phash for r in multimodal.video_phash(df).collect()}
    assert sigs[1] is not None and sigs[5] is None
    assert sigs[1] == sigs[3]  # majority vote absorbs the corrupt frame
    pairs = multimodal.video_neardup_pairs(df, max_hamming=6)
    got = {(r.key_a, r.key_b) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) in got
    assert all(4 not in p and 5 not in p for p in got)


def test_keep_best_per_cluster(spark):
    """Highest score survives, ties break to the smaller key, unscored
    members rank last, singletons always keep — exactly one kept per
    cluster, and the output is partitioning-independent."""
    lmin = -(1 << 63)  # Long.MIN_VALUE: -x wraps to itself; ~x does not
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20),
         (lmin, lmin), (30, lmin)],
        ["node", "cluster_id"])
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (10, 0.5),
         (lmin, 0.7), (30, 0.7)],  # 11, 20 unscored
        ["doc_id", "quality_score"])
    out = {r.doc_id: r.kept
           for r in dedup.keep_best_per_cluster(clusters, scores).collect()}
    assert out == {1: False, 2: True, 3: False,   # 2 wins the 0.9 tie
                   10: True, 11: False,            # scored beats unscored
                   20: True,                       # unscored singleton kept
                   lmin: True, 30: False}          # MIN_VALUE wins its tie
                                                   # (negation would invert)
    a = sorted(map(tuple, dedup.keep_best_per_cluster(
        clusters.repartition(1), scores).collect()))
    b = sorted(map(tuple, dedup.keep_best_per_cluster(
        clusters.repartition(7), scores).collect()))
    assert a == b


def test_keep_best_end_to_end_with_quality(spark, tables):
    """Pipeline composition on real data: pairs → clusters → keep-best
    by quality_features score; every cluster keeps exactly one member
    and it attains the cluster's max score."""
    docs = tables["documents"]
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.35)
    clusters = dedup.dedup_clusters(pairs)
    scores = text.quality_features(docs)
    out = dedup.keep_best_per_cluster(clusters, scores)
    per = (out.groupBy("cluster_id")
           .agg(F.sum(F.col("kept").cast("int")).alias("n_kept"))
           .filter("n_kept != 1"))
    assert per.count() == 0
    joined = out.join(scores, "doc_id")
    best = (joined.groupBy("cluster_id")
            .agg(F.max("quality_score").alias("mx")))
    bad = (joined.filter("kept").join(best, "cluster_id")
           .filter(F.col("quality_score") != F.col("mx")))
    assert bad.count() == 0 and out.count() > 0


def test_deterministic_shuffle_order(spark, tables):
    """Order is the md5-of-key order (DuckDB-replayable), independent of
    input partitioning, and salt changes produce a different permutation
    of the same row set."""
    import duckdb

    from datafusion_substrait_spark.operators import sampling

    docs = tables["documents"].select("doc_id")
    got = [r.doc_id for r in
           sampling.deterministic_shuffle(docs, "doc_id").collect()]
    import os

    from tests.conftest import SF_DIR
    pq = os.path.join(SF_DIR, "documents.parquet")
    want = [r[0] for r in duckdb.sql(f"""
        SELECT doc_id FROM read_parquet('{pq}')
        ORDER BY md5('v' || CAST(doc_id AS VARCHAR)), doc_id
    """).fetchall()]
    assert got == want and len(got) > 0
    again = [r.doc_id for r in sampling.deterministic_shuffle(
        docs.repartition(13), "doc_id").collect()]
    assert again == got
    other = [r.doc_id for r in sampling.deterministic_shuffle(
        docs, "doc_id", salt="epoch2").collect()]
    assert other != got and sorted(other) == sorted(got)


def test_simhash_exact_expected_pair_set(spark):
    # deterministic planted ground truth, value-checked as an exact SET (not
    # a recall bound): disjoint-vocabulary docs are ~32 bits apart in a
    # 64-bit simhash, so with max_hamming=3 the output must be precisely the
    # planted copy pairs — no misses, no extras. This is the d3 stand-in for
    # a DuckDB oracle (xxhash64 signatures are not SQL-replayable).
    docs = [(i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(20)]
    rows = docs + [(i + 100, t) for i, t in docs]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup.simhash_pairs(df, max_hamming=3).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert found == {(i, i + 100) for i in range(20)}
    assert all(r["hamming"] == 0 for r in pairs)


def test_ngram_jaccard_pairs_schema_and_symmetry(spark, tables):
    out = dedup.ngram_jaccard_pairs(
        tables["documents"].limit(80), threshold=0.05
    )
    rows = out.collect()
    assert out.columns == ["doc_a", "doc_b", "jaccard"]
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0.05 <= r["jaccard"] <= 1.0


def test_embedding_neardup_pairs(spark, tables):
    emb = tables["embeddings"].select("vec_id", "embedding").limit(60)
    copies = emb.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    pairs = dedup.embedding_neardup_pairs(emb.unionAll(copies), threshold=0.999)
    found = {(r["vec_a"], r["vec_b"]) for r in pairs.collect()}
    planted = {(r["vec_id"], r["vec_id"] + 10000) for r in emb.collect()}
    assert planted <= found  # identical vectors: cosine 1, same bucket


def test_semdedup_planted_copies(spark, tables):
    """Exact copies land in the original's cell (identical vector →
    identical scores → same first-max cell) with cosine 1, so every
    copy (the larger key) is dropped and every original survives."""
    from datafusion_substrait_spark.operators import similarity

    emb = tables["embeddings"].select("vec_id", "embedding").limit(40)
    copies = emb.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    cents = similarity.deterministic_centroids(8, 64)
    out = dedup.semdedup(emb.unionAll(copies), cents, threshold=0.999)
    assert out.columns == ["vec_id", "cell", "kept"]
    rows = {r.vec_id: (r.cell, r.kept) for r in out.collect()}
    assert len(rows) == 80  # every input row tagged, none lost
    for r in emb.collect():
        oc, ok = rows[r.vec_id]
        cc, ck = rows[r.vec_id + 10000]
        assert oc == cc          # copy shares the original's cell
        assert ok and not ck     # keep-min-key: original kept, copy dropped
    # deterministic across partitionings
    both = emb.unionAll(copies)
    a = sorted(map(tuple, dedup.semdedup(both.repartition(1), cents,
                                         threshold=0.999).collect()))
    b = sorted(map(tuple, dedup.semdedup(both.repartition(13), cents,
                                         threshold=0.999).collect()))
    assert a == b


def test_semdedup_hot_cell_star_cap(spark):
    """A degenerate cell past max_cell_size compares only against the
    cell's min-key hub — with identical vectors that still drops
    everything but the hub, at O(n) instead of O(n²) pairs."""
    from datafusion_substrait_spark.operators import similarity

    n = 30
    vec = [1.0] + [0.0] * 63
    df = spark.createDataFrame([(i, vec) for i in range(n)],
                               "vec_id bigint, embedding array<double>")
    cents = similarity.deterministic_centroids(4, 64)
    out = {r.vec_id: r.kept
           for r in dedup.semdedup(df, cents, threshold=0.9,
                                   max_cell_size=5).collect()}
    assert out[0] is True                      # the hub survives
    assert all(not out[i] for i in range(1, n))  # everyone else dropped


# --- similarity -------------------------------------------------------------

def test_brute_force_topk_matches_python(spark, tables):
    emb = tables["embeddings"].select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.brute_force_topk(emb, queries, k=5).collect()
    data = {r["vec_id"]: r["embedding"] for r in emb.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    for qid in range(3):
        expect = sorted(
            ((round(cos(data[qid], v), 6), -k) for k, v in data.items()),
            reverse=True,
        )[:5]
        expect_ids = [-k for _, k in expect]
        got_ids = [r["vec_id"] for r in sorted(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"]
        )]
        assert got_ids == expect_ids
        # self-match first with cosine 1
        assert got_ids[0] == qid


def test_quantize_embeddings_roundtrip_and_recall(spark, tables):
    """int8 quantization: per-component reconstruction error <= scale/2,
    byte storage schema, zero-vector safety, and recall@10 vs the exact
    float path on the real embeddings."""
    emb = tables["embeddings"].select("vec_id", "embedding")
    q = similarity.quantize_embeddings(emb)
    assert dict(q.dtypes)["qvec"] == "array<tinyint>"
    # reconstruction bound
    joined = q.join(emb, "vec_id").select(
        "vec_id", "scale",
        F.aggregate(
            F.zip_with(similarity.dequantize_expr(F.col("qvec"), F.col("scale")),
                       F.col("embedding"),
                       lambda d, x: F.abs(d - x.cast("double"))),
            F.lit(0.0), lambda acc, x: F.greatest(acc, x),
        ).alias("max_err"),
    )
    bad = joined.filter(F.col("max_err") > F.col("scale") * 0.5 + 1e-9)
    assert bad.count() == 0
    # zero vector: scale 0, all-zero qvec, and scoring yields NULL cosine
    z = spark.createDataFrame([(1, [0.0] * 8), (2, [1.0] * 8)],
                              "vec_id bigint, embedding array<float>")
    zq = {r.vec_id: (r.scale, list(r.qvec))
          for r in similarity.quantize_embeddings(z).collect()}
    assert zq[1] == (0.0, [0] * 8)
    assert zq[2][1] == [127] * 8
    # recall@10 against the exact float path
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = similarity.brute_force_topk(emb, queries, k=10).collect()
    approx = similarity.brute_force_topk_quantized(q, queries, k=10).collect()
    for qid in range(5):
        ex = {r.vec_id for r in exact if r.query_id == qid}
        ap = {r.vec_id for r in approx if r.query_id == qid}
        assert len(ex & ap) >= 9, (qid, ex, ap)
    # deterministic across partitionings
    a = sorted((r.vec_id, tuple(r.qvec), r.scale)
               for r in similarity.quantize_embeddings(emb.repartition(1)).collect())
    b = sorted((r.vec_id, tuple(r.qvec), r.scale)
               for r in similarity.quantize_embeddings(emb.repartition(9)).collect())
    assert a == b


def test_quantize_amax_staging_matches_inline_fold(spark, tables):
    """r17 regression test (named for what it prevents): quantize_embeddings
    materializes the per-row amax fold in its OWN Project so the interpreted
    transform lambda reads a column instead of re-evaluating the 64-step
    fold per element (64x redundant work — 1.16 s of the s1 leg at sf0.1).
    Pins (a) bit-identity against an in-test reconstruction of the pre-r17
    single-Project spelling, and (b) that CollapseProject does not inline
    the fold back into the lambda (exactly one `aggregate(` in the
    optimized plan — the inlined spelling has three)."""
    emb = tables["embeddings"].select("vec_id", "embedding")

    def inline_fold_quantize(df, vec_col="embedding", key_col="vec_id"):
        v = F.col(vec_col)
        amax = F.aggregate(
            v, F.lit(0.0),
            lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))))
        scale = (amax / F.lit(127.0)).alias("scale")
        return df.select(
            F.col(key_col),
            F.transform(
                v,
                lambda x: F.when(amax == 0.0, F.lit(0)).otherwise(
                    F.round(x.cast("double") * F.lit(127.0) / amax)
                ).cast("tinyint"),
            ).alias("qvec"),
            scale.cast("float"),
        )

    new = similarity.quantize_embeddings(emb)
    old = inline_fold_quantize(emb)
    assert new.schema == old.schema
    got = {r["vec_id"]: (tuple(r["qvec"]), r["scale"]) for r in new.collect()}
    want = {r["vec_id"]: (tuple(r["qvec"]), r["scale"]) for r in old.collect()}
    assert got == want
    plan = new._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("aggregate(") == 1, plan


def test_lsh_topk_subset_of_bruteforce_scores(spark, tables):
    emb = tables["embeddings"].select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.lsh_topk(emb, queries, k=5, planes=4).collect()
    assert len(got) > 0
    for r in got:
        assert -1.000001 <= r["cosine"] <= 1.000001
    # self-vector shares its own bucket → rank 1 must be the query itself
    by_q = {r["query_id"]: r for r in got if r["rank"] == 1}
    assert by_q[0]["vec_id"] == 0 and by_q[1]["vec_id"] == 1


def test_ivf_topk_deterministic_and_self_match(spark, tables):
    emb = tables["embeddings"].select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = similarity.ivf_topk(emb, queries, k=5, n_cells=4, nprobe=2).collect()
    assert len(got) > 0
    # self-vector lands in its own (probed-first) cell → rank 1 is the query
    by_q = {r["query_id"]: r for r in got if r["rank"] == 1}
    for qid in range(3):
        assert by_q[qid]["vec_id"] == qid and abs(by_q[qid]["cosine"] - 1.0) < 1e-5
    again = similarity.ivf_topk(emb, queries, k=5, n_cells=4, nprobe=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_ivf_centroids_reusable(spark, tables):
    emb = tables["embeddings"].select("vec_id", "embedding")
    cents = similarity.train_kmeans_centroids(emb, n_cells=4)
    assert len(cents) == 4 and len(cents[0]) == len(emb.first()["embedding"])
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.ivf_topk(emb, queries, k=3, centroids=cents, nprobe=4)
    assert out.count() > 0


# --- multimodal -------------------------------------------------------------

def _png_bytes(w: int, h: int) -> bytes:
    """A REAL, fully valid PNG (signature, IHDR/IDAT/IEND chunks with
    correct CRCs; one zlib-compressed RGBA scanline row per pixel row)."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x00\x00\x00\xff" * w for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _jpeg_bytes(w: int, h: int) -> bytes:
    """Minimal JPEG header stream: SOI, APP0/JFIF, then a baseline SOF0
    frame header carrying the dimensions (big-endian height first)."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" \
        + struct.pack(">HH", h, w) + b"\x01\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0


def test_parse_image_header_real_containers(spark):
    import struct

    assert multimodal.parse_image_header(_png_bytes(3, 7)) == ("png", 3, 7)
    assert multimodal.parse_image_header(_jpeg_bytes(640, 480)) == ("jpeg", 640, 480)
    gif = b"GIF89a" + struct.pack("<HH", 12, 34) + b"\x00" * 10
    assert multimodal.parse_image_header(gif) == ("gif", 12, 34)
    bmp = b"BM" + b"\x00" * 12 + struct.pack("<I", 40) \
        + struct.pack("<ii", 20, -30) + b"\x00" * 8
    assert multimodal.parse_image_header(bmp) == ("bmp", 20, 30)
    # non-image payloads (incl. ones starting with the ASCII letters "BM")
    # must fall through to None, not parse garbage dimensions
    assert multimodal.parse_image_header(b"plain text payload" * 4) is None
    assert multimodal.parse_image_header(b"BMW dealerships report strong sales"
                                         b" this quarter across all regions") is None


def test_extract_metadata_decodes_real_png_payloads(spark):
    rows = [(1, _png_bytes(5, 9)), (2, _jpeg_bytes(100, 200)),
            (3, b"not an image at all, just bytes")]
    df = spark.createDataFrame(rows, "key LONG, payload BINARY")
    got = {r["key"]: r for r in
           multimodal.extract_image_metadata(df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("png", 5, 9)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("jpeg", 100, 200)
    import hashlib
    assert got[3]["payload_sha256"] == hashlib.sha256(rows[2][1]).hexdigest()


def test_multimodal_metadata_pipeline(spark, tables):
    import hashlib

    payloads = multimodal.attach_binary_payload(tables["documents"].limit(20))
    meta = multimodal.extract_image_metadata(payloads).collect()
    assert len(meta) == 20
    src = {r["key"]: bytes(r["payload"]) for r in payloads.collect()}
    for r in meta:
        assert r["n_bytes"] == len(src[r["key"]])
        assert r["payload_sha256"] == hashlib.sha256(src[r["key"]]).hexdigest()
        assert r["format"] in ("jpeg", "png", "webp")
        assert r["width"] >= 64 and r["height"] >= 64


def test_multimodal_frame_sampling(spark, tables):
    payloads = multimodal.attach_binary_payload(tables["documents"].limit(10))
    frames = multimodal.sample_frames(payloads, every_n_bytes=64, max_frames=4)
    rows = frames.collect()
    assert 10 <= len(rows) <= 40
    for r in rows:
        assert 0 <= r["frame_idx"] < 4
        assert len(bytes(r["frame_bytes"])) <= 64


def test_custom_decode_fn_plugs_in(spark, tables):
    payloads = multimodal.attach_binary_payload(tables["documents"].limit(5))

    def decoder(b: bytes):
        return ("tiff", 1, 2)

    meta = multimodal.extract_image_metadata(payloads, decode_fn=decoder).collect()
    assert all(r["format"] == "tiff" and r["width"] == 1 for r in meta)


def test_multimodal_resize_plumbing(spark, tables):
    payloads = multimodal.attach_binary_payload(tables["documents"].limit(20))
    out = multimodal.resize_images(payloads, width=8, height=6)
    rows = out.collect()
    assert len(rows) == 20
    assert out.columns == ["key", "width", "height", "pixels"]
    for r in rows:
        assert (r.width, r.height) == (8, 6)
        assert len(r.pixels) == 8 * 6  # size-exact grayscale stand-in
    # deterministic across runs/partitionings
    again = {r.key: bytes(r.pixels)
             for r in multimodal.resize_images(
                 payloads.repartition(7), width=8, height=6).collect()}
    assert {r.key: bytes(r.pixels) for r in rows} == again
    # the real-resizer seam
    custom = multimodal.resize_images(
        payloads, width=2, height=2,
        resize_fn=lambda p, w, h: bytes([len(p) % 256] * (w * h)))
    assert all(len(r.pixels) == 4 for r in custom.collect())


def test_multimodal_feature_extraction_feeds_similarity(spark, tables):
    payloads = multimodal.attach_binary_payload(tables["documents"].limit(30))
    feats = multimodal.extract_features(payloads, dim=16)
    rows = feats.collect()
    assert len(rows) == 30 and all(len(r.features) == 16 for r in rows)
    for r in rows:  # unit-normalized
        assert abs(sum(x * x for x in r.features) - 1.0) < 1e-5
    # output schema composes with the similarity operators as-is
    emb = feats.select(F.col("key").alias("vec_id"),
                       F.col("features").alias("embedding"))
    queries = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    top = similarity.brute_force_topk(emb, queries, k=3)
    got = top.collect()
    assert len(got) == 6
    self_hits = {r.query_id for r in got if r.query_id == r.vec_id and r.rank == 1}
    assert len(self_hits) == 2  # each query's nearest neighbour is itself


def test_fused_resize_and_features_matches_unfused(spark, tables):
    # the r12 fused pass (one decode per payload) must be BIT-identical
    # to composing resize_images + extract_features, on every branch:
    # real decodes (synthetic PNGs), unrecognized containers (raw text
    # payloads → deterministic fakes), and corrupt-but-recognized blobs
    # (truncated PNG → per-payload ValueError capture → fakes)
    docs = tables["documents"].limit(12)
    real = multimodal.attach_synthetic_image_payload(docs)
    fake = multimodal.attach_binary_payload(docs)
    png = bytes(real.orderBy("key").first()["payload"])
    corrupt = spark.createDataFrame(
        [(10_001, png[:60]), (10_002, b"\x89PNG\r\n\x1a\nnonsense")],
        "key bigint, payload binary")
    for payloads in (real, fake, corrupt):
        fused = {r.key: r for r in multimodal.resize_and_features(
            payloads, 16, 8, dim=24).collect()}
        pix = {r.key: r for r in multimodal.resize_images(
            payloads, width=16, height=8).collect()}
        feats = {r.key: r for r in multimodal.extract_features(
            payloads, dim=24).collect()}
        assert fused.keys() == pix.keys() == feats.keys()
        for k, r in fused.items():
            assert (r.width, r.height) == (16, 8)
            assert bytes(r.pixels) == bytes(pix[k].pixels)
            assert r.features == feats[k].features  # float32 bit-equal


def test_bpe_token_count_segmentation(spark):
    df = spark.createDataFrame(
        [(1, "Hello world"),            # 2 pre-tokens
         (2, "it's 2024, folks!"),      # it|'s| 2024|,| folks|! = 6
         (3, "a b c"),                  # 3
         (4, "price: $3.50"),           # price|:| $|3|.|50 = 6
         (5, "")],                      # 0
        "id bigint, text string")
    got = {r.id: r.n for r in df.select(
        "id", text.bpe_token_count(F.col("text")).alias("n")).collect()}
    assert got == {1: 2, 2: 6, 3: 3, 4: 6, 5: 0}, got
    # upper-bounds the plain word counter on punctuation-heavy text
    wc = {r.id: r.n for r in df.select(
        "id", text.token_count(F.col("text")).alias("n")).collect()}
    assert all(got[k] >= wc[k] for k in got)


def test_rolling_fingerprints_shared_passage_guarantee(spark):
    """Winnowing coverage: documents sharing a passage of length >=
    k + window - 1 must share at least one fingerprint; disjoint documents
    share none (up to xxhash64 collisions)."""
    passage = "the five boxing wizards jump quickly over the lazy dog tonight"
    rows = [
        (1, "intro text alpha. " + passage + " closing remarks one."),
        (2, "completely different opening, " + passage + " and another end."),
        (3, "no overlap here at all: just some plain filler sentences."),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    fp = text.rolling_fingerprints(df, k=25, window=16)
    sets = {i: {r.fingerprint for r in fp.filter(F.col("doc_id") == i).collect()}
            for i in (1, 2, 3)}
    assert sets[1] & sets[2], "shared passage must share a fingerprint"
    assert not (sets[1] & sets[3]) and not (sets[2] & sets[3])
    # deterministic across partitionings
    fp2 = text.rolling_fingerprints(df.repartition(5), k=25, window=16)
    assert {tuple(r) for r in fp.collect()} == {tuple(r) for r in fp2.collect()}
    # short documents (< k chars) still emit exactly one fingerprint
    tiny = spark.createDataFrame([(9, "tiny")], "doc_id bigint, text string")
    assert text.rolling_fingerprints(tiny).count() == 1


def test_shared_span_pairs_planted(spark):
    """The pair detector composed on winnowing: docs sharing a passage
    >= k + window - 1 chars pair up; disjoint docs do not; boilerplate
    prints past max_print_docs are excluded, not paired on."""
    passage = ("the five boxing wizards jump quickly over the lazy dog "
               "tonight while the quick brown fox naps by the fire")
    rows = [
        (1, "intro text alpha. " + passage + " closing remarks one."),
        (2, "completely different opening, " + passage + " and another end."),
        (3, "no overlap here at all: just some plain filler sentences."),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    pairs = {(r.doc_a, r.doc_b): r.shared_prints
             for r in text.shared_span_pairs(df, min_shared=1).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert not any(3 in p for p in pairs)
    # determinism across partitionings
    p2 = {(r.doc_a, r.doc_b): r.shared_prints
          for r in text.shared_span_pairs(df.repartition(7),
                                          min_shared=1).collect()}
    assert pairs == p2
    # boilerplate exclusion: the same banner in EVERY doc of a 12-doc
    # corpus is df=12 > max_print_docs=10 -> its prints pair nobody
    banner = "generated by the exporter tool v2. all rights reserved. " * 2
    # tails diverge at the FIRST char (a k-gram crossing the banner/tail
    # boundary differs per doc), so every shared print sits fully inside
    # the banner with df = 12
    many = spark.createDataFrame(
        [(i, banner + "abcdefghijkl"[i] * 30 + f" trailing text {i}")
         for i in range(12)],
        "doc_id bigint, text string")
    assert text.shared_span_pairs(many, min_shared=1,
                                  max_print_docs=10).count() == 0
    # ...but with the cap lifted the banner-sharing pairs appear
    assert text.shared_span_pairs(many, min_shared=1,
                                  max_print_docs=100).count() > 0


def test_rolling_fingerprints_select_full_windows_only(spark):
    """The emitted set must equal distinct minima over FULL windows of the
    k-gram hash sequence (truncated trailing windows once made the final
    k-gram an unconditional fingerprint, pairing any two documents that
    share a mere k-char suffix)."""
    k, window = 5, 4
    body = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame([(1, body)], "doc_id bigint, text string")
    got = {r.fingerprint for r in
           text.rolling_fingerprints(df, k=k, window=window).collect()}
    # replay: same normalization + same xxhash64 via Spark expressions,
    # full-window minima computed in plain Python
    norm = body.lower()
    grams = [norm[i:i + k] for i in range(len(norm) - k + 1)]
    hdf = spark.createDataFrame([(g,) for g in grams], "g string")
    hmap = {r.g: r.h for r in hdf.select("g", F.xxhash64("g").alias("h")).collect()}
    hs = [hmap[g] for g in grams]
    expect = {min(hs[i:i + window]) for i in range(len(hs) - window + 1)}
    assert got == expect
    # a doc with fewer grams than the window emits its single global min
    short = spark.createDataFrame([(2, norm[:k + 1])], "doc_id bigint, text string")
    sgrams = [norm[:k + 1][i:i + k] for i in range(2)]
    sh = {r.g: r.h for r in spark.createDataFrame([(g,) for g in sgrams], "g string")
          .select("g", F.xxhash64("g").alias("h")).collect()}
    srows = text.rolling_fingerprints(short, k=k, window=window).collect()
    assert {r.fingerprint for r in srows} == {min(sh[g] for g in sgrams)}


def test_embedding_neardup_hot_bucket_star_cap(spark):
    """A degenerate class of identical vectors must produce O(n) star pairs
    (hub = min key x each other member), not C(n,2) — the same bounded-
    output contract as the text dedup family."""
    import math

    n = 40
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(n)]
    rows.append((1000, [-1.0, 5.0, -3.0, 2.0]))  # other bucket, no pair
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    capped = dedup.embedding_neardup_pairs(df, threshold=0.99,
                                           max_bucket_size=10)
    got = sorted((r.vec_a, r.vec_b) for r in capped.collect())
    assert got == [(0, i) for i in range(1, n)]  # star: hub 0 x 39 others
    full = dedup.embedding_neardup_pairs(df, threshold=0.99)
    assert full.count() == math.comb(n, 2)  # under the cap: all pairs


def test_quality_stopword_ratio_is_token_density(spark):
    """stopword_ratio must count stopword TOKEN OCCURRENCES over all
    tokens, not distinct stopwords present (which capped the numerator at
    the stopword-list size and inverted the score ordering with length)."""
    long_doc = "the cat and the dog and the bird in the house " * 50
    rows = [(1, long_doc), (2, "zzz qqq xxx the")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in text.quality_features(df).collect()}
    # 7 stopword tokens per 11-token repetition ("the" x4, "and" x2, "in")
    assert abs(out[1].stopword_ratio - 7 / 11) < 1e-4
    assert abs(out[2].stopword_ratio - 0.25) < 1e-6
    # the long fluent doc must now out-score the fragment
    assert out[1].quality_score > out[2].quality_score


def test_simhash_keeps_zero_token_docs(spark):
    df = spark.createDataFrame(
        [(1, "!!!"), (2, "..."), (3, "real words here")],
        "doc_id bigint, text string")
    sigs = {r.doc_id: r.simhash for r in dedup.simhash_signatures(df).collect()}
    assert set(sigs) == {1, 2, 3}          # nothing vanishes
    assert sigs[1] == sigs[2]              # degenerate docs pair up
    pairs = dedup.simhash_pairs(df, max_hamming=0).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}


def test_minhash_band_validation():
    import pytest as _pytest

    df = None  # never touched: validation fires before any plan is built
    with _pytest.raises(ValueError, match="divide"):
        dedup.minhash_lsh_pairs(df, num_hashes=8, bands=16)
    with _pytest.raises(ValueError, match="divide"):
        dedup.minhash_lsh_pairs(df, num_hashes=32, bands=5)


def test_multimodal_null_payloads_and_frame_tail(spark):
    from pyspark.sql import types as T

    rows = [(1, b"x" * 100), (2, None)]
    df = spark.createDataFrame(rows, T.StructType([
        T.StructField("key", T.LongType()),
        T.StructField("payload", T.BinaryType())]))
    meta = {r.key: r for r in multimodal.extract_image_metadata(df).collect()}
    assert meta[2].n_bytes == 0            # null flows through, no crash
    frames = multimodal.sample_frames(df, every_n_bytes=64).collect()
    by_key = {}
    for r in frames:
        by_key.setdefault(r.key, []).append(bytes(r.frame_bytes))
    # ceil division: the 36-byte tail after the first 64-byte stride emits
    assert len(by_key[1]) == 2 and len(by_key[1][1]) == 36
    # a null payload yields ZERO frames, not a phantom empty one
    assert 2 not in by_key


def test_jpeg_fill_bytes_before_sof(spark):
    import struct as _struct

    # SOI + fill bytes + SOF0 with dimensions 480x640
    sof = b"\xff\xc0" + _struct.pack(">H", 17) + b"\x08" + _struct.pack(">HH", 480, 640)
    data = b"\xff\xd8" + b"\xff\xff\xff" + sof + b"\x00" * 8
    assert multimodal.parse_image_header(data) == ("jpeg", 640, 480)


def test_unigram_logprob_planted(spark):
    """Hand-computed ground truth on a 3-doc corpus with an OOV boundary:
    vocab_size=2 keeps {'a','b'} (count desc, token asc tie-break), 'c' and
    'z' fall into the shared smoothed OOV bucket."""
    import math

    from datafusion_substrait_spark.operators.text import unigram_logprob

    rows = [(1, "a a b"), (2, "a b c"), (3, "z"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in unigram_logprob(
        df, vocab_size=2, alpha=1.0).collect()}

    # corpus counts: a=3, b=2, c=1, z=1 → N=7; vocab={a:3, b:2}, K=2
    denom = math.log(7 + 1.0 * (2 + 1))
    lp = {"a": math.log(4) - denom, "b": math.log(3) - denom,
          "oov": math.log(1) - denom}
    exp1 = round((2 * lp["a"] + lp["b"]) / 3, 6)
    exp2 = round((lp["a"] + lp["b"] + lp["oov"]) / 3, 6)
    exp3 = round(lp["oov"], 6)

    assert (out[1].n_tokens, out[1].mean_logprob) == (3, exp1)
    assert (out[2].n_tokens, out[2].mean_logprob) == (3, exp2)
    assert (out[3].n_tokens, out[3].mean_logprob) == (1, exp3)
    # zero-token doc keeps its row: n_tokens 0, NULL mean
    assert (out[4].n_tokens, out[4].mean_logprob) == (0, None)


def test_unigram_logprob_partitioning_invariant(spark):
    """Same result whatever the input partitioning (the vocab top-K
    tie-break and the rounded mean are deterministic)."""
    from datafusion_substrait_spark.operators.text import unigram_logprob

    docs = spark.table("documents")
    a = sorted(map(tuple, unigram_logprob(docs, vocab_size=50).collect()))
    b = sorted(map(tuple, unigram_logprob(
        docs.repartition(7), vocab_size=50).collect()))
    assert a == b


# --- review-fix regressions: ANSI safety and NULL/degenerate handling -------


def test_quality_features_survives_degenerate_docs(spark):
    """Spark 4 defaults ANSI mode ON: unguarded x/0 on zero-token ('???')
    or empty ('') docs aborted the whole job with DIVIDE_BY_ZERO."""
    rows = [(1, "a normal doc with words"), (2, ""), (3, "???!!!")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in text.quality_features(df).collect()}
    assert out[1].quality_score > 0
    assert out[2].quality_score == 0.0 and out[2].mean_token_len is None
    assert out[3].quality_score == 0.0 and out[3].stopword_ratio is None
    assert out[3].punct_ratio is not None  # has chars, just no tokens


def test_gopher_quality_flags_planted_rules(spark):
    """Each Gopher rule fires on a doc PLANTED to violate exactly it, a
    clean doc passes all four, and empty/NULL docs are unflagged with
    NULL ratios (no evidence ⇒ no flag)."""
    df = spark.createDataFrame([
        (0, "a normal sentence with plain words written here"),
        (1, "# # # # spam tags and markers # # #"),
        (2, "• one thing\n• two things\n• three things\n• four things"),
        (3, "cut off preview...\nanother teaser...\nmore of it..."),
        (4, "12 34 56 78 90 11 22 33"),
        (5, ""),
        (6, None),
    ], "doc_id bigint, text string")
    out = {r.doc_id: r for r in text.gopher_quality_flags(df).collect()}
    assert out[0].gopher_flagged is False
    assert out[1].gopher_flagged and out[1].symbol_word_ratio > 0.1
    assert out[2].gopher_flagged and out[2].bullet_line_frac == 1.0
    assert out[3].gopher_flagged and out[3].ellipsis_line_frac == 1.0
    assert out[4].gopher_flagged and out[4].alpha_word_frac == 0.0
    for d in (5, 6):
        assert out[d].gopher_flagged is False
        assert out[d].symbol_word_ratio is None
        assert out[d].bullet_line_frac is None


def test_gopher_flags_match_duckdb_replay(spark, tables):
    """Full cross-engine replay on the real documents table — same
    tokenizer, same non-overlapping regexp counts, same trimmed
    non-empty-line rules, 6dp rounding."""
    import os

    import duckdb

    from tests.conftest import SF_DIR

    toks = ("list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
            " x -> x <> '')")
    chunks = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
    lines = ("list_filter(list_transform(string_split(text, chr(10)),"
             " l -> trim(l)), l -> l <> '')")
    pq = os.path.join(SF_DIR, "documents.parquet")
    want = sorted(duckdb.sql(f"""
        WITH b AS (
            SELECT doc_id,
                   CAST(len({toks}) AS DOUBLE) AS nw,
                   CAST(len(regexp_extract_all(text, '#'))
                        + len(regexp_extract_all(text, '\\.\\.\\.'))
                        + len(regexp_extract_all(text, '…')) AS DOUBLE) AS ns,
                   CAST(len({chunks}) AS DOUBLE) AS nc,
                   CAST(len(list_filter({chunks},
                        x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) AS na,
                   CAST(len({lines}) AS DOUBLE) AS nl,
                   CAST(len(list_filter({lines},
                        l -> regexp_matches(l, '^[•\\-\\*]'))) AS DOUBLE) AS nb,
                   CAST(len(list_filter({lines},
                        l -> regexp_matches(l, '(\\.\\.\\.|…)$'))) AS DOUBLE) AS ne
            FROM read_parquet('{pq}')
        ), r AS (
            SELECT doc_id,
                   CASE WHEN nw = 0 THEN NULL ELSE round(ns / nw, 6) END AS swr,
                   CASE WHEN nc = 0 THEN NULL ELSE round(na / nc, 6) END AS awf,
                   CASE WHEN nl = 0 THEN NULL ELSE round(nb / nl, 6) END AS blf,
                   CASE WHEN nl = 0 THEN NULL ELSE round(ne / nl, 6) END AS elf
            FROM b
        )
        SELECT doc_id, swr, awf, blf, elf,
               coalesce(swr > 0.1, false) OR coalesce(awf < 0.8, false)
               OR coalesce(blf > 0.9, false) OR coalesce(elf > 0.3, false)
        FROM r
    """).fetchall())
    got = sorted(map(tuple,
                     text.gopher_quality_flags(tables["documents"]).collect()))
    assert got == want and got


def test_remove_repeated_lines_planted_and_replay(spark, tables):
    """First occurrence survives, later re-occurrences (case/space
    variants included) drop, empty lines always keep, NULL text passes
    through; plus a DuckDB replay over real documents with planted
    repeats appended."""
    import os

    import duckdb

    from tests.conftest import SF_DIR

    df = spark.createDataFrame([
        (0, "a\nb\na\nA \nc\n\nb"),
        (1, "only one line"),
        (2, ""),
        (3, None),
        (4, "x\n\n\nx"),
    ], "doc_id bigint, text string")
    out = {r.doc_id: (r.text, r.n_lines_kept, r.n_lines_dropped)
           for r in text.remove_repeated_lines(df).collect()}
    # 'a' repeat, its 'A ' case/space variant, and the second 'b' all
    # drop; the empty line is structure and stays
    assert out[0] == ("a\nb\nc\n", 4, 3)
    assert out[1] == ("only one line", 1, 0)
    assert out[2] == ("", 1, 0)           # single empty line kept
    assert out[3] == (None, None, None)
    assert out[4] == ("x\n\n", 3, 1)      # empties kept, repeat dropped

    pq = os.path.join(SF_DIR, "documents.parquet")
    planted = (f"SELECT doc_id, text FROM read_parquet('{pq}') "
               "UNION ALL VALUES (200001, 'p\nq\np\nq\nr'), "
               "(200002, 'same\nSAME\n same \nnew')")
    want = sorted(duckdb.sql(f"""
        WITH src AS ({planted}), l AS (
            SELECT doc_id, string_split(text, chr(10)) AS ls FROM src
        ), e AS (
            SELECT doc_id, t.i AS i, ls[t.i] AS ln,
                   lower(trim(ls[t.i])) AS nl,
                   list_transform(ls, x -> lower(trim(x))) AS nls
            FROM l, unnest(range(1, len(ls) + 1)) AS t(i)
        ), k AS (
            SELECT doc_id, i, ln,
                   (nl = '' OR list_position(nls, nl) = i) AS keep
            FROM e
        )
        SELECT doc_id,
               coalesce(string_agg(ln, chr(10) ORDER BY i)
                        FILTER (WHERE keep), '') AS text,
               CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_lines_kept,
               CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT)
                   AS n_lines_dropped
        FROM k GROUP BY doc_id
    """).fetchall())
    docs = tables["documents"].select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(200001, "p\nq\np\nq\nr"), (200002, "same\nSAME\n same \nnew")],
            "doc_id bigint, text string"))
    got = sorted(map(tuple, text.remove_repeated_lines(docs).collect()))
    assert got == want and got
    plan = text.remove_repeated_lines(
        tables["documents"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # row-local: NO shuffle at all


def test_strip_markup_planted(spark):
    """Tag/block/entity semantics pinned on planted HTML: blocks go WITH
    contents, tags become word boundaries, &amp; decodes LAST, NULL
    passes through."""
    df = spark.createDataFrame([
        (0, "<html><body><p>Hello <b>world</b></p>"
            "<script type='t'>var x = '<p>no</p>';</script>"
            "<style>p { color: red }</style>"
            "<!-- secret <b>comment</b> -->Tom &amp; Jerry &lt;3</body></html>"),
        (1, "a<br>b"),
        (2, "plain text, no markup"),
        (3, "&amp;lt; stays a literal &lt;"),   # no double decode
        (4, "math: 1 < 2 and 3 > 2"),            # lone < > untouched
        (5, None),
    ], "doc_id bigint, text string")
    out = {r.doc_id: (r.text, r.n_tags)
           for r in text.strip_markup(df).collect()}
    assert out[0] == ("Hello world Tom & Jerry <3", 8)
    assert out[1] == ("a b", 1)
    assert out[2] == ("plain text, no markup", 0)
    assert out[3] == ("&lt; stays a literal <", 0)
    assert out[4] == ("math: 1 < 2 and 3 > 2", 0)
    assert out[5] == (None, None)


def test_strip_markup_matches_duckdb_replay(spark, tables):
    """Cross-engine replay on the real documents table plus planted HTML
    rows appended via a view — every regex lives in the Java∩RE2 subset
    and entity decodes are literal replaces on both engines."""
    import os

    import duckdb

    from tests.conftest import SF_DIR

    pq = os.path.join(SF_DIR, "documents.parquet")
    planted = ("SELECT doc_id, text FROM read_parquet('{pq}') "
               "UNION ALL VALUES (100001, '<p>x &amp; y</p><br/>'), "
               "(100002, '<script>junk</script>keep<!-- c -->me')"
               ).format(pq=pq)
    want = sorted(duckdb.sql(f"""
        WITH src AS ({planted}), s1 AS (
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '(?is)<script[^>]*>.*?</script\\s*>', ' ', 'g'),
                       '(?is)<style[^>]*>.*?</style\\s*>', ' ', 'g'),
                       '(?s)<!--.*?-->', ' ', 'g') AS t
            FROM src
        ), s2 AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t, '<[/!]?[a-zA-Z][^>]*>'))
                       AS INT) AS n_tags,
                   replace(replace(replace(replace(replace(replace(
                       regexp_replace(t, '<[/!]?[a-zA-Z][^>]*>', ' ', 'g'),
                       '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                       '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS t
            FROM s1
        )
        SELECT doc_id, trim(regexp_replace(t, '\\s+', ' ', 'g')) AS text,
               n_tags
        FROM s2
    """).fetchall())
    docs = tables["documents"].select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(100001, "<p>x &amp; y</p><br/>"),
             (100002, "<script>junk</script>keep<!-- c -->me")],
            "doc_id bigint, text string"))
    got = sorted(map(tuple, text.strip_markup(docs).collect()))
    assert got == want and got


def test_bigram_logprob_matches_duckdb_replay(spark, tables):
    """Full cross-engine replay at vocab_size=200 (OOV path carries real
    weight): same vocab tie-break, same OOV mapping, same add-1
    conditional smoothing, 6dp-rounded means."""
    import os

    import duckdb

    from tests.conftest import SF_DIR

    toks = ("list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
            " x -> x <> '')")
    pq = os.path.join(SF_DIR, "documents.parquet")
    want = sorted(duckdb.sql(f"""
        WITH tok AS (
            SELECT doc_id, t.i AS pos, ts[t.i] AS w0
            FROM (SELECT doc_id, {toks} AS ts FROM read_parquet('{pq}')),
                 unnest(range(1, len(ts) + 1)) AS t(i)
        ), counts AS (SELECT w0, count(*) AS c FROM tok GROUP BY w0),
        vocab AS (SELECT w0 FROM counts ORDER BY c DESC, w0 LIMIT 200),
        mapped AS (
            SELECT doc_id, pos,
                   CASE WHEN v.w0 IS NULL THEN '<oov>' ELSE tok.w0 END AS w
            FROM tok LEFT JOIN vocab v USING (w0)
        ), bg AS (
            SELECT doc_id, w,
                   lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM mapped QUALIFY prev IS NOT NULL
        ), c2 AS (SELECT prev, w, count(*) AS c2 FROM bg GROUP BY prev, w),
        c1 AS (SELECT prev, sum(c2) AS c1 FROM c2 GROUP BY prev),
        vs AS (SELECT count(*) + 1 AS v FROM vocab),
        lp AS (
            SELECT doc_id, ln(c2.c2 + 1.0) - ln(c1.c1 + 1.0 * vs.v) AS lp
            FROM bg JOIN c2 USING (prev, w) JOIN c1 USING (prev), vs
        ), pd AS (
            SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(lp), 6) AS mean_logprob
            FROM lp GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(pd.n_bigrams, 0) AS n_bigrams,
               pd.mean_logprob
        FROM read_parquet('{pq}') d LEFT JOIN pd USING (doc_id)
    """).fetchall())
    got = sorted(map(tuple, text.bigram_logprob(
        tables["documents"], vocab_size=200).collect()))
    assert got == want and got


def test_bigram_logprob_orders_fluency(spark):
    """Word ORDER must matter: under a corpus of consistent 'a b c d'
    sentences, the in-order doc outscores the same bag of words
    scrambled — exactly what unigram_logprob cannot see — and sub-2-token
    docs keep a (0, NULL) row."""
    rows = [(i, "a b c d a b c d a b c d") for i in range(10)]
    rows += [(100, "a b c d"), (101, "d b a c"), (102, "a"), (103, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in text.bigram_logprob(df, vocab_size=10).collect()}
    assert out[100].mean_logprob > out[101].mean_logprob
    u = {r.doc_id: r for r in text.unigram_logprob(df, vocab_size=10).collect()}
    assert u[100].mean_logprob == u[101].mean_logprob  # unigram is blind
    assert (out[102].n_bigrams, out[102].mean_logprob) == (0, None)
    assert (out[103].n_bigrams, out[103].mean_logprob) == (0, None)


def test_strip_markup_random_battery(spark):
    """Seeded random + adversarial fragment battery, one Spark job:
    output is always whitespace-collapsed and trimmed, and for inputs
    with no entities, no tag-shaped substring survives. (Entity-encoded
    tags like &lt;p&gt; legitimately DECODE to tag-shaped text — they
    were displayed text, not markup — so the no-tag property is scoped
    to entity-free inputs.)"""
    import random
    import re

    rnd = random.Random(8)
    alphabet = "abc <>/&;!#\"'=\n\t.ampltgqu;Nox-"
    rows = [(i, "".join(rnd.choice(alphabet)
                        for _ in range(rnd.randrange(0, 120))))
            for i in range(300)]
    rows += list(enumerate([
        "<script>", "</script>", "<script>a", "<sc<script>ript>x</script>",
        "<p", "p>", "<>", "< p >", "<1tag>", "<a b=c>", "&amp;",
        "&amp;amp;", "<style>x", "<!--", "-->", "<!-- <script> -->",
        "<a\nhref=x>line</a>", "<SCRIPT>UPPER</SCRIPT>done",
        "a<b>b</b>c", "&lt;p&gt;",
    ], start=1000))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = text.strip_markup(df).collect()
    tag = re.compile(r"<[/!]?[a-zA-Z][^>]*>")
    src = dict(rows)
    for r in out:
        assert r.text == r.text.strip() and "  " not in r.text, r
        assert "\n" not in r.text and "\t" not in r.text, r
        if "&" not in src[r.doc_id]:
            assert not tag.search(r.text), (r.doc_id, src[r.doc_id], r.text)
        assert r.n_tags >= 0
    # determinism across partitionings
    a = sorted(map(tuple, text.strip_markup(df.repartition(1)).collect()))
    b = sorted(map(tuple, text.strip_markup(df.repartition(7)).collect()))
    assert a == b


def test_cosine_zero_vector_is_null_not_crash(spark):
    from datafusion_substrait_spark.operators import similarity

    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    pairs = dedup.embedding_neardup_pairs(df, threshold=0.9, planes=4)
    got = {(r.vec_a, r.vec_b) for r in pairs.collect()}
    assert (1, 3) in got           # real duplicates still found
    assert all(2 not in p for p in got)  # zero vector matches nothing
    qs = df.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding")
    topk = similarity.brute_force_topk(df, qs, k=3).collect()
    assert all(r.vec_id != 2 for r in topk if r.cosine is not None)


def test_streaming_dedup_fingerprint_is_null_safe(spark):
    """concat_ws skips NULLs: (1, NULL) and (NULL, '1') used to collide on
    one fingerprint and the second event was dropped as a duplicate."""
    from datafusion_substrait_spark.streaming import stateful

    rows = [(10, 1, None, 1.0), (11, None, "1", 2.0)]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, value double")
    out = stateful.streaming_exact_dedup(df).collect()
    assert len(out) == 2  # distinct keys, both survive


def test_asof_join_ignores_null_right_timestamps(spark):
    from datafusion_substrait_spark.operators import temporal

    left = spark.createDataFrame([(1, 100, "l0")], "k bigint, ts bigint, lv string")
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, 500, 1.0)],
        "k bigint, ts bigint, rv double")
    out = temporal.asof_join(left, right, on="k", ts_col="ts",
                             right_cols=["rv"]).collect()
    # no right row at/before ts=100 → NULL match, not the NULL-ts payload
    assert len(out) == 1 and out[0].ts_r is None and out[0].rv_r is None


def test_repetition_features_keeps_zero_token_docs(spark):
    rows = [(1, "a a b"), (2, "???")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in text.repetition_features(df).collect()}
    assert out[1].n_tokens == 3
    assert out[2].n_tokens == 0 and out[2].top_token_frac is None


def test_ngram_jaccard_null_bucket_pairs(spark):
    rows = [(1, "the quick brown fox jumps", None),
            (2, "the quick brown fox jumps", None)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    pairs = dedup.ngram_jaccard_pairs(df, threshold=0.5).collect()
    assert [(p.doc_a, p.doc_b) for p in pairs] == [(1, 2)]


def test_bmp_core_header_dimensions(spark):
    import struct as _struct

    # BITMAPCOREHEADER: 16-bit unsigned w/h at offsets 18/20
    core = (b"BM" + b"\x00" * 12 + _struct.pack("<I", 12)
            + _struct.pack("<HH", 100, 50) + _struct.pack("<HH", 1, 24))
    assert multimodal.parse_image_header(core) == ("bmp", 100, 50)
    # the 40-byte header path still parses 32-bit fields
    info = (b"BM" + b"\x00" * 12 + _struct.pack("<I", 40)
            + _struct.pack("<ii", 640, -480) + b"\x00" * 8)
    assert multimodal.parse_image_header(info) == ("bmp", 640, 480)


def test_hash_sample_keeps_null_keys_at_full_rate(spark):
    """md5(NULL) is NULL: a bare cast silently dropped every NULL-keyed row
    at ANY rate, even 1.0 — the null-safe sentinel keys them as one group."""
    from datafusion_substrait_spark.operators import sampling

    df = spark.createDataFrame([("k1",), (None,)], "k string")
    assert sampling.hash_sample(df, "k", 1.0).count() == 2
    assert sampling.hash_sample(df, "k", 0.0).count() == 0
    # NULL keys get one shared decision — partitioning-independent
    n = sampling.hash_sample(df, "k", 0.5).filter(F.col("k").isNull()).count()
    assert n in (0, 1)


def test_decontaminate_ignores_tokenless_texts(spark):
    """The short-doc fallback gram of a zero-token text is '' — one
    punctuation-only benchmark row must not delete every token-less corpus
    document (all-CJK docs under the ascii tokenizer, etc.)."""
    from datafusion_substrait_spark.operators import contamination

    docs = spark.createDataFrame(
        [(1, "???"), (2, "hello world how are you today friend")],
        "doc_id bigint, text string")
    bench = spark.createDataFrame([(10, "!!!")], "bench_id bigint, text string")
    kept = contamination.decontaminate(docs, bench, n=5)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2]
    # genuine short exact-text contamination still matches
    bench2 = spark.createDataFrame(
        [(11, "hello world how are you today friend")],
        "bench_id bigint, text string")
    kept2 = contamination.decontaminate(docs, bench2, n=5)
    assert sorted(r.doc_id for r in kept2.collect()) == [1]


def test_ngram_overlap_rejects_same_key_names(spark, tables):
    from datafusion_substrait_spark.operators import contamination

    with pytest.raises(ValueError, match="distinct names"):
        contamination.ngram_overlap(
            tables["documents"], tables["documents"],
            key_col="doc_id", bench_key_col="doc_id")


def test_ivf_partitioned_layout_prunes_and_matches(spark, tables, tmp_path):
    """write_ivf_partitioned + ivf_topk_partitioned: identical results to
    the in-memory ivf_topk, and the scan proves partition pruning — only
    the probed cells' directories are read."""
    import os

    cents = similarity.deterministic_centroids(8, 64)
    path = os.path.join(tmp_path, "ivf")
    emb = tables["embeddings"].select("vec_id", "embedding")
    similarity.write_ivf_partitioned(emb, path, cents)
    assert any(d.startswith("cell_id=") for d in os.listdir(path))

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.ivf_topk_partitioned(
        path, queries, cents, k=5, nprobe=3)
    expect = similarity.ivf_topk(emb, queries, k=5, centroids=cents, nprobe=3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, expect.collect()))

    # the partition filter reaches the scan: PartitionFilters on cell_id
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in phys and "cell_id" in phys.split(
        "PartitionFilters", 1)[1][:200], phys[:800]


def test_ivf_partitioned_quantized_prunes_and_recalls(spark, tables,
                                                      tmp_path):
    """The composed 100 TB serving layout (r7 VERDICT directive): int8
    cells on disk + dequantize at probe. Partition pruning must survive
    the quantized schema, the stored vectors must be tinyint (the 4×
    byte cut is the point), and recall@10 vs the FLOAT IVF must be
    ≥ 0.9 on the real embeddings table."""
    import os

    cents = similarity.deterministic_centroids(8, 64)
    path = os.path.join(tmp_path, "ivfq")
    emb = tables["embeddings"].select("vec_id", "embedding")
    similarity.write_ivf_partitioned_quantized(emb, path, cents)
    assert any(d.startswith("cell_id=") for d in os.listdir(path))
    stored = spark.read.parquet(path)
    assert dict(stored.dtypes)["qvec"] == "array<tinyint>"

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.ivf_topk_partitioned_quantized(
        path, queries, cents, k=10, nprobe=3)
    got = out.collect()
    flt = similarity.ivf_topk(emb, queries, k=10, centroids=cents,
                              nprobe=3).collect()
    for qid in range(5):
        f = {r.vec_id for r in flt if r.query_id == qid}
        g = {r.vec_id for r in got if r.query_id == qid}
        assert len(f & g) >= 9, (qid, f, g)

    # partition pruning reaches the quantized scan too
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in phys and "cell_id" in phys.split(
        "PartitionFilters", 1)[1][:200], phys[:800]
    # quantization must not change CELL MEMBERSHIP (assignment ran on the
    # float vectors): every stored key's cell equals the float assignment
    a = {r.vec_id: r.cell_id for r in stored.select(
        "vec_id", "cell_id").collect()}
    b = {r.vec_id: r.cell for r in similarity.assign_cells(
        emb, cents).select("vec_id", "cell").collect()}
    assert a == b


# --- real PNG pixel decode ---------------------------------------------------

def _filter_row(ftype: int, cur: list[int], prev: list[int],
                bpp: int) -> bytes:
    """FORWARD scanline filtering per the PNG spec (RFC 2083 §6) — an
    independent implementation in the test, so decode_png is checked
    against the spec, not against itself."""
    out = [ftype]
    for x in range(len(cur)):
        a = cur[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            v = cur[x]
        elif ftype == 1:
            v = cur[x] - a
        elif ftype == 2:
            v = cur[x] - b
        elif ftype == 3:
            v = cur[x] - ((a + b) >> 1)
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = cur[x] - pred
        out.append(v & 255)
    return bytes(out)


def _encode_png(pixels, ctype: int, filters, palette: bytes = b"") -> bytes:
    """Minimal spec-following PNG encoder for fixtures: ``pixels`` is a
    list of rows of per-byte samples, one chosen filter type per row."""
    import struct
    import zlib

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    h, w = len(pixels), len(pixels[0]) // channels
    raw = b""
    prev = [0] * (w * channels)
    for row, ft in zip(pixels, filters):
        raw += _filter_row(ft, row, prev, channels)
        prev = row
    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)))
    if palette:
        png += chunk(b"PLTE", palette)
    return png + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_decode_png_all_filters_and_color_types():
    """decode_png must invert every scanline filter for gray/RGB/RGBA —
    pixel data is pseudo-random (deterministic), filters vary per row."""
    import numpy as np

    for ctype, channels in ((0, 1), (2, 3), (4, 2), (6, 4)):
        w, h = 7, 5
        vals = [(i * 89 + r * 31 + ctype * 7) % 256
                for r in range(h) for i in range(w * channels)]
        rows = [vals[r * w * channels:(r + 1) * w * channels]
                for r in range(h)]
        filters = [0, 1, 2, 3, 4]
        img = multimodal.decode_png(_encode_png(rows, ctype, filters))
        assert img.shape == (h, w, channels)
        assert img.tolist() == np.array(rows, np.uint8).reshape(
            h, w, channels).tolist(), f"ctype {ctype}"


def test_decode_png_palette_and_fixture():
    # palette: 3 indexed colors expanded to RGB
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    rows = [[0, 1, 2], [2, 1, 0]]
    img = multimodal.decode_png(_encode_png(rows, 3, [0, 4], palette=pal))
    assert img.shape == (2, 3, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[1, 0].tolist() == [0, 0, 255]
    # the in-repo fixture: solid opaque black RGBA
    img = multimodal.decode_png(_png_bytes(4, 3))
    assert img.shape == (3, 4, 4)
    assert img.reshape(-1, 4).tolist() == [[0, 0, 0, 255]] * 12
    # decode_image dispatch: PNG → array; a recognized-but-scanless JPEG
    # header fixture raises (real decoder), arbitrary bytes → None
    assert multimodal.decode_image(_png_bytes(2, 2)) is not None
    with pytest.raises(ValueError):
        multimodal.decode_image(_jpeg_bytes(4, 4))
    assert multimodal.decode_image(b"not an image at all") is None


def test_decode_png_rejects_malformed():
    with pytest.raises(ValueError, match="signature"):
        multimodal.decode_png(b"not a png at all")
    good = _png_bytes(2, 2)
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a byte of IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        multimodal.decode_png(bytes(bad_crc))
    import struct
    import zlib

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    interlaced = (b"\x89PNG\r\n\x1a\n"
                  + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1))
                  + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
                  + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlac"):
        multimodal.decode_png(interlaced)


def test_resize_images_real_png_path(spark):
    """PNG payloads ride the REAL decode→gray→resample path: a solid-color
    PNG must resize to a constant gray buffer (the fake would be
    hash-noise), deterministically across partitionings."""
    import struct
    import zlib

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    # 6x4 solid mid-gray RGB PNG
    row = [120, 120, 120] * 6
    png = _encode_png([row] * 4, 2, [0, 2, 1, 4])
    rows = [(1, png), (2, _jpeg_bytes(10, 10))]
    df = spark.createDataFrame(rows, "key bigint, payload binary")
    out = {r.key: bytes(r.pixels)
           for r in multimodal.resize_images(df, width=3, height=2).collect()}
    assert out[1] == bytes([120] * 6)          # real pixels, not hash noise
    assert len(out[2]) == 6                    # non-PNG: fake fallback
    again = {r.key: bytes(r.pixels)
             for r in multimodal.resize_images(
                 df.repartition(5), width=3, height=2).collect()}
    assert out == again


# --- real GIF / BMP pixel decode ---------------------------------------------

def _gif_lzw_encode(mcs: int, indices) -> bytes:
    """Independent spec-following GIF LZW COMPRESSOR (mirrors the giflib
    egif emitter: variable-width codes LSB-first, width bumped AFTER
    emitting when the pre-insert free code reaches 2^width, dictionary
    capped at 4096) — so decode_gif is checked against the spec, not
    against itself."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width, next_code = mcs + 1, eoi + 1
    table = {(i,): i for i in range(clear)}
    out = bytearray()
    acc = nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 255)
            acc >>= 8
            nbits -= 8

    emit(clear)
    buf: tuple = ()
    for px in indices:
        cand = buf + (int(px),)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
        buf = (int(px),)
    if buf:
        emit(table[buf])
    emit(eoi)
    if nbits:
        out.append(acc & 255)
    return bytes(out)


def _encode_gif(indices_2d, palette: list[tuple], mcs: int = None,
                interlace: bool = False, local_table: bool = False) -> bytes:
    """Minimal GIF89a writer for fixtures: one image, optional interlace
    and local-vs-global color table placement."""
    import struct

    h, w = len(indices_2d), len(indices_2d[0])
    n = len(palette)
    size_field = max(1, (n - 1).bit_length()) - 1  # table holds 2<<field
    mcs = mcs or max(2, size_field + 1)
    table_bytes = b"".join(bytes(c) for c in palette)
    table_bytes += b"\x00" * (3 * (2 << size_field) - len(table_bytes))

    flat = [px for row in indices_2d for px in row]
    if interlace:
        order = ([*range(0, h, 8)] + [*range(4, h, 8)]
                 + [*range(2, h, 4)] + [*range(1, h, 2)])
        flat = [px for y in order for px in indices_2d[y]]
    lzw = _gif_lzw_encode(mcs, flat)
    sub = b"".join(
        bytes([min(255, len(lzw) - i)]) + lzw[i:i + 255]
        for i in range(0, len(lzw), 255)
    ) + b"\x00"

    gct_flag = 0x00 if local_table else (0x80 | size_field)
    out = (b"GIF89a" + struct.pack("<HH", w, h)
           + bytes([gct_flag, 0, 0]))
    if not local_table:
        out += table_bytes
    # a GCE extension block, to prove extension skipping works
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    iflags = (0x40 if interlace else 0) | (0x80 | size_field if local_table else 0)
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([iflags])
    if local_table:
        out += table_bytes
    return out + bytes([mcs]) + sub + b"\x3b"


def test_decode_gif_roundtrip_exact():
    """LZW is lossless: a spec-following encoder's output must decode to
    the exact palette-expanded pixels — including across code-width growth
    (257 distinct 8-bit indices force 9->10-bit codes)."""
    import numpy as np

    pal = [((3 * i) % 256, (7 * i) % 256, (11 * i) % 256) for i in range(256)]
    w, h = 37, 29  # enough pixels to grow the dictionary past 512 entries
    idx = [[(x * 89 + y * 31) % 256 for x in range(w)] for y in range(h)]
    img = multimodal.decode_gif(_encode_gif(idx, pal))
    assert img.shape == (h, w, 3)
    expect = np.array(pal, np.uint8)[np.array(idx, np.int32)]
    assert img.tolist() == expect.tolist()


def test_decode_gif_interlace_local_table_small_palette():
    import numpy as np

    pal4 = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    idx = [[(x + y) % 4 for x in range(9)] for y in range(11)]
    expect = np.array(pal4, np.uint8)[np.array(idx, np.int32)].tolist()
    for interlace in (False, True):
        for local in (False, True):
            img = multimodal.decode_gif(
                _encode_gif(idx, pal4, interlace=interlace, local_table=local))
            assert img.tolist() == expect, f"interlace={interlace} local={local}"


def test_decode_gif_rejects_malformed():
    pal4 = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    good = _encode_gif([[0, 1], [2, 3]], pal4)
    with pytest.raises(ValueError, match="signature"):
        multimodal.decode_gif(b"JIF89a" + good[6:])
    with pytest.raises(ValueError, match="no image"):
        multimodal.decode_gif(good[:13 + 12] + b"\x3b")  # GCT then trailer
    truncated = good[:len(good) - 6]
    with pytest.raises(ValueError):
        multimodal.decode_gif(truncated)


def _encode_bmp(pixels_rgb, bpp: int = 24, top_down: bool = False,
                palette: list[tuple] | None = None) -> bytes:
    """Minimal BMP writer for fixtures: BITMAPINFOHEADER, BI_RGB,
    8/24/32-bit, 4-byte-padded rows, bottom-up unless top_down."""
    import struct

    h, w = len(pixels_rgb), len(pixels_rgb[0])
    pal_bytes = b""
    if bpp == 8:
        pal_bytes = b"".join(bytes([b, g, r, 0]) for (r, g, b) in palette)
    rows = pixels_rgb if top_down else pixels_rgb[::-1]
    body = bytearray()
    for row in rows:
        line = bytearray()
        for px in row:
            if bpp == 8:
                line.append(px)            # already a palette index
            elif bpp == 24:
                r, g, b = px
                line += bytes([b, g, r])
            else:
                r, g, b, a = px
                line += bytes([b, g, r, a])
        while len(line) % 4:
            line.append(0)
        body += line
    pix_off = 14 + 40 + len(pal_bytes)
    info = struct.pack("<IiiHHIIiiII", 40, w, (-h if top_down else h), 1,
                       bpp, 0, len(body), 2835, 2835,
                       len(palette) if palette else 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
    return hdr + info + pal_bytes + bytes(body)


def test_decode_bmp_roundtrip_all_depths():
    rgb = [[((x * 53) % 256, (y * 97) % 256, (x * y) % 256)
            for x in range(5)] for y in range(3)]   # odd width -> row padding
    for top_down in (False, True):
        img = multimodal.decode_bmp(_encode_bmp(rgb, 24, top_down))
        assert img.shape == (3, 5, 3)
        assert [[tuple(px) for px in row] for row in img.tolist()] == rgb

    rgba = [[(10 * x, 20 * y, x + y, 255 - x) for x in range(4)]
            for y in range(2)]
    img = multimodal.decode_bmp(_encode_bmp(rgba, 32))
    assert img.shape == (2, 4, 4)
    assert [[tuple(px) for px in row] for row in img.tolist()] == rgba

    pal = [(i, 255 - i, (2 * i) % 256) for i in range(256)]
    idx = [[(x * 41 + y * 7) % 256 for x in range(6)] for y in range(4)]
    img = multimodal.decode_bmp(_encode_bmp(idx, 8, palette=pal))
    assert img.shape == (4, 6, 3)
    assert [[tuple(px) for px in row] for row in img.tolist()] == [
        [pal[i] for i in row] for row in idx]


def test_decode_bmp_rejects_unsupported():
    rgb = [[(1, 2, 3)]]
    good = _encode_bmp(rgb, 24)
    with pytest.raises(ValueError, match="signature|truncated"):
        multimodal.decode_bmp(b"XX" + good[2:])
    import struct
    rle = bytearray(good)
    rle[30:34] = struct.pack("<I", 1)  # biCompression = BI_RLE8
    with pytest.raises(ValueError, match="compressed"):
        multimodal.decode_bmp(bytes(rle))
    deep = bytearray(good)
    deep[28:30] = struct.pack("<H", 16)
    with pytest.raises(ValueError, match="bit depth"):
        multimodal.decode_bmp(bytes(deep))


def test_decode_image_dispatch_and_resize_gif_bmp(spark):
    """decode_image routes GIF/BMP to the real decoders, and the resize
    seam uses real pixels for them: a solid-color GIF/BMP resizes to a
    constant gray buffer. A corrupt-but-recognized container falls back to
    the fake instead of killing the stage."""
    pal = [(200, 200, 200), (0, 0, 0)]
    gif = _encode_gif([[0] * 8 for _ in range(6)], pal)
    bmp = _encode_bmp([[(64, 64, 64)] * 7 for _ in range(5)], 24)
    assert multimodal.decode_image(gif).shape == (6, 8, 3)
    assert multimodal.decode_image(bmp).shape == (5, 7, 3)

    corrupt = bmp[:40]  # recognized signature, truncated body
    df = spark.createDataFrame(
        [(1, gif), (2, bmp), (3, corrupt)], "key bigint, payload binary")
    out = {r.key: bytes(r.pixels)
           for r in multimodal.resize_images(df, width=2, height=2).collect()}
    assert out[1] == bytes([200] * 4)   # real GIF pixels (gray of 200,200,200)
    assert out[2] == bytes([64] * 4)    # real BMP pixels
    assert len(out[3]) == 4             # fake fallback, stage survived


# --- real MP4 / AVI video metadata -------------------------------------------

def _mp4_fixture(w=640, h=360, timescale=1000, duration=2500,
                 version=0) -> bytes:
    import struct as s

    def box(tag, body):
        return s.pack(">I", 8 + len(body)) + tag + body

    # ISO 14496-12 layouts: v0 tkhd body is exactly 84 bytes with
    # width/height in the final 8 (offset 76); v1 widens the three
    # timestamps (+12). mvhd: timescale@12/duration@16 (v0), @20/@24 (v1).
    if version:
        mvhd = (bytes([1, 0, 0, 0]) + b"\x00" * 16
                + s.pack(">IQ", timescale, duration) + b"\x00" * 80)
        tkhd = (bytes([1, 0, 0, 0]) + b"\x00" * 84
                + s.pack(">II", w << 16, h << 16))
        assert len(tkhd) == 96
    else:
        mvhd = (bytes([0, 0, 0, 0]) + b"\x00" * 8
                + s.pack(">II", timescale, duration) + b"\x00" * 80)
        tkhd = (bytes([0, 0, 0, 0]) + b"\x00" * 72
                + s.pack(">II", w << 16, h << 16))
        assert len(tkhd) == 84
    # an audio-ish trak with 0x0 dims must not win the max()
    tkhd_audio = bytes([0, 0, 0, 0]) + b"\x00" * 72 + s.pack(">II", 0, 0)
    moov = box(b"moov", box(b"mvhd", mvhd)
               + box(b"trak", box(b"tkhd", tkhd_audio))
               + box(b"trak", box(b"tkhd", tkhd)))
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


def _avi_fixture(w=320, h=240, usec_pf=33333, frames=90) -> bytes:
    import struct as s

    avih = (s.pack("<I", usec_pf) + b"\x00" * 12 + s.pack("<I", frames)
            + b"\x00" * 12 + s.pack("<II", w, h) + b"\x00" * 16)
    hdrl = b"hdrl" + b"avih" + s.pack("<I", len(avih)) + avih
    riff_body = b"AVI " + b"LIST" + s.pack("<I", len(hdrl)) + hdrl
    return b"RIFF" + s.pack("<I", len(riff_body)) + riff_body


def test_parse_video_header_mp4_and_avi():
    for ver in (0, 1):
        got = multimodal.parse_video_header(
            _mp4_fixture(640, 360, 1000, 2500, version=ver))
        assert got == ("mp4", 640, 360, 2.5, -1), (ver, got)
    got = multimodal.parse_video_header(_avi_fixture(320, 240, 33333, 90))
    assert got == ("avi", 320, 240, 90 * 33333 / 1e6, 90)
    assert multimodal.parse_video_header(b"random text bytes here") is None
    # a 64-bit largesize box header walks correctly
    import struct as s
    big = (s.pack(">I", 1) + b"ftyp" + s.pack(">Q", 24) + b"isomabcd"
           + _mp4_fixture()[24:])
    got = multimodal.parse_video_header(big)
    assert got is not None and got[0] == "mp4"


def test_extract_video_metadata_spark_path(spark):
    import hashlib

    mp4 = _mp4_fixture()
    avi = _avi_fixture()
    df = spark.createDataFrame(
        [(1, mp4), (2, avi), (3, b"not a video")],
        "key bigint, payload binary")
    meta = {r.key: r.asDict()
            for r in multimodal.extract_video_metadata(df).collect()}
    assert (meta[1]["format"], meta[1]["width"], meta[1]["height"],
            meta[1]["duration_s"], meta[1]["n_frames"]) \
        == ("mp4", 640, 360, 2.5, -1)
    assert (meta[2]["format"], meta[2]["n_frames"]) == ("avi", 90)
    assert meta[3]["payload_sha256"] == hashlib.sha256(b"not a video").hexdigest()
    assert meta[3]["format"] in ("mp4", "avi", "webm")  # marked fake
    # determinism across partitionings
    again = {r.key: r.asDict()
             for r in multimodal.extract_video_metadata(
                 df.repartition(5)).collect()}
    assert meta == again


def test_corrupt_containers_degrade_not_crash():
    """Review findings: zlib.error / IndexError escapes from the decoders
    must be ValueError so the resize seam's fallback catches them."""
    import struct
    import zlib

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    # PNG with valid CRCs but a corrupt deflate stream
    bad_idat = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
                + chunk(b"IDAT", b"\x99not-deflate")
                + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="deflate"):
        multimodal.decode_png(bad_idat)
    # palette PNG whose pixel index exceeds the PLTE entries
    pal1 = bytes([255, 0, 0])
    rows = [[0, 5], [0, 0]]
    with pytest.raises(ValueError, match="PLTE"):
        multimodal.decode_png(_encode_png(rows, 3, [0, 0], palette=pal1))
    # IHDR of the wrong length but a valid CRC
    bad_ihdr = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", b"\x00" * 10)
                + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="IHDR"):
        multimodal.decode_png(bad_ihdr)
    # 8-bit BMP whose pixel index exceeds biClrUsed
    bmp = bytearray(_encode_bmp([[0, 0], [0, 0]], 8,
                                palette=[(1, 2, 3), (4, 5, 6)]))
    bmp[30 + 16:30 + 20] = struct.pack("<I", 2)  # biClrUsed = 2
    pix_off = struct.unpack("<I", bytes(bmp[10:14]))[0]
    bmp[pix_off] = 200  # out-of-palette index
    with pytest.raises(ValueError, match="palette"):
        multimodal.decode_bmp(bytes(bmp))
    # every one of these survives the resize seam as the fake
    for payload in (bad_idat, bad_ihdr, bytes(bmp)):
        assert len(multimodal._default_resize(payload, 2, 2)) == 4


# --- bloom-filter decontamination --------------------------------------------

def test_bloom_decontaminate_verify_equals_exact(spark, tables):
    """The bloom path with exact verify must produce EXACTLY the same
    surviving document set as the broadcast-join decontaminate."""
    from datafusion_substrait_spark.operators import contamination

    docs = tables["documents"].select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 7 == 3).select(
        F.col("doc_id").alias("bench_id"), "text")
    exact = {r.doc_id for r in
             contamination.decontaminate(docs, bench, n=5).collect()}
    bloom = {r.doc_id for r in contamination.bloom_decontaminate(
        docs, bench, n=5).collect()}
    assert bloom == exact
    assert len(exact) < docs.count()  # the bench actually removed docs


def test_bloom_decontaminate_unverified_is_conservative(spark, tables):
    """verify=False may only remove MORE documents (bloom FPs), never
    keep a contaminated one; with a roomy filter it equals exact."""
    from datafusion_substrait_spark.operators import contamination

    # deterministic subset (LIMIT without ORDER BY may pick different
    # rows across the three separate jobs below)
    docs = tables["documents"].select("doc_id", "text").filter(
        F.col("doc_id") % 3 != 0)
    bench = docs.filter(F.col("doc_id") % 11 == 0).select(
        F.col("doc_id").alias("bench_id"), "text")
    exact = {r.doc_id for r in
             contamination.decontaminate(docs, bench, n=5).collect()}
    loose = {r.doc_id for r in contamination.bloom_decontaminate(
        docs, bench, n=5, verify=False).collect()}
    assert loose <= exact  # conservative: no contaminated doc survives
    # roomy filter => FP rate negligible at this scale => equality
    roomy = {r.doc_id for r in contamination.bloom_decontaminate(
        docs, bench, n=5, n_bits=1 << 24, verify=False).collect()}
    assert roomy == exact


def test_bloom_filter_no_false_negatives_and_plan_shape(spark, tables):
    """Every benchmark gram is bloom-positive by construction, and the
    corpus probe is a narrow Arrow-batched filter (no Exchange, no
    broadcast of benchmark gram strings)."""
    import numpy as np

    from datafusion_substrait_spark.operators import contamination
    from datafusion_substrait_spark.operators.contamination import (
        _grams, build_ngram_bloom)

    # deterministic subset: the filter is built in one job and the probe
    # re-evaluates the same DataFrame in another — LIMIT could diverge
    bench = tables["documents"].select(
        F.col("doc_id").alias("bench_id"), "text").filter(
        F.col("bench_id") % 9 == 2)
    n_bits = 1 << 20
    filt = build_ngram_bloom(bench, n=5, n_bits=n_bits)
    assert filt.dtype == np.uint64 and len(filt) == n_bits // 64
    # probe every benchmark gram through the same hash chain in Spark
    g = _grams(bench, "text", "bench_id", 5, "bench_id")
    probed = g.select(*[
        F.pmod(F.xxhash64(F.col("_g"), F.lit(i)), F.lit(n_bits)).alias(f"h{i}")
        for i in range(5)]).collect()
    for r in probed:
        for i in range(5):
            idx = r[f"h{i}"]
            assert (int(filt[idx >> 6]) >> (idx & 63)) & 1, "false negative!"
    # plan shapes: the pandas probe (default, measured faster locally)
    # is the Arrow-batched UDF; the jvm option has ZERO Python in the
    # hot path (element_at on a broadcast-attached bitset, codegen'd)
    docs = tables["documents"].select("doc_id", "text")
    out_p = contamination.bloom_decontaminate(docs, bench, n=5, n_bits=n_bits,
                                              verify=False, probe="pandas")
    plan_p = out_p._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan_p or "PythonUDF" in plan_p, plan_p[:500]
    out_j = contamination.bloom_decontaminate(docs, bench, n=5, n_bits=n_bits,
                                              verify=False, probe="jvm")
    plan_j = out_j._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan_j and "PythonUDF" not in plan_j, \
        plan_j[:500]


def test_bloom_jvm_and_pandas_probes_identical(spark, tables):
    """The two probe implementations test the same bits of the same
    filter: identical surviving-document sets, verified and unverified."""
    from datafusion_substrait_spark.operators import contamination

    docs = tables["documents"].select("doc_id", "text", "lang")
    bench = tables["documents"].select(
        F.col("doc_id").alias("bench_id"), "text").filter(
        F.col("bench_id") % 7 == 3)
    for verify in (True, False):
        jvm = {r.doc_id for r in contamination.bloom_decontaminate(
            docs, bench, n=5, n_bits=1 << 18, verify=verify,
            probe="jvm").collect()}
        pandas_ = {r.doc_id for r in contamination.bloom_decontaminate(
            docs, bench, n=5, n_bits=1 << 18, verify=verify,
            probe="pandas").collect()}
        assert jvm == pandas_, (verify, len(jvm ^ pandas_))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="probe must be"):
        contamination.bloom_decontaminate(docs, bench, probe="nope")


def test_tfidf_topk_matches_duckdb_replay(spark, tables):
    """Full DuckDB oracle replay of the TF-IDF pipeline (same tokenizer,
    same smoothing, same 6dp rounding, same tie-break)."""
    import os

    import duckdb

    from tests.conftest import SF_DIR

    out = text.tfidf_topk_terms(tables["documents"], k=5).collect()
    got = {(r.doc_id, r.rank): (r.token, r.tf, r.df, round(r.score, 6))
           for r in out}
    docs_pq = os.path.join(SF_DIR, "documents.parquet")
    rows = duckdb.sql(f"""
        WITH tok AS (
            SELECT doc_id, unnest(list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                t -> t != '')) AS t
            FROM '{docs_pq}'
        ),
        tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
        dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        n AS (SELECT count(*) AS n FROM '{docs_pq}'),
        scored AS (
            SELECT doc_id, t, tf, df,
                   round(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0), 6) AS score
            FROM tf JOIN dfq USING (t) CROSS JOIN n
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, t ASC) AS rank
            FROM scored
        )
        SELECT doc_id, rank, t, tf, df, score FROM ranked WHERE rank <= 5
    """).fetchall()
    expect = {(r[0], r[1]): (r[2], r[3], r[4], round(r[5], 6)) for r in rows}
    assert got == expect
    # every document with tokens got exactly min(k, |distinct tokens|) rows
    assert len(got) == len(expect) > 0


def test_tfidf_min_df_filters_hapax(spark):
    docs = spark.createDataFrame(
        [(1, "shared words here plus unique_one"),
         (2, "shared words here plus unique_two"),
         (3, "shared words here plus unique_three")],
        "doc_id bigint, text string")
    out = text.tfidf_topk_terms(docs, k=10, min_df=2).collect()
    toks = {r.token for r in out}
    assert "unique_one" not in toks and "shared" in toks
    # rank is contiguous from 1 per doc
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.rank)
    for ranks in by_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_compression_ratio_signal_and_nulls(spark, tables):
    import zlib

    docs = spark.createDataFrame(
        [(1, "spam spam spam " * 200),          # highly repetitive
         (2, None),
         (3, ""),
         (4, "The quick brown fox jumps over the lazy dog near the bank "
             "of the river while seventeen violinists argue about jazz.")],
        "doc_id bigint, text string")
    out = {r.doc_id: (r.n_bytes, r.compression_ratio)
           for r in text.compression_ratio(docs).collect()}
    assert out[1][1] < 0.05                      # boilerplate compresses away
    assert out[2] == (None, None)
    assert out[3][1] is None                     # empty: no meaningful ratio
    assert out[4][1] > 0.4                       # normal prose
    # exact value replay against python zlib at the same level
    t = "spam spam spam " * 200
    expect = round(len(zlib.compress(t.encode(), 6)) / len(t.encode()), 6)
    assert out[1] == (len(t.encode()), expect)
    # real table: one row per doc, values in (0, 2), narrow plan
    full = text.compression_ratio(tables["documents"])
    rows = full.collect()
    assert len(rows) == tables["documents"].count()
    assert all(0 < r.compression_ratio < 2 for r in rows)
    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bloom_decontaminate_rejects_same_key_names(spark, tables):
    from datafusion_substrait_spark.operators import contamination

    docs = tables["documents"].select("doc_id", "text")
    with pytest.raises(ValueError, match="distinct names"):
        contamination.bloom_decontaminate(
            docs, docs, key_col="doc_id", bench_key_col="doc_id")


def _ebml_el(eid_bytes: bytes, body: bytes, unknown_size: bool = False) -> bytes:
    """EBML element with a 2-byte size varint (or the 1-byte all-ones
    'unknown length' marker)."""
    if unknown_size:
        return eid_bytes + b"\xff" + body
    assert len(body) < (1 << 14) - 1
    return eid_bytes + (0x4000 | len(body)).to_bytes(2, "big") + body


def _webm_fixture(w=1280, h=720, dur_ms=4500.0, doctype=b"webm",
                  unknown_segment=False) -> bytes:
    import struct as s

    header = _ebml_el(b"\x1a\x45\xdf\xa3", _ebml_el(b"\x42\x82", doctype))
    info = _ebml_el(b"\x15\x49\xa9\x66",
                    _ebml_el(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big"))
                    + _ebml_el(b"\x44\x89", s.pack(">d", dur_ms)))
    video = _ebml_el(b"\xe0",
                     _ebml_el(b"\xb0", w.to_bytes(2, "big"))
                     + _ebml_el(b"\xba", h.to_bytes(2, "big")))
    tracks = _ebml_el(b"\x16\x54\xae\x6b", _ebml_el(b"\xae", video))
    segment = _ebml_el(b"\x18\x53\x80\x67", info + tracks,
                       unknown_size=unknown_segment)
    return header + segment


def test_parse_video_header_malformed_mp4_boxes_never_raise():
    """Crafted self-consistent box layouts the random fuzzer can't build
    (ADVICE r6): a v1 mvhd whose 28–31-byte body ends exactly at the
    payload's last byte must not struct.error, must not be misparsed
    with v0 offsets, and a zero-body (size-8) tkhd at end of payload
    must not IndexError."""
    import struct as s

    def box(tag, body):
        return s.pack(">I", 8 + len(body)) + tag + body

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    # v1 mvhd, body exactly 28 bytes (guard used to pass, the 8-byte
    # duration read then ran off the end of the box/payload)
    for n in range(20, 32):
        mvhd_short = bytes([1, 0, 0, 0]) + b"\x00" * (n - 4)
        blob = ftyp + box(b"moov", box(b"mvhd", mvhd_short))
        got = multimodal.parse_video_header(blob)
        # must not raise; the malformed v1 box is skipped, not v0-parsed
        assert got == ("mp4", 0, 0, 0.0, -1), (n, got)
    # zero-body tkhd as the very last box in the payload
    blob = ftyp + box(b"moov", box(b"trak", box(b"tkhd", b"")))
    assert multimodal.parse_video_header(blob) == ("mp4", 0, 0, 0.0, -1)
    # and the well-formed v1 fixture still parses correctly
    got = multimodal.parse_video_header(_mp4_fixture(version=1))
    assert got == ("mp4", 640, 360, 2.5, -1), got


def test_parse_video_header_webm():
    got = multimodal.parse_video_header(_webm_fixture())
    assert got == ("webm", 1280, 720, 4.5, -1), got
    # matroska doctype reports mkv
    got = multimodal.parse_video_header(_webm_fixture(doctype=b"matroska"))
    assert got[0] == "mkv"
    # streamed files use the unknown-length Segment marker
    got = multimodal.parse_video_header(_webm_fixture(unknown_segment=True))
    assert got == ("webm", 1280, 720, 4.5, -1), got
    # truncated EBML degrades to zeros, never raises
    got = multimodal.parse_video_header(_webm_fixture()[:20])
    assert got is not None and got[0] == "webm"
    # float32 Duration variant
    import struct as s
    fx = _webm_fixture()
    f32 = fx.replace(_ebml_el(b"\x44\x89", s.pack(">d", 4500.0)),
                     _ebml_el(b"\x44\x89", s.pack(">f", 4500.0)))
    assert multimodal.parse_video_header(f32)[3] == 4.5


def test_webm_corrupt_duration_degrades_to_zero():
    """Review finding: NaN/negative Duration floats must clamp to 0, not
    flow into the metadata column."""
    import struct as s

    for bad in (s.pack(">d", float("nan")), s.pack(">d", -5.0),
                s.pack(">d", float("inf"))):
        fx = _webm_fixture()
        fx = fx.replace(_ebml_el(b"\x44\x89", s.pack(">d", 4500.0)),
                        _ebml_el(b"\x44\x89", bad))
        got = multimodal.parse_video_header(fx)
        assert got is not None and got[3] == 0.0, (bad, got)


# --- REAL Motion-JPEG AVI frame extraction ----------------------------------

def _mjpeg_avi_fixture(jpegs, w=16, h=16, handler=b"MJPG"):
    """Independent AVI-with-MJPEG-stream encoder, assembled field-by-field
    from the RIFF/AVI spec (hdrl with avih + strl{strh 'vids'/handler,
    strf BITMAPINFOHEADER}, then movi with one 00dc chunk per frame,
    word-aligned chunk bodies)."""
    import struct as s

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + s.pack("<I", len(body)) + body + pad

    def lst(tag, body):
        return chunk(b"LIST", tag + body)

    avih = (s.pack("<I", 33333) + b"\x00" * 12 + s.pack("<I", len(jpegs))
            + b"\x00" * 12 + s.pack("<II", w, h) + b"\x00" * 16)
    strh = b"vids" + handler + b"\x00" * 48
    strf = s.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, handler,
                  w * h * 3, 0, 0, 0, 0)
    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + s.pack("<I", len(body)) + body


def test_avi_mjpeg_frames_real_pixels(spark):
    import numpy as np

    from datafusion_substrait_spark.operators import jpeg as J
    from tests.test_jpeg import _encode_jpeg

    grays = [40, 120, 200]
    jpegs = [_encode_jpeg(np.full((16, 16), g, np.uint8), q_val=1)
             for g in grays]
    avi = _mjpeg_avi_fixture(jpegs)

    # container walk alone
    frames = multimodal.avi_mjpeg_frames(avi)
    assert frames == jpegs
    # metadata parser still reads the same container
    got = multimodal.parse_video_header(avi)
    assert got == ("avi", 16, 16, 3 * 33333 / 1e6, 3)
    # non-MJPEG codec and non-AVI payloads fall back to None
    assert multimodal.avi_mjpeg_frames(
        _mjpeg_avi_fixture(jpegs, handler=b"H264")) is None
    assert multimodal.avi_mjpeg_frames(b"not an avi at all") is None

    # the Spark seam: real JPEG bytes out, decodable to the source pixels
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"plain text payload" * 10))],
        "key long, payload binary")
    rows = multimodal.sample_frames(df).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.key, {})[r.frame_idx] = bytes(r.frame_bytes)
    assert set(by_key[1]) == {0, 1, 2}
    for fi, gray in enumerate(grays):
        decoded = J.decode_jpeg(by_key[1][fi])
        assert decoded.shape == (16, 16, 1)
        assert abs(int(decoded.mean()) - gray) <= 2
    # the text payload keeps the fixed-stride stand-in path
    assert len(by_key[2]) == 3  # 180 bytes / 64 -> ceil 3 chunks

    # even endpoint-inclusive sampling under a tight frame budget
    rows2 = multimodal.sample_frames(df.filter("key = 1"),
                                     max_frames=2).collect()
    assert sorted(r.frame_idx for r in rows2) == [0, 2]

    # deterministic across partitionings
    a = sorted((r.key, r.frame_idx, bytes(r.frame_bytes))
               for r in multimodal.sample_frames(df.repartition(1)).collect())
    b = sorted((r.key, r.frame_idx, bytes(r.frame_bytes))
               for r in multimodal.sample_frames(df.repartition(7)).collect())
    assert a == b


def test_avi_mjpeg_frames_corrupt_never_raises():
    import random

    base = _mjpeg_avi_fixture([b"\xff\xd8fakejpegbody\xff\xd9"] * 2)
    rnd = random.Random(77)
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rnd.randrange(1, 6)):
            b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        out = multimodal.avi_mjpeg_frames(bytes(b))
        assert out is None or isinstance(out, list)
    for cut in (0, 11, 12, 20, 45, len(base) - 1):
        out = multimodal.avi_mjpeg_frames(base[:cut])
        assert out is None or isinstance(out, list)


# --- REAL Motion-JPEG MP4 frame extraction (sample-table walk) ---------------

def _mjpeg_mp4_fixture(jpegs, w=16, h=16, fourcc=b"jpeg", multi_chunk=True):
    """Independent MP4 encoder assembled field-by-field from ISO 14496-12:
    ftyp + mdat(frames) + moov/trak/mdia{mdhd,hdlr 'vide',minf/stbl
    {stsd VisualSampleEntry, stts, stsc, stsz per-sample, stco absolute
    offsets}}. multi_chunk puts samples 0-1 in one chunk and the rest in
    singleton chunks, exercising the stsc run expansion."""
    import struct as s

    def box(tag, body):
        return s.pack(">I", 8 + len(body)) + tag + body

    def full(tag, body, ver=0, flags=0):
        return box(tag, bytes([ver]) + flags.to_bytes(3, "big") + body)

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat = box(b"mdat", b"".join(jpegs))
    base = len(ftyp) + 8  # absolute offset of the first sample
    n, sizes = len(jpegs), [len(j) for j in jpegs]
    if multi_chunk and n >= 3:
        stsc_entries = [(1, 2, 1), (2, 1, 1)]
        chunk_offsets = [base]
        off = base + sizes[0] + sizes[1]
        for k in range(2, n):
            chunk_offsets.append(off)
            off += sizes[k]
    else:
        stsc_entries = [(1, 1, 1)]
        chunk_offsets, off = [], base
        for k in range(n):
            chunk_offsets.append(off)
            off += sizes[k]

    # VisualSampleEntry: 6 reserved + data_reference_index + 16 pre_defined/
    # reserved + width + height + h/v resolution (72 dpi 16.16) + 4 reserved
    # + frame_count + 32-byte compressorname + depth + pre_defined(-1)
    vse = (b"\x00" * 6 + s.pack(">H", 1) + b"\x00" * 16
           + s.pack(">HH", w, h) + s.pack(">II", 0x00480000, 0x00480000)
           + b"\x00" * 4 + s.pack(">H", 1) + b"\x00" * 32
           + s.pack(">Hh", 24, -1))
    stsd = full(b"stsd", s.pack(">I", 1) + box(fourcc, vse))
    stts = full(b"stts", s.pack(">I", 1) + s.pack(">II", n, 1000))
    stsc = full(b"stsc", s.pack(">I", len(stsc_entries))
                + b"".join(s.pack(">III", *e) for e in stsc_entries))
    stsz = full(b"stsz", s.pack(">II", 0, n)
                + b"".join(s.pack(">I", x) for x in sizes))
    stco = full(b"stco", s.pack(">I", len(chunk_offsets))
                + b"".join(s.pack(">I", o) for o in chunk_offsets))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", full(b"vmhd", b"\x00" * 8, flags=1) + stbl)
    hdlr = full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"mjpeg\x00")
    mdhd = full(b"mdhd", s.pack(">IIII", 0, 0, 1000, n * 1000)
                + s.pack(">HH", 0x55C4, 0))
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = full(b"tkhd", b"\x00" * 72 + s.pack(">II", w << 16, h << 16),
                flags=7)
    mvhd = full(b"mvhd", b"\x00" * 8 + s.pack(">II", 1000, n * 1000)
                + b"\x00" * 80)
    moov = box(b"moov", mvhd + box(b"trak", tkhd + mdia))
    return ftyp + mdat + moov


def test_mp4_jpeg_frames_real_pixels(spark):
    import numpy as np

    from datafusion_substrait_spark.operators import jpeg as J
    from tests.test_jpeg import _encode_jpeg

    grays = [50, 130, 210, 90]
    jpegs = [_encode_jpeg(np.full((16, 16), g, np.uint8), q_val=1)
             for g in grays]
    for multi in (True, False):
        mp4 = _mjpeg_mp4_fixture(jpegs, multi_chunk=multi)
        frames = multimodal.mp4_jpeg_frames(mp4)
        assert frames == jpegs, f"multi_chunk={multi}"
        # metadata parser reads the same container (mvhd/tkhd untouched)
        meta = multimodal.parse_video_header(mp4)
        assert meta == ("mp4", 16, 16, 4.0, -1), meta

    mp4 = _mjpeg_mp4_fixture(jpegs)
    # non-JPEG codec and non-MP4 payloads -> None
    assert multimodal.mp4_jpeg_frames(
        _mjpeg_mp4_fixture(jpegs, fourcc=b"avc1")) is None
    assert multimodal.mp4_jpeg_frames(b"RIFF not an mp4") is None
    # Spark seam: decodable frames, decoded pixels match the source
    df = spark.createDataFrame([(9, bytearray(mp4))], "key long, payload binary")
    rows = multimodal.sample_frames(df).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 1, 2, 3]
    for r in rows:
        dec = J.decode_jpeg(bytes(r.frame_bytes))
        assert abs(int(dec.mean()) - grays[r.frame_idx]) <= 2
    # determinism across partitionings
    a = sorted((r.frame_idx, bytes(r.frame_bytes))
               for r in multimodal.sample_frames(df.repartition(1)).collect())
    b = sorted((r.frame_idx, bytes(r.frame_bytes))
               for r in multimodal.sample_frames(df.repartition(5)).collect())
    assert a == b


def test_mp4_jpeg_frames_corrupt_never_raises():
    import random

    base = _mjpeg_mp4_fixture([b"\xff\xd8fake\xff\xd9"] * 3)
    rnd = random.Random(31)
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rnd.randrange(1, 6)):
            b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        out = multimodal.mp4_jpeg_frames(bytes(b))
        assert out is None or isinstance(out, list)
    for cut in (0, 7, 8, 30, len(base) // 2, len(base) - 1):
        out = multimodal.mp4_jpeg_frames(base[:cut])
        assert out is None or isinstance(out, list)
    # offsets past the payload are rejected, not sliced short
    trunc = base[:-4]
    assert multimodal.mp4_jpeg_frames(trunc) is None or \
        all(len(f) > 0 for f in multimodal.mp4_jpeg_frames(trunc))


# --- CCNet-style corpus-level line dedup --------------------------------------

def test_remove_boilerplate_lines_planted(spark):
    boiler = "Subscribe to our newsletter!"
    rows = [
        (1, f"unique first line\n{boiler}\nreal body one"),
        (2, f"{boiler}\nanother body\n\ntrailing after empty"),
        (3, f"opening text\n  {boiler.upper()}  \nclosing text"),
        (4, "totally unique document"),
        (5, f"{boiler}"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in
           text.remove_boilerplate_lines(df, min_docs=3).collect()}
    # the banner appears (normalized: lower+trim) in docs 1, 2, 3, 5 -> dropped
    assert out[1].text == "unique first line\nreal body one"
    assert out[1].n_lines_kept == 2 and out[1].n_lines_dropped == 1
    # empty line is structure: kept, order preserved
    assert out[2].text == "another body\n\ntrailing after empty"
    assert out[3].text == "opening text\nclosing text"
    assert out[4].text == "totally unique document"
    assert out[4].n_lines_dropped == 0
    assert out[5].text == "" and out[5].n_lines_dropped == 1
    # below the threshold nothing is dropped
    out2 = {r.doc_id: r for r in
            text.remove_boilerplate_lines(df, min_docs=5).collect()}
    assert all(r.n_lines_dropped == 0 for r in out2.values())


def test_remove_boilerplate_lines_matches_duckdb_replay(spark, tables):
    """Full DuckDB replay over the documents table: same normalization,
    same distinct-doc threshold, same keep-empty-lines rule, same
    order-preserving reassembly (grouping by normalized STRING replays
    the xxhash64 grouping exactly, absent hash collisions)."""
    import os

    import duckdb

    from tests.conftest import SF_DIR

    docs = tables["documents"].select("doc_id", "text")
    got = {r.doc_id: (r.text, r.n_lines_kept, r.n_lines_dropped)
           for r in text.remove_boilerplate_lines(docs, min_docs=3).collect()}
    docs_pq = os.path.join(SF_DIR, "documents.parquet")
    rows = duckdb.sql(f"""
        WITH lines AS (
            SELECT doc_id, t.i AS pos, ls[t.i] AS line
            FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                  FROM '{docs_pq}'),
                 unnest(range(1, len(ls) + 1)) AS t(i)
        ), drops AS (
            SELECT lower(trim(line)) AS nl
            FROM lines WHERE lower(trim(line)) <> ''
            GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3
        ), marked AS (
            SELECT l.doc_id, l.pos, l.line,
                   (lower(trim(l.line)) = '' OR d.nl IS NULL) AS keep
            FROM lines l LEFT JOIN drops d ON lower(trim(l.line)) = d.nl
        )
        SELECT doc_id,
               coalesce(string_agg(line, chr(10) ORDER BY pos)
                        FILTER (WHERE keep), '') AS text,
               count(*) FILTER (WHERE keep) AS n_kept,
               count(*) FILTER (WHERE NOT keep) AS n_dropped
        FROM marked GROUP BY doc_id
    """).fetchall()
    expect = {r[0]: (r[1], r[2], r[3]) for r in rows}
    assert got == expect and len(expect) > 0


# --- REAL Motion-JPEG WebM/Matroska frame extraction --------------------------

def _mjpeg_webm_fixture(jpegs, w=16, h=16, codec=b"V_MJPEG", track=1,
                        laced_extra=False):
    """Matroska fixture with a V_MJPEG TrackEntry and one Cluster per
    frame: SimpleBlock = VINT track number + 2-byte timestamp + flags +
    frame bytes. laced_extra appends a block with lacing bits set (must
    be skipped, not misread)."""
    def block(payload, flags=0x80, tnum=track):
        # 1-byte VINT: 0x80 | number (number < 64)
        return bytes([0x80 | tnum, 0, 0, flags]) + payload

    header = _ebml_el(b"\x1a\x45\xdf\xa3", _ebml_el(b"\x42\x82", b"webm"))
    video = _ebml_el(b"\xe0",
                     _ebml_el(b"\xb0", w.to_bytes(2, "big"))
                     + _ebml_el(b"\xba", h.to_bytes(2, "big")))
    entry = (_ebml_el(b"\xd7", bytes([track]))       # TrackNumber
             + _ebml_el(b"\x83", b"\x01")            # TrackType video
             + _ebml_el(b"\x86", codec)              # CodecID
             + video)
    tracks = _ebml_el(b"\x16\x54\xae\x6b", _ebml_el(b"\xae", entry))
    clusters = b""
    for i, j in enumerate(jpegs):
        sb = _ebml_el(b"\xa3", block(j))
        if i == 0:
            # BlockGroup>Block form for the first frame: both paths walk
            sb = _ebml_el(b"\xa0", _ebml_el(b"\xa1", block(j)))
        # an audio-track block interleaved: must be filtered out
        sb += _ebml_el(b"\xa3", block(b"audio-bytes", tnum=track + 1))
        if laced_extra:
            sb += _ebml_el(b"\xa3", block(b"laced!", flags=0x86))
        clusters += _ebml_el(b"\x1f\x43\xb6\x75", sb)
    segment = _ebml_el(b"\x18\x53\x80\x67", tracks + clusters)
    return header + segment


def test_webm_mjpeg_frames_real_pixels(spark):
    import numpy as np

    from datafusion_substrait_spark.operators import jpeg as J
    from tests.test_jpeg import _encode_jpeg

    grays = [60, 150, 230]
    jpegs = [_encode_jpeg(np.full((16, 16), g, np.uint8), q_val=1)
             for g in grays]
    webm = _mjpeg_webm_fixture(jpegs, laced_extra=True)
    frames = multimodal.webm_mjpeg_frames(webm)
    assert frames == jpegs  # audio-track and laced blocks excluded
    # the metadata parser still reads the same container
    meta = multimodal.parse_video_header(webm)
    assert meta is not None and meta[0] == "webm" and meta[1:3] == (16, 16)
    # non-MJPEG codec and non-Matroska payloads -> None
    assert multimodal.webm_mjpeg_frames(
        _mjpeg_webm_fixture(jpegs, codec=b"V_VP9")) is None
    assert multimodal.webm_mjpeg_frames(b"RIFF....AVI ") is None
    # Spark seam + pixel roundtrip
    df = spark.createDataFrame([(3, bytearray(webm))], "key long, payload binary")
    rows = multimodal.sample_frames(df).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 1, 2]
    for r in rows:
        dec = J.decode_jpeg(bytes(r.frame_bytes))
        assert abs(int(dec.mean()) - grays[r.frame_idx]) <= 2


def test_webm_mjpeg_frames_corrupt_never_raises():
    import random

    base = _mjpeg_webm_fixture([b"\xff\xd8fake\xff\xd9"] * 2)
    rnd = random.Random(99)
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rnd.randrange(1, 6)):
            b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        out = multimodal.webm_mjpeg_frames(bytes(b))
        assert out is None or isinstance(out, list)
    for cut in (0, 3, 4, 10, len(base) // 2, len(base) - 1):
        out = multimodal.webm_mjpeg_frames(base[:cut])
        assert out is None or isinstance(out, list)


def test_video_features_content_similarity(spark):
    """Per-video embeddings compose the real frame walk + real image
    features: a brightness-shifted copy of a video lands near cosine 1,
    a different video lands lower; deterministic across partitionings;
    output schema feeds similarity.* as-is."""
    import numpy as np

    from tests.test_jpeg import _encode_jpeg

    rng = np.random.default_rng(7)
    base_frames = [rng.integers(0, 200, (16, 16), np.uint8)
                   for _ in range(3)]
    shifted = [np.clip(f.astype(int) + 25, 0, 255).astype(np.uint8)
               for f in base_frames]
    different = [rng.integers(0, 256, (16, 16), np.uint8)
                 for _ in range(3)]

    def avi(frames):
        return _mjpeg_avi_fixture(
            [_encode_jpeg(f, q_val=2) for f in frames])

    df = spark.createDataFrame(
        [(1, bytearray(avi(base_frames))),
         (2, bytearray(avi(shifted))),
         (3, bytearray(avi(different)))],
        "key long, payload binary")
    out = {r.key: (r.n_frames, np.array(r.features))
           for r in multimodal.video_features(df, dim=64).collect()}
    assert all(nf == 3 for nf, _ in out.values())
    for _, v in out.values():
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5

    def cos(a, b):
        return float(np.dot(a, b))

    sim_shift = cos(out[1][1], out[2][1])
    sim_diff = cos(out[1][1], out[3][1])
    assert sim_shift > sim_diff, (sim_shift, sim_diff)
    assert sim_shift > 0.98

    a = sorted((r.key, tuple(r.features)) for r in
               multimodal.video_features(df.repartition(1), dim=64).collect())
    b = sorted((r.key, tuple(r.features)) for r in
               multimodal.video_features(df.repartition(5), dim=64).collect())
    assert a == b


def test_score_features_linear_classifier(spark, tables):
    """The scoring half of an offline-trained linear quality classifier:
    exact logistic math (DuckDB-replayable), NULL features contribute 0,
    monotone in the weighted feature, zero Python / zero shuffle."""
    import math

    docs = tables["documents"].select("doc_id", "text")
    w = {"n_tokens": 0.01, "stopword_ratio": 2.0, "punct_ratio": -5.0}
    scored = text.quality_classifier_score(docs, w, bias=-1.0)
    rows = scored.collect()
    assert all(0.0 < r.model_score < 1.0 for r in rows)
    # exact replay of the math on one row
    r = rows[0]
    z = -1.0 + 0.01 * r.n_tokens + 2.0 * r.stopword_ratio \
        - 5.0 * r.punct_ratio
    assert abs(r.model_score - 1.0 / (1.0 + math.exp(-z))) < 1e-12
    # NULL feature contributes zero, not NULL score
    df = spark.createDataFrame([(1, None, 0.5)],
                               "doc_id bigint, a double, b double")
    out = text.score_features(df, {"a": 3.0, "b": 2.0}).collect()[0]
    assert abs(out.model_score - 1.0 / (1.0 + math.exp(-1.0))) < 1e-12
    # plan: narrow, no Python
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    import pytest as _p
    with _p.raises(ValueError, match="not in the DataFrame"):
        text.score_features(docs, {"nope": 1.0})
    with _p.raises(ValueError, match="at least one"):
        text.score_features(docs, {})


def test_train_quality_classifier_recovers_separable_rule(spark):
    """The training half: on linearly separable features the fitted
    (weights, bias) must reproduce the labels through score_features
    (the raw-unit fold-back is what makes fit and scoring agree)."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(400):
        a = float(rng.uniform(0, 10))
        b = float(rng.uniform(0, 10))
        rows.append((i, a, b, int(2.0 * a - b - 5.0 > 0)))
    df = spark.createDataFrame(rows, "doc_id bigint, fa double, fb double, y int")
    w, bias = text.train_quality_classifier(
        df, "y", feature_cols=("fa", "fb"), iters=2000, lr=1.0)
    assert w["fa"] > 0 > w["fb"]  # signs of the planted rule
    scored = text.score_features(df, w, bias=bias)
    acc = scored.filter(
        ((F.col("model_score") > 0.5).cast("int") == F.col("y"))
    ).count() / 400
    assert acc > 0.97
    # deterministic across partitionings (hash sample + full-batch GD)
    w2, b2 = text.train_quality_classifier(
        df.repartition(11), "y", feature_cols=("fa", "fb"),
        iters=2000, lr=1.0)
    assert w == w2 and bias == b2
    # constant feature gets weight ~0, not a blow-up
    dfc = df.withColumn("fc", F.lit(3.0))
    wc, _ = text.train_quality_classifier(
        dfc, "y", feature_cols=("fa", "fb", "fc"), iters=200)
    assert abs(wc["fc"]) < 1e-9
    import pytest as _p
    with _p.raises(ValueError, match="columns not in"):
        text.train_quality_classifier(df, "nope", feature_cols=("fa",))
    with _p.raises(ValueError, match="0/1"):
        text.train_quality_classifier(
            df.withColumn("y", F.col("fa")), "y", feature_cols=("fb",))
    with _p.raises(ValueError, match="no labeled rows"):
        text.train_quality_classifier(
            df.filter("doc_id < 0"), "y", feature_cols=("fa",))


def test_train_quality_classifier_end_to_end_on_text(spark):
    """Fit on quality_features of planted good/bad docs, score unseen
    docs of the same kinds: the full corpus-filter recipe in-engine."""
    good = ("this is a well formed sentence with the usual words and a "
            "reasonable amount of structure for the reader")
    bad = "@@@ ### $$$ %% !!! ??? ;;; ::: ~~~ ^^^ ||| &&&"
    train = [(i, good + f" variant {i}", 1) for i in range(30)] \
        + [(100 + i, bad * (1 + i % 3), 0) for i in range(30)]
    tdf = spark.createDataFrame(train, "doc_id bigint, text string, y int")
    feats = text.quality_features(tdf.select("doc_id", "text")).join(
        tdf.select("doc_id", "y"), "doc_id")
    w, bias = text.train_quality_classifier(feats, "y", iters=1000, lr=1.0)
    test_rows = [(900, good + " held out tail", 1), (901, bad + " ###", 0)]
    sdf = text.quality_classifier_score(
        spark.createDataFrame(test_rows, "doc_id bigint, text string, y int"),
        w, bias=bias)
    got = {r.doc_id: r.model_score for r in sdf.collect()}
    assert got[900] > 0.5 > got[901]


# --- feature-hashed text embeddings (r9) -----------------------------------


def test_hash_embedding_signal_replay_and_composition(spark, tables):
    """Signed feature hashing: (a) vocabulary-overlapping docs land at
    high cosine, disjoint-vocabulary docs near 0; (b) unit norm; zero-
    token docs get the zero vector; (c) the portable path replays
    bit-for-bit in DuckDB (same md5 bucket/sign, same accumulate/
    normalize op order); (d) the vectors feed embedding_neardup_pairs
    as-is; (e) partitioning-independent; (f) narrow no-shuffle plan."""
    import duckdb

    from datafusion_substrait_spark.operators import text as T

    base = ("solar panels convert sunlight into electricity using "
            "photovoltaic cells arranged on rooftops " * 3)
    near = base + " with modern inverters improving efficiency"
    other = ("violin concertos from the baroque period feature ornate "
             "melodic figuration over continuo accompaniment " * 3)
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other), (4, ""), (5, "!!! ???")],
        "doc_id bigint, text string")
    emb = T.hash_embedding(docs, dim=32, portable=True)
    vecs = {r.doc_id: r.embedding for r in emb.collect()}

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    assert cos(vecs[1], vecs[2]) > 0.9          # near-copy pair
    assert abs(cos(vecs[1], vecs[3])) < 0.5     # disjoint vocabulary
    assert abs(cos(vecs[1], vecs[1]) - 1.0) < 1e-12  # unit norm
    assert vecs[4] == [0.0] * 32 == vecs[5]     # zero-token → zero vector

    # (c) exact DuckDB replay of the portable pipeline
    con = duckdb.connect()
    con.register("docs_py", emb.sparkSession.createDataFrame(
        [(1, base), (2, near), (3, other), (4, ""), (5, "!!! ???")],
        "doc_id bigint, text string").toPandas())
    want = con.sql("""
        WITH tok AS (
            SELECT doc_id, list_filter(
                regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                x -> x <> '') AS t
            FROM docs_py
        ), bs AS (
            SELECT doc_id, list_transform(t, x -> struct_pack(
                b := CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT) % 32,
                sg := CASE WHEN CAST(('0x' || substring(md5(x), 16, 1))
                                AS BIGINT) % 2 = 0
                           THEN 1.0 ELSE -1.0 END)) AS bs
            FROM tok
        ), raw AS (
            -- coalesce: list_sum of an empty list is NULL in DuckDB,
            -- where Spark's aggregate starts from the 0.0 seed
            SELECT doc_id, list_transform(range(0, 32), i ->
                coalesce(list_sum(list_transform(bs, e ->
                    CASE WHEN e.b = i THEN e.sg ELSE 0.0 END)), 0.0)) AS r
            FROM bs
        )
        SELECT doc_id,
               CASE WHEN sqrt(list_dot_product(r, r)) > 0
                    THEN list_transform(r, v -> v / sqrt(list_dot_product(r, r)))
                    ELSE list_transform(r, v -> v * 0.0) END AS e
        FROM raw
    """).fetchall()
    got6 = {k: [round(x, 9) for x in v] for k, v in vecs.items()}
    for doc_id, e in want:
        wv = [round(float(x) if x is not None else 0.0, 9) for x in e]
        assert got6[doc_id] == wv, doc_id

    # (d) composition: near-dup over the hashed vectors finds the pair
    pairs = {(r.vec_a, r.vec_b) for r in dedup.embedding_neardup_pairs(
        emb.withColumnRenamed("doc_id", "vec_id"),
        threshold=0.9, planes=8, max_bucket_size=50).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p and 4 not in p and 5 not in p for p in pairs)

    # (e) partitioning independence
    a = sorted(map(tuple, T.hash_embedding(
        docs.repartition(1), dim=32, portable=True).collect()))
    b = sorted(map(tuple, T.hash_embedding(
        docs.repartition(7), dim=32, portable=True).collect()))
    assert a == b

    # (f) narrow plan: no Exchange, no Python — one codegen map
    plan = T.hash_embedding(tables["documents"], dim=32) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan

    with __import__("pytest").raises(ValueError, match="dim"):
        T.hash_embedding(docs, dim=0)


def test_excise_duplicate_spans_planted_semantics(spark):
    """ExactSubstr excision: the globally-first occurrence of a
    duplicated k-gram survives, every other occurrence (cross-doc AND
    within-doc) loses its covered tokens; unique text and short docs
    pass through."""
    passage = "alpha bravo charlie delta echo foxtrot golf hotel"
    docs = spark.createDataFrame([
        (1, f"unique one two three {passage} tail1 tail2"),
        (2, f"other words here {passage} and trailing stuff"),
        (3, "entirely unrelated content without repeats at all"),
        (4, f"{passage} {passage} again"),
        (5, "short doc"),
    ], ["doc_id", "text"])
    out = {r.doc_id: r for r in
           text.excise_duplicate_spans(docs, k=8).collect()}
    assert passage in out[1].text and out[1].n_tokens_excised == 0
    assert passage not in out[2].text
    assert out[2].text == "other words here and trailing stuff"
    assert out[2].n_tokens_excised == 8 and out[2].n_excised_grams == 1
    assert out[3].n_tokens_excised == 0
    # doc 4: both its occurrences are non-keepers (doc 1 is first) —
    # both 8-token spans go, the bridging grams are unique and stay
    assert out[4].text == "again" and out[4].n_tokens_excised == 16
    assert out[5].text == "short doc" and out[5].n_tokens_excised == 0
    # global invariant: every duplicated gram keeps exactly one occurrence
    assert out[1].n_excised_grams == 0


def test_excise_duplicate_spans_matches_duckdb_replay(spark, tables):
    """Full DuckDB replay of the portable path on the real corpus: same
    tokenizer, same md5-top-60-bit gram keys, same global (doc, pos)
    keeper, same coverage rule. The synthetic documents table contains
    exact clones, so the excision is non-trivial."""
    import os

    import duckdb

    from tests.conftest import SF_DIR

    K = 8
    out = text.excise_duplicate_spans(tables["documents"], k=K,
                                      portable=True).collect()
    got = {r.doc_id: (r.text, r.n_tokens_kept, r.n_tokens_excised,
                      r.n_excised_grams) for r in out}
    docs_pq = os.path.join(SF_DIR, "documents.parquet")
    rows = duckdb.sql(f"""
        WITH base AS (
            SELECT doc_id, list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'),
                t -> t != '') AS t
            FROM '{docs_pq}'
        ),
        occ AS (
            SELECT doc_id, i - 1 AS pos,
                   CAST(concat('0x', substr(md5(array_to_string(
                       t[i:i+{K}-1], chr(31))), 1, 15)) AS BIGINT) AS h
            FROM base, unnest(range(1, len(t) - {K} + 2)) AS u(i)
            WHERE len(t) >= {K}
        ),
        dup AS (
            SELECT h, min(doc_id * 4294967296 + pos) AS first_key
            FROM occ GROUP BY h HAVING count(*) >= 2
        ),
        ex AS (
            SELECT doc_id, list_sort(list(pos)) AS ex
            FROM occ JOIN dup USING (h)
            WHERE doc_id * 4294967296 + pos <> first_key
            GROUP BY doc_id
        ),
        joined AS (
            -- DuckDB lambdas cannot contain subqueries: expand each
            -- excised start to its covered range up front, then the
            -- filter lambda is a plain list_contains
            SELECT b.doc_id, b.t, coalesce(e.ex, []) AS ex,
                   flatten(list_transform(coalesce(e.ex, []),
                                          s -> range(s, s + {K}))) AS cov
            FROM base b LEFT JOIN ex e USING (doc_id)
        )
        SELECT doc_id,
               -- coalesce: a fully-excised doc is '' in Spark's
               -- array_join, NULL in DuckDB's array_to_string
               coalesce(array_to_string(list_filter(t, (tok, p) ->
                   NOT list_contains(cov, p - 1)), ' '), '') AS text,
               len(list_filter(t, (tok, p) ->
                   NOT list_contains(cov, p - 1))) AS kept,
               len(t) - len(list_filter(t, (tok, p) ->
                   NOT list_contains(cov, p - 1))) AS exc,
               len(ex) AS grams
        FROM joined
    """).fetchall()
    expect = {r[0]: (r[1], r[2], r[3], r[4]) for r in rows}
    assert got == expect and len(got) > 0
    # clones exist in the corpus, so SOME excision must have happened
    assert any(v[2] > 0 for v in got.values())


def test_flat_dot_signed_zero_matches_hof_fold(spark):
    """_flat_dot seeds its reduce with +0.0 (r13 advisory): an
    all-(-0.0)-terms dot must yield +0.0 exactly like the HOF fold's
    zero-seeded aggregate, so the two dot implementations stay
    bit-identical with no exception."""
    from datafusion_substrait_spark.operators.similarity import (
        _flat_dot, _unpacked, dot)

    df = spark.createDataFrame(
        [(1, [-0.0, 0.0, -0.0], [0.0, -0.0, 0.0])],
        "k bigint, a array<double>, b array<double>")
    flat = _unpacked(_unpacked(df, "a", "a", 3, ["k", "b"]),
                     "b", "b", 3, ["k", "a0", "a1", "a2"])
    got = flat.select(_flat_dot("a", "b", 3).alias("d")).collect()[0].d
    want = df.select(dot(F.col("a"), F.col("b")).alias("d")).collect()[0].d
    # both +0.0: equal AND same sign bit (copysign distinguishes -0.0)
    assert got == want == 0.0
    assert math.copysign(1.0, got) == math.copysign(1.0, want) == 1.0


def test_cell_scores_expr_build_matches_dsl(spark, tables):
    """r17 opt regression: ``_with_cell_scores`` builds each per-cell
    cosine column as ONE parsed ``F.expr`` string (killing ~1,100 py4j
    round trips of per-element ``F.lit`` centroid chatter per battery).
    The parse must yield the EXACT former Catalyst tree — this pins
    bit-identity (==, not approx) of every score against an in-test DSL
    reconstruction of the pre-r17 expression, on the real embeddings
    table plus a zero vector (try_divide NULL arm)."""
    from pyspark.sql import functions as F

    from datafusion_substrait_spark.operators import similarity as S

    emb = tables["embeddings"].select("vec_id", "embedding").unionByName(
        spark.createDataFrame([(10**9, [0.0] * 64)],
                              "vec_id bigint, embedding array<double>"))
    cents = S.deterministic_centroids(5, 64)

    def dsl_scores(df):  # the pre-r17 construction, verbatim
        n = S.norm(F.col("embedding"))
        return df.select("*", *[
            F.try_divide(
                S.dot(F.col("embedding"),
                      F.lit([float(v) for v in c])),
                n * F.lit(sum(x * x for x in c) ** 0.5),
            ).alias(f"__s{i}")
            for i, c in enumerate(cents)
        ])

    got = {r.vec_id: tuple(r[f"__s{i}"] for i in range(5))
           for r in S._with_cell_scores(emb, "embedding", cents).collect()}
    want = {r.vec_id: tuple(r[f"__s{i}"] for i in range(5))
            for r in dsl_scores(emb).collect()}
    assert got == want and got[10**9] == (None,) * 5


def test_m1_fused_pass_matches_unfused_composition(spark):
    """r18 m1 fusion (VERDICT r17 #3): synthetic_image_meta_features must
    be BIT-identical to the three-stage composition it replaces —
    extract_image_metadata(attach_binary_payload(docs)) joined on key with
    resize_and_features(attach_synthetic_image_payload(docs)) — and its
    plan must be a single Python stage with no join Exchange."""
    from datafusion_substrait_spark.operators import multimodal

    docs = spark.table("documents")
    fused = multimodal.synthetic_image_meta_features(docs, 64, 64, dim=64)

    meta = multimodal.extract_image_metadata(
        multimodal.attach_binary_payload(docs))
    rf = multimodal.resize_and_features(
        multimodal.attach_synthetic_image_payload(docs), 64, 64, dim=64) \
        .select("key", "pixels", "features")
    unfused = meta.join(rf, "key")

    cols = ["key", "n_bytes", "format", "width", "height",
            "payload_sha256", "pixels", "features"]
    assert fused.columns == cols
    a = {r["key"]: tuple(r) for r in fused.select(*cols).collect()}
    b = {r["key"]: tuple(r) for r in unfused.select(*cols).collect()}
    assert len(a) == len(b) > 0
    for k in a:
        ra, rb = a[k], b[k]
        # bytes/arrays compare exactly — the fused pass runs the same
        # bodies, so equality is bit-level, not approximate
        assert ra == rb, (k, ra, rb)
    # schema types identical to the join composition's
    assert [f.dataType.simpleString() for f in fused.schema.fields] == \
        [f.dataType.simpleString() for f in unfused.select(*cols).schema.fields]
    # plan shape: ONE Python stage, zero joins/exchanges in the fused pass
    phys = fused._jdf.queryExecution().executedPlan().toString()
    assert phys.count("MapInPandas") == 1
    assert "Join" not in phys and "Exchange" not in phys
