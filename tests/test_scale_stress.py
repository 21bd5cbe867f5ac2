"""Opt-in 10× replicated-corpus stress (set SPARK_GRAFT_STRESS=1 to run).

Makes the README "Scale stress" claim executable: every document gains 9
near-copies (tiny suffix perturbation), which is adversarial for LSH — the
TRUE near-dup pair set grows ~1000×, not 10×. Because the planted structure
is exact, the output size is provable, not approximate:

  pairs(10×) == 100 · pairs(1×) + 45 · n_docs

(each 1× qualifying pair becomes 10×10 clone-cross pairs; each replication
group adds C(10,2)=45 intra pairs). Asserting EQUALITY also pins LSH recall
= 1 on the planted structure end-to-end (clone Jaccard ≈ 0.99 → band
collision probability 1 − ~1e-12). Wall-clock is printed but NOT asserted:
this sandbox swings 3–10× under external load; the structural gates live in
test_plan_quality.py.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from datafusion_substrait_spark.operators import dedup

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_STRESS"),
    reason="stress run is opt-in: SPARK_GRAFT_STRESS=1",
)


def test_minhash_10x_replication_exact_pair_count(spark, tables):
    docs = tables["documents"]
    n_docs = docs.count()
    reps = spark.range(10).select(F.col("id").alias("rep"))
    docs10 = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(F.concat("text", F.lit(" v"), F.col("rep"))).alias("text"),
        )
    )

    t0 = time.perf_counter()
    base = dedup.minhash_lsh_pairs(docs, threshold=0.35).count()
    t1 = time.perf_counter()
    big = dedup.minhash_lsh_pairs(docs10, threshold=0.35).count()
    t2 = time.perf_counter()
    print(f"\nminhash 1x: {t1-t0:.1f}s {base} pairs; "
          f"10x: {t2-t1:.1f}s {big} pairs")
    assert big == 100 * base + 45 * n_docs


def test_simhash_10x_replication_groups_stay_connected(spark, tables):
    """Simhash gives no exact closed form for clone pairs: one inserted
    token shifts every per-bit vote margin by ±1, so bits sitting at a
    razor-thin margin flip — a pair of clones can legitimately exceed the
    Hamming radius (measured at sf0.01: 24/500 groups not perfectly
    clustered, IDENTICAL with the star cap disabled, i.e. it is simhash
    semantics, not the cap — the d3 oracle replays the same sets in
    DuckDB). So pin the quantified contract: every group appears in the
    graph, ≥90% of groups resolve to exactly one full 10-member cluster,
    and total output stays far below the uncapped quadratic blowup."""
    docs = tables["documents"]
    n_docs = docs.count()
    reps = spark.range(10).select(F.col("id").alias("rep"))
    docs10 = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(F.concat("text", F.lit(" v"), F.col("rep"))).alias("text"),
        )
    )
    t0 = time.perf_counter()
    pairs = dedup.simhash_pairs(docs10, max_hamming=8)
    intra = pairs.filter(F.expr("doc_a div 10 = doc_b div 10")).count()
    total = pairs.count()
    clusters = dedup.dedup_clusters(pairs)
    groups = (
        clusters.groupBy(F.expr("node div 10").alias("grp"))
        .agg(F.countDistinct("cluster_id").alias("n_clusters"),
             F.count("*").alias("n_members"))
    )
    bad = groups.filter(
        (F.col("n_clusters") != 1) | (F.col("n_members") != 10)).count()
    n_groups = groups.count()
    print(f"\nsimhash 10x: {time.perf_counter()-t0:.1f}s, {total} pairs "
          f"({intra} intra-group), {n_groups} groups, {bad} imperfect")
    assert n_groups == n_docs          # no group vanishes from the graph
    assert bad <= n_docs // 10         # >=90% perfectly clustered
    assert total < (10 * n_docs) ** 2 / 4  # far from quadratic


def test_semdedup_10x_exact_clone_collapse(spark, tables):
    """SemDeDup under 10× exact replication has a PROVABLE closed form
    (unlike the text-hash families): clones are bit-identical vectors, so
    every clone lands in its original's cell with pairwise cosine exactly
    1.0, and the keep-min-key rule must (a) keep exactly the min-rep
    clone of every vector the 1× run kept and (b) drop every other clone
    — kept(10×) == {10·k for k in kept(1×)}, an exact SET equality. Key
    order is preserved by the 10k+rep scheme (10u+9 < 10v ⟺ u < v for
    integers). The star cap is lifted for the run (10× cell sizes exceed
    it; the cap's own arithmetic is oracle-replayed by d8) so the
    equality is about semedup semantics, not cap interaction."""
    from datafusion_substrait_spark.operators import similarity

    emb = tables["embeddings"].select("vec_id", "embedding")
    cents = similarity.deterministic_centroids(8, 64)
    reps = spark.range(10).select(F.col("id").alias("rep"))
    emb10 = (
        emb.crossJoin(F.broadcast(reps))
        .select((F.col("vec_id") * 10 + F.col("rep")).alias("vec_id"),
                "embedding")
    )
    t0 = time.perf_counter()
    kept1 = {r.vec_id for r in dedup.semdedup(
        emb, cents, threshold=0.95, max_cell_size=10 ** 6
    ).filter("kept").collect()}
    t1 = time.perf_counter()
    kept10 = {r.vec_id for r in dedup.semdedup(
        emb10, cents, threshold=0.95, max_cell_size=10 ** 6
    ).filter("kept").collect()}
    t2 = time.perf_counter()
    print(f"\nsemdedup 1x: {t1-t0:.1f}s {len(kept1)} kept; "
          f"10x: {t2-t1:.1f}s {len(kept10)} kept")
    assert kept10 == {10 * k for k in kept1}


def test_dedup_clusters_10k_chain_pointer_doubling(spark):
    """The r9 pointer-doubling convergence claim at an order of magnitude
    past the in-suite 1000-link test: a 10,000-link chain (diameter 10k
    — the worst-case template-drift topology) must converge within the
    default max_iter=20, since covered distance grows ≥ 2d+1 per round
    (~13 rounds for 10k). One-hop propagation would need 10,000."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10_000)], ["doc_a", "doc_b"])
    t0 = time.perf_counter()
    got = dedup.dedup_clusters(pairs, max_iter=20)
    bad = got.filter(F.col("cluster_id") != 0).count()
    n = got.count()
    print(f"\n10k chain: {time.perf_counter()-t0:.1f}s")
    assert bad == 0 and n == 10_001


def test_hamming_store_10k_multi_generation_cycle(spark):
    """r10 directive: a 10k-signature store lifecycle — write 4k, then
    three 2k generations of increment → append, with a compaction mid-
    cycle — asserting at every step that increment == the new-touching
    subset of the batch hamming_pairs over the cumulative corpus, and
    that the post-compaction probe keeps the shuffle-free store side."""
    import numpy as np

    from datafusion_substrait_spark.operators import dedup, incremental

    rng = np.random.default_rng(1009)
    n_base, clones = 2500, 3          # 2500 * (1+3) = 10k signatures
    base = rng.integers(0, 2**63, n_base, dtype=np.int64)
    rows = []
    k = 0
    for b in base:
        rows.append((k, int(b)))
        k += 1
        for _ in range(clones):       # plant near-dups: flip <= 3 bits
            v = int(b)
            for bit in rng.integers(0, 64, rng.integers(1, 4)):
                v ^= 1 << int(bit)
            v = v - (1 << 64) if v >= (1 << 63) else v
            rows.append((k, v))
            k += 1
    sigs = spark.createDataFrame(rows, "key bigint, phash bigint")
    gens = [sigs.filter(F.col("key") % 10 < 4)] + [
        sigs.filter((F.col("key") % 10 >= 4 + 2 * g)
                    & (F.col("key") % 10 < 6 + 2 * g)) for g in range(3)]

    for t in ("hstress_hbuckets", "hstress_h_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    incremental.write_hamming_store(gens[0], "hstress", key_col="key",
                                    sig_col="phash", n_buckets=8)

    t0 = time.time()
    cumulative = gens[0]
    for g, batch in enumerate(gens[1:], start=1):
        if g == 3:                    # compact mid-cycle (after 2 appends)
            before = spark.table("hstress_hbuckets").count()
            incremental.compact_hamming_store(spark, "hstress")
            after = spark.table("hstress_hbuckets")
            assert after.count() < before
            assert after.count() \
                == after.select("band", "val").distinct().count()
        both = cumulative.unionByName(batch)
        keys = {r.key for r in batch.select("key").collect()}
        want = {(r.key_a, r.key_b, r.hamming)
                for r in dedup.hamming_pairs(
                    both, key_col="key", sig_col="phash", max_hamming=6,
                    out_prefix="key").collect()
                if r.key_a in keys or r.key_b in keys}
        got = {(r.key_a, r.key_b, r.hamming)
               for r in incremental.hamming_pairs_increment(
                   batch, "hstress", max_hamming=6).collect()}
        assert got == want and got, f"generation {g}: {len(got)} vs {len(want)}"
        incremental.append_to_hamming_store(batch, "hstress")
        cumulative = both
    print(f"hamming 10k 3-generation cycle: {time.time() - t0:.1f}s, "
          f"{len(want)} final-generation pairs")

    # post-compaction probe: the store scan must not sit under a shuffle
    # Exchange (shared structural gate; a BroadcastExchange of the small
    # test-scale store is fine — the gate targets shuffles specifically)
    from datafusion_substrait_spark.operators.dedup import _banded_sigs
    from tests.test_incremental import _assert_scan_not_under_exchange
    new_arrays = (_banded_sigs(gens[3], "key", "phash")
                  .groupBy("band", "val")
                  .agg(F.collect_list(F.struct("_k", "_sig")).alias("_new")))
    probe = new_arrays.join(spark.table("hstress_hbuckets"),
                            ["band", "val"], "left")
    _assert_scan_not_under_exchange(probe, "hstress_hbuckets")
    for t in ("hstress_hbuckets", "hstress_h_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_excision_10x_replication_exact_kept_tokens(spark, tables):
    """r11 directive: scale evidence for excise_duplicate_spans, whose
    per-gram occurrence explode is the largest intermediate in the repo.

    Each doc gains 9 IDENTICAL copies (doc_id*10+rep) — maximally
    adversarial for ExactSubstr: EVERY gram of every >=k-token doc
    becomes corpus-duplicated. The output is then provable exactly:

    - the global keeper of a gram in the 10x corpus is the rep-0 copy of
      its 1x keeper (doc_id*10+0 preserves the (doc, pos) order), so a
      rep-0 copy's covered-token set is IDENTICAL to its 1x set: per-doc
      n_tokens_kept(rep 0) == n_tokens_kept(1x), doc by doc;
    - every gram occurrence in a rep>0 copy is a non-keeper, and any
      token of a >=k-token doc is covered by some gram start, so rep>0
      copies keep EXACTLY 0 tokens;
    - docs shorter than k tokens pass through untouched, all 10 copies.

    Total kept tokens is therefore CONSTANT in the replication factor
    (plus the short-doc passthrough) — sub-linear in the strongest sense.
    Wall-clock is printed, not asserted (sandbox noise; see header)."""
    from datafusion_substrait_spark.operators import text as T

    k = 8
    docs = tables["documents"].select("doc_id", "text")
    reps = spark.range(10).select(F.col("id").alias("rep"))
    docs10 = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"), "text")

    # no-corpus-to-driver: plan CONSTRUCTION must not collect anything
    from pyspark.sql import DataFrame as _DF
    real_collect, real_topandas = _DF.collect, _DF.toPandas
    def _boom(self, *a, **kw):  # noqa: ANN001
        raise AssertionError("excise_duplicate_spans pulled data to the "
                             "driver while BUILDING the plan")
    _DF.collect, _DF.toPandas = _boom, _boom
    try:
        ex1 = T.excise_duplicate_spans(docs, k=k)
        ex10 = T.excise_duplicate_spans(docs10, k=k)
    finally:
        _DF.collect, _DF.toPandas = real_collect, real_topandas

    t0 = time.perf_counter()
    base = ex1.select("doc_id", "n_tokens_kept")
    n_docs = docs.count()
    base_rows = {r.doc_id: r.n_tokens_kept for r in base.collect()}
    t1 = time.perf_counter()
    got = ex10.select("doc_id", "n_tokens_kept").collect()
    t2 = time.perf_counter()
    print(f"\nexcision 1x: {t1-t0:.1f}s; 10x: {t2-t1:.1f}s "
          f"({len(got)} rows)")

    lengths = {r.doc_id: r.n for r in docs.select(
        "doc_id", F.size(T.tokens(F.col("text"))).alias("n")).collect()}

    assert len(got) == 10 * n_docs
    for r in got:
        b, rep = divmod(r.doc_id, 10)
        if rep == 0:
            assert r.n_tokens_kept == base_rows[b], f"rep-0 of doc {b}"
        elif lengths[b] >= k:
            assert r.n_tokens_kept == 0, f"rep {rep} of long doc {b}"
        else:
            assert r.n_tokens_kept == lengths[b], f"short doc {b}"


def test_ordered_array_agg_200k_closed_form(spark):
    """r12 ordered-aggregate rebuild at volume: 200k rows, 32 groups
    (~6.2k-element ordered arrays per group), consumed from a
    hand-authored foreign plan with sorts on every measure. The planted
    key/value relation is a closed form, so the per-group DESC arrays,
    the ordered first/last values, and a FILTERed ordered last are all
    provable exactly — no reference engine in the loop."""
    from datafusion_substrait_spark.plans.consumer import from_substrait_plan

    n, n_groups = 200_000, 32
    spark.range(n).selectExpr(
        "CAST(id % 32 AS BIGINT) AS g",
        "id AS k",
        "CAST((id * 2654435761) % 1000003 AS BIGINT) AS v",
    ).createOrReplaceTempView("ordered_stress")

    from tests.test_emit import field as fld

    measure = {
        "functionReference": 1, "arguments": [{"value": fld(2)}],
        "sorts": [{"expr": fld(1),
                   "direction": "SORT_DIRECTION_DESC_NULLS_LAST"}],
        "phase": "AGGREGATION_PHASE_INITIAL_TO_RESULT"}
    first_m = {
        "functionReference": 2, "arguments": [{"value": fld(2)}],
        "sorts": [{"expr": fld(1),
                   "direction": "SORT_DIRECTION_ASC_NULLS_LAST"}],
        "phase": "AGGREGATION_PHASE_INITIAL_TO_RESULT"}
    last_f = {"measure": {
        "functionReference": 3, "arguments": [{"value": fld(2)}],
        "sorts": [{"expr": fld(1),
                   "direction": "SORT_DIRECTION_ASC_NULLS_LAST"}],
        "phase": "AGGREGATION_PHASE_INITIAL_TO_RESULT"},
        "filter": {"scalarFunction": {
            "functionReference": 5,
            "arguments": [{"value": {"scalarFunction": {
                "functionReference": 4,
                "arguments": [{"value": fld(1)},
                              {"value": {"literal": {"i64": 3}}}]}}},
                          {"value": {"literal": {"i64": 0}}}]}}}
    plan = {
        "relations": [{"root": {"input": {"aggregate": {
            "input": {"read": {
                "common": {"direct": {}},
                "baseSchema": {"names": ["g", "k", "v"]},
                "namedTable": {"names": ["ordered_stress"]},
            }},
            "groupings": [{"groupingExpressions": [fld(0)]}],
            "measures": [{"measure": measure}, {"measure": first_m}, last_f],
        }}, "names": ["g", "vs_desc", "first_v", "last_mul3"]}}],
        "extensions": [
            {"extensionFunction": {"functionAnchor": 1, "name": "array_agg"}},
            {"extensionFunction": {"functionAnchor": 2, "name": "first_value"}},
            {"extensionFunction": {"functionAnchor": 3, "name": "last_value"}},
            {"extensionFunction": {"functionAnchor": 4, "name": "mod"}},
            {"extensionFunction": {"functionAnchor": 5, "name": "equal"}},
        ],
    }
    t0 = time.time()
    rows = {r.g: r for r in from_substrait_plan(spark, plan).collect()}
    elapsed = time.time() - t0

    def val(k):
        return (k * 2654435761) % 1000003

    assert len(rows) == n_groups
    for g in range(n_groups):
        keys_desc = list(range(n - n_groups + g, g - 1, -n_groups))
        want = [val(k) for k in keys_desc]
        got = rows[g]
        assert list(got.vs_desc) == want, f"group {g} ordered array diverged"
        assert got.first_v == val(keys_desc[-1])
        mul3 = [k for k in reversed(keys_desc) if k % 3 == 0]
        assert got.last_mul3 == val(mul3[-1])
    print(f"ordered array_agg 200k rows x {n_groups} groups: "
          f"{elapsed:.2f}s, arrays of {len(keys_desc)}")
    spark.catalog.dropTempView("ordered_stress")


def test_image_phash_10x_replication_closed_form_pairs(spark, tables):
    """The r13 perceptual-hash family at 10× volume with an EXACT closed
    form: class-keyed synthetic PNGs give every doc in class c the
    signature ahash(sha256(str(c))) — computable in plain Python — so the
    expected hamming_pairs output size is provable without any engine in
    the loop: all within-class pairs (hamming 0) plus every cross-class
    pair whose class signatures band-collide AND sit within the radius.
    Pins that the banding/cap machinery holds its contract when buckets
    grow 10× (50-member buckets at sf0.01×10, still under the 500 cap)."""
    import hashlib

    from datafusion_substrait_spark.operators import multimodal

    docs = tables["documents"]
    n_docs = docs.count()
    reps = spark.range(10).select(F.col("id").alias("rep"))
    docs10 = (
        docs.crossJoin(F.broadcast(reps))
        .select((F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
                "text")
        .withColumn("pcls", (F.col("doc_id") % 100).cast("string"))
    )

    def ahash(cls: int) -> int:
        d = hashlib.sha256(str(cls).encode()).digest()
        s = sum(d)
        v = 0
        for i in range(64):
            if d[i % 32] * 32 > s:
                v |= 1 << i
        return v  # unsigned is fine: hamming/banding are wrap-invariant

    sizes = {c: 0 for c in range(100)}
    for i in range(n_docs * 10):
        sizes[i % 100] += 1
    sig = {c: ahash(c) for c in range(100)}
    expected = sum(sz * (sz - 1) // 2 for sz in sizes.values())
    for a in range(100):
        for b in range(a + 1, 100):
            x = sig[a] ^ sig[b]
            if bin(x).count("1") <= 6 and any(
                    (x >> (16 * j)) & 0xFFFF == 0 for j in range(4)):
                expected += sizes[a] * sizes[b]

    t0 = time.perf_counter()
    imgs = multimodal.attach_synthetic_image_payload(
        docs10, text_col="pcls", key_col="doc_id")
    sigs = multimodal.image_phash(imgs, kind="ahash")
    got = dedup.hamming_pairs(sigs, key_col="key", sig_col="phash",
                              max_hamming=6).count()
    print(f"\nimage phash 10x: {time.perf_counter()-t0:.1f}s, "
          f"{got} pairs (expected {expected})")
    assert got == expected


def test_training_shards_10x_selfconsistent_token_stream(spark, tables,
                                                         tmp_path):
    """r14 egress at 10×, no engine in the verification loop: the shard
    files are SELF-verifying. Reading each shard=N file in physical
    order (parquet _metadata.row_index), the running token cumsum must
    equal bin_id*max_tokens + bin_offset row by row — exactly the
    dataloader's seek arithmetic — with every doc exactly once and
    shard == key mod n_shards. n_shards=64 exceeds the 32 shuffle
    partitions, so multi-shard writer tasks are exercised (partitionBy
    must still give each shard ONE file, or row_index stops being the
    concatenation position — the t13 oracle leg's load-bearing
    property)."""
    from datafusion_substrait_spark.operators import packing

    docs = tables["documents"].select("doc_id", "text")
    reps = spark.range(10).select(F.col("id").alias("rep"))
    docs10 = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"), "text")
    n = docs10.count()
    path = str(tmp_path / "shards10x")
    t0 = time.perf_counter()
    packing.write_training_shards(docs10, path, max_tokens=256,
                                  n_shards=64)
    t1 = time.perf_counter()
    rows = spark.read.parquet(path).select(
        "doc_id", F.col("shard").cast("int").alias("shard"),
        "n_tokens", "bin_id", "bin_offset",
        F.col("_metadata.row_index").alias("pos"),
        F.col("_metadata.file_path").alias("fp")).collect()
    print(f"\nshards 10x: write {t1-t0:.1f}s, {n} rows, 64 shards")

    assert len(rows) == n
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r.doc_id % 64 == r.shard
        by_shard.setdefault(r.shard, []).append(r)
    assert sorted(by_shard) == list(range(64))
    seen = set()
    for shard, rs in by_shard.items():
        assert len({r.fp for r in rs}) == 1, f"shard {shard} split files"
        rs.sort(key=lambda r: r.pos)
        cum = 0
        for i, r in enumerate(rs):
            assert r.pos == i, f"shard {shard} row_index gap at {i}"
            assert r.bin_id * 256 + r.bin_offset == cum, \
                f"shard {shard} pos {i}: seek arithmetic diverged"
            cum += r.n_tokens
            assert r.doc_id not in seen
            seen.add(r.doc_id)


def test_training_shards_multifile_10x_selfconsistent(spark, tables,
                                                      tmp_path):
    """r15 mf egress at 10×, self-verifying like the single-file stress
    above: with bins_per_file the shard sub-splits into file_seq=K dirs
    written by PARALLEL tasks, and the loader contract is that
    concatenating a shard's files in numeric file_seq order restores the
    single-file row order. Verified with no engine in the loop: sorting
    each shard's rows by (file_seq, row_index), the running token cumsum
    must equal bin_id*max_tokens + bin_offset row by row ACROSS file
    boundaries, each (shard, file_seq) dir must hold exactly one file,
    file_seq must equal bin_id // bins_per_file, and the zero-padded
    directory names must sort lexicographically == numerically."""
    import os

    from datafusion_substrait_spark.operators import packing

    docs = tables["documents"].select("doc_id", "text")
    reps = spark.range(10).select(F.col("id").alias("rep"))
    docs10 = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"), "text")
    n = docs10.count()
    path = str(tmp_path / "shards10x_mf")
    t0 = time.perf_counter()
    packing.write_training_shards(docs10, path, max_tokens=256,
                                  n_shards=16, bins_per_file=8)
    t1 = time.perf_counter()
    rows = spark.read.parquet(path).select(
        "doc_id", F.col("shard").cast("int").alias("shard"),
        F.col("file_seq").cast("long").alias("file_seq"),
        "n_tokens", "bin_id", "bin_offset",
        F.col("_metadata.row_index").alias("pos"),
        F.col("_metadata.file_path").alias("fp")).collect()
    print(f"\nshards 10x mf: write {t1-t0:.1f}s, {n} rows, "
          f"{len({(r.shard, r.file_seq) for r in rows})} file dirs")

    assert len(rows) == n
    # zero-padded dir names: lexicographic == numeric
    for d in os.listdir(path):
        if not d.startswith("shard="):
            continue
        vals = [x.split("=", 1)[1] for x in os.listdir(os.path.join(path, d))
                if x.startswith("file_seq=")]
        assert vals and all(len(v) == 9 and v.isdigit() for v in vals)
        assert sorted(vals) == sorted(vals, key=int)
    by_sf: dict[tuple, set] = {}
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r.doc_id % 16 == r.shard
        assert r.file_seq == r.bin_id // 8, (r.shard, r.bin_id, r.file_seq)
        by_sf.setdefault((r.shard, r.file_seq), set()).add(r.fp)
        by_shard.setdefault(r.shard, []).append(r)
    assert all(len(fps) == 1 for fps in by_sf.values()), \
        "a (shard, file_seq) dir split across writer tasks"
    assert len({sf[1] for sf in by_sf}) > 1, "degenerate single-file split"
    seen = set()
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (r.file_seq, r.pos))
        cum = 0
        for i, r in enumerate(rs):
            assert r.bin_id * 256 + r.bin_offset == cum, \
                f"shard {shard} concat pos {i}: seek arithmetic diverged"
            cum += r.n_tokens
            assert r.doc_id not in seen
            seen.add(r.doc_id)
    assert len(seen) == n


def test_training_shards_split_files_10x_loader_restores_order(
        spark, tables, tmp_path):
    """r17 split-counter egress at 10× (VERDICT r16 #4's stress tier):
    the single-file layout written with spark.sql.files.maxRecordsPerFile
    forcing several -cNNN split files per shard dir, read back through
    the SHIPPED read_training_shards (layout guard on). Self-verifying
    with no engine in the loop: walking each shard in the loader's
    restored ``pos`` order, the running token cumsum must equal
    bin_id*max_tokens + bin_offset row by row ACROSS split-file
    boundaries — one counter mis-sort anywhere and the seek arithmetic
    diverges at that row. Also asserts the split genuinely happened in
    every shard and every doc appears exactly once."""
    from datafusion_substrait_spark.operators import packing

    docs = tables["documents"].select("doc_id", "text")
    reps = spark.range(10).select(F.col("id").alias("rep"))
    docs10 = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"), "text")
    n = docs10.count()
    path = str(tmp_path / "shards10x_sp")
    mrpf = max(1, n // 16 // 4)  # ~4-5 split files per shard dir
    old = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", str(mrpf))
    t0 = time.perf_counter()
    try:
        packing.write_training_shards(docs10, path, max_tokens=256,
                                      n_shards=16)
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", old)
    t1 = time.perf_counter()
    rows = packing.read_training_shards(spark, path).select(
        "doc_id", F.col("shard").cast("int").alias("shard"),
        "n_tokens", "bin_id", "bin_offset", "pos",
        F.col("_metadata.file_name").alias("fn")).collect()
    print(f"\nshards 10x split: write {t1-t0:.1f}s, {n} rows, "
          f"{len({(r.shard, r.fn) for r in rows})} files, mrpf={mrpf}")

    assert len(rows) == n
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r.doc_id % 16 == r.shard
        by_shard.setdefault(r.shard, []).append(r)
    assert sorted(by_shard) == list(range(16))
    seen = set()
    for shard, rs in by_shard.items():
        assert len({r.fn for r in rs}) >= 2, \
            f"shard {shard}: maxRecordsPerFile did not split — test inert"
        rs.sort(key=lambda r: r.pos)
        cum = 0
        for i, r in enumerate(rs):
            assert r.pos == i, f"shard {shard} pos gap at {i}"
            assert r.bin_id * 256 + r.bin_offset == cum, \
                f"shard {shard} pos {i}: seek arithmetic diverged " \
                "(split-counter order broken)"
            cum += r.n_tokens
            assert r.doc_id not in seen
            seen.add(r.doc_id)
    assert len(seen) == n
