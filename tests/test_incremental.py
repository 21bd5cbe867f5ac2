"""Incremental dedup against a persisted signature store
(operators/incremental.py): batch-equality of the increment, shuffle-free
store-side plan gates, first-seen exact dedup, and store append."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_substrait_spark.operators import dedup, incremental
from datafusion_substrait_spark.sources import sinks

PARAMS = dict(num_hashes=16, bands=4, shingle_n=4)
STORE = "inc_store"


def _drop_store(spark, store=STORE):
    import shutil
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for suffix in ("_bands", "_buckets", "_shingles", "_meta", "_fps",
                   "_e_meta", "_buckets_compact_old",
                   "_buckets_compact_tmp"):
        spark.sql(f"DROP TABLE IF EXISTS {store}{suffix}")
        # a crashed earlier run can leave the managed-table dir behind with
        # no catalog entry; saveAsTable then fails LOCATION_ALREADY_EXISTS
        shutil.rmtree(f"{warehouse}/{store}{suffix}", ignore_errors=True)


@pytest.fixture(scope="module")
def split_docs(spark):
    """documents split deterministically into an 'old' corpus and a 'new'
    batch; the split puts ~1/3 of docs (including members of known dup
    clusters — documents.parquet plants near-dups) into the new batch."""
    docs = spark.table("documents").select("doc_id", "text")
    old = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) != 0)
    new = docs.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == 0)
    return docs, old, new


def _pairs(df):
    return {(r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}


def test_increment_equals_batch_rerun(spark, split_docs):
    docs, old, new = split_docs
    _drop_store(spark)
    incremental.write_minhash_store(old, STORE, n_buckets=4, **PARAMS)

    full = _pairs(dedup.minhash_lsh_pairs(docs, threshold=0.5, **PARAMS))
    old_only = _pairs(dedup.minhash_lsh_pairs(old, threshold=0.5, **PARAMS))
    inc = _pairs(incremental.minhash_lsh_pairs_increment(
        new, STORE, threshold=0.5))

    new_keys = {r.doc_id for r in new.select("doc_id").collect()}
    assert inc, "planted near-dup clusters must straddle the split"
    assert all(a in new_keys or b in new_keys for a, b, _ in inc)
    # the old-only run is exactly the batch pairs touching no new doc,
    # so increment ∪ old-only must reconstruct the full batch rerun
    assert old_only == {(a, b, j) for a, b, j in full
                        if a not in new_keys and b not in new_keys}
    assert (inc | old_only) == full
    _drop_store(spark)


def _assert_scan_not_under_exchange(df, table_marker):
    """Structural gate: the store table's scan must not sit below any
    shuffle Exchange — the bucketed layout IS the distribution."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # rebuild under non-adaptive planning
        plan = df._jdf.queryExecution().executedPlan()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    offenders = []

    def walk(node, under_exchange):
        name = node.nodeName()
        if name == "Exchange":
            under_exchange = True
        simple = node.simpleString(200)
        if table_marker in simple and under_exchange:
            offenders.append(simple)
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i), under_exchange)

    walk(plan, False)
    assert not offenders, offenders


def test_store_side_probe_is_shuffle_free(spark, split_docs):
    _, old, new = split_docs
    _drop_store(spark)
    incremental.write_minhash_store(old, STORE, n_buckets=4, **PARAMS)

    # the store-side bucket aggregation alone: zero Exchange anywhere
    agg = (spark.table(f"{STORE}_bands").groupBy("band", "sig")
           .agg(F.collect_list("doc_id").alias("ids")))
    _assert_scan_not_under_exchange(agg, f"{STORE}_bands")

    # the probe join: only the new side may shuffle
    new_buckets = (dedup._banded_rows(new, "text", "doc_id", **PARAMS)
                   .groupBy("band", "sig")
                   .agg(F.collect_list("doc_id").alias("new_ids")))
    probe = new_buckets.join(
        spark.table(f"{STORE}_bands").groupBy("band", "sig")
        .agg(F.collect_list("doc_id").alias("old_ids")),
        ["band", "sig"], "left")
    _assert_scan_not_under_exchange(probe, f"{STORE}_bands")

    # the verify-side shingle lookup: store side shuffle-free too
    ids = new.select("doc_id")
    lookup = spark.table(f"{STORE}_shingles").join(ids, "doc_id",
                                                   "left_semi")
    _assert_scan_not_under_exchange(lookup, f"{STORE}_shingles")
    _drop_store(spark)


def _walk_plan(node, fn, ancestors=()):
    fn(node, ancestors)
    kids = node.children()
    for i in range(kids.size()):
        _walk_plan(kids.apply(i), fn, ancestors + (node,))


def test_probe_uses_preaggregated_buckets_no_store_agg(spark, split_docs):
    """r7 upgrade: the increment probes {store}_buckets (pre-aggregated
    arrays) — no aggregate may sit between the buckets-table scan and the
    probe join, and the scan must not sit under an Exchange. The old
    shape re-aggregated the FULL bands table every increment: O(store)
    agg work for an O(batch)-sized question."""
    _, old, new = split_docs
    _drop_store(spark)
    incremental.write_minhash_store(old, STORE, n_buckets=4, **PARAMS)
    assert spark.catalog.tableExists(f"{STORE}_buckets")

    inc = incremental.minhash_lsh_pairs_increment(new, STORE, threshold=0.5)
    # result is checkpointed (eager); gate the probe subplan instead
    new_buckets = (dedup._banded_rows(new, "text", "doc_id", **PARAMS)
                   .groupBy("band", "sig")
                   .agg(F.collect_list("doc_id").alias("_new_ids")))
    probe = new_buckets.join(spark.table(f"{STORE}_buckets"),
                             ["band", "sig"], "left")
    _assert_scan_not_under_exchange(probe, f"{STORE}_buckets")
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = probe._jdf.queryExecution().executedPlan()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    offenders = []

    def check(node, ancestors):
        if f"{STORE}_buckets" not in node.simpleString(200):
            return
        if any("Aggregate" in a.nodeName() for a in ancestors):
            offenders.append([a.nodeName() for a in ancestors])

    _walk_plan(plan, check)
    assert not offenders, (
        f"aggregation above the {STORE}_buckets scan: {offenders}")
    assert inc.count() > 0
    _drop_store(spark)


def test_increment_fallback_for_pre_buckets_store(spark, split_docs):
    """A store written without {store}_buckets (pre-r7 layout) must still
    probe correctly through the bands-table aggregation, and produce the
    same pairs as the upgraded layout."""
    docs, old, new = split_docs
    _drop_store(spark)
    incremental.write_minhash_store(old, STORE, n_buckets=4, **PARAMS)
    with_buckets = _pairs(incremental.minhash_lsh_pairs_increment(
        new, STORE, threshold=0.5))
    spark.sql(f"DROP TABLE {STORE}_buckets")
    without = _pairs(incremental.minhash_lsh_pairs_increment(
        new, STORE, threshold=0.5))
    assert with_buckets == without and with_buckets
    _drop_store(spark)


def test_increment_leaves_no_persisted_rdds(spark, split_docs):
    """The r6 layout leaked two persisted DataFrames per increment for the
    session's lifetime; the increment now unpersists its intermediates
    (the eager localCheckpoint of the small result is ContextCleaner-
    managed, not a session-lifetime cache)."""
    _, old, new = split_docs
    _drop_store(spark)
    incremental.write_minhash_store(old, STORE, n_buckets=4, **PARAMS)
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    inc = incremental.minhash_lsh_pairs_increment(new, STORE, threshold=0.5)
    inc.count()
    after = jsc.getPersistentRDDs().size()
    # the checkpointed result RDD itself may register (reclaimed when the
    # DataFrame is dropped); the two per-call .persist() caches must not
    assert after - before <= 1, (
        f"{after - before} persisted RDDs leaked by one increment")
    _drop_store(spark)


def test_increment_refuses_mismatched_meta(spark, split_docs):
    """Parameters travel with the store: a multi-row meta table (a botched
    manual write) must raise, not probe with arbitrary parameters."""
    _, old, new = split_docs
    _drop_store(spark)
    incremental.write_minhash_store(old.limit(30), STORE, n_buckets=2,
                                    **PARAMS)
    spark.createDataFrame(
        [(8, 2, 3, "text", "doc_id")],
        "num_hashes int, bands int, shingle_n int, text_col string, "
        "key_col string").write.mode("append").format("parquet") \
        .saveAsTable(f"{STORE}_meta")
    with pytest.raises(ValueError, match="exactly one parameter row"):
        incremental.minhash_lsh_pairs_increment(new.limit(5), STORE)
    _drop_store(spark)


def test_exact_increment_first_seen_wins(spark):
    _drop_store(spark)
    old = spark.createDataFrame(
        [(10, "alpha beta"), (11, "gamma delta"), (12, "alpha  BETA")],
        "doc_id bigint, text string")  # 12 duplicates 10 (normalization)
    new = spark.createDataFrame(
        [(1, "ALPHA beta"),      # dup of stored fp, smaller key: dropped
         (2, "epsilon zeta"),    # fresh
         (3, "epsilon  ZETA"),   # in-batch dup of 2: dropped (2 < 3)
         (4, "eta theta")],      # fresh
        "doc_id bigint, text string")
    incremental.write_exact_store(old, STORE, n_buckets=2)
    inc = incremental.exact_dedup_increment(new, STORE)
    got = {r.doc_id for r in inc.collect()}
    assert got == {2, 4}
    # survivor fingerprint SET equals the batch rerun's
    full_fps = {r.fingerprint for r in
                dedup.exact_dedup(old.unionByName(new)).collect()}
    stored_fps = {r.fingerprint for r in
                  spark.table(f"{STORE}_fps").collect()}
    inc_fps = {r.fingerprint for r in inc.collect()}
    assert stored_fps | inc_fps == full_fps
    _drop_store(spark)


def test_append_then_second_increment(spark, split_docs):
    """Three generations: store(old) → increment(new) → append(new) →
    increment(new2) must equal the new2-touching subset of a full batch
    run over all three generations."""
    docs, old, new_all = split_docs
    new = new_all.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    new2 = new_all.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 1)
    _drop_store(spark)
    incremental.write_minhash_store(old, STORE, n_buckets=4, **PARAMS)
    incremental.minhash_lsh_pairs_increment(new, STORE, threshold=0.5)
    incremental.append_to_minhash_store(new, STORE)

    inc2 = _pairs(incremental.minhash_lsh_pairs_increment(
        new2, STORE, threshold=0.5))
    full = _pairs(dedup.minhash_lsh_pairs(docs, threshold=0.5, **PARAMS))
    new2_keys = {r.doc_id for r in new2.select("doc_id").collect()}
    expect = {(a, b, j) for a, b, j in full
              if a in new2_keys or b in new2_keys}
    assert inc2 == expect and inc2
    _drop_store(spark)


def test_compact_merges_generations_and_preserves_results(spark, split_docs):
    """After two appended generations the buckets table holds multiple
    rows per touched (band, sig); compaction collapses them to exactly
    one row per bucket, preserves every increment result bit-for-bit,
    and the renamed table keeps its bucketed (shuffle-free) layout."""
    docs, old, new_all = split_docs
    new = new_all.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    new2 = new_all.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 1)
    _drop_store(spark)
    incremental.write_minhash_store(old, STORE, n_buckets=4, **PARAMS)
    incremental.append_to_minhash_store(new, STORE)

    buckets = spark.table(f"{STORE}_buckets")
    pre_rows = buckets.count()
    n_distinct = buckets.select("band", "sig").distinct().count()
    assert pre_rows > n_distinct, "appends must add generation rows"

    before = _pairs(incremental.minhash_lsh_pairs_increment(
        new2, STORE, threshold=0.5))
    incremental.compact_minhash_store(spark, STORE)
    after_tbl = spark.table(f"{STORE}_buckets")
    assert after_tbl.count() == n_distinct
    # every row's ids array is sorted (the pair-expansion contract)
    bad = after_tbl.filter(
        F.col("ids") != F.sort_array("ids")).count()
    assert bad == 0
    after = _pairs(incremental.minhash_lsh_pairs_increment(
        new2, STORE, threshold=0.5))
    assert before == after and after

    # the renamed table still carries the bucketing spec: the probe
    # aggregation stays shuffle-free
    agg = (spark.table(f"{STORE}_buckets").groupBy("band", "sig")
           .agg(F.count(F.lit(1)).alias("n")))
    _assert_scan_not_under_exchange(agg, f"{STORE}_buckets")

    # pre-r7 layout (no buckets table) gets a named error
    spark.sql(f"DROP TABLE {STORE}_buckets")
    with pytest.raises(ValueError, match="no\\s+.*buckets table|buckets table"):
        incremental.compact_minhash_store(spark, STORE)
    _drop_store(spark)


def test_compact_recovers_every_crash_window(spark, split_docs):
    """The rename-aside swap (r7 ADVICE) leaves the store recoverable at
    every crash point; a re-run of compact must finish or roll back the
    interrupted swap and then compact normally, and increments must keep
    returning the same pairs throughout."""
    docs, old_docs, new_all = split_docs
    new = new_all.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    new2 = new_all.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 1)
    table = f"{STORE}_buckets"
    tmp, old = f"{table}_compact_tmp", f"{table}_compact_old"

    def fresh_store():
        _drop_store(spark)
        for t in (tmp, old):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        incremental.write_minhash_store(old_docs, STORE, n_buckets=4,
                                        **PARAMS)
        incremental.append_to_minhash_store(new, STORE)
        return _pairs(incremental.minhash_lsh_pairs_increment(
            new2, STORE, threshold=0.5))

    # window 1: crash after writing tmp, before the swap (tmp possibly
    # stale) — recovery drops tmp and recompacts
    expect = fresh_store()
    sinks.write_bucketed(spark.table(table).limit(1), tmp, ("band", "sig"),
                         n_buckets=4, mode="overwrite")
    incremental.compact_minhash_store(spark, STORE)
    assert not spark.catalog.tableExists(tmp)
    assert not spark.catalog.tableExists(old)
    got = _pairs(incremental.minhash_lsh_pairs_increment(
        new2, STORE, threshold=0.5))
    assert got == expect and got

    # window 2: crash between the renames (table→old done, tmp complete)
    # — recovery promotes tmp and drops old
    expect = fresh_store()
    merged = (spark.table(table).groupBy("band", "sig")
              .agg(F.sort_array(F.flatten(F.collect_list("ids")))
                   .alias("ids")))
    sinks.write_bucketed(merged, tmp, ("band", "sig"), n_buckets=4,
                         mode="overwrite")
    spark.sql(f"ALTER TABLE {table} RENAME TO {old}")
    incremental.compact_minhash_store(spark, STORE)
    assert not spark.catalog.tableExists(tmp)
    assert not spark.catalog.tableExists(old)
    got = _pairs(incremental.minhash_lsh_pairs_increment(
        new2, STORE, threshold=0.5))
    assert got == expect and got

    # window 3: crash after promoting tmp, before dropping old —
    # recovery just drops old
    expect = fresh_store()
    spark.sql(f"CREATE TABLE {old} AS SELECT * FROM {table} LIMIT 1")
    incremental.compact_minhash_store(spark, STORE)
    assert not spark.catalog.tableExists(old)
    got = _pairs(incremental.minhash_lsh_pairs_increment(
        new2, STORE, threshold=0.5))
    assert got == expect and got
    _drop_store(spark)


def test_hamming_store_increment_equals_batch(spark):
    """The Hamming store invariant over REAL image perceptual hashes:
    increment(new) == the new-touching subset of hamming_pairs(old ∪
    new); a second generation (append then increment again) keeps the
    invariant; compaction collapses generations and preserves results;
    a shuffle-free probe plan on the store side."""
    import numpy as np

    from datafusion_substrait_spark.operators import multimodal
    from tests.test_operators import _encode_png

    rng = np.random.default_rng(31)
    scan = (list(range(5)) * 7)[:32]

    def png(img):
        return bytes(_encode_png(img.tolist(), 0, scan))

    base = [rng.integers(0, 256, (32, 32), np.uint8) for _ in range(6)]
    payloads = {}
    k = 0
    for b in base:                       # 3 noised copies of each base
        for _ in range(3):
            noised = np.clip(b.astype(int)
                             + rng.integers(-2, 3, b.shape),
                             0, 255).astype(np.uint8)
            payloads[k] = png(noised)
            k += 1
    df = spark.createDataFrame(sorted(payloads.items()),
                               "key bigint, payload binary")
    sigs = multimodal.image_phash(df)
    old = sigs.filter(F.col("key") % 3 != 0)
    new1 = sigs.filter(F.col("key") % 3 == 0).filter(F.col("key") < 9)
    new2 = sigs.filter(F.col("key") % 3 == 0).filter(F.col("key") >= 9)

    for t in ("hstore_hbuckets", "hstore_h_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    incremental.write_hamming_store(old, "hstore", n_buckets=4)

    full = {(r.key_a, r.key_b, r.hamming) for r in dedup.hamming_pairs(
        sigs, key_col="key", sig_col="phash", max_hamming=6,
        out_prefix="key").collect()}

    def expect_touching(keys):
        return {(a, b, h) for a, b, h in full if a in keys or b in keys}

    inc1 = {(r.key_a, r.key_b, r.hamming)
            for r in incremental.hamming_pairs_increment(
                new1, "hstore", max_hamming=6).collect()}
    k1 = {r.key for r in new1.select("key").collect()}
    k2 = {r.key for r in new2.select("key").collect()}
    # generation-1 increment can't see generation-2 keys
    assert inc1 == {p for p in expect_touching(k1)
                    if not (p[0] in k2 or p[1] in k2)} and inc1

    incremental.append_to_hamming_store(new1, "hstore")
    inc2 = {(r.key_a, r.key_b, r.hamming)
            for r in incremental.hamming_pairs_increment(
                new2, "hstore", max_hamming=6).collect()}
    assert inc2 == expect_touching(k2) and inc2

    # compaction: multiple generation rows collapse, results identical
    buckets = spark.table("hstore_hbuckets")
    assert buckets.count() > buckets.select("band", "val").distinct().count()
    incremental.compact_hamming_store(spark, "hstore")
    after = spark.table("hstore_hbuckets")
    assert after.count() == after.select("band", "val").distinct().count()
    inc2b = {(r.key_a, r.key_b, r.hamming)
             for r in incremental.hamming_pairs_increment(
                 new2, "hstore", max_hamming=6).collect()}
    assert inc2b == inc2

    # store side of the probe join reads the bucketed table with no
    # Exchange between scan and join (downstream pair-expansion shuffles
    # sit above legitimately — gate the probe subplan, the same approach
    # as the minhash buckets gate)
    from datafusion_substrait_spark.operators.dedup import _banded_sigs
    new_arrays = (_banded_sigs(new2, "key", "phash")
                  .groupBy("band", "val")
                  .agg(F.collect_list(F.struct("_k", "_sig")).alias("_new")))
    probe = new_arrays.join(spark.table("hstore_hbuckets"),
                            ["band", "val"], "left")
    _assert_scan_not_under_exchange(probe, "hstore_hbuckets")
    for t in ("hstore_hbuckets", "hstore_h_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_append_recovers_interrupted_compact_swap(spark):
    """r14 review catch: a crash between compact's two renames hides
    {store}_buckets behind *_compact_old; append's layout probe then
    silently appended to bands only, and a later compact recovery
    promoted the PRE-append buckets table — the probe path permanently
    missed that generation's near-duplicates. append must recover the
    swap FIRST, and the post-append increment must pair new docs
    against the appended generation through the buckets path."""
    _drop_store(spark)
    g1 = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog"),
         (11, "entirely unrelated text about databases")],
        "doc_id bigint, text string")
    g2 = spark.createDataFrame(
        [(20, "the quick brown fox jumps over the lazy dogs")],
        "doc_id bigint, text string")
    g3 = spark.createDataFrame(
        [(30, "the quick brown fox jumps over the lazy dog!")],
        "doc_id bigint, text string")
    incremental.write_minhash_store(g1, STORE, n_buckets=2, **PARAMS)

    # simulate the crash window: buckets table renamed aside, new table
    # not yet promoted (the state _recover_compact_swap rolls back)
    spark.sql(f"ALTER TABLE {STORE}_buckets RENAME TO "
              f"{STORE}_buckets_compact_old")
    assert not spark.catalog.tableExists(f"{STORE}_buckets")

    incremental.append_to_minhash_store(g2, STORE)
    # the swap was recovered and the generation landed in the buckets table
    assert spark.catalog.tableExists(f"{STORE}_buckets")
    assert not spark.catalog.tableExists(f"{STORE}_buckets_compact_old")
    n_gen = spark.table(f"{STORE}_buckets").count()
    assert n_gen > 0

    # and a later increment pairs g3 against BOTH prior generations
    inc = incremental.minhash_lsh_pairs_increment(g3, STORE, threshold=0.5)
    partners = {r.doc_a for r in inc.collect()} | \
               {r.doc_b for r in inc.collect()}
    assert 10 in partners and 20 in partners and 30 in partners


def test_exact_store_meta_pins_columns(spark):
    """r14 review catch: write_exact_store persisted no meta, so a probe
    with default column names against a store built on different ones
    silently never matched. The meta table now pins them; the increment
    reads the store's columns even when called with the defaults."""
    _drop_store(spark)
    old = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")],
        "doc_id bigint, body string")
    new = spark.createDataFrame(
        [(7, "ALPHA  beta"), (8, "epsilon zeta")],
        "doc_id bigint, body string")
    incremental.write_exact_store(old, STORE, text_col="body",
                                  n_buckets=2)
    # defaults (text_col='text') would have crashed or silently missed;
    # the meta override must dedup 7 against stored 1 and keep 8
    inc = incremental.exact_dedup_increment(new, STORE)
    assert {r.doc_id for r in inc.collect()} == {8}


def test_streaming_exact_dedup_batch_redelivered_row_once(spark):
    """r14 review catch: an exactly-redelivered event (same event_id,
    verbatim row — at-least-once delivery) survived its own dedup in the
    batch path because the min+equi-join matched both copies. Exactly
    one row per fingerprint must come back, matching the streaming
    path's single-emit contract."""
    from datafusion_substrait_spark.streaming import stateful

    events = spark.createDataFrame(
        [(100, 1, "click", 1.5),
         (100, 1, "click", 1.5),      # verbatim redelivery
         (200, 1, "view", 2.0),
         (150, 2, "click", 9.0),
         (140, 2, "click", 3.0)],     # smaller event_id wins for (2, click)
        "event_id bigint, user_id bigint, event_type string, value double")
    out = stateful.streaming_exact_dedup(events).collect()
    assert len(out) == 3
    by_uid = {(r.user_id, r.event_id) for r in out}
    assert (1, 100) in by_uid and (1, 200) in by_uid and (2, 140) in by_uid


def _drop_hamming(spark, store):
    import shutil
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for suffix in ("_hbuckets", "_h_meta", "_hbuckets_compact_old",
                   "_hbuckets_compact_tmp"):
        spark.sql(f"DROP TABLE IF EXISTS {store}{suffix}")
        shutil.rmtree(f"{warehouse}/{store}{suffix}", ignore_errors=True)


def test_hamming_append_and_increment_recover_interrupted_compact_swap(spark):
    """r15 (ADVICE r14, medium): the r14 crash-recovery fix covered the
    minhash paths only — append_to_hamming_store and
    hamming_pairs_increment touched {store}_hbuckets without recovering
    an interrupted compact first, so a crash between
    compact_hamming_store's two renames left the parallel store offline
    (table-lookup error) until someone happened to re-run compact. Both
    entry points must recover the swap themselves."""
    store = "hrec"
    _drop_hamming(spark, store)
    g1 = spark.createDataFrame(
        [(1, 0x0F0F0F0F0F0F0F0F), (2, -1234567890123456789)],
        "key bigint, phash bigint")
    g2 = spark.createDataFrame([(3, 0x0F0F0F0F0F0F0F0E)],
                               "key bigint, phash bigint")  # 1 bit from key 1
    g3 = spark.createDataFrame([(4, 0x0F0F0F0F0F0F0F0C)],
                               "key bigint, phash bigint")  # 2 bits from key 1
    incremental.write_hamming_store(g1, store, n_buckets=2)

    # crash window: hbuckets renamed aside, compacted table not promoted
    spark.sql(f"ALTER TABLE {store}_hbuckets RENAME TO "
              f"{store}_hbuckets_compact_old")
    assert not spark.catalog.tableExists(f"{store}_hbuckets")
    incremental.append_to_hamming_store(g2, store)  # must recover, not fail
    assert spark.catalog.tableExists(f"{store}_hbuckets")
    assert not spark.catalog.tableExists(f"{store}_hbuckets_compact_old")

    # same crash window again: the increment must also self-recover and
    # pair the probe batch against BOTH prior generations
    spark.sql(f"ALTER TABLE {store}_hbuckets RENAME TO "
              f"{store}_hbuckets_compact_old")
    inc = incremental.hamming_pairs_increment(g3, store, max_hamming=6)
    assert spark.catalog.tableExists(f"{store}_hbuckets")
    partners = set()
    for r in inc.collect():
        partners |= {r.key_a, r.key_b}
    assert {1, 3, 4} <= partners
    _drop_hamming(spark, store)


def test_exact_store_append_keeps_single_meta_row(spark):
    """r15 (ADVICE r14, low): write_exact_store(mode="append") used to
    append a second meta row, after which _meta_row raised on every
    increment — the store was bricked until manual repair. The meta
    table is a single parameter row: appends must keep it that way, and
    an append with DRIFTED columns must fail loud instead of mixing
    fingerprints computed over different columns."""
    _drop_store(spark)
    g1 = spark.createDataFrame([(1, "alpha beta"), (2, "gamma delta")],
                               "doc_id bigint, body string")
    g2 = spark.createDataFrame([(3, "epsilon zeta")],
                               "doc_id bigint, body string")
    incremental.write_exact_store(g1, STORE, text_col="body", n_buckets=2)
    incremental.write_exact_store(g2, STORE, text_col="body", n_buckets=2,
                                  mode="append")
    assert spark.table(f"{STORE}_e_meta").count() == 1
    # the store still probes (would raise 'exactly one parameter row'
    # before the fix) and sees both generations' fingerprints
    new = spark.createDataFrame(
        [(7, "ALPHA  beta"), (8, "epsilon  ZETA"), (9, "fresh text")],
        "doc_id bigint, body string")
    inc = incremental.exact_dedup_increment(new, STORE)
    assert {r.doc_id for r in inc.collect()} == {9}
    # drifted columns on append: loud error, store unchanged
    drifted = spark.createDataFrame([(10, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="was built with"):
        incremental.write_exact_store(drifted, STORE, text_col="text",
                                      n_buckets=2, mode="append")
    _drop_store(spark)


def test_minhash_store_append_keeps_single_meta_row(spark, split_docs):
    """r15 parallel of the write_exact_store ADVICE-r14 fix: appending a
    second corpus generation through write_minhash_store(mode='append')
    used to append a second meta row, bricking every later
    read_store_meta; drifted parameters must fail loud instead of mixing
    incompatible signatures."""
    _, old, new = split_docs
    _drop_store(spark)
    incremental.write_minhash_store(old, STORE, n_buckets=2, **PARAMS)
    incremental.write_minhash_store(new, STORE, n_buckets=2, mode="append",
                                    **PARAMS)
    assert spark.table(f"{STORE}_meta").count() == 1
    # the store still probes after the append (read_store_meta works)
    assert incremental.read_store_meta(spark, STORE)["bands"] == \
        PARAMS["bands"]
    drifted = dict(PARAMS, num_hashes=PARAMS["num_hashes"] * 2)
    with pytest.raises(ValueError, match="was built with"):
        incremental.write_minhash_store(new, STORE, n_buckets=2,
                                        mode="append", **drifted)
    _drop_store(spark)


def test_hamming_store_append_keeps_single_meta_row(spark):
    """Same parallel for the hamming store: single meta row after an
    append-mode write, loud error on column drift, and a hidden
    (mid-compact) hbuckets table is recovered before the append rather
    than recreated one-generation fresh."""
    store = "happ"
    _drop_hamming(spark, store)
    g1 = spark.createDataFrame([(1, 111), (2, -222)],
                               "key bigint, phash bigint")
    g2 = spark.createDataFrame([(3, 333)], "key bigint, phash bigint")
    incremental.write_hamming_store(g1, store, n_buckets=2)
    # crash window open: table renamed aside, then an append-mode write
    spark.sql(f"ALTER TABLE {store}_hbuckets RENAME TO "
              f"{store}_hbuckets_compact_old")
    incremental.write_hamming_store(g2, store, n_buckets=2, mode="append")
    assert not spark.catalog.tableExists(f"{store}_hbuckets_compact_old")
    assert spark.table(f"{store}_h_meta").count() == 1
    # BOTH generations present (recovery first, then append — a fresh
    # one-generation table would hold only g2's buckets)
    keys = {r["ids"][0]["_k"] for r in
            spark.table(f"{store}_hbuckets").collect()}
    assert {1, 2, 3} <= keys, keys
    with pytest.raises(ValueError, match="was built with"):
        incremental.write_hamming_store(
            g2.withColumnRenamed("phash", "sig"), store, n_buckets=2,
            sig_col="sig", mode="append")
    _drop_hamming(spark, store)
