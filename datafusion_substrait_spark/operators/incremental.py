"""Incremental deduplication against a persisted signature store.

A production corpus pipeline does not re-dedup 100 TB every day: it dedups
the day's NEW documents against a persisted store of signatures from
everything already ingested. These operators provide that shape on top of
the batch operators in dedup.py, with one invariant: **an incremental pass
over new docs produces exactly the pairs a full-corpus batch rerun on
(old ∪ new) would produce that touch at least one new doc** (the old-old
pairs are already in the store owner's previous results).

The store is four catalog tables (written by :func:`write_minhash_store`):

* ``{store}_bands``    — (key, band, sig) LSH band fingerprints, BUCKETED
  by ``(band, sig)`` — the normalized form (supports rebuild/compaction),
  bucketed on exactly the probe key so any store-side aggregation needs
  **no Exchange**: at 100 TB the store never reshuffles, only the (small)
  new batch does.
* ``{store}_buckets``  — (band, sig, ids: sorted array<key>) PRE-AGGREGATED
  bucket member arrays, same bucketed layout, one row per (bucket,
  generation) — appends add rows instead of rewriting arrays. The probe
  joins this table directly, so per-increment aggregation work is
  O(touched buckets), not O(store): the old per-increment
  ``groupBy(band, sig).collect_list`` over the full bands table (shuffle-
  free but O(store) agg work every batch) is now a write-once cost.
  Signatures are ~100 bytes/doc vs the corpus text's ~10⁵, so carrying
  both the normalized and the probe-optimized form is noise at 100 TB.
* ``{store}_shingles`` — (key, sh: array<bigint>) exact shingle hash sets
  for the Jaccard verify step, BUCKETED by ``key``: the verify semi-join
  by candidate old docs is likewise shuffle-free on the store side.
* ``{store}_meta``     — one row of the signature parameters (num_hashes,
  bands, shingle_n, text/key column names). The increment reads these
  instead of trusting the caller: probing a store with mismatched
  parameters produces silently-empty buckets, not an error, so the
  parameters travel WITH the signatures.

Stores written before ``{store}_buckets`` existed still probe through the
bands-table aggregation (detected via the catalog, no action needed).

Equality argument (why increment ≡ batch-on-(old ∪ new), new-touching
subset): the batch pass buckets ALL docs by (band, sig) and expands pairs
per bucket with a deterministic hot-bucket star cap over the
ascending-sorted member array. The increment rebuilds, for every bucket
containing ≥1 new doc, that bucket's FULL sorted member array (stored
members ∪ new members) and runs the SAME pair expansion with the SAME cap,
then keeps pairs touching a new doc. Buckets with no new member generate
only old-old pairs in the batch run — excluded by definition. Verify math
is shared code (:func:`dedup._jaccard_verify`) over shingle sets that are
bit-identical whether loaded from the store or computed fresh (shared
:func:`dedup._shingle_sets`).

Reference parity note: the reference has no incremental surface at all
(it is a plan-interchange library); this is part of the beyond-reference
pipeline layer, same family as dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_substrait_spark.operators.dedup import (
    _banded_rows, _exploded_bucket_pairs, _jaccard_verify, _shingle_sets)
from datafusion_substrait_spark.sources import sinks

_META_COLS = ("num_hashes", "bands", "shingle_n", "text_col", "key_col")


def _bucket_arrays(banded: DataFrame, key_col: str) -> DataFrame:
    """(band, sig, ids) pre-aggregated sorted member arrays for one
    generation of banded rows."""
    return (banded.groupBy("band", "sig")
            .agg(F.sort_array(F.collect_list(key_col)).alias("ids")))


def write_minhash_store(df: DataFrame, store: str, text_col: str = "text",
                        key_col: str = "doc_id", num_hashes: int = 32,
                        bands: int = 8, shingle_n: int = 5,
                        n_buckets: int = 16,
                        mode: str = "overwrite") -> None:
    """Build the signature store for ``df`` (the initial corpus).

    Writes ``{store}_bands`` / ``{store}_shingles`` as bucketed tables and
    ``{store}_meta`` with the parameters. ``n_buckets`` sizes the bucketed
    layout — pick it so one bucket of the store fits an executor core
    (the store grows with the corpus; the new-batch side is shuffled into
    the same bucket count at probe time, so more buckets = more probe
    parallelism)."""
    spark = df.sparkSession
    # the meta table is a single parameter row, never data (r15, the
    # write_exact_store ADVICE-r14 fix's PARALLEL in this store):
    # mode="append" used to append a second meta row, after which
    # _meta_row raised on every increment — and appending with DRIFTED
    # parameters would mix incompatible signatures, so fail loud first.
    if mode == "append":
        # recover an interrupted compact BEFORE touching the buckets
        # table: appending while {store}_buckets hides behind
        # *_compact_old would CREATE a fresh one-generation table, and
        # the next recovery would then drop the real (renamed-aside)
        # store as "old"
        _recover_compact_swap(spark, f"{store}_buckets")
    if mode == "append" and spark.catalog.tableExists(f"{store}_meta"):
        m = read_store_meta(spark, store)
        want = dict(num_hashes=num_hashes, bands=bands,
                    shingle_n=shingle_n, text_col=text_col,
                    key_col=key_col)
        if m != want:
            raise ValueError(
                f"{store} was built with {m}; appending with {want} "
                "would mix signatures computed under different "
                "parameters")
    banded = _banded_rows(df, text_col, key_col, num_hashes, bands,
                          shingle_n)
    sinks.write_bucketed(banded, f"{store}_bands", ("band", "sig"),
                         n_buckets=n_buckets, mode=mode)
    sinks.write_bucketed(_bucket_arrays(banded, key_col),
                         f"{store}_buckets", ("band", "sig"),
                         n_buckets=n_buckets, mode=mode)
    sinks.write_bucketed(_shingle_sets(df, text_col, key_col, shingle_n),
                         f"{store}_shingles", key_col,
                         n_buckets=n_buckets, mode=mode)
    meta = spark.createDataFrame(
        [(num_hashes, bands, shingle_n, text_col, key_col)],
        "num_hashes int, bands int, shingle_n int, "
        "text_col string, key_col string")
    sinks.write_table(meta, f"{store}_meta", mode="overwrite")


def append_to_minhash_store(new_docs: DataFrame, store: str) -> None:
    """Fold a verified new batch into the store (bands + shingle sets
    appended into the same bucketed layout). Run AFTER
    :func:`minhash_lsh_pairs_increment` on the same batch — appending
    first would make the batch match itself through the store (the
    increment's result is an eager localCheckpoint, so the ORDER of the
    two calls is the only discipline needed)."""
    p = read_store_meta(new_docs.sparkSession, store)
    # finish/roll back any interrupted compact FIRST (r14 review catch):
    # a crash between compact's two renames hides {store}_buckets behind
    # *_compact_old, and the tableExists layout probe below would then
    # silently append to bands only — a later compact recovery would
    # promote the PRE-append buckets table and the probe path would
    # permanently miss this generation's near-duplicates.
    _recover_compact_swap(new_docs.sparkSession, f"{store}_buckets")
    banded = _banded_rows(new_docs, p["text_col"], p["key_col"],
                          p["num_hashes"], p["bands"], p["shingle_n"])
    # bucketBy inserts must repeat the spec; Spark validates it matches
    # the catalog's existing bucketing
    n_buckets = _store_bucket_count(new_docs.sparkSession, f"{store}_bands")
    sinks.write_bucketed(banded, f"{store}_bands", ("band", "sig"),
                         n_buckets=n_buckets, mode="append")
    if new_docs.sparkSession.catalog.tableExists(f"{store}_buckets"):
        # one new generation row per touched bucket; the probe merges
        # generations after its bucketed join (pre-buckets-table stores
        # skip this and keep probing through the bands aggregation)
        sinks.write_bucketed(
            _bucket_arrays(banded, p["key_col"]), f"{store}_buckets",
            ("band", "sig"), n_buckets=n_buckets, mode="append")
    sinks.write_bucketed(
        _shingle_sets(new_docs, p["text_col"], p["key_col"],
                      p["shingle_n"]),
        f"{store}_shingles", p["key_col"], n_buckets=n_buckets,
        mode="append")


def compact_minhash_store(spark: SparkSession, store: str) -> None:
    """Merge the buckets table's per-generation rows into one row per
    (band, sig). Appends add a generation row per touched bucket — cheap
    per append, and the probe merges generations after its bucketed
    join — but after many generations the merge work creeps up;
    compaction resets it to one array per bucket. Run occasionally
    (e.g. nightly after a week of hourly appends), NOT per increment.

    The aggregation itself is shuffle-free (bucketed layout) and the
    rewrite lands in a temp table first, then swaps rename-aside
    (``table``→``*_compact_old``, ``*_compact_tmp``→``table``, drop old)
    so the store is never without a buckets table whose data survives a
    crash at ANY point: every crash window leaves either the original or
    the fully-written compacted table recoverable, and a re-run of this
    function finishes (or rolls back) the interrupted swap before
    compacting again."""
    table = f"{store}_buckets"
    _recover_compact_swap(spark, table)
    if not spark.catalog.tableExists(table):
        raise ValueError(
            f"{table} does not exist — pre-r7 store layouts have no "
            "buckets table to compact (rebuild with write_minhash_store)")
    n_buckets = _store_bucket_count(spark, table)
    read_store_meta(spark, store)  # fail fast on a corrupted store
    merged = (spark.table(table).groupBy("band", "sig")
              .agg(F.sort_array(F.flatten(F.collect_list("ids")))
                   .alias("ids")))
    sinks.write_bucketed(merged, f"{table}_compact_tmp", ("band", "sig"),
                         n_buckets=n_buckets, mode="overwrite")
    _finish_compact_swap(spark, table)


def _recover_compact_swap(spark: SparkSession, table: str) -> None:
    """Finish or roll back a previous interrupted rename-aside compact
    of ``table`` — run BEFORE any existence check (the crash windows
    hide ``table`` behind ``*_compact_old``)."""
    tmp = f"{table}_compact_tmp"
    old = f"{table}_compact_old"
    cat = spark.catalog
    if cat.tableExists(old):
        if not cat.tableExists(table):
            if cat.tableExists(tmp):
                # crashed between the two renames: tmp is the complete
                # compacted copy of old — finish the swap
                spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
            else:
                # tmp already promoted+dropped is impossible with old
                # still present unless the drop raced; roll back
                spark.sql(f"ALTER TABLE {old} RENAME TO {table}")
        if cat.tableExists(old):
            spark.sql(f"DROP TABLE {old}")
    elif cat.tableExists(tmp):
        # crashed after writing tmp but before the swap began: appends may
        # have landed since — the tmp is possibly stale, recompact fresh
        spark.sql(f"DROP TABLE {tmp}")


def _finish_compact_swap(spark: SparkSession, table: str) -> None:
    """The rename-aside swap: ``table``→old, tmp→``table``, drop old —
    every crash window leaves a recoverable state for
    :func:`_recover_compact_swap`."""
    old = f"{table}_compact_old"
    spark.sql(f"ALTER TABLE {table} RENAME TO {old}")
    spark.sql(f"ALTER TABLE {table}_compact_tmp RENAME TO {table}")
    spark.sql(f"DROP TABLE {old}")


def _meta_row(spark: SparkSession, store: str):
    """The store's single parameter row (shared by the minhash and
    fingerprint stores; 1-row bounded collect)."""
    row = spark.table(f"{store}_meta").collect()
    if len(row) != 1:
        raise ValueError(
            f"{store}_meta must hold exactly one parameter row, "
            f"found {len(row)}")
    return row[0]


def read_store_meta(spark: SparkSession, store: str) -> dict:
    row = _meta_row(spark, store)
    return {c: row[c] for c in _META_COLS}


def _store_bucket_count(spark: SparkSession, table: str) -> int:
    detail = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    for r in detail:
        if r.col_name == "Num Buckets":
            return int(r.data_type)
    raise ValueError(f"{table} is not a bucketed table")


def minhash_lsh_pairs_increment(new_docs: DataFrame, store: str,
                                threshold: float = 0.6,
                                max_bucket_size: int = 500) -> DataFrame:
    """Near-duplicate pairs of ``new_docs`` vs (store ∪ new_docs).

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥
    threshold, and at least one side a new doc — exactly the
    new-touching subset of ``minhash_lsh_pairs(old ∪ new)`` (same
    parameters, same hot-bucket cap). New keys must not already exist in
    the store (the pipeline contract: dedup THEN append).

    Plan shape at scale:
      1. band the new batch (one shuffle of the small batch);
      2. aggregate the new batch's buckets, join them to the store's
         PRE-AGGREGATED ``{store}_buckets`` arrays on (band, sig) — the
         store is bucketed by exactly (band, sig), so the store-side join
         input needs no Exchange AND no aggregation (gated in
         tests/test_incremental.py); a touched bucket's per-generation
         rows merge AFTER the join, so aggregation work is O(touched
         buckets). Buckets with no new member never leave the join.
         (Stores written before the buckets table existed fall back to
         aggregating ``{store}_bands`` — still shuffle-free, but O(store)
         aggregation per increment.)
      3. rebuild each touched bucket's full sorted member array and run
         the batch pair expansion + star cap on it, keep new-touching
         pairs;
      4. verify: shingle sets for new candidate docs computed fresh,
         old candidate docs' sets loaded from the bucketed shingle store
         (semi-join, store side again shuffle-free), same exact-Jaccard
         code as the batch path.

    The result is returned eagerly via ``localCheckpoint`` (bounded by
    the batch's pair count); the intermediates persisted during the
    verify are unpersisted before returning, so repeated increments leak
    no session-lifetime cache (the checkpointed result itself is
    reclaimed by Spark's ContextCleaner when the DataFrame is dropped).
    """
    spark = new_docs.sparkSession
    p = read_store_meta(spark, store)
    key_col, text_col = p["key_col"], p["text_col"]

    new_banded = _banded_rows(new_docs, text_col, key_col,
                              p["num_hashes"], p["bands"], p["shingle_n"])
    new_buckets = (new_banded.groupBy("band", "sig")
                   .agg(F.collect_list(key_col).alias("_new_ids")))
    # finish/roll back any interrupted compact before the layout probe
    # (same hazard as append_to_minhash_store: a crashed swap hides the
    # buckets table and this probe would silently take the legacy path)
    _recover_compact_swap(spark, f"{store}_buckets")
    # left join: every bucket with a new member survives, whether or not
    # the store has seen its (band, sig) before
    if spark.catalog.tableExists(f"{store}_buckets"):
        merged = (
            new_buckets.join(spark.table(f"{store}_buckets"),
                             ["band", "sig"], "left")
            # one row per store generation: merge only touched buckets
            # (collect_list skips the left-join NULL, so an unseen
            # bucket's _old_ids is [] — no coalesce needed)
            .groupBy("band", "sig")
            .agg(F.first("_new_ids").alias("_new_ids"),
                 F.flatten(F.collect_list("ids")).alias("_old_ids"))
        )
    else:
        merged = new_buckets.join(
            spark.table(f"{store}_bands")
            .groupBy("band", "sig")
            .agg(F.collect_list(key_col).alias("_old_ids")),
            ["band", "sig"], "left")
    combined = (
        merged
        .select(F.sort_array(F.concat(
            F.coalesce("_old_ids", F.array()),
            F.col("_new_ids"))).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = _exploded_bucket_pairs(combined, max_bucket_size,
                                   "doc_a", "doc_b").distinct()
    new_keys = new_docs.select(F.col(key_col)).distinct()
    cand = (
        pairs.join(new_keys.withColumnRenamed(key_col, "doc_a")
                   .withColumn("_an", F.lit(True)), "doc_a", "left")
        .join(new_keys.withColumnRenamed(key_col, "doc_b")
              .withColumn("_bn", F.lit(True)), "doc_b", "left")
        .filter(F.col("_an").isNotNull() | F.col("_bn").isNotNull())
        .select("doc_a", "doc_b")
        .persist()
    )
    cand_ids = (cand.select(F.col("doc_a").alias(key_col))
                .unionAll(cand.select(F.col("doc_b").alias(key_col)))
                .distinct())
    new_sets = _shingle_sets(
        new_docs.join(cand_ids, key_col, "left_semi"),
        text_col, key_col, p["shingle_n"])
    old_sets = (spark.table(f"{store}_shingles")
                .join(cand_ids, key_col, "left_semi"))
    # a store key can never also be a new key (documented contract), so
    # this union has no duplicate (key, sh) rows
    shingled = new_sets.unionByName(old_sets).persist()
    try:
        return _jaccard_verify(cand, shingled, key_col,
                               threshold).localCheckpoint(eager=True)
    finally:
        cand.unpersist()
        shingled.unpersist()


def write_exact_store(df: DataFrame, store: str, text_col: str = "text",
                      key_col: str = "doc_id", n_buckets: int = 16,
                      mode: str = "overwrite") -> None:
    """Exact-dedup fingerprint store: the SURVIVOR rows of
    ``dedup.exact_dedup(df)`` — (key, fingerprint) — bucketed by
    fingerprint, so incremental probes join shuffle-free on the store
    side. Column names are PERSISTED in ``{store}_e_meta`` (r14 review
    catch: this was the one store that trusted caller-supplied columns
    at probe time — the exact parameter-drift failure the meta tables
    exist to prevent)."""
    from datafusion_substrait_spark.operators.dedup import exact_dedup
    spark = df.sparkSession
    if mode == "append" and spark.catalog.tableExists(f"{store}_e_meta"):
        # r15 (ADVICE r14): appending a batch with drifted column names
        # would probe/extend the fps table with fingerprints computed
        # over DIFFERENT columns — silently never matching. Fail loud.
        m = _meta_row(spark, f"{store}_e")
        if (m["text_col"], m["key_col"]) != (text_col, key_col):
            raise ValueError(
                f"{store} was built with text_col={m['text_col']!r}, "
                f"key_col={m['key_col']!r}; appending with "
                f"({text_col!r}, {key_col!r}) would mix fingerprints "
                "over different columns")
    sinks.write_bucketed(exact_dedup(df, text_col, key_col),
                         f"{store}_fps", "fingerprint",
                         n_buckets=n_buckets, mode=mode)
    meta = spark.createDataFrame(
        [(text_col, key_col)], "text_col string, key_col string")
    # the meta table is a single parameter row, never data: ALWAYS
    # overwrite (r15, ADVICE r14 — mode="append" used to append a second
    # meta row, after which _meta_row raised on every increment and the
    # store was bricked until manual repair)
    sinks.write_table(meta, f"{store}_e_meta", mode="overwrite")


def exact_dedup_increment(new_docs: DataFrame, store: str,
                          text_col: str = "text",
                          key_col: str = "doc_id") -> DataFrame:
    """New-batch survivors: (key, fingerprint) of new docs whose
    normalized-text fingerprint is neither in the store nor claimed by a
    smaller-keyed new doc.

    Semantics are FIRST-SEEN-WINS: a new doc duplicating a stored doc is
    dropped even if its key is smaller than the stored survivor's —
    the store's survivor set is immutable history. This differs from a
    full batch rerun only in WHICH key survives for fingerprints present
    in both generations (batch keeps the global min key); the survivor
    fingerprint SET is identical either way. Append the result to
    ``{store}_fps`` to fold the batch in.

    Column names come from ``{store}_e_meta`` when present (stores
    written from r14 on); the ``text_col``/``key_col`` parameters are
    only honored for legacy meta-less stores — probing with columns the
    store was not built with would silently never match.
    """
    from datafusion_substrait_spark.operators.dedup import exact_dedup
    spark = new_docs.sparkSession
    if spark.catalog.tableExists(f"{store}_e_meta"):
        m = _meta_row(spark, f"{store}_e")
        text_col, key_col = m["text_col"], m["key_col"]
    batch = exact_dedup(new_docs, text_col, key_col)
    # anti-join on the store's bucket key: store side shuffle-free
    return batch.join(spark.table(f"{store}_fps").select("fingerprint"),
                      "fingerprint", "left_anti").select(
        key_col, "fingerprint")


# ---------------------------------------------------------------------------
# incremental Hamming-signature store (text simhash / image / audio / video
# perceptual hashes — any 64-bit signature probed via dedup.hamming_pairs)
# ---------------------------------------------------------------------------


def write_hamming_store(sigs: DataFrame, store: str, key_col: str = "key",
                        sig_col: str = "phash", n_buckets: int = 16,
                        mode: str = "overwrite") -> None:
    """Persist a 64-bit signature corpus (e.g. ``image_phash`` /
    ``audio_phash`` / ``simhash_signatures`` output) for incremental
    near-dup probing: ``{store}_hbuckets`` holds (band, val,
    ids: sorted array<(_k, _sig)>) — one row per (bucket, generation),
    BUCKETED by (band, val) so increments join it shuffle-free — and
    ``{store}_h_meta`` pins the column names. NULL signatures
    (undecodable payloads) are excluded at write, matching
    ``hamming_pairs``."""
    from datafusion_substrait_spark.operators.dedup import _banded_sigs

    spark = sigs.sparkSession
    # single-parameter-row meta: always overwrite, validate drift on
    # append (r15 — the same parallel of the write_exact_store
    # ADVICE-r14 fix as write_minhash_store above)
    if mode == "append":
        # same pre-append recovery as write_minhash_store (a hidden
        # hbuckets table must not be recreated one-generation fresh)
        _recover_compact_swap(spark, f"{store}_hbuckets")
    if mode == "append" and spark.catalog.tableExists(f"{store}_h_meta"):
        m = _meta_row(spark, f"{store}_h")
        if (m["key_col"], m["sig_col"]) != (key_col, sig_col):
            raise ValueError(
                f"{store} was built with key_col={m['key_col']!r}, "
                f"sig_col={m['sig_col']!r}; appending with "
                f"({key_col!r}, {sig_col!r}) would mix signatures over "
                "different columns")
    banded = _banded_sigs(sigs, key_col, sig_col)
    arrays = (banded.groupBy("band", "val")
              .agg(F.sort_array(F.collect_list(F.struct("_k", "_sig")))
                   .alias("ids")))
    sinks.write_bucketed(arrays, f"{store}_hbuckets", ("band", "val"),
                         n_buckets=n_buckets, mode=mode)
    meta = spark.createDataFrame([(key_col, sig_col)],
                                 "key_col string, sig_col string")
    # named {store}_h_meta so the shared _meta_row helper (which appends
    # "_meta") reads it via the "{store}_h" prefix
    sinks.write_table(meta, f"{store}_h_meta", mode="overwrite")


def append_to_hamming_store(new_sigs: DataFrame, store: str) -> None:
    """Fold a probed new batch's signatures in (one generation row per
    touched bucket; the probe merges generations after its bucketed
    join). Run AFTER :func:`hamming_pairs_increment` on the same batch —
    the increment's result is an eager localCheckpoint (r14; was lazy
    with a materialize-first caveat), so call order is the only
    discipline needed, same as :func:`append_to_minhash_store`."""
    from datafusion_substrait_spark.operators.dedup import _banded_sigs

    spark = new_sigs.sparkSession
    # finish/roll back any interrupted compact FIRST (r15, ADVICE r14:
    # the r14 minhash fix left the parallel hamming store open to the
    # same hazard — a crash between compact_hamming_store's two renames
    # hides {store}_hbuckets behind *_compact_old and this append would
    # fail on the bucket-count probe until someone re-ran compact)
    _recover_compact_swap(spark, f"{store}_hbuckets")
    m = _meta_row(spark, f"{store}_h")  # reads {store}_hmeta
    banded = _banded_sigs(new_sigs, m["key_col"], m["sig_col"])
    arrays = (banded.groupBy("band", "val")
              .agg(F.sort_array(F.collect_list(F.struct("_k", "_sig")))
                   .alias("ids")))
    n_buckets = _store_bucket_count(spark, f"{store}_hbuckets")
    sinks.write_bucketed(arrays, f"{store}_hbuckets", ("band", "val"),
                         n_buckets=n_buckets, mode="append")


def hamming_pairs_increment(new_sigs: DataFrame, store: str,
                            max_hamming: int = 6,
                            max_bucket_size: int = 500) -> DataFrame:
    """New-touching near-dup pairs of ``new_sigs`` vs (store ∪ new):
    exactly the subset of ``hamming_pairs(old ∪ new)`` touching ≥ 1 new
    key (same banding, same sorted-array pair expansion, same hot-bucket
    star cap, same bit_count verify — all SHARED code, so the equality
    holds by construction). New keys must not already exist in the store
    (the pipeline contract: dedup THEN append).

    Plan shape: the new batch bands and aggregates (one small shuffle);
    the store side is bucketed by exactly (band, val) — its join input
    needs NO Exchange and no aggregation; a touched bucket's generation
    rows merge AFTER the join, so per-increment work is O(batch +
    touched buckets), never O(store). Output (key_a, key_b, hamming).
    """
    from datafusion_substrait_spark.operators.dedup import (_banded_sigs,
                                                            _hamming_expand)

    spark = new_sigs.sparkSession
    # recover an interrupted compact before touching {store}_hbuckets
    # (r15, ADVICE r14 — mirrors minhash_lsh_pairs_increment): without
    # this, a crashed swap makes the spark.table() below raise until a
    # manual compact re-run, and the store is effectively offline.
    _recover_compact_swap(spark, f"{store}_hbuckets")
    m = _meta_row(spark, f"{store}_h")
    new_banded = _banded_sigs(new_sigs, m["key_col"], m["sig_col"])
    new_arrays = (new_banded.groupBy("band", "val")
                  .agg(F.collect_list(F.struct("_k", "_sig"))
                       .alias("_new")))
    merged = (
        new_arrays.join(spark.table(f"{store}_hbuckets"),
                        ["band", "val"], "left")
        .groupBy("band", "val")
        .agg(F.first("_new").alias("_new"),
             F.flatten(F.collect_list("ids")).alias("_old"))
    )
    # collect_list skips the left-join NULL, so an untouched-store
    # bucket's _old is [] (typed empty array), never NULL — no coalesce
    buckets = (
        merged.select(
            "band", "val",
            F.sort_array(F.concat("_old", "_new")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = _hamming_expand(buckets, max_hamming, max_bucket_size,
                            out_prefix="key")
    # keep pairs touching a new key in ONE pass (r14 review catch: two
    # semi-joins + union re-executed the whole banding/store-join/expand
    # pipeline twice) — the left-join boolean-flag shape of
    # minhash_lsh_pairs_increment. Returned eagerly via localCheckpoint
    # like the minhash path, so a subsequent append_to_hamming_store can
    # never leak the appended batch into this result's re-evaluation.
    new_keys = new_banded.select(F.col("_k").alias("_nk")).distinct()
    out = (pairs
           .join(new_keys.select(F.col("_nk").alias("key_a"),
                                 F.lit(True).alias("_an")),
                 "key_a", "left")
           .join(new_keys.select(F.col("_nk").alias("key_b"),
                                 F.lit(True).alias("_bn")),
                 "key_b", "left")
           .filter(F.col("_an").isNotNull() | F.col("_bn").isNotNull())
           .select(*pairs.columns)
           .distinct())
    return out.localCheckpoint(eager=True)


def compact_hamming_store(spark: SparkSession, store: str) -> None:
    """Collapse the hbuckets table's generation rows to one sorted array
    per (band, val) — same crash-safe rename-aside swap as
    :func:`compact_minhash_store` (shared helpers, shared recovery)."""
    table = f"{store}_hbuckets"
    _recover_compact_swap(spark, table)
    if not spark.catalog.tableExists(table):
        raise ValueError(f"{table} does not exist — write the store with "
                         "write_hamming_store first")
    n_buckets = _store_bucket_count(spark, table)
    _meta_row(spark, f"{store}_h")  # fail fast on a corrupted store
    merged = (spark.table(table).groupBy("band", "val")
              .agg(F.sort_array(F.flatten(F.collect_list("ids")))
                   .alias("ids")))
    sinks.write_bucketed(merged, f"{table}_compact_tmp", ("band", "val"),
                         n_buckets=n_buckets, mode="overwrite")
    _finish_compact_swap(spark, table)
