"""Deduplication operators for large-scale training-data pipelines.

Five families, each designed around Spark's shuffle model (the costs that
matter at 100 TB, not at 60k rows):

* **exact**       — one hash-aggregate shuffle on a 32-byte fingerprint
                    (never on the full text).
* **MinHash+LSH** — shingle → K minhashes → B bands; candidate pairs come
                    from a *band-bucket self-join* (shuffle keyed on
                    (band, signature), so only colliding docs ever meet),
                    then exact Jaccard verification on the candidates only.
* **SimHash**     — 64-bit signature via codegen'd distinct-token explode +
                    packed-lane vote aggregation (map-side combined: ONE
                    shuffled row per doc); Hamming-distance verify via
                    ``bit_count(a XOR b)``.
* **n-gram Jaccard** — exact word-3-gram Jaccard on candidate pairs; the
                    all-pairs form is only for oracle-checkable correctness
                    runs and is documented as O(n²)-per-bucket.
* **embedding cosine** — near-duplicate vectors via random-hyperplane LSH
                    bucketing + exact cosine verify (see similarity.py for
                    the shared primitives).

All signature math defaults to Spark's built-in ``xxhash64`` — JVM-native,
inside whole-stage codegen, with full 64-bit avalanche mixing; it is
deterministic across runs/partitionings but not replayable in DuckDB, so
oracle entries either verify with exact math the oracle CAN replay (d1/d2/
d4: Jaccard over candidate pairs) or swap in ``md5_token_hash`` (d3) so the
full pipeline replays bit-for-bit. Everything is built-in-function-only —
no Python UDFs anywhere.

(Earlier design note: a crc32 + affine-mod-2^61 "portable hash" was tried so
DuckDB could replay signatures. An affine map of a 32-bit value mod a 61-bit
prime wraps the modulus only ~2× — piecewise-monotone, so the argmin shingle
barely varies across "independent" seeds and LSH bands collapse into huge
degenerate buckets. Portability isn't worth a broken sketch.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_substrait_spark.operators.text import tokens, word_ngrams


def _parallelize(df: DataFrame, key_col: str) -> DataFrame:
    """Ensure enough input partitions for the explode-heavy signature map.

    A single small parquet file arrives as ONE partition, serializing the
    whole per-shingle stage; repartitioning by key also pre-satisfies the
    downstream groupBy(key) distribution, so the shuffle happens on the
    compact (key, text) rows instead of the exploded shingles. On a real
    multi-file corpus input partitions already ≫ cores and this is a no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    # inputFiles() reads only the plan's file index (no RDD materialization
    # on the driver, unlike df.rdd.getNumPartitions()). It undercounts when
    # a file splits into several partitions and returns [] for non-file
    # relations — both err toward repartitioning compact (key, text) rows,
    # which is the cheap direction.
    if len(df.inputFiles()) < target:
        return df.repartition(target, F.col(key_col))
    return df


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def fingerprint_expr(text_col: str = "text"):
    """md5-of-normalized-text Column — THE exact-dedup fingerprint. One
    definition shared by :func:`exact_dedup`, :func:`text.fingerprint`'s
    semantics, and the incremental fingerprint store, so the three can
    never silently fork (a forked normalization would make the store
    miss every duplicate)."""
    return F.md5(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Exact duplicate removal: keep the smallest key per normalized-text
    fingerprint. Output: (doc_id, fingerprint) of survivors.

    Scale shape: ONE shuffle, keyed on a 32-byte md5 — the full text never
    moves. At 100 TB this is the difference between shuffling 100 TB and
    shuffling ~2% of it.
    """
    return (
        df.select(F.col(key_col), fingerprint_expr(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(key_col).alias(key_col))
        .select(key_col, "fingerprint")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _exploded_shingles(df: DataFrame, text_col: str, key_col: str,
                       shingle_n: int) -> DataFrame:
    """(key, _sh) rows: one char-n-gram shingle per row, duplicates KEPT.

    This is the whole-stage-codegen shingle shape: ``explode(sequence(1,
    len-(n-1)))`` then a flat ``substr`` — no array is ever materialized,
    every operator is codegen'd. The row-local alternative
    (``char_ngrams`` = interpreted ``F.transform`` building a ~len-element
    string array, then ``array_distinct``, then explode) measured **31.7 s
    vs 0.86 s** for the sf0.1 signature-minima stage (scratch/bench_d2b.py)
    — HOFs run interpreted and the array materialization dominates.
    Duplicate shingles are kept because consumers are duplicate-invariant:
    ``min()`` aggregate measures (signatures) or ``collect_set`` (the
    Jaccard verify stage's set build).
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    base = _parallelize(df, key_col).select(F.col(key_col), norm.alias("_n"))
    seq = base.select(
        key_col, "_n",
        F.explode(F.sequence(
            F.lit(1), F.greatest(F.length("_n") - (shingle_n - 1), F.lit(1))
        )).alias("_i"),
    )
    return seq.select(
        key_col, F.col("_n").substr(F.col("_i"), F.lit(shingle_n)).alias("_sh")
    )


def _minhash_minima(bases: DataFrame, key_col: str, num_hashes: int) -> DataFrame:
    """(key, _mh0.._mhK-1): K seeded ``xxhash64`` minima as aggregate
    measures over exploded shingle rows. The SINGLE definition of the
    seeding scheme — minhash_signatures and minhash_lsh_pairs both build on
    it, so signature compatibility (incl. with the DuckDB oracle) cannot
    silently fork."""
    # r17: each measure is ONE parsed expression — the DSL form
    # (F.min(F.xxhash64(F.lit(i), col)) + alias) cost ~5 py4j round
    # trips per measure × K, a measurable slice of plan construction;
    # the parse yields the identical Min(XxHash64(seed, _sh)) tree
    # (integer literal seeds, same function resolution), so signatures
    # are bit-unchanged (d2 oracle + planted-pair tests pin it).
    return bases.groupBy(key_col).agg(
        *[F.expr(f"MIN(xxhash64({i}, _sh)) AS _mh{i}")
          for i in range(num_hashes)]
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       key_col: str = "doc_id", num_hashes: int = 32,
                       shingle_n: int = 5) -> DataFrame:
    """(key, minhash: array<bigint>[num_hashes]).

    Plan shape: explode shingles (codegen'd, no array materialization — see
    _exploded_shingles) → K seeded ``xxhash64(seed, shingle)`` minima as
    ``min()`` aggregate measures → groupBy(key). The per-shingle stage is
    all JVM-native hashing inside whole-stage codegen, and map-side partial
    aggregation collapses each doc to a single (key, K longs) row *before*
    the shuffle — the shuffle moves one row per document regardless of
    document length.

    Why not compute all K minhashes row-locally with ``F.transform`` +
    ``F.array_min``?  Higher-order array functions are excluded from codegen
    (interpreted eval, no common-subexpression elimination), so the
    shingling subtree would be re-evaluated K times per row — measured ~50×
    slower than this shape at equal output.
    """
    bases = _exploded_shingles(df, text_col, key_col, shingle_n)
    return _minhash_minima(bases, key_col, num_hashes).select(
        F.col(key_col),
        F.array(*[f"_mh{i}" for i in range(num_hashes)]).alias("minhash"),
    )


def _exploded_bucket_pairs(buckets: DataFrame, max_bucket_size: int,
                           a_name: str = "a", b_name: str = "b") -> DataFrame:
    """Bucket rows (``ids``: ascending-sorted array) → one row per in-bucket
    pair ``(a, b)`` with ``a < b``, hot buckets star-capped.

    Shape: two codegen'd Generates — ``posexplode`` of the head members,
    then ``explode`` of each head's tail ``slice``. This replaced an
    interpreted nested ``transform``/``flatten`` HOF that materialized the
    full C(n,2) pair array inside ONE bucket row's memory (≤
    max_bucket_size²/2 struct copies, interpreted eval, no codegen) before
    exploding it; the Generate chain streams pairs out of whole-stage
    codegen with O(n) live data per row — identical output, measured
    equal-or-faster at sf0.1 and strictly safer near the bucket cap.

    Buckets larger than ``max_bucket_size`` are boilerplate/exact-dup-class
    clusters: their quadratic expansion is what turns an LSH pass O(n²) on
    real corpora (measured 17× super-linear on a 10× replicated corpus).
    For those we emit STAR pairs (first member × each other member) —
    connected-component/cluster semantics are preserved with O(n) output,
    and the members are by construction near-identical, so the transitive
    pairs carry no extra information.
    """
    n = F.size("ids")
    heads = buckets.select(
        n.alias("_n"), F.col("ids"),
        F.posexplode(
            F.when(n <= max_bucket_size, F.col("ids"))
            .otherwise(F.slice("ids", 1, 1))
        ).alias("_i", a_name),
    )
    tail = (
        F.when(F.col("_n") <= max_bucket_size,
               F.slice("ids", F.col("_i") + 2, F.col("_n")))
        .otherwise(F.slice("ids", 2, F.col("_n")))
    )
    return heads.select(a_name, F.explode(tail).alias(b_name))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", key_col: str = "doc_id",
                      num_hashes: int = 32, bands: int = 8,
                      shingle_n: int = 5, threshold: float = 0.6,
                      max_bucket_size: int = 500) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH + exact Jaccard verify.

    Plan shape (the part that survives 1000 executors):
      1. signature stage: explode shingles (codegen'd sequence+substr, no
         array materialization — see _exploded_shingles) → K seeded minima
         as aggregate measures (map-side combined, one shuffled row per doc
         — see minhash_signatures), kept as K flat long columns;
      2. each band's signature collapses to ONE codegen'd ``xxhash64`` over
         that band's minima (a 64-bit band fingerprint: equal bands always
         collide, a false collision only adds a candidate that exact-verify
         kills) → explode to B compact (key, band, sig) rows — the shuffle
         moves 3 longs/row instead of round 1's key + K-long array × B;
      3. ``collect_list(key)`` per (band, sig) bucket + in-bucket pair
         expansion over the bare key array (buckets over ``max_bucket_size``
         fall back to star pairs — see _exploded_bucket_pairs for the measured
         super-linear blowup this prevents); the per-pair work is two long
         copies — round 1 evaluated an interpreted 32-element zip_with/
         aggregate agreement estimate per pair here, which was 58% of the
         whole bench and is gone;
      4. distinct candidate pairs (persisted: reused by three consumers,
         and at scale recomputing the signature pipeline per consumer is
         the real cost — the two persists live until Spark's LRU evicts
         them or the session ends; parameter-sweep callers that loop this
         operator should checkpoint/write the result and clear the session
         cache between runs), then exact Jaccard on *candidate docs only*: the
         corpus is semi-joined down to docs that appear in some pair before
         any shingle-set materialization, so verify-side shingle hashing is
         O(candidate docs), not O(corpus).

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold.
    """
    banded = _banded_rows(df, text_col, key_col, num_hashes, bands,
                          shingle_n)
    buckets = (
        banded.groupBy("band", "sig")
        .agg(F.sort_array(F.collect_list(key_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        _exploded_bucket_pairs(buckets, max_bucket_size, "doc_a", "doc_b")
        .distinct()
        .persist()
    )
    cand_ids = (
        cand.select(F.col("doc_a").alias(key_col))
        .unionAll(cand.select(F.col("doc_b").alias(key_col)))
        .distinct()
    )
    # verify on 64-bit-hashed shingle sets, computed ONLY for candidate docs:
    # Jaccard over hashes equals Jaccard over shingles up to xxhash64
    # collisions (negligible at any realistic doc size), and long-array
    # intersect/union is much cheaper than string-array. The set is built
    # through the same codegen'd explode as the signature stage +
    # ``collect_set`` — the row-local HOF build (char_ngrams → transform →
    # array_distinct) measured 97 s vs 8 s for 4.6k sf0.1 candidate docs
    # (scratch/bench_verify.py; same pairs bit-identically). An
    # explode+join+count Jaccard with no arrays at all was also measured
    # (14.1 s vs 6.7 s for this array_intersect verify) — the candidate set
    # is small enough that per-pair set intersection beats re-shuffling
    # exploded shingle rows. Persisted because both join sides read it.
    # the semi-join is NOT broadcast-hinted: on boilerplate-heavy corpora
    # the candidate set can approach corpus size, and a forced broadcast
    # would collect it to the driver — let AQE pick broadcast only when the
    # runtime size is actually small
    shingled = (
        _shingle_sets(df.join(cand_ids, key_col, "left_semi"),
                      text_col, key_col, shingle_n)
        .persist()
    )
    return _jaccard_verify(cand, shingled, key_col, threshold)


def _banded_rows(df: DataFrame, text_col: str, key_col: str,
                 num_hashes: int, bands: int, shingle_n: int) -> DataFrame:
    """(key, band, sig) LSH band-fingerprint rows — THE banding scheme.

    Single definition shared by the batch pass (minhash_lsh_pairs) and the
    incremental pass (operators/incremental.py): a persisted signature
    store written by one and probed by the other cannot silently fork."""
    if bands <= 0 or bands > num_hashes or num_hashes % bands:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}: each band "
            "fingerprints num_hashes/bands minima, and a non-divisor would "
            "silently discard trailing minhashes (or hash zero columns)"
        )
    rows_per_band = num_hashes // bands
    bases = _exploded_shingles(df, text_col, key_col, shingle_n)
    minima = _minhash_minima(bases, key_col, num_hashes)
    # r17: the band-struct array is ONE parsed expression (the DSL built
    # it with ~10 py4j round trips per band); identical tree — integer
    # band literals, xxhash64 over the band's minima columns, named
    # struct — so band fingerprints are bit-unchanged.
    structs = ",".join(
        "struct({b} AS band, xxhash64({cols}) AS sig)".format(
            b=b,
            cols=",".join(f"_mh{b * rows_per_band + i}"
                          for i in range(rows_per_band)))
        for b in range(bands))
    return minima.select(
        F.col(key_col),
        F.expr(f"explode(array({structs}))").alias("bb"),
    ).select(key_col, "bb.band", "bb.sig")


def _shingle_sets(df: DataFrame, text_col: str, key_col: str,
                  shingle_n: int) -> DataFrame:
    """(key, sh: array<bigint>) 64-bit-hashed distinct shingle sets — the
    exact-Jaccard verify representation, shared with the incremental store
    so stored sets and freshly-computed sets are bit-compatible."""
    return (
        _exploded_shingles(df, text_col, key_col, shingle_n)
        .groupBy(key_col)
        .agg(F.collect_set(F.xxhash64("_sh")).alias("sh"))
    )


def _jaccard_verify(cand: DataFrame, shingled: DataFrame, key_col: str,
                    threshold: float) -> DataFrame:
    """Exact Jaccard over candidate pairs given (key, sh) shingle sets;
    returns (doc_a, doc_b, jaccard ≥ threshold). See the prune-math
    comments inline."""
    sa = shingled.select(F.col(key_col).alias("doc_a"), F.col("sh").alias("sh_a"),
                         F.size("sh").alias("_na"))
    sb = shingled.select(F.col(key_col).alias("doc_b"), F.col("sh").alias("sh_b"),
                         F.size("sh").alias("_nb"))
    # |A∪B| = |A|+|B|-|A∩B| on distinct arrays: array_union (a second full
    # hash-set pass per pair) is replaced by two cheap size() calls
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.col("_na") + F.col("_nb") - inter
    # EXACT size-ratio prune before the intersect: J ≤ min(|A|,|B|)/max —
    # with |A| ≤ |B|, I ≤ |A| so J ≤ |A|/(|A|+|B|-|A|) = |A|/|B|; any pair
    # with min < (t−ε)·max provably scores round(J, 6) < t, so skipping its
    # intersection drops no qualifying pair (the ε=1e-6 margin covers the
    # final filter comparing the ROUNDED jaccard — round(J,6) ≥ t needs
    # J ≥ t−5e-7). The filter sits before the projection in the same
    # codegen stage, so pruned candidates never pay the O(|A|+|B|) set
    # build (10× stress: 3.9 M candidates → the prune removes the bulk of
    # band-collision noise pairs before the expensive step).
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .filter(F.least("_na", "_nb").cast("double")
                >= F.lit(threshold - 1e-6) * F.greatest("_na", "_nb"))
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


# one 16-bit counting lane per bit position j, j+16, j+32, j+48 — a 64-bit
# sum accumulates FOUR per-bit counts at once without lanes bleeding into
# each other as long as each count stays below 2^16 distinct tokens
_SIMHASH_LANE_MASK = 0x0001000100010001


def md5_token_hash(c: Column) -> Column:
    """Cross-engine-replayable 60-bit token hash (first 15 md5 hex chars).

    ``xxhash64`` is the fast default, but no other engine reproduces it;
    md5 is universal, so an oracle can replay the exact simhash pipeline
    (DuckDB: ``CAST('0x' || substring(md5(t), 1, 15) AS BIGINT)`` — verified
    byte-identical against this expression). 15 hex chars = 60 bits keeps
    the value positive in a signed i64; bits 60–63 never vote, so the
    signature carries 60 effective bits — the Hamming verify is unaffected
    (both sides of every XOR hold zeros there).
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       key_col: str = "doc_id", bits: int = 64,
                       hash_fn=None) -> DataFrame:
    """(key, simhash bigint): sign of the per-bit ±1 vote over token hashes.

    Plan shape mirrors minhash_signatures: explode distinct tokens → one
    ``xxhash64`` per token (64 well-mixed bits from a single native hash) →
    per-bit vote counts as aggregate measures → one codegen'd projection
    assembles the final word with ``shiftleft`` (exact for bit 63, where a
    ``pow(2.0,·)``-based assembly would saturate). Map-side combine makes
    the shuffle one row per document.

    The counts are SIMD-in-a-register packed: measure j sums
    ``(h >> j) & 0x0001000100010001``, accumulating four 16-bit lane counts
    (bits j, j+16, j+32, j+48) in one long — 16 measures + a token count
    instead of 64 ±1-vote sums. Measured 2× faster at sf0.1 with
    bit-identical output (scratch/bench_simhash.py); lanes are exact below
    2^16 distinct tokens per doc (a 64 KB-vocabulary document — far beyond
    any real row; the ±1 vote sign equals ``2·count > n``).

    ``hash_fn`` swaps the per-token hash (default ``xxhash64``); pass
    :func:`md5_token_hash` for an oracle-replayable signature.
    """
    assert bits == 64, "lane packing is laid out for the full 64-bit word"
    if hash_fn is None:
        hash_fn = F.xxhash64
    # empty-token floor (mirrors _exploded_shingles' greatest(...,1)): a
    # doc whose text yields zero tokens ('', '!!!') still gets a signature
    # — all such docs hash the same '' token, so they pair with each other
    # instead of silently vanishing from the dedup pass
    # r17 (guide §4 — the staging pattern): the distinct-token array is
    # materialized once per row in its own Project. The previous spelling
    # put the array_distinct(tokens(...)) subtree in BOTH the empty-floor
    # guard's size() and the otherwise branch of the generator, and
    # conditional-branch occurrences are outside codegen subexpression
    # elimination — the whole-document split+distinct ran twice per row.
    # Same arithmetic → bit-identical signatures (d3 oracle + planted
    # ground-truth tests re-pin).
    base = _parallelize(df, key_col).select(
        F.col(key_col),
        F.array_distinct(tokens(F.col(text_col))).alias("_arr"),
    )
    toks = base.select(
        F.col(key_col),
        F.explode(
            F.when(F.size("_arr") == 0, F.array(F.lit("")))
            .otherwise(F.col("_arr"))).alias("_t"),
    )
    hashed = toks.select(F.col(key_col), hash_fn(F.col("_t")).alias("_h"))
    # r17: lane measures and the 64-bit word assembly are parsed
    # expressions instead of per-bit DSL chatter (the assembly alone was
    # 64 iterations × ~6 py4j round trips — over half of d3's DataFrame
    # construction time). The SQL spells the IDENTICAL Catalyst tree:
    # SUM(shiftrightunsigned & mask) lane measures, CASE WHEN cnt*2 > _n
    # THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END
    # per bit, left-assoc |-fold — every output bit unchanged (d3 oracle
    # + planted ground-truth tests pin it).
    votes = hashed.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.expr(f"SUM(shiftrightunsigned(_h, {j}) & "
                   f"{_SIMHASH_LANE_MASK}L) AS _l{j}")
            for j in range(16)
        ],
    )
    terms = []
    for j in range(16):
        for lane in range(4):
            i = j + 16 * lane
            cnt = f"(shiftrightunsigned(_l{j}, {16 * lane}) & 65535)"
            terms.append(
                f"(CASE WHEN {cnt} * 2 > _n THEN "
                f"shiftleft(CAST(1 AS BIGINT), {i}) "
                f"ELSE CAST(0 AS BIGINT) END)")
    sig = F.expr(" | ".join(terms))
    return votes.select(F.col(key_col), sig.alias("simhash"))


def simhash_pairs(df: DataFrame, text_col: str = "text", key_col: str = "doc_id",
                  max_hamming: int = 6, max_bucket_size: int = 500,
                  hash_fn=None) -> DataFrame:
    """Band-colliding near-duplicate pairs with Hamming ≤ max_hamming.

    Candidates from 4 × 16-bit band buckets, verified with
    ``bit_count(a XOR b)``. Recall contract (pigeonhole): candidate
    generation is COMPLETE for Hamming ≤ 3 — any such pair shares an exact
    band. For wider radii the output is the band-colliding subset: a pair
    differing in ≥ 1 bit of every band is never generated (e.g. Hamming 4
    spread one-per-band). This is standard simhash-banding behavior; the
    DuckDB oracle and the planted ground-truth tests replay the identical
    banding, so the contract is pinned, not hidden. Callers needing full
    recall at radius r must split the word into > r bands. Shuffle is keyed on 16-bit band values;
    pairs are expanded inside each bucket (collect_list + slice) so the
    signature pipeline is scanned exactly once, with no self-join; buckets
    over ``max_bucket_size`` fall back to star pairs (see _exploded_bucket_pairs —
    a replicated-corpus stress showed unbounded expansion going 17×
    super-linear at 10× data).
    """
    sigs = simhash_signatures(df, text_col, key_col, hash_fn=hash_fn)
    return hamming_pairs(sigs, key_col=key_col, sig_col="simhash",
                         max_hamming=max_hamming,
                         max_bucket_size=max_bucket_size)


def _banded_sigs(sigs: DataFrame, key_col: str, sig_col: str) -> DataFrame:
    """(_k, _sig, band, val): 4 × 16-bit band rows per non-NULL 64-bit
    signature — the shared candidate-generation layout of
    :func:`hamming_pairs` and the incremental Hamming store (one
    definition, so batch and increment banding cannot drift)."""
    s = (sigs.select(F.col(key_col).alias("_k"),
                     F.col(sig_col).alias("_sig"))
         .filter(F.col("_sig").isNotNull()))
    return s.select(
        "_k", "_sig",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned("_sig", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
            )
            for b in range(4)
        ])).alias("bb"),
    ).select("_k", "_sig", "bb.band", "bb.val")


def hamming_pairs(sigs: DataFrame, key_col: str = "doc_id",
                  sig_col: str = "simhash", max_hamming: int = 6,
                  max_bucket_size: int = 500,
                  out_prefix: str = "doc") -> DataFrame:
    """Band-colliding pairs with ``bit_count(a XOR b) ≤ max_hamming``
    over ANY 64-bit signature column — the banding/verify half of
    :func:`simhash_pairs`, factored out so other 64-bit content
    signatures (perceptual image hashes, audio fingerprints) reuse the
    identical scale machinery: 4 × 16-bit band buckets, in-bucket
    Generate-chain pair expansion with the hot-bucket star cap, codegen
    ``bit_count`` verify. Same pigeonhole recall contract as simhash
    (complete for Hamming ≤ 3; wider radii get the band-colliding
    subset). NULL signatures are excluded — an unhashable item matches
    nothing. Output: (``{out_prefix}_a``, ``{out_prefix}_b``, hamming)
    with a < b.
    """
    banded = _banded_sigs(sigs, key_col, sig_col)
    buckets = (
        banded.groupBy("band", "val")
        .agg(F.sort_array(F.collect_list(F.struct("_k", "_sig"))).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return _hamming_expand(buckets, max_hamming, max_bucket_size, out_prefix)


def _hamming_expand(buckets: DataFrame, max_hamming: int,
                    max_bucket_size: int, out_prefix: str) -> DataFrame:
    """Bucket rows (``ids``: ascending-sorted (_k, _sig) structs) → the
    verified pair set. Pair expansion only COPIES the two structs; the
    Hamming distance is computed after the Generate chain, on flat
    columns, inside codegen (round 1 ran bit_count per pair inside the
    interpreted HOF). Shared by :func:`hamming_pairs` and the
    incremental Hamming store probe (identical cap + verify, so the
    increment ≡ batch argument holds by construction)."""
    return (
        _exploded_bucket_pairs(buckets, max_bucket_size)
        .select(
            F.col("a._k").alias(f"{out_prefix}_a"),
            F.col("b._k").alias(f"{out_prefix}_b"),
            F.bit_count(F.col("a._sig").bitwiseXOR(F.col("b._sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)  # before distinct: shrink
        .distinct()                               # the dedup shuffle input
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, oracle-checkable)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", key_col: str = "doc_id",
                        bucket_col: str = "lang", n: int = 3,
                        threshold: float = 0.2) -> DataFrame:
    """Exact word-n-gram Jaccard over all pairs *within a bucket column*
    (e.g. language). This is the oracle-verifiable exact form: O(n²) per
    bucket, so at scale buckets must be small (or use minhash_lsh_pairs —
    same output contract — as the approximate scale path).
    """
    grams = _parallelize(df, key_col).select(
        F.col(key_col), F.col(bucket_col).alias("bucket"),
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("g"),
    )
    a, b = grams.alias("a"), grams.alias("b")
    inter = F.size(F.array_intersect("a.g", "b.g")).cast("double")
    union = F.size("a.g") + F.size("b.g") - inter  # |A∪B| on distinct arrays
    # exact size-ratio prune (J ≤ min/max, with the ε=1e-6 margin covering
    # the rounded final comparison — see minhash_lsh_pairs): pairs whose
    # gram-set sizes already rule out the threshold skip the intersection
    # inside the same codegen stage; output set unchanged
    na, nb = F.size("a.g"), F.size("b.g")
    return (
        # eqNullSafe: a plain == never matches NULL buckets, silently
        # excluding every un-bucketed (e.g. lang=NULL) document from dedup
        a.join(b, on=[F.col("a.bucket").eqNullSafe(F.col("b.bucket")),
                      F.col(f"a.{key_col}") < F.col(f"b.{key_col}")])
        .filter(F.least(na, nb).cast("double")
                >= F.lit(threshold - 1e-6) * F.greatest(na, nb))
        .select(
            F.col(f"a.{key_col}").alias("doc_a"),
            F.col(f"b.{key_col}").alias("doc_b"),
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# connected components: near-dup pairs → cluster ids
# ---------------------------------------------------------------------------


def dedup_clusters(pairs: DataFrame, key_a: str = "doc_a", key_b: str = "doc_b",
                   max_iter: int = 20) -> DataFrame:
    """Connected components over a near-duplicate pair graph: every node
    gets ``cluster_id`` = the smallest key reachable from it. This is the
    step that turns pairwise LSH output into dedup decisions (keep one doc
    per cluster, e.g. ``cluster_id`` itself).

    Iterative min-label propagation WITH pointer doubling, as a bounded
    driver loop of pure DataFrame jobs — the standard Spark shape for
    iterative graph algorithms (each iteration: neighbor-min join +
    groupBy, then one label-shortcut self-join, all on compact
    (node, label) longs; per-iteration convergence check is an
    aggregate, not a collect of the data). Each round first takes the
    min label over the closed neighborhood, then shortcuts
    ``label(u) := label(label(u))`` (every label IS a node, so the
    shortcut join is total): if a node's label covers graph distance d
    before a round, it covers ≥ 2d+1 after — O(log diameter)
    convergence, the same doubling argument as Kiveris et al.'s
    large-star/small-star, so a diameter-1000 template-drift chain
    converges in ~10 rounds where plain one-hop propagation (r8) needed
    1000 and raised at ``max_iter``. The combined operator's fixed
    point equals plain propagation's (labels are component minima —
    the shortcut is the identity there), so results are unchanged.
    ``max_iter`` is a safety rail, not the expected path; hitting it
    raises rather than returning half-merged clusters.

    Lineage is truncated with an eager ``localCheckpoint`` every few
    iterations — MANDATORY for iterative DataFrame algorithms: with plain
    persist each ``labels_i`` logical plan still embeds the full upstream
    pair pipeline plus every previous iteration, so plan size grows
    linearly in iterations × pipeline size and the driver dies in Catalyst
    plan processing long before the data is big (reproduced: Java-heap OOM
    rendering the plan string on a 10× replicated corpus at iteration
    ~10). Between checkpoints each iteration persists and the previous
    iteration is unpersisted deterministically, so executor storage holds
    one live label table plus at most ⌈max_iter/interval⌉ checkpointed
    snapshots (freed by the ContextCleaner once their references drop).
    The checkpoint trade: its blocks are not recomputable, so a lost
    executor fails the convergence loop instead of recomputing — the right
    default here; swap to a reliable checkpoint dir on preemptible fleets.

    Output: (node, cluster_id) for every node in ``pairs``, one row each.
    """
    checkpoint_interval = 4
    edges = pairs.select(F.col(key_a).alias("a"), F.col(key_b).alias("b"))
    sym = edges.unionAll(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    prev_persisted = None
    for i in range(max_iter):
        nbr = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(sym["a"].alias("node"), F.col("label"))
        )
        # eager localCheckpoint BEFORE the self-join below: the shortcut
        # references `propagated` twice, so without it each iteration
        # would execute the neighbor-join + aggregation twice (exchange
        # reuse saves the shuffle, not the post-shuffle agg) and the
        # logical plan would double per iteration between the interval
        # checkpoints — the exact bloat pathology documented above.
        propagated = (
            labels.unionAll(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint()
        # pointer doubling: label(u) := label(label(u)). Inner join is
        # total (labels are monotone-decreasing minima of node ids, so
        # every label value is itself a node with a label row) and
        # monotone (label(m) ≤ m), so correctness is untouched while
        # the covered distance doubles per round.
        shortcut = propagated.select(F.col("label").alias("_via"),
                                     F.col("node").alias("_n2"))
        new_labels = (
            propagated.join(shortcut,
                            propagated["label"] == shortcut["_n2"])
            .select("node", F.col("_via").alias("label"))
        )
        if (i + 1) % checkpoint_interval == 0:
            new_labels = new_labels.localCheckpoint()
        else:
            new_labels = new_labels.persist()
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "node")
            .filter(F.col("label") != F.col("old"))
            .limit(1).count()
        )
        if prev_persisted is not None:
            prev_persisted.unpersist()
        prev_persisted = new_labels if new_labels.is_cached else None
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iter} iterations"
        )
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def keep_best_per_cluster(clusters: DataFrame, scores: DataFrame,
                          key_col: str = "doc_id",
                          score_col: str = "quality_score") -> DataFrame:
    """The "which copy survives" step between :func:`dedup_clusters` and
    the corpus rewrite: (key, cluster_id, kept) keeping exactly ONE
    member per cluster — the highest-``score_col``, key-ascending on ties
    (deterministic, partitioning-independent). Cluster members absent
    from ``scores`` rank as NULL (last), so a scoring gap can never
    silently promote an unscored copy over a scored one.

    Keeping min-key (``cluster_id`` itself) is free but keeps an
    arbitrary copy; real pipelines keep the BEST copy (longest, highest
    quality classifier score, freshest crawl) — pass any per-document
    score table, e.g. ``quality_features`` output.

    Plan shape at 100 TB: one key join (clusters × scores — both sides
    key-partitioned longs+doubles, never text), then the per-cluster
    best via a ``max(struct(score, −node))`` AGGREGATE — deliberately
    not a window rank: aggregation gets map-side combine (each input
    partition collapses to one row per cluster before the shuffle) and
    AQE skew splitting, so a degenerate giant cluster — boilerplate
    corpora produce them through transitive chaining, and the pair
    generators' star caps bound pair COUNTS, not component sizes —
    cannot become a single-task window sort. The winner joins back on
    the cluster key to tag members.
    """
    joined = (clusters.join(
        scores.select(F.col(key_col).alias("node"),
                      F.col(score_col).alias("_s")),
        "node", "left"))
    # NULL scores rank below every real score via a -inf floor (explicit,
    # rather than leaning on struct NULL-ordering rules); max of
    # (score, ~node) ⇒ highest score, smallest key on ties. Bitwise NOT
    # (= -node-1) is a strictly DECREASING bijection with no overflow:
    # plain negation wraps Long.MIN_VALUE to itself in non-ANSI mode,
    # and xxhash64-derived keys (register_binary_dir) span the full
    # signed range, so -node could silently invert the tie-break there.
    ranked = joined.select(
        "node", "cluster_id",
        F.struct(
            F.coalesce(F.col("_s"), F.lit(float("-inf"))).alias("s"),
            F.bitwise_not(F.col("node")).alias("negnode")).alias("_b"))
    best = (ranked.groupBy("cluster_id")
            .agg(F.max("_b").alias("_best")))
    return (ranked.join(best, "cluster_id")
            .select(F.col("node").alias(key_col), "cluster_id",
                    (F.col("_b") == F.col("_best")).alias("kept")))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(df: DataFrame, vec_col: str = "embedding",
                            key_col: str = "vec_id", threshold: float = 0.95,
                            planes: int = 16,
                            max_bucket_size: int = 500) -> DataFrame:
    """Vector near-duplicates: cosine ≥ threshold, candidates from
    random-hyperplane LSH (sign-bit bucket join), exact cosine verify.

    High cosine ⇒ high sign-agreement probability (1 - θ/π per plane), so a
    16-bit full-signature match keeps recall high at 0.95+ while cutting the
    join from O(n²) to per-bucket. (The HOF-fold signature/cosine shape is
    a measured choice — see similarity.py's module docstring.)

    Buckets over ``max_bucket_size`` (duplicate-embedding classes: zero
    vectors, boilerplate pages embedded identically) fall back to star
    pairs against the bucket's min-key hub — the same bounded-output trade
    as the text dedup family (see _exploded_bucket_pairs); without it a
    degenerate cluster of n identical vectors costs n²/2 cosine
    evaluations. The d5 oracle replays the cap bit-for-bit.
    """
    from datafusion_substrait_spark.operators.similarity import (dot, norm,
                                                                 rh_signature)

    # norm precomputed once per ROW: cosine() at pair level would re-fold
    # both 64-dim norms per candidate PAIR (the semdedup 3×-arithmetic
    # lesson; identical IEEE product, so the d5 oracle is unchanged).
    # _parallelize (r17): the 16-plane signature + norm folds are the
    # per-row hot path and a single-file toy input serializes them on one
    # task — same gate (and same no-op-at-scale argument) as the text
    # dedup family above; pair output is partitioning-independent.
    df = _parallelize(df, key_col)
    sigs = df.select(F.col(key_col), F.col(vec_col),
                     rh_signature(F.col(vec_col), planes).alias("bucket"),
                     norm(F.col(vec_col)).alias("_nrm"))
    counts = (sigs.groupBy("bucket")
              .agg(F.count("*").alias("_n"), F.min(key_col).alias("_hub"))
              .filter(F.col("_n") > 1))
    a, b = sigs.alias("a"), sigs.alias("b")
    pair_cos = F.try_divide(
        dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")),
        F.col("a._nrm") * F.col("b._nrm"))
    return (
        a.join(F.broadcast(counts), "bucket")
        .join(b, on=[F.col("a.bucket") == F.col("b.bucket"),
                     F.col(f"a.{key_col}") < F.col(f"b.{key_col}")])
        .filter((F.col("_n") <= max_bucket_size)
                | (F.col(f"a.{key_col}") == F.col("_hub")))
        .select(
            F.col(f"a.{key_col}").alias("vec_a"),
            F.col(f"b.{key_col}").alias("vec_b"),
            F.round(pair_cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semdedup(df: DataFrame, centroids: list[list[float]],
             vec_col: str = "embedding", key_col: str = "vec_id",
             threshold: float = 0.95,
             max_cell_size: int = 500) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication inside k-means cells of the embedding space.

    Returns EVERY input row tagged ``(key, cell, kept)``: ``kept`` is
    false iff some same-cell row with a smaller key has 6dp-rounded
    cosine >= ``threshold`` — the deterministic keep-min-key variant of
    the paper's one-per-duplicate-group rule (the paper's
    keep-farthest-from-centroid choice needs a score tie-break anyway;
    min-key is order- and partitioning-independent, and matches this
    module's pair convention where the dropped side is always ``b``).

    Plan shape / 100 TB notes:
      * assignment is a narrow map against centroid literals
        (``similarity.assign_cells``) — no shuffle;
      * the only data shuffle is the within-cell self-join on ``cell``.
        The paper's cost model applies: n_cells must scale with the
        corpus (they run 50k clusters at 100M+ docs) so per-cell
        all-pairs work stays bounded — pass ``train_kmeans_centroids``
        output of the right width;
      * degenerate cells past ``max_cell_size`` (near-identical embedding
        classes) fall back to star pairs against the cell's min-key hub,
        the same bounded-output trade (and the same oracle-replayable
        arithmetic) as ``embedding_neardup_pairs``;
      * the final kept-tag join is a key join the optimizer sizes itself
        (drop set can be O(corpus); never broadcast it by hand).
    """
    from datafusion_substrait_spark.operators.similarity import (assign_cells,
                                                                 dot, norm)

    assigned = assign_cells(df, centroids, vec_col=vec_col, key_col=key_col)
    counts = (assigned.groupBy("cell")
              .agg(F.count("*").alias("_n"), F.min(key_col).alias("_hub"))
              .filter(F.col("_n") > 1))
    # norms precomputed ONCE PER ROW before the self-join: cosine() at
    # pair level would re-fold both 64-dim norms per PAIR — 3× the
    # arithmetic on an O(cell²) row count (measured 7.5s → 4.5s at sf0.1)
    dim = len(centroids[0])
    if dim <= 96:
        # the pair dot is THE O(cell²) hot path, and the HOF fold
        # (zip_with+aggregate) is CodegenFallback — interpreted per pair.
        # Unpacking the STORED vector to scalar columns ONCE PER ROW
        # before the self-join turns it into flat codegen arithmetic
        # (left-assoc v0·u0 + v1·u1 + …, the HOF's exact fp fold order —
        # bit-identical drops; interleaved A/B at sf0.1: 4.44 → 2.80s).
        # This is THE _flat_dot site — the self-join's pair count dwarfs
        # the row count; see similarity.py's module docstring for the
        # three measured boundaries where the fold stays. Guarded to
        # dim ≤ 96: past spark.sql.codegen.maxFields (default 100) the
        # wide row would disable whole-stage codegen for the join stage.
        from datafusion_substrait_spark.operators.similarity import (
            _flat_dot, _unpacked)

        flat = _unpacked(
            assigned, vec_col, "_v", dim,
            [F.col(key_col), F.col("cell"),
             norm(F.col(vec_col)).alias("_nrm")])
        a, b = flat.alias("a"), flat.alias("b")
        pair_dot = _flat_dot("a._v", "b._v", dim)
    else:
        flat = assigned.withColumn("_nrm", norm(F.col(vec_col)))
        a, b = flat.alias("a"), flat.alias("b")
        pair_dot = dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    pair_cos = F.try_divide(pair_dot, F.col("a._nrm") * F.col("b._nrm"))
    drops = (
        a.join(F.broadcast(counts), "cell")
        .join(b, on=[F.col("a.cell") == F.col("b.cell"),
                     F.col(f"a.{key_col}") < F.col(f"b.{key_col}")])
        .filter((F.col("_n") <= max_cell_size)
                | (F.col(f"a.{key_col}") == F.col("_hub")))
        .filter(F.round(pair_cos, 6) >= threshold)
        .select(F.col(f"b.{key_col}").alias(key_col))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        assigned.join(drops, key_col, "left")
        .select(key_col, "cell",
                F.coalesce(~F.col("_dup"), F.lit(True)).alias("kept"))
    )
