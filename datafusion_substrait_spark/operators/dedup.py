"""Deduplication operators for large-scale training-data pipelines.

Five families, each designed around Spark's shuffle model (the costs that
matter at 100 TB, not at 60k rows):

* **exact**       — one hash-aggregate shuffle on a 32-byte fingerprint
                    (never on the full text).
* **MinHash+LSH** — shingle → K minhashes → B bands; candidate pairs come
                    from a *band-bucket self-join* (shuffle keyed on
                    (band, signature), so only colliding docs ever meet),
                    then exact Jaccard verification on the candidates only.
* **SimHash**     — 64-bit signature computed *row-locally* with
                    ``F.aggregate`` over the token array (zero shuffles until
                    the final bucket join); Hamming-distance verify via
                    ``bit_count(a XOR b)``.
* **n-gram Jaccard** — exact word-3-gram Jaccard on candidate pairs; the
                    all-pairs form is only for oracle-checkable correctness
                    runs and is documented as O(n²)-per-bucket.
* **embedding cosine** — near-duplicate vectors via random-hyperplane LSH
                    bucketing + exact cosine verify (see similarity.py for
                    the shared primitives).

All signature math uses engine-portable integer arithmetic: a splitmix64-ish
multiply-xor over crc32, NOT Spark's xxhash64 (which DuckDB cannot replay).
Everything is built-in-function-only — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_substrait_spark.operators.text import char_ngrams, tokens, word_ngrams

# 64-bit mask as a bigint-safe constant (Spark longs are signed; we stay in
# signed-64 space and let overflow wrap, which both engines do identically
# only if we avoid it — so all mixing stays within 63 bits)
_MERSENNE61 = (1 << 61) - 1


def _portable_hash(s: Column, seed: int) -> Column:
    """Deterministic engine-portable string hash into [0, 2^61-1].

    crc32 gives 32 deterministic bits; two seeded affine mixes over the
    Mersenne prime 2^61-1 spread them to 61 bits without signed overflow.
    Not cryptographic — a dedup/LSH workhorse. Deterministic across runs and
    partitionings (unlike RNG-seeded approaches); the arithmetic is portable,
    but DuckDB 1.0 lacks crc32, so signature-based operators get rows-only
    oracle checks while their *verification* stages (exact Jaccard / Hamming)
    are exact math.
    """
    base = F.crc32(s.cast("binary"))  # 0..2^32-1, portable
    a = 0x9E3779B97F4A7C15 % _MERSENNE61
    b = (0xBF58476D1CE4E5B9 + 0x2545F4914F6CDD1D * seed) % _MERSENNE61
    return (base * F.lit(a % (1 << 30)) + F.lit(b % (1 << 30)) + F.lit(seed) * base) % F.lit(
        _MERSENNE61
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Exact duplicate removal: keep the smallest key per normalized-text
    fingerprint. Output: (doc_id, fingerprint) of survivors.

    Scale shape: ONE shuffle, keyed on a 32-byte md5 — the full text never
    moves. At 100 TB this is the difference between shuffling 100 TB and
    shuffling ~2% of it.
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return (
        df.select(F.col(key_col), F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min(key_col).alias(key_col))
        .select(key_col, "fingerprint")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       key_col: str = "doc_id", num_hashes: int = 32,
                       shingle_n: int = 5) -> DataFrame:
    """(key, minhash: array<bigint>[num_hashes]) — row-local: shingling and
    all K minhashes are computed inside one projection over the text column
    (``F.transform`` + ``F.array_min``), so the stage is a narrow map with
    whole-stage codegen and no explode-induced row blowup."""
    sh = char_ngrams(F.col(text_col), shingle_n)

    def hasher(seed: int):
        # NB: must stay a 1-arg lambda — PySpark passes the array index to
        # 2-arg higher-order-function lambdas, which would clobber the seed
        return lambda s: _portable_hash(s, seed)

    sig = F.array(*[
        F.array_min(F.transform(sh, hasher(i))) for i in range(num_hashes)
    ])
    return df.select(F.col(key_col), sig.alias("minhash"))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text", key_col: str = "doc_id",
                      num_hashes: int = 32, bands: int = 8,
                      shingle_n: int = 5, threshold: float = 0.6) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH + exact Jaccard verify.

    Plan shape (the part that survives 1000 executors):
      1. narrow map: signatures (no shuffle);
      2. explode to B rows/doc, shuffle keyed on (band, band_signature) —
         only docs agreeing on a whole band ever co-locate;
      3. per-bucket self-join (skew-bounded: identical docs land together,
         AQE handles hot buckets);
      4. distinct candidate pairs, then exact Jaccard on just those pairs.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, key_col, num_hashes, shingle_n)
    banded = sigs.select(
        F.col(key_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.array_join(
                        F.transform(
                            F.slice("minhash", b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                        "_",
                    ).alias("sig"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(key_col, "bb.band", "bb.sig")
    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            on=[
                F.col(f"a.band") == F.col(f"b.band"),
                F.col(f"a.sig") == F.col(f"b.sig"),
                F.col(f"a.{key_col}") < F.col(f"b.{key_col}"),
            ],
        )
        .select(F.col(f"a.{key_col}").alias("doc_a"), F.col(f"b.{key_col}").alias("doc_b"))
        .distinct()
    )
    shingled = df.select(
        F.col(key_col), F.array_distinct(char_ngrams(F.col(text_col), shingle_n)).alias("sh")
    )
    sa = shingled.select(F.col(key_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = shingled.select(F.col(key_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       key_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """(key, simhash bigint): sign of the per-bit ±1 vote over token hashes.

    Entirely row-local: ``F.aggregate`` folds the token array into a
    ``bits``-wide vote vector in one codegen'd expression — no explode,
    no shuffle, no UDF. We use 2×32-bit halves from two portable hashes.
    """
    toks = F.array_distinct(tokens(F.col(text_col)))
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, t: F.zip_with(
            acc,
            F.array(*[
                F.when(
                    _portable_hash(t, 7 + (i // 32)).bitwiseAND(F.lit(1 << (i % 32))) > 0,
                    F.lit(1),
                ).otherwise(F.lit(-1)).cast("long")
                for i in range(bits)
            ]),
            lambda a, b: a + b,
        ),
    )
    sig = F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            # 2^i via pow (exact for i<63); shiftleft() only takes int bits
            lambda v, i: F.when(
                v > 0, F.pow(F.lit(2.0), i.cast("double")).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    return df.select(F.col(key_col), sig.alias("simhash"))


def simhash_pairs(df: DataFrame, text_col: str = "text", key_col: str = "doc_id",
                  max_hamming: int = 6) -> DataFrame:
    """Near-duplicate pairs with Hamming(simhash_a, simhash_b) ≤ max_hamming.

    Candidates from 4 × 16-bit band buckets (pigeonhole: any pair within
    Hamming ≤ 3 shares a band; wider radii still prune massively), verified
    with ``bit_count(a XOR b)``. Shuffle is keyed on 16-bit band values —
    bounded fan-out, no all-pairs join.
    """
    sigs = simhash_signatures(df, text_col, key_col)
    banded = sigs.select(
        key_col, "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
            )
            for b in range(4)
        ])).alias("bb"),
    ).select(key_col, "simhash", "bb.band", "bb.val")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on=[F.col("a.band") == F.col("b.band"),
                      F.col("a.val") == F.col("b.val"),
                      F.col(f"a.{key_col}") < F.col(f"b.{key_col}")])
        .select(
            F.col(f"a.{key_col}").alias("doc_a"),
            F.col(f"b.{key_col}").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
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
    grams = df.select(
        F.col(key_col), F.col(bucket_col).alias("bucket"),
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("g"),
    )
    a, b = grams.alias("a"), grams.alias("b")
    inter = F.size(F.array_intersect("a.g", "b.g")).cast("double")
    union = F.size(F.array_union("a.g", "b.g")).cast("double")
    return (
        a.join(b, on=[F.col("a.bucket") == F.col("b.bucket"),
                      F.col(f"a.{key_col}") < F.col(f"b.{key_col}")])
        .select(
            F.col(f"a.{key_col}").alias("doc_a"),
            F.col(f"b.{key_col}").alias("doc_b"),
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(df: DataFrame, vec_col: str = "embedding",
                            key_col: str = "vec_id", threshold: float = 0.95,
                            planes: int = 16) -> DataFrame:
    """Vector near-duplicates: cosine ≥ threshold, candidates from
    random-hyperplane LSH (sign-bit bucket join), exact cosine verify.

    High cosine ⇒ high sign-agreement probability (1 - θ/π per plane), so a
    16-bit full-signature match keeps recall high at 0.95+ while cutting the
    join from O(n²) to per-bucket.
    """
    from datafusion_substrait_spark.operators.similarity import cosine, rh_signature

    sigs = df.select(F.col(key_col), F.col(vec_col),
                     rh_signature(F.col(vec_col), planes).alias("bucket"))
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(b, on=[F.col("a.bucket") == F.col("b.bucket"),
                      F.col(f"a.{key_col}") < F.col(f"b.{key_col}")])
        .select(
            F.col(f"a.{key_col}").alias("vec_a"),
            F.col(f"b.{key_col}").alias("vec_b"),
            F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
