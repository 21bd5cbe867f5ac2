"""Data selection via importance resampling (DSIR — Xie et al. 2023,
arXiv:2302.03169): select raw-corpus documents that look like a target
corpus, by importance weights over hashed n-gram bucket distributions.

Beyond-reference surface (the reference is a plan-interchange library) in
the same family as sampling.py / contamination.py: the pretraining recipe
is "fit cheap bag-of-hashed-ngrams models of TARGET and RAW, weight every
raw doc by its target/raw likelihood ratio, Gumbel-top-k sample" — the
standard method for domain-targeted corpus selection at scale.

Scale shapes (the costs that matter at 100 TB):

* **bucket_profile** — explode word n-grams → bucket → count: ONE shuffle
  of at most ``n_buckets`` map-side-combined rows; the result is a tiny
  (≤ n_buckets)-row DataFrame.
* **dsir_log_weights** — the corpus-sized pass: explode grams (codegen'd,
  row-local), broadcast-join the ≤n_buckets log-ratio table, per-doc sum
  with map-side combine — one shuffle keyed on the doc key, never on text.
* **dsir_sample** — deterministic Gumbel-top-k: the Gumbel noise comes
  from an md5 hash of the key (RNG-free, partitioning-independent, same
  scheme as sampling.py), and top-k is ``orderBy().limit(k)`` which Spark
  executes as TakeOrderedAndProject (per-partition top-k, then a k-row
  merge on the driver side of the exchange — no global sort materializes).

Hashing: buckets default to ``xxhash64`` (JVM-native, codegen). Pass
``portable=True`` to bucket on the first 8 hex chars of md5 instead —
bit-replayable in DuckDB (the d3 ``md5_token_hash`` pattern), used by the
in-suite oracle replay; same 2^32-range unsigned value on both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import word_ngrams


def gram_buckets(text: Column, n: int = 2, n_buckets: int = 8192,
                 portable: bool = False) -> Column:
    """array<bigint> of hashed n-gram bucket ids for one document
    (row-local, codegen; duplicates kept — DSIR features are counts)."""
    grams = word_ngrams(text, n)
    if portable:
        # first 8 md5 hex chars as an unsigned 32-bit int, mod n_buckets —
        # conv(hex,16,10) returns a decimal string; the BIGINT cast is
        # exact for 8 hex chars. DuckDB replay:
        #   CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT) % n_buckets
        bucket = lambda g: F.pmod(  # noqa: E731
            F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint"),
            F.lit(n_buckets))
    else:
        bucket = lambda g: F.pmod(F.xxhash64(g), F.lit(n_buckets))  # noqa: E731
    return F.transform(grams, bucket)


def bucket_profile(df: DataFrame, text_col: str = "text", n: int = 2,
                   n_buckets: int = 8192, alpha: float = 1.0,
                   portable: bool = False) -> DataFrame:
    """(bucket, p, cnt): the corpus's add-``alpha``-smoothed hashed-n-gram
    bucket distribution, plus the raw bucket count. Smoothing covers
    never-seen buckets, so the log-ratio below is finite for every gram of
    the raw corpus; ≤ ``n_buckets`` rows out — broadcastable by
    construction. ``cnt`` lets the smoothing floor α/(T+αB) be computed
    exactly from T = Σcnt instead of reconstructed from Σp (which is
    0/0 when every bucket is present and catastrophically cancels when
    Σp rounds to 1.0 in double on a huge corpus)."""
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be positive (smoothing), got {alpha}")
    counts = (
        df.select(F.explode(
            gram_buckets(F.col(text_col), n, n_buckets, portable)
        ).alias("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = counts.agg(F.sum("cnt").alias("_t"))
    # 1-row broadcast cross-join attach (never F.lit a big constant; and a
    # scalar collect here would add a blocking job for no benefit)
    return counts.crossJoin(F.broadcast(total)).select(
        "bucket",
        ((F.col("cnt") + F.lit(float(alpha)))
         / (F.col("_t") + F.lit(float(alpha)) * n_buckets)).alias("p"),
        "cnt",
    )


def dsir_log_weights(df: DataFrame, target_profile: DataFrame,
                     raw_profile: DataFrame, text_col: str = "text",
                     key_col: str = "doc_id", n: int = 2,
                     n_buckets: int = 8192, alpha: float = 1.0,
                     portable: bool = False) -> DataFrame:
    """(key, n_grams, log_weight): per-document importance log-weight
    Σ_grams ln(p_target(bucket) / p_raw(bucket)), 6dp-rounded.

    Buckets absent from a profile take that profile's smoothing floor
    alpha / (total + alpha·n_buckets), recovered from any present row's
    (p, cnt) — so the ratio table stays ≤ n_buckets rows instead of a
    dense n_buckets expansion. Zero-gram documents keep a row with
    log_weight 0 (no evidence ⇒ neutral), mirroring pack_sequences'
    zero-token slot rule.
    """
    t = target_profile.select("bucket", F.col("p").alias("_pt"))
    r = raw_profile.select("bucket", F.col("p").alias("_pr"))
    ratios = t.join(r, "bucket", "full")
    exploded = (
        df.select(
            F.col(key_col),
            F.explode_outer(
                gram_buckets(F.col(text_col), n, n_buckets, portable)
            ).alias("bucket"),
        )
    )
    scored = exploded.join(F.broadcast(ratios), "bucket", "left")
    floors = _floor_attach(target_profile, raw_profile, alpha, n_buckets)
    scored = scored.crossJoin(F.broadcast(floors)).select(
        key_col,
        F.when(F.col("bucket").isNull(), F.lit(None).cast("double"))
        .otherwise(
            F.log(F.coalesce(F.col("_pt"), F.col("_tfloor")))
            - F.log(F.coalesce(F.col("_pr"), F.col("_rfloor")))
        ).alias("_lr"),
    )
    return (
        scored.groupBy(key_col)
        .agg(F.count("_lr").alias("n_grams"),
             F.round(F.coalesce(F.sum("_lr"), F.lit(0.0)), 6)
             .alias("log_weight"))
    )


def _floor_attach(target_profile: DataFrame, raw_profile: DataFrame,
                  alpha: float, n_buckets: int) -> DataFrame:
    """1-row (_tfloor, _rfloor): each profile's smoothing floor
    α/(T+α·B). When the profile carries ``cnt`` (bucket_profile's output)
    the floor is computed exactly from T = Σcnt. An externally-built
    (bucket, p)-only profile falls back to reconstructing T+αB from Σp —
    Σ_present p = (T + α·|present|)/(T + α·B) ⇒ T + α·B =
    α·(B − |present|)/(1 − Σp) — which is 0/0 when all B buckets are
    present and cancels badly as Σp → 1.0; hence the exact path is
    preferred. Pure aggregates over the tiny profile tables — no driver
    collect."""
    a = float(alpha)

    def one(p: DataFrame, name: str) -> DataFrame:
        if "cnt" in p.columns:
            return p.agg(
                (F.lit(a) / (F.coalesce(F.sum("cnt"), F.lit(0)).cast("double")
                             + F.lit(a) * n_buckets)).alias(name))
        return p.agg(
            (F.lit(a) * (F.lit(float(n_buckets)) - F.count(F.lit(1)))
             / (F.lit(1.0) - F.sum("p"))).alias("_denom")
        ).select((F.lit(a) / F.col("_denom")).alias(name))

    return one(target_profile, "_tfloor").crossJoin(one(raw_profile, "_rfloor"))


def dsir_sample(weights: DataFrame, k: int, key_col: str = "doc_id",
                salt: str = "") -> DataFrame:
    """Gumbel-top-k selection: keep the k documents maximizing
    ``log_weight + Gumbel(key)`` — equivalent to sampling k docs without
    replacement with probability ∝ exp(log_weight) (the DSIR paper's
    resampling step), made deterministic by deriving the Gumbel noise
    from an md5 hash of the key (RNG-free, partitioning-independent;
    change ``salt`` for an independent draw).

    Executes as TakeOrderedAndProject — per-partition top-k then a k-row
    merge; no global sort of the corpus.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    # 12 md5 hex chars → uniform in (0,1): (u64+1)/(16^12+1) keeps u
    # strictly inside the open interval so ln(-ln(u)) is always finite
    u = ((F.conv(F.substring(F.md5(F.concat(F.lit(salt),
                                            F.col(key_col).cast("string"))),
                             1, 12), 16, 10).cast("double") + 1.0)
         / float(16 ** 12 + 1))
    gumbel = -F.log(-F.log(u))
    return (
        weights.select(key_col, "n_grams", "log_weight",
                       F.round(F.col("log_weight") + gumbel, 6).alias("gumbel_score"))
        .orderBy(F.col("gumbel_score").desc(), F.col(key_col))
        .limit(k)
    )
