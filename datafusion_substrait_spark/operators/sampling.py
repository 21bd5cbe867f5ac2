"""Deterministic sampling for training-data pipelines.

The reference has no sampling surface (SURVEY.md §2.5); these are the
Spark-native extensions a corpus pipeline needs: reproducible subsets
(re-runs and backfills must pick the SAME rows — ``df.sample()`` does
not survive a re-run, a repartition, or an engine change) and per-stratum
rates (e.g. downsample dominant languages, keep the tail).

Mechanism: keep a row iff ``md5(key || salt) < threshold(rate)``, comparing
lowercase hex strings. md5 is uniform over keys, so P(keep) = rate to
~2^-32; any engine with md5 reproduces the exact row set (the DuckDB
oracle replays it verbatim — no RNG, no row order dependence). The
predicate is a narrow map over the key column: no shuffle, full codegen,
pushable below joins, and stable under any partitioning — at 100 TB the
sample decision never moves data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datafusion_substrait_spark.plans.proto import SubstraitError


def _threshold_hex(rate: float) -> str:
    """32-hex-digit cutoff: md5 hex below it ⇔ uniform draw below rate."""
    if not 0.0 <= rate <= 1.0:
        raise SubstraitError(f"sample rate must be in [0,1], got {rate}")
    # clamp to the 128-bit max: rate=1.0 keeps everything (md5 == ffff…ff
    # is excluded with probability 2^-128)
    cut = min(int(rate * (1 << 128)), (1 << 128) - 1)
    return format(cut, "032x")


def null_safe_tag(col: Column) -> Column:
    """'v'+value / bare 'n': NULL-safe string encoding of one column. A
    bare cast maps NULL to NULL (poisoning any hash built on it), and
    prefix-free tagging keeps NULL distinct from the literal string 'n'.
    Shared by the sampling keys here and the streaming dedup fingerprint
    (streaming/stateful.py) so the encoding cannot drift between them."""
    return F.coalesce(F.concat(F.lit("v"), col.cast("string")), F.lit("n"))


def _key_bytes(key: Column, salt: str) -> Column:
    """Null-safe hash input: 'v'+value / bare 'n' (++ salt). A bare cast
    would make md5(NULL) NULL and the comparison silently DROP every
    NULL-keyed row at any rate — even rate=1.0. With the sentinel, all
    NULL keys share one decision: identical keys, identical outcome, which
    is exactly the hash-sample contract."""
    return F.concat(null_safe_tag(key), F.lit(salt))


def sample_predicate(key: Column, rate: float, salt: str = "") -> Column:
    """Boolean keep-decision column (composable into any filter)."""
    return F.md5(_key_bytes(key, salt)) < _threshold_hex(rate)


def hash_sample(df: DataFrame, key_col: str, rate: float,
                salt: str = "") -> DataFrame:
    """Uniform deterministic sample: keep ~``rate`` of rows by key hash.
    Same (key, salt) ⇒ same decision everywhere — across re-runs,
    partitionings, and engines. Vary ``salt`` to draw an independent
    sample (e.g. disjoint train/validation splits via different salts +
    rejection, or holdout = NOT sample_predicate)."""
    return df.filter(sample_predicate(F.col(key_col), rate, salt))


def stratified_hash_sample(df: DataFrame, key_col: str, stratum_col: str,
                           rates: dict[str, float], default_rate: float = 1.0,
                           salt: str = "") -> DataFrame:
    """Per-stratum deterministic rates (e.g. ``{"en": 0.1, "de": 0.5}``):
    downsample over-represented strata, keep the tail. One CASE over the
    stratum column picks the threshold; the hash is computed once. Same
    narrow-map/no-shuffle properties as ``hash_sample``."""
    thr: Column = F.lit(_threshold_hex(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == value,
                     F.lit(_threshold_hex(rate))).otherwise(thr)
    h = F.md5(_key_bytes(F.col(key_col), salt))
    return df.filter(h < thr)


def target_mix_sample(df: DataFrame, key_col: str, stratum_col: str,
                      shares: dict[str, float], total: int | None = None,
                      salt: str = "") -> DataFrame:
    """Resample to a target stratum mix (the data-mixing step of a
    pretraining pipeline: e.g. ``{"en": 0.5, "code": 0.3, "de": 0.2}``).

    Picks the largest achievable output size T with every stratum s
    still able to supply ``shares[s]·T`` rows (T = min_s count_s /
    share_s, further capped by ``total`` if given), then keeps each
    stratum at rate ``shares[s]·T / count_s`` via the deterministic
    hash-threshold predicate — expected counts hit the mix; realized
    counts carry the usual hash-sampling binomial jitter. Strata not in
    ``shares`` are dropped (share 0). Shares are normalized, so relative
    weights work too.

    The stratum-count aggregate is collected to the driver — bounded by
    the number of DISTINCT strata (languages/domains: tiny by contract,
    like similarity.py's centroid collects), never by rows. The sampling
    pass itself is the same narrow shuffle-free map as
    ``stratified_hash_sample``.
    """
    if not shares:
        raise ValueError("shares must name at least one stratum")
    bad = {s: w for s, w in shares.items() if w <= 0}
    if bad:
        raise ValueError(f"shares must be positive, got {bad}")
    norm = sum(shares.values())
    shares = {s: w / norm for s, w in shares.items()}
    counts = {
        r["stratum"]: r["cnt"]
        for r in df.filter(F.col(stratum_col).isin(*shares))
        .groupBy(F.col(stratum_col).alias("stratum"))
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    missing = sorted(set(shares) - set(counts))
    if missing:
        raise ValueError(f"strata absent from the data: {missing}")
    t = min(counts[s] / w for s, w in shares.items())
    if total is not None:
        if total <= 0:
            raise ValueError(f"total must be positive, got {total}")
        t = min(t, float(total))
    rates = {s: min(1.0, w * t / counts[s]) for s, w in shares.items()}
    return stratified_hash_sample(df, key_col, stratum_col, rates,
                                  default_rate=0.0, salt=salt)


def deterministic_shuffle(df: DataFrame, key_col: str,
                          salt: str = "") -> DataFrame:
    """Reproducible pseudo-random global order: sort by
    ``md5(key ‖ salt)`` with the key itself as tie-break — the
    training-order shuffle of a data pipeline (example order must be
    random-looking but BIT-REPRODUCIBLE across re-runs, partitionings,
    and engines; ``df.orderBy(rand())`` is none of those). Vary ``salt``
    per epoch for independent orders.

    Executes as Spark's standard distributed sort — one range-partition
    exchange on the 32-char hash (sampled range boundaries keep the sort
    balanced regardless of key skew), then per-partition sorts; nothing
    funnels through one task. Downstream writers preserve the order
    per output file, which is what sequence packing consumes.
    """
    return df.orderBy(F.md5(_key_bytes(F.col(key_col), salt)),
                      F.col(key_col))
