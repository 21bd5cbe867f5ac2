"""Temporal joins for event/feature pipelines.

The reference has no temporal-join surface (SURVEY.md §2.5); these are the
Spark-native extensions a training-data pipeline needs when joining event
streams to slowly-changing features (label joins, point-in-time-correct
feature lookup, last-touch attribution).

``asof_join`` uses the union-window shape, not a range self-join:

* both sides are tagged and unioned (a narrow map),
* ONE shuffle on the join key sorts each key's timeline once,
* ``last(right_payload, ignorenulls=True)`` over
  ``rowsBetween(unboundedPreceding, currentRow)`` carries the most recent
  right-side row forward to every left row.

At 100 TB this is the difference between one shuffle of (key, ts, payload)
rows and an exploding ``l.ts BETWEEN r.ts - δ AND r.ts`` range join
(Spark's optimizer turns that into a broadcast-nested-loop or a cartesian
per key — quadratic in events per key).

Skew caveat: a window function's partition must be computed within ONE
task, and AQE's skew mitigation applies to sort-merge joins, not window
partitions — so a pathological hot key (one user with 10⁸ events) is a
straggler task that AQE will NOT split. Mitigations, in order: (a)
pre-aggregate the right side to unique (key, ts) so only the left side's
volume rides the hot partition; (b) for known-hot LEFT sides, use
``asof_join_salted`` below — it salts left rows across N sub-partitions
and replicates the (small) right timeline into each, giving identical
results with the hot key's work split N ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datafusion_substrait_spark.plans.proto import SubstraitError


def asof_join(left: DataFrame, right: DataFrame, on: str, ts_col: str,
              right_cols: list[str] | None = None,
              direction: str = "backward",
              tolerance: int | None = None,
              suffix: str = "_r") -> DataFrame:
    """Point-in-time join: each left row picks the nearest right row per
    ``on`` key with ``right.ts <= left.ts`` (backward, inclusive) or
    ``right.ts >= left.ts`` (forward). Left rows keep NULL right columns
    when no right row qualifies (left-join semantics); ``tolerance``
    (same unit as ``ts_col``) nulls matches further away than the bound.

    Ties: a right row at exactly the left timestamp matches (inclusive);
    among equal right timestamps the last in (ts, input) order wins —
    callers wanting determinism should dedupe right to unique (key, ts),
    which is also what makes the operation well-defined in any engine
    (DuckDB's ASOF JOIN has the same contract).

    Output: all left columns, then ``ts_col+suffix`` (matched right
    timestamp) and each of ``right_cols`` suffixed.
    """
    if direction not in ("backward", "forward"):
        raise SubstraitError(f"asof direction must be backward/forward, got {direction!r}")
    if right_cols is None:  # explicit [] means "matched timestamp only"
        right_cols = [c for c in right.columns if c not in (on, ts_col)]

    # tag + union: left payload rides as-is, right payload rides in a struct
    # so one last(ignorenulls) carries ts and all right columns atomically
    rpay = F.struct(F.col(ts_col).alias(ts_col),
                    *[F.col(c) for c in right_cols]).alias("_rpay")
    # the NULL-literal cast targets are built python-side from the inputs'
    # (already-analyzed, cached) schemas: CreateNamedStruct's field types
    # and nullability are exactly the child columns' schema entries, and
    # re-deriving them via `right.select(rpay).schema` re-ANALYZED the
    # whole input lineage per call — for the salted variant that analysis
    # was a third of e7's DataFrame-construction time (r17; bit-identical
    # types, pinned by the e6/e7 oracles and the NULL-semantics tests)
    from pyspark.sql.types import StructField, StructType

    def _pay_type(df: DataFrame, cols: list[str]) -> StructType:
        by_name = {f.name: f for f in df.schema.fields}
        return StructType([StructField(c, by_name[c].dataType,
                                       by_name[c].nullable) for c in cols])

    rpay_t = _pay_type(right, [ts_col, *right_cols])
    lpay_t = _pay_type(left, list(left.columns))
    l_tag = left.select(
        F.col(on), F.col(ts_col).alias("_ts"), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lpay"),
        F.lit(None).cast(rpay_t).alias("_rpay"),
    )
    # a NULL-timestamp right row can never be a temporal match, but under
    # the ascending nulls-first sort it would be carried by last(ignorenulls)
    # as a phantom "earliest" match — drop such rows up front. A NULL-KEY
    # right row can never match either (equi-join semantics: NULL = NULL is
    # not a match, same as DuckDB ASOF), yet Window.partitionBy groups all
    # NULL keys into one partition where it WOULD be carried to NULL-key
    # left rows — drop those too (the NULL-key left rows then sit in a
    # right-free partition and keep NULL right columns, as they should).
    r_tag = right.filter(
        F.col(ts_col).isNotNull() & F.col(on).isNotNull()).select(
        F.col(on), F.col(ts_col).alias("_ts"), F.lit(0).alias("_side"),
        F.lit(None).cast(lpay_t).alias("_lpay"),
        rpay,
    )
    unioned = l_tag.unionByName(r_tag)

    # backward: ascending timeline, right rows sort before left at equal ts
    # (side 0 < 1) so the inclusive match is visible to last(); forward is
    # the mirrored ordering. NULL-ts LEFT rows must sort FIRST in both
    # directions so their window sees no right rows (asc is nulls-first
    # already; desc defaults to nulls-LAST, which would hand a NULL-ts left
    # row the whole timeline and a phantom smallest-ts match).
    if direction == "backward":
        order = [F.col("_ts").asc_nulls_first(), F.col("_side").asc()]
    else:
        order = [F.col("_ts").desc_nulls_first(), F.col("_side").asc()]
    w = (Window.partitionBy(on).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (
        unioned.withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if tolerance is not None:
        dist = (F.col("_ts") - F.col(f"_m.{ts_col}") if direction == "backward"
                else F.col(f"_m.{ts_col}") - F.col("_ts"))
        matched = matched.withColumn(
            "_m", F.when(dist <= F.lit(tolerance), F.col("_m")))
    return matched.select(
        *[F.col(f"_lpay.{c}").alias(c) for c in left.columns],
        F.col(f"_m.{ts_col}").alias(ts_col + suffix),
        *[F.col(f"_m.{c}").alias(c + suffix) for c in right_cols],
    )


def asof_join_salted(left: DataFrame, right: DataFrame, on: str,
                     ts_col: str, right_cols: list[str] | None = None,
                     direction: str = "backward",
                     tolerance: int | None = None,
                     suffix: str = "_r", salt: int = 8) -> DataFrame:
    """Hot-key variant of :func:`asof_join` with identical results.

    Left rows are salted into ``salt`` sub-partitions by a deterministic
    row hash; the right timeline is REPLICATED into every sub-partition,
    so each left row still sees the full right timeline for its key and
    the per-row result is independent of which salt bucket it landed in —
    no cross-salt boundary fix-up is needed. The window shuffle then keys
    on (key, salt), splitting a hot key's work ``salt`` ways.

    Cost model: right rides the shuffle ``salt`` times. Right for the
    scenario this exists for — a hot LEFT side (10⁸ events for one user)
    against a modest right timeline (feature snapshots). If the RIGHT
    side per key is also huge, pre-aggregate it to unique (key, ts) first;
    replicating an already-skewed right side would trade one straggler
    for ``salt`` of them.

    NULL semantics match the plain path exactly: NULL-key/NULL-ts right
    rows are dropped here (before the composite struct key would mask the
    field-level NULL), and NULL-key left rows land in right-free
    partitions and keep NULL right columns.
    """
    if salt < 1:
        raise SubstraitError(f"salt must be >= 1, got {salt}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts_col)]
    ckey = "_asof_key"
    # deterministic per-row salt (stable under task retry/speculation);
    # hashing every column spreads rows even when the hot key has few
    # distinct timestamps
    l_salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                    F.lit(salt))
    l2 = left.withColumn(ckey, F.struct(F.col(on).alias("k"),
                                        l_salt.alias("s")))
    # struct(NULL, s) is itself non-NULL, so asof_join's internal NULL-key
    # fence would not fire on the composite key — enforce it on the real
    # key here, pre-replication
    r2 = (right.filter(F.col(on).isNotNull() & F.col(ts_col).isNotNull())
          .withColumn("_s", F.explode(F.array(
              *[F.lit(i) for i in range(salt)])))
          .withColumn(ckey, F.struct(F.col(on).alias("k"),
                                     F.col("_s").alias("s")))
          .drop("_s"))
    out = asof_join(l2, r2, on=ckey, ts_col=ts_col,
                    right_cols=right_cols, direction=direction,
                    tolerance=tolerance, suffix=suffix)
    return out.drop(ckey)
