"""Similarity search over embedding columns (``array<float>``).

Primitives (``dot``/``cosine``) are pure ``F.zip_with``/``F.aggregate``
expressions — JVM-side, codegen'd, no Python in the hot path.

Two search paths, same output contract (query_id, vec_id, cosine, rank):

* ``brute_force_topk`` — exact baseline. The *queries* side is broadcast
  (tiny), so the big embeddings table is scanned exactly once with NO
  shuffle of the vectors; only the (n_queries × k)-bounded scored rows move
  in the final top-k. This is the shape that survives 100 TB: never shuffle
  the corpus, broadcast the probes.
* ``lsh_topk`` — approximate scale path: random-hyperplane sign buckets
  prune the corpus to same/near-bucket candidates before exact scoring.
  Recall is tunable via ``planes`` (fewer planes → bigger buckets → higher
  recall & cost).

The IVF variant (k-means coarse quantizer + per-centroid partition pruning)
is the designed next step; random-hyperplane LSH was chosen first because it
needs no trained state and is fully deterministic for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_KNUTH = 2654435761  # Fibonacci-hash multiplier for deterministic planes


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as double (inputs may be array<float>)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _plane_weight(plane: int, d: Column) -> Column:
    """Deterministic pseudo-random weight in [-0.5, 0.5) for (plane, dim).

    Engine-portable integer arithmetic (no RNG state): Fibonacci-hash the
    (plane, dim) pair, scale to the unit interval.
    """
    mixed = (F.lit(plane * 8192 + 1) + d) * F.lit(_KNUTH) % F.lit(1 << 31)
    return mixed.cast("double") / F.lit(float(1 << 31)) - F.lit(0.5)


def rh_signature(vec: Column, planes: int = 16) -> Column:
    """Random-hyperplane LSH signature: bit p = sign(vec · w_p) (int)."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)

    def projector(plane: int):
        # 2-arg lambda only: extra default args break PySpark's HOF arity rules
        return lambda x, d: x.cast("double") * _plane_weight(plane, d)

    sig = F.lit(0)
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(vec, idx, projector(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def brute_force_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
                     vec_col: str = "embedding", key_col: str = "vec_id",
                     query_key_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k per query. Output (query_id, vec_id, cosine, rank).

    ``broadcast(queries)`` keeps the corpus un-shuffled; ties broken by
    vec_id so results are deterministic for the oracle.
    """
    q = queries.select(
        F.col(query_key_col), F.col(vec_col).alias("__qvec")
    )
    scored = embeddings.join(F.broadcast(q), on=F.lit(True), how="inner").select(
        query_key_col,
        key_col,
        F.round(cosine(F.col("__qvec"), F.col(vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_key_col).orderBy(
        F.col("cosine").desc(), F.col(key_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key_col, key_col, "cosine", "rank")
    )


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             vec_col: str = "embedding", key_col: str = "vec_id",
             query_key_col: str = "query_id", planes: int = 8) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket. Same schema as brute_force_topk; recall < 1 by design."""
    e = embeddings.withColumn("__bucket", rh_signature(F.col(vec_col), planes))
    q = queries.select(
        F.col(query_key_col),
        F.col(vec_col).alias("__qvec"),
        rh_signature(F.col(vec_col), planes).alias("__bucket"),
    )
    scored = e.join(F.broadcast(q), on="__bucket", how="inner").select(
        query_key_col,
        key_col,
        F.round(cosine(F.col("__qvec"), F.col(vec_col)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_key_col).orderBy(
        F.col("cosine").desc(), F.col(key_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_key_col, key_col, "cosine", "rank")
    )
