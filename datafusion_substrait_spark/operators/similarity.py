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

* ``ivf_topk`` — IVF (inverted-file) scale path: a k-means coarse
  quantizer assigns every corpus vector to its nearest centroid; a query
  probes only the ``nprobe`` nearest cells. Training is a bounded driver
  loop of pure DataFrame jobs (assign = narrow map over broadcast
  centroids; update = one groupBy(cell) shuffle of dim-sized partial
  sums), with deterministic hash-picked initial centroids, so results are
  reproducible run-to-run. At 100 TB the corpus can additionally be
  *written bucketed by cell_id* so a probe prunes file groups instead of
  scanning.
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


def _nearest_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """Index (int) of the centroid with max cosine to ``vec``. Centroids are
    plan literals — effectively broadcast — so assignment is a narrow map."""
    best_i, best_s = F.lit(0), F.lit(float("-inf"))
    n = norm(vec)
    for i, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        s = dot(vec, carr) / (n * F.lit(sum(x * x for x in c) ** 0.5))
        better = s > best_s
        best_i = F.when(better, F.lit(i)).otherwise(best_i)
        best_s = F.when(better, s).otherwise(best_s)
    return best_i


def train_kmeans_centroids(embeddings: DataFrame, n_cells: int = 16,
                           iters: int = 10, vec_col: str = "embedding",
                           key_col: str = "vec_id",
                           sample_per_cell: int = 64) -> list[list[float]]:
    """Deterministic k-means coarse quantizer trained on a sample.

    The standard IVF recipe at corpus scale: the quantizer only needs a
    representative sample, so we pull the ``n_cells × sample_per_cell``
    vectors with the smallest ``xxhash64(key)`` (a deterministic
    pseudo-random sample — one distributed top-k, no RNG state, stable
    across runs/partitionings) and run Lloyd's iterations driver-side in
    numpy (milliseconds). The corpus-sized work — cell assignment — stays
    distributed as a narrow map against the returned centroids. This
    replaces per-iteration Spark jobs: at 100 TB you cannot afford
    ``iters`` full passes, and the sample loses nothing a coarse quantizer
    cares about.
    """
    import numpy as np

    n_sample = n_cells * sample_per_cell
    rows = (
        embeddings.select(vec_col, F.xxhash64(F.col(key_col)).alias("_h"))
        .orderBy("_h").limit(n_sample).collect()
    )
    x = np.array([list(map(float, r[vec_col])) for r in rows])
    cent = x[:n_cells].copy()
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(xn @ cn.T, axis=1)
        for c in range(n_cells):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return [list(map(float, c)) for c in cent]


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 10,
             vec_col: str = "embedding", key_col: str = "vec_id",
             query_key_col: str = "query_id", n_cells: int = 16,
             nprobe: int = 2,
             centroids: list[list[float]] | None = None) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer: score only corpus
    vectors whose cell is among the query's ``nprobe`` nearest centroids.
    Same output contract as brute_force_topk; recall tunable via
    ``n_cells``/``nprobe``. Pass pre-trained ``centroids`` to skip training
    (the production shape: train once, reuse across queries)."""
    if centroids is None:
        centroids = train_kmeans_centroids(embeddings, n_cells, vec_col=vec_col,
                                           key_col=key_col)
    e = embeddings.withColumn("__cell", _nearest_cell(F.col(vec_col), centroids))
    # query → its nprobe nearest cells, exploded to (query, probe_cell) rows
    scores = [
        (i,
         dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
         / (norm(F.col(vec_col)) * F.lit(sum(x * x for x in c) ** 0.5)))
        for i, c in enumerate(centroids)
    ]
    ranked_cells = F.slice(
        F.transform(
            F.array_sort(
                F.array(*[F.struct((-s).alias("negs"), F.lit(i).alias("cell"))
                          for i, s in scores])
            ),
            lambda st: st["cell"],
        ),
        1, nprobe,
    )
    q = queries.select(
        F.col(query_key_col),
        F.col(vec_col).alias("__qvec"),
        F.explode(ranked_cells).alias("__cell"),
    )
    scored = e.join(F.broadcast(q), on="__cell", how="inner").select(
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
