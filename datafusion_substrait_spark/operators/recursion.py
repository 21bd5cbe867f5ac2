"""Bounded recursive-query execution as a driver loop of DataFrame jobs.

The interchange keeps `WITH RECURSIVE` as a NAMED fence (Substrait has no
recursion rel — Catalyst's UnionLoop cannot ride the plan, see
tests/test_interchange_edges.py); this module is the supported manual
equivalent: the same semi-naive iterate-until-empty evaluation Spark 4.1's
own UnionLoopExec runs, expressed as a bounded loop of pure DataFrame
stages so every step stays inside Catalyst/AQE.

Scale shape: the loop is the standard Spark iterative-algorithm pattern
(cf. dedup.dedup_clusters): per iteration one `step` plan over the
CURRENT FRONTIER only (semi-naive — never the accumulated result), an
anti-join against the accumulated rows for UNION-distinct semantics, and
eager `localCheckpoint` lineage truncation so plan size stays O(step),
not O(iterations × step). The empty-frontier check is a `limit(1).count()`
— a metadata-sized job, never a collect of the data.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def recursive_union(seed: DataFrame,
                    step: Callable[[DataFrame], DataFrame],
                    max_iter: int = 100,
                    distinct: bool = True) -> DataFrame:
    """Evaluate ``WITH RECURSIVE r AS (seed UNION [ALL] step(r))``.

    ``step`` receives the previous iteration's FRONTIER (the rows that
    were new in that iteration — semi-naive evaluation, exactly what
    UnionLoop feeds its recursion leg) and returns the next candidate
    rows with the same schema. Iteration stops when a step produces no
    new rows; ``max_iter`` (default = Spark's own
    ``spark.sql.cte.recursion.level.limit`` default of 100) raises
    rather than silently truncating — the same contract as Spark's
    native recursion guard.

    ``distinct=True`` gives UNION semantics: a row already accumulated
    is removed from the frontier (this is also what guarantees
    termination on cyclic graphs). ``distinct=False`` gives UNION ALL:
    rows accumulate unconditionally, so ``step`` itself must converge to
    empty (e.g. carry a bounded level column) — cycles will hit
    ``max_iter``.
    """
    if max_iter <= 0:
        raise ValueError(f"max_iter must be positive, got {max_iter}")
    acc = (seed.distinct() if distinct else seed).localCheckpoint()
    frontier = acc
    for _ in range(max_iter):
        nxt = step(frontier)
        if distinct:
            # EXCEPT DISTINCT: null-safe row equality, exactly SQL UNION's
            # duplicate rule — also what terminates cyclic graphs
            nxt = nxt.subtract(acc)
        nxt = nxt.localCheckpoint()
        if nxt.limit(1).count() == 0:
            return acc
        acc = acc.unionByName(nxt).localCheckpoint()
        frontier = nxt
    raise RuntimeError(
        f"recursive_union did not converge in {max_iter} iterations "
        "(matches Spark's cte.recursion.level.limit contract: raise, "
        "never silently truncate)")
