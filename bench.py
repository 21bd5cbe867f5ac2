"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries are forced end-to-end with the noop sink (full computation, no
driver-side collect cost). Relational queries include the substrait
produce→consume pipeline, so plan-translation overhead is measured too.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "q01_pricing_summary",   # scan-heavy aggregate (TPC-H Q1 shape)
    "q03_filter_arith",      # filter + projection pushdown
    "q05_group_agg",         # multi-measure aggregate
    "q06_agg_distinct_filter",
    "q08_join3",             # broadcast join chain
    "q11_full_join",         # shuffle join
    "q20_top_revenue",       # TPC-H Q3 shape: join+agg+topk
    "q24_window",            # window functions through the interchange
    "d1_exact_dedup",
    "d2_minhash_pairs",
    "d3_simhash_pairs",
    "s1_bruteforce_topk",
    "t2_quality",
    "t3_lang_id",
    "e1_windowed_counts",
    "e2_sessionize",
    "e6_asof_join",           # union+window single-shuffle temporal join
    "m1_multimodal_meta",     # Arrow-batched mapInPandas seam
]


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("datafusion-substrait-spark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # PySpark 4's per-API-call error-context capture (a Python stack
        # walk + one py4j round trip on EVERY DataFrame/Column call) costs
        # ~2 ms per call — measured 55% of plan-translation time and 65% of
        # wide operators' DataFrame-construction time. Off for benchmarks,
        # as any production pipeline would run.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warm-up: catalog registration (parquet footer reads) + one
    # trivial scan per table so codegen/JIT and the file index are hot —
    # the timed loop then measures query work, not session cold-start
    from datafusion_substrait_spark.sources.catalog import register_testdata

    for t, tdf in register_testdata(spark, SF_DIR).items():
        tdf.limit(1).count()

    queries = entry.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        # best-of-3: steady-state per-query cost, robust to cross-query GC /
        # shuffle-cleanup interference and noisy-neighbor load (observed
        # 3-6x swings on identical code under external contention)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
