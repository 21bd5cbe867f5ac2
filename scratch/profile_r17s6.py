"""Session-6 build/exec split profiler: times DataFrame construction and
noop-sink execution separately for the most expensive benched queries.
Run AFTER the machine settles (bench-style probe gate inline)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

TARGETS = [
    "d8_semdedup", "t13_chunk", "t2_quality", "s1_bruteforce_topk",
    "m1_multimodal_meta", "q28_explode", "d3_simhash_pairs",
    "q20_top_revenue", "q05_group_agg", "d2_minhash_pairs", "s3_ivf_topk",
]


def cpu_probe():
    x = 0
    t0 = time.perf_counter()
    for _ in range(2_000_000):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return time.perf_counter() - t0


def mem_probe():
    import numpy as np
    buf = np.ones(50_000_000, dtype=np.float64)
    t0 = time.perf_counter()
    for _ in range(3):
        buf.sum()
    return time.perf_counter() - t0


spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("profile-r17s6")
    .config("spark.sql.shuffle.partitions", str(CPUS))
    .config("spark.driver.memory", "48g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from datafusion_substrait_spark.sources.catalog import register_testdata  # noqa: E402

for t, tdf in register_testdata(spark, SF_DIR).items():
    tdf.limit(1).count()

queries = entry.queries()
print(f"probes: cpu={cpu_probe():.3f} mem={mem_probe():.3f}", flush=True)

for name in TARGETS:
    builds, execs = [], []
    for _ in range(3):
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = queries[name](spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        builds.append(t1 - t0)
        execs.append(t2 - t1)
        spark.sparkContext.setJobDescription(None)
    print(f"{name}: build={min(builds):.3f} exec={min(execs):.3f} "
          f"(builds={[round(b,3) for b in builds]} "
          f"execs={[round(e,3) for e in execs]})", flush=True)

print(f"probes end: cpu={cpu_probe():.3f} mem={mem_probe():.3f}", flush=True)
spark.stop()
