"""Write a MULTI-FILE variant of an sf data directory (r18, VERDICT r17
#7 scaling legibility).

Every table in /root/testdata/sf* is one parquet file with one row
group, so scans cannot split: at those SFs the 8-core and 32-core bench
columns measure driver latency, not parallelism, and the suite's
scaling block is structurally unable to show speedup. This writer
produces the same tables split into N files each (row SET identical;
order differs, which no benched query observes — the oracle sorts), so
an A/B of `SPARK_GRAFT_SF_DIR=<mf dir>` at two core counts measures
real scan/compute parallelism.

Usage:
    python scripts/make_multifile_sf.py [src_dir] [dst_dir] [n_files]
defaults: /root/testdata/sf0.1  /tmp/spark_graft_mf/sf0.1  32

This is a data-prep utility, NOT a bench/harness change: bench.py and
the driver contract are untouched; point SPARK_GRAFT_SF_DIR at the
output to use it.
"""
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_mf/sf0.1"
n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 32

spark = (
    SparkSession.builder.master("local[8]")
    .appName("make-multifile-sf")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    # keep the physical types byte-compatible with the source files
    # (events.ts must stay timestamp[us]/NTZ — see sources.catalog)
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

os.makedirs(dst, exist_ok=True)
for path in sorted(glob.glob(os.path.join(src, "*.parquet"))):
    name = os.path.basename(path)           # e.g. lineitem.parquet
    out = os.path.join(dst, name)           # a DIRECTORY-table of n files
    df = spark.read.parquet(path)
    n = df.count()
    if os.path.exists(out):
        shutil.rmtree(out)
    df.repartition(n_files).write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert back.count() == n, (name, n, back.count())
    assert back.schema == df.schema, (name, df.schema, back.schema)
    print(f"{name}: {n} rows -> {len(files)} files")
print("done:", dst)
spark.stop()
