"""Session-6 end-of-round verify: drive the library through its PUBLIC
package boundary (produce -> serialize -> consume -> execute) plus live
DuckDB oracle comparisons for a cross-family sample of entry queries."""
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from datafusion_substrait_spark.sources.catalog import register_testdata  # noqa: E402

SF = "/root/testdata/sf0.001"
register_testdata(spark, SF)

ok = 0

# 1. Roundtrip: DataFrame -> plan -> DataFrame, identical rows
from datafusion_substrait_spark import to_substrait_plan, from_substrait_plan  # noqa: E402

df = (spark.table("lineitem")
      .filter(F.col("l_quantity") > 30)
      .groupBy("l_returnflag")
      .agg(F.sum("l_extendedprice").alias("rev"),
           F.count("*").alias("n")))
plan = to_substrait_plan(df)
back = from_substrait_plan(spark, plan)
a = sorted(map(tuple, df.collect()))
b = sorted(map(tuple, back.collect()))
assert a == b and len(a) > 0, f"roundtrip mismatch: {len(a)} vs {len(b)}"
print("1 roundtrip: OK", len(a), "rows"); ok += 1

# 2. Disk path: serialize -> raw JSON field names -> deserialize -> consume
from datafusion_substrait_spark import serialize, deserialize  # noqa: E402

with tempfile.TemporaryDirectory() as td:
    p = os.path.join(td, "plan.json")
    serialize("SELECT o_orderpriority, count(*) AS n FROM orders "
              "WHERE o_totalprice > 1000 GROUP BY o_orderpriority",
              spark, p)
    raw = open(p, "rb").read()
    assert b"namedTable" in raw or b"named_table" in raw, "no substrait field names in bytes"
    plan2 = deserialize(p)
    out = from_substrait_plan(spark, plan2)
    rows = out.collect()
    assert len(rows) > 0
print("2 disk path: OK", len(rows), "groups"); ok += 1

# 3. Scale check: pruning survived + join strategy on a consumed plan
q = ("SELECT c.c_name, sum(o.o_totalprice) AS tot FROM orders o "
     "JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY c.c_name")
with tempfile.TemporaryDirectory() as td:
    p = os.path.join(td, "j.json")
    serialize(q, spark, p)
    jdf = from_substrait_plan(spark, deserialize(p))
phys = jdf._jdf.queryExecution().executedPlan().toString()
assert "ReadSchema" in phys
import re
schemas = re.findall(r"ReadSchema: struct<([^>]*)>", phys)
assert any(len(s.split(",")) <= 3 for s in schemas), f"pruning lost: {schemas}"
assert "BroadcastHashJoin" in phys or "SortMergeJoin" in phys
print("3 scale check: OK pruned ReadSchema + join strategy present"); ok += 1

# 4. Error probes
from datafusion_substrait_spark import SubstraitError  # noqa: E402

import pandas as pd  # noqa: E402

try:
    to_substrait_plan(spark.table("orders").mapInPandas(
        lambda it: it, spark.table("orders").schema))
    raise AssertionError("mapInPandas should not produce")
except SubstraitError as e:
    assert "mapInPandas" in str(e) or "MapInPandas" in str(e)
print("4a mapInPandas probe: OK named error"); ok += 1

import shutil  # noqa: E402

with tempfile.TemporaryDirectory() as td:
    foreign = os.path.join(td, "foreign.parquet")
    shutil.copy(f"{SF}/orders.parquet", foreign)
    try:
        to_substrait_plan(spark.read.parquet(foreign).select("o_orderkey"))
        raise AssertionError("unregistered path should not produce")
    except SubstraitError as err:
        assert "register" in str(err).lower(), str(err)
print("4b unregistered-table probe: OK actionable error"); ok += 1

# window + explode ARE supported
wdf = from_substrait_plan(spark, to_substrait_plan(
    spark.sql("SELECT o_custkey, row_number() OVER (PARTITION BY o_custkey "
              "ORDER BY o_orderkey) rn FROM orders")))
assert wdf.count() > 0
edf = from_substrait_plan(spark, to_substrait_plan(
    spark.sql("SELECT explode(split(o_orderpriority, '-')) p FROM orders")))
assert edf.count() > 0
print("4c window+explode through the interchange: OK"); ok += 1

# 5-6. Entry contract + live oracle on a cross-family sample
import __spark_entry__ as e  # noqa: E402
import duckdb  # noqa: E402

assert set(e.ORACLES) == set(e.QUERIES) and len(e.QUERIES) == 50
con = duckdb.connect()
for t in ("lineitem", "orders", "customer", "documents", "embeddings",
          "events", "media"):
    path = f"{SF}/{t}.parquet"
    if os.path.exists(path):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

def key(r):
    return tuple((v is None, str(type(v)), v) for v in r)

SAMPLE = ["q01_pricing_summary", "q05_group_agg", "q28_explode",
          "t2_quality", "d8_semdedup", "s3_ivf_topk", "t13_chunk",
          "e6_asof_join", "m1_multimodal_meta", "d2_minhash_pairs"]
for name in SAMPLE:
    qdf = e.queries()[name](spark, SF)
    cols = sorted(qdf.columns)
    got = sorted(map(tuple, qdf.select(*cols).collect()), key=key)
    want = sorted(map(tuple, con.sql(
        f"SELECT {', '.join(cols)} FROM (" + e.oracle_sql()[name] + ")"
    ).fetchall()), key=key)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            if isinstance(gv, float) and isinstance(wv, float):
                assert abs(gv - wv) <= 1e-6 * max(1.0, abs(wv)), (name, gv, wv)
            else:
                assert gv == wv, (name, gv, wv)
    print(f"6 live oracle {name}: OK {len(got)} rows"); ok += 1

print(f"VERIFY OK: {ok} flows green")
spark.stop()
