"""Source registration (csv/json/orc/parquet) and sink writers."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datafusion_substrait_spark.sources import catalog, sinks
from tests.conftest import SF_DIR, rows_set


def test_register_json_and_orc_roundtrip(spark, tmp_path):
    src = spark.table("nation").select("n_nationkey", "n_name")
    jpath = str(tmp_path / "nation_json")
    opath = str(tmp_path / "nation_orc")
    src.write.mode("overwrite").json(jpath)
    src.write.mode("overwrite").orc(opath)

    jdf = catalog.register_json(spark, "nation_j", jpath)
    odf = catalog.register_orc(spark, "nation_o", opath)
    assert rows_set(jdf.select("n_nationkey", "n_name")) == rows_set(src)
    assert rows_set(odf) == rows_set(src)
    # registered views are producible (path→name recovery works)
    from datafusion_substrait_spark import roundtrip

    out = roundtrip(spark.sql("SELECT n_name FROM nation_o WHERE n_nationkey < 5"))
    assert out.count() == 5


def test_write_parquet_partitioned(spark, tmp_path):
    path = str(tmp_path / "orders_by_status")
    sinks.write_parquet(spark.table("orders").select("o_orderkey", "o_totalprice",
                                                     "o_orderstatus"),
                        path, partition_by=("o_orderstatus",))
    # directory partitions exist and prune on read
    sub = [d for d in os.listdir(path) if d.startswith("o_orderstatus=")]
    assert len(sub) >= 2
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    phys = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in phys
    assert back.count() == spark.table("orders").filter("o_orderstatus = 'F'").count()


def test_write_parquet_target_files(spark, tmp_path):
    path = str(tmp_path / "small")
    sinks.write_parquet(spark.table("region"), path, target_files=1)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 1


def test_write_bucketed_join_skips_shuffle(spark, tmp_path):
    # managed tables land in the session's warehouse dir; DROP TABLE below
    # removes their files
    spark.sql("DROP TABLE IF EXISTS cust_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    sinks.write_bucketed(spark.table("customer").select("c_custkey", "c_name"),
                         "cust_b", "c_custkey", n_buckets=4)
    sinks.write_bucketed(spark.table("orders").select("o_orderkey", "o_custkey"),
                         "ord_b", "o_custkey", n_buckets=4)
    j = spark.table("cust_b").join(
        spark.table("ord_b"), F.col("c_custkey") == F.col("o_custkey"))
    phys = j._jdf.queryExecution().executedPlan().toString()
    # co-located bucketed join: no Exchange on either side
    assert "Exchange hashpartitioning" not in phys
    assert j.count() > 0
    spark.sql("DROP TABLE IF EXISTS cust_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
