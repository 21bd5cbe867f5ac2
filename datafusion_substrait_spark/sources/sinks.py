"""Sinks: writing query results back to storage, scale-aware.

The reference has NO sinks (SURVEY.md §2.1 — its only write is plan bytes,
serializer.rs:17-20); execution-side writes belong to the engine, so here
they are first-class. These helpers encode the decisions that matter at
100 TB and are easy to get wrong:

* **file sizing** — ``target_file_rows`` repartitions so output files are
  neither thousands of KB-sized shards (metadata pressure on the next
  reader) nor a handful of multi-GB files (no read parallelism);
* **partitioned layout** — ``partition_by`` columns become directory
  partitions, giving the next query partition PRUNING for free; choose
  low-cardinality columns (date, lang, source) or small files explode;
* **bucketed layout** — ``write_bucketed`` pre-shuffles by join key into a
  fixed bucket count so future equi-joins/aggregations on that key skip
  their shuffle entirely (the co-located-join strategy; requires a
  ``saveAsTable`` catalog table — Spark's bucketing metadata lives in the
  catalog, not the files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: tuple[str, ...] = (),
                  target_files: int | None = None) -> None:
    """Parquet sink. ``target_files`` sets the output file count via
    ``repartition`` — a real shuffle barrier, deliberately NOT ``coalesce``:
    coalesce propagates upstream and runs the ENTIRE preceding computation
    at the reduced parallelism (the classic ``coalesce(1)`` pitfall), and
    it can only shrink the count. The one extra shuffle moves exactly the
    rows being written; ``partition_by`` writes a directory-partitioned
    layout."""
    out = df.repartition(target_files) if target_files else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite",
              header: bool = True) -> None:
    """CSV sink (interchange/debug — parquet is the production format)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (interchange/debug)."""
    df.write.mode(mode).json(path)


def clear_orphaned_table_location(spark, table: str) -> None:
    """Remove a managed table's warehouse directory when the catalog has
    no entry for it — the state a FRESH session inherits when an earlier
    process wrote the table and exited (in-memory catalog gone, files
    still on disk). ``mode("overwrite").saveAsTable`` then fails with
    LOCATION_ALREADY_EXISTS instead of overwriting; a REGISTERED table is
    left alone (overwrite handles it correctly)."""
    import os
    import shutil
    from urllib.parse import urlparse

    if "." in table:
        # db-qualified names live under <warehouse>/<db>.db/… — the
        # default-db path below would be the WRONG directory, and worse,
        # tableExists('db.t') guarding a delete of <warehouse>/t could
        # remove a directory this library never wrote. Self-heal covers
        # default-database single-part names only.
        return
    if spark.catalog.tableExists(table):
        return
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if not warehouse:
        return
    # default-database managed layout: <warehouse>/<lowercased table name>
    loc = os.path.join(warehouse, table.lower())
    if not os.path.isdir(loc):
        return
    # only remove a directory that looks Spark-written (parquet part files
    # / _SUCCESS marker, or empty) — never a same-named dir of unknown origin
    entries = os.listdir(loc)
    spark_written = all(
        e == "_SUCCESS" or e.startswith("part-") or e.startswith(".")
        or e == "_spark_metadata"
        for e in entries)
    if spark_written:
        shutil.rmtree(loc)


def write_table(df: DataFrame, table: str, mode: str = "overwrite") -> None:
    """Plain (unbucketed) managed parquet table, with the same
    orphaned-location self-heal as :func:`write_bucketed`."""
    if mode == "overwrite":
        clear_orphaned_table_location(df.sparkSession, table)
    df.write.mode(mode).format("parquet").saveAsTable(table)


def write_bucketed(df: DataFrame, table: str,
                   bucket_col: str | tuple[str, ...] | list[str],
                   n_buckets: int = 64, mode: str = "overwrite") -> None:
    """Bucketed catalog table: pre-shuffles on ``bucket_col`` (one column
    or a composite key) into ``n_buckets`` buckets so later equi-joins/
    groupBys on exactly that key need no shuffle (Spark reads the
    bucketing spec from the catalog and plans a shuffle-free sort-merge
    join). Size ``n_buckets`` so one bucket of the LARGEST future join
    input fits an executor core's memory."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    if mode == "overwrite":
        clear_orphaned_table_location(df.sparkSession, table)
    (df.write.mode(mode)
     .bucketBy(n_buckets, cols[0], *cols[1:])
     .sortBy(cols[0], *cols[1:])
     .format("parquet")
     .saveAsTable(table))
