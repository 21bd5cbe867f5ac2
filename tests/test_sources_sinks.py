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


def test_register_binary_dir_feeds_multimodal_pipeline(spark, tmp_path):
    """File-system ingestion → perceptual near-dup, end to end: PNG
    FILES on disk register through the binaryFile source and the planted
    noised copy pairs with its original; the glob filter excludes
    non-matching files; keys are stable across re-registration."""
    import numpy as np

    from datafusion_substrait_spark.operators import multimodal
    from tests.test_operators import _encode_png

    rng = np.random.default_rng(41)
    base = rng.integers(0, 256, (32, 32), np.uint8)
    noised = np.clip(base.astype(int) + rng.integers(-2, 3, base.shape),
                     0, 255).astype(np.uint8)
    other = 255 - base
    scan = (list(range(5)) * 7)[:32]
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "a.png").write_bytes(bytes(_encode_png(base.tolist(), 0, scan)))
    (d / "b.png").write_bytes(bytes(_encode_png(noised.tolist(), 0, scan)))
    (d / "c.png").write_bytes(bytes(_encode_png(other.tolist(), 0, scan)))
    (d / "notes.txt").write_bytes(b"not an image")

    df = catalog.register_binary_dir(spark, "crawl_imgs", str(d),
                                     glob="*.png")
    rows = {os.path.basename(r.path): r for r in df.collect()}
    assert set(rows) == {"a.png", "b.png", "c.png"}
    assert all(r.length == len(bytes(r.payload)) for r in rows.values())
    # view registered + keys stable across re-registration
    assert spark.table("crawl_imgs").count() == 3
    again = catalog.register_binary_dir(spark, "crawl_imgs", str(d),
                                        glob="*.png")
    assert ({r.key for r in df.select("key").collect()}
            == {r.key for r in again.select("key").collect()})

    pairs = multimodal.image_neardup_pairs(df, max_hamming=6)
    got = {(rows_by_key[r.key_a], rows_by_key[r.key_b])
           for rows_by_key in [
               {r.key: os.path.basename(r.path) for r in df.collect()}]
           for r in pairs.collect()}
    assert got == {tuple(sorted(("a.png", "b.png")))} or \
        got == {("a.png", "b.png")} or got == {("b.png", "a.png")}


def test_write_training_shards_preserves_pack_order(spark, tmp_path):
    """The shard sink's row order inside each shard directory equals
    pack_sequences' concatenation order (the dataloader contract), the
    directory layout is shard=N, and every doc appears exactly once."""
    from datafusion_substrait_spark.operators import packing

    rows = [(i, f"tok {'x ' * (i % 7 + 1)}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    path = str(tmp_path / "shards")
    packing.write_training_shards(df, path, max_tokens=16, n_shards=4)
    assert sorted(p for p in os.listdir(path) if p.startswith("shard=")) \
        == [f"shard={i}" for i in range(4)]

    packed = packing.pack_sequences(df, 16, n_shards=4)
    for shard in range(4):
        want = [r.doc_id for r in packed.filter(F.col("shard") == shard)
                .orderBy("bin_id", "bin_offset", "doc_id").collect()]
        got = [r.doc_id for r in
               spark.read.parquet(f"{path}/shard={shard}").collect()]
        assert got == want and got
    total = spark.read.parquet(path).count()
    assert total == 40


def test_write_training_shards_order_col_zero_token_ties(spark, tmp_path):
    """With order_col, zero-token documents share a bin_offset with their
    successor — the file sort must tie-break by the pack order (_ord, key),
    not by key, or their relative order deviates from pack order."""
    from datafusion_substrait_spark.operators import packing

    # one shard; _ord reverses key order, keys 1 and 2 are zero-token and
    # share bin_offset 2 — key-sorted output would emit 3,1,2 while pack
    # order is 3,2,1
    df = spark.createDataFrame(
        [(1, "", 3), (2, "", 2), (3, "a b", 1)],
        "doc_id bigint, text string, ord bigint")
    path = str(tmp_path / "shards_ord")
    packing.write_training_shards(df, path, max_tokens=16, n_shards=1,
                                  order_col="ord")
    got = [r.doc_id for r in spark.read.parquet(f"{path}/shard=0").collect()]
    assert got == [3, 2, 1]


def test_write_training_shards_readback_row_index_is_pack_position(
        spark, tmp_path):
    """The t13 shards-leg contract (r14): each shard=N directory holds
    exactly ONE parquet file (repartition("shard") gives every shard one
    writer task), so the parquet ``_metadata.row_index`` read back IS the
    document's position in pack_sequences' concatenation order — the
    property that lets the driver oracle replay physical file order as a
    closed-form within-shard rank."""
    from pyspark.sql import Window

    from datafusion_substrait_spark.operators import packing

    rows = [(i, f"w {'t ' * (i % 9)}", (i * 37) % 40) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, ord int")
    path = str(tmp_path / "shards_ri")
    packing.write_training_shards(df, path, max_tokens=16, n_shards=4,
                                  order_col="ord")
    for d in sorted(os.listdir(path)):
        if d.startswith("shard="):
            files = [f for f in os.listdir(os.path.join(path, d))
                     if f.endswith(".parquet")]
            assert len(files) == 1, f"{d} has {len(files)} files"
    rb = spark.read.parquet(path).select(
        "doc_id", F.col("shard").cast("int").alias("shard"),
        F.col("_metadata.row_index").alias("pos"))
    packed = packing.pack_sequences(df, 16, n_shards=4, order_col="ord")
    w = Window.partitionBy("shard").orderBy("_ord", "doc_id")
    want = (df.select("doc_id", F.col("ord").alias("_ord"))
            .join(packed.select("doc_id", "shard"), "doc_id")
            .select("doc_id", "shard",
                    (F.row_number().over(w) - 1).cast("bigint").alias("pos")))
    assert rows_set(rb) == rows_set(want)


def test_write_training_shards_multifile_order_restorable(spark, tmp_path):
    """bins_per_file sub-splits each shard into contiguous-bin
    file_seq=K directories written by PARALLEL tasks (the 100 TB write
    path): concatenating a shard's files in numeric file_seq order must
    reproduce the single-file row order exactly, each (shard, file_seq)
    dir holds one file, and the dataloader seek arithmetic
    (bin_id*max_tokens + bin_offset == running token cumsum) holds
    across file boundaries."""
    from pyspark.sql import Window

    from datafusion_substrait_spark.operators import packing

    rows = [(i, f"w {'t ' * (i % 9)}") for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    path = str(tmp_path / "shards_mf")
    packing.write_training_shards(df, path, max_tokens=16, n_shards=3,
                                  bins_per_file=4)
    rb = spark.read.parquet(path).select(
        "doc_id", F.col("shard").cast("int").alias("shard"),
        F.col("file_seq").cast("long").alias("file_seq"),
        "n_tokens", "bin_id", "bin_offset",
        F.col("_metadata.row_index").alias("pos"),
        F.col("_metadata.file_path").alias("fp")).collect()
    assert len(rb) == 120
    # r15 (ADVICE r14): the file_seq partition VALUE is zero-padded so a
    # non-Spark loader sorting directory names LEXICOGRAPHICALLY gets
    # the numeric order (file_seq=10 used to interleave before =2)
    import os as _os
    seq_vals = [d.split("=", 1)[1]
                for d in _os.listdir(_os.path.join(path, "shard=0"))
                if d.startswith("file_seq=")]
    assert seq_vals and all(len(v) == 9 and v.isdigit() for v in seq_vals)
    assert sorted(seq_vals) == sorted(seq_vals, key=int)
    by_sf: dict = {}
    for r in rb:
        assert r.file_seq == r.bin_id // 4
        by_sf.setdefault((r.shard, r.file_seq), []).append(r)
    assert len({sf[1] for sf in by_sf}) > 1  # genuinely multi-file
    for sf, rs in by_sf.items():
        assert len({r.fp for r in rs}) == 1, f"{sf} split across files"

    packed = packing.pack_sequences(df, 16, n_shards=3)
    w = Window.partitionBy("shard").orderBy("doc_id")
    want = {r.doc_id: r.rank for r in packed.select(
        "doc_id", (F.row_number().over(w) - 1).alias("rank")).collect()}
    shards: dict = {}
    for r in rb:
        shards.setdefault(r.shard, []).append(r)
    for shard, rs in shards.items():
        rs.sort(key=lambda r: (r.file_seq, r.pos))
        cum = 0
        for i, r in enumerate(rs):
            assert want[r.doc_id] == i, \
                f"shard {shard}: concatenated order diverged at {i}"
            assert r.bin_id * 16 + r.bin_offset == cum, \
                f"shard {shard} pos {i}: seek arithmetic diverged"
            cum += r.n_tokens


def test_read_training_shards_restores_concat_order_both_layouts(
        spark, tmp_path):
    """r15 (ADVICE r14 follow-through): the loader helper must return
    pos == pack_sequences' within-shard rank for BOTH layouts — the
    one-file-per-shard default and the bins_per_file multi-file split —
    so a Spark consumer never hand-lists file_seq directories."""
    from pyspark.sql import Window

    from datafusion_substrait_spark.operators import packing

    rows = [(i, f"w {'t ' * (i % 9)}") for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    packed = packing.pack_sequences(df, 16, n_shards=3)
    w = Window.partitionBy("shard").orderBy("doc_id")
    want = {r.doc_id: r.rank for r in packed.select(
        "doc_id", (F.row_number().over(w) - 1).alias("rank")).collect()}

    for layout, kwargs in (("single", {}), ("multi", {"bins_per_file": 4})):
        path = str(tmp_path / f"rb_{layout}")
        packing.write_training_shards(df, path, max_tokens=16, n_shards=3,
                                      **kwargs)
        got = {r.doc_id: r.pos for r in
               packing.read_training_shards(spark, path).collect()}
        assert got == want, f"{layout} layout diverged"


def test_read_training_shards_survives_max_records_per_file(
        spark, tmp_path):
    """r16 (ADVICE r15): with ``spark.sql.files.maxRecordsPerFile`` set —
    common in production — one writer task's output splits into several
    part files per (shard[, file_seq]) dir and ``row_index`` RESTARTS in
    each, so a loader ordering on row_index alone silently permutes pos.
    read_training_shards now tie-breaks on ``_metadata.file_name`` (the
    split files share the task's part-NNNNN-<uuid> prefix and differ
    only in the monotonic -cNNN split counter, so name order == write
    order); this pins pos == pack rank for BOTH layouts under a forced
    split, and asserts the split genuinely happened."""
    from pyspark.sql import Window

    from datafusion_substrait_spark.operators import packing

    rows = [(i, f"w {'t ' * (i % 9)}") for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    packed = packing.pack_sequences(df, 16, n_shards=3)
    w = Window.partitionBy("shard").orderBy("doc_id")
    want = {r.doc_id: r.rank for r in packed.select(
        "doc_id", (F.row_number().over(w) - 1).alias("rank")).collect()}

    old = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "7")
    try:
        for layout, kwargs in (("single", {}),
                               ("multi", {"bins_per_file": 8})):
            path = str(tmp_path / f"split_{layout}")
            packing.write_training_shards(df, path, max_tokens=16,
                                          n_shards=3, **kwargs)
            fps = spark.read.parquet(path).select(
                F.col("shard").cast("int").alias("shard"),
                *([F.col("file_seq").cast("long").alias("fsq")]
                  if layout == "multi" else []),
                F.col("_metadata.file_name").alias("fn")).collect()
            per_dir: dict = {}
            for r in fps:
                key = (r.shard, r.fsq) if layout == "multi" else r.shard
                per_dir.setdefault(key, set()).add(r.fn)
            assert any(len(s) > 1 for s in per_dir.values()), \
                f"{layout}: maxRecordsPerFile did not split — test inert"
            got = {r.doc_id: r.pos for r in
                   packing.read_training_shards(spark, path).collect()}
            assert got == want, f"{layout} layout diverged under file split"
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", old)


def test_read_training_shards_numeric_split_counter_past_999(
        spark, tmp_path):
    """r16 review catch: Spark's split counter is %03d-formatted, so
    past 999 split files ``c1000`` sorts LEXICOGRAPHICALLY before
    ``c999`` — a name sort silently permutes pos exactly in the regime
    the maxRecordsPerFile fix targets (a 10M-row shard at
    maxRecordsPerFile=10000). The loader parses the counter numerically
    ([.-]c(\\d+). — the separator is a DOT in Spark 4's names); this
    pins pos across the c999/c1000 boundary with 1050 one-row files."""
    from datafusion_substrait_spark.operators import packing

    df = spark.createDataFrame(
        [(i, f"w {'t ' * (i % 5)}") for i in range(1050)],
        "doc_id bigint, text string")
    old = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
    try:
        path = str(tmp_path / "boundary")
        packing.write_training_shards(df, path, max_tokens=16, n_shards=1)
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", old)
    got = [r.doc_id for r in packing.read_training_shards(spark, path)
           .orderBy("pos").collect()]
    assert got == list(range(1050)), "pos permuted across c999/c1000"


def test_read_training_shards_rejects_multi_task_dirs(spark, tmp_path):
    """r17 (VERDICT r16 #2): pos restoration orders split files by the
    -cNNN counter WITHIN one writer task's output; a directory written
    by TWO tasks (foreign writer, hand-merged outputs) has no defined
    order (part numbers follow task ids, not pack order), so the loader
    must refuse it loudly instead of silently permuting pos. A plain
    partitioned write with >1 upstream partition produces exactly such
    a layout — multiple part-NNNNN prefixes in one shard dir."""
    import pytest as _pytest

    from datafusion_substrait_spark.operators import packing

    df = spark.createDataFrame(
        [(i, "w " * (i % 4 + 1), 0) for i in range(40)],
        "doc_id bigint, text string, shard int").repartition(4)
    path = str(tmp_path / "twotask")
    df.write.partitionBy("shard").parquet(path)
    fns = {r.fn for r in spark.read.parquet(path).select(
        F.col("_metadata.file_name").alias("fn")).collect()}
    assert len({fn.split("-")[1] for fn in fns}) > 1, \
        "fixture inert: expected multiple writer-task prefixes"
    with _pytest.raises(packing.MultiWriterShardLayoutError,
                        match="multiple writer tasks"):
        packing.read_training_shards(spark, path)
    # the escape hatch stays available for trusted/foreign dirs
    out = packing.read_training_shards(spark, path, verify_layout=False)
    assert out.count() == 40


def test_read_training_shards_split_counter_anchored_to_tail(
        spark, tmp_path):
    """r17 (ADVICE r16): the -cNNN parse must match only Spark's
    TRAILING split counter. Unanchored, a foreign file named
    'batch-c2.part-x.parquet' took split-counter 2 and jumped AFTER a
    counter-less 'zzz.parquet' — silently reordering pos relative to
    the documented name-order fallback for foreign layouts. Renames a
    real two-file shard to exactly that adversarial pair and pins pos
    == name order (batch… before zzz, i.e. the files SWAP)."""
    import os as _os

    from datafusion_substrait_spark.operators import packing

    df = spark.createDataFrame(
        [(i, "w") for i in range(10)], "doc_id bigint, text string")
    old = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "5")
    try:
        path = str(tmp_path / "foreign")
        packing.write_training_shards(df, path, max_tokens=16, n_shards=1)
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", old)
    shard_dir = _os.path.join(path, "shard=0")
    parts = sorted(f for f in _os.listdir(shard_dir)
                   if f.endswith(".parquet"))
    assert len(parts) == 2, f"fixture inert: {parts}"
    # first split file (doc_ids 0-4) → lexicographically LAST name;
    # second (doc_ids 5-9) → the embedded-c2 trap name, sorting first
    _os.rename(_os.path.join(shard_dir, parts[0]),
               _os.path.join(shard_dir, "zzz.parquet"))
    _os.rename(_os.path.join(shard_dir, parts[1]),
               _os.path.join(shard_dir, "batch-c2.part-x.parquet"))
    got = [r.doc_id for r in packing.read_training_shards(spark, path)
           .orderBy("pos").collect()]
    assert got == [5, 6, 7, 8, 9, 0, 1, 2, 3, 4], (
        "foreign counter-less files must order by NAME alone; an "
        f"embedded -c2 token changed the order: {got}")


def test_write_training_shards_refuses_append(spark, tmp_path):
    """r15 (same class as the store meta-append fixes): appending a
    second pack into existing shard dirs would interleave two
    independent concatenation orders — the writer must fail loud."""
    import pytest as _pytest

    from datafusion_substrait_spark.operators import packing

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    with _pytest.raises(ValueError, match="cannot append"):
        packing.write_training_shards(df, str(tmp_path / "x"),
                                      max_tokens=16, mode="append")


def test_write_training_shards_per_write_split_option(spark, tmp_path):
    """r17 opt: ``max_records_per_file`` rides the WRITER
    (``option("maxRecordsPerFile")``) instead of the session conf, so
    concurrent shard writes in one session (the t13 overlap, guide §2.6)
    cannot race on a global knob. Pins that the option (a) actually
    splits — same -cNNN machinery as the conf — (b) restores pos
    identically to the unsplit write, and (c) stays scoped to its own
    write: a sibling write in the same session must NOT split."""
    import pytest
    from pyspark.sql import Window

    from datafusion_substrait_spark.operators import packing

    rows = [(i, f"w {'t ' * (i % 9)}") for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    packed = packing.pack_sequences(df, 16, n_shards=3)
    w = Window.partitionBy("shard").orderBy("doc_id")
    want = {r.doc_id: r.rank for r in packed.select(
        "doc_id", (F.row_number().over(w) - 1).alias("rank")).collect()}

    split_path = str(tmp_path / "opt_split")
    plain_path = str(tmp_path / "opt_plain")
    packing.write_training_shards(df, split_path, max_tokens=16,
                                  n_shards=3, max_records_per_file=7)
    packing.write_training_shards(df, plain_path, max_tokens=16, n_shards=3)

    def files_per_dir(path):
        per_dir: dict = {}
        for r in spark.read.parquet(path).select(
                F.col("shard").cast("int").alias("shard"),
                F.col("_metadata.file_name").alias("fn")).collect():
            per_dir.setdefault(r.shard, set()).add(r.fn)
        return per_dir

    assert any(len(s) > 1 for s in files_per_dir(split_path).values()), \
        "writer-scoped maxRecordsPerFile did not split — option inert"
    assert all(len(s) == 1 for s in files_per_dir(plain_path).values()), \
        "sibling write split too — the option leaked out of its writer"
    got = {r.doc_id: r.pos for r in
           packing.read_training_shards(spark, split_path).collect()}
    assert got == want, "pos diverged under the writer-scoped split"
    with pytest.raises(ValueError, match="max_records_per_file"):
        packing.write_training_shards(df, str(tmp_path / "bad"),
                                      max_tokens=16, n_shards=3,
                                      max_records_per_file=0)
