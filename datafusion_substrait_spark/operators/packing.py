"""Sequence packing: assign documents to fixed-token-budget training
bins — the concat-then-chunk step between a cleaned corpus and a
training dataloader. Beyond-reference surface (the reference is a plan
interchange library), same family as sampling.py.

The classic pipeline concatenates documents in a deterministic order and
cuts the stream every ``max_tokens``; a document's bin is decided by its
START offset in the stream (documents may straddle a cut — the trainer
handles the tail, the pipeline's job is a deterministic, balanced,
replayable assignment).

Scale shape: documents hash into ``n_shards`` independent streams
(embarrassingly parallel — one window partition per shard, each a
single task, so n_shards should comfortably exceed cluster cores; the
same reasoning as asof_join's salting note), and within a shard the
running token offset is one window cumsum ordered by the document key.
One shuffle total. Every step is engine-portable: shard = key mod
n_shards, order = the key itself — a DuckDB oracle replays the exact
assignment (pinned in tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def pack_sequences(df: DataFrame, max_tokens: int, n_shards: int = 64,
                   text_col: str = "text", key_col: str = "doc_id",
                   token_col: str | None = None) -> DataFrame:
    """(key, n_tokens, shard, bin_id, bin_offset): the deterministic
    packed-training-file assignment for every document.

    ``bin_id`` is the fixed-budget chunk (within the shard) holding the
    document's first token; ``bin_offset`` is the document's start
    position inside that bin. Pass ``token_col`` to pack by a
    pre-computed count (e.g. a real tokenizer's); default is the
    whitespace ``token_count``. Zero-token documents still get a slot
    (offset-only, they consume no budget).
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    toks = (F.col(token_col) if token_col
            else token_count(F.col(text_col))).cast("bigint")
    keyed = df.select(
        F.col(key_col),
        toks.alias("n_tokens"),
        F.pmod(F.col(key_col), F.lit(n_shards)).cast("int").alias("shard"),
    )
    w = (Window.partitionBy("shard").orderBy(key_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return keyed.select(
        key_col, "n_tokens", "shard",
        F.floor(start / max_tokens).cast("bigint").alias("bin_id"),
        F.pmod(start, F.lit(max_tokens)).cast("bigint").alias("bin_offset"),
    )


def bin_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """Per-(shard, bin) fill statistics over :func:`pack_sequences`
    output: docs per bin and the budget consumed by documents STARTING in
    the bin (straddling documents spill into the next bin by
    construction, so fill can exceed ``max_tokens`` for the last-starting
    doc — exactly the quantity a dataloader needs to plan splits)."""
    return (packed.groupBy("shard", "bin_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("tokens_started"),
                 F.min("bin_offset").alias("first_offset"))
            .withColumn("budget", F.lit(int(max_tokens))))
