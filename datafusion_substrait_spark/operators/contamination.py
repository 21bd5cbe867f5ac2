"""Benchmark decontamination: word-n-gram overlap between a training corpus
and a benchmark/eval set.

Beyond-reference surface (the reference engine, like most query engines,
ships no decontamination operator) — but it is a first-class need for any
LLM training-data pipeline: documents that share long n-grams with an
evaluation benchmark leak test data into training.

Scale shape (the asymmetry IS the design): the corpus is the 100 TB side,
the benchmark is KBs-to-MBs. Both sides explode to distinct word n-grams
row-locally (``array_distinct`` before ``explode`` — no corpus-side
shuffle), then the benchmark grams are **broadcast** so the match is a
map-side hash probe over the corpus scan: zero shuffle of corpus text, and
the only shuffled rows are the (rare) matches, keyed on (doc, bench) for
the overlap count with map-side combine. Joining on the gram string keeps
the operator oracle-replayable; at extreme benchmark sizes swap the join
key for ``xxhash64(gram)`` to shrink the broadcast (documented, not
default, because collisions would make matches approximate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import word_ngrams


def _grams(df: DataFrame, text_col: str, key_col: str, n: int,
           out_key: str) -> DataFrame:
    # the empty gram is excluded: word_ngrams' short-document fallback
    # joins ALL tokens, so every zero-token text (empty, punctuation-only,
    # non-ASCII under the [a-z0-9] tokenizer) yields "" — without the
    # filter, one token-less benchmark row marks every token-less corpus
    # document contaminated. (Short NON-empty texts still match exactly,
    # which is genuine contamination.)
    return df.select(
        F.col(key_col).alias(out_key),
        F.explode(
            F.array_remove(F.array_distinct(word_ngrams(F.col(text_col), n)), "")
        ).alias("_g"),
    )


def ngram_overlap(docs: DataFrame, bench: DataFrame, n: int = 5,
                  text_col: str = "text", key_col: str = "doc_id",
                  bench_text_col: str = "text", bench_key_col: str = "bench_id",
                  min_overlap: int = 1) -> DataFrame:
    """(doc_id, bench_id, overlap): count of distinct shared word n-grams.

    ``overlap`` counts distinct n-grams the pair shares (each side is
    deduped first), so a gram repeated inside one document still counts
    once — the standard contamination measure.

    Recall caveat (inherent to n-gram matching): a benchmark row with
    FEWER than ``n`` tokens reduces to its single whole-text gram, which
    can only match corpus documents of the same sub-``n`` length — a long
    document containing that short question verbatim is NOT flagged. If
    the benchmark has many sub-``n``-token rows, lower ``n`` (or run a
    second pass at a smaller ``n``) rather than assume they are covered.
    """
    if key_col == bench_key_col:
        raise ValueError(
            f"key_col and bench_key_col are both {key_col!r}: the joined "
            "output needs distinct names (pass bench_key_col=...)"
        )
    d = _grams(docs, text_col, key_col, n, key_col)
    b = _grams(bench, bench_text_col, bench_key_col, n, bench_key_col)
    return (
        d.join(F.broadcast(b), "_g")
        .groupBy(key_col, bench_key_col)
        .agg(F.count(F.lit(1)).alias("overlap"))
        .filter(F.col("overlap") >= min_overlap)
    )


def decontaminate(docs: DataFrame, bench: DataFrame, n: int = 5,
                  text_col: str = "text", key_col: str = "doc_id",
                  bench_text_col: str = "text", bench_key_col: str = "bench_id",
                  min_overlap: int = 1) -> DataFrame:
    """Documents with no benchmark n-gram overlap ≥ ``min_overlap``.

    The contaminated-id set is small (it is bounded by the benchmark's
    reach), so the final ``left_anti`` join broadcasts it back over the
    corpus: the full pass over 100 TB is two broadcast probes and one
    tiny match-side shuffle.
    """
    hits = (
        ngram_overlap(docs, bench, n, text_col, key_col,
                      bench_text_col, bench_key_col, min_overlap)
        .select(key_col).distinct()
    )
    return docs.join(F.broadcast(hits), key_col, "left_anti")
