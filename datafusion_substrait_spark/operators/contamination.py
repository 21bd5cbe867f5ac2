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


def build_ngram_bloom(bench: DataFrame, n: int = 5, n_bits: int = 1 << 23,
                      n_hashes: int = 5, text_col: str = "text",
                      bench_key_col: str = "bench_id"):
    """Distributed Bloom-filter build over the benchmark's distinct word
    n-grams. Returns a numpy ``uint64`` array of ``n_bits/64`` words.

    The build never collects grams: positions aggregate to at most
    ``n_bits/64`` (word_index, OR-of-bits) rows via a map-side-combined
    ``bit_or`` — the driver transfer is bounded by the FILTER size (1 MiB
    at the default 8M bits), not by benchmark size. Membership hashes are
    ``xxhash64(gram, seed_i)``, k independent positions per gram."""
    import numpy as np

    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    grams = _grams(bench, text_col, bench_key_col, n, bench_key_col)
    pos = grams.select(F.explode(F.array(*[
        F.pmod(F.xxhash64(F.col("_g"), F.lit(i)), F.lit(n_bits)).alias(f"p{i}")
        for i in range(n_hashes)
    ])).alias("pos"))
    # no distinct() first: bit_or is idempotent, and deduping would add a
    # second benchmark-gram-sized shuffle before the (map-side-combined,
    # n_bits/64-bounded) aggregation for zero semantic gain
    words = pos.groupBy(
        F.shiftright(F.col("pos"), 6).alias("w")
    ).agg(F.expr("bit_or(shiftleft(1L, CAST(pmod(pos, 64) AS INT)))")
          .alias("bits"))
    arr = np.zeros(n_bits // 64, dtype=np.uint64)
    for r in words.collect():
        arr[int(r["w"])] = np.uint64(r["bits"] & 0xFFFFFFFFFFFFFFFF)
    return arr


def _bloom_hit_jvm(words_col, gram_col, n_bits: int, n_hashes: int):
    """Codegen bit-probe: AND over the k hash positions, each tested via
    ``element_at`` on an array<bigint> column carrying the bitset — no
    Python anywhere. The bitset column comes from a ONE-row broadcast
    cross-join (a plan-tree literal would need n_bits/64 Literal nodes —
    F.lit(list) expands element-wise and OOMs the driver at 128Ki words,
    observed this round; as row data it is one UnsafeArrayData the
    codegen probe indexes in place). Variable-amount shiftright goes
    through call_function (the F.shiftright wrapper only takes a literal
    shift); arithmetic shift of the int64 view sign-extends, so
    ``(word >> b) & 1`` still reads the original bit."""
    hits = []
    for i in range(n_hashes):
        pos = F.pmod(F.xxhash64(gram_col, F.lit(i)), F.lit(n_bits))
        word = F.element_at(words_col,
                            (F.shiftright(pos, 6) + 1).cast("int"))
        bit = F.call_function("shiftright", word,
                              F.pmod(pos, F.lit(64)).cast("int"))
        hits.append(bit.bitwiseAND(F.lit(1)) != 0)
    out = hits[0]
    for h in hits[1:]:
        out = out & h
    return out


def bloom_decontaminate(docs: DataFrame, bench: DataFrame, n: int = 5,
                        n_bits: int = 1 << 23, n_hashes: int = 5,
                        verify: bool = True,
                        text_col: str = "text", key_col: str = "doc_id",
                        bench_text_col: str = "text",
                        bench_key_col: str = "bench_id",
                        probe: str = "pandas") -> DataFrame:
    """``decontaminate`` for benchmark sets too large to broadcast as
    gram strings: the benchmark compresses to a fixed-size Bloom filter
    (default 8M bits = 1 MiB regardless of benchmark size), and the
    corpus probe becomes a NARROW filter — k ``xxhash64`` positions per
    gram bit-tested against the bitset. No corpus text ever shuffles;
    nothing scales with benchmark size except the (driver-bounded)
    filter build.

    ``probe`` selects the bit-test implementation (identical hit sets —
    equality-tested; A/B-measured at sf0.1 local[32] this round):
    * ``"pandas"`` (default) — vectorized Arrow-batched pandas UDF
      against a numpy broadcast variable. Measured consistently ~10%
      faster end-to-end locally (4.3-4.5s vs 5.0-5.2s; isolated probe
      3.65s vs 4.0s over 3 runs) — numpy's batch bit-test is cheap and
      gram generation dominates either way.
    * ``"jvm"`` — the bitset attaches as a ONE-row broadcast cross-join
      (array<bigint> column) and each probe is ``element_at`` + shift +
      mask inside whole-stage codegen: ZERO Python in the hot path.
      Prefer on clusters where Python worker processes are unwanted
      (memory, cold-start) or the Arrow transfer of per-gram hash
      columns to Python is the bottleneck — neither shows up in the
      local measurement.

    ``verify=True`` (default): bloom false positives are removed by an
    exact gram join over ONLY the surviving sliver (AQE picks the
    strategy; the sliver is FP-rate-bounded, ~(1-e^{-kg/m})^k of corpus
    grams, ≈2% at the defaults with 1M benchmark grams) — output is
    EXACTLY ``decontaminate``'s. ``verify=False`` skips the join: any
    bloom hit flags the document. False positives then delete extra
    documents — the conservative direction for decontamination — and
    false negatives remain impossible (every true benchmark gram is in
    the filter by construction)."""
    import numpy as np

    if key_col == bench_key_col:
        # same guard as ngram_overlap: the verify join would otherwise
        # die with an opaque AMBIGUOUS_REFERENCE from the engine
        raise ValueError(
            f"key_col and bench_key_col are both {key_col!r}: the verify "
            "join needs distinct names (pass bench_key_col=...)"
        )
    if probe not in ("jvm", "pandas"):
        raise ValueError(f"probe must be 'jvm' or 'pandas', got {probe!r}")
    filt = build_ngram_bloom(bench, n, n_bits, n_hashes,
                             bench_text_col, bench_key_col)
    d = _grams(docs, text_col, key_col, n, key_col)
    if probe == "jvm":
        words_df = docs.sparkSession.createDataFrame(
            [(filt.astype(np.int64).tolist(),)],
            "__bloom_words array<bigint>")
        candidates = (
            d.crossJoin(F.broadcast(words_df))  # 1-row broadcast attach
            .filter(_bloom_hit_jvm(F.col("__bloom_words"), F.col("_g"),
                                   n_bits, n_hashes))
            .drop("__bloom_words"))
    else:
        sc = docs.sparkSession.sparkContext
        bc = sc.broadcast(filt)

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("boolean")
        def _in_bloom(*hs):
            import pandas as pd

            bits = bc.value
            res = np.ones(len(hs[0]), dtype=bool)
            for h in hs:
                idx = h.to_numpy().astype(np.int64)
                word = bits[idx >> 6]
                res &= ((word >> (idx & 63).astype(np.uint64))
                        & np.uint64(1)).astype(bool)
            return pd.Series(res)

        hcols = [F.pmod(F.xxhash64(F.col("_g"), F.lit(i)), F.lit(n_bits))
                 for i in range(n_hashes)]
        candidates = d.filter(_in_bloom(*hcols))
    if verify:
        b = _grams(bench, bench_text_col, bench_key_col, n, bench_key_col)
        hits = (candidates.join(b, "_g")  # un-hinted: AQE sizes the sliver
                .select(key_col).distinct())
    else:
        hits = candidates.select(key_col).distinct()
    return docs.join(F.broadcast(hits), key_col, "left_anti")


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


def bloom_contamination_flag(docs: DataFrame, bench: DataFrame, n: int = 5,
                             n_bits: int = 1 << 23, n_hashes: int = 5,
                             text_col: str = "text",
                             key_col: str = "doc_id",
                             bench_text_col: str = "text",
                             bench_key_col: str = "bench_id") -> DataFrame:
    """Per-document contamination flag with ZERO joins on the corpus
    side — the STREAMING-safe shape of ``bloom_decontaminate``
    (``verify=False`` semantics: no false negatives; bloom false
    positives over-flag, the conservative direction).

    Instead of exploding grams and anti-joining hits back (stream-stream
    anti-joins are unsupported, and the join is a shuffle batch doesn't
    need either), each document keeps its distinct grams as an ARRAY and
    the bloom test runs as ``exists(grams, all-k-bits-set)`` inside
    whole-stage codegen against the 1-row broadcast-attached bitset: a
    pure narrow map, so the SAME operator runs on a batch DataFrame or a
    ``readStream`` source unchanged (stream==batch parity pinned in
    tests/test_streaming.py). Returns the input plus boolean
    ``is_contaminated``; filter on it for decontamination."""
    import numpy as np

    if key_col == bench_key_col:
        raise ValueError(
            f"key_col and bench_key_col are both {key_col!r}: pass "
            "bench_key_col=... (same guard as bloom_decontaminate)")
    filt = build_ngram_bloom(bench, n, n_bits, n_hashes,
                             bench_text_col, bench_key_col)
    words_df = docs.sparkSession.createDataFrame(
        [(filt.astype(np.int64).tolist(),)], "__bloom_words array<bigint>")
    grams = F.array_remove(
        F.array_distinct(word_ngrams(F.col(text_col), n)), "")
    hit = F.exists(grams, lambda g: _bloom_hit_jvm(
        F.col("__bloom_words"), g, n_bits, n_hashes))
    return (docs.crossJoin(F.broadcast(words_df))
            .withColumn("is_contaminated", F.coalesce(hit, F.lit(False)))
            .drop("__bloom_words"))
