"""Egress/loader round-trip property fuzz (r16, VERDICT r15 #3).

The decoder fuzz tier covers binary payload surfaces; this tier sweeps
the TRAINING-SHARDS contract the same way: each seed generates a random
corpus — zero-token docs, duplicate order keys, negative keys, skewed
token counts — and a random layout (n_shards, max_tokens, bins_per_file
∈ {None, 1, small, huge}, order_col on/off), writes it with
``write_training_shards`` and reads it back with
``read_training_shards``, then asserts against a PURE-PYTHON replay of
the pack contract (no Spark operator in the expectation):

  * ``pos``        == the doc's rank in its shard sorted by (ord, key)
                      — pack_sequences' concatenation order, exactly;
  * ``bin_id``     == floor(running-start / max_tokens) and
    ``bin_offset`` == running-start % max_tokens, where running-start is
                      the cumsum of prior docs' token counts in that
                      order (zero-token docs consume no budget but keep
                      a slot);
  * ``file_seq``   == bin_id // bins_per_file when the multi-file layout
                      is in play;
  * every doc exactly once; an EMPTY corpus writes a marker-only dir
    that the loader refuses with Spark's unreadable-schema error (the
    documented contract).

Token counts ride ``token_col`` so the replay needs no tokenizer — the
tokenizer itself is pinned by the t13 oracle leg and the text tests.

Default in-suite sweep is seeds [0, 24). Wide sweeps are REPRODUCIBLE
via SPARK_GRAFT_SHARDS_FUZZ_SEEDS=a:b (half-open [a, b)) — the r16
200-seed record:
    SPARK_GRAFT_SHARDS_FUZZ_SEEDS=0:200 python3 -m pytest \
        tests/test_shards_roundtrip_fuzz.py -q
(command also recorded in COVERAGE.md next to the sweep's result).
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.errors import AnalysisException

from datafusion_substrait_spark.operators import packing

_SEED_RANGE = os.environ.get("SPARK_GRAFT_SHARDS_FUZZ_SEEDS")
if _SEED_RANGE:
    _LO, _HI = (int(x) for x in _SEED_RANGE.split(":"))
else:
    _LO, _HI = 0, 24
_BATCH = 4


def _gen_case(seed: int):
    r = random.Random(seed)
    n_docs = r.choice([0, 1, 2, 5, 13, 29, 47])
    max_tokens = r.choice([5, 16, 64])
    n_shards = r.choice([1, 3, 8])
    bpf = r.choice([None, 1, 3, 10**6])
    use_order = r.random() < 0.6
    # unique keys, shuffled, possibly negative (pmod vs Python % parity)
    keys = r.sample(range(-20, 400), n_docs)
    docs = []
    for k in keys:
        if r.random() < 0.2:
            n_tok = 0                      # zero-token: slot, no budget
        elif r.random() < 0.1:
            n_tok = r.randint(3, 7) * max_tokens   # straddles many bins
        else:
            n_tok = r.randint(1, max_tokens + 3)
        # duplicate order keys on purpose: ties break by key
        ordv = r.randint(0, 5) if use_order else 0
        docs.append((k, "t", n_tok, ordv))
    return docs, max_tokens, n_shards, bpf, use_order


def _replay(docs, max_tokens, n_shards, bpf, use_order):
    """Pure-Python pack contract: per-shard (ord, key)-sorted cumsum."""
    want = {}
    by_shard: dict[int, list] = {}
    for k, _t, n_tok, ordv in docs:
        by_shard.setdefault(k % n_shards, []).append((k, n_tok, ordv))
    for shard, rows in by_shard.items():
        rows.sort(key=lambda x: (x[2], x[0]) if use_order
                  else (x[0],))
        start = 0
        for pos, (k, n_tok, _o) in enumerate(rows):
            bin_id = start // max_tokens
            rec = {"shard": shard, "pos": pos, "bin_id": bin_id,
                   "bin_offset": start % max_tokens}
            if bpf is not None:
                rec["file_seq"] = bin_id // bpf
            want[k] = rec
            start += n_tok
    return want


@pytest.mark.parametrize("start", range(_LO, _HI, _BATCH))
def test_shards_write_read_roundtrip_matches_pure_python(spark, tmp_path,
                                                         start):
    for seed in range(start, min(start + _BATCH, _HI)):
        docs, max_tokens, n_shards, bpf, use_order = _gen_case(seed)
        df = spark.createDataFrame(
            docs, "doc_id bigint, text string, n_tok bigint, ord bigint")
        path = str(tmp_path / f"rt_{seed}")
        packing.write_training_shards(
            df, path, max_tokens=max_tokens, n_shards=n_shards,
            token_col="n_tok", order_col="ord" if use_order else None,
            bins_per_file=bpf)
        if not docs:
            # documented contract: empty corpus writes only the marker;
            # the loader raises the unreadable-schema error
            assert os.path.exists(os.path.join(path, "_SUCCESS")), \
                f"seed {seed}: empty write lost its marker"
            with pytest.raises(AnalysisException):
                packing.read_training_shards(spark, path).collect()
            continue
        got_rows = packing.read_training_shards(spark, path).collect()
        want = _replay(docs, max_tokens, n_shards, bpf, use_order)
        assert len(got_rows) == len(want), f"seed {seed}: row count"
        seen = set()
        for row in got_rows:
            k = row.doc_id
            assert k not in seen, f"seed {seed}: doc {k} duplicated"
            seen.add(k)
            w = want[k]
            got = {"shard": row.shard, "pos": row.pos,
                   "bin_id": row.bin_id, "bin_offset": row.bin_offset}
            if bpf is not None:
                got["file_seq"] = row.file_seq
            assert got == w, (
                f"seed {seed} doc {k}: {got} != {w} "
                f"(max_tokens={max_tokens} n_shards={n_shards} "
                f"bpf={bpf} order={use_order})")
