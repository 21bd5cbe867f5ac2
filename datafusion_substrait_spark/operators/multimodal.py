"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The Spark-side architecture is real and tested — schemas, Arrow-batched
``mapInPandas`` plumbing, partition-size guidance — while the actual
image/audio decoding is STUBBED (this container has no codec libraries):
``decode_fn=None`` uses a clearly-marked deterministic fake so the pipeline
shape can be exercised end-to-end; pass a real decoder (e.g. PIL/librosa
based) in production.

Scale notes baked into the design:
* payloads stay in executor-side Arrow batches — never collected;
* metadata extraction is a narrow map (no shuffle);
* ``spark.sql.files.maxPartitionBytes`` should be lowered (e.g. 32 MB) for
  tables whose rows are multi-MB blobs, so a partition holds a bounded
  number of payloads in memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("payload_sha256", T.StringType()),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_bytes", T.BinaryType()),
])


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """DETERMINISTIC FAKE decoder (no codec libs in this container): derives
    a plausible (format, width, height) from the payload hash. Replace via
    ``decode_fn`` for real decoding."""
    h = hashlib.sha256(payload).digest()
    fmt = ("jpeg", "png", "webp")[h[0] % 3]
    return fmt, 64 + h[1] * 4, 64 + h[2] * 4


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          key_col: str = "doc_id") -> DataFrame:
    """Test/demo helper: synthesize an opaque binary payload column from an
    existing string column (the test tables carry no real blobs)."""
    return df.select(
        F.col(key_col).alias("key"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def extract_image_metadata(df: DataFrame, payload_col: str = "payload",
                           key_col: str = "key",
                           decode_fn: Callable[[bytes], tuple[str, int, int]] | None = None,
                           ) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    ``mapInPandas`` (not a row UDF): each Python worker receives whole Arrow
    record batches, touches payload bytes zero-copy-ish, emits a compact
    metadata frame. This is the pattern for any per-blob feature extraction.
    """
    decode = decode_fn or _fake_decode

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf[payload_col]
            meta = [decode(bytes(p)) for p in payloads]
            yield pd.DataFrame({
                "key": pdf[key_col].astype("int64"),
                "n_bytes": payloads.map(len).astype("int64"),
                "format": [m[0] for m in meta],
                "width": [m[1] for m in meta],
                "height": [m[2] for m in meta],
                "payload_sha256": [
                    hashlib.sha256(bytes(p)).hexdigest() for p in payloads
                ],
            })

    return df.mapInPandas(extract, IMAGE_META_SCHEMA)


def sample_frames(df: DataFrame, payload_col: str = "payload", key_col: str = "key",
                  every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: split each payload into up to ``max_frames``
    fixed-stride chunks (the stand-in for video frame extraction — a real
    decoder drops in at the same seam). One input row → ≤ max_frames output
    rows; schema and batching identical to the real thing."""

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            keys, idxs, frames = [], [], []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                data = bytes(payload)
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    keys.append(int(key))
                    idxs.append(i)
                    frames.append(data[i * every_n_bytes:(i + 1) * every_n_bytes])
            yield pd.DataFrame({
                "key": pd.Series(keys, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_bytes": frames,
            })

    return df.mapInPandas(sample, FRAME_SCHEMA)
