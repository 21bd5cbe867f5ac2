"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The Spark-side architecture is real and tested — schemas, Arrow-batched
``mapInPandas`` plumbing, partition-size guidance. Metadata extraction
(format/width/height) is REAL for PNG/JPEG/GIF/BMP: dimensions live in
fixed-format container headers (PNG IHDR, JPEG SOFn, GIF screen
descriptor, BMP info header), so ``parse_image_header`` reads them with no
codec library at all. Full pixel decoding is the one stubbed seam (this
container has no codec libraries): payloads that aren't a recognized image
container fall back to a clearly-marked deterministic fake so the pipeline
shape can be exercised end-to-end on the synthetic text-derived blobs;
pass ``decode_fn`` (e.g. PIL/librosa based) to replace the whole decode.

Scale notes baked into the design:
* payloads stay in executor-side Arrow batches — never collected;
* metadata extraction is a narrow map (no shuffle);
* ``spark.sql.files.maxPartitionBytes`` should be lowered (e.g. 32 MB) for
  tables whose rows are multi-MB blobs, so a partition holds a bounded
  number of payloads in memory.
"""

from __future__ import annotations

import hashlib
import struct
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


_JPEG_SOF_MARKERS = frozenset(
    # SOFn frame headers carry the dimensions; C4/C8/CC are DHT/JPG/DAC,
    # not frame headers
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
)


def parse_image_header(data: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from container header bytes — real parsing,
    no codec library: PNG stores dimensions big-endian in the IHDR chunk,
    JPEG in the first SOFn marker segment, GIF little-endian in the logical
    screen descriptor, BMP little-endian in the DIB info header. Returns
    None for anything that is not a recognized image container."""
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" \
            and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return "png", int(w), int(h)
    if len(data) >= 4 and data[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(data):
            if data[i] != 0xFF:
                return None
            marker = data[i + 1]
            if marker == 0xFF:  # fill byte (spec-valid padding before a marker)
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:  # standalone markers
                i += 2
                continue
            if marker in _JPEG_SOF_MARKERS:
                if i + 9 > len(data):
                    return None
                h, w = struct.unpack(">HH", data[i + 5:i + 9])
                return "jpeg", int(w), int(h)
            seglen = struct.unpack(">H", data[i + 2:i + 4])[0]
            i += 2 + seglen
        return None
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        if w > 0 and h > 0:
            return "gif", int(w), int(h)
        return None
    if len(data) >= 22 and data[:2] == b"BM" and data[14] in (12, 40, 108, 124):
        # data[14] = DIB header size: guards against non-image payloads that
        # merely start with the ASCII letters "BM"
        if data[14] == 12:
            # BITMAPCOREHEADER stores 16-bit UNSIGNED width/height at
            # 18/20 — parsing them as the 32-bit fields of the later
            # headers read planes/bpp into the dimensions (garbage that
            # still passed the sanity bounds)
            w, h = struct.unpack("<HH", data[18:22])
            if w > 0 and h > 0:
                return "bmp", int(w), int(h)
            return None
        if len(data) < 26:
            return None
        w, h = struct.unpack("<ii", data[18:26])
        if 0 < w < 1 << 24 and 0 < abs(h) < 1 << 24:
            return "bmp", int(w), abs(int(h))
        return None
    return None


def _payload_bytes(p) -> bytes:
    """NULL-safe payload access: a real corpus has missing blobs, and
    bytes(None) would crash the whole Python worker stage — a null payload
    flows through as empty bytes (deterministic metadata, zero frames)."""
    return b"" if p is None else bytes(p)


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """DETERMINISTIC FAKE decoder for unrecognized payloads (no codec libs
    in this container): derives a plausible (format, width, height) from
    the payload hash. Replace the whole decode via ``decode_fn``."""
    h = hashlib.sha256(payload).digest()
    fmt = ("jpeg", "png", "webp")[h[0] % 3]
    return fmt, 64 + h[1] * 4, 64 + h[2] * 4


def _default_decode(payload: bytes) -> tuple[str, int, int]:
    """Real header parse first; deterministic fake only as fallback."""
    return parse_image_header(payload) or _fake_decode(payload)


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
    decode = decode_fn or _default_decode

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf[payload_col]
            meta = [decode(_payload_bytes(p)) for p in payloads]
            yield pd.DataFrame({
                "key": pdf[key_col].astype("int64"),
                "n_bytes": payloads.map(lambda p: len(_payload_bytes(p))).astype("int64"),
                "format": [m[0] for m in meta],
                "width": [m[1] for m in meta],
                "height": [m[2] for m in meta],
                "payload_sha256": [
                    hashlib.sha256(_payload_bytes(p)).hexdigest() for p in payloads
                ],
            })

    return df.mapInPandas(extract, IMAGE_META_SCHEMA)


def sample_frames(df: DataFrame, payload_col: str = "payload", key_col: str = "key",
                  every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing: split each payload into up to ``max_frames``
    fixed-stride chunks (the stand-in for video frame extraction — a real
    decoder drops in at the same seam). Ceil-division stride count, so the
    payload tail after the last full stride still becomes a (short) frame
    when the frame budget allows; a NULL/empty payload yields ZERO frames
    (matching _payload_bytes' contract — no phantom empty frame). One input
    row → ≤ max_frames output rows; schema and batching identical to the
    real thing."""

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            keys, idxs, frames = [], [], []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                data = _payload_bytes(payload)
                for i in range(min(max_frames, -(-len(data) // every_n_bytes))):
                    keys.append(int(key))
                    idxs.append(i)
                    frames.append(data[i * every_n_bytes:(i + 1) * every_n_bytes])
            yield pd.DataFrame({
                "key": pd.Series(keys, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_bytes": frames,
            })

    return df.mapInPandas(sample, FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("pixels", T.BinaryType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """DETERMINISTIC FAKE pixel buffer (no codec libs in this container):
    a real ``resize_fn`` (PIL/opencv) drops in at the same seam. Emits a
    width×height grayscale buffer whose bytes are a keyed sha256 stream of
    the payload — deterministic, size-exact, content-dependent."""
    out = bytearray()
    counter = 0
    while len(out) < width * height:
        out += hashlib.sha256(payload + counter.to_bytes(4, "big")).digest()
        counter += 1
    return bytes(out[: width * height])


def resize_images(df: DataFrame, width: int = 64, height: int = 64,
                  payload_col: str = "payload", key_col: str = "key",
                  resize_fn: Callable[[bytes, int, int], bytes] | None = None,
                  ) -> DataFrame:
    """Resize plumbing: one fixed-size pixel buffer per payload.

    The Spark side is the real thing — Arrow-batched ``mapInPandas``, a
    typed (key, width, height, pixels) output schema, narrow map with no
    shuffle; only the pixel transform itself is the stubbed seam
    (``_fake_resize``), exactly like ``extract_image_metadata``'s decoder.
    Output pixel buffers are width×height bytes (grayscale stand-in), so
    downstream batch sizing behaves like a real resized-image column.
    """
    resize = resize_fn or _fake_resize

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "key": pdf[key_col].astype("int64"),
                "width": pd.Series([width] * len(pdf), dtype="int32"),
                "height": pd.Series([height] * len(pdf), dtype="int32"),
                "pixels": [resize(_payload_bytes(p), width, height)
                           for p in pdf[payload_col]],
            })

    return df.mapInPandas(run, RESIZED_SCHEMA)


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """DETERMINISTIC FAKE embedding (no model runtimes in this container):
    unit-normalized floats from a keyed sha256 stream — content-dependent
    and stable across runs/partitionings, so joins/ANN over the column are
    exercisable end-to-end. A real encoder drops in via ``feature_fn``."""
    raw = bytearray()
    counter = 0
    while len(raw) < dim:
        raw += hashlib.sha256(payload + counter.to_bytes(4, "little")).digest()
        counter += 1
    vec = [b / 255.0 - 0.5 for b in raw[:dim]]
    norm = sum(x * x for x in vec) ** 0.5 or 1.0
    return [x / norm for x in vec]


def extract_features(df: DataFrame, dim: int = 64,
                     payload_col: str = "payload", key_col: str = "key",
                     feature_fn: Callable[[bytes, int], list[float]] | None = None,
                     ) -> DataFrame:
    """Feature-extraction plumbing: one ``array<float>`` embedding per
    payload, Arrow-batched, schema-compatible with the ``embeddings`` table
    operators (``similarity.brute_force_topk`` etc. consume the output
    as-is). The encoder is the stubbed seam; batching, schema, and the
    narrow-map plan shape are the real 100 TB design.
    """
    feats = feature_fn or _fake_features

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "key": pdf[key_col].astype("int64"),
                "features": [feats(_payload_bytes(p), dim) for p in pdf[payload_col]],
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)
