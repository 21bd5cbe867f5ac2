"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The Spark-side architecture is real and tested — schemas, Arrow-batched
``mapInPandas`` plumbing, partition-size guidance. Metadata extraction
(format/width/height) is REAL for PNG/JPEG/GIF/BMP: dimensions live in
fixed-format container headers (PNG IHDR, JPEG SOFn, GIF screen
descriptor, BMP info header), so ``parse_image_header`` reads them with no
codec library at all. Pixel decoding is REAL for PNG (``decode_png``:
stdlib zlib + numpy unfiltering, CRC-checked), GIF (``decode_gif``:
pure-Python LZW + palette, interlace-aware) and uncompressed BMP
(``decode_bmp``: 8/24/32-bit, padded rows, both row orders) and baseline
JPEG (``jpeg.decode_jpeg``: pure-Python Huffman + IDCT, wired in via
``decode_image``) — no codec library anywhere. Payloads that aren't a
decodable image fall back to a clearly-marked deterministic fake so the
pipeline shape can be exercised end-to-end on synthetic text-derived
blobs; pass ``decode_fn``/``resize_fn`` (e.g. PIL/librosa based) to
replace the whole decode seam with a native library.

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

BINARY_PAYLOAD_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])

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


VIDEO_META_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("payload_sha256", T.StringType()),
])


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for ISO BMFF boxes in a range;
    size==1 means a 64-bit largesize follows the type."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", data[pos:pos + 4])[0]
        tag = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield tag, body, pos + size
        pos += size


def _ebml_id(data: bytes, pos: int):
    """EBML element ID (length-marker bits kept, 1-4 bytes)."""
    if pos >= len(data):
        return None
    b = data[pos]
    for ln in range(1, 5):
        if (b >> (8 - ln)) & 1:
            if pos + ln > len(data):
                return None
            return int.from_bytes(data[pos:pos + ln], "big"), pos + ln
    return None


def _ebml_size(data: bytes, pos: int):
    """EBML data size (marker bits stripped, 1-8 bytes); all-ones payload
    means 'unknown length' (streamed Segments) → extends to end."""
    if pos >= len(data):
        return None
    b = data[pos]
    for ln in range(1, 9):
        if (b >> (8 - ln)) & 1:
            if pos + ln > len(data):
                return None
            raw = int.from_bytes(data[pos:pos + ln], "big") \
                & ((1 << (7 * ln)) - 1)
            unknown = raw == (1 << (7 * ln)) - 1
            return raw, pos + ln, unknown
    return None


def _ebml_children(data: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) for EBML elements."""
    pos = start
    while pos < end:
        rid = _ebml_id(data, pos)
        if rid is None:
            return
        eid, pos = rid
        rsz = _ebml_size(data, pos)
        if rsz is None:
            return
        size, pos, unknown = rsz
        body_end = end if unknown else min(end, pos + size)
        yield eid, pos, body_end
        pos = body_end


def _parse_webm(data: bytes):
    fmt = "mkv"
    w = h = 0
    scale = 1_000_000  # EBML default TimestampScale: 1 ms in ns
    dur_units = 0.0
    for eid, b0, b1 in _ebml_children(data, 0, len(data)):
        if eid == 0x1A45DFA3:  # EBML header
            for cid, c0, c1 in _ebml_children(data, b0, b1):
                if cid == 0x4282:  # DocType
                    doctype = data[c0:c1].rstrip(b"\x00").decode(
                        "ascii", "replace")
                    fmt = "webm" if doctype == "webm" else "mkv"
        elif eid == 0x18538067:  # Segment
            for cid, c0, c1 in _ebml_children(data, b0, b1):
                if cid == 0x1549A966:  # Info
                    for iid, i0, i1 in _ebml_children(data, c0, c1):
                        if iid == 0x2AD7B1 and i1 > i0:  # TimestampScale
                            scale = int.from_bytes(data[i0:i1], "big")
                        elif iid == 0x4489:  # Duration (float32/64)
                            if i1 - i0 == 4:
                                dur_units = struct.unpack(
                                    ">f", data[i0:i1])[0]
                            elif i1 - i0 == 8:
                                dur_units = struct.unpack(
                                    ">d", data[i0:i1])[0]
                elif cid == 0x1654AE6B:  # Tracks
                    for tid, t0, t1 in _ebml_children(data, c0, c1):
                        if tid != 0xAE:  # TrackEntry
                            continue
                        for vid, v0, v1 in _ebml_children(data, t0, t1):
                            if vid != 0xE0:  # Video
                                continue
                            for pid, p0, p1 in _ebml_children(
                                    data, v0, v1):
                                if pid == 0xB0 and p1 > p0:
                                    w = max(w, int.from_bytes(
                                        data[p0:p1], "big"))
                                elif pid == 0xBA and p1 > p0:
                                    h = max(h, int.from_bytes(
                                        data[p0:p1], "big"))
    dur = dur_units * scale / 1e9
    if not (dur == dur and 0.0 <= dur < 1e10):  # NaN/Inf/negative floats
        dur = 0.0
    return (fmt, w, h, dur, -1)


def parse_video_header(data: bytes):
    """(format, width, height, duration_s, n_frames) from container
    headers — real parsing, no codec library. MP4/MOV (ISO BMFF: mvhd
    timescale+duration, tkhd dimensions as 16.16 fixed-point), AVI
    (RIFF avih: frame period, frame count, dimensions) and WebM/Matroska
    (EBML varint walk: Info TimestampScale+Duration, Tracks Video
    PixelWidth/PixelHeight; unknown-length streamed Segments extend to
    end-of-payload). ``n_frames`` is -1 when the container header does
    not carry it (MP4/WebM store it in sample tables/clusters). Returns
    None for anything else."""
    if len(data) >= 4 and data[:4] == b"\x1a\x45\xdf\xa3":
        return _parse_webm(data)
    if len(data) >= 12 and data[4:8] == b"ftyp":
        w = h = 0
        dur = 0.0
        for tag, b0, b1 in _mp4_boxes(data, 0, len(data)):
            if tag != b"moov":
                continue
            for t2, c0, c1 in _mp4_boxes(data, b0, b1):
                if t2 == b"mvhd" and c1 - c0 >= 20:
                    ver = data[c0]
                    if ver == 1:
                        # v1 body needs 32 bytes to reach the 64-bit
                        # duration; a shorter v1 box is malformed —
                        # skip it rather than misparse with v0 offsets
                        if c1 - c0 < 32:
                            continue
                        scale = struct.unpack(">I", data[c0 + 20:c0 + 24])[0]
                        d = struct.unpack(">Q", data[c0 + 24:c0 + 32])[0]
                    else:
                        scale = struct.unpack(">I", data[c0 + 12:c0 + 16])[0]
                        d = struct.unpack(">I", data[c0 + 16:c0 + 20])[0]
                    if scale:
                        dur = d / scale
                elif t2 == b"trak":
                    for t3, d0, d1 in _mp4_boxes(data, c0, c1):
                        # zero-body (size-8) tkhd: nothing to read
                        if t3 != b"tkhd" or d0 >= d1:
                            continue
                        ver = data[d0]
                        # v0 body: 4 ver/flags + 4+4 times + 4 id + 4 rsvd
                        # + 4 duration + 8 rsvd + 2+2+2+2 + 36 matrix = 76
                        # to width; v1 widens the three times to 64-bit
                        off = d0 + (88 if ver == 1 else 76)
                        if off + 8 <= d1:
                            tw, th = struct.unpack(
                                ">II", data[off:off + 8])
                            # 16.16 fixed point; audio tracks carry 0x0
                            w = max(w, tw >> 16)
                            h = max(h, th >> 16)
            return ("mp4", w, h, dur, -1)
        return None
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        pos = 12
        while pos + 8 <= len(data):
            tag = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            if tag == b"LIST" and data[pos + 8:pos + 12] == b"hdrl":
                inner = pos + 12
                if data[inner:inner + 4] == b"avih" \
                        and inner + 48 <= len(data):
                    a = inner + 8
                    usec_pf = struct.unpack("<I", data[a:a + 4])[0]
                    frames = struct.unpack("<I", data[a + 16:a + 20])[0]
                    w, h = struct.unpack("<II", data[a + 32:a + 40])
                    dur = frames * usec_pf / 1e6 if usec_pf else 0.0
                    return ("avi", w, h, dur, frames)
                return None
            pos += 8 + size + (size & 1)
        return None
    return None


def _fake_video_meta(payload: bytes):
    """DETERMINISTIC FAKE video metadata for unrecognized payloads (same
    contract as the image/audio fakes)."""
    h = hashlib.sha256(payload).digest()
    fmt = ("mp4", "avi", "webm")[h[0] % 3]
    return fmt, 320 + h[1] * 8, 240 + h[2] * 8, 1.0 + h[3] / 16.0, -1


def extract_video_metadata(df: DataFrame, payload_col: str = "payload",
                           key_col: str = "key") -> DataFrame:
    """Arrow-batched video metadata: REAL for MP4/MOV, AVI and
    WebM/Matroska container headers, marked fake otherwise. Frame
    extraction stays behind the ``sample_frames`` seam (real decode
    needs a codec library). Narrow map, no shuffle."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                data = _payload_bytes(payload)
                parsed = parse_video_header(data) or _fake_video_meta(data)
                fmt, w, h, dur, n = parsed
                rows.append((int(key), len(data), fmt, int(w), int(h),
                             float(dur), int(n),
                             hashlib.sha256(data).hexdigest()))
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_META_SCHEMA])

    return df.mapInPandas(extract, VIDEO_META_SCHEMA)


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


def _encode_gray_png(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal REAL 8-bit grayscale PNG encoder (filter 0 scanlines,
    one IDAT). Counterpart of ``decode_png`` for synthesizing decodable
    test/driver payloads; kept independent of the decoder's internals so
    an encoder bug cannot mask a decoder bug (the codec-fixture lesson,
    see tests/test_jpeg.py)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = tag + data
        return struct.pack(">I", len(data)) + c \
            + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[r * width:(r + 1) * width]
                   for r in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def attach_synthetic_image_payload(df: DataFrame, text_col: str = "text",
                                   key_col: str = "doc_id") -> DataFrame:
    """DETERMINISTIC, driver-replayable image payloads: a real 64×64
    grayscale PNG per row whose 8×8 block (R, C) is the constant byte
    sha256(text)[(R*8 + C) % 32]. Decoding exercises the REAL
    PNG→gray→nearest-neighbor stack (``decode_image``/``_default_resize``/
    ``image_features``), while the outputs stay closed-form in the digest:
    the 64×64 resize is the identity on these payloads, so the pixel
    buffer is the block-expanded digest (DuckDB replays its sha256 from
    ``repeat``/``substr`` over the hex), and each pooled 8×8 feature cell
    is the exact float32 of one digest byte / 255 — equal bytes give
    bit-equal features, so the feature ARGMAX (first-wins) equals the
    digest's integer argmax with no float-tie hazard. Arrow-batched like
    the other codec stages."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "key": pdf[key_col].astype("int64"),
                "payload": [_synthetic_png_from_text(t)
                            for t in pdf[text_col]],
            })

    return df.mapInPandas(run, BINARY_PAYLOAD_SCHEMA)


def _synthetic_png_from_text(text) -> bytes:
    """The synthetic-payload body shared by
    :func:`attach_synthetic_image_payload` and the fused m1 pass
    (:func:`synthetic_image_meta_features`) — one definition so the two
    can never drift."""
    import numpy as np

    digest = hashlib.sha256(str(text).encode("utf-8")).digest()
    # 64 block values (digest repeated) -> 8x8 grid -> expand each
    # cell to an 8x8 constant block (vectorized: the python-loop
    # version cost 4096 iterations/doc, the m1 bench bottleneck)
    grid = np.frombuffer(digest * 2, np.uint8).reshape(8, 8)
    img = np.repeat(np.repeat(grid, 8, axis=0), 8, axis=1)
    return _encode_gray_png(img.tobytes(), 64, 64)


def _encode_const_block_jpeg(blocks, q: int = 16) -> bytes:
    """Minimal REAL grayscale baseline JPEG (T.81) of a 64×64 image whose
    8×8 block (r, c) is the constant byte ``blocks[r][c]`` — the video
    counterpart of :func:`_encode_gray_png` for synthesizing decodable
    driver payloads. A constant block's DCT is DC-only (F00 = 8·(v−128),
    all AC zero), so the scan is one DC diff + EOB per block under flat
    8-bit Huffman tables and a flat quantization table. Block values
    with (v−128) divisible by q/8·2 (e.g. 32/224 at q=16) round-trip
    EXACTLY: quantization round(8Δ/q) is lossless there and the IDCT of
    a lone DC coefficient is a constant block."""
    scan = bytearray()
    acc = [0, 0]  # bit accumulator: value, count

    def emit(val: int, n: int) -> None:
        acc[0] = (acc[0] << n) | (val & ((1 << n) - 1))
        acc[1] += n
        while acc[1] >= 8:
            b = (acc[0] >> (acc[1] - 8)) & 0xFF
            scan.append(b)
            if b == 0xFF:
                scan.append(0)  # byte stuffing
            acc[1] -= 8

    pred = 0
    for r in range(8):
        for c in range(8):
            dc = round(8 * (int(blocks[r][c]) - 128) / q)
            diff = dc - pred
            pred = dc
            t = abs(diff).bit_length()
            emit(t, 8)  # flat DC table: code of category t is t, 8 bits
            if t:
                emit(diff if diff >= 0 else diff + (1 << t) - 1, t)
            emit(0, 8)  # flat AC table: EOB is the only symbol
    if acc[1]:
        emit((1 << (8 - acc[1])) - 1, 8 - acc[1])  # pad with 1s (F.1.2.3)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    return (b"\xff\xd8"
            + seg(0xDB, bytes([0]) + bytes([q] * 64))
            + seg(0xC0, bytes([8]) + struct.pack(">HH", 64, 64)
                  + bytes([1, 1, 0x11, 0]))
            + seg(0xC4, bytes([0x00]) + bytes([0] * 7 + [12] + [0] * 8)
                  + bytes(range(12)))
            + seg(0xC4, bytes([0x10]) + bytes([0] * 7 + [1] + [0] * 8)
                  + bytes([0]))
            + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + bytes(scan) + b"\xff\xd9")


def _mjpeg_avi_container(jpegs: list[bytes], w: int, h: int) -> bytes:
    """Minimal REAL RIFF/AVI wrapper around Motion-JPEG frames (hdrl with
    avih + strl{strh 'vids'/MJPG, strf BITMAPINFOHEADER}, then movi with
    one 00dc chunk per frame, word-aligned) — the layout
    :func:`avi_mjpeg_frames` walks."""
    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(tag: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", tag + body)

    avih = (struct.pack("<I", 33333) + b"\x00" * 12
            + struct.pack("<I", len(jpegs)) + b"\x00" * 12
            + struct.pack("<II", w, h) + b"\x00" * 16)
    strh = b"vids" + b"MJPG" + b"\x00" * 48
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def attach_synthetic_video_payload(df: DataFrame, text_col: str = "text",
                                   key_col: str = "doc_id",
                                   n_frames: int = 3) -> DataFrame:
    """DETERMINISTIC, driver-replayable VIDEO payloads: a real AVI/MJPEG
    clip per row whose frames are 64×64 block-pattern baseline JPEGs —
    block i (= 8·r + c, the aHash bit layout) is 224 when bit
    ``(digest[i%32] >> (i//32)) & 1`` of sha256(text) is set, else 32.
    Decoding exercises the REAL container walk (avi_mjpeg_frames) and
    JPEG entropy/DCT stack while the aHash stays closed-form: 32/224
    survive the flat-q16 quantizer exactly, the grid mean sits strictly
    between them whenever both appear, so aHash == the digest bit mask
    (0 in the measure-zero all-equal case — both engines replay the
    CASE). All ``n_frames`` frames are identical, so video_phash's
    majority vote equals the frame hash while still running the real
    per-frame sample/decode/vote machinery."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def build(text) -> bytes:
            digest = hashlib.sha256(str(text).encode("utf-8")).digest()
            blocks = [[224 if (digest[(r * 8 + c) % 32] >> ((r * 8 + c) // 32)) & 1
                       else 32 for c in range(8)] for r in range(8)]
            jpg = _encode_const_block_jpeg(blocks)
            return _mjpeg_avi_container([jpg] * n_frames, 64, 64)

        for pdf in batches:
            yield pd.DataFrame({
                "key": pdf[key_col].astype("int64"),
                "payload": [build(t) for t in pdf[text_col]],
            })

    return df.mapInPandas(run, BINARY_PAYLOAD_SCHEMA)


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


def _riff_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for RIFF chunks in a range;
    chunk bodies are word-aligned (odd sizes carry a pad byte). Truncated
    final chunks are clamped to the payload end, never over-read."""
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = pos + 8
        yield cid, body, min(body + size, end)
        pos = body + size + (size & 1)


def avi_mjpeg_frames(data: bytes):
    """REAL video frame extraction for Motion-JPEG AVI: walk the RIFF
    tree, find the first ``vids`` stream with a JPEG-family handler
    (MJPG/jpeg/dmb1 per the OpenDML AVI registry), and return its
    ``##dc``/``##db`` movi chunk payloads — each one a standalone
    baseline JPEG that :func:`decode_image` / ``jpeg.decode_jpeg``
    decodes to pixels. Returns None for non-AVI payloads or AVI files
    whose video codec is not MJPEG (those stay behind the fixed-stride
    stand-in in :func:`sample_frames`). Never raises on corrupt input
    (same contract as the header parsers, fuzz-pinned)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        return None
    streams = []  # (fccType, fccHandler) in strl declaration order
    for cid, b0, b1 in _riff_chunks(data, 12, len(data)):
        if cid == b"LIST" and data[b0:b0 + 4] == b"hdrl":
            for c2, c0, c1 in _riff_chunks(data, b0 + 4, b1):
                if c2 == b"LIST" and data[c0:c0 + 4] == b"strl":
                    entry = (b"", b"")
                    for c3, d0, d1 in _riff_chunks(data, c0 + 4, c1):
                        if c3 == b"strh" and d1 - d0 >= 8:
                            entry = (data[d0:d0 + 4], data[d0 + 4:d0 + 8])
                            break
                    streams.append(entry)
    video = next((i for i, (t, h) in enumerate(streams)
                  if t == b"vids"
                  and h.lower() in (b"mjpg", b"jpeg", b"dmb1")), None)
    if video is None:
        return None
    tags = (b"%02ddc" % video, b"%02ddb" % video)
    frames = []
    for cid, b0, b1 in _riff_chunks(data, 12, len(data)):
        if cid == b"LIST" and data[b0:b0 + 4] == b"movi":
            for c2, c0, c1 in _riff_chunks(data, b0 + 4, b1):
                if c2 in tags and c1 > c0:
                    frames.append(data[c0:c1])
    return frames or None


_MP4_JPEG_FORMATS = (b"jpeg", b"mjpa", b"mjpb", b"mjpg", b"MJPG")


def mp4_jpeg_frames(data: bytes):
    """REAL frame extraction for Motion-JPEG in MP4/MOV: a full sample-
    table walk (ISO 14496-12 stbl). Finds the first ``vide``-handler
    trak whose stsd sample-description fourcc is a JPEG family
    (jpeg/mjpa/mjpb per the QuickTime registry), then resolves every
    sample's absolute file range from stsc (sample→chunk runs) ×
    stco/co64 (chunk offsets) × stsz (sizes; uniform or per-sample
    table) — samples are contiguous within a chunk. Returns the sample
    byte ranges (each a standalone baseline JPEG for this codec), or
    None for non-MP4 payloads / other codecs. Never raises on corrupt
    input: explicit bounds guards plus a belt-and-braces except for the
    self-consistent layouts fuzzing can't enumerate (the ADVICE-r6
    sanctioned pattern for the MP4 walk)."""
    try:
        return _mp4_jpeg_frames(data)
    except (struct.error, IndexError, OverflowError, MemoryError):
        return None


def _mp4_jpeg_frames(data: bytes):
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None
    for tag, b0, b1 in _mp4_boxes(data, 0, len(data)):
        if tag != b"moov":
            continue
        for t2, c0, c1 in _mp4_boxes(data, b0, b1):
            if t2 != b"trak":
                continue
            frames = _trak_jpeg_frames(data, c0, c1)
            if frames:
                return frames
        return None
    return None


def _trak_jpeg_frames(data: bytes, t0: int, t1: int):
    hdlr_type = stbl = None
    for t3, d0, d1 in _mp4_boxes(data, t0, t1):
        if t3 != b"mdia":
            continue
        for t4, e0, e1 in _mp4_boxes(data, d0, d1):
            if t4 == b"hdlr" and e1 - e0 >= 12:
                hdlr_type = data[e0 + 8:e0 + 12]
            elif t4 == b"minf":
                for t5, f0, f1 in _mp4_boxes(data, e0, e1):
                    if t5 == b"stbl":
                        stbl = (f0, f1)
    if hdlr_type != b"vide" or stbl is None:
        return None
    boxes = {}
    for t6, g0, g1 in _mp4_boxes(data, *stbl):
        boxes.setdefault(t6, (g0, g1))

    def u32(pos):
        return struct.unpack(">I", data[pos:pos + 4])[0]

    # stsd: the first sample entry's fourcc decides the codec
    if b"stsd" not in boxes:
        return None
    s0, s1 = boxes[b"stsd"]
    if s1 - s0 < 16 or data[s0 + 12:s0 + 16] not in _MP4_JPEG_FORMATS:
        return None

    # stsz: uniform sample_size, or a per-sample u32 table
    if b"stsz" not in boxes:
        return None
    z0, z1 = boxes[b"stsz"]
    if z1 - z0 < 12:
        return None
    uniform, n_samples = u32(z0 + 4), u32(z0 + 8)
    if n_samples == 0 or n_samples > 1_000_000:  # corrupt-count fence
        return None
    if uniform:
        sizes = [uniform] * n_samples
    else:
        if z1 - (z0 + 12) < 4 * n_samples:
            return None
        sizes = [u32(z0 + 12 + 4 * i) for i in range(n_samples)]

    # chunk offsets: stco (u32) or co64 (u64)
    if b"stco" in boxes:
        o0, o1 = boxes[b"stco"]
        n_chunks = u32(o0 + 4)
        if o1 - (o0 + 8) < 4 * n_chunks:
            return None
        chunk_off = [u32(o0 + 8 + 4 * i) for i in range(n_chunks)]
    elif b"co64" in boxes:
        o0, o1 = boxes[b"co64"]
        n_chunks = u32(o0 + 4)
        if o1 - (o0 + 8) < 8 * n_chunks:
            return None
        chunk_off = [struct.unpack(">Q", data[o0 + 8 + 8 * i:
                                              o0 + 16 + 8 * i])[0]
                     for i in range(n_chunks)]
    else:
        return None

    # stsc runs: (first_chunk, samples_per_chunk, desc_idx), 1-based,
    # each run extends to the next run's first_chunk
    if b"stsc" not in boxes:
        return None
    c0_, c1_ = boxes[b"stsc"]
    n_runs = u32(c0_ + 4)
    if c1_ - (c0_ + 8) < 12 * n_runs or n_runs == 0:
        return None
    runs = [(u32(c0_ + 8 + 12 * i), u32(c0_ + 12 + 12 * i))
            for i in range(n_runs)]

    frames = []
    sample = 0
    for ri, (first, per_chunk) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(chunk_off)
        for chunk in range(first, last + 1):
            if chunk - 1 >= len(chunk_off) or sample >= n_samples:
                break
            pos = chunk_off[chunk - 1]
            for _ in range(per_chunk):
                if sample >= n_samples:
                    break
                end = pos + sizes[sample]
                if end > len(data):
                    return None  # offsets point past the payload
                frames.append(data[pos:end])
                pos = end
                sample += 1
    return frames if len(frames) == n_samples else None


def webm_mjpeg_frames(data: bytes):
    """REAL frame extraction for Motion-JPEG in WebM/Matroska: find the
    ``V_MJPEG`` video TrackEntry in Tracks, then collect that track's
    SimpleBlock / BlockGroup>Block payloads from every Cluster (block
    header: EBML-coded track number + 2-byte timestamp + flags; unlaced
    blocks only — lacing never occurs for one-frame-per-block video).
    Returns None for non-Matroska payloads or other codecs; never raises
    on corrupt input (same contract as the MP4 walker)."""
    if len(data) < 4 or data[:4] != b"\x1a\x45\xdf\xa3":
        return None
    try:
        return _webm_mjpeg_frames(data)
    except (struct.error, IndexError, OverflowError, MemoryError):
        return None


def _webm_mjpeg_frames(data: bytes):
    for eid, b0, b1 in _ebml_children(data, 0, len(data)):
        if eid != 0x18538067:  # Segment
            continue
        video_track = None
        for eid2, c0, c1 in _ebml_children(data, b0, b1):
            if eid2 != 0x1654AE6B:  # Tracks
                continue
            for eid3, d0, d1 in _ebml_children(data, c0, c1):
                if eid3 != 0xAE:  # TrackEntry
                    continue
                tnum = ttype = None
                codec = b""
                for eid4, e0, e1 in _ebml_children(data, d0, d1):
                    if eid4 == 0xD7 and e1 > e0:      # TrackNumber
                        tnum = int.from_bytes(data[e0:e1], "big")
                    elif eid4 == 0x83 and e1 > e0:    # TrackType
                        ttype = int.from_bytes(data[e0:e1], "big")
                    elif eid4 == 0x86:                # CodecID
                        codec = data[e0:e1].rstrip(b"\x00")
                if ttype == 1 and codec == b"V_MJPEG" and tnum:
                    video_track = tnum
                    break
        if video_track is None:
            return None
        frames = []
        for eid2, c0, c1 in _ebml_children(data, b0, b1):
            if eid2 != 0x1F43B675:  # Cluster
                continue
            for eid3, d0, d1 in _ebml_children(data, c0, c1):
                if eid3 == 0xA3:  # SimpleBlock
                    f = _webm_block_frame(data, d0, d1, video_track)
                    if f:
                        frames.append(f)
                elif eid3 == 0xA0:  # BlockGroup
                    for eid4, e0, e1 in _ebml_children(data, d0, d1):
                        if eid4 == 0xA1:  # Block
                            f = _webm_block_frame(data, e0, e1,
                                                  video_track)
                            if f:
                                frames.append(f)
        return frames or None
    return None


def _webm_block_frame(data: bytes, b0: int, b1: int, track: int):
    """One (Simple)Block's frame payload, or None if it belongs to
    another track / is laced / is truncated. The track number uses the
    same marker-stripped VINT coding as element sizes."""
    r = _ebml_size(data, b0)
    if r is None:
        return None
    tnum, pos, _ = r
    # after the VINT: 2-byte relative timestamp + 1 flags byte
    if tnum != track or pos + 3 > b1:
        return None
    if data[pos + 2] & 0x06:  # lacing bits set: multi-frame block, skip
        return None
    return data[pos + 3:b1]


def _real_frames(data: bytes):
    """Dispatch to the real per-container frame walkers (MJPEG in AVI,
    MP4/MOV and WebM/Matroska); None → the fixed-stride stand-in."""
    return (avi_mjpeg_frames(data) or mp4_jpeg_frames(data)
            or webm_mjpeg_frames(data))


def sample_frames(df: DataFrame, payload_col: str = "payload", key_col: str = "key",
                  every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame sampling: REAL for Motion-JPEG AVI and MP4/MOV payloads
    (container walks via :func:`avi_mjpeg_frames` /
    :func:`mp4_jpeg_frames`; each emitted ``frame_bytes`` is a
    decodable JPEG — compose with ``decode_image``/``resize_images``/
    ``image_features`` for pixels), fixed-stride chunks for everything
    else (the stand-in where a codec library would drop in at the same
    seam). MJPEG frames beyond ``max_frames`` are sampled evenly across
    the stream (``frame_idx`` keeps the SOURCE frame index, so sampling
    density is visible to the caller); the stand-in path uses
    ceil-division stride count, so the payload tail after the last full
    stride still becomes a (short) frame when the frame budget allows.
    A NULL/empty payload yields ZERO frames (matching _payload_bytes'
    contract — no phantom empty frame). One input row → ≤ max_frames
    output rows, deterministic regardless of partitioning."""

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            keys, idxs, frames = [], [], []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                data = _payload_bytes(payload)
                mjpeg = _real_frames(data)
                if mjpeg is not None:
                    n = len(mjpeg)
                    take = min(max_frames, n)
                    for j in range(take):
                        # endpoint-inclusive even spacing (first and last
                        # frame always sampled), deterministic
                        fi = 0 if take == 1 else j * (n - 1) // (take - 1)
                        keys.append(int(key))
                        idxs.append(fi)
                        frames.append(mjpeg[fi])
                    continue
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


def decode_png(data: bytes):
    """REAL PNG pixel decode — stdlib ``zlib`` + numpy only, no codec lib.

    Returns a ``(height, width, channels)`` uint8 array. Supports the
    ubiquitous subset: 8-bit depth, color types 0 (gray), 2 (RGB),
    3 (palette → RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced, all five
    scanline filters (None/Sub/Up/Average/Paeth), CRC-validated chunks.
    16-bit depth and Adam7 interlacing raise ``ValueError`` (pass a
    library-backed ``decode_fn``/``resize_fn`` for those). This removes
    the deterministic-fake fallback for the most common format; other
    containers still fall through to the marked fakes.
    """
    import struct as _struct
    import zlib

    import numpy as np

    if len(data) < 8 or data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, plte, idat = 8, None, None, bytearray()
    while pos + 12 <= len(data):
        ln, tag = _struct.unpack(">I4s", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        crc = data[pos + 8 + ln:pos + 12 + ln]
        if len(body) != ln or len(crc) != 4:
            raise ValueError("truncated PNG chunk")
        if zlib.crc32(tag + body) != _struct.unpack(">I", crc)[0]:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError(f"PNG IHDR length {len(body)} != 13")
            ihdr = _struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNGs supported, got depth {depth}")
    if interlace:
        raise ValueError("Adam7-interlaced PNGs not supported")
    try:
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    except KeyError:
        raise ValueError(f"unknown PNG color type {ctype}") from None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # not ValueError by default — must be, so a corrupt deflate
        # stream degrades at the resize seam instead of killing the stage
        raise ValueError(f"PNG IDAT deflate stream corrupt: {exc}") from exc
    stride = w * channels
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG pixel data length mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    bpp = channels  # bytes per pixel at 8-bit depth
    prev = np.zeros(stride, np.int32)
    rows = []
    for y in range(h):
        f = int(arr[y, 0])
        line = arr[y, 1:].astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # Up: fully vectorizable (no intra-row dependency)
            cur = (line + prev) & 255
        elif f in (1, 3, 4):
            # Sub/Average/Paeth have a serial dependency along x; per-byte
            # loop per scanline (fixtures and sampled frames are small —
            # swap in a library decode_fn for bulk pixel work)
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 255
        else:
            raise ValueError(f"bad PNG scanline filter {f}")
        rows.append(cur)
        prev = cur
    img = np.array(rows, dtype=np.uint8).reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE chunk")
        pal = np.frombuffer(plte[: len(plte) - len(plte) % 3],
                            np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if len(pal) == 0 or int(idx.max()) >= len(pal):
            raise ValueError("PNG pixel index outside PLTE palette")
        img = pal[idx]
    return img


def decode_bmp(data: bytes):
    """REAL BMP pixel decode — ``struct`` + numpy only.

    Returns ``(height, width, channels)`` uint8, RGB (8/24-bit sources) or
    RGBA (32-bit). Supports the uncompressed (BI_RGB) forms that cover the
    overwhelming majority of real BMPs: BITMAPINFOHEADER-or-later with
    8-bit palette, 24-bit BGR, or 32-bit BGRA pixels; bottom-up (positive
    height) and top-down (negative height) row orders; 4-byte row padding.
    RLE/bitfield compression and the ancient BITMAPCOREHEADER raise
    ``ValueError``.
    """
    import struct as _struct

    import numpy as np

    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP (bad signature or truncated header)")
    pix_off = _struct.unpack("<I", data[10:14])[0]
    hdr_size = _struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {hdr_size}")
    w, h_signed = _struct.unpack("<ii", data[18:26])
    planes, bpp = _struct.unpack("<HH", data[26:30])
    compression = _struct.unpack("<I", data[30:34])[0]
    if w <= 0 or h_signed == 0 or planes != 1:
        raise ValueError("bad BMP dimensions/planes")
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) not supported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    h, bottom_up = abs(h_signed), h_signed > 0
    row_bytes = (w * (bpp // 8) + 3) & ~3
    if pix_off + row_bytes * h > len(data):
        raise ValueError("BMP pixel data length mismatch")
    rows = np.frombuffer(
        data[pix_off:pix_off + row_bytes * h], np.uint8
    ).reshape(h, row_bytes)[:, : w * (bpp // 8)]
    if bottom_up:
        rows = rows[::-1]
    if bpp == 8:
        # palette: BGRA quads between the DIB header and the pixel array
        n_colors = _struct.unpack("<I", data[46:50])[0] or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data[pal_off:pal_off + 4 * n_colors], np.uint8
        ).reshape(-1, 4)
        if len(pal) < n_colors:
            raise ValueError("BMP palette truncated")
        if int(rows.max()) >= len(pal):
            raise ValueError("BMP pixel index outside palette")
        return pal[rows][:, :, [2, 1, 0]].copy()  # BGRx quads -> RGB
    px = rows.reshape(h, w, bpp // 8)
    order = [2, 1, 0] if bpp == 24 else [2, 1, 0, 3]  # BGR(A) -> RGB(A)
    return px[:, :, order].copy()


def _gif_lzw_decode(mcs: int, data: bytes, n_pixels: int) -> list[int]:
    """GIF-flavor LZW (GIF89a spec, appendix F): variable-width codes
    packed LSB-first, clear/EOI codes, dictionary capped at 12 bits."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    width, next_code = mcs + 1, eoi + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [[i] for i in range(clear)] + [[], []]
                width, next_code, prev = mcs + 1, eoi + 1, None
                continue
            if code == eoi:
                if len(out) < n_pixels:
                    raise ValueError("GIF LZW stream ended early")
                return out[:n_pixels]
            if code < next_code:
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]  # the KwK special case
            else:
                raise ValueError(f"bad GIF LZW code {code}")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_pixels:
                return out[:n_pixels]
    raise ValueError("GIF LZW stream ended without enough pixels")


def decode_gif(data: bytes):
    """REAL GIF pixel decode — pure Python LZW + numpy, no codec library.

    Returns the FIRST frame as ``(height, width, 3)`` uint8 RGB (animated
    GIFs: later frames and disposal/composition are out of scope; GIF89a
    transparency is ignored — the transparent index renders as its palette
    color). Supports global and local color tables and interlaced row
    order. Malformed streams raise ``ValueError``.
    """
    import struct as _struct

    import numpy as np

    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    flags = data[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
        if len(gct) < n:
            raise ValueError("GIF global color table truncated")
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(data):
                raise ValueError("GIF truncated in sub-blocks")
            size = data[p]
            p += 1 + size
            if size == 0:
                return p

    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label byte then sub-blocks
            pos = skip_subblocks(pos + 2)
        elif block == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                raise ValueError("GIF image descriptor truncated")
            _x, _y, w, h = _struct.unpack("<HHHH", data[pos + 1:pos + 9])
            iflags = data[pos + 9]
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(
                    data[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
                if len(table) < n:
                    raise ValueError("GIF local color table truncated")
                pos += 3 * n
            if table is None:
                raise ValueError("GIF image has no color table")
            if w == 0 or h == 0:
                raise ValueError("GIF zero-sized image")
            if pos >= len(data):
                raise ValueError("GIF truncated before image data")
            mcs = data[pos]
            if not 2 <= mcs <= 8:
                raise ValueError(f"bad GIF LZW min code size {mcs}")
            pos += 1
            lzw = bytearray()
            while True:
                if pos >= len(data):
                    raise ValueError("GIF truncated in image data")
                size = data[pos]
                pos += 1
                if size == 0:
                    break
                if pos + size > len(data):
                    raise ValueError("GIF truncated in image data")
                lzw += data[pos:pos + size]
                pos += size
            idx = _gif_lzw_decode(mcs, bytes(lzw), w * h)
            arr = np.array(idx, np.uint16).reshape(h, w)
            if int(arr.max()) >= len(table):
                raise ValueError("GIF pixel index outside color table")
            img = table[arr]
            if iflags & 0x40:  # interlaced: pass order 0,4.. 2,6.. 1,3.. ..
                deint = np.empty_like(img)
                order = ([*range(0, h, 8)] + [*range(4, h, 8)]
                         + [*range(2, h, 4)] + [*range(1, h, 2)])
                deint[order] = img
                img = deint
            return img
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF truncated before trailer")


def decode_image(payload: bytes):
    """Pixel decode for recognized containers: a real ``(h, w, c)`` uint8
    array for PNG / uncompressed BMP / GIF first frames / baseline JPEG,
    ``None`` for everything else (callers fall back to their marked
    deterministic fakes or a supplied ``decode_fn``). The pure-Python
    JPEG path is correctness-grade, not throughput-grade — supply a
    library ``decode_fn`` for bulk 100 TB pixel work (see
    ``jpeg.decode_jpeg``'s performance note)."""
    if len(payload) >= 8 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    if len(payload) >= 6 and payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if len(payload) >= 54 and payload[:2] == b"BM" \
            and payload[14] in (40, 108, 124):
        return decode_bmp(payload)
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        from datafusion_substrait_spark.operators.jpeg import decode_jpeg
        return decode_jpeg(payload)
    return None


def _to_gray(img):
    """(h, w, c) uint8 → (h, w) uint8 luma (BT.601 weights for color;
    alpha ignored — it is coverage, not intensity)."""
    import numpy as np

    c = img.shape[2]
    if c == 1 or c == 2:  # gray / gray+alpha
        return img[:, :, 0]
    rgb = img[:, :, :3].astype(np.float32)
    return (rgb @ np.array([0.299, 0.587, 0.114], np.float32)).astype(
        np.uint8)


def _resize_from_gray(gray, width: int, height: int) -> bytes:
    """Post-decode resize body: (h, w) uint8 luma → width×height
    nearest-neighbor bytes. Shared by the standalone resize seam and the
    fused ``resize_and_features`` pass so the two cannot drift."""
    src_h, src_w = gray.shape
    return gray[_nn_indices(height, src_h)][:, _nn_indices(width, src_w)] \
        .tobytes()


def _default_resize(payload: bytes, width: int, height: int) -> bytes:
    """Resize seam default: REAL decode + grayscale + nearest-neighbor
    resample for PNG/GIF/BMP payloads; the marked fake for other
    containers AND for corrupt-but-recognized ones — on a 100 TB dirty
    corpus one truncated blob must not kill the stage (use ``decode_png``
    etc. directly when you want the error)."""
    try:
        img = decode_image(payload)
    except ValueError:
        img = None
    if img is None:
        return _fake_resize(payload, width, height)
    return _resize_from_gray(_to_gray(img), width, height)


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
    shuffle. The default transform is REAL for PNG/GIF/BMP/baseline-JPEG
    payloads (pure-Python decode, grayscale, nearest-neighbor resample —
    see ``decode_image``); unrecognized containers and corrupt blobs
    fall back to the marked deterministic fake (per-payload error
    capture — one bad blob never kills the stage) until a library
    ``resize_fn`` is supplied. Output pixel buffers are width×height
    bytes (grayscale), so downstream batch sizing behaves like a real
    resized-image column.
    """
    resize = resize_fn or _default_resize

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


def _nn_indices(n: int, size: int):
    """Nearest-neighbor resample indices: n samples over [0, size) (the
    shared idiom for _default_resize and image_features — fix the
    rounding/clamping here, not in per-site copies)."""
    import numpy as np

    return np.minimum((np.arange(n) * size) // n, size - 1)


def image_features(payload: bytes, dim: int = 64) -> list[float] | None:
    """REAL content-based image features for decodable payloads (classical
    CV, no model runtime): an 8×8 mean-pooled intensity grid (64 dims);
    for ``dim`` > 64 a 32-bin intensity histogram is appended, and for
    ``dim`` > 96 sixteen gradient-energy cells (components past ``dim``
    are never computed — no wasted gradient work at the default). The
    vector is truncated/zero-padded to ``dim`` and unit-normalized; a
    degenerate all-zero vector (uniform black image at small dims) maps
    to the canonical first basis vector so identical inputs always land
    at cosine 1. Returns None for undecodable payloads (callers fall
    back to the marked fake or a model-backed ``feature_fn``)."""
    import numpy as np

    try:
        img = decode_image(payload)
    except ValueError:
        img = None
    if img is None:
        return None
    return _features_from_gray(_to_gray(img), dim)


def _features_from_gray(gray8, dim: int) -> list[float]:
    """Post-decode feature body: (h, w) uint8 luma → ``dim``-dim
    unit-normalized classical-CV vector (see :func:`image_features`).
    Shared by the standalone feature seam and the fused
    ``resize_and_features`` pass so the two cannot drift."""
    import numpy as np

    gray = gray8.astype(np.float32) / 255.0
    h, w = gray.shape

    big = gray[_nn_indices(64, h)][:, _nn_indices(64, w)]
    parts = [big.reshape(8, 8, 8, 8).mean(axis=(1, 3)).reshape(-1)]  # 64
    if dim > 64:
        parts.append(
            np.histogram(gray, bins=32, range=(0, 1))[0] / gray.size)  # 32
    if dim > 96:
        if h >= 2 and w >= 2:
            gy, gx = np.gradient(gray)
            mag = np.sqrt(gx * gx + gy * gy)
            msub = mag[_nn_indices(32, h)][:, _nn_indices(32, w)]
            parts.append(
                msub.reshape(4, 8, 4, 8).mean(axis=(1, 3)).reshape(-1))  # 16
        else:
            # np.gradient needs >= 2 samples per axis; a 1xN strip has no
            # vertical gradient — emit zeros instead of crashing the stage
            parts.append(np.zeros(16, np.float32))
    vec = np.concatenate(parts)
    if dim <= len(vec):
        vec = vec[:dim]
    else:
        vec = np.concatenate([vec, np.zeros(dim - len(vec), np.float32)])
    norm = float(np.linalg.norm(vec))
    if norm < 1e-12:
        vec = np.zeros(dim, np.float32)
        vec[0] = 1.0
        norm = 1.0
    return [float(x) / norm for x in vec]


def _default_features(payload: bytes, dim: int) -> list[float]:
    """Feature seam default: REAL classical-CV features for decodable
    images, the marked hash fake otherwise."""
    return image_features(payload, dim) or _fake_features(payload, dim)


def perceptual_hash(payload: bytes, kind: str = "ahash") -> int | None:
    """64-bit perceptual image hash over the REAL decode path (None for
    undecodable payloads — an unhashable image matches nothing).

    * ``ahash`` — average hash: 8×8 mean-pooled luma grid, bit r·8+c set
      iff the cell exceeds the grid mean. Robust to uniform brightness /
      scale changes; the standard cheap near-dup signature.
    * ``dhash`` — difference hash: 8×9 grid, bit set iff cell (r,c) <
      (r,c+1) — a horizontal-gradient sign map, more robust to global
      brightness shifts than ahash.

    Pooling reuses :func:`image_features`' nearest-neighbor + block-mean
    idiom so the two content signatures cannot drift. The value is
    wrapped to a SIGNED 64-bit int (Spark LongType); Hamming distance is
    unaffected by the wrap.
    """
    import numpy as np

    if kind not in ("ahash", "dhash"):
        raise ValueError(f"kind must be 'ahash' or 'dhash', got {kind!r}")
    try:
        img = decode_image(payload)
    except ValueError:
        img = None
    if img is None:
        return None
    gray = _to_gray(img).astype(np.float32)
    h, w = gray.shape
    cols = 8 if kind == "ahash" else 9
    big = gray[_nn_indices(64, h)][:, _nn_indices(8 * cols, w)]
    grid = big.reshape(8, 8, cols, 8).mean(axis=(1, 3))
    if kind == "ahash":
        bits = grid > grid.mean()
    else:
        bits = grid[:, :-1] < grid[:, 1:]
    v = 0
    for i, b in enumerate(bits.reshape(-1)):
        if b:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


PHASH_SCHEMA = "key bigint, phash bigint"


def image_phash(df: DataFrame, payload_col: str = "payload",
                key_col: str = "key", kind: str = "ahash",
                hash_fn: Callable[[bytes], int | None] | None = None,
                ) -> DataFrame:
    """(key, phash): perceptual hashes for a binary image column —
    Arrow-batched ``mapInPandas`` narrow map, NULL phash for undecodable
    payloads (per-payload error capture: one corrupt blob never kills a
    100 TB stage). Supply ``hash_fn`` to swap in a library hasher at the
    same seam."""
    fn = hash_fn or (lambda p: perceptual_hash(p, kind))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "key": pdf[key_col].astype("int64"),
                "phash": pd.Series(
                    [fn(_payload_bytes(p)) for p in pdf[payload_col]],
                    dtype="Int64"),
            })

    return df.mapInPandas(run, PHASH_SCHEMA)


def video_phash(df: DataFrame, payload_col: str = "payload",
                key_col: str = "key", kind: str = "ahash",
                max_frames: int = 8,
                hash_fn: Callable[[bytes], int | None] | None = None,
                ) -> DataFrame:
    """(key, phash): per-VIDEO perceptual signature — evenly-sampled
    frames (REAL for MJPEG in AVI/MP4/WebM) are perceptual-hashed, then
    each of the 64 bits takes the MAJORITY vote across the clip's
    decodable frames, so a few edited/corrupt frames cannot move the
    clip signature. The vote uses the simhash SIMD-in-a-register lane
    packing (16 packed sums instead of 64) and runs entirely JVM-side;
    Python computes only the per-frame 8-byte hashes. Clips with zero
    decodable frames keep a row with NULL phash (unhashable matches
    nothing); ties break to 0, deterministically."""
    frames = sample_frames(df, payload_col=payload_col, key_col=key_col,
                           max_frames=max_frames)
    fp = image_phash(frames, payload_col="frame_bytes", key_col="key",
                     kind=kind, hash_fn=hash_fn) \
        .filter(F.col("phash").isNotNull())
    lane = 0x0001000100010001
    votes = fp.groupBy("key").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(F.shiftrightunsigned("phash", j)
                .bitwiseAND(F.lit(lane))).alias(f"_l{j}")
          for j in range(16)],
    )
    sig = None
    for j in range(16):
        for ln in range(4):
            i = j + 16 * ln
            cnt = F.shiftrightunsigned(F.col(f"_l{j}"), 16 * ln) \
                .bitwiseAND(F.lit(0xFFFF))
            bit = F.when(cnt * 2 > F.col("_n"),
                         F.shiftleft(F.lit(1).cast("long"), i)) \
                .otherwise(F.lit(0).cast("long"))
            sig = bit if sig is None else sig.bitwiseOR(bit)
    out = votes.select("key", sig.alias("phash"))
    keys = df.select(F.col(key_col).alias("key")).distinct()
    return keys.join(out, "key", "left")


def video_neardup_pairs(df: DataFrame, max_hamming: int = 8,
                        payload_col: str = "payload", key_col: str = "key",
                        kind: str = "ahash", max_frames: int = 8,
                        max_bucket_size: int = 500,
                        hash_fn: Callable[[bytes], int | None] | None = None,
                        ) -> DataFrame:
    """Near-duplicate VIDEO pairs (key_a, key_b, hamming): re-encoded /
    lightly-edited clip copies, via :func:`video_phash` majority
    signatures through ``dedup.hamming_pairs`` — the same banding, star
    cap, and codegen bit_count as text simhash, image, and audio
    near-dup. One scale contract across all four modalities."""
    from datafusion_substrait_spark.operators.dedup import hamming_pairs

    sigs = video_phash(df, payload_col=payload_col, key_col=key_col,
                       kind=kind, max_frames=max_frames, hash_fn=hash_fn)
    return hamming_pairs(sigs, key_col="key", sig_col="phash",
                         max_hamming=max_hamming,
                         max_bucket_size=max_bucket_size,
                         out_prefix="key")


def image_neardup_pairs(df: DataFrame, max_hamming: int = 8,
                        payload_col: str = "payload", key_col: str = "key",
                        kind: str = "ahash", max_bucket_size: int = 500,
                        hash_fn: Callable[[bytes], int | None] | None = None,
                        ) -> DataFrame:
    """Near-duplicate IMAGE pairs: (key_a, key_b, hamming) with
    ``hamming ≤ max_hamming`` over 64-bit perceptual hashes — visual
    dedup for a multimodal corpus (re-encoded, slightly-noised, or
    brightness-shifted copies that byte-level exact dedup cannot see).

    The Python seam computes only the 8-byte hash per image; candidate
    generation and verify run entirely JVM-side through
    :func:`dedup.hamming_pairs` — the SAME 4×16-bit banding, hot-bucket
    star cap, and codegen bit_count verify as text simhash, so the scale
    contract (never all-pairs, bounded hot buckets, pigeonhole recall
    for Hamming ≤ 3) is shared machinery, not a parallel implementation.
    """
    from datafusion_substrait_spark.operators.dedup import hamming_pairs

    sigs = image_phash(df, payload_col=payload_col, key_col=key_col,
                       kind=kind, hash_fn=hash_fn)
    return hamming_pairs(sigs, key_col="key", sig_col="phash",
                         max_hamming=max_hamming,
                         max_bucket_size=max_bucket_size,
                         out_prefix="key")


def extract_features(df: DataFrame, dim: int = 64,
                     payload_col: str = "payload", key_col: str = "key",
                     feature_fn: Callable[[bytes, int], list[float]] | None = None,
                     ) -> DataFrame:
    """Feature-extraction plumbing: one ``array<float>`` embedding per
    payload, Arrow-batched, schema-compatible with the ``embeddings`` table
    operators (``similarity.brute_force_topk`` etc. consume the output
    as-is). The default is REAL for decodable images (classical pooled-
    intensity/histogram/gradient features — see ``image_features``); a
    learned-model encoder drops in via ``feature_fn``; undecodable
    payloads get the marked hash fake so the pipeline shape still runs.
    Batching, schema, and the narrow-map plan shape are the 100 TB design.
    """
    feats = feature_fn or _default_features

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "key": pdf[key_col].astype("int64"),
                "features": [feats(_payload_bytes(p), dim) for p in pdf[payload_col]],
            })

    return df.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_FEATURES_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("pixels", T.BinaryType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def resize_and_features(df: DataFrame, width: int = 64, height: int = 64,
                        dim: int = 64, payload_col: str = "payload",
                        key_col: str = "key") -> DataFrame:
    """Fused resize + feature extraction: ONE image decode per payload.

    ``resize_images`` and ``extract_features`` are independent lineages —
    composing them over the same image column decodes every payload
    TWICE (the container inflate dominates; caching the encoded bytes
    between the two branches does not help, it caches the compressed
    form). This pass decodes once, grayscales once, and emits the
    resized pixel buffer and the feature vector together from the shared
    luma plane — bit-identical to the unfused operators (both reuse the
    same post-decode bodies, ``_resize_from_gray`` /
    ``_features_from_gray``), at roughly half the codec cost and with no
    persist/unpersist lifecycle for the caller to manage.

    Same scale shape as the parents: Arrow-batched ``mapInPandas``
    narrow map, no shuffle, per-payload error capture (undecodable or
    corrupt blobs take the marked deterministic fakes — exactly the
    fallbacks the unfused seams take)."""

    def both(p: bytes):
        return _resize_features_from_payload(p, width, height, dim)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            pairs = [both(_payload_bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "key": pdf[key_col].astype("int64"),
                "width": pd.Series([width] * len(pdf), dtype="int32"),
                "height": pd.Series([height] * len(pdf), dtype="int32"),
                "pixels": [px for px, _ in pairs],
                "features": [ft for _, ft in pairs],
            })

    return df.mapInPandas(run, RESIZED_FEATURES_SCHEMA)


def _resize_features_from_payload(p: bytes, width: int, height: int,
                                  dim: int):
    """The fused decode→gray→(resize, features) body shared by
    :func:`resize_and_features` and :func:`synthetic_image_meta_features`
    — one decode per payload, per-payload error capture, the same
    deterministic fakes the unfused seams take."""
    try:
        img = decode_image(p)
    except ValueError:
        img = None
    if img is None:
        return _fake_resize(p, width, height), _fake_features(p, dim)
    gray = _to_gray(img)
    return (_resize_from_gray(gray, width, height),
            _features_from_gray(gray, dim))


M1_FUSED_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("payload_sha256", T.StringType()),
    T.StructField("pixels", T.BinaryType()),
    T.StructField("features", T.ArrayType(T.FloatType())),
])


def synthetic_image_meta_features(df: DataFrame, width: int = 64,
                                  height: int = 64, dim: int = 64,
                                  text_col: str = "text",
                                  key_col: str = "doc_id") -> DataFrame:
    """m1's fused pass (r18, guide §4 + §2.4): binary-payload metadata,
    synthetic-PNG encode, decode→gray→resize and feature extraction in
    ONE Arrow-batched ``mapInPandas`` over the documents scan.

    Composition it replaces:
    ``extract_image_metadata(attach_binary_payload(docs))`` joined on key
    with ``resize_and_features(attach_synthetic_image_payload(docs))`` —
    three Python stages, two scans of the corpus, and a join whose
    exchange shuffles (or broadcasts) every row at corpus scale, carrying
    nothing the row didn't already have. Both legs are pure functions of
    (key, text), so the fusion is a narrow map: one scan, one Python
    worker hop, zero Exchange.

    Bit-identity by construction: the metadata columns run the SAME
    bodies ``extract_image_metadata`` uses (``_default_decode`` /
    ``_payload_bytes`` / sha256 over the UTF-8 text bytes that
    ``attach_binary_payload`` emits), and the pixel/feature columns run
    ``_synthetic_png_from_text`` + ``_resize_features_from_payload`` —
    the exact bodies of the unfused operators, which remain shipped
    seams (real-blob corpora, av1-adjacent flows, tests/fuzz) for
    payloads that are not text-derived."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            # NULL text: the metadata leg mirrors attach_binary_payload
            # (F.encode(NULL) -> NULL payload -> _payload_bytes -> b""),
            # while the pixel leg mirrors _synthetic_png_from_text's
            # str() coercion — each leg keeps its unfused convention
            payloads = [b"" if t is None else str(t).encode("utf-8")
                        for t in pdf[text_col]]
            metas = [_default_decode(p) for p in payloads]
            pairs = [
                _resize_features_from_payload(
                    _synthetic_png_from_text(t), width, height, dim)
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({
                "key": pdf[key_col].astype("int64"),
                "n_bytes": pd.Series([len(p) for p in payloads],
                                     dtype="int64"),
                "format": [m[0] for m in metas],
                "width": pd.Series([m[1] for m in metas], dtype="int32"),
                "height": pd.Series([m[2] for m in metas], dtype="int32"),
                "payload_sha256": [hashlib.sha256(p).hexdigest()
                                   for p in payloads],
                "pixels": [px for px, _ in pairs],
                "features": [ft for _, ft in pairs],
            })

    return df.select(key_col, text_col).mapInPandas(run, M1_FUSED_SCHEMA)


def video_features(df: DataFrame, dim: int = 64, max_frames: int = 8,
                   payload_col: str = "payload", key_col: str = "key",
                   feature_fn: Callable[[bytes, int], list[float]] | None = None,
                   ) -> DataFrame:
    """Per-VIDEO embedding by composing the existing stages: sample
    frames (REAL for MJPEG in AVI/MP4/WebM, stand-in otherwise) →
    per-frame image features (real classical-CV for decodable frames, or
    a model encoder via ``feature_fn``) → element-wise mean pool over the
    video's frames, re-unit-normalized. Output (key, n_frames, features)
    is schema-compatible with the ``embeddings`` consumers, so video
    near-dup/ANN is ``video_features`` piped into ``similarity.*`` /
    ``dedup.embedding_neardup_pairs``.

    Scale shape: two narrow Arrow-batched maps plus ONE shuffle on the
    video key whose groups are bounded by ``max_frames`` rows — the
    pooling runs as codegen array expressions over the collected frame
    vectors (zip_with fold), never Python.

    r17 (guide §4 — the quantize/cell-score staging pattern): the mean
    and its norm are materialized once per group in their own Projects.
    The previous single-agg spelling referenced ``nrm`` (and through it
    the whole frames fold) from INSIDE the unit-normalize lambda, so the
    interpreted evaluator recomputed the fold per OUTPUT ELEMENT —
    ~dim²·(frames+2) steps per video instead of ~dim·frames. Identical
    arithmetic per element → bit-identical output (the determinism test
    re-pins values across partitionings)."""
    frames = sample_frames(df, payload_col=payload_col, key_col=key_col,
                           max_frames=max_frames)
    ff = extract_features(frames, dim=dim, payload_col="frame_bytes",
                          key_col="key", feature_fn=feature_fn)
    zeros = F.array_repeat(F.lit(0.0), dim)
    fs = F.collect_list("features")
    summed = F.aggregate(
        fs, zeros,
        lambda acc, x: F.zip_with(acc, x,
                                  lambda p, q: p + q.cast("double")))
    agged = ff.groupBy("key").agg(
        F.size(fs).cast("int").alias("n_frames"),
        summed.alias("__summed"))
    mean = F.transform(F.col("__summed"),
                       lambda v: v / F.col("n_frames"))
    staged = agged.select("key", "n_frames", mean.alias("__mean"))
    nrm = F.sqrt(F.aggregate(F.col("__mean"), F.lit(0.0),
                             lambda acc, x: acc + x * x))
    staged = staged.select("key", "n_frames", F.col("__mean"),
                           nrm.alias("__nrm"))
    unit = F.transform(
        F.col("__mean"),
        lambda x: F.when(F.col("__nrm") > 0,
                         x / F.col("__nrm")).otherwise(x).cast("float"))
    return staged.select("key", "n_frames", unit.alias("features"))
