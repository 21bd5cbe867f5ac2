"""Audio column plumbing: opaque ``binary`` payloads + typed metadata.

Mirrors ``multimodal.py``'s image design (reference parity: the reference
engine has no audio operators — this is part of the beyond-reference
training-data-pipeline surface). Everything here is REAL for the formats
whose containers need no codec library:

* WAV/RIFF — full metadata AND full PCM sample decode (8-bit unsigned,
  16/24/32-bit signed, 32/64-bit float) via ``struct``+numpy;
* FLAC — metadata from the mandatory STREAMINFO block (sample rate,
  channels, bit depth, total samples are bit-packed in its first 18
  bytes); sample decode would need the FLAC entropy coder → seam;
* MP3 (MPEG-1/2 Layer III) — metadata from the first frame header
  (version/layer/bitrate/samplerate tables are fixed by the spec);
  duration is estimated from byte length at the first frame's bitrate
  (exact for CBR, approximate for VBR — documented in the schema field
  name ``est_duration_s``);
* Ogg Opus/Vorbis — codec identity and channels/rate from the first
  page's fixed-layout header, total samples (→ measured duration) from
  the last page's granule position via a length-checked forward page
  walk; sample decode needs the codec → seam.

Payloads that are none of these fall back to a clearly-marked
deterministic fake (synthesized PCM from the payload hash) so the
pipeline shape runs end-to-end on synthetic blobs; pass ``decode_fn``
(e.g. librosa/soundfile-backed) to replace the seam wholesale.

Scale notes (same contract as the image operators):
* payloads stay in executor-side Arrow batches — never collected;
* metadata extraction and feature extraction are narrow maps (no
  shuffle); framing multiplies rows by ``n_frames`` but emits compact
  numeric rows, not audio;
* lower ``spark.sql.files.maxPartitionBytes`` (e.g. 32 MB) for tables of
  multi-MB audio blobs so a partition holds a bounded number of payloads.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

AUDIO_META_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("format", T.StringType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("bits_per_sample", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("est_duration_s", T.DoubleType()),
    T.StructField("payload_sha256", T.StringType()),
])

AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("key", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zcr", T.DoubleType()),
])

# MPEG audio frame-header tables (ISO/IEC 11172-3 / 13818-3): kbit/s by
# (version, layer) and Hz by version, indexed by the header's 4-/2-bit
# fields. 0 entries are reserved/invalid.
_MP3_BITRATES_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                       224, 256, 320, 0)
_MP3_BITRATES_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                       144, 160, 0)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}  # version bits: 3=MPEG1 2=MPEG2 0=2.5


def parse_audio_header(data: bytes):
    """(format, channels, sample_rate, bits_per_sample, n_samples) from
    container headers — real parsing, no codec library. ``n_samples`` is
    per-channel frames; -1 when the container does not store it (MP3).
    Returns None for anything that is not a recognized audio container."""
    full = _parse_audio_full(data)
    return None if full is None else full[:5]


def _parse_audio_full(data: bytes):
    """parse_audio_header plus a trailing kbps field (MP3 only, else
    None) so callers that need the bitrate don't rescan the payload."""
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        meta = _parse_wav_chunks(data)
        if meta is None:
            return None
        fmt_tag, channels, rate, bits, data_len = meta
        block = channels * (bits // 8)
        return ("wav", channels, rate, bits,
                data_len // block if block else 0, None)
    if len(data) >= 26 and data[:4] == b"fLaC":
        # STREAMINFO is the mandatory first metadata block: header byte
        # (type 0), 3-byte length, then min/max blocksize (4B), min/max
        # framesize (6B), and a 64-bit packed field at offset 18:
        # 20b sample rate | 3b channels-1 | 5b bits-1 | 36b total samples
        # (>= 26 so the full packed field exists — a shorter slice would
        # silently parse shifted garbage)
        if data[4] & 0x7F != 0:
            return None
        packed = int.from_bytes(data[18:26], "big")
        rate = packed >> 44
        channels = ((packed >> 41) & 0x7) + 1
        bits = ((packed >> 36) & 0x1F) + 1
        n_samples = packed & ((1 << 36) - 1)
        if rate == 0:
            return None
        return ("flac", channels, rate, bits, n_samples, None)
    if len(data) >= 28 and data[:4] == b"OggS":
        return _parse_ogg(data)
    sync = _find_mp3_frame(data)
    if sync is not None:
        kbps, rate, channels = sync
        return ("mp3", channels, rate, -1, -1, kbps)
    return None


def _parse_ogg(data: bytes):
    """Ogg container: the first page's payload identifies the codec
    (OpusHead / Vorbis identification header — both fixed layouts), and
    the LAST page's granule position gives the total sample count, so
    duration is real, not estimated. Returns the _parse_audio_full
    6-tuple or None."""
    n_seg = data[26]
    payload_at = 27 + n_seg
    if payload_at + 16 > len(data):
        return None
    payload = data[payload_at:payload_at + 64]

    def last_granule():
        # FORWARD page walk using the spec'd page lengths (27 + n_seg +
        # sum(segment table)) — a bare rfind(b"OggS") would misread the
        # capture pattern occurring INSIDE compressed packet data (which
        # the Ogg spec explicitly permits) as a page header and return a
        # garbage granule. Truncation mid-walk keeps the last good page.
        pos, g = 0, -1
        while pos + 27 <= len(data):
            if data[pos:pos + 4] != b"OggS" or data[pos + 4] != 0:
                break
            nseg = data[pos + 26]
            if pos + 27 + nseg > len(data):
                break
            body = sum(data[pos + 27:pos + 27 + nseg])
            page_g = struct.unpack("<q", data[pos + 6:pos + 14])[0]
            if page_g >= 0:
                g = page_g
            pos += 27 + nseg + body
        return g

    if payload[:8] == b"OpusHead" and len(payload) >= 19:
        channels = payload[9]
        if channels == 0:  # RFC 7845 requires >= 1; corrupt head -> fake
            return None
        pre_skip = struct.unpack("<H", payload[10:12])[0]
        # granules are ALWAYS 48 kHz for Opus regardless of the input
        # sample rate stored in the head (RFC 7845 §4)
        g = last_granule()
        n = max(0, g - pre_skip) if g >= 0 else -1
        return ("opus", channels, 48000, -1, n, None)
    if payload[:7] == b"\x01vorbis" and len(payload) >= 16:
        channels = payload[11]
        rate = struct.unpack("<I", payload[12:16])[0]
        if rate == 0 or channels == 0:
            return None
        return ("vorbis", channels, rate, -1, last_granule(), None)
    return None


def _parse_wav_chunks(data: bytes):
    """Walk RIFF chunks for fmt + data. Returns (fmt_tag, channels, rate,
    bits, data_byte_len) or None. Chunks are word-aligned (odd sizes pad
    one byte); a 'data' size of 0xFFFFFFFF or past-EOF clamps to the
    actual payload (streaming writers leave it unset)."""
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body_at = pos + 8
        if tag == b"fmt " and size >= 16 and body_at + 16 <= len(data):
            fmt_tag, channels, rate, _bps, _align, bits = struct.unpack(
                "<HHIIHH", data[body_at:body_at + 16])
            fmt = (fmt_tag, channels, rate, bits)
        elif tag == b"data":
            data_len = min(size, len(data) - body_at)
            if fmt is not None:
                break
        pos = body_at + size + (size & 1)
    if fmt is None or data_len is None:
        return None
    fmt_tag, channels, rate, bits = fmt
    if channels == 0 or rate == 0 or bits == 0:
        return None
    return fmt_tag, channels, rate, bits, data_len


def _find_mp3_frame(data: bytes, scan_limit: int = 4096):
    """First MPEG Layer-III frame header within ``scan_limit`` bytes
    (skipping an ID3v2 tag if present). Returns (kbps, hz, channels) or
    None. Requires a VALID header: sync + known version/layer + non-
    reserved bitrate/samplerate — random text virtually never matches."""
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        # syncsafe 28-bit tag size
        size = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14
                | (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
        pos = 10 + size
    end = min(len(data) - 4, pos + scan_limit)
    while pos <= end:
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            version = (data[pos + 1] >> 3) & 0x3
            layer = (data[pos + 1] >> 1) & 0x3
            if version != 1 and layer == 1:  # layer III only, not reserved
                br_idx = data[pos + 2] >> 4
                sr_idx = (data[pos + 2] >> 2) & 0x3
                if sr_idx != 3:
                    table = (_MP3_BITRATES_V1_L3 if version == 3
                             else _MP3_BITRATES_V2_L3)
                    kbps = table[br_idx]
                    if kbps:
                        hz = _MP3_RATES[version][sr_idx]
                        channels = 1 if (data[pos + 3] >> 6) == 3 else 2
                        return kbps, hz, channels
        pos += 1
    return None


def decode_wav(data: bytes):
    """REAL WAV decode — ``struct`` + numpy only. Returns
    ``(samples, sample_rate)`` with samples float32 shaped
    ``(n_frames, channels)`` scaled to [-1, 1]. Supports PCM (format 1:
    8-bit unsigned, 16/24/32-bit signed LE) and IEEE float (format 3:
    float32/float64). Other codecs (ADPCM, a-law...) raise ValueError —
    supply a library ``decode_fn`` for those."""
    import numpy as np

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    meta = _parse_wav_chunks(data)
    if meta is None:
        raise ValueError("WAV missing fmt or data chunk")
    fmt_tag, channels, rate, bits, data_len = meta
    # find the data chunk body again (cheap second walk, payloads are
    # already in memory)
    pos = 12
    body = None
    while pos + 8 <= len(data):
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if data[pos:pos + 4] == b"data":
            body = data[pos + 8:pos + 8 + data_len]
            break
        pos += 8 + size + (size & 1)
    if body is None:
        raise ValueError("WAV missing data chunk")
    if fmt_tag == 1:
        if bits == 8:
            arr = (np.frombuffer(body, np.uint8).astype(np.float32)
                   - 128.0) / 128.0
        elif bits == 16:
            arr = np.frombuffer(
                body[: len(body) & ~1], "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            usable = len(body) - len(body) % 3
            b3 = np.frombuffer(body[:usable], np.uint8).reshape(-1, 3)
            vals = (b3[:, 0].astype(np.int32)
                    | b3[:, 1].astype(np.int32) << 8
                    | b3[:, 2].astype(np.int32) << 16)
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            arr = vals.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            arr = np.frombuffer(
                body[: len(body) & ~3], "<i4").astype(np.float32) / float(1 << 31)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif fmt_tag == 3:
        if bits == 32:
            arr = np.frombuffer(body[: len(body) & ~3], "<f4").astype(np.float32)
        elif bits == 64:
            arr = np.frombuffer(body[: len(body) & ~7], "<f8").astype(np.float32)
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAV codec (format tag {fmt_tag})")
    n = len(arr) - len(arr) % channels
    return arr[:n].reshape(-1, channels), rate


def decode_audio(payload: bytes):
    """PCM decode for recognized containers: ``(samples, rate)`` for WAV,
    ``None`` for everything else (FLAC/MP3 sample decode needs a codec
    library; callers fall back to the marked fake or a supplied
    ``decode_fn``)."""
    if len(payload) >= 12 and payload[:4] == b"RIFF" \
            and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    return None


def _fake_pcm(payload: bytes, n: int = 4096, rate: int = 16000):
    """DETERMINISTIC FAKE mono PCM (no codec libs in this container):
    float32 samples from a keyed sha256 stream — content-dependent,
    partition-independent. A real ``decode_fn`` drops in at the seam."""
    import numpy as np

    raw = bytearray()
    counter = 0
    while len(raw) < n:
        raw += hashlib.sha256(payload + counter.to_bytes(4, "big")).digest()
        counter += 1
    samples = (np.frombuffer(bytes(raw[:n]), np.uint8).astype(np.float32)
               - 127.5) / 127.5
    return samples.reshape(-1, 1), rate


def _fake_audio_meta(payload: bytes):
    """DETERMINISTIC FAKE metadata for unrecognized payloads, keyed off
    the payload hash (same contract as the image _fake_decode)."""
    h = hashlib.sha256(payload).digest()
    fmt = ("mp3", "wav", "flac")[h[0] % 3]
    rate = (8000, 16000, 22050, 44100)[h[1] % 4]
    channels = 1 + h[2] % 2
    n_samples = 1024 + int.from_bytes(h[3:5], "big")
    return fmt, channels, rate, 16, n_samples


def extract_audio_metadata(df: DataFrame, payload_col: str = "payload",
                           key_col: str = "key") -> DataFrame:
    """Arrow-batched audio metadata extraction: REAL for WAV/FLAC/MP3 and
    Ogg Opus/Vorbis headers, marked fake otherwise. Narrow map, no
    shuffle; the payload bytes never leave the executor."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                data = b"" if payload is None else bytes(payload)
                parsed = _parse_audio_full(data)
                if parsed is None:
                    fmt, ch, rate, bits, n = _fake_audio_meta(data)
                    kbps = None
                else:
                    fmt, ch, rate, bits, n, kbps = parsed
                if n >= 0:
                    dur = n / rate
                elif kbps:
                    # CBR estimate; approximate for VBR (field is named
                    # est_duration_s for exactly this reason)
                    dur = len(data) * 8.0 / (kbps * 1000.0)
                else:
                    dur = 0.0
                rows.append((int(key), len(data), fmt, ch, rate, bits, n,
                             dur, hashlib.sha256(data).hexdigest()))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_META_SCHEMA])

    return df.mapInPandas(extract, AUDIO_META_SCHEMA)


def audio_features(df: DataFrame, frame: int = 1024, hop: int = 512,
                   payload_col: str = "payload", key_col: str = "key",
                   decode_fn: Callable | None = None) -> DataFrame:
    """Per-frame RMS energy + zero-crossing rate over decoded PCM
    (channel-averaged), the two classic cheap features for silence/noise
    filtering of a training corpus. REAL for WAV payloads; unrecognized
    payloads go through the marked fake PCM so the pipeline shape is
    exercisable. Frames are [i*hop, i*hop+frame) windows over the mono
    mix; the tail window short of ``frame`` samples is dropped (standard
    framing, avoids a partial-window bias in the features)."""
    if frame <= 0 or hop <= 0:
        raise ValueError("frame and hop must be positive")
    decode = decode_fn or (
        lambda p: decode_audio(p) or _fake_pcm(p))

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            keys, idxs, rms_v, zcr_v = [], [], [], []
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                data = b"" if payload is None else bytes(payload)
                try:
                    samples, _rate = decode(data)
                except ValueError:
                    # corrupt-but-recognized container: fake, don't kill
                    # the stage (same policy as the image resize seam)
                    samples, _rate = _fake_pcm(data)
                mono = samples.mean(axis=1)
                n_frames = (len(mono) - frame) // hop + 1 if len(mono) >= frame else 0
                for i in range(n_frames):
                    win = mono[i * hop:i * hop + frame]
                    keys.append(int(key))
                    idxs.append(i)
                    rms_v.append(float(np.sqrt(np.mean(win * win))))
                    zcr_v.append(float(np.mean(
                        np.signbit(win[1:]) != np.signbit(win[:-1]))))
            yield pd.DataFrame({
                "key": pd.Series(keys, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "rms": pd.Series(rms_v, dtype="float64"),
                "zcr": pd.Series(zcr_v, dtype="float64"),
            })

    return df.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def audio_embedding(df: DataFrame, frame: int = 1024, hop: int = 512,
                    payload_col: str = "payload", key_col: str = "key",
                    decode_fn: Callable | None = None) -> DataFrame:
    """Per-CLIP embedding from the windowed features — the audio analog
    of ``multimodal.video_features``: statistical pooling of the frame
    RMS/ZCR series into a small fixed vector [mean/std/max of RMS,
    mean/std of ZCR, log frame count], unit-normalized. Output
    (key, n_frames, features) feeds the ``similarity.*`` consumers, so
    audio near-dup / clustering composes the same way video does.

    Clips with zero full frames (shorter than ``frame`` samples) emit
    n_frames = 0 and the canonical first basis vector — same degenerate-
    vector convention as ``multimodal.image_features``. Pooling is
    codegen aggregates after the Arrow-batched feature map; one shuffle
    on the clip key."""
    from pyspark.sql import functions as F

    feats = audio_features(df, frame=frame, hop=hop,
                           payload_col=payload_col, key_col=key_col,
                           decode_fn=decode_fn)
    pooled = feats.groupBy("key").agg(
        F.count(F.lit(1)).cast("int").alias("n_frames"),
        F.avg("rms").alias("_m_rms"),
        F.coalesce(F.stddev_pop("rms"), F.lit(0.0)).alias("_s_rms"),
        F.max("rms").alias("_x_rms"),
        F.avg("zcr").alias("_m_zcr"),
        F.coalesce(F.stddev_pop("zcr"), F.lit(0.0)).alias("_s_zcr"),
    )
    # clips with no frames never appear in feats: re-attach them so the
    # operator is total over its input (left join keeps every clip)
    keys = df.select(F.col(key_col).alias("key")).distinct()
    pooled = keys.join(pooled, "key", "left")
    # r17 (guide §4 — the quantize/cell-score staging pattern): the raw
    # vector and its norm are materialized once per row in their own
    # Projects. The single-select spelling referenced ``nrm`` (and
    # through it the 6-step fold over ``raw``) from inside the
    # unit-normalize lambda AND the degenerate-vector guard, so the
    # interpreted evaluator re-ran the fold per output element. Identical
    # arithmetic per element → bit-identical output (the determinism
    # test re-pins values across partitionings).
    raw = F.array(
        F.col("_m_rms"), F.col("_s_rms"), F.col("_x_rms"),
        F.col("_m_zcr"), F.col("_s_zcr"),
        F.log1p(F.coalesce(F.col("n_frames"), F.lit(0)).cast("double")))
    staged = pooled.select(
        "key", F.col("n_frames").alias("__nf"), raw.alias("__raw"))
    staged = staged.select(
        "key", "__nf", "__raw",
        F.sqrt(F.aggregate(F.col("__raw"), F.lit(0.0),
                           lambda a, x: a + x * x)).alias("__nrm"))
    unit = F.transform(F.col("__raw"),
                       lambda x: (x / F.col("__nrm")).cast("float"))
    basis = F.array(F.lit(1.0).cast("float"),
                    *[F.lit(0.0).cast("float")] * 5)
    return staged.select(
        "key",
        F.coalesce(F.col("__nf"), F.lit(0)).alias("n_frames"),
        F.when(F.col("__nf").isNull() | (F.col("__nrm") <= 0), basis)
        .otherwise(unit).alias("features"),
    )


def audio_fingerprint(payload: bytes, n_time: int = 8, n_bands: int = 8,
                      decode_fn: Callable | None = None) -> int | None:
    """64-bit spectral fingerprint over decoded PCM (None when the
    payload cannot be decoded or is shorter than ``2·n_time·n_bands``
    samples — an unhashable clip matches nothing).

    The Chromaprint-style shape without the model: mono mix → ``n_time``
    equal time slices → per-slice rFFT log band energies (``n_bands``
    contiguous bands, DC excluded) → bit ``i·n_bands+j`` set iff band j
    outranks the SEGMENT's mean log-energy (the ahash trick along
    frequency — comparing against the mean gives tonal content large
    margins, where adjacent-band dhash bits sit at the noise floor's
    razor edge for sparse spectra). Adding a constant gain shifts every
    log energy and the mean equally, so the fingerprint is EXACTLY
    re-leveling-invariant up to sample quantization; light noise flips
    only razor-margin bits, which :func:`audio_neardup_pairs`' Hamming
    radius absorbs. Wrapped to a signed 64-bit int (Spark LongType)."""
    import numpy as np

    if (n_time, n_bands) != (8, 8):
        raise ValueError("the 64-bit layout requires n_time=8, n_bands=8")
    decode = decode_fn or decode_audio
    try:
        out = decode(payload)
    except ValueError:
        return None
    if out is None:
        return None
    samples, _rate = out
    mono = samples.mean(axis=1) if samples.ndim > 1 else samples
    if len(mono) < 2 * n_time * n_bands:
        return None
    v = 0
    n = len(mono)
    for i in range(n_time):
        seg = mono[i * n // n_time:(i + 1) * n // n_time]
        spec = np.abs(np.fft.rfft(seg))[1:]  # drop DC: level, not timbre
        bands = np.array_split(spec, n_bands)
        loge = np.log(np.array(
            [float(np.sum(b * b)) for b in bands]) + 1e-20)
        mean = float(loge.mean())
        for j in range(n_bands):
            if loge[j] > mean:
                v |= 1 << (i * n_bands + j)
    return v - (1 << 64) if v >= (1 << 63) else v


def _encode_pcm16_wav(samples, rate: int = 8000) -> bytes:
    """Minimal REAL 16-bit mono PCM WAV encoder (RIFF/WAVE, fmt + data)
    for synthesizing decodable driver payloads — counterpart of
    :func:`decode_wav`, kept independent of the decoder's internals."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def attach_synthetic_audio_payload(df: DataFrame, text_col: str = "text",
                                   key_col: str = "doc_id") -> DataFrame:
    """DETERMINISTIC, driver-replayable AUDIO payloads: a real 1024-sample
    16-bit mono WAV per row — segment i (128 samples) carries one
    exact-bin tone at rFFT bin ``8·(digest[i] % 8) + 4`` of sha256(text),
    the CENTER bin of spectral band ``digest[i] % 8``. Decoding runs the
    REAL WAV→PCM→rFFT fingerprint stack (:func:`audio_fingerprint`)
    while the output stays closed-form: an integer-cycle tone puts all
    signal energy in its own band (quantization noise sits ~40 dB down
    and spreads evenly, so only the tone band outranks the segment's
    mean log-energy) — fingerprint bit ``8·i + digest[i] % 8`` set,
    exactly 8 bits total, replayable by DuckDB from the digest hex."""
    import numpy as np

    t = np.arange(128)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def build(text) -> bytes:
            digest = hashlib.sha256(str(text).encode("utf-8")).digest()
            segs = [np.round(np.sin(2 * np.pi * (8 * (digest[i] % 8) + 4)
                                    * t / 128) * 16384).astype(np.int64)
                    for i in range(8)]
            return _encode_pcm16_wav(np.concatenate(segs))

        for pdf in batches:
            yield pd.DataFrame({
                "key": pdf[key_col].astype("int64"),
                "payload": [build(x) for x in pdf[text_col]],
            })

    from datafusion_substrait_spark.operators.multimodal import \
        BINARY_PAYLOAD_SCHEMA

    return df.mapInPandas(run, BINARY_PAYLOAD_SCHEMA)


AUDIO_PHASH_SCHEMA = "key bigint, phash bigint"


def audio_phash(df: DataFrame, payload_col: str = "payload",
                key_col: str = "key",
                hash_fn: Callable | None = None) -> DataFrame:
    """(key, phash): spectral fingerprints for a binary audio column —
    Arrow-batched narrow map, NULL for undecodable/too-short clips
    (per-payload error capture). Swap in a library fingerprinter
    (e.g. chromaprint) via ``hash_fn`` at the same seam."""
    fn = hash_fn or audio_fingerprint

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({
                "key": pdf[key_col].astype("int64"),
                "phash": pd.Series(
                    [fn(b"" if p is None else bytes(p))
                     for p in pdf[payload_col]],
                    dtype="Int64"),
            })

    return df.mapInPandas(run, AUDIO_PHASH_SCHEMA)


def audio_neardup_pairs(df: DataFrame, max_hamming: int = 6,
                        payload_col: str = "payload", key_col: str = "key",
                        max_bucket_size: int = 500,
                        hash_fn: Callable | None = None) -> DataFrame:
    """Near-duplicate AUDIO pairs (key_a, key_b, hamming): re-leveled /
    re-encoded / lightly-noised copies of a clip that byte-exact dedup
    cannot see. The Python seam computes only the 8-byte fingerprint;
    candidates and verify run JVM-side through ``dedup.hamming_pairs`` —
    the same banding, star cap, and codegen bit_count as text simhash
    and image near-dup (shared machinery, one scale contract)."""
    from datafusion_substrait_spark.operators.dedup import hamming_pairs

    sigs = audio_phash(df, payload_col=payload_col, key_col=key_col,
                       hash_fn=hash_fn)
    return hamming_pairs(sigs, key_col="key", sig_col="phash",
                         max_hamming=max_hamming,
                         max_bucket_size=max_bucket_size,
                         out_prefix="key")
