"""Codec-robustness fuzz: the corrupt-blob contract, property-tested.

The resize/feature/audio seams catch exactly ``ValueError`` so that one
bad payload can never kill a 100 TB stage — which makes ANY other
exception type escaping a decoder a stage-killer bug (two were found by
review: struct.error from JPEG, zlib.error from PNG). This suite mutates
valid fixtures (truncation, bit flips, splices) and feeds pure noise to
every parser/decoder and asserts the full error contract:

* ``parse_image_header`` / ``parse_audio_header`` / ``parse_video_header``
  NEVER raise — they return a tuple or None;
* ``decode_image`` / ``decode_audio`` either succeed or raise ValueError;
* the default resize/feature seams never raise at all.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from datafusion_substrait_spark.operators import audio, multimodal

# valid seeds for every container, built by the existing test-side encoders
from tests.test_audio import _ogg_page, _pcm16, _wav
from tests.test_jpeg import _encode_jpeg
from tests.test_operators import (_avi_fixture, _encode_bmp, _encode_gif,
                                  _encode_png, _mp4_fixture, _webm_fixture)


def _valid_payloads() -> list[bytes]:
    import struct

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (9, 7), np.uint8)
    rgb = rng.integers(0, 256, (8, 8, 3), np.uint8)
    pal4 = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    opus_head = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 0)
                 + struct.pack("<I", 48000) + struct.pack("<h", 0)
                 + bytes([0]))
    flac_packed = (44100 << 44) | (1 << 41) | (15 << 36) | 4096
    return [
        # .tolist() for Python ints: the test-side encoders do spec
        # modular arithmetic that numpy uint8 scalars would overflow
        _encode_png(img.tolist(), 0, [0, 1, 2, 3, 4, 0, 1, 2, 3]),
        _encode_gif([[v % 4 for v in row] for row in img.tolist()], pal4),
        _encode_bmp([[tuple(int(v) for v in px) for px in row]
                     for row in rgb], 24),
        _encode_jpeg(img, q_val=8),
        _wav(_pcm16([0, 500, -500, 1000] * 8), 1, 1, 8000, 16),
        (b"fLaC" + bytes([0x00, 0, 0, 34]) + b"\x00" * 10
         + flac_packed.to_bytes(8, "big") + b"\x00" * 16),
        bytes([0xFF, 0xFB, 0x90, 0xC0]) + b"\x00" * 128,
        _ogg_page(opus_head, 0, 0, htype=2)
        + _ogg_page(b"\x01" * 12, 48000, 1, htype=4),
        _mp4_fixture(),
        _avi_fixture(),
        _webm_fixture(),
    ]


def _mutations(payload: bytes, rnd: random.Random, n: int):
    yield payload
    for _ in range(n):
        kind = rnd.randrange(4)
        if kind == 0 and len(payload) > 1:  # truncate
            yield payload[: rnd.randrange(1, len(payload))]
        elif kind == 1:  # flip random bytes
            b = bytearray(payload)
            for _ in range(rnd.randrange(1, 6)):
                b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
            yield bytes(b)
        elif kind == 2:  # splice two ranges
            i, j = sorted(rnd.randrange(len(payload)) for _ in range(2))
            yield payload[:i] + payload[j:]
        else:  # append noise
            yield payload + bytes(rnd.randrange(256) for _ in range(8))


def _check_contract(data: bytes) -> None:
    # headers never raise
    for parser in (multimodal.parse_image_header,
                   multimodal.parse_video_header,
                   audio.parse_audio_header):
        out = parser(data)
        assert out is None or isinstance(out, tuple)
    for walker in (multimodal.avi_mjpeg_frames, multimodal.mp4_jpeg_frames,
                   multimodal.webm_mjpeg_frames):
        frames = walker(data)
        assert frames is None or isinstance(frames, list)
    # decoders: success or ValueError, nothing else
    for decoder in (multimodal.decode_image, audio.decode_audio):
        try:
            decoder(data)
        except ValueError:
            pass
    # the seams absorb everything
    assert len(multimodal._default_resize(data, 2, 2)) == 4
    feats = multimodal._default_features(data, 16)
    assert len(feats) == 16
    # perceptual/spectral fingerprints: signed-64 int or None, never raise
    for fp in (multimodal.perceptual_hash(data, "ahash"),
               multimodal.perceptual_hash(data, "dhash"),
               audio.audio_fingerprint(data)):
        assert fp is None or -(1 << 63) <= fp < (1 << 63)


def test_mutated_fixtures_respect_error_contract():
    rnd = random.Random(1337)
    for payload in _valid_payloads():
        for mutant in _mutations(payload, rnd, 40):
            _check_contract(mutant)


def test_advice_mp4_box_layouts_pinned():
    """Fixed fixtures for the r7 ADVICE box layouts the random fuzzer
    cannot construct self-consistently: (a) an mvhd whose version byte
    says v1 but whose body is SHORTER than the 32 bytes the 64-bit
    duration needs — the parser must SKIP it (duration stays 0), never
    read it at v0 offsets; (b) a zero-body (size-8) tkhd — nothing to
    read, must not crash or poison the other track's dimensions
    (guards at multimodal.py parse_video_header)."""
    import struct as s

    def box(tag, body):
        return s.pack(">I", 8 + len(body)) + tag + body

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    tkhd_v0 = (bytes([0, 0, 0, 0]) + b"\x00" * 72
               + s.pack(">II", 640 << 16, 360 << 16))
    mvhd_v0 = (bytes([0, 0, 0, 0]) + b"\x00" * 8
               + s.pack(">II", 1000, 2500) + b"\x00" * 80)

    # (a) mvhd v1 with a 24-byte body: >= the 20-byte entry guard, < the
    # 32 bytes a v1 duration needs. At v0 offsets bytes 12..20 would read
    # as timescale=7, duration=11 — the wrong-dur trap the guard closes.
    mvhd_v1_short = (bytes([1, 0, 0, 0]) + b"\x00" * 8
                     + s.pack(">II", 7, 11) + b"\x00" * 4)
    assert len(mvhd_v1_short) == 24
    mp4 = ftyp + box(b"moov", box(b"mvhd", mvhd_v1_short)
                     + box(b"trak", box(b"tkhd", tkhd_v0)))
    assert multimodal.parse_video_header(mp4) == ("mp4", 640, 360, 0.0, -1)

    # (b) zero-body tkhd next to a real video track
    mp4 = ftyp + box(b"moov", box(b"mvhd", mvhd_v0)
                     + box(b"trak", box(b"tkhd", b""))
                     + box(b"trak", box(b"tkhd", tkhd_v0)))
    assert multimodal.parse_video_header(mp4) == ("mp4", 640, 360, 2.5, -1)
    # and alone: dimensions simply stay 0
    mp4 = ftyp + box(b"moov", box(b"mvhd", mvhd_v0)
                     + box(b"trak", box(b"tkhd", b"")))
    assert multimodal.parse_video_header(mp4) == ("mp4", 0, 0, 2.5, -1)


def test_pure_noise_respects_error_contract():
    rnd = random.Random(99)
    for _ in range(120):
        n = rnd.randrange(0, 400)
        _check_contract(bytes(rnd.randrange(256) for _ in range(n)))
    # adversarial prefixes: every magic number followed by noise
    magics = [b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a", b"BM",
              b"\xff\xd8", b"RIFF", b"fLaC", b"OggS", b"ID3",
              b"\x1a\x45\xdf\xa3", b"\x00\x00\x00\x18ftyp", b"\xff\xfb"]
    for magic in magics:
        for _ in range(25):
            n = rnd.randrange(0, 120)
            _check_contract(magic + bytes(rnd.randrange(256)
                                          for _ in range(n)))
