"""Seeded byte-mutation fuzz over the binary decode/signature surface.

The per-walker fuzz in test_operators.py (``test_*_corrupt_never_raises``)
pins the three VIDEO frame walkers under bit flips. This tier covers the
WHOLE per-payload surface — image/audio decoders, header parsers, frame
walkers, and the signature functions the dedup pipelines call per row —
under a richer mutation grammar: bit flips, truncations, zeroed /
duplicated / deleted ranges, random tails, header-biased edits, and
cross-format grafts (one container's magic in front of another's body —
the shape real crawl corruption takes).

Contract (the 100 TB dirty-corpus closure): for ARBITRARY bytes,

* ``decode_image`` / ``decode_audio`` return a valid result, ``None``, or
  raise ``ValueError`` — NEVER any other exception: the pipelines'
  per-payload ``except ValueError`` (multimodal.py, audio.py) is the only
  guard between one dirty blob and a dead executor task, so an escaped
  ``struct.error`` / ``IndexError`` / ``ZeroDivisionError`` on one payload
  would kill a whole 100 TB stage;
* ``parse_image_header`` / ``parse_audio_header`` / ``parse_video_header``
  and the frame walkers return a value or ``None``, never raise;
* ``perceptual_hash`` / ``audio_fingerprint`` return ``int | None``,
  never raise.

Reproducible sweeps (same pattern as the plan fuzzers):
``SPARK_GRAFT_DECODER_FUZZ_SEEDS=a:b`` (half-open); unset → the in-suite
default band [0, 1500).
"""

from __future__ import annotations

import os
import random

import pytest

from datafusion_substrait_spark.operators import audio, multimodal
from tests.test_audio import _ogg_page, _pcm16, _wav
from tests.test_operators import (_avi_fixture, _encode_bmp, _encode_gif,
                                  _encode_png, _jpeg_bytes,
                                  _mjpeg_avi_fixture, _mjpeg_mp4_fixture,
                                  _mjpeg_webm_fixture, _mp4_fixture,
                                  _webm_fixture)


def _fixtures() -> dict[str, bytes]:
    jb = b"\xff\xd8fakejpegbody\xff\xd9"
    gray = [[(x * 29 + y * 31) % 256 for x in range(8)] for y in range(6)]
    rgb = [[((x * 53) % 256, (y * 97) % 256, (x * y) % 256)
            for x in range(5)] for y in range(4)]
    idx = [[(x + y) % 4 for x in range(7)] for y in range(5)]
    pal = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (200, 210, 220)]
    opus_head = (b"OpusHead" + bytes([1, 2]) + (312).to_bytes(2, "little")
                 + (44100).to_bytes(4, "little") + b"\x00\x00" + bytes([0]))
    packed = (44100 << 44) | ((2 - 1) << 41) | ((16 - 1) << 36) | 123456
    return {
        "png_gray": _encode_png(gray, 0, [0] * len(gray)),
        "png_pal": _encode_png(idx, 3, [0] * len(idx),
                               palette=b"".join(bytes(c) for c in pal)),
        "gif": _encode_gif(idx, pal),
        "bmp": _encode_bmp(rgb, 24),
        "jpeg": _jpeg_bytes(16, 16),
        "wav": _wav(_pcm16(list(range(-128, 128)) * 4), 1, 2, 8000, 16),
        "flac": (b"fLaC" + bytes([0x00, 0, 0, 34]) + b"\x00" * 10
                 + packed.to_bytes(8, "big") + b"\x00" * 16),
        "mp3": bytes([0xFF, 0xFB, 0x90, 0xC0]) + b"\x00" * 400,
        "ogg": (_ogg_page(opus_head, 0, 0, htype=2)
                + _ogg_page(b"\x00" * 10, 96312, 1, htype=4)),
        "avi": _avi_fixture(),
        "mp4": _mp4_fixture(),
        "webm": _webm_fixture(),
        "mjpeg_avi": _mjpeg_avi_fixture([jb, jb]),
        "mjpeg_mp4": _mjpeg_mp4_fixture([jb] * 3),
        "mjpeg_webm": _mjpeg_webm_fixture([jb] * 2),
    }


FIXTURES = _fixtures()
MAGICS = [b"\x89PNG\r\n\x1a\n", b"GIF89a", b"BM", b"\xff\xd8",
          b"RIFF", b"fLaC", b"OggS", b"\x00\x00\x00\x18ftyp",
          b"\x1a\x45\xdf\xa3"]


def _mutate(rnd: random.Random, base: bytes) -> bytes:
    b = bytearray(base)
    for _ in range(rnd.randint(1, 3)):
        op = rnd.randrange(8)
        if op == 0 and b:      # bit flips
            for _ in range(rnd.randint(1, 8)):
                b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        elif op == 1 and b:    # truncate
            del b[rnd.randrange(len(b)):]
        elif op == 2 and b:    # zero a range
            i = rnd.randrange(len(b))
            j = min(len(b), i + rnd.randint(1, 32))
            b[i:j] = bytes(j - i)
        elif op == 3 and b:    # duplicate-splice a slice
            i = rnd.randrange(len(b))
            j = min(len(b), i + rnd.randint(1, 32))
            k = rnd.randrange(len(b) + 1)
            b[k:k] = b[i:j]
        elif op == 4:          # random tail
            b += bytes(rnd.getrandbits(8)
                       for _ in range(rnd.randint(1, 64)))
        elif op == 5 and b:    # header-biased byte edits
            for _ in range(rnd.randint(1, 8)):
                b[rnd.randrange(min(64, len(b)))] = rnd.getrandbits(8)
        elif op == 6 and b:    # delete a range
            i = rnd.randrange(len(b))
            j = min(len(b), i + rnd.randint(1, 32))
            del b[i:j]
        else:                  # cross-format graft: foreign magic in front
            b[:rnd.randint(0, min(16, len(b)))] = rnd.choice(MAGICS)
    return bytes(b)


def _payload_for_seed(seed: int) -> tuple[str, bytes]:
    rnd = random.Random(seed)
    roll = rnd.random()
    if roll < 0.05:            # pure random blob
        return "random", bytes(rnd.getrandbits(8)
                               for _ in range(rnd.randint(0, 256)))
    name = rnd.choice(sorted(FIXTURES))
    return name, _mutate(rnd, FIXTURES[name])


def _check_one(name: str, payload: bytes, seed: int) -> None:
    ctx = f"seed={seed} fixture={name} len={len(payload)}"
    # decoders: valid | None | ValueError, nothing else
    for dec in (multimodal.decode_image, audio.decode_audio):
        try:
            dec(payload)
        except ValueError:
            pass
        except Exception as exc:  # noqa: BLE001 — the contract under test
            pytest.fail(f"{dec.__name__} raised {type(exc).__name__}: "
                        f"{exc} ({ctx})")
    # parsers + frame walkers: value | None, never raise
    for fn in (multimodal.parse_image_header, multimodal.parse_video_header,
               audio.parse_audio_header, multimodal.avi_mjpeg_frames,
               multimodal.mp4_jpeg_frames, multimodal.webm_mjpeg_frames):
        try:
            fn(payload)
        except Exception as exc:  # noqa: BLE001
            pytest.fail(f"{fn.__name__} raised {type(exc).__name__}: "
                        f"{exc} ({ctx})")
    # signatures: int | None, never raise
    try:
        h = multimodal.perceptual_hash(payload)
        assert h is None or isinstance(h, int), ctx
        fp = audio.audio_fingerprint(payload)
        assert fp is None or isinstance(fp, int), ctx
    except AssertionError:
        raise
    except Exception as exc:  # noqa: BLE001
        pytest.fail(f"signature fn raised {type(exc).__name__}: "
                    f"{exc} ({ctx})")


_SEED_RANGE = os.environ.get("SPARK_GRAFT_DECODER_FUZZ_SEEDS")
if _SEED_RANGE:
    _LO, _HI = (int(x) for x in _SEED_RANGE.split(":"))
else:
    _LO, _HI = 0, 1500
_BATCH = 250


@pytest.mark.parametrize("start", range(_LO, _HI, _BATCH))
def test_decoder_surface_closed_under_mutation(start):
    for seed in range(start, min(start + _BATCH, _HI)):
        name, payload = _payload_for_seed(seed)
        _check_one(name, payload, seed)


def test_dirty_batch_survives_every_spark_operator(spark):
    """Operator-level closure: ONE DataFrame holding a nasty mutant of
    every fixture family (plus empty/NULL payloads) must flow through
    every per-payload Spark operator without an executor error, emitting
    one output row per input row where the operator contracts one."""
    from pyspark.sql import functions as F

    rows = []
    k = 0
    for seed in range(300, 340):
        name, payload = _payload_for_seed(seed)
        rows.append((k, payload))
        k += 1
    rows += [(k, b""), (k + 1, None)]
    df = spark.createDataFrame(rows, "key bigint, payload binary")
    n = df.count()

    assert multimodal.image_phash(df).count() == n
    assert audio.audio_phash(df).count() == n
    assert multimodal.extract_image_metadata(df).count() == n
    assert audio.extract_audio_metadata(df).count() == n
    # video_phash keeps a NULL-phash row per zero-decodable-frame clip
    assert multimodal.video_phash(df).count() == n
    # sample_frames: ≤ max_frames rows per input, none for empty/NULL
    frames = multimodal.sample_frames(df)
    per_key = {r.key: r.n for r in
               frames.groupBy("key").agg(F.count("*").alias("n")).collect()}
    assert all(v <= 8 for v in per_key.values())
    assert k not in per_key and k + 1 not in per_key
