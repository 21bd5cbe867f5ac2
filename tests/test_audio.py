"""Audio operator tests: WAV decode roundtrips against struct-built
fixtures (independent of the decoder), FLAC/MP3 header parses against
hand-packed spec fields, feature values against a numpy reference."""

import hashlib
import math
import struct

import pytest

from datafusion_substrait_spark.operators import audio


def _wav(body: bytes, fmt_tag: int, channels: int, rate: int, bits: int,
         extra_chunk: bytes = b"", data_size: int | None = None) -> bytes:
    fmt = struct.pack("<HHIIHH", fmt_tag, channels, rate,
                      rate * channels * bits // 8, channels * bits // 8, bits)
    chunks = extra_chunk + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack(
        "<I", len(body) if data_size is None else data_size) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _pcm16(vals):
    return struct.pack(f"<{len(vals)}h", *vals)


def test_wav_header_and_pcm16_roundtrip():
    vals = [0, 1000, -1000, 32767, -32768, 12345]
    wav = _wav(_pcm16(vals), 1, 2, 44100, 16)
    assert audio.parse_audio_header(wav) == ("wav", 2, 44100, 16, 3)
    samples, rate = audio.decode_wav(wav)
    assert rate == 44100 and samples.shape == (3, 2)
    flat = [v for fr in samples.tolist() for v in fr]
    assert flat == pytest.approx([v / 32768.0 for v in vals], abs=1e-7)


def test_wav_all_supported_encodings():
    # 8-bit unsigned
    wav8 = _wav(bytes([0, 128, 255, 64]), 1, 1, 8000, 8)
    s, _ = audio.decode_wav(wav8)
    assert s[:, 0].tolist() == pytest.approx(
        [-1.0, 0.0, 127 / 128, -0.5], abs=1e-7)
    # 24-bit signed little-endian
    def i24(v):
        return (v & 0xFFFFFF).to_bytes(3, "little")
    vals24 = [0, 1 << 22, -(1 << 22), (1 << 23) - 1, -(1 << 23)]
    wav24 = _wav(b"".join(i24(v) for v in vals24), 1, 1, 16000, 24)
    s, _ = audio.decode_wav(wav24)
    assert s[:, 0].tolist() == pytest.approx(
        [v / (1 << 23) for v in vals24], abs=1e-7)
    # 32-bit signed + float32 + float64
    vals32 = [0, 1 << 30, -(1 << 30)]
    wav32 = _wav(struct.pack("<3i", *vals32), 1, 1, 16000, 32)
    s, _ = audio.decode_wav(wav32)
    assert s[:, 0].tolist() == pytest.approx([0.0, 0.5, -0.5], abs=1e-7)
    for bits, pack in ((32, "<3f"), (64, "<3d")):
        wavf = _wav(struct.pack(pack, 0.25, -0.75, 1.0), 3, 1, 48000, bits)
        s, _ = audio.decode_wav(wavf)
        assert s[:, 0].tolist() == pytest.approx([0.25, -0.75, 1.0], abs=1e-6)


def test_wav_chunk_walking_and_clamped_data_size():
    # an odd-sized LIST chunk (word-aligned) before fmt/data must be skipped
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    body = _pcm16([100, -100, 200, -200])
    wav = _wav(body, 1, 1, 22050, 16, extra_chunk=extra)
    assert audio.parse_audio_header(wav) == ("wav", 1, 22050, 16, 4)
    s, rate = audio.decode_wav(wav)
    assert rate == 22050 and s.shape == (4, 1)
    # streaming writers leave data size 0xFFFFFFFF: clamp to actual bytes
    wav_stream = _wav(body, 1, 1, 22050, 16, data_size=0xFFFFFFFF)
    assert audio.parse_audio_header(wav_stream) == ("wav", 1, 22050, 16, 4)
    s2, _ = audio.decode_wav(wav_stream)
    assert s2.tolist() == s.tolist()


def test_wav_rejects_unsupported():
    adpcm = _wav(b"\x00" * 8, 2, 1, 8000, 4)  # format tag 2 = MS ADPCM
    # sub-byte bit depth: frame count is codec-specific, reported as 0
    assert audio.parse_audio_header(adpcm) == ("wav", 1, 8000, 4, 0)
    with pytest.raises(ValueError, match="codec"):
        audio.decode_wav(adpcm)
    with pytest.raises(ValueError, match="signature"):
        audio.decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError, match="fmt or data"):
        audio.decode_wav(b"RIFF\x04\x00\x00\x00WAVE")


def test_flac_streaminfo_parse():
    # STREAMINFO: rate=44100, channels=2, bits=16, total=123456 packed as
    # 20|3|5|36 bits at byte offset 18 of the file
    packed = (44100 << 44) | ((2 - 1) << 41) | ((16 - 1) << 36) | 123456
    flac = (b"fLaC" + bytes([0x00, 0, 0, 34])
            + b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16)
    assert audio.parse_audio_header(flac) == ("flac", 2, 44100, 16, 123456)
    # a first block that is not STREAMINFO is rejected
    bad = b"fLaC" + bytes([0x04, 0, 0, 34]) + flac[8:]
    assert audio.parse_audio_header(bad) is None


def test_mp3_frame_header_parse_and_id3_skip():
    # 0xFF 0xFB: MPEG1 Layer III; 0x90: bitrate idx 9 (128k), 44100 Hz;
    # 0xC0: mono
    frame = bytes([0xFF, 0xFB, 0x90, 0xC0]) + b"\x00" * 64
    assert audio.parse_audio_header(frame) == ("mp3", 1, 44100, -1, -1)
    # joint stereo, MPEG2 (version bits 10 -> 0xF3), 24000 Hz idx 1, 64k idx 8
    frame2 = bytes([0xFF, 0xF3, 0x84, 0x40]) + b"\x00" * 64
    assert audio.parse_audio_header(frame2) == ("mp3", 2, 24000, -1, -1)
    # ID3v2 tag (syncsafe size 0x7F = 127 bytes) then the frame
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x7f" + b"\x00" * 127 + frame
    assert audio.parse_audio_header(id3) == ("mp3", 1, 44100, -1, -1)
    # plain text never parses as audio
    assert audio.parse_audio_header(b"hello world, not audio at all") is None


def _sine_fixture():
    import numpy as np

    t = np.arange(2048)
    sine = (np.sin(2 * math.pi * 440 * t / 16000) * 20000).astype(np.int16)
    wav = _wav(sine.tobytes(), 1, 1, 16000, 16)
    samples, _ = audio.decode_wav(wav)
    mono = samples[:, 0]
    frame, hop = 512, 256
    # reference framing computed independently of audio_features
    expect = []
    for i in range((len(mono) - frame) // hop + 1):
        win = mono[i * hop:i * hop + frame]
        expect.append((
            float(np.sqrt(np.mean(win ** 2))),
            float(np.mean(np.signbit(win[1:]) != np.signbit(win[:-1]))),
        ))
    return wav, frame, hop, expect


def test_audio_features_match_physics():
    # a 440 Hz sine at 16 kHz: rms ~ 20000/32768/sqrt(2), zcr ~ 2*440/16000
    _wav_b, _f, _h, expect = _sine_fixture()
    assert expect[0][0] == pytest.approx(20000 / 32768 / math.sqrt(2), rel=0.01)
    assert expect[0][1] == pytest.approx(2 * 440 / 16000, rel=0.05)


def test_audio_features_spark_path(spark):
    wav, frame, hop, expect = _sine_fixture()
    corrupt = wav[:40]  # recognized RIFF/WAVE, truncated chunks
    df = spark.createDataFrame(
        [(1, wav), (2, b"just some text payload"), (3, corrupt)],
        "key bigint, payload binary")
    out = audio.audio_features(df, frame=frame, hop=hop)
    rows = {(r.key, r.frame_idx): (r.rms, r.zcr) for r in out.collect()}
    for i, (rms, zcr) in enumerate(expect):
        assert rows[(1, i)][0] == pytest.approx(rms, abs=1e-9)
        assert rows[(1, i)][1] == pytest.approx(zcr, abs=1e-9)
    # fake-PCM payloads produce the deterministic fallback frames
    n_fake = (4096 - frame) // hop + 1
    assert sum(1 for (k, _i) in rows if k == 2) == n_fake
    assert sum(1 for (k, _i) in rows if k == 3) == n_fake
    # partitioning-independent
    again = {(r.key, r.frame_idx): (r.rms, r.zcr)
             for r in audio.audio_features(
                 df.repartition(5), frame=frame, hop=hop).collect()}
    assert rows == again


def test_extract_audio_metadata_spark_path(spark):
    packed = (22050 << 44) | ((1 - 1) << 41) | ((24 - 1) << 36) | 44100
    flac = (b"fLaC" + bytes([0x80, 0, 0, 34])  # last-block flag set is fine
            + b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16)
    sine = _pcm16([0, 100, -100, 200] * 100)
    wav = _wav(sine, 1, 2, 8000, 16)
    mp3 = bytes([0xFF, 0xFB, 0x90, 0xC0]) + b"\x00" * 1600  # 128 kbps CBR
    df = spark.createDataFrame(
        [(1, wav), (2, flac), (3, mp3), (4, b"not audio")],
        "key bigint, payload binary")
    meta = {r.key: r.asDict() for r in audio.extract_audio_metadata(df).collect()}
    assert (meta[1]["format"], meta[1]["channels"], meta[1]["sample_rate"],
            meta[1]["bits_per_sample"], meta[1]["n_samples"]) \
        == ("wav", 2, 8000, 16, 200)
    assert meta[1]["est_duration_s"] == pytest.approx(200 / 8000)
    assert (meta[2]["format"], meta[2]["sample_rate"], meta[2]["n_samples"]) \
        == ("flac", 22050, 44100)
    assert meta[3]["format"] == "mp3" and meta[3]["n_samples"] == -1
    # CBR duration estimate: bytes*8/bitrate
    assert meta[3]["est_duration_s"] == pytest.approx(
        len(mp3) * 8 / 128000, rel=1e-6)
    # unrecognized payloads carry the marked deterministic fake + real hash
    assert meta[4]["payload_sha256"] == hashlib.sha256(b"not audio").hexdigest()
    assert meta[4]["format"] in ("mp3", "wav", "flac")


def test_truncated_flac_routes_to_fake_not_garbage():
    """A FLAC cut inside the 64-bit STREAMINFO packed field (bytes 18-26)
    must parse as 'not audio' (fake fallback), not as shifted garbage."""
    packed = (44100 << 44) | ((2 - 1) << 41) | ((16 - 1) << 36) | 123456
    flac = (b"fLaC" + bytes([0x00, 0, 0, 34])
            + b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16)
    assert audio.parse_audio_header(flac) == ("flac", 2, 44100, 16, 123456)
    for cut in (22, 23, 24, 25):
        assert audio.parse_audio_header(flac[:cut]) is None, cut


def _ogg_page(payload: bytes, granule: int, seq: int, htype: int = 0) -> bytes:
    assert len(payload) < 255
    return (b"OggS" + bytes([0, htype]) + struct.pack("<q", granule)
            + struct.pack("<III", 1234, seq, 0)  # serial, seq, crc (unchecked)
            + bytes([1, len(payload)]) + payload)


def test_ogg_opus_and_vorbis_metadata():
    # OpusHead: version 1, 2 channels, pre-skip 312, input rate 44100
    opus_head = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
                 + struct.pack("<I", 44100) + struct.pack("<h", 0) + bytes([0]))
    ogg = (_ogg_page(opus_head, 0, 0, htype=2)
           + _ogg_page(b"\x00" * 10, 96312, 1, htype=4))
    # granules run at 48 kHz for Opus regardless of input rate; pre-skip
    # subtracts: (96312 - 312) / 48000 = 2.0 s
    assert audio.parse_audio_header(ogg) == ("opus", 2, 48000, -1, 96000)
    # vorbis identification header: version 0, 1 channel, 22050 Hz
    vorb = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([1])
            + struct.pack("<I", 22050) + b"\x00" * 16)
    ogg2 = (_ogg_page(vorb, 0, 0, htype=2)
            + _ogg_page(b"\x00" * 10, 44100, 1, htype=4))
    assert audio.parse_audio_header(ogg2) == ("vorbis", 1, 22050, -1, 44100)
    # truncated / non-audio ogg payloads degrade to None
    assert audio.parse_audio_header(ogg[:20]) is None
    assert audio.parse_audio_header(
        _ogg_page(b"not a codec head", 0, 0)) is None


def test_ogg_duration_through_spark(spark):
    opus_head = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 0)
                 + struct.pack("<I", 48000) + struct.pack("<h", 0) + bytes([0]))
    ogg = (_ogg_page(opus_head, 0, 0, htype=2)
           + _ogg_page(b"\x00" * 10, 144000, 1, htype=4))  # 3.0 s
    df = spark.createDataFrame([(1, ogg)], "key bigint, payload binary")
    m = audio.extract_audio_metadata(df).collect()[0]
    assert (m.format, m.channels, m.sample_rate, m.n_samples) \
        == ("opus", 1, 48000, 144000)
    assert m.est_duration_s == pytest.approx(3.0)


def test_ogg_granule_ignores_capture_pattern_in_packet_data():
    """Review finding: 'OggS' appearing INSIDE compressed packet data is
    spec-legal and must not be misread as a page header (a bare rfind
    yielded ~180-million-year durations)."""
    opus_head = (b"OpusHead" + bytes([1, 1]) + struct.pack("<H", 0)
                 + struct.pack("<I", 48000) + struct.pack("<h", 0) + bytes([0]))
    poisoned_payload = b"\x01\x02OggS" + b"\xff" * 20  # capture pattern inside
    ogg = (_ogg_page(opus_head, 0, 0, htype=2)
           + _ogg_page(poisoned_payload, 96000, 1, htype=4))
    assert audio.parse_audio_header(ogg) == ("opus", 1, 48000, -1, 96000)
    # a zero-channel OpusHead is spec-invalid -> routed to the fake
    bad_head = (b"OpusHead" + bytes([1, 0]) + struct.pack("<H", 0)
                + struct.pack("<I", 48000) + struct.pack("<h", 0) + bytes([0]))
    assert audio.parse_audio_header(_ogg_page(bad_head, 0, 0, htype=2)) is None


def test_audio_embedding_content_similarity(spark):
    """Per-clip embeddings: same-shaped signals land near cosine 1,
    a different signal lower; zero-frame clips get the basis vector;
    deterministic across partitionings."""
    import numpy as np

    sr = 8000
    t = np.arange(sr) / sr
    tone = (np.sin(2 * np.pi * 440 * t) * 12000).astype(int).tolist()
    tone_shift = (np.sin(2 * np.pi * 440 * t + 0.5) * 12000) \
        .astype(int).tolist()
    rng = np.random.default_rng(5)
    noise = rng.integers(-12000, 12000, sr).tolist()
    short = [100, -100, 200]  # shorter than one frame

    rows = [
        (1, bytearray(_wav(_pcm16(tone), 1, 1, sr, 16))),
        (2, bytearray(_wav(_pcm16(tone_shift), 1, 1, sr, 16))),
        (3, bytearray(_wav(_pcm16(noise), 1, 1, sr, 16))),
        (4, bytearray(_wav(_pcm16(short), 1, 1, sr, 16))),
    ]
    df = spark.createDataFrame(rows, "key long, payload binary")
    out = {r.key: (r.n_frames, np.array(r.features))
           for r in audio.audio_embedding(df).collect()}
    assert out[1][0] > 0 and out[3][0] > 0
    assert out[4][0] == 0
    assert np.allclose(out[4][1], [1, 0, 0, 0, 0, 0])
    for k in (1, 2, 3):
        assert abs(float(np.linalg.norm(out[k][1])) - 1.0) < 1e-5

    def cos(a, b):
        return float(np.dot(a, b))

    # same tone, phase-shifted: nearly identical stats; noise differs
    assert cos(out[1][1], out[2][1]) > cos(out[1][1], out[3][1])
    assert cos(out[1][1], out[2][1]) > 0.999

    a = sorted((r.key, tuple(r.features)) for r in
               audio.audio_embedding(df.repartition(1)).collect())
    b = sorted((r.key, tuple(r.features)) for r in
               audio.audio_embedding(df.repartition(5)).collect())
    assert a == b


def test_audio_fingerprint_gain_invariance_and_discrimination():
    """The spectral fingerprint must be exactly invariant to re-leveling
    (signs of log-energy differences are gain-invariant), near-invariant
    to light noise, and far for a clip with a different spectrum; too
    short / undecodable → None."""
    import math

    import numpy as np

    rng = np.random.default_rng(3)
    n, rate = 4096, 16000
    t = np.arange(n) / rate

    def tone(freqs, gain=0.5, noise=0.0):
        sig = sum(np.sin(2 * math.pi * f * t) for f in freqs)
        sig = gain * sig / len(freqs) + noise * rng.standard_normal(n)
        return _wav(_pcm16([int(max(-1, min(1, v)) * 30000) for v in sig]),
                    1, 1, rate, 16)

    base = audio.audio_fingerprint(tone([440, 1800]))
    releveled = audio.audio_fingerprint(tone([440, 1800], gain=0.25))
    noised = audio.audio_fingerprint(tone([440, 1800], noise=0.01))
    other = audio.audio_fingerprint(tone([3500, 6000]))

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(base, releveled) <= 2   # int16 rounding can graze a margin
    assert ham(base, noised) <= 6
    assert ham(base, other) >= 16
    assert audio.audio_fingerprint(b"junk bytes") is None
    assert audio.audio_fingerprint(
        _wav(_pcm16([0] * 40), 1, 1, 8000, 16)) is None  # too short
    with pytest.raises(ValueError, match="n_time"):
        audio.audio_fingerprint(tone([440]), n_time=4)
    # 64 zero bits is a LEGAL value (flat spectrum) but tonal content
    # must produce a non-trivial pattern
    assert base != 0


def test_synthetic_audio_payload_fingerprint_closed_form():
    """The d7 aphash-leg oracle contract: on attach_synthetic_audio_payload's
    tone-segment WAVs, the REAL WAV→PCM→rFFT fingerprint equals the
    closed form (bit 8·i + digest[i] % 8 per segment, exactly 8 bits) —
    an exact-bin center tone concentrates all signal energy in its own
    spectral band; quantization noise stays ~40 dB below and spreads
    evenly, so only the tone band outranks the segment mean."""
    import hashlib

    import numpy as np

    from datafusion_substrait_spark.operators import audio

    t = np.arange(128)
    for text in ("a0", "a17", "a99", "hello", ""):
        digest = hashlib.sha256(text.encode("utf-8")).digest()
        segs = [np.round(np.sin(2 * np.pi * (8 * (digest[i] % 8) + 4)
                                * t / 128) * 16384).astype(np.int64)
                for i in range(8)]
        wav = audio._encode_pcm16_wav(np.concatenate(segs))
        v = sum(1 << (i * 8 + digest[i] % 8) for i in range(8))
        want = v - (1 << 64) if v >= (1 << 63) else v
        assert audio.audio_fingerprint(wav) == want, text


def test_audio_neardup_pairs_planted(spark):
    """Re-leveled + noised copies pair with the original at small
    Hamming; the different-spectrum clip and junk payloads never pair;
    deterministic across partitionings."""
    import math

    import numpy as np

    rng = np.random.default_rng(5)
    n, rate = 4096, 16000
    t = np.arange(n) / rate

    def tone(freqs, gain=0.5, noise=0.0):
        sig = sum(np.sin(2 * math.pi * f * t) for f in freqs)
        sig = gain * sig / len(freqs) + noise * rng.standard_normal(n)
        return _wav(_pcm16([int(max(-1, min(1, v)) * 30000) for v in sig]),
                    1, 1, rate, 16)

    rows = [(1, tone([440, 1800])),
            (2, tone([440, 1800], gain=0.2)),
            (3, tone([440, 1800], noise=0.01)),
            (4, tone([3500, 6000])),
            (5, b"not audio at all")]
    df = spark.createDataFrame(rows, "key bigint, payload binary")
    sigs = {r.key: r.phash for r in audio.audio_phash(df).collect()}
    assert sigs[5] is None and sigs[1] is not None
    pairs = audio.audio_neardup_pairs(df, max_hamming=6)
    got = {(r.key_a, r.key_b) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) in got
    assert all(4 not in p and 5 not in p for p in got)
    a = sorted(map(tuple, audio.audio_neardup_pairs(
        df.repartition(1), max_hamming=6).collect()))
    b = sorted(map(tuple, audio.audio_neardup_pairs(
        df.repartition(4), max_hamming=6).collect()))
    assert a == b
