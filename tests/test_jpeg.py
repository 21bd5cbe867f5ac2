"""Baseline JPEG decoder tests.

The encoder here is an independent spec-following implementation of the
T.81 bit-level format (markers, zigzag ordering, DC/AC magnitude coding,
canonical Huffman, 0xFF00 stuffing, restart markers), so roundtrips check
decode_jpeg against the spec, not against itself. Two goldens pin the
transform scale analytically: a DC-only block must decode to
round(DC*q/8)+128 exactly, and a single-AC block to the explicit cosine
ramp of T.81 A.3.3.
"""

import math
import struct

import numpy as np
import pytest

from datafusion_substrait_spark.operators import jpeg as J
from datafusion_substrait_spark.operators import multimodal

ZZ = J.ZIGZAG


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        while self.n:
            self.bits(1, 1)  # pad with 1s per F.1.2.3


def _mag_bits(v: int):
    """T.81 F.1.2.1.2: category + appended magnitude bits."""
    t = abs(v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _flat_huff(symbols):
    """All-codes-8-bit canonical table over the used symbol set (valid
    DHT as long as <256 symbols): returns (bits, vals, code_of)."""
    vals = sorted(set(symbols))
    assert len(vals) < 256
    bits = [0] * 16
    bits[7] = len(vals)
    code_of = {s: (8, i) for i, s in enumerate(vals)}
    return bits, vals, code_of


def _dct_block(g):
    """Forward DCT via the explicit T.81 A.3.3 formula (double loop —
    independent of the decoder's matrix formulation). Returns F with
    F[v, u]: v vertical frequency, u horizontal (matches the decoder's
    raster layout through the shared zigzag table)."""
    F = np.zeros((8, 8))
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (g[y, x]
                          * math.cos((2 * x + 1) * u * math.pi / 16)
                          * math.cos((2 * y + 1) * v * math.pi / 16))
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            F[v, u] = 0.25 * cu * cv * s
    return F


def _encode_jpeg(img, subsample=(1, 1), q_val=16, restart=0) -> bytes:
    """Minimal spec-following baseline encoder. ``img`` is (h, w) gray or
    (h, w, 3) RGB uint8; ``subsample`` is the (h, v) factor for luma
    (chroma is always 1x1), flat quantization table of ``q_val``."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    sh, sv = subsample
    if gray:
        planes = [img.astype(np.float64)]
        comps = [(1, 1, 1, 0)]
    else:
        rgb = img.astype(np.float64)
        y = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
             + 0.114 * rgb[:, :, 2])
        cb = (rgb[:, :, 2] - y) / 1.772 + 128.0
        cr = (rgb[:, :, 0] - y) / 1.402 + 128.0
        # chroma at 1/sh x 1/sv resolution via box averaging
        def down(p, fx, fy):
            if fx == 1 and fy == 1:
                return p
            ph = -(-p.shape[0] // fy) * fy
            pw = -(-p.shape[1] // fx) * fx
            pad = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                         mode="edge")
            return pad.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        planes = [y, down(cb, sh, sv), down(cr, sh, sv)]
        comps = [(1, sh, sv, 0), (2, 1, 1, 1), (3, 1, 1, 1)]

    q_tabs = {0: np.full((8, 8), q_val, np.int32)}
    if not gray:
        q_tabs[1] = np.full((8, 8), q_val, np.int32)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    # pad planes (edge-replicate) to whole MCUs at component scale
    padded = []
    for (cid, ch, cv, tq), p in zip(comps, planes):
        ph, pw = mcuy * cv * 8, mcux * ch * 8
        padded.append(np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"))

    # pass 1: quantized coefficients per MCU, collecting huffman symbols
    mcu_stream = []  # [(comp_idx, qblock)]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        y0, x0 = (my * cv + by) * 8, (mx * ch + bx) * 8
                        g = padded[ci][y0:y0 + 8, x0:x0 + 8] - 128.0
                        F = _dct_block(g)
                        mcu_stream.append(
                            (ci, np.rint(F / q_tabs[tq]).astype(int)))

    n_blocks_per_mcu = sum(c[1] * c[2] for c in comps)
    dc_syms, ac_syms = [], []
    pred = [0] * len(comps)
    seq = []  # (ci, dc_sym, dc_extra_t, dc_extra_v, [(ac_sym, t, v)...])
    for i, (ci, qb) in enumerate(mcu_stream):
        mcu_i = i // n_blocks_per_mcu
        if restart and mcu_i and mcu_i % restart == 0 \
                and i % n_blocks_per_mcu == 0:
            pred = [0] * len(comps)
        flat = qb.reshape(64)
        diff = int(flat[0]) - pred[ci]
        pred[ci] = int(flat[0])
        t, extra = _mag_bits(diff)
        dc_syms.append(t)
        acs = []
        run = 0
        for k in range(1, 64):
            v = int(flat[ZZ[k]])
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, 0, 0))  # ZRL
                ac_syms.append(0xF0)
                run -= 16
            s, ev = _mag_bits(v)
            acs.append(((run << 4) | s, s, ev))
            ac_syms.append((run << 4) | s)
            run = 0
        if run:
            acs.append((0x00, 0, 0))  # EOB
            ac_syms.append(0x00)
        seq.append((ci, t, extra, acs))

    dc_bits, dc_vals, dc_code = _flat_huff(dc_syms + [0])
    ac_bits, ac_vals, ac_code = _flat_huff(ac_syms + [0x00])

    # pass 2: emit the stream
    wtr = _BitWriter()
    rst = 0
    for i, (ci, t, extra, acs) in enumerate(seq):
        if restart and i % n_blocks_per_mcu == 0:
            mcu_i = i // n_blocks_per_mcu
            if mcu_i and mcu_i % restart == 0:
                wtr.align()
                wtr.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
        ln, code = dc_code[t]
        wtr.bits(code, ln)
        if t:
            wtr.bits(extra, t)
        for sym, s, ev in acs:
            ln, code = ac_code[sym]
            wtr.bits(code, ln)
            if s:
                wtr.bits(ev, s)
    wtr.align()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    for tid, tab in q_tabs.items():
        zz = bytes(int(tab.reshape(64)[ZZ[k]]) for k in range(64))
        out += seg(0xDB, bytes([tid]) + zz)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0 for all comps
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    return out + bytes(wtr.out) + b"\xff\xd9"


# --- goldens anchored to the spec, no encoder involved -----------------------

_STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_STD_DC_VALS = list(range(12))  # T.81 Annex K.3.1 luminance DC


def _single_block_jpeg(dc_diff: int, q0: int, ac=None) -> bytes:
    """Hand-assembled 8x8 grayscale baseline JPEG: standard luminance DC
    table (multi-length canonical decode path), flat-8-bit AC table, one
    DC coefficient and optionally one AC coefficient at zigzag index 1."""
    t, extra = _mag_bits(dc_diff)
    # canonical codes for the standard DC table: lengths/codes derived by
    # hand from BITS=[0,1,5,1,1,...]: sym0 -> (2,'00'), sym1 -> (3,'010'),
    # ... sym5 -> (3,'110'), sym6 -> (4,'1110'), sym7 -> (5,'11110') ...
    dc_codes = {0: (2, 0b00), 1: (3, 0b010), 2: (3, 0b011), 3: (3, 0b100),
                4: (3, 0b101), 5: (3, 0b110), 6: (4, 0b1110),
                7: (5, 0b11110), 8: (6, 0b111110), 9: (7, 0b1111110),
                10: (8, 0b11111110), 11: (9, 0b111111110)}
    wtr = _BitWriter()
    ln, code = dc_codes[t]
    wtr.bits(code, ln)
    if t:
        wtr.bits(extra, t)
    # AC table: flat 8-bit over {0x00 (EOB), 0x01, 0x02} -> codes 0,1,2
    if ac is not None:
        s, ev = _mag_bits(ac)
        wtr.bits({1: 1, 2: 2}[s], 8)
        wtr.bits(ev, s)
    wtr.bits(0, 8)  # EOB
    wtr.align()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    q = bytes([q0] * 64)
    out = b"\xff\xd8" + seg(0xDB, bytes([0]) + q)
    out += seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
               + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_STD_DC_BITS)
               + bytes(_STD_DC_VALS))
    ac_bits = [0] * 16
    ac_bits[7] = 3
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes([0x00, 0x01, 0x02]))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return out + bytes(wtr.out) + b"\xff\xd9"


def test_dc_only_golden_exact():
    """IDCT of a DC-only block is flat: pixel = round(DC*q/8) + 128."""
    for dc, q0 in ((5, 16), (-7, 16), (0, 16), (63, 4), (-128, 2)):
        img = J.decode_jpeg(_single_block_jpeg(dc, q0))
        assert img.shape == (8, 8, 1)
        expect = int(np.clip(round(dc * q0 / 8) + 128, 0, 255))
        assert img.reshape(-1).tolist() == [expect] * 64, (dc, q0)


def test_single_ac_golden_cosine_ramp():
    """Zigzag index 1 is F(u=1,v=0): decoded rows are constant, columns
    follow (1/4)*sqrt(1/2)*... — computed here with the explicit A.3.3
    formula, independent of the decoder's matrix path."""
    q0, ac = 16, 3
    img = J.decode_jpeg(_single_block_jpeg(0, q0, ac=ac)).reshape(8, 8)
    c0 = 1 / math.sqrt(2)
    for x in range(8):
        val = 0.25 * c0 * c0 * 0  # DC term is zero
        val += 0.25 * c0 * (ac * q0) * math.cos((2 * x + 1) * math.pi / 16)
        expect = int(np.clip(round(val + 128), 0, 255))
        col = img[:, x].tolist()
        assert col == [expect] * 8, (x, col, expect)


# --- roundtrips against the independent encoder ------------------------------

def test_roundtrip_gray_near_lossless():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 17), np.uint8)  # non-multiple-of-8 dims
    dec = J.decode_jpeg(_encode_jpeg(img, q_val=1))
    assert dec.shape == (24, 17, 1)
    err = np.abs(dec[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 4, err.max()  # only DCT-coefficient rounding


def test_roundtrip_rgb_444_and_420():
    yy, xx = np.mgrid[0:32, 0:24]
    img = np.stack([(yy * 8) % 256, (xx * 11) % 256,
                    ((xx + yy) * 5) % 256], axis=-1).astype(np.uint8)
    for sub in ((1, 1), (2, 2), (2, 1)):
        dec = J.decode_jpeg(_encode_jpeg(img, subsample=sub, q_val=4))
        assert dec.shape == (32, 24, 3)
        err = np.abs(dec.astype(int) - img.astype(int))
        # chroma subsampling + nearest upsample is lossy at edges of the
        # wrapping gradient; mean error stays small, gross errors absent
        assert err.mean() < 12.0, (sub, err.mean())
        lum = (0.299 * dec[:, :, 0] + 0.587 * dec[:, :, 1]
               + 0.114 * dec[:, :, 2])
        lum0 = (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
                + 0.114 * img[:, :, 2])
        assert np.abs(lum - lum0).mean() < 3.0, sub  # luma is full-res


def test_roundtrip_solid_color_420_exact():
    img = np.full((16, 16, 3), (200, 64, 30), np.uint8)
    dec = J.decode_jpeg(_encode_jpeg(img, subsample=(2, 2), q_val=16))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 2, err.max()


def test_restart_markers():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 40), np.uint8)
    enc = _encode_jpeg(img, q_val=1, restart=2)
    assert b"\xff\xd0" in enc or b"\xff\xd1" in enc
    dec = J.decode_jpeg(enc)
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 4


def test_rejects_non_baseline_and_malformed():
    img = np.zeros((8, 8), np.uint8)
    good = _encode_jpeg(img)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        J.decode_jpeg(prog)
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"\x00" + good)
    with pytest.raises(ValueError):
        J.decode_jpeg(good[:40])  # truncated before scan


def test_fill_bytes_before_markers_decode():
    """T.81 B.1.1.2 allows any marker to be preceded by 0xFF fill
    bytes; a spec-valid JPEG with fill bytes must decode identically,
    not misparse the next segment length (ADVICE r6)."""
    img = np.full((8, 8), 77, np.uint8)
    good = _encode_jpeg(img, q_val=1)
    # insert fill bytes before the DQT, DHT, SOF0 and SOS markers
    filled = good
    for marker in (b"\xff\xdb", b"\xff\xc4", b"\xff\xc0", b"\xff\xda"):
        filled = filled.replace(marker, b"\xff\xff\xff" + marker, 1)
    ref = J.decode_jpeg(good)
    dec = J.decode_jpeg(filled)
    assert dec.shape == ref.shape
    assert np.array_equal(dec, ref)


def test_decode_image_dispatch_jpeg():
    """multimodal.decode_image now routes JPEGs to the real decoder; a
    header-only fixture (no scan) raises inside, which the resize seam
    absorbs as the fake fallback."""
    img = np.full((8, 8, 3), (10, 200, 90), np.uint8)
    out = multimodal.decode_image(_encode_jpeg(img, q_val=16))
    assert out is not None and out.shape == (8, 8, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_malformed_jpeg_always_raises_valueerror():
    """Internal struct/KeyError/IndexError must surface as ValueError so
    the resize seam's stage-survival catch sees them."""
    cases = [
        b"\xff\xd8\xff\xdb\x00\x04\x10\x00",  # truncated 16-bit DQT
        # SOF+SOS referencing tables that were never defined
        b"\xff\xd8" + b"\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        + b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00" + b"\x00" * 8,
    ]
    for payload in cases:
        with pytest.raises(ValueError):
            J.decode_jpeg(payload)
    # and the resize seam survives them (fake fallback, no crash)
    from datafusion_substrait_spark.operators.multimodal import _default_resize
    for payload in cases:
        assert len(_default_resize(payload, 2, 2)) == 4


def test_image_features_content_similarity(spark):
    """Real classical-CV features: a brightness-shifted copy of an image
    stays near cosine 1 with the original, while a structurally different
    image lands visibly lower — behavior a hash fake cannot produce."""
    rng = np.random.default_rng(3)
    base = rng.integers(40, 180, (32, 32), np.uint8)
    brighter = np.clip(base.astype(int) + 12, 0, 255).astype(np.uint8)
    different = rng.integers(0, 256, (32, 32), np.uint8)

    f = multimodal.image_features
    a = np.array(f(_encode_jpeg(base, q_val=4)))
    b = np.array(f(_encode_jpeg(brighter, q_val=4)))
    c = np.array(f(_encode_jpeg(different, q_val=4)))
    assert a is not None and float(np.linalg.norm(a)) == pytest.approx(1.0, abs=1e-6)
    cos_ab = float(a @ b)
    cos_ac = float(a @ c)
    assert cos_ab > 0.98, cos_ab
    assert cos_ac < cos_ab - 0.005, (cos_ab, cos_ac)
    # undecodable payload -> None -> seam falls back to the fake
    assert f(b"not an image") is None

    # Spark path: decodable images get real features, text gets the fake;
    # deterministic across partitionings
    df = spark.createDataFrame(
        [(1, _encode_jpeg(base, q_val=4)), (2, b"opaque text")],
        "key bigint, payload binary")
    out = {r.key: list(r.features)
           for r in multimodal.extract_features(df, dim=64).collect()}
    assert np.allclose(out[1], f(_encode_jpeg(base, q_val=4), dim=64),
                       atol=1e-6)
    assert len(out[2]) == 64  # fake fallback, correct dimensionality
    again = {r.key: list(r.features)
             for r in multimodal.extract_features(
                 df.repartition(3), dim=64).collect()}
    assert out == again


def test_image_features_degenerate_inputs():
    """Review findings: 1xN strips must not crash np.gradient at dim>96,
    and uniform-black images must still land identical copies at
    cosine 1 (canonical basis vector, not a zero vector)."""
    strip = _encode_jpeg(np.full((1, 5), 7, np.uint8), q_val=1)
    for dim in (64, 112):
        v = multimodal.image_features(strip, dim=dim)
        assert v is not None and len(v) == dim
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-6)
    black = _encode_jpeg(np.zeros((16, 16), np.uint8), q_val=1)
    a = np.array(multimodal.image_features(black, dim=64))
    b = np.array(multimodal.image_features(black, dim=64))
    assert float(a @ b) == pytest.approx(1.0, abs=1e-9)
    assert np.linalg.norm(a) == pytest.approx(1.0, abs=1e-9)
