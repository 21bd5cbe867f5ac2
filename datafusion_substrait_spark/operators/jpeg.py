"""Baseline JPEG (ITU-T T.81) decoder — pure Python + numpy, no codec lib.

Completes the image-decode story (PNG/GIF/BMP live in ``multimodal.py``):
``decode_jpeg`` handles the baseline sequential DCT process that covers
the overwhelming majority of real JPEGs — SOF0, 8-bit samples, Huffman
entropy coding, grayscale or YCbCr with arbitrary sampling factors
(4:4:4 / 4:2:2 / 4:2:0 ...), restart markers, 0xFF00 byte stuffing,
JFIF/EXIF APPn segments. Progressive (SOF2), arithmetic coding and
12-bit depth raise ``ValueError`` — swap in a library ``decode_fn`` at
the multimodal seam for those.

Performance note: this is a correctness/portability decoder for header
fixtures, thumbnails and sampled frames (pure-Python Huffman is ~100×
slower than libjpeg). Bulk 100 TB pixel work should supply a library
``decode_fn`` at the seam; the Spark-side plumbing is identical.
"""

from __future__ import annotations

import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _idct_matrix():
    """8-point DCT-II basis M with M[u, x] = C(u)/2 * cos((2x+1)uπ/16);
    2-D IDCT of block B is then M.T @ B @ M (T.81 A.3.3)."""
    import numpy as np

    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    m[0, :] /= np.sqrt(2.0)
    return m


class _Huff:
    """Canonical Huffman table from the DHT BITS/HUFFVAL lists: a dict
    keyed by (code_length, code_value) — O(1) per candidate length and
    at most 16 probes per symbol, plenty for fixture-scale decoding."""

    def __init__(self, bits, vals):
        self.lut = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    de-stuffing; RSTn markers are consumed by ``restart()``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data exhausted")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise ValueError("JPEG hit restart marker mid-symbol")
            else:
                # EOI or another marker: pad with 1-bits per T.81 F.2.2.5
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def restart(self, n: int) -> None:
        """Consume the byte-aligned RSTn marker between intervals."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        # skip fill bytes to the marker
        while self.pos + 1 < len(d) and d[self.pos] == 0xFF \
                and d[self.pos + 1] == 0xFF:
            self.pos += 1
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF \
                or d[self.pos + 1] != 0xD0 + (n & 7):
            raise ValueError("JPEG missing expected restart marker")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes):
    """Decode a baseline JPEG to a ``(height, width, channels)`` uint8
    array (channels 1 for grayscale, 3 for RGB via JFIF full-range
    BT.601). Raises ``ValueError`` on non-baseline or malformed input —
    including truncated segments and dangling table references, which
    would otherwise surface as struct.error/KeyError/IndexError and
    escape the ValueError-only stage-survival catch at the resize seam."""
    try:
        return _decode_jpeg(data)
    except (struct.error, KeyError, IndexError) as exc:
        raise ValueError(f"malformed JPEG: {exc}") from exc


def _decode_jpeg(data: bytes):
    import numpy as np

    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, object] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    sof = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                n = 64 * (2 if prec else 1)
                raw = body[i + 1:i + 1 + n]
                vals = (struct.unpack(">64H", raw) if prec
                        else list(raw))
                tbl = np.zeros(64, np.int32)
                tbl[ZIGZAG] = vals  # stored in zigzag order
                qt[tid] = tbl.reshape(8, 8)
                i += 1 + n
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                (huff_ac if cls else huff_dc)[tid] = _Huff(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            depth, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if depth != 8:
                raise ValueError(f"only 8-bit JPEG supported, got {depth}")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            sof = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}) not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[0:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = [(body[1 + 2 * i], body[2 + 2 * i] >> 4,
                     body[2 + 2 * i] & 0xF) for i in range(ns)]
            pos = pos + 2 + seglen
            break
        elif marker == 0xD9:
            raise ValueError("JPEG EOI before scan data")
        pos += 2 + seglen
    if sof is None or scan is None:
        raise ValueError("JPEG missing SOF or SOS")
    h, w, comps = sof
    if h == 0 or w == 0:
        raise ValueError("JPEG zero-sized image")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    m = _idct_matrix()

    # per-component full-resolution-at-component-scale planes
    planes = {}
    order = []
    for cid, ch, cv, tq in comps:
        sdc = sac = None
        for sid, dc_id, ac_id in scan:
            if sid == cid:
                sdc, sac = dc_id, ac_id
        if sdc is None:
            raise ValueError("JPEG scan does not cover a frame component")
        planes[cid] = np.zeros((mcuy * cv * 8, mcux * ch * 8), np.float64)
        order.append((cid, ch, cv, qt[tq], huff_dc[sdc], huff_ac[sac]))

    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in order}
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_i = my * mcux + mx
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                reader.restart(rst)
                rst = (rst + 1) & 7
                pred = {cid: 0 for cid, *_ in order}
            for cid, ch, cv, q, hdc, hac in order:
                for by in range(cv):
                    for bx in range(ch):
                        blk = np.zeros(64, np.float64)
                        t = reader.huff(hdc)
                        diff = _extend(reader.bits(t), t)
                        pred[cid] += diff
                        blk[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = reader.huff(hac)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            blk[ZIGZAG[k]] = _extend(reader.bits(s), s)
                            k += 1
                        coef = blk.reshape(8, 8) * q
                        px = m.T @ coef @ m + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0:y0 + 8, x0:x0 + 8] = px

    # upsample to full resolution and crop
    out = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, 0), hmax // ch, 1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(out) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out)}")
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
