"""Minimal pure-Python baseline JPEG codec — the second BUILT-IN real
decoder for the multimodal operators (``decode_media(decoder="jpeg")``,
``phash_media(decoder="jpeg")``), closing the gap VERDICT r11 ranked
first: real crawl images are overwhelmingly JPEG, and until now the
real-decode path (``operators/png.py``, round 11) only ran on PNG.

Needs nothing beyond the stdlib + numpy: marker walk, DQT/DHT/SOF0/
SOS/DRI parsing, canonical Huffman decode, dequantize, 8x8 IDCT (one
numpy matrix sandwich per block), sampling-factor plane assembly.

Scope (documented, loud errors outside it): BASELINE SEQUENTIAL DCT
(SOF0) only — progressive (SOF2), extended sequential (SOF1),
lossless, arithmetic coding, hierarchical and 12-bit variants raise
with the marker named; 1-component (gray) and 3-component (YCbCr)
images with any sampling factors in {1, 2, 4}; one interleaved scan;
restart intervals supported.  That covers the overwhelming majority
of crawl/thumbnail JPEGs (libjpeg's default output is exactly this
shape).  The entropy decode is per-symbol Python — right for
thumbnails and fixtures riding Arrow batches, NOT for 100 TB of 4K
frames; at that scale inject a native decoder (PIL/turbojpeg) through
the same ``decoder=`` seam.  Format layout follows the public ITU
T.81 / ISO 10918-1 spec and its Annex K example tables; no
third-party code.

Grayscale convention: the decoder returns the Y (luma) PLANE directly
— for JFIF YCbCr that IS the BT.601 luma (0.299 R + 0.587 G +
0.114 B) the PNG codec computes, so the two decoders feed
``phash_value`` the same quantity.  Chroma blocks are entropy-decoded
(the bitstream can't be advanced otherwise) but never dequantized or
IDCT'd — only luma is emitted.

The encoder is the FIXTURE side (like ``encode_png``): gray or RGB
input, quality-scaled Annex-K quantization tables, the Annex-K
Huffman tables, 4:4:4 or 4:2:0 subsampling, optional restart
interval — enough surface to exercise every decoder branch in tests
and to plant REAL re-encoded near-dup pairs without PIL.
"""

from __future__ import annotations

import struct

__all__ = ["decode_jpeg", "encode_jpeg", "jpeg_features", "jpeg_resize"]

# zigzag index: _ZIGZAG[k] = natural (row-major) position of the k-th
# coefficient in scan order (public T.81 Figure A.6)
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 / K.2 example quantization tables (luminance, chrominance)
_QL = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_QC = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3-K.6 example Huffman specs: (BITS[1..16], HUFFVAL)
_DC_L = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_C = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# markers the baseline decoder must REJECT by name: every SOFn except
# SOF0 describes a coding process outside this codec's scope
_SOF_UNSUPPORTED = {
    0xC1: "SOF1 (extended sequential)",
    0xC2: "SOF2 (progressive)",
    0xC3: "SOF3 (lossless)",
    0xC5: "SOF5", 0xC6: "SOF6", 0xC7: "SOF7",
    0xC9: "SOF9 (arithmetic)", 0xCA: "SOF10 (progressive arithmetic)",
    0xCB: "SOF11", 0xCD: "SOF13", 0xCE: "SOF14", 0xCF: "SOF15",
}


def _dct_matrix():
    """Orthonormal 8x8 DCT-II basis C: forward = C @ f @ C.T, inverse
    = C.T @ F @ C (exactly inverse because C is orthogonal)."""
    import numpy as np

    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    c[0, :] /= np.sqrt(2.0)
    return c


def _canonical_codes(bits, huffval):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 C.2."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, huffval):
    """(BITS, HUFFVAL) -> {(length, code): symbol} for bitwise decode."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return out


# ----------------------------------------------------------------------
# decoder
# ----------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over an already-unstuffed entropy segment."""

    __slots__ = ("d", "i", "acc", "n")

    def __init__(self, data: bytes):
        self.d = data
        self.i = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.i >= len(self.d):
                raise ValueError("decode_jpeg: truncated entropy data")
            self.acc = self.d[self.i]
            self.i += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("decode_jpeg: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: the s low bits v -> signed coefficient."""
    if s and v < (1 << (s - 1)):
        return v - (1 << s) + 1
    return v


def _split_scan(buf: bytes, pos: int):
    """Entropy-coded data from ``pos`` -> list of unstuffed segments
    (split at RSTn markers) + the index of the terminating marker."""
    segs = []
    cur = bytearray()
    i = pos
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("decode_jpeg: truncated scan (dangling FF)")
        m = buf[i + 1]
        if m == 0x00:               # stuffed FF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:     # RSTn: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                       # any real marker ends the scan
            break
    segs.append(bytes(cur))
    return segs, i


# ring-wide decompression-bomb guard (the webp._MAX_PIXELS_DEFAULT
# precedent): crawl bytes are untrusted, and a 16-bit SOF header can
# claim 65535x65535 = 4.3e9 pixels — ~34 GB of float64 — from a
# kilobyte of input.  ~4 MP covers crawl imagery; raise per call for
# trusted archives.
_MAX_PIXELS_DEFAULT = 1 << 22


def decode_jpeg(payload: bytes, max_pixels: int = _MAX_PIXELS_DEFAULT):
    """Baseline JPEG bytes -> 2-D float64 grayscale array (rows x
    cols) — the luma plane, the shape :func:`multimodal.phash_value`
    consumes.  Raises ValueError on malformed input, anything
    outside the documented baseline scope (progressive and other SOFn
    are named in the error), or a header claiming more than
    ``max_pixels`` pixels (the decompression-bomb guard)."""
    import numpy as np

    if payload is None:
        raise ValueError("decode_jpeg: payload is None")
    buf = bytes(payload)
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        raise ValueError("decode_jpeg: not a JPEG (missing SOI)")

    qt: dict[int, list[int]] = {}        # id -> 64 natural-order values
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = None                         # [(cid, h, v, tq)]
    size = None                          # (height, width)
    restart = 0
    scan = None                          # ([(ci, dc_tbl, ac_tbl)], pos)

    i = 2
    while i + 4 <= len(buf):
        if buf[i] != 0xFF:
            raise ValueError("decode_jpeg: expected marker, got data")
        m = buf[i + 1]
        if m == 0xFF:                    # optional fill byte before a marker
            i += 1
            continue
        if m == 0xD8:
            raise ValueError("decode_jpeg: unexpected second SOI")
        if m == 0xD9:
            break
        (ln,) = struct.unpack(">H", buf[i + 2 : i + 4])
        seg = buf[i + 4 : i + 2 + ln]
        if len(seg) != ln - 2:
            raise ValueError("decode_jpeg: truncated segment")
        if m in _SOF_UNSUPPORTED:
            raise ValueError(
                f"decode_jpeg: {_SOF_UNSUPPORTED[m]} is outside the "
                "baseline-sequential scope — inject a full decoder "
                "(PIL/turbojpeg) through the decoder= seam"
            )
        if m == 0xDB:                    # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = list(seg[p : p + 64])
                    p += 64
                else:                    # 16-bit table
                    vals = [
                        struct.unpack(">H", seg[p + 2 * k : p + 2 * k + 2])[0]
                        for k in range(64)
                    ]
                    p += 128
                if len(vals) < 64:
                    raise ValueError("decode_jpeg: truncated DQT")
                nat = [0] * 64
                for k in range(64):
                    nat[_ZIGZAG[k]] = vals[k]
                qt[tq] = nat
        elif m == 0xC4:                  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("decode_jpeg: truncated DHT")
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(
                    bits, vals
                )
                p += 17 + nv
        elif m == 0xC0:                  # SOF0: baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(
                    f"decode_jpeg: {prec}-bit precision unsupported "
                    "(baseline is 8-bit)"
                )
            if nc not in (1, 3):
                raise ValueError(
                    f"decode_jpeg: {nc}-component images unsupported "
                    "(gray or YCbCr only; CMYK needs a full decoder)"
                )
            if h == 0 or w == 0:
                raise ValueError("decode_jpeg: zero-sized image")
            if w * h > max_pixels:
                raise ValueError(
                    f"decode_jpeg: {w}x{h} exceeds the {max_pixels}-"
                    "pixel bomb guard (pass max_pixels= to raise it)"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2, 4) or vs not in (1, 2, 4):
                    raise ValueError(
                        f"decode_jpeg: sampling factors {hs}x{vs} "
                        "outside {1,2,4}"
                    )
                comps.append((cid, hs, vs, tq))
            size = (h, w)
        elif m == 0xDD:                  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:                  # SOS
            if comps is None:
                raise ValueError("decode_jpeg: SOS before SOF0")
            ns = seg[0]
            if ns != len(comps):
                raise ValueError(
                    "decode_jpeg: non-interleaved multi-scan baseline "
                    "unsupported (scan must cover all components)"
                )
            sel = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                ci = next(
                    (k for k, cc in enumerate(comps) if cc[0] == cs), None
                )
                if ci is None:
                    raise ValueError(
                        f"decode_jpeg: scan references unknown "
                        f"component {cs}"
                    )
                sel.append((ci, tt >> 4, tt & 0x0F))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            if (ss, se, a) != (0, 63, 0):
                raise ValueError(
                    "decode_jpeg: spectral selection / successive "
                    "approximation is progressive-only"
                )
            scan = (sel, i + 2 + ln)
            break
        # APPn / COM / anything else: skip
        i += 2 + ln

    if scan is None:
        raise ValueError("decode_jpeg: no scan found (missing SOS)")
    sel, pos = scan
    h, w = size
    if len(comps) == 1:
        # T.81 A.2.2: an Ns=1 scan is NON-interleaved — the MCU is one
        # data unit and the declared sampling factors do NOT group
        # blocks; geometry is ceil(w/8) x ceil(h/8) in raster order.
        # (Real files hit this: jpegtran -grayscale keeps Y's 2x2
        # factors.)  Force effective 1x1 so the MCU loop below walks
        # one block per MCU.
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    segs, _end = _split_scan(buf, pos)

    # luma plane only — chroma blocks are entropy-decoded to advance
    # the bitstream but never dequantized/IDCT'd (module docstring)
    y_ci = 0
    _, yh, yv, ytq = comps[y_ci]
    if ytq not in qt:
        raise ValueError(f"decode_jpeg: missing quant table {ytq}")
    yq = np.asarray(qt[ytq], dtype=np.float64).reshape(8, 8)
    yplane = np.zeros((mcuy * yv * 8, mcux * yh * 8), dtype=np.float64)

    C = _dct_matrix()
    Ct = C.T
    pred = [0] * len(comps)
    seg_idx = 0
    reader = _BitReader(segs[0])
    coef = np.zeros(64, dtype=np.float64)

    for my in range(mcuy):
        for mx in range(mcux):
            mcu_no = my * mcux + mx
            if restart and mcu_no and mcu_no % restart == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError(
                        "decode_jpeg: missing restart segment"
                    )
                reader = _BitReader(segs[seg_idx])
                pred = [0] * len(comps)
            for ci, tdc, tac in sel:
                _, hs, vs, _tq = comps[ci]
                try:
                    dct = huff_dc[tdc]
                    act = huff_ac[tac]
                except KeyError:
                    raise ValueError(
                        "decode_jpeg: scan references undefined "
                        "Huffman table"
                    ) from None
                for by in range(vs):
                    for bx in range(hs):
                        coef[:] = 0.0
                        s = reader.huff(dct)
                        if s > 11:
                            raise ValueError(
                                "decode_jpeg: invalid DC category"
                            )
                        diff = _extend(reader.bits(s), s) if s else 0
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if rs == 0x00:      # EOB
                                    break
                                if rs == 0xF0:      # ZRL
                                    k += 16
                                    continue
                                raise ValueError(
                                    "decode_jpeg: invalid AC symbol"
                                )
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "decode_jpeg: AC run past block end"
                                )
                            coef[_ZIGZAG[k]] = _extend(reader.bits(s), s)
                            k += 1
                        if ci == y_ci:
                            blk = coef.reshape(8, 8) * yq
                            px = Ct @ blk @ C + 128.0
                            r0 = (my * yv + by) * 8
                            c0 = (mx * yh + bx) * 8
                            yplane[r0 : r0 + 8, c0 : c0 + 8] = px
    np.clip(yplane, 0.0, 255.0, out=yplane)
    return yplane[:h, :w]


# ----------------------------------------------------------------------
# encoder (fixture side)
# ----------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:               # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _scale_q(base: list[int], quality: int) -> list[int]:
    """IJG quality scaling of a base table (public libjpeg formula)."""
    if not 1 <= quality <= 100:
        raise ValueError("encode_jpeg: quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(max((b * scale + 50) // 100, 1), 255) for b in base]


def _encode_block(bw, coef_z, pred, dc_codes, ac_codes):
    """One quantized zigzag block -> Huffman bits; returns new DC pred."""
    dc = int(coef_z[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_z[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_z[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
    return dc


def encode_jpeg(
    img,
    quality: int = 85,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """2-D (grayscale) or HxWx3 (RGB) array -> baseline JPEG bytes
    (Annex-K Huffman tables, quality-scaled Annex-K quant tables,
    JFIF APP0).  ``subsampling`` is ``"4:4:4"`` or ``"4:2:0"`` (RGB
    only); ``restart_interval`` > 0 emits DRI + RSTn markers every
    that many MCUs.  Values are clipped to [0, 255]."""
    import numpy as np

    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 2:
        ncomp = 1
    elif a.ndim == 3 and a.shape[2] == 3:
        ncomp = 3
    else:
        raise ValueError(
            "encode_jpeg: expected HxW (gray) or HxWx3 (RGB) array"
        )
    if a.shape[0] == 0 or a.shape[1] == 0:
        raise ValueError("encode_jpeg: zero-sized image")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(
            "encode_jpeg: subsampling must be '4:4:4' or '4:2:0'"
        )
    if restart_interval < 0:
        raise ValueError("encode_jpeg: restart_interval must be >= 0")
    a = np.clip(a, 0.0, 255.0)
    h, w = a.shape[0], a.shape[1]

    if ncomp == 1:
        planes = [a]
        samp = [(1, 1)]
        qids = [0]
        qtabs = [_scale_q(_QL, quality)]
    else:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "4:2:0":
            # pad to even, then 2x2 box average
            ph = h + (h & 1)
            pw = w + (w & 1)

            def _half(p):
                q = np.empty((ph, pw))
                q[:h, :w] = p
                if ph > h:
                    q[h:, :w] = p[h - 1 :, :]
                if pw > w:
                    q[:, w:] = q[:, w - 1 : w]
                return (
                    q[0::2, 0::2] + q[1::2, 0::2]
                    + q[0::2, 1::2] + q[1::2, 1::2]
                ) / 4.0

            planes = [y, _half(cb), _half(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qids = [0, 1, 1]
        qtabs = [_scale_q(_QL, quality), _scale_q(_QC, quality)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # pad each plane to its MCU-covered size by edge replication
    padded = []
    for p, (hs, vs) in zip(planes, samp):
        th, tw = mcuy * vs * 8, mcux * hs * 8
        q = np.empty((th, tw))
        sh, sw = p.shape
        q[:sh, :sw] = p
        if th > sh:
            q[sh:, :sw] = p[sh - 1 :, :]
        if tw > sw:
            q[:, sw:] = q[:, sw - 1 : sw]
        padded.append(q)

    C = _dct_matrix()
    Ct = C.T
    # _QL/_QC (and _scale_q's output) are in NATURAL row-major order —
    # use them directly; the zigzag reordering belongs to the DQT
    # emission below, not here (applying _ZIGZAG here would quantize
    # with a permuted matrix: coarse quantizers landing on low
    # frequencies, which silently breaks the Annex-K loss profile
    # while staying self-consistent in the emitted file)
    qnat = [np.asarray(t, dtype=np.float64).reshape(8, 8) for t in qtabs]

    dc_codes = [_canonical_codes(*_DC_L), _canonical_codes(*_DC_C)]
    ac_codes = [_canonical_codes(*_AC_L), _canonical_codes(*_AC_C)]
    tids = [0] + [1] * (ncomp - 1)

    bw = _BitWriter()
    pred = [0] * ncomp
    entropy = bytearray()
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            mcu_no = my * mcux + mx
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                bw.flush()
                entropy += bw.out
                entropy += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                bw = _BitWriter()
                pred = [0] * ncomp
            for ci in range(ncomp):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        r0 = (my * vs + by) * 8
                        c0 = (mx * hs + bx) * 8
                        blk = padded[ci][r0 : r0 + 8, c0 : c0 + 8] - 128.0
                        dct = C @ blk @ Ct
                        qz = np.round(dct / qnat[qids[ci]]).astype(np.int64)
                        coef_z = [int(qz.flat[_ZIGZAG[k]]) for k in range(64)]
                        pred[ci] = _encode_block(
                            bw, coef_z, pred[ci],
                            dc_codes[tids[ci]], ac_codes[tids[ci]],
                        )
    bw.flush()
    entropy += bw.out

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for qid, tab in enumerate(qtabs):
        # DQT carries the table in ZIGZAG scan order: byte k is the
        # coefficient at natural position _ZIGZAG[k]
        out += seg(0xDB, bytes([qid]) + bytes(tab[_ZIGZAG[k]] for k in range(64)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qids[ci]])
    out += seg(0xC0, sof)
    for tc, specs in ((0, (_DC_L, _DC_C)), (1, (_AC_L, _AC_C))):
        for th in range(2 if ncomp == 3 else 1):
            bits, vals = specs[th]
            out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (tids[ci] << 4) | tids[ci]])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_resize(payload: bytes, width: int, height: int) -> bytes:
    """The ``resize_media(resizer="jpeg")`` built-in: decode a baseline
    JPEG, nearest-neighbour resample the luma plane to height x width
    (the same index-sampling convention as ``png_resize`` /
    ``multimodal.phash_value``), re-encode as a grayscale baseline
    JPEG (quality 90).  Raises ValueError on non-JPEG payloads — a
    loud wrong-format signal beats silently passing bytes through."""
    from zeek_duckdb_spark.operators.raster import nn_resample

    if width < 1 or height < 1:
        raise ValueError("jpeg_resize: width/height must be >= 1")
    return encode_jpeg(nn_resample(decode_jpeg(payload), width, height), quality=90)


def jpeg_features(payload: bytes) -> list:
    """The ``decode_media(decoder="jpeg")`` built-in: decode and emit
    ``[width, height, mean_gray, std_gray]`` (population std), all
    float64 — the exact shape of :func:`png.png_features`, so mixed
    corpora produce comparable feature rows."""
    g = decode_jpeg(payload)
    return [
        float(g.shape[1]),
        float(g.shape[0]),
        float(g.mean()),
        float(g.std()),
    ]
