"""Pure-Python WebP **lossless** (VP8L) codec — the crawl-thumbnail
format PNG/JPEG/GIF don't cover (`multimodal.decode_media` previously
raised for RIFF/WEBP payloads; reference scope note at
`multimodal.py`).  Zero third-party code: the bitstream layout follows
the public **WebP Lossless Bitstream Specification** (the VP8L format
shipped in libwebp and documented at developers.google.com/speed/webp/
docs/webp_lossless_bitstream_specification) — prefix-coded ARGB with
an optional color cache, LZ77 backward references with the 120-entry
2-D distance-plane map, meta prefix groups, and the four transforms
(predictor / color / subtract-green / color-indexing with sub-byte
packing).  The constants transcribed here (code-length-code order,
plane-code byte map, predictor modes) are spec tables, not library
code.

Scope, stated loudly: LOSSY VP8 frames (fourcc ``VP8 ``) are a DCT
video-intra codec — out of pure-Python scope by design, exactly like
MP4/H.264 in ``sample_frames`` (`multimodal.py`); ``decode_webp``
raises a naming error for them and the ``decoder=`` callback seam
takes a PIL/libwebp-backed decoder where lossy coverage matters.
VP8X extended containers are walked for their VP8L chunk; animations
(ANMF) are rejected loudly.

``encode_webp`` is the FIXTURE side (the ``encode_png``/``encode_gif``
pattern): spec-compliant VP8L streams so tests plant real encoded
bytes without PIL.  The encoder can emit each decoder feature on
demand (subtract-green, color cache, LZ77 runs via both plane-coded
and direct distances, a left-predictor transform, a constant color
transform, palette indexing with packing), so every decode path is
round-trip-tested against independently computed pixel arrays —
there is no independent WebP encoder in this container, so the
cross-format near-dup pin against the established PNG codec
(tests/test_webp.py) is the external anchor.

Scale shape: like the sibling codecs this is a per-payload Python
kernel used inside Arrow-batched maps (``decode_media(decoder=
"webp")``) — one narrow map, zero shuffle; the pure-Python rate is
the documented honest floor and the ``decoder=`` seam takes a native
library for more.
"""

from __future__ import annotations

import struct

__all__ = [
    "decode_webp",
    "encode_webp",
    "webp_resize",
    "webp_features",
    "decode_vp8l_argb",
]

# spec: order in which code-length-code lengths are stored
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# spec: the 120-entry distance-plane map; byte b -> (dy = b >> 4,
# dx = 8 - (b & 0xF)); dist = dy * xsize + dx, clamped to >= 1
_CODE_TO_PLANE = bytes([
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1A,
    0x26, 0x2A, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1B, 0x36, 0x3A,
    0x25, 0x2B, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1C, 0x35, 0x3B,
    0x46, 0x4A, 0x24, 0x2C, 0x58, 0x45, 0x4B, 0x34, 0x3C, 0x03,
    0x57, 0x59, 0x13, 0x1D, 0x56, 0x5A, 0x23, 0x2D, 0x44, 0x4C,
    0x55, 0x5B, 0x33, 0x3D, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1E,
    0x66, 0x6A, 0x22, 0x2E, 0x54, 0x5C, 0x43, 0x4D, 0x65, 0x6B,
    0x32, 0x3E, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5D, 0x11, 0x1F,
    0x64, 0x6C, 0x42, 0x4E, 0x76, 0x7A, 0x21, 0x2F, 0x75, 0x7B,
    0x31, 0x3F, 0x63, 0x6D, 0x52, 0x5E, 0x00, 0x74, 0x7C, 0x41,
    0x4F, 0x10, 0x08, 0x62, 0x6E, 0x30, 0x73, 0x7D, 0x51, 0x5F,
    0x20, 0x09, 0x72, 0x7E, 0x61, 0x6F, 0x50, 0x71, 0x7F, 0x40,
])

_GREEN_EXTRA = 24  # LZ77 length codes appended to the green alphabet


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


class _BitReader:
    """LSB-first bit reader (spec: values are little-endian
    bit-packed; prefix codes are then read one bit at a time)."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def read(self, nbits: int) -> int:
        if self.pos + nbits > self.n:
            raise ValueError("decode_webp: truncated VP8L stream")
        v = 0
        p = self.pos
        d = self.data
        for i in range(nbits):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + nbits
        return v

    def read_bit(self) -> int:
        if self.pos >= self.n:
            raise ValueError("decode_webp: truncated VP8L stream")
        b = (self.data[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class _Huffman:
    """Canonical prefix code from code lengths (DEFLATE-style
    assignment: shorter codes first, ties by symbol order).  A code
    with exactly one used symbol is read with ZERO bits (spec)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths):
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("decode_webp: empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            self.table = None
            return
        self.single = None
        max_len = max(ln for ln, _ in used)
        bl_count = [0] * (max_len + 1)
        for ln, _ in used:
            bl_count[ln] += 1
        code = 0
        next_code = [0] * (max_len + 1)
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        # kraft check: an over/under-subscribed code is a corrupt stream
        total = sum(bl_count[ln] << (max_len - ln) for ln in range(1, max_len + 1))
        if total != (1 << max_len):
            raise ValueError("decode_webp: invalid prefix code lengths")
        table = {}
        for ln, sym in sorted(used):
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
        self.table = table

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        table = self.table
        for _ in range(16):  # spec max code length is 15
            code = (code << 1) | br.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("decode_webp: prefix code desync")


def _read_code_lengths(br: _BitReader, alphabet_size: int):
    """Complex prefix-code header: a code-length code (3-bit lengths
    in _CLC_ORDER), then run-length-coded code lengths (symbols 16/17/
    18 repeat per spec), optionally bounded by an explicit
    max_symbol."""
    num_clc = 4 + br.read(4)
    if num_clc > len(_CLC_ORDER):
        raise ValueError("decode_webp: bad code-length-code count")
    clc_lens = [0] * 19
    for i in range(num_clc):
        clc_lens[_CLC_ORDER[i]] = br.read(3)
    clc = _Huffman(clc_lens)
    if br.read_bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = clc.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            if i + rep > alphabet_size:
                raise ValueError("decode_webp: code-length repeat overflow")
            for _ in range(rep):
                lengths[i] = prev
                i += 1
        elif s == 17:
            i += 3 + br.read(3)
        else:
            i += 11 + br.read(7)
        if i > alphabet_size:
            raise ValueError("decode_webp: code-length repeat overflow")
    return lengths


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Huffman:
    if br.read_bit():  # simple code: 1 or 2 literal symbols
        num_symbols = br.read_bit() + 1
        first_8bit = br.read_bit()
        s0 = br.read(8) if first_8bit else br.read_bit()
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            if s0 >= alphabet_size:
                raise ValueError("decode_webp: simple-code symbol overflow")
            lengths[s0] = 1  # _Huffman single-symbol path reads 0 bits
        else:
            s1 = br.read(8)
            if s0 >= alphabet_size or s1 >= alphabet_size or s0 == s1:
                raise ValueError("decode_webp: bad simple code symbols")
            lengths[s0] = lengths[s1] = 1
        return _Huffman(lengths)
    return _Huffman(_read_code_lengths(br, alphabet_size))


def _prefix_value(br: _BitReader, code: int) -> int:
    """LZ77 length/distance value from its prefix code symbol + extra
    bits (spec: codes 0-3 are the values 1-4; above that, each pair of
    codes doubles the range)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _decode_entropy_coded(br: _BitReader, w: int, h: int, allow_meta: bool):
    """The spatially-coded pixel stream: optional color cache,
    optional meta prefix (entropy image selecting one of N prefix-code
    groups per block), then the literal / backward-reference / cache
    symbol loop.  Returns a list of w*h ARGB uint32 values."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("decode_webp: bad color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta_img = None
    meta_bits = 0
    meta_w = 0
    num_groups = 1
    if allow_meta and br.read_bit():
        meta_bits = br.read(3) + 2
        meta_w = _ceil_div(w, 1 << meta_bits)
        meta_h = _ceil_div(h, 1 << meta_bits)
        meta_img = _decode_image_stream(br, meta_w, meta_h, False)
        num_groups = max((p >> 8) & 0xFFFF for p in meta_img) + 1

    sizes = (256 + _GREEN_EXTRA + cache_size, 256, 256, 256, 40)
    groups = [
        [_read_prefix_code(br, sz) for sz in sizes] for _ in range(num_groups)
    ]

    npix = w * h
    pixels = [0] * npix
    pos = 0
    x = 0
    y = 0
    group = groups[0]
    while pos < npix:
        if meta_img is not None:
            mp = meta_img[(y >> meta_bits) * meta_w + (x >> meta_bits)]
            group = groups[(mp >> 8) & 0xFFFF]
        g_code, r_code, b_code, a_code, d_code = group
        s = g_code.decode(br)
        if s < 256:
            red = r_code.decode(br)
            blue = b_code.decode(br)
            alpha = a_code.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            pixels[pos] = px
            if cache_bits:
                cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
        elif s < 256 + _GREEN_EXTRA:
            length = _prefix_value(br, s - 256)
            dist_val = _prefix_value(br, d_code.decode(br))
            if dist_val <= 120:
                b = _CODE_TO_PLANE[dist_val - 1]
                dist = (b >> 4) * w + (8 - (b & 0xF))
                if dist < 1:
                    dist = 1
            else:
                dist = dist_val - 120
            if dist > pos or pos + length > npix:
                raise ValueError("decode_webp: backward reference out of range")
            for _ in range(length):
                px = pixels[pos - dist]
                pixels[pos] = px
                if cache_bits:
                    cache[
                        ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                pos += 1
            x = pos % w
            y = pos // w
        else:
            idx = s - 256 - _GREEN_EXTRA
            if idx >= cache_size:
                raise ValueError("decode_webp: color-cache index overflow")
            px = cache[idx]
            pixels[pos] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
    return pixels


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8
        | ((a & 0xFF) + (b & 0xFF)) >> 1
    )


def _clamp255(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clamp255(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
        out |= c << sh
    return out


def _clamp_add_sub_half(ave: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        # C-semantics truncation toward zero for (a - b) / 2
        d = a - b
        c = _clamp255(a + (abs(d) // 2 if d >= 0 else -(abs(d) // 2)))
        out |= c << sh
    return out


def _select(t: int, l: int, tl: int) -> int:
    pa = sum(abs(((l >> sh) & 0xFF) - ((tl >> sh) & 0xFF)) for sh in (24, 16, 8, 0))
    pb = sum(abs(((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)) for sh in (24, 16, 8, 0))
    return t if pa <= pb else l


def _add_pixels(residual: int, pred: int) -> int:
    return (
        ((((residual >> 24) & 0xFF) + ((pred >> 24) & 0xFF)) & 0xFF) << 24
        | ((((residual >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
        | ((((residual >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
        | (((residual & 0xFF) + (pred & 0xFF)) & 0xFF)
    )


def _apply_inverse_predictor(pixels, w, h, bits, modes):
    mw = _ceil_div(w, 1 << bits)
    for pos in range(w * h):
        x = pos % w
        y = pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = pixels[pos - 1]  # first row: left
        elif x == 0:
            pred = pixels[pos - w]  # first column: top
        else:
            mode = (modes[(y >> bits) * mw + (x >> bits)] >> 8) & 0xFF
            left = pixels[pos - 1]
            top = pixels[pos - w]
            tl = pixels[pos - w - 1]
            tr = pixels[pos - w + 1]  # last column: current row's first
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = left
            elif mode == 2:
                pred = top
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = _avg2(_avg2(left, tr), top)
            elif mode == 6:
                pred = _avg2(left, tl)
            elif mode == 7:
                pred = _avg2(left, top)
            elif mode == 8:
                pred = _avg2(tl, top)
            elif mode == 9:
                pred = _avg2(top, tr)
            elif mode == 10:
                pred = _avg2(_avg2(left, tl), _avg2(top, tr))
            elif mode == 11:
                pred = _select(top, left, tl)
            elif mode == 12:
                pred = _clamp_add_sub_full(left, top, tl)
            elif mode == 13:
                pred = _clamp_add_sub_half(_avg2(left, top), tl)
            else:
                raise ValueError(f"decode_webp: bad predictor mode {mode}")
        pixels[pos] = _add_pixels(pixels[pos], pred)


def _ct_delta(t: int, c: int) -> int:
    """(signed-char t * signed-char c) >> 5 — the spec's color
    transform delta (arithmetic shift on the signed product)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _apply_inverse_color_transform(pixels, w, h, bits, elements):
    mw = _ceil_div(w, 1 << bits)
    for pos in range(w * h):
        x = pos % w
        y = pos // w
        cte = elements[(y >> bits) * mw + (x >> bits)]
        g2r = cte & 0xFF
        g2b = (cte >> 8) & 0xFF
        r2b = (cte >> 16) & 0xFF
        px = pixels[pos]
        green = (px >> 8) & 0xFF
        red = ((px >> 16) & 0xFF) + _ct_delta(g2r, green) & 0xFF
        blue = (px & 0xFF) + _ct_delta(g2b, green)
        blue = (blue + _ct_delta(r2b, red)) & 0xFF
        pixels[pos] = (px & 0xFF00FF00) | (red << 16) | blue


def _apply_inverse_subtract_green(pixels, n):
    for pos in range(n):
        px = pixels[pos]
        g = (px >> 8) & 0xFF
        red = (((px >> 16) & 0xFF) + g) & 0xFF
        blue = ((px & 0xFF) + g) & 0xFF
        pixels[pos] = (px & 0xFF00FF00) | (red << 16) | blue


def _decode_image_stream(br: _BitReader, w: int, h: int, is_level0: bool):
    """One image stream (spec 'decoding the image data'): transforms
    (top level only), then the entropy-coded image, then inverse
    transforms in reverse read order.  Returns row-major ARGB ints."""
    transforms = []
    seen = set()
    xsize = w
    if is_level0:
        while br.read_bit():
            t = br.read(2)
            if t in seen:
                raise ValueError("decode_webp: duplicate transform")
            seen.add(t)
            if t in (0, 1):  # predictor / color: block-mode sub-image
                bits = br.read(3) + 2
                sub = _decode_image_stream(
                    br, _ceil_div(xsize, 1 << bits), _ceil_div(h, 1 << bits),
                    False,
                )
                transforms.append((t, bits, sub))
            elif t == 2:
                transforms.append((2,))
            else:  # color indexing
                psize = br.read(8) + 1
                pal = _decode_image_stream(br, psize, 1, False)
                # palette entries are delta-coded component-wise
                for i in range(1, psize):
                    pal[i] = _add_pixels(pal[i], pal[i - 1])
                width_bits = (
                    3 if psize <= 2 else 2 if psize <= 4 else
                    1 if psize <= 16 else 0
                )
                transforms.append((3, width_bits, pal, xsize))
                xsize = _ceil_div(xsize, 1 << width_bits)
    pixels = _decode_entropy_coded(br, xsize, h, is_level0)
    for tr in reversed(transforms):
        if tr[0] == 0:
            _apply_inverse_predictor(pixels, xsize, h, tr[1], tr[2])
        elif tr[0] == 1:
            _apply_inverse_color_transform(pixels, xsize, h, tr[1], tr[2])
        elif tr[0] == 2:
            _apply_inverse_subtract_green(pixels, xsize * h)
        else:
            _, width_bits, pal, full_w = tr
            bpp = 8 >> width_bits
            per = 1 << width_bits
            mask = per - 1
            out = [0] * (full_w * h)
            for y in range(h):
                row = y * xsize
                orow = y * full_w
                for x in range(full_w):
                    g = (pixels[row + (x >> width_bits)] >> 8) & 0xFF
                    idx = (g >> ((x & mask) * bpp)) & ((1 << bpp) - 1)
                    # spec: out-of-range palette index decodes black
                    out[orow + x] = pal[idx] if idx < len(pal) else 0
            pixels = out
            xsize = full_w
    return pixels


# decompression-bomb guard: a ~31-byte VALID stream can claim
# 16383x16383 and decode 268M pixels from zero-bit single-symbol
# codes — crawl bytes are untrusted, and one such record would stall
# an executor task for hours (and a checkpointed stream forever).
# 2^22 pixels (~4 MP) covers crawl thumbnails/images with room; raise
# via the parameter for trusted archives.
_MAX_PIXELS_DEFAULT = 1 << 22


def decode_vp8l_argb(payload: bytes, max_pixels: int = _MAX_PIXELS_DEFAULT):
    """WebP bytes (RIFF container) -> HxWx4 uint8 ARGB array via the
    full VP8L decode.  Raises ValueError for non-WebP payloads, lossy
    VP8 frames (callback territory — see module docstring),
    corrupt/truncated streams, and images whose HEADER claims more
    than ``max_pixels`` pixels (the decompression-bomb guard above —
    VP8L's entropy coding legitimately reaches million-to-one ratios,
    so only a pixel cap bounds the work)."""
    import numpy as np

    if payload is None:
        raise ValueError("decode_webp: payload is None")
    b = bytes(payload)
    if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("decode_webp: not a WebP (bad RIFF header)")
    pos = 12
    vp8l = None
    while pos + 8 <= len(b):
        fourcc = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        data = b[pos + 8 : pos + 8 + size]
        if len(data) != size:
            raise ValueError("decode_webp: truncated chunk")
        if fourcc == b"VP8L":
            vp8l = data
            break
        if fourcc == b"VP8 ":
            raise ValueError(
                "decode_webp: lossy VP8 frame — pure-Python scope is "
                "lossless VP8L; inject decoder= (PIL/libwebp) for lossy"
            )
        if fourcc == b"ANMF":
            raise ValueError("decode_webp: animated WebP not supported")
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if vp8l is None:
        raise ValueError("decode_webp: no VP8L chunk found")
    br = _BitReader(vp8l)
    if br.read(8) != 0x2F:
        raise ValueError("decode_webp: bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("decode_webp: unknown VP8L version")
    if w * h > max_pixels:
        raise ValueError(
            f"decode_webp: image claims {w}x{h} = {w * h} pixels, over "
            f"the {max_pixels}-pixel bomb guard (pass max_pixels= to "
            "raise it for trusted archives)"
        )
    pixels = _decode_image_stream(br, w, h, True)
    arr = np.array(pixels, dtype=np.uint32).reshape(h, w)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, 0] = (arr >> 24) & 0xFF
    out[:, :, 1] = (arr >> 16) & 0xFF
    out[:, :, 2] = (arr >> 8) & 0xFF
    out[:, :, 3] = arr & 0xFF
    return out


def decode_webp(payload: bytes, max_pixels: int = _MAX_PIXELS_DEFAULT):
    """WebP (lossless) bytes -> 2-D float64 grayscale array, the shape
    :func:`multimodal.phash_value` consumes.  Gray images (R==G==B)
    return the channel exactly (like PNG color type 0 / the GIF gray
    ramp); color folds to ITU-R BT.601 luma, matching the sibling
    decoders.  ``max_pixels`` is the decompression-bomb guard (see
    :func:`decode_vp8l_argb`)."""
    import numpy as np

    argb = decode_vp8l_argb(payload, max_pixels=max_pixels)
    r = argb[:, :, 1].astype(np.float64)
    g = argb[:, :, 2].astype(np.float64)
    b = argb[:, :, 3].astype(np.float64)
    if (argb[:, :, 1] == argb[:, :, 2]).all() and (
        argb[:, :, 2] == argb[:, :, 3]
    ).all():
        return g
    return 0.299 * r + 0.587 * g + 0.114 * b


class _BitWriter:
    __slots__ = ("bits", "nbits")

    def __init__(self):
        self.bits = bytearray()
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        """LSB-first (header fields, extra bits)."""
        for i in range(nbits):
            if self.nbits & 7 == 0:
                self.bits.append(0)
            if (value >> i) & 1:
                self.bits[-1] |= 1 << (self.nbits & 7)
            self.nbits += 1

    def write_code(self, code: int, nbits: int) -> None:
        """Prefix-code bits, MSB first (the order the decoder's
        bit-by-bit tree walk consumes them)."""
        for i in range(nbits - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        return bytes(self.bits)


def _canonical_codes(lengths):
    """symbol -> (code, length) for the canonical assignment the
    decoder reconstructs."""
    used = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
    if len(used) == 1:
        return {used[0][1]: (0, 0)}  # single symbol: zero bits
    max_len = used[-1][0]
    bl_count = [0] * (max_len + 1)
    for ln, _ in used:
        bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 1)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for ln, sym in used:
        out[sym] = (next_code[ln], ln)
        next_code[ln] += 1
    return out


def _write_prefix_code(bw: _BitWriter, lengths, alphabet_size: int):
    """Emit the prefix-code header for ``lengths`` and return the
    symbol->(code,len) map.  <=2 used symbols (all fitting u8) go out
    as a simple code; otherwise a complex header whose code-length
    code covers the distinct lengths present."""
    used = [sym for sym, ln in enumerate(lengths) if ln > 0]
    if 1 <= len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        if used[0] < 2:
            bw.write(0, 1)
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        return {used[0]: (0, 1), used[1]: (1, 1)}
    bw.write(0, 1)  # complex
    distinct = sorted({ln for ln in lengths})
    # code-length code over the distinct length values (incl. 0)
    if len(distinct) == 1:
        clc_lens = {distinct[0]: 1}
    else:
        # flat code over the distinct values: ceil(log2(k)) bits each,
        # padded to a complete code by giving the first few one fewer
        # bit when k is not a power of two is NOT valid canonical
        # kraft; keep it simple with a balanced code
        k = len(distinct)
        nbits = max(1, (k - 1).bit_length())
        # complete the kraft sum: shorter codes for the first
        # (2**nbits - k) values is invalid unless assigned by length;
        # easiest complete assignment: 2**nbits - k values get
        # nbits-1 bits ONLY if that keeps kraft exact.  Use uniform
        # nbits when k is a power of two, else mix.
        short = (1 << nbits) - k
        clc_lens = {}
        vals = list(distinct)
        for i, v in enumerate(vals):
            clc_lens[v] = (nbits - 1) if i < short and nbits > 1 else nbits
    full = [0] * 19
    for v, ln in clc_lens.items():
        full[v] = ln
    # num_code_lengths must cover every symbol with a nonzero length
    need = max(i for i, o in enumerate(_CLC_ORDER) if full[o] > 0) + 1
    need = max(need, 4)
    bw.write(need - 4, 4)
    for i in range(need):
        bw.write(full[_CLC_ORDER[i]], 3)
    clc_codes = _canonical_codes(full)
    bw.write(0, 1)  # no explicit max_symbol: all lengths follow
    for ln in lengths:
        c, n = clc_codes[ln]
        bw.write_code(c, n)
    return _canonical_codes(lengths)


def _lengths_for(symbols, alphabet_size: int):
    """Code lengths for the used-symbol histogram: <=2 distinct gets
    the simple-code path (length 1 markers); more gets a flat 8-bit
    code over the first 256 symbols (a complete code — the fixture
    encoder's simplicity-over-size tradeoff)."""
    distinct = sorted(set(symbols))
    lengths = [0] * alphabet_size
    if len(distinct) <= 2 and all(s < 256 for s in distinct):
        for s in distinct:
            lengths[s] = 1
        return lengths
    if any(s >= 256 for s in distinct):
        raise ValueError("encode_webp: flat code needs symbols < 256")
    if alphabet_size < 256:
        # latent-landmine guard: the distance alphabet is 40 — a
        # future encoder emitting >2 distinct distance symbols must
        # grow a proper code, not index past the list
        raise ValueError(
            "encode_webp: flat fallback needs alphabet_size >= 256 "
            f"(got {alphabet_size} with {len(distinct)} distinct symbols)"
        )
    for s in range(256):
        lengths[s] = 8
    return lengths


def encode_webp(
    img,
    use_cache_bits: int = 0,
    lz77_runs: bool = False,
    lz77_plane_dist: bool = False,
    predictor_left: bool = False,
    color_transform: int | None = None,
    palette: bool = False,
) -> bytes:
    """2-D (grayscale) or HxWx3 (RGB) uint8-valued array -> lossless
    WebP bytes (RIFF + VP8L).  The fixture encoder: always
    spec-compliant, with switches that turn on individual decoder
    features so tests can exercise each path by round-trip —
    ``use_cache_bits`` (color cache hits), ``lz77_runs`` (horizontal
    run -> backward reference; ``lz77_plane_dist`` codes distance 1 as
    plane code 2 instead of direct value 121), ``predictor_left``
    (predictor transform, all blocks mode 1/left), ``color_transform``
    (one constant transform element byte applied as green_to_red),
    ``palette`` (color-indexing transform with sub-byte packing when
    <=16 distinct gray values).  Gray input additionally rides the
    subtract-green transform so R and B channels cost zero bits."""
    import numpy as np

    a = np.asarray(img)
    if a.ndim == 2:
        gray = True
        a = np.clip(np.round(a.astype(np.float64)), 0, 255).astype(np.uint8)
        h, w = a.shape
        argb = np.empty((h, w, 4), dtype=np.uint8)
        argb[:, :, 0] = 255
        argb[:, :, 1] = argb[:, :, 2] = argb[:, :, 3] = a
    elif a.ndim == 3 and a.shape[2] == 3:
        gray = False
        a = np.clip(np.round(a.astype(np.float64)), 0, 255).astype(np.uint8)
        h, w = a.shape[:2]
        argb = np.empty((h, w, 4), dtype=np.uint8)
        argb[:, :, 0] = 255
        argb[:, :, 1:] = a
    else:
        raise ValueError("encode_webp: expected HxW (gray) or HxWx3 (RGB)")
    if h == 0 or w == 0:
        raise ValueError("encode_webp: zero-sized image")
    if w > 1 << 14 or h > 1 << 14:
        raise ValueError("encode_webp: dimensions exceed the VP8L 14-bit limit")
    if use_cache_bits and not 1 <= use_cache_bits <= 11:
        # 12+ emits a stream the decoder (and the spec) rejects; 16+
        # would silently truncate in the 4-bit header field
        raise ValueError("encode_webp: use_cache_bits must be 0 or 1-11")
    if palette and not gray:
        raise ValueError("encode_webp: palette mode is for gray fixtures")
    if predictor_left and (palette or lz77_runs or use_cache_bits):
        raise ValueError(
            "encode_webp: predictor_left composes with plain literals only"
        )

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version

    # ---- transforms (written in stream order; decoder inverts in
    # reverse) ----
    planes = argb.reshape(-1, 4)  # row-major [A, R, G, B]
    xsize = w

    if palette:
        vals = sorted({int(v) for v in planes[:, 2]})
        if len(vals) > 16:
            raise ValueError("encode_webp: palette mode needs <=16 gray values")
        bw.write(1, 1)
        bw.write(3, 2)
        psize = len(vals)
        bw.write(psize - 1, 8)
        # palette image (psize x 1), delta-coded gray entries
        pal_pixels = []
        prev = 0
        for v in vals:
            d = (v - prev) & 0xFF
            pal_pixels.append((255 if not pal_pixels else 0, d, d, d))
            prev = v
        _encode_literal_stream(bw, pal_pixels)
        width_bits = 3 if psize <= 2 else 2 if psize <= 4 else 1
        bpp = 8 >> width_bits
        per = 1 << width_bits
        lut = {v: i for i, v in enumerate(vals)}
        packed_w = _ceil_div(w, per)
        packed = []
        for y in range(h):
            for px in range(packed_w):
                g = 0
                for k in range(per):
                    x = px * per + k
                    if x < w:
                        g |= lut[int(argb[y, x, 2])] << (k * bpp)
                packed.append((255, 0, g, 0))
        bw.write(0, 1)  # no more transforms
        _encode_entropy(bw, packed, packed_w, use_cache_bits, lz77_runs,
                        lz77_plane_dist)
        return _riff_wrap(bw.bytes())

    if color_transform is not None:
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(0, 3)  # size_bits = 2 -> blocks of 4
        tw, th = _ceil_div(w, 4), _ceil_div(h, 4)
        cte = int(color_transform) & 0xFF
        # element pixel: blue channel carries green_to_red
        _encode_literal_stream(bw, [(255, 0, 0, cte)] * (tw * th))
        # forward transform: red -= delta(g2r, green)
        out = planes.copy()
        for i in range(out.shape[0]):
            g = int(out[i, 2])
            out[i, 1] = (int(out[i, 1]) - _ct_delta(cte, g)) & 0xFF
        planes = out

    if gray and color_transform is None:
        # subtract green: R/B become 0 for gray pixels
        bw.write(1, 1)
        bw.write(2, 2)
        out = planes.copy()
        out[:, 1] = (out[:, 1].astype(np.int16) - out[:, 2]) % 256
        out[:, 3] = (out[:, 3].astype(np.int16) - out[:, 2]) % 256
        planes = out.astype(np.uint8)

    if predictor_left:
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(0, 3)  # size_bits = 2
        tw, th = _ceil_div(w, 4), _ceil_div(h, 4)
        # mode image: green channel = 1 (left)
        _encode_literal_stream(bw, [(255, 0, 1, 0)] * (tw * th))
        # forward: residual = pixel - predictor (spec edge rules)
        res = planes.copy().astype(np.int16)
        src = planes.astype(np.int16)
        for pos in range(w * h - 1, -1, -1):
            x_, y_ = pos % w, pos // w
            if pos == 0:
                pred = (0xFF, 0, 0, 0)
            elif y_ == 0:
                pred = src[pos - 1]
            elif x_ == 0:
                pred = src[pos - w]
            else:
                pred = src[pos - 1]  # mode 1: left
            res[pos] = (src[pos] - pred) % 256
        planes = res.astype(np.uint8)

    bw.write(0, 1)  # no more transforms
    _encode_entropy(
        bw, [tuple(int(v) for v in p) for p in planes], xsize,
        use_cache_bits, lz77_runs, lz77_plane_dist,
    )
    return _riff_wrap(bw.bytes())


def _encode_literal_stream(bw: _BitWriter, pixels) -> None:
    """A sub-image stream (transform data / palette): no transforms
    allowed, no cache, no meta — straight literals.  level0=False:
    the meta-prefix BIT itself only exists at the top level (the
    decoder doesn't read it for sub-images, so writing it would
    desync the stream)."""
    _encode_entropy(bw, pixels, 0, 0, False, False, level0=False)


def _value_to_prefix(v: int):
    """Inverse of :func:`_prefix_value`: (code, extra_bits, nbits)."""
    if v <= 4:
        return v - 1, 0, 0
    v -= 1
    nbits = v.bit_length() - 2
    code = 2 * nbits + ((v >> nbits) & 1)
    return code + 2, v & ((1 << nbits) - 1), nbits


def _encode_entropy(bw, pixels, w, cache_bits, lz77, lz77_plane,
                    level0: bool = True):
    """Entropy-coded image body: cache header, no meta prefix (bit
    present only at level 0), the five prefix codes, then the symbol
    stream."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)  # no meta prefix
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size

    # plan the symbol stream first (to histogram the codes)
    ops = []  # ('lit', a,r,g,b) | ('cache', idx) | ('copy', len_sym, len_x, len_n, d_sym, d_x, d_n)
    n = len(pixels)
    i = 0
    green_syms, red_syms, blue_syms, alpha_syms, dist_syms = [], [], [], [], []
    while i < n:
        a, r, g, b = pixels[i]
        px = (a << 24) | (r << 16) | (g << 8) | b
        if lz77 and i > 0 and pixels[i - 1] == pixels[i]:
            run = 1
            while i + run < n and pixels[i + run] == pixels[i] and run < 4096:
                run += 1
            lcode, lx, ln_ = _value_to_prefix(run)
            if lz77_plane:
                dcode, dx, dn = _value_to_prefix(2)  # plane code 2 -> dist 1
            else:
                dcode, dx, dn = _value_to_prefix(121)  # direct dist 1
            ops.append(("copy", lcode, lx, ln_, dcode, dx, dn))
            green_syms.append(256 + lcode)
            dist_syms.append(dcode)
            if cache_bits:
                for k in range(run):
                    cpx = (pixels[i + k][0] << 24) | (pixels[i + k][1] << 16) \
                        | (pixels[i + k][2] << 8) | pixels[i + k][3]
                    cache[((0x1E35A7BD * cpx) & 0xFFFFFFFF) >> (32 - cache_bits)] = cpx
            i += run
            continue
        if cache_bits:
            idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[idx] == px:
                ops.append(("cache", idx))
                green_syms.append(256 + _GREEN_EXTRA + idx)
                i += 1
                continue
            cache[idx] = px
        ops.append(("lit", a, r, g, b))
        green_syms.append(g)
        red_syms.append(r)
        blue_syms.append(b)
        alpha_syms.append(a)
        i += 1

    galpha = 256 + _GREEN_EXTRA + cache_size
    glens = _green_lengths(green_syms, galpha)
    gcodes = _write_prefix_code(bw, glens, galpha)
    rcodes = _write_prefix_code(bw, _lengths_for(red_syms or [0], 256), 256)
    bcodes = _write_prefix_code(bw, _lengths_for(blue_syms or [0], 256), 256)
    acodes = _write_prefix_code(bw, _lengths_for(alpha_syms or [255], 256), 256)
    dcodes = _write_prefix_code(bw, _lengths_for(dist_syms or [0], 40), 40)

    for op in ops:
        if op[0] == "lit":
            _, a, r, g, b = op
            c, nb = gcodes[g]
            bw.write_code(c, nb)
            c, nb = rcodes[r]
            bw.write_code(c, nb)
            c, nb = bcodes[b]
            bw.write_code(c, nb)
            c, nb = acodes[a]
            bw.write_code(c, nb)
        elif op[0] == "cache":
            c, nb = gcodes[256 + _GREEN_EXTRA + op[1]]
            bw.write_code(c, nb)
        else:
            _, lcode, lx, ln_, dcode, dx, dn = op
            c, nb = gcodes[256 + lcode]
            bw.write_code(c, nb)
            bw.write(lx, ln_)
            c, nb = dcodes[dcode]
            bw.write_code(c, nb)
            bw.write(dx, dn)


def _green_lengths(symbols, alphabet_size: int):
    """Lengths for the green alphabet (literals + length codes + cache
    indices): <=2 distinct -> simple; else canonical lengths that keep
    the kraft sum exact while covering every used symbol — flat 8 bits
    over 0..255 plus 9-bit pairs carved out of one literal slot for
    each used extended symbol."""
    distinct = sorted(set(symbols))
    if len(distinct) <= 2 and all(s < 256 for s in distinct):
        lengths = [0] * alphabet_size
        for s in distinct:
            lengths[s] = 1
        return lengths
    ext = [s for s in distinct if s >= 256]
    lengths = [0] * alphabet_size
    for s in range(256):
        lengths[s] = 8
    # each extended symbol pairs with a donor literal: both at 9 bits
    # keeps the kraft sum exact (2^-8 == 2 * 2^-9); donors are the
    # TOP literal values, which gray/RGB fixtures may legitimately
    # use, so this stays a valid complete code either way
    donor = 255
    for s in ext:
        lengths[donor] = 9
        lengths[s] = 9
        donor -= 1
        if donor < 0:
            raise ValueError("encode_webp: too many extended green symbols")
    return lengths


def _riff_wrap(vp8l_payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def webp_resize(payload: bytes, width: int, height: int) -> bytes:
    """The ``resize_media(resizer="webp")`` built-in: decode, nearest-
    neighbour resample the grayscale plane (the same index-sampling
    convention as ``multimodal.phash_value``), re-encode as a gray
    lossless WebP.  Raises ValueError on non-WebP payloads."""
    from zeek_duckdb_spark.operators.raster import nn_resample

    if width < 1 or height < 1:
        raise ValueError("webp_resize: width/height must be >= 1")
    return encode_webp(nn_resample(decode_webp(payload), width, height))


def webp_features(payload: bytes) -> list:
    """The ``decode_media(decoder="webp")`` built-in: decode and emit
    ``[width, height, mean_gray, std_gray]`` (population std), all
    float64 — a deterministic function of the payload bytes alone."""
    g = decode_webp(payload)
    return [
        float(g.shape[1]),
        float(g.shape[0]),
        float(g.mean()),
        float(g.std()),
    ]
