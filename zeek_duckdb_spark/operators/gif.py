"""Minimal pure-Python GIF codec — the third BUILT-IN real image
decoder for the multimodal operators (``decode_media(decoder="gif")``,
``phash_media(decoder="gif")``, and the ``"image"`` magic-byte sniff),
extending the real-decode path (PNG round 11, JPEG round 12) to the
third crawl-common image format.

Needs nothing beyond the stdlib + numpy: signature + logical screen
descriptor, global/local color tables, extension-block skipping, GIF
variable-width LZW decompression (clear/EOI codes, 12-bit cap,
deferred-clear full-table handling), optional 4-pass interlace
reordering, palette lookup -> BT.601 luma — the same grayscale
quantity the PNG and JPEG decoders emit, so all three feed
``phash_value`` identically.

Scope (documented, loud errors outside it): GIF87a/GIF89a; the FIRST
image block is decoded (an animated GIF decodes to its first frame;
later frames are reachable via :func:`gif_frames`, which re-wraps
every image block as a standalone single-frame GIF for
``sample_frames(sampler="gif")`` — frames are emitted as independent
rasters of their own rectangles, so delta-encoded animations yield the
delta rect, not a composited canvas, and transparency/disposal from
the Graphic Control Extension is ignored; stated so nobody mistakes
this for an animation renderer).  Unknown block introducers, missing
color tables, out-of-table pixel indices, truncated sub-blocks and
corrupt LZW codes all raise with the condition named.  The LZW loop is
per-code Python — right for thumbnails and fixtures riding Arrow
batches, NOT for 100 TB of banners; at that scale inject a native
decoder (PIL) through the same ``decoder=`` seam.  Format layout
follows the public GIF89a specification (CompuServe 1990, also W3C
mirror); no third-party code.

The encoder is the FIXTURE side (like ``encode_png`` /
``encode_jpeg``): a 2-D grayscale array -> single-frame GIF89a with a
256-entry gray identity palette and real variable-width LZW
compression (clear emitted on table overflow), optional interlace —
enough surface to exercise every decoder branch in tests and to plant
REAL re-encoded near-dup pairs without PIL.  Because the palette is
the identity gray ramp, an 8-bit gray image round-trips LOSSLESSLY
through encode -> decode.
"""

from __future__ import annotations

import struct

__all__ = ["decode_gif", "encode_gif", "gif_features", "gif_resize", "gif_frames"]

_GIF_SIGS = (b"GIF87a", b"GIF89a")
_MAX_CODE_WIDTH = 12


def _interlace_order(height: int) -> list:
    """Display-row index of each transmitted row, in transmission
    order — the GIF89a 4-pass scheme (rows 0,8,16..; 4,12..; 2,6..;
    1,3,5..)."""
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, height, step))
    return order


def _lzw_decode(data: bytes, min_size: int, expected: int) -> bytes:
    """GIF LZW stream -> index bytes.  Variable code width starting at
    min_size+1, LSB-first bit packing, clear resets the table, EOI
    terminates; the table stops growing at 4096 entries until the next
    clear (deferred clear), exactly as compliant encoders assume.
    Raises on truncation, a non-root first code, or a code beyond the
    table.  ``expected`` CAPS the output: decoding returns as soon as
    that many indices exist (surplus codes — some encoders pad the
    last row — and the trailing EOI are then left unread), so a
    malicious LZW stream cannot expand past the raster it claims."""
    if not (2 <= min_size <= 8):
        # palettes cap at 256 entries, so roots are always byte values
        raise ValueError(f"decode_gif: LZW minimum code size {min_size} out of range")
    clear = 1 << min_size
    eoi = clear + 1
    roots = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(roots)
    width = min_size + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    prev = None
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("decode_gif: LZW stream truncated (no EOI code)")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(roots)
            width = min_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("decode_gif: corrupt LZW (first code is not a root)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("decode_gif: corrupt LZW (code beyond table)")
        out += entry
        if len(out) >= expected:  # raster full: decompression-bomb cap
            return bytes(out)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry


def _lzw_encode(indices: bytes, min_size: int) -> bytes:
    """Index bytes -> GIF LZW stream (the fixture-encoder side).  Emits
    an initial clear, grows the code width one step AFTER the decoder
    would (the classic one-behind table alignment), and emits a clear
    to reset when the table fills at 4096."""
    clear = 1 << min_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_table() -> dict:
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    emit(clear)
    buf = b""
    for ch in indices:
        cand = buf + bytes([ch])
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # decoder builds its copy of this entry one code later, so
            # its width bump lands one emit later than a naive
            # next_code == 2**width check — hence the +1
            if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
                width += 1
        else:
            emit(clear)
            table = fresh_table()
            next_code = eoi + 1
            width = min_size + 1
        buf = bytes([ch])
    if buf:
        emit(table[buf])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _parse_header(payload: bytes):
    """Signature + logical screen descriptor + global color table.
    Returns (buf, screen_w, screen_h, gct_or_None, pos_after_header)."""
    if payload is None:
        raise ValueError("decode_gif: payload is None")
    b = bytes(payload)
    if len(b) < 13 or b[:6] not in _GIF_SIGS:
        raise ValueError("decode_gif: not a GIF (bad signature)")
    sw, sh = struct.unpack("<HH", b[6:10])
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        ncol = 2 ** ((packed & 0x07) + 1)
        if pos + 3 * ncol > len(b):
            raise ValueError("decode_gif: truncated global color table")
        gct = b[pos : pos + 3 * ncol]
        pos += 3 * ncol
    return b, sw, sh, gct, pos


def _skip_subblocks(b: bytes, pos: int) -> int:
    while True:
        if pos >= len(b):
            raise ValueError("decode_gif: truncated extension sub-blocks")
        n = b[pos]
        pos += 1
        if n == 0:
            return pos
        if pos + n > len(b):
            raise ValueError("decode_gif: truncated extension sub-blocks")
        pos += n


def _collect_subblocks(b: bytes, pos: int):
    out = bytearray()
    while True:
        if pos >= len(b):
            raise ValueError("decode_gif: truncated image data sub-blocks")
        n = b[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(b):
            raise ValueError("decode_gif: truncated image data sub-blocks")
        out += b[pos : pos + n]
        pos += n


def _iter_image_blocks(b: bytes, pos: int):
    """Yield one tuple per image block:
    (span_start, span_end, w, h, interlaced, lct_or_None, min_size,
    lzw_data).  Extensions are skipped; the trailer ends iteration;
    an unknown introducer or running off the end raises."""
    while True:
        if pos >= len(b):
            raise ValueError("decode_gif: truncated (no trailer)")
        t = b[pos]
        if t == 0x3B:  # trailer
            return
        if t == 0x21:  # extension: label byte + sub-blocks
            if pos + 2 > len(b):
                raise ValueError("decode_gif: truncated extension block")
            pos = _skip_subblocks(b, pos + 2)
            continue
        if t != 0x2C:
            raise ValueError(f"decode_gif: unknown block introducer 0x{t:02x}")
        start = pos
        if pos + 10 > len(b):
            raise ValueError("decode_gif: truncated image descriptor")
        _left, _top, w, h = struct.unpack("<HHHH", b[pos + 1 : pos + 9])
        packed = b[pos + 9]
        pos += 10
        if w == 0 or h == 0:
            raise ValueError("decode_gif: zero-sized image descriptor")
        lct = None
        if packed & 0x80:
            ncol = 2 ** ((packed & 0x07) + 1)
            if pos + 3 * ncol > len(b):
                raise ValueError("decode_gif: truncated local color table")
            lct = b[pos : pos + 3 * ncol]
            pos += 3 * ncol
        if pos >= len(b):
            raise ValueError("decode_gif: truncated image data")
        min_size = b[pos]
        pos += 1
        data, pos = _collect_subblocks(b, pos)
        yield start, pos, w, h, bool(packed & 0x40), lct, min_size, data


# ring-wide decompression-bomb guard (the webp._MAX_PIXELS_DEFAULT
# precedent): a 16-bit descriptor can claim 65535x65535 and LZW
# legitimately expands thousands-to-one, so only a pixel cap bounds
# the work.  ~4 MP covers crawl imagery; raise per call.
_MAX_PIXELS_DEFAULT = 1 << 22


def decode_gif(payload: bytes, max_pixels: int = _MAX_PIXELS_DEFAULT):
    """GIF bytes -> 2-D float64 grayscale array (rows x cols) of the
    FIRST image block, the shape :func:`multimodal.phash_value`
    consumes.  Palette RGB is folded to ITU-R BT.601 luma (0.299 R +
    0.587 G + 0.114 B), matching the PNG/JPEG decoders.  Raises
    ValueError on anything that is not a well-formed GIF inside the
    documented scope, and on descriptors claiming more than
    ``max_pixels`` pixels (the LZW expansion cap already stops at the
    claimed raster; this bounds the claim itself)."""
    import numpy as np

    b, _sw, _sh, gct, pos = _parse_header(payload)
    for _s, _e, w, h, interlaced, lct, min_size, data in _iter_image_blocks(b, pos):
        ct = lct if lct is not None else gct
        if ct is None:
            raise ValueError("decode_gif: image has neither local nor global color table")
        if w * h > max_pixels:
            raise ValueError(
                f"decode_gif: {w}x{h} exceeds the {max_pixels}-pixel "
                "bomb guard (pass max_pixels= to raise it)"
            )
        idx = _lzw_decode(data, min_size, w * h)
        if len(idx) < w * h:
            raise ValueError(
                f"decode_gif: LZW data ended after {len(idx)} of {w * h} pixels"
            )
        arr = np.frombuffer(idx[: w * h], dtype=np.uint8).reshape(h, w)
        if interlaced:
            out = np.empty_like(arr)
            out[_interlace_order(h)] = arr
            arr = out
        pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3).astype(np.float64)
        if int(arr.max()) >= pal.shape[0]:
            raise ValueError("decode_gif: pixel index beyond the color table")
        if (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all():
            # gray palette: return the channel EXACTLY (like PNG color
            # type 0) — the luma fold below is a float sum whose
            # coefficients don't add to exactly 1.0
            return pal[arr, 0]
        return pal[arr] @ np.array([0.299, 0.587, 0.114])
    raise ValueError("decode_gif: no image data block before the trailer")


def encode_gif(img, interlace: bool = False) -> bytes:
    """2-D grayscale array -> single-frame GIF89a bytes (the fixture
    encoder).  The palette is the 256-entry gray identity ramp, so
    uint8 gray input round-trips losslessly through
    :func:`decode_gif`.  Values are rounded and clipped to [0, 255]."""
    import numpy as np

    a = np.asarray(img, dtype=np.float64)
    if a.ndim != 2 or a.size == 0:
        raise ValueError("encode_gif: need a non-empty 2-D grayscale array")
    h, w = a.shape
    if w > 0xFFFF or h > 0xFFFF:
        raise ValueError("encode_gif: dimensions exceed the GIF u16 limit")
    g = np.clip(np.rint(a), 0, 255).astype(np.uint8)
    rows = g[_interlace_order(h)] if interlace else g
    # logical screen descriptor: GCT present, color resolution 8,
    # 256-entry table (packed size field 7)
    head = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x80 | 0x70 | 0x07, 0, 0])
    gct = bytes(v for i in range(256) for v in (i, i, i))
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0x40 if interlace else 0])
    lzw = _lzw_encode(rows.tobytes(), 8)
    body = bytearray([8])
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        body.append(len(chunk))
        body += chunk
    body.append(0)
    return head + gct + desc + bytes(body) + b"\x3b"


def gif_resize(payload: bytes, width: int, height: int) -> bytes:
    """The ``resize_media(resizer="gif")`` built-in: decode a GIF,
    nearest-neighbour resample the grayscale plane to height x width
    (the same index-sampling convention as ``multimodal.phash_value``,
    so an upscale round-trips to the identical pHash), re-encode as a
    gray-palette GIF.  Raises ValueError on non-GIF payloads."""
    from zeek_duckdb_spark.operators.raster import nn_resample

    if width < 1 or height < 1:
        raise ValueError("gif_resize: width/height must be >= 1")
    return encode_gif(nn_resample(decode_gif(payload), width, height))


def gif_features(payload: bytes) -> list:
    """The ``decode_media(decoder="gif")`` built-in: decode and emit
    ``[width, height, mean_gray, std_gray]`` (population std), all
    float64 — a deterministic function of the payload bytes alone."""
    g = decode_gif(payload)
    return [
        float(g.shape[1]),
        float(g.shape[0]),
        float(g.mean()),
        float(g.std()),
    ]


def gif_frames(payload: bytes):
    """GIF bytes -> generator of ``(frame_idx, gif_bytes)``, one per
    image block, each re-wrapped as a standalone single-frame GIF
    (header + global color table copied verbatim, then that image
    block's descriptor/local-table/LZW data byte-for-byte, then a
    trailer) — the ``sample_frames(sampler="gif")`` built-in for
    animated GIFs.  Every emitted frame decodes via
    :func:`decode_gif`.  NOTE (scope): frames are independent rasters
    of their own rectangles; delta-encoded animations yield the delta
    rect, not a composited canvas, and Graphic Control Extension
    transparency/disposal is dropped."""
    b, _sw, _sh, gct, pos = _parse_header(payload)
    prefix = b[:pos]
    i = 0
    for start, end, _w, _h, _il, lct, _ms, _data in _iter_image_blocks(b, pos):
        if lct is None and gct is None:
            raise ValueError("decode_gif: frame has neither local nor global color table")
        yield i, prefix + b[start:end] + b"\x3b"
        i += 1
