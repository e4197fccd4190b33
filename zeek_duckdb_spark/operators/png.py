"""Minimal pure-Python PNG codec — the optional BUILT-IN real decoder
for the multimodal operators (``decode_media(decoder="png")``,
``phash_media(decoder="png")``).

The container ships no PIL/ffmpeg, so until now the multimodal family
could only run on fake byte-tile images.  PNG needs nothing beyond
``zlib`` (stdlib) + numpy: signature + CRC-checked chunks, one inflate,
and per-row unfiltering (None/Sub/Up/Average/Paeth).  This closes the
"real media decode execution" gap: the pHash near-dup path runs on REAL
encoded image bytes end-to-end.

Scope (documented, loud errors outside it): 8-bit depth, color types
0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), no Adam7
interlace.  That covers what ``encode_png`` below and most thumbnail
pipelines emit.  The unfilter loop is per-byte Python for the three
filters with intra-row dependencies — right for thumbnails and
fixtures riding Arrow batches, NOT for decoding 100 TB of 4K frames;
at that scale inject a native decoder (PIL/turbojpeg) through the same
``decoder=`` seam.  Format layout follows the public W3C PNG spec
(RFC 2083); no third-party code.

Grayscale conversion uses ITU-R BT.601 luma (0.299 R + 0.587 G +
0.114 B), alpha ignored — stated so an oracle can restate it.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["decode_png", "encode_png", "png_features", "png_resize"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# ring-wide decompression-bomb guard (the webp._MAX_PIXELS_DEFAULT
# precedent): IHDR dimensions are 32-bit and the IDAT stream is
# deflate — a kilobyte zlib bomb can claim gigabytes.  ~4 MP covers
# crawl imagery; raise per call for trusted archives.
_MAX_PIXELS_DEFAULT = 1 << 22


def decode_png(payload: bytes, max_pixels: int = _MAX_PIXELS_DEFAULT):
    """PNG bytes -> 2-D float64 grayscale array (rows x cols), the
    shape :func:`multimodal.phash_value` consumes.  Raises ValueError
    on anything that is not a well-formed PNG inside the documented
    scope (bad signature, CRC mismatch, truncation, interlace,
    non-8-bit depth) and on headers claiming more than ``max_pixels``
    pixels; the IDAT inflate is CAPPED at the header-implied size, so
    a zlib bomb aborts at the cap instead of allocating its claim."""
    import numpy as np

    if payload is None:
        raise ValueError("decode_png: payload is None")
    payload = bytes(payload)
    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("decode_png: not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat: list[bytes] = []
    seen_end = False
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        if len(data) != ln or pos + 12 + ln > len(payload):
            raise ValueError("decode_png: truncated chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + ln : pos + 12 + ln]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(
                f"decode_png: CRC mismatch in {ctype!r} chunk"
            )
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            seen_end = True
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("decode_png: missing IHDR")
    if not idat or not seen_end:
        raise ValueError("decode_png: missing IDAT/IEND")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if w == 0 or h == 0:
        raise ValueError("decode_png: zero-sized image")
    if depth != 8:
        raise ValueError(
            f"decode_png: only 8-bit depth supported, got {depth}"
        )
    if color not in _CHANNELS:
        raise ValueError(f"decode_png: unknown color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("decode_png: unknown compression/filter method")
    if interlace != 0:
        raise ValueError("decode_png: Adam7 interlace not supported")
    if color == 3 and (plte is None or len(plte) % 3):
        raise ValueError("decode_png: palette image without valid PLTE")

    if w * h > max_pixels:
        raise ValueError(
            f"decode_png: {w}x{h} exceeds the {max_pixels}-pixel bomb "
            "guard (pass max_pixels= to raise it)"
        )
    bpp = _CHANNELS[color]  # bytes per pixel at depth 8
    stride = w * bpp
    want = (stride + 1) * h
    d = zlib.decompressobj()
    try:
        # max_length caps the inflate at the header-implied size: a
        # deflate bomb stops HERE, having allocated at most `want`
        raw = d.decompress(b"".join(idat), want)
        extra = (
            d.decompress(d.unconsumed_tail, 1)
            if d.unconsumed_tail
            else d.flush(1)
        )
    except zlib.error as e:
        # keep the documented single-exception contract: callers that
        # skip bad rows with `except ValueError` must not be killed by
        # a CRC-valid-but-corrupt deflate stream leaking zlib.error
        raise ValueError(f"decode_png: corrupt IDAT stream ({e})") from e
    if extra:
        raise ValueError(
            f"decode_png: inflated size exceeds expected {want}"
        )
    if not d.eof:
        # exactly-want output from an UNFINISHED stream (missing final
        # block / adler32) was accepted by the capped inflate — the
        # uncapped zlib.decompress used to raise here (r14 review)
        raise ValueError(
            "decode_png: corrupt IDAT stream (truncated deflate)"
        )
    if len(raw) != want:
        raise ValueError(
            f"decode_png: inflated size {len(raw)} != expected {want}"
        )

    out = np.empty((h, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for r in range(h):
        off = r * (stride + 1)
        ft = raw[off]
        cur = bytearray(raw[off + 1 : off + 1 + stride])
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ft == 2:  # Up — no intra-row dependency, vectorize
            cur = bytearray(
                (
                    np.frombuffer(bytes(cur), dtype=np.uint8)
                    + np.frombuffer(bytes(prev), dtype=np.uint8)
                ).tobytes()
            )
        elif ft == 3:  # Average
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"decode_png: unknown filter type {ft}")
        out[r] = np.frombuffer(bytes(cur), dtype=np.uint8)
        prev = cur

    px = out.reshape(h, w, bpp).astype(np.float64)
    if color == 0:
        return px[:, :, 0]
    if color == 4:  # gray + alpha: alpha ignored
        return px[:, :, 0]
    if color == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = out.reshape(h, w).astype(np.int64)
        if int(idx.max()) >= len(pal):
            raise ValueError("decode_png: palette index out of range")
        rgb = pal[idx].astype(np.float64)
        return rgb @ np.array([0.299, 0.587, 0.114])
    # color 2 (RGB) / 6 (RGBA): BT.601 luma, alpha ignored
    return px[:, :, :3] @ np.array([0.299, 0.587, 0.114])


def encode_png(img) -> bytes:
    """2-D (grayscale) or HxWx3 (RGB) uint8-valued array -> PNG bytes
    (8-bit, filter 0 per row, one zlib-level-9 IDAT).  The fixture
    side of the codec: lets tests and demos plant REAL encoded image
    bytes without PIL.  Values are clipped to [0, 255]."""
    import numpy as np

    a = np.asarray(img)
    if a.ndim == 2:
        color, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, ch = 2, 3
    else:
        raise ValueError(
            "encode_png: expected HxW (gray) or HxWx3 (RGB) array"
        )
    if a.shape[0] == 0 or a.shape[1] == 0:
        raise ValueError("encode_png: zero-sized image")
    a = np.clip(np.round(a.astype(np.float64)), 0, 255).astype(np.uint8)
    h, w = a.shape[0], a.shape[1]
    body = b"".join(
        b"\x00" + a[r].reshape(w * ch).tobytes() for r in range(h)
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body, 9))
        + chunk(b"IEND", b"")
    )


def png_resize(payload: bytes, width: int, height: int) -> bytes:
    """The ``resize_media(resizer="png")`` built-in: decode a PNG,
    nearest-neighbour resample the grayscale plane to height x width
    (the same index-sampling convention as ``multimodal.phash_value``,
    so an upscale round-trips to the identical pHash), re-encode as an
    8-bit gray PNG.  Raises ValueError on non-PNG payloads — a loud
    wrong-format signal beats silently passing bytes through."""
    from zeek_duckdb_spark.operators.raster import nn_resample

    if width < 1 or height < 1:
        raise ValueError("png_resize: width/height must be >= 1")
    return encode_png(nn_resample(decode_png(payload), width, height))


def png_features(payload: bytes) -> list:
    """The ``decode_media(decoder="png")`` built-in: decode and emit
    ``[width, height, mean_gray, std_gray]`` (population std), all
    float64 — a deterministic function of the payload bytes alone, so
    the output is partitioning-independent."""
    g = decode_png(payload)
    return [
        float(g.shape[1]),
        float(g.shape[0]),
        float(g.mean()),
        float(g.std()),
    ]
