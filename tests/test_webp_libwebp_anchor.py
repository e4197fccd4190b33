"""The libwebp EXTERNAL anchor (round-15, the one open r13/r14 ADVICE
item): until now both halves of the WebP round-trip shared an author,
so a symmetric spec misreading could pass every test that runs in this
container.  Two independent anchors close that:

1. A VENDORED fixture — ``_FIXTURE_HEX`` below is the byte-for-byte
   output of the system libwebp (``WebPEncodeLosslessRGBA``, libwebp
   7.1.5) on the deterministic ``_fixture_pixels()`` image.  Decoding
   it with this repo's pure-Python decoder needs NO external library,
   so the anchor holds in any container.
2. LIVE cross-checks through ``ctypes`` against ``libwebp.so.7``
   where installed (this container ships it at
   /usr/lib/x86_64-linux-gnu): libwebp-encoded streams through our
   decoder, and our encoder's full feature matrix through libwebp's
   decoder — both directions, import-guarded with an honest skip."""

import ctypes
import ctypes.util

import numpy as np
import pytest

from zeek_duckdb_spark.operators.webp import (
    decode_vp8l_argb,
    decode_webp,
    encode_webp,
)

# WebPEncodeLosslessRGBA(_fixture_pixels() + opaque alpha), captured
# 2026-08-16 from libwebp 7.1.5 — REAL libwebp output, not this
# repo's encoder
_FIXTURE_HEX = (
    "52494646b6000000574542505650384ca90000002f0fc00300990a44f43f3611"
    "d1ff80d35adb9ee63ba07a47711e8a42a1502814aaa4a8b82c9011b24db249b2"
    "475d213b50171008a4f00c665adb6e105dfd747d1d3a83a033487406896690af"
    "9901fd3536d4b66dc32cae297f48471d6d9c89269e7c8a29a79a7a9a69a79be3"
    "9c06c093888026f2398044a330d0c8836d623c78f163e3c3c2857b9bd8862114"
    "f9d72ff53437baf20eb1f8c9bb3eabc03ce8c202e149142134954fa13000"
)


def _fixture_pixels() -> np.ndarray:
    """The 16x16 RGB image the vendored fixture encodes: a gradient,
    a quadratic texture, flat runs and an xor weave — enough structure
    that libwebp's encoder chose real transforms, regenerated here so
    the test carries no pixel dump."""
    img = np.zeros((16, 16, 3), np.uint8)
    for y in range(16):
        for x in range(16):
            img[y, x] = (
                (x * 16 + y) % 256,
                (x * x * 3 + y * 29) % 256 if y < 12 else 77,
                ((x ^ y) * 19 + 40) % 256,
            )
    return img


def test_vendored_libwebp_fixture_decodes():
    """THE external anchor, container-independent: real libwebp bytes
    -> this repo's decoder -> the exact source pixels."""
    blob = bytes.fromhex(_FIXTURE_HEX)
    assert blob[:4] == b"RIFF" and blob[8:16] == b"WEBPVP8L"
    argb = decode_vp8l_argb(blob)
    want = _fixture_pixels()
    assert argb.shape == (16, 16, 4)
    assert (argb[:, :, 0] == 255).all()  # opaque alpha
    assert (argb[:, :, 1:] == want).all()
    # and the luma fold the pipeline consumes
    gray = decode_webp(blob)
    lum = (0.299 * want[:, :, 0] + 0.587 * want[:, :, 1]
           + 0.114 * want[:, :, 2])
    assert np.allclose(gray, lum)


def _libwebp():
    for name in (ctypes.util.find_library("webp"), "libwebp.so.7"):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        return lib
    pytest.skip("libwebp shared library not installed")


def _lib_encode(lib, img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    rgba = np.dstack([img, np.full((h, w), 255, np.uint8)])
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeLosslessRGBA(
        rgba.tobytes(), w, h, w * 4, ctypes.byref(out))
    assert n > 0, "libwebp encode failed"
    try:
        return bytes(bytearray(out[i] for i in range(n)))
    finally:
        lib.WebPFree(out)


def _lib_decode(lib, blob: bytes) -> np.ndarray:
    wi, hi = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(blob, len(blob), ctypes.byref(wi), ctypes.byref(hi))
    assert p, "libwebp decode failed"
    try:
        flat = bytes(bytearray(p[i] for i in range(wi.value * hi.value * 4)))
    finally:
        lib.WebPFree(p)
    return np.frombuffer(flat, np.uint8).reshape(hi.value, wi.value, 4)


def _images():
    rng = np.random.default_rng(20260816)
    yield _fixture_pixels()
    yield rng.integers(0, 256, (7, 11, 3), np.uint8)      # odd dims
    yield np.full((5, 5, 3), 200, np.uint8)               # flat
    g = np.tile(np.arange(32, dtype=np.uint8) * 8, (9, 1))
    yield np.dstack([g, g, g])                            # gray ramp
    yield rng.integers(0, 4, (24, 16, 3), np.uint8) * 80  # palette-ish


def test_live_libwebp_encodes_our_decoder_reads():
    lib = _libwebp()
    for img in _images():
        argb = decode_vp8l_argb(_lib_encode(lib, img))
        assert (argb[:, :, 1:] == img).all() and (argb[:, :, 0] == 255).all()


def test_live_our_encoder_libwebp_reads_feature_matrix():
    """Every fixture-encoder feature switch produces a stream REAL
    libwebp decodes to the source pixels — the encoder half of the
    anchor, so a symmetric misreading can no longer hide."""
    lib = _libwebp()
    rgb = _fixture_pixels()
    gray2d = np.tile(np.arange(16, dtype=np.uint8) * 16, (16, 1))
    cases = [
        (rgb, {}),
        (rgb, {"use_cache_bits": 3}),
        (rgb, {"lz77_runs": True}),
        (rgb, {"lz77_runs": True, "lz77_plane_dist": True}),
        (rgb, {"predictor_left": True}),
        (rgb, {"color_transform": 5}),
        (gray2d, {}),                   # subtract-green ride-along
        (gray2d, {"palette": True}),    # color-indexing, packed
    ]
    for img, kw in cases:
        got = _lib_decode(lib, encode_webp(img, **kw))
        want = img if img.ndim == 3 else np.dstack([img] * 3)
        assert (got[:, :, :3] == want).all(), kw
        assert (got[:, :, 3] == 255).all(), kw
