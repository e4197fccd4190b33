"""``decoder='libwebp'`` (round-15): LOSSY WebP decode made REAL
in-container — a ctypes adapter over the system libwebp shared
library closes the one crawl-dominant image shape the pure-Python
ring stubs (lossy VP8 / VP8X+ALPH), zero new packages.  Library-
guarded with an honest skip; this container ships libwebp 7.1.5."""

import numpy as np
import pytest

from zeek_duckdb_spark.operators.multimodal import (
    libwebp_features,
    libwebp_gray,
)
from zeek_duckdb_spark.operators.webp import decode_webp, encode_webp

# CPython's own test fixture Lib/test/test_email/data/python.webp
# (PSF-licensed, vendored hex) — a REAL lossy VP8X + ALPH + VP8 file
# produced by external tooling: 16x16, alpha-carrying, lossy-coded,
# i.e. everything the pure-Python VP8L codec cannot touch
_LOSSY_FIXTURE_HEX = (
    "52494646a801000057454250565038580a000000100000000f00000f0000414c"
    "5048c30000000127a2a89124e57ae7185fe7df2a998898ff74718de02630e2e1"
    "8b7732c8c1115c832b30e8b078158e785135c1080c024f92a06ab055191cd6b6"
    "6d462f4ec6763cb6ed77fbaf29ae21a2ff49d1fd8f90f7ba4449241b3a259134"
    "f3146d0ec7d3e51620f40b14be90e183b71a329e36827f1d297e4e7608fb889e"
    "b391ef997346e83282dbf8cc48b2f745307d20fd36178c2132562da5d66b23bc"
    "5de3a55915d59c81a4d96e96758a18310f8aaa2c5034fa3082dfba6b505229b5"
    "2dcfe954140a0100000056503820be0000009002009d012a1000100003003425"
    "b00274304f08850c7c031d082cfde800fefd74a0fd029b1f8af7437c9c37f6d2"
    "0cafd3ff3568e2eea7bdc96f1bf4aac563aeba9f9784df41a23bda5be4eff8cb"
    "f1bd7fe1affa3fe509ecf4bb665fffaa29d97fc96ce786e6ac97b9e4c6f49323"
    "8c5fdd8f3955207f954ffc39f8ff6fd26b03e89fbc8398666db1d513ff7617e6"
    "b1fe5d8ae49f47bfb3fabffe1d1df3128ffe5ccfc1faf918c3bdcfcf1f9139a0"
    "01fd9a014b312cdebcd97baaac000000"
)


def _need_libwebp():
    from zeek_duckdb_spark.operators.multimodal import _libwebp_lib

    try:
        _libwebp_lib()
    except ImportError:
        pytest.skip("libwebp shared library not installed")


def test_lossy_vp8_fixture_decodes():
    """The stubbed-until-now path, end-to-end on externally-produced
    lossy bytes.  VP8 reconstruction is bit-exact by spec, so the
    stats are pinned hard, not loosely."""
    _need_libwebp()
    blob = bytes.fromhex(_LOSSY_FIXTURE_HEX)
    assert blob[8:16] == b"WEBPVP8X"  # lossy extended format
    g = libwebp_gray(blob)
    assert g.shape == (16, 16)
    assert g.mean() == pytest.approx(97.988734375, abs=1e-6)
    assert g.std() == pytest.approx(84.04067945, abs=1e-6)
    w, h, mean, std = libwebp_features(blob)
    assert (w, h) == (16.0, 16.0)
    assert mean == pytest.approx(g.mean()) and std == pytest.approx(g.std())


def test_lossless_parity_with_pure_python_codec():
    """On VP8L streams the two decoders must agree BIT-FOR-BIT — the
    adapter uses the same R==G==B / BT.601 fold as decode_webp."""
    _need_libwebp()
    rng = np.random.default_rng(7)
    color = rng.integers(0, 256, (9, 13, 3), np.uint8)
    gray = np.tile(np.arange(16, dtype=np.uint8) * 16, (8, 1))
    for img in (color, gray):
        enc = encode_webp(img)
        assert np.array_equal(libwebp_gray(enc), decode_webp(enc)), (
            img.shape,
        )


def test_guards_and_quarantine_contract():
    """Bomb guard fires from the HEADER (before pixel decode); broken
    bytes raise ValueError only — the on_error seams' contract."""
    _need_libwebp()
    blob = bytes.fromhex(_LOSSY_FIXTURE_HEX)
    with pytest.raises(ValueError, match="bomb guard"):
        libwebp_gray(blob, max_pixels=100)
    with pytest.raises(ValueError, match="not a decodable"):
        libwebp_gray(b"RIFF\x00\x00\x00\x00WEBPgarbage")
    with pytest.raises(ValueError):
        libwebp_gray(blob[:60])  # truncated mid-ALPH


def test_decode_media_and_phash_media_dispatch(spark):
    """The string seam end-to-end through Spark: lossy payloads decode
    to features, and phash_media hashes them — the quarantine path
    ('skip') drops a poisoned payload instead of killing the job."""
    from zeek_duckdb_spark.operators.multimodal import (
        decode_media,
        phash_media,
    )

    _need_libwebp()
    blob = bytes.fromhex(_LOSSY_FIXTURE_HEX)
    rows = [(1, blob), (2, bytes.fromhex(_LOSSY_FIXTURE_HEX)[:50]),
            (3, encode_webp(np.arange(192, dtype=np.uint8).reshape(8, 8, 3)))]
    df = spark.createDataFrame(rows, "doc_id long, media binary")

    feats = {r.doc_id: r.feature for r in decode_media(
        df, decoder="libwebp", on_error="null").collect()}
    assert set(feats) == {1, 2, 3} and feats[2] is None  # quarantined
    assert feats[1][0] == 16.0 and feats[1][2] == pytest.approx(
        97.988734375)

    hashes = phash_media(df, decoder="libwebp", on_error="skip").collect()
    assert {r.doc_id for r in hashes} == {1, 3}
    assert all(isinstance(r.phash, int) for r in hashes)