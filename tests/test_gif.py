"""Pure-Python GIF codec (operators/gif.py) + the real-decode
multimodal path on the third crawl-common image format: LZW decode,
interlace, palette -> luma, animated-GIF frame sampling
(``sample_frames(sampler='gif')``), and planted near-dup pairs
collapsing via phash_pairs on REAL GIF bytes.

Validation strategy: (a) LOSSLESS self round-trip (the encoder's gray
identity palette makes encode -> decode exact for uint8 gray), (b) a
hand-built "uncompressed LZW" stream — literal root codes with
periodic clears, a shape this repo's encoder never emits, so the
decoder is exercised on an independent encoding, (c) decode of an
INDEPENDENTLY-ENCODED real-world GIF (CPython's stdlib test fixture),
including a cross-CODEC pin against the SAME logo's PNG fixture
through two disjoint code paths."""

import os
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zeek_duckdb_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    gif_features,
    gif_frames,
    gif_resize,
)


def _rand_img(seed, h=32, w=32):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w)).astype(np.uint8)


def _natural_img(seed, h=48, w=48):
    """Photo-like fixture (dense spectrum) for the pHash tests — same
    rationale as tests/test_jpeg.py::_natural_img."""
    rng = np.random.RandomState(seed)
    img = rng.normal(0, 1, (h * 2, w * 2))
    for _ in range(3):
        img = (np.roll(img, 1, 0) + img + np.roll(img, -1, 0)) / 3
        img = (np.roll(img, 1, 1) + img + np.roll(img, -1, 1)) / 3
    img = img[:h, :w]
    return (img - img.min()) / (img.max() - img.min()) * 255


# ----------------------------------------------------------------------
# round-trip
# ----------------------------------------------------------------------

def test_roundtrip_gray_exact():
    """uint8 gray -> GIF -> gray is LOSSLESS (identity gray palette);
    white noise forces LZW table growth through every code width."""
    for seed, shape in [(7, (32, 32)), (8, (3, 5)), (9, (200, 150)), (10, (1, 1))]:
        img = _rand_img(seed, *shape)
        out = decode_gif(encode_gif(img))
        assert out.shape == shape
        assert np.array_equal(out, img.astype(np.float64)), (seed, shape)


def test_roundtrip_table_overflow_clears():
    """An image big and noisy enough that the LZW table hits 4096 and
    the encoder emits mid-stream clears (and the data spans many
    255-byte sub-blocks) still round-trips exactly."""
    img = _rand_img(3, 300, 300)
    enc = encode_gif(img)
    assert np.array_equal(decode_gif(enc), img.astype(np.float64))


def test_interlace_roundtrip_and_equivalence():
    """interlace=True sets the descriptor flag, transmits rows in the
    4-pass order, and decodes to the IDENTICAL image."""
    img = _rand_img(11, 37, 21)
    plain = encode_gif(img)
    inter = encode_gif(img, interlace=True)
    assert plain != inter
    # descriptor interlace bit: header 13 + GCT 768, then 0x2C + 8
    assert inter[13 + 768 + 9] & 0x40
    assert not (plain[13 + 768 + 9] & 0x40)
    assert np.array_equal(decode_gif(inter), decode_gif(plain))


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 10_000),
    interlace=st.booleans(),
)
def test_property_roundtrip_exact(h, w, seed, interlace):
    img = _rand_img(seed % 1000, h, w)
    out = decode_gif(encode_gif(img, interlace=interlace))
    assert out.shape == (h, w)
    assert np.array_equal(out, img.astype(np.float64))


# ----------------------------------------------------------------------
# independent encodings
# ----------------------------------------------------------------------

def _uncompressed_gif(img: np.ndarray) -> bytes:
    """Hand-built GIF using the classic 'uncompressed LZW' trick:
    every pixel as a 9-bit ROOT code with a clear every 128 codes (so
    the decoder's table never reaches the 512-entry width bump).  This
    repo's encoder NEVER emits this shape — an independent encoding
    any compliant decoder must accept."""
    h, w = img.shape
    clear, eoi = 256, 257
    codes = []
    for i, px in enumerate(img.ravel()):
        if i % 128 == 0:
            codes.append(clear)
        codes.append(int(px))
    codes.append(eoi)
    acc = nbits = 0
    stream = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += 9
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)
    head = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0xF7, 0, 0])
    gct = bytes(v for i in range(256) for v in (i, i, i))
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    body = bytearray([8])
    for off in range(0, len(stream), 255):
        chunk = stream[off : off + 255]
        body.append(len(chunk))
        body += chunk
    body.append(0)
    return head + gct + desc + bytes(body) + b"\x3b"


def test_decodes_independent_uncompressed_lzw_stream():
    img = _rand_img(21, 19, 33)
    out = decode_gif(_uncompressed_gif(img))
    assert np.array_equal(out, img.astype(np.float64))


def _stdlib_fixture(name):
    """CPython's own stdlib test data (the `test` package ships with
    the interpreter) — located portably, skip-if-absent."""
    try:
        import test as _t
    except ImportError:
        return None
    p = os.path.join(os.path.dirname(_t.__file__), "imghdrdata", name)
    return p if os.path.exists(p) else None


def test_decodes_independent_real_world_gif():
    """CPython ships the Python logo as python.gif — produced by a
    real-world encoder, not by this codec."""
    p = _stdlib_fixture("python.gif")
    if p is None:
        pytest.skip("stdlib GIF fixture not on this system")
    g = decode_gif(open(p, "rb").read())
    assert g.shape == (16, 16)
    assert 0.0 <= g.min() and g.max() <= 255.0
    assert g.std() > 10.0  # a real picture, not a flat field
    assert len(list(gif_frames(open(p, "rb").read()))) == 1


def test_cross_codec_agreement_on_shared_fixture():
    """The SAME logo ships as python.png and python.gif — two
    independent real-world encoders, decoded here by two disjoint
    code paths (zlib/unfilter vs LZW/palette).  The gray planes must
    agree everywhere except the handful of transparency-rendered
    pixels (PNG tRNS vs GIF transparent index map that 'color'
    differently; this codec documents transparency as ignored)."""
    from zeek_duckdb_spark.operators.png import decode_png

    pg, pp = _stdlib_fixture("python.gif"), _stdlib_fixture("python.png")
    if pg is None or pp is None:
        pytest.skip("stdlib image fixtures not on this system")
    g = decode_gif(open(pg, "rb").read())
    p = decode_png(open(pp, "rb").read())
    assert g.shape == p.shape
    diff = np.abs(g - p)
    assert float(np.median(diff)) == 0.0
    assert (diff > 8).sum() <= diff.size * 0.05, (diff > 8).sum()
    assert np.corrcoef(g.ravel(), p.ravel())[0, 1] > 0.9


# ----------------------------------------------------------------------
# animated GIFs / frames
# ----------------------------------------------------------------------

def _animated_gif(frames) -> bytes:
    """Multi-frame GIF via byte surgery on single-frame encodings:
    shared header+GCT, a Graphic Control Extension before each frame
    (exercises extension skipping), each frame's image block verbatim."""
    parts = [encode_gif(f) for f in frames]
    head = parts[0][: 13 + 768]
    gce = b"\x21\xf9\x04\x00\x05\x00\x00\x00"  # 5cs delay, no transparency
    netscape = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop ext
    out = bytearray(head) + netscape
    for p in parts:
        out += gce + p[13 + 768 : -1]  # image block, trailer stripped
    out.append(0x3B)
    return bytes(out)


def _video(seed, n=6):
    base = _natural_img(seed)
    return [np.clip(base + i * 2.0, 0, 255) for i in range(n)]


def test_animated_first_frame_and_gif_frames():
    frames = [np.round(f).astype(np.uint8) for f in _video(5, n=4)]
    anim = _animated_gif(frames)
    # decode_gif = first frame
    assert np.array_equal(decode_gif(anim), frames[0].astype(np.float64))
    # gif_frames re-wraps every block as a standalone decodable GIF
    out = list(gif_frames(anim))
    assert [i for i, _ in out] == [0, 1, 2, 3]
    for (_, fb), orig in zip(out, frames):
        assert fb[:6] == b"GIF89a" and fb[-1:] == b"\x3b"
        assert np.array_equal(decode_gif(fb), orig.astype(np.float64))


def test_sample_frames_gif_end_to_end(spark):
    """The full animated-GIF near-dup chain with no external library:
    sample_frames(sampler='gif') -> phash_media(decoder='gif') ->
    re-encoded animation collapses frame-by-frame with its original
    (the AVI e2e shape on the GIF container)."""
    from zeek_duckdb_spark.operators import multimodal as mm

    vid = [np.round(f).astype(np.uint8) for f in _video(13, n=6)]
    # 'Re-encode': brightness-shifted copy of the same animation
    vid2 = [np.clip(f.astype(float) + 4.0, 0, 255).astype(np.uint8) for f in vid]
    other = [np.round(f).astype(np.uint8) for f in _video(99, n=6)]
    df = spark.createDataFrame(
        [
            (0, bytearray(_animated_gif(vid))),
            (1, bytearray(_animated_gif(vid2))),
            (2, bytearray(_animated_gif(other))),
            (3, None),
        ],
        "doc_id long, media binary",
    )
    frames = mm.sample_frames(df, stride=2, max_frames=2, sampler="gif")
    rows = frames.collect()
    got = {(r.doc_id, r.frame_idx) for r in rows}
    assert got == {(d, i) for d in (0, 1, 2) for i in (0, 2)}
    for r in rows:
        assert bytes(r.frame)[:6] == b"GIF89a"

    fid = frames.select(
        (frames.doc_id * 100 + frames.frame_idx).alias("doc_id"), "frame"
    )
    hashed = mm.phash_media(fid, decoder="gif", media_col="frame")
    hs = {r.doc_id: r.phash for r in hashed.collect()}
    for i in (0, 2):
        same = bin(hs[0 + i] ^ hs[100 + i]).count("1")
        diff = bin(hs[0 + i] ^ hs[200 + i]).count("1")
        assert same <= 6, (i, same)
        assert diff > 6, (i, diff)


# ----------------------------------------------------------------------
# Spark integration: near-dup, mixed-format sniff, resize
# ----------------------------------------------------------------------

@pytest.mark.slow
def test_phash_real_gif_planted_near_dups_collapse(spark):
    """Planted GIF upscale + cross-format JPEG re-encode collapse via
    phash_pairs on REAL bytes through decoder='image' — the three-way
    mixed corpus (PNG/JPEG/GIF) no single-format decoder covers."""
    from zeek_duckdb_spark.operators import multimodal as mm
    from zeek_duckdb_spark.operators.jpeg import encode_jpeg
    from zeek_duckdb_spark.operators.png import encode_png

    base = _natural_img(42, 64, 64)
    up = np.kron(base, np.ones((2, 2)))
    rows = [
        (0, bytearray(encode_gif(np.round(base)))),
        (1, bytearray(encode_gif(np.round(up)))),            # 2x upscale
        (2, bytearray(encode_jpeg(base, quality=92))),       # cross-format
        (3, bytearray(encode_png(np.round(base)))),          # cross-format
        (4, bytearray(encode_gif(np.round(_natural_img(77, 64, 64))))),
        (5, bytearray(encode_gif(np.round(_natural_img(101, 64, 64))))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary").repartition(3)

    hashed = mm.phash_media(df, decoder="image")
    hs = {r.doc_id: r.phash for r in hashed.collect()}
    assert set(hs) == set(range(6))

    pairs = {
        (r.id_a, r.id_b)
        for r in mm.phash_pairs(hashed, max_hamming=6).collect()
    }
    planted = {(0, 1), (0, 2), (0, 3)}
    assert planted <= pairs, sorted(pairs)
    for a, b in pairs:
        assert a <= 3 and b <= 3, (a, b)

    feats = {
        r.doc_id: r.feature
        for r in mm.decode_media(
            df.filter("doc_id IN (0, 1)"), decoder="gif"
        ).collect()
    }
    assert feats[0][:2] == [64.0, 64.0] and feats[1][:2] == [128.0, 128.0]
    assert feats[0][2] == pytest.approx(float(np.round(base).mean()), abs=0.5)


def test_resize_media_gif_builtin_and_format_preserving(spark):
    from zeek_duckdb_spark.operators import multimodal as mm
    from zeek_duckdb_spark.operators.png import encode_png

    g = _natural_img(21, 40, 40)
    df = spark.createDataFrame(
        [
            (0, bytearray(encode_gif(np.round(g)))),
            (1, bytearray(encode_png(np.round(g)))),
        ],
        "doc_id long, media binary",
    )
    out = {
        r.id: bytes(r.resized)
        for r in mm.resize_media(df, 16, 16, resizer="image").collect()
    }
    # format-preserving: GIF stays GIF, PNG stays PNG
    assert out[0][:6] == b"GIF89a"
    assert out[1][:8] == b"\x89PNG\r\n\x1a\n"
    assert decode_gif(out[0]).shape == (16, 16)

    only_gif = {
        r.id: bytes(r.resized)
        for r in mm.resize_media(
            df.filter("doc_id = 0"), 8, 8, resizer="gif"
        ).collect()
    }
    assert decode_gif(only_gif[0]).shape == (8, 8)
    # upscale round-trips to the identical pHash (NN index sampling
    # matches phash_value's)
    from zeek_duckdb_spark.operators.multimodal import phash_value

    big = gif_resize(encode_gif(np.round(g)), 80, 80)
    assert phash_value(decode_gif(big)) == phash_value(np.round(g))


# ----------------------------------------------------------------------
# units + errors
# ----------------------------------------------------------------------

def test_features_and_resize_units():
    img = np.full((8, 6), 100, np.uint8)
    assert gif_features(encode_gif(img)) == [6.0, 8.0, 100.0, 0.0]
    r = decode_gif(gif_resize(encode_gif(img), 3, 4))
    assert r.shape == (4, 3) and (r == 100.0).all()
    with pytest.raises(ValueError, match="width/height"):
        gif_resize(encode_gif(img), 0, 4)


def test_lzw_unit_roundtrip_all_min_sizes():
    rng = np.random.RandomState(5)
    for ms in (2, 3, 5, 8):
        data = bytes(rng.randint(0, 1 << ms, size=4000).astype(np.uint8).tolist())
        assert _lzw_decode(_lzw_encode(data, ms), ms, len(data)) == data, ms


def test_error_surfaces():
    img = _rand_img(1, 10, 10)
    good = encode_gif(img)

    with pytest.raises(ValueError, match="bad signature"):
        decode_gif(b"JIF89a" + good[6:])
    with pytest.raises(ValueError, match="payload is None"):
        decode_gif(None)
    with pytest.raises(ValueError, match="truncated global color table"):
        decode_gif(good[: 13 + 100])
    with pytest.raises(ValueError, match="unknown block introducer"):
        decode_gif(good[: 13 + 768] + b"\x99" + good[13 + 768 :])
    with pytest.raises(ValueError, match="truncated image data sub-blocks"):
        decode_gif(good[:-10])
    # no trailer and no image -> truncated
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(good[: 13 + 768])
    # trailer before any image block
    with pytest.raises(ValueError, match="no image data block"):
        decode_gif(good[: 13 + 768] + b"\x3b")
    # no color table anywhere: clear the GCT flag and drop the table
    hdr = bytearray(good[:13])
    hdr[10] &= 0x7F
    with pytest.raises(ValueError, match="neither local nor global"):
        decode_gif(bytes(hdr) + good[13 + 768 :])
    # zero-sized descriptor
    bad = bytearray(good)
    struct.pack_into("<HH", bad, 13 + 768 + 5, 0, 0)
    with pytest.raises(ValueError, match="zero-sized"):
        decode_gif(bytes(bad))
    # LZW min code size out of range
    bad = bytearray(good)
    bad[13 + 768 + 10] = 12
    with pytest.raises(ValueError, match="minimum code size"):
        decode_gif(bytes(bad))
    # corrupt LZW: first code after clear must be a root.  Craft a
    # stream whose first code is 300 (beyond the 258-entry fresh table).
    stream = bytearray()
    acc = 300 | (257 << 9)  # code 300, then EOI
    for _ in range(3):
        stream.append(acc & 0xFF)
        acc >>= 8
    payload = (
        good[: 13 + 768]
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
        + bytes([8, len(stream)]) + bytes(stream) + b"\x00\x3b"
    )
    with pytest.raises(ValueError, match="corrupt LZW"):
        decode_gif(payload)
    # encoder guards
    with pytest.raises(ValueError, match="non-empty 2-D"):
        encode_gif(np.zeros((0, 4)))
    with pytest.raises(ValueError, match="non-empty 2-D"):
        encode_gif(np.zeros(16))
    with pytest.raises(ValueError, match="u16 limit"):
        encode_gif(np.zeros((1, 70000)))


def test_lzw_output_capped_by_descriptor():
    """The LZW decode stops once the descriptor's raster is full
    (round-12: the cap makes a malicious stream unable to expand past
    the claimed w*h) — a descriptor shrunk to 2x2 over a 10x10 stream
    decodes to the first 4 raster pixels, no error, bounded output."""
    img = _rand_img(2, 10, 10)
    enc = bytearray(encode_gif(img))
    struct.pack_into("<HH", enc, 13 + 768 + 5, 2, 2)
    out = decode_gif(bytes(enc))
    assert out.shape == (2, 2)
    assert np.array_equal(out, img.ravel()[:4].reshape(2, 2).astype(np.float64))
