"""Pure-Python PNG codec (operators/png.py) + the real-decode
multimodal path: the pHash image near-dup pipeline running on REAL
encoded PNG bytes end-to-end — the previously env-blocked gap, closed
without new packages (zlib + Paeth unfiltering)."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from zeek_duckdb_spark.operators.png import (
    decode_png,
    encode_png,
    png_features,
)


def _rand_img(seed, h=32, w=32):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w)).astype(np.uint8)


def test_roundtrip_gray_exact():
    img = _rand_img(7)
    out = decode_png(encode_png(img))
    assert out.shape == (32, 32)
    assert np.array_equal(out, img.astype(np.float64))


def test_roundtrip_rgb_luma():
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, size=(8, 5, 3)).astype(np.uint8)
    out = decode_png(encode_png(rgb))
    want = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    assert out.shape == (8, 5)
    assert np.allclose(out, want)


def _filtered_png(img, filters):
    """Hand-build a gray PNG applying the GIVEN per-row filter types —
    exercises the unfilter paths our filter-0 encoder never emits.
    Filtering follows the public spec: the stored byte is
    raw - predictor (mod 256)."""
    a = np.asarray(img, dtype=np.int64)
    h, w = a.shape
    body = bytearray()
    prev = np.zeros(w, dtype=np.int64)
    for r in range(h):
        cur = a[r]
        ft = filters[r % len(filters)]
        body.append(ft)
        for i in range(w):
            left = int(cur[i - 1]) if i else 0
            up = int(prev[i])
            ul = int(prev[i - 1]) if i else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = (
                    left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                )
            body.append((int(cur[i]) - pred) & 0xFF)
        prev = cur

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(body)))
        + chunk(b"IEND", b"")
    )


def test_all_five_filter_types_unfilter_exactly():
    img = _rand_img(11, h=10, w=7)
    # every filter type appears, including runs that chain row state
    png = _filtered_png(img, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    assert np.array_equal(decode_png(png), img.astype(np.float64))


def test_palette_and_alpha_color_types():
    # palette: indices -> PLTE rgb -> BT.601 luma
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    body = b"".join(b"\x00" + idx[r].tobytes() for r in range(2))

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal)
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )
    got = decode_png(png)
    want = np.array(
        [[255 * 0.299, 255 * 0.587], [255 * 0.114, 10 * 0.299 + 20 * 0.587 + 30 * 0.114]]
    )
    assert np.allclose(got, want)

    # gray+alpha (4) and RGBA (6): alpha ignored
    ga = np.zeros((2, 3, 2), dtype=np.uint8)
    ga[:, :, 0] = [[1, 2, 3], [4, 5, 6]]
    ga[:, :, 1] = 200
    body = b"".join(b"\x00" + ga[r].reshape(-1).tobytes() for r in range(2))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 4, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(body))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(
        decode_png(png), np.array([[1, 2, 3], [4, 5, 6]], dtype=np.float64)
    )


def test_error_surfaces():
    img = _rand_img(1, 4, 4)
    good = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"notapng" + good)
    with pytest.raises(ValueError, match="CRC"):
        bad = bytearray(good)
        bad[20] ^= 0xFF  # flip an IHDR byte, CRC now mismatches
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="IDAT|truncated|IEND"):
        decode_png(good[: len(good) - 20])
    with pytest.raises(ValueError, match="None"):
        decode_png(None)
    with pytest.raises(ValueError, match="interlace"):
        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )
        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(b"\x00ab\x00cd"))
            + chunk(b"IEND", b"")
        )
        decode_png(png)
    with pytest.raises(ValueError, match="8-bit"):
        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )
        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00abcd\x00efgh"))
            + chunk(b"IEND", b"")
        )
        decode_png(png)
    with pytest.raises(ValueError, match="gray"):
        encode_png(np.zeros((2, 2, 4)))


def test_png_features_deterministic():
    img = _rand_img(5, 16, 8)
    f = png_features(encode_png(img))
    assert f[0] == 8.0 and f[1] == 16.0
    a = img.astype(np.float64)
    assert f[2] == pytest.approx(a.mean()) and f[3] == pytest.approx(a.std())


# --- the real-decode end-to-end: planted near-dups collapse ----------


def test_phash_real_bytes_planted_pair_collapses(spark):
    """The round-7..10 gap, closed: REAL encoded PNG bytes flow through
    phash_media(decoder='png') on executors, and the planted
    re-encode/upscale/brightness variants collapse via phash_pairs
    while distinct images stay apart."""
    from zeek_duckdb_spark.operators import multimodal as mm

    base = _rand_img(42)
    # 2x nearest-neighbour upscale: phash's 32x32 index resize picks
    # every other pixel -> near-identical spectrum
    up = np.kron(base, np.ones((2, 2), dtype=np.uint8))
    # re-encode as RGB (same pixels through the luma path)
    rgb = np.repeat(base[:, :, None], 3, axis=2)
    # mild deterministic noise: still a near-dup, not byte-identical
    noise = base.astype(np.int64).copy()
    noise[::7, ::5] += 2
    noisy = np.clip(noise, 0, 255).astype(np.uint8)
    others = [_rand_img(s) for s in (43, 44, 45)]

    rows = [
        (0, bytearray(encode_png(base))),
        (1, bytearray(encode_png(up))),
        (2, bytearray(encode_png(rgb))),
        (3, bytearray(encode_png(noisy))),
        (4, bytearray(encode_png(others[0]))),
        (5, bytearray(encode_png(others[1]))),
        (6, bytearray(encode_png(others[2]))),
        (7, None),  # NULL payload: dropped, never reaches the decoder
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary").repartition(4)

    hashed = mm.phash_media(df, decoder="png")
    hs = {r.doc_id: r.phash for r in hashed.collect()}
    assert set(hs) == {0, 1, 2, 3, 4, 5, 6}
    # upscale + RGB re-encode are spectrum-identical to base
    assert hs[1] == hs[0] and hs[2] == hs[0]

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.phash_pairs(hashed, max_hamming=6).collect()
    }
    planted = {(0, 1), (0, 2), (1, 2), (0, 3), (1, 3), (2, 3)}
    assert planted <= set(pairs)
    # no random image collides with anything
    for a, b in pairs:
        assert a in (0, 1, 2, 3) and b in (0, 1, 2, 3), (a, b)

    # decode_media's png built-in: schema + values through the engine
    feats = {
        r.doc_id: r
        for r in mm.decode_media(df.filter("media IS NOT NULL"),
                                 decoder="png").collect()
    }
    assert feats[0].feature[0] == 32.0 and feats[1].feature[1] == 64.0
    assert feats[2].feature[2] == pytest.approx(
        float(base.astype(np.float64).mean())
    )

    # 'jpeg' / 'image' became built-ins in round 12 (operators/jpeg.py)
    # 'webp' became a built-in in round 13 (operators/webp.py) — probe
    # with a format that stays out of pure-Python scope
    with pytest.raises(ValueError, match="unknown built-in"):
        mm.phash_media(df, decoder="bmp")
    with pytest.raises(ValueError, match="unknown built-in"):
        mm.decode_media(df, decoder="bmp")


def test_png_resize_unit():
    from zeek_duckdb_spark.operators.png import png_resize

    img = _rand_img(19, 32, 32)
    out = decode_png(png_resize(encode_png(img), 16, 8))
    assert out.shape == (8, 16)
    # nearest-neighbour with the phash index convention
    ry = (np.arange(8) * 32) // 8
    rx = (np.arange(16) * 32) // 16
    assert np.array_equal(out, img.astype(np.float64)[np.ix_(ry, rx)])
    with pytest.raises(ValueError, match="signature"):
        png_resize(b"not a png at all", 4, 4)
    with pytest.raises(ValueError, match="width"):
        png_resize(encode_png(img), 0, 4)


def test_resize_media_png_builtin_end_to_end(spark):
    """resize_media(resizer='png'): real decode -> NN resample ->
    real re-encode in executors; an upscale round-trips to the
    original pHash (the index-sampling convention is shared)."""
    from zeek_duckdb_spark.operators import multimodal as mm
    from zeek_duckdb_spark.operators.png import decode_png as dec

    base = _rand_img(23)
    rows = [(1, bytearray(encode_png(base))), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    out = {r.id: r for r in mm.resize_media(df, 64, 64, resizer="png").collect()}
    assert out[2].resized is None
    up = dec(bytes(out[1].resized))
    assert up.shape == (64, 64)
    from zeek_duckdb_spark.operators.multimodal import phash_value

    assert phash_value(up) == phash_value(base.astype(np.float64))
    # 'jpeg'/'image' became built-ins in round 12, 'webp' in round 13
    with pytest.raises(ValueError, match="unknown built-in"):
        mm.resize_media(df, 4, 4, resizer="bmp")


# --- property fuzz: the codec round-trips arbitrary images ----------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    rgb=st.booleans(),
)
def test_property_roundtrip_exact(h, w, seed, rgb):
    rng = np.random.RandomState(seed)
    shape = (h, w, 3) if rgb else (h, w)
    img = rng.randint(0, 256, size=shape).astype(np.uint8)
    out = decode_png(encode_png(img))
    assert out.shape == (h, w)
    if rgb:
        want = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        assert np.allclose(out, want)
    else:
        assert np.array_equal(out, img.astype(np.float64))


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    filters=st.lists(st.integers(0, 4), min_size=1, max_size=8),
)
def test_property_any_filter_sequence_unfilters(h, w, seed, filters):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
    assert np.array_equal(
        decode_png(_filtered_png(img, filters)), img.astype(np.float64)
    )


def test_corrupt_idat_raises_valueerror_not_zlib_error():
    """CRC-valid chunks around a truncated deflate stream must still
    raise ValueError (the documented single-exception contract), never
    leak zlib.error into a caller's except-ValueError row skip."""
    img = _rand_img(2, 8, 8)
    good = encode_png(img)
    # parse out the IDAT, truncate its deflate payload, rebuild with a
    # CORRECT CRC so only the stream itself is broken
    pos = 8
    out = good[:8]
    while pos + 12 <= len(good):
        (ln,) = struct.unpack(">I", good[pos:pos + 4])
        ctype = good[pos + 4:pos + 8]
        data = good[pos + 8:pos + 8 + ln]
        if ctype == b"IDAT":
            data = data[: len(data) // 2]
        out += (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )
        pos += 12 + ln
    with pytest.raises(ValueError, match="IDAT|inflated"):
        decode_png(out)
