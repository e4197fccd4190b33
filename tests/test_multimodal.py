"""Multimodal plumbing: opaque binary payloads + typed metadata, and
the mapInPandas decode/resize/frame-sample stubs (deterministic fakes;
the real decoders are declared NotImplementedError — no PIL/ffmpeg in
this container)."""

import pytest
from pyspark.sql import functions as F

from zeek_duckdb_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "x" * 1000), (4, None)],
        "doc_id long, text string",
    )
    return mm.attach_media(df, "text", fmt="utf8")


def test_attach_media_meta(media):
    rows = {r.doc_id: r for r in media.collect()}
    assert rows[1].media == b"hello world"
    assert rows[1].media_meta.n_bytes == 11
    assert rows[1].media_meta.format == "utf8"
    assert rows[2].media == b""
    assert rows[4].media is None


def test_decode_real_is_declared_stub(media):
    with pytest.raises(NotImplementedError):
        mm.decode_media(media, fake=False)
    with pytest.raises(NotImplementedError):
        mm.resize_media(media, 4, 4, fake=False)
    with pytest.raises(NotImplementedError):
        mm.sample_frames(media, fake=False)


def test_resize_media_tiles_and_truncates(media):
    out = {r.id: r for r in mm.resize_media(media, 4, 3, fake=True).collect()}
    assert out[1].resized == (b"hello world" * 2)[:12]
    assert (out[1].width, out[1].height) == (4, 3)
    assert out[2].resized == b""          # empty payload stays empty
    assert out[3].resized == b"x" * 12    # truncation
    assert out[4].resized is None         # null passthrough
    assert len(out) == 4                  # pure map: row count preserved


def test_sample_frames_stride_and_cap(spark):
    # 10 frames of 4 bytes; stride 2 -> frames 0,2,4,6,8; cap 3 -> 0,2,4
    payload = b"".join(bytes([i] * 4) for i in range(10))
    df = spark.createDataFrame([(7, payload)], "doc_id long, media binary")
    rows = sorted(
        mm.sample_frames(
            df, frame_bytes=4, stride=2, max_frames=3, fake=True
        ).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.doc_id, r.frame_idx, r.frame) for r in rows] == [
        (7, 0, bytes([0] * 4)),
        (7, 2, bytes([2] * 4)),
        (7, 4, bytes([4] * 4)),
    ]


def test_sample_frames_partial_tail_and_null(spark):
    df = spark.createDataFrame(
        [(1, b"abcdefg"), (2, None), (3, b"")],
        "doc_id long, media binary",
    )
    rows = mm.sample_frames(
        df, frame_bytes=4, stride=1, max_frames=10, fake=True
    ).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.doc_id, []).append((r.frame_idx, r.frame))
    # ceil division keeps the 3-byte tail frame
    assert sorted(by_id[1]) == [(0, b"abcd"), (1, b"efg")]
    assert 2 not in by_id  # null payload: no frames
    assert 3 not in by_id  # empty payload: zero frames


# --- content-defined chunking -----------------------------------------


def _cdc_df(spark, rows):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_cdc_chunks_tile_and_are_deterministic(spark):
    import random as _r

    from zeek_duckdb_spark.operators.multimodal import cdc_chunks

    rng = _r.Random(1)
    blob = bytes(rng.randrange(256) for _ in range(5000))
    df = _cdc_df(spark, [(1, bytearray(blob))])
    a = sorted(
        (r.chunk_idx, r.offset, r.length, r.chunk_hash)
        for r in cdc_chunks(df, min_size=64, avg_size=256, max_size=1024).collect()
    )
    # chunks tile the blob exactly: contiguous, full coverage
    pos = 0
    for _, off, ln, _h in a:
        assert off == pos and 64 <= ln <= 1024 or (off + ln == 5000)
        pos = off + ln
    assert pos == 5000
    b = sorted(
        (r.chunk_idx, r.offset, r.length, r.chunk_hash)
        for r in cdc_chunks(
            df.repartition(3), min_size=64, avg_size=256, max_size=1024
        ).collect()
    )
    assert a == b


def test_cdc_chunks_are_shift_resistant(spark):
    """The CDC property fixed-size blocks lack: prepending bytes leaves
    most downstream chunk hashes unchanged."""
    import random as _r

    from zeek_duckdb_spark.operators.multimodal import cdc_chunks

    rng = _r.Random(2)
    body = bytes(rng.randrange(256) for _ in range(8000))
    rng2 = _r.Random(3)
    shifted = bytes(rng2.randrange(256) for _ in range(37)) + body
    df = _cdc_df(spark, [(1, bytearray(body)), (2, bytearray(shifted))])
    ch = cdc_chunks(df, min_size=64, avg_size=256, max_size=1024)
    h1 = {r.chunk_hash for r in ch.filter("doc_id = 1").collect()}
    h2 = {r.chunk_hash for r in ch.filter("doc_id = 2").collect()}
    shared = len(h1 & h2) / len(h1)
    assert shared > 0.7, f"only {shared:.0%} of chunks survived a 37-byte shift"


def test_chunk_dedup_groups_reclaimable_bytes(spark):
    from zeek_duckdb_spark.operators.multimodal import cdc_chunks, chunk_dedup_groups

    blob = bytes(i % 251 for i in range(4096))
    df = _cdc_df(spark, [(1, bytearray(blob)), (2, bytearray(blob))])
    groups = chunk_dedup_groups(cdc_chunks(df)).collect()
    assert groups, "identical blobs must share every chunk"
    for g in groups:
        assert g.n_copies == 2 and g.n_blobs == 2
        assert g.bytes_reclaimable == g.length
    # every byte of one copy is reclaimable
    assert sum(g.bytes_reclaimable for g in groups) == 4096


def test_cdc_chunks_validates_params(spark):
    from zeek_duckdb_spark.operators.multimodal import cdc_chunks

    df = _cdc_df(spark, [(1, bytearray(b"xyz"))])
    with pytest.raises(ValueError, match="power of two"):
        cdc_chunks(df, avg_size=100)
    with pytest.raises(ValueError, match="min_size"):
        cdc_chunks(df, min_size=0)
    # empty / NULL payloads produce no chunks, no crash
    df2 = _cdc_df(spark, [(1, bytearray(b"")), (2, None)])
    assert cdc_chunks(df2).count() == 0


def test_cdc_chunks_respects_string_id_column(spark):
    # the output id field derives name AND type from the input id
    # column (it used to hardcode doc_id:int64, crashing on string ids)
    import random as _r

    from zeek_duckdb_spark.operators.multimodal import cdc_chunks, chunk_dedup_groups

    rng = _r.Random(4)
    blob = bytearray(rng.randrange(256) for _ in range(3000))
    df = spark.createDataFrame(
        [("img-a", blob), ("img-b", blob)], "media_id string, media binary"
    )
    ch = cdc_chunks(df, id_col="media_id", min_size=64, avg_size=256, max_size=1024)
    assert ch.columns[0] == "media_id"
    assert dict(ch.dtypes)["media_id"] == "string"
    rows = ch.collect()
    assert {r.media_id for r in rows} == {"img-a", "img-b"}
    # identical blobs chunk identically, and the dedup aggregate counts
    # distinct blobs by the string id
    groups = chunk_dedup_groups(ch, id_col="media_id").collect()
    assert groups and all(g.n_blobs == 2 for g in groups)
    # a projected/reordered frame aggregates the NAMED id column, not
    # whatever happens to be first
    reordered = ch.select("chunk_hash", "length", "media_id", "chunk_idx")
    g2 = chunk_dedup_groups(reordered, id_col="media_id").collect()
    assert sorted((g.chunk_hash, g.n_blobs) for g in g2) == sorted(
        (g.chunk_hash, g.n_blobs) for g in groups
    )


# --- injected real-decoder callbacks ----------------------------------


def test_decode_media_injected_decoder(media):
    # a stand-in for a real PIL/librosa extractor: 2-dim feature
    out = {
        r.doc_id: r
        for r in mm.decode_media(
            media, decoder=lambda b: [float(len(b)), float(b[0]) if b else -1.0]
        ).collect()
    }
    assert out[1].feature == [11.0, float(b"h"[0])]
    assert out[2].feature == [0.0, -1.0]
    assert out[4].feature is None  # NULL payload bypasses the callback


def test_resize_media_injected_resizer(media):
    # a real encoder's output is passed through verbatim (no wh sizing)
    out = {
        r.id: r
        for r in mm.resize_media(
            media, 4, 3, resizer=lambda b, w, h: b[: w + h]
        ).collect()
    }
    assert out[1].resized == b"hello w"
    assert out[2].resized == b""
    assert out[4].resized is None


def test_sample_frames_injected_sampler(spark):
    df = spark.createDataFrame(
        [("a", b"0123456789"), ("b", None)], "doc_id string, media binary"
    )

    def sampler(b):
        # keyframe-ish: first and last 2 bytes
        yield 0, b[:2]
        yield 99, b[-2:]

    rows = sorted(
        mm.sample_frames(df, sampler=sampler).collect(),
        key=lambda r: r.frame_idx,
    )
    # string ids survive (output id column follows id_col name + dtype)
    assert [(r.doc_id, r.frame_idx, r.frame) for r in rows] == [
        ("a", 0, b"01"),
        ("a", 99, b"89"),
    ]


def test_callback_and_fake_are_exclusive(media):
    with pytest.raises(ValueError):
        mm.decode_media(media, fake=True, decoder=lambda b: [0.0])
    with pytest.raises(ValueError):
        mm.resize_media(media, 2, 2, fake=True, resizer=lambda b, w, h: b)
    with pytest.raises(ValueError):
        mm.sample_frames(media, fake=True, sampler=lambda b: [])


# --- perceptual hashing -------------------------------------------------

def test_phash_matches_reference_impl_and_is_deterministic(spark):
    import numpy as np

    from zeek_duckdb_spark.operators.multimodal import (
        _fake_image, phash_media, phash_value,
    )

    rng = np.random.default_rng(3)
    payloads = [bytes(rng.integers(0, 256, 500, dtype=np.uint8)) for _ in range(20)]
    d = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, media binary",
    )
    got = {r.doc_id: r.phash for r in phash_media(d, fake=True).collect()}
    for i, p in enumerate(payloads):
        assert got[i] == phash_value(_fake_image(p))
    again = {r.doc_id: r.phash for r in phash_media(d, fake=True).collect()}
    assert got == again


def test_phash_survives_mild_perturbation_pairs(spark):
    import numpy as np

    from zeek_duckdb_spark.operators.multimodal import phash_media, phash_pairs

    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, 1024, dtype=np.uint8)
    near = base.copy()
    near[::97] = (near[::97] + 3) % 256  # mild re-encode-style noise
    other = rng.integers(0, 256, 1024, dtype=np.uint8)
    d = spark.createDataFrame(
        [(0, bytearray(base.tobytes())), (1, bytearray(near.tobytes())),
         (2, bytearray(other.tobytes()))],
        "doc_id long, media binary",
    )
    hashed = phash_media(d, fake=True)
    pairs = phash_pairs(hashed, max_hamming=6).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got


def test_phash_decoder_injection_and_resize_invariance(spark):
    import numpy as np

    from zeek_duckdb_spark.operators.multimodal import phash_media, phash_value

    # decoder that treats the payload as an 8-bit 64x64 image; pHash of
    # the 2x-upscaled image must be CLOSE to the original's (low-
    # frequency structure preserved) — the property byte-hashing lacks
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32)).astype(np.float64)
    big = np.kron(img, np.ones((2, 2)))  # 64x64 nearest upscale
    h1, h2 = phash_value(img), phash_value(big)
    assert bin(h1 ^ h2).count("1") <= 6

    def dec(b):
        a = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
        n = int(len(a) ** 0.5)
        return a[: n * n].reshape(n, n)

    d = spark.createDataFrame(
        [(1, bytearray(img.astype(np.uint8).tobytes()))],
        "doc_id long, media binary",
    )
    got = phash_media(d, decoder=dec).collect()[0].phash
    assert got == phash_value(dec(img.astype(np.uint8).tobytes()))


def test_phash_validation(spark):
    from zeek_duckdb_spark.operators.multimodal import phash_media

    d = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, media binary")
    with pytest.raises(NotImplementedError, match="native library"):
        phash_media(d)
    with pytest.raises(ValueError, match="bits"):
        phash_media(d, fake=True, bits=64)
    with pytest.raises(ValueError, match="not both"):
        phash_media(d, fake=True, decoder=lambda b: [[1.0]])


def test_phash_skips_null_payloads(spark):
    from zeek_duckdb_spark.operators.multimodal import phash_media

    d = spark.createDataFrame(
        [(1, bytearray(b"abc" * 100)), (2, None)], "doc_id long, media binary"
    )
    got = phash_media(d, fake=True).collect()
    assert [r.doc_id for r in got] == [1]


def test_sample_frames_validates_stride_driver_side(media):
    """stride=0 must fail at construction with a clear message, not as
    an opaque ZeroDivisionError inside executor tasks (round-12)."""
    with pytest.raises(ValueError, match="stride"):
        mm.sample_frames(media, stride=0, fake=True)
    with pytest.raises(ValueError, match="max_frames"):
        mm.sample_frames(media, max_frames=0, fake=True)
    with pytest.raises(ValueError, match="frame_bytes"):
        mm.sample_frames(media, frame_bytes=0, fake=True)


def test_pil_adapter_guard_and_dispatch():
    """decoder='pil' (round-14): the production-shaped Pillow adapter
    behind an import guard — absent Pillow errors loudly NAMING the
    package (never a silent wrong answer), and the string dispatch
    knows the name either way."""
    from zeek_duckdb_spark.operators.multimodal import pil_features, pil_gray

    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if have_pil:
        pytest.skip("Pillow present: covered by test_pil_parity_with_builtins")
    with pytest.raises(ImportError, match="Pillow"):
        pil_features(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ImportError, match="Pillow"):
        pil_gray(b"\x89PNG\r\n\x1a\n")
    # unknown-name errors enumerate 'pil' on both operators
    d = None
    with pytest.raises(ValueError, match="'pil'"):
        mm.decode_media(d, decoder="bogus")
    with pytest.raises(ValueError, match="'pil'"):
        mm.phash_media(d, decoder="bogus")


def test_pil_parity_with_builtins():
    """When Pillow IS present (skipped honestly when absent — this
    container ships no image libraries): the adapter's features must
    exactly match the pure-Python codecs on overlapping formats, and —
    the r13 advice item — Pillow serves as the EXTERNAL ANCHOR for the
    VP8L WebP codec: libwebp's decode of our encoder's bytes must
    equal our own decode."""
    pytest.importorskip("PIL")
    import numpy as np
    from PIL import features as pil_feature_check

    from zeek_duckdb_spark.operators.multimodal import pil_features
    from zeek_duckdb_spark.operators.png import encode_png, png_features
    from zeek_duckdb_spark.operators.webp import decode_webp, encode_webp

    rng = np.random.RandomState(14)
    gray = rng.randint(0, 256, (40, 56)).astype(np.uint8)
    rgb = rng.randint(0, 256, (24, 31, 3)).astype(np.uint8)

    for img in (gray, rgb):
        payload = encode_png(img)
        assert pil_features(payload) == png_features(payload)

    # ring contract: garbage raises ValueError (never Pillow's own
    # UnidentifiedImageError), so the on_error quarantine seams work
    with pytest.raises(ValueError, match="Pillow decode failed"):
        pil_features(b"not an image at all")

    if pil_feature_check.check("webp"):
        import io

        from PIL import Image

        wp = encode_webp(rgb)
        ours = decode_webp(wp)
        theirs = np.asarray(
            Image.open(io.BytesIO(wp)).convert("RGB"), dtype=np.float64
        ) @ np.array([0.299, 0.587, 0.114])
        assert np.allclose(ours, theirs)
