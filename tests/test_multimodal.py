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
    assert [(r.id, r.frame_idx, r.frame) for r in rows] == [
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
        by_id.setdefault(r.id, []).append((r.frame_idx, r.frame))
    # ceil division keeps the 3-byte tail frame
    assert sorted(by_id[1]) == [(0, b"abcd"), (1, b"efg")]
    assert 2 not in by_id  # null payload: no frames
    assert 3 not in by_id  # empty payload: zero frames
