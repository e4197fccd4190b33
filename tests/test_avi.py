"""AVI/MJPEG container codec (operators/avi.py) + REAL video frame
sampling: ``sample_frames(sampler='avi')`` extracts actual encoded
JPEG frames from an actual container, and the full video near-dup
chain — sample frames, pHash each via the real JPEG decoder, pair —
runs end-to-end with no external library (the last multimodal family
that was callback-only)."""

import struct

import numpy as np
import pytest

from zeek_duckdb_spark.operators.avi import (
    avi_mjpeg_frames,
    encode_avi_mjpeg,
)
from zeek_duckdb_spark.operators.jpeg import decode_jpeg


def _natural_img(seed, h=48, w=48):
    rng = np.random.RandomState(seed)
    img = rng.normal(0, 1, (h * 2, w * 2))
    for _ in range(3):
        img = (np.roll(img, 1, 0) + img + np.roll(img, -1, 0)) / 3
        img = (np.roll(img, 1, 1) + img + np.roll(img, -1, 1)) / 3
    img = img[:h, :w]
    return (img - img.min()) / (img.max() - img.min()) * 255


def _video(seed, n=6):
    """n drifting frames derived from one base image — consecutive
    frames are near-dups of each other, like real video."""
    base = _natural_img(seed)
    return [np.clip(base + i * 2.0, 0, 255) for i in range(n)]


def test_roundtrip_frames_decode():
    frames = _video(7)
    avi = encode_avi_mjpeg(frames, fps=5, quality=90)
    out = list(avi_mjpeg_frames(avi))
    assert [i for i, _ in out] == list(range(len(frames)))
    for (_, jpg), src in zip(out, frames):
        assert jpg[:2] == b"\xff\xd8"          # standalone JPEG
        dec = decode_jpeg(jpg)
        assert dec.shape == src.shape
        assert float(np.sqrt(((dec - src) ** 2).mean())) < 4.0


def test_error_surfaces():
    avi = encode_avi_mjpeg(_video(1, 3), quality=85)
    with pytest.raises(ValueError, match="payload is None"):
        avi_mjpeg_frames(None)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        avi_mjpeg_frames(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="truncated"):
        list(avi_mjpeg_frames(avi[: len(avi) // 2]))
    # foreign codec rejected BY NAME
    with pytest.raises(ValueError, match="'XVID'"):
        avi_mjpeg_frames(avi.replace(b"MJPG", b"XVID", 1))
    # corrupt frame: SOI check fires at the lying frame
    i = avi.find(b"00dc")
    bad = avi[: i + 8] + b"XX" + avi[i + 10 :]
    with pytest.raises(ValueError, match="bad SOI"):
        list(avi_mjpeg_frames(bad))
    with pytest.raises(ValueError, match="no frames"):
        encode_avi_mjpeg([])
    with pytest.raises(ValueError, match="share one shape"):
        encode_avi_mjpeg([np.zeros((8, 8)), np.zeros((8, 9))])
    with pytest.raises(ValueError, match="fps"):
        encode_avi_mjpeg([np.zeros((8, 8))], fps=0)


def test_sample_frames_avi_end_to_end(spark):
    """The real video chain on executors: sample real JPEG frames from
    real AVI containers (stride/cap honored), pHash each frame via the
    real JPEG decoder, and a re-encoded copy of the same video
    collapses frame-by-frame while a distinct video stays apart."""
    from zeek_duckdb_spark.operators import multimodal as mm

    vid_a = encode_avi_mjpeg(_video(42), quality=92)
    vid_a2 = encode_avi_mjpeg(_video(42), quality=60)     # re-encode
    vid_b = encode_avi_mjpeg(_video(99), quality=92)
    df = spark.createDataFrame(
        [(0, bytearray(vid_a)), (1, bytearray(vid_a2)),
         (2, bytearray(vid_b)), (3, None)],
        "doc_id long, media binary",
    )

    frames = mm.sample_frames(df, stride=2, max_frames=2, sampler="avi")
    rows = frames.collect()
    got = {(r.doc_id, r.frame_idx) for r in rows}
    # stride 2 over 6 frames -> idx 0, 2; cap 2; null payload -> none
    assert got == {(d, i) for d in (0, 1, 2) for i in (0, 2)}
    for r in rows:
        assert bytes(r.frame)[:2] == b"\xff\xd8"

    # frame-level near-dup: pHash the sampled frames through the REAL
    # JPEG decoder; same-video frames collapse across the re-encode
    keyed = frames.selectExpr(
        "doc_id * 10 + frame_idx AS doc_id", "frame AS media"
    )
    hs = {
        r.doc_id: r.phash
        for r in mm.phash_media(keyed, decoder="jpeg").collect()
    }
    for idx in (0, 2):
        same = bin(hs[0 + idx] ^ hs[10 + idx]).count("1")
        diff = bin(hs[0 + idx] ^ hs[20 + idx]).count("1")
        assert same <= 6 < diff, (idx, same, diff)

    with pytest.raises(ValueError, match="unknown built-in sampler"):
        mm.sample_frames(df, sampler="mp4")


def _chunk(cid, body):
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _lst(ltype, body):
    return _chunk(b"LIST", ltype + body)


def _strl(fcc_type, handler):
    return _lst(b"strl", _chunk(b"strh", fcc_type + handler + b"\x00" * 40))


def _hand_avi(strls, movi_chunks):
    body = b"AVI " + _lst(b"hdrl", b"".join(strls)) + _lst(
        b"movi", b"".join(movi_chunks)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_multi_stream_scope_enforced():
    """Round-12 fix: the documented ONE-video-stream scope is enforced
    loudly (two vids streams raise), and the frame walk filters movi
    chunks to THE video stream's 2-digit id — another stream's '##dc'
    chunks never interleave into the frame sequence."""
    from zeek_duckdb_spark.operators.jpeg import encode_jpeg

    jpg = encode_jpeg(np.full((8, 8), 64.0), quality=90)

    # two video streams: loud refusal, regardless of codec order
    two = _hand_avi(
        [_strl(b"vids", b"MJPG"), _strl(b"vids", b"XVID")],
        [_chunk(b"00dc", jpg)],
    )
    with pytest.raises(ValueError, match="2 video streams"):
        avi_mjpeg_frames(two)

    # audio stream 0 + video stream 1: frames come ONLY from '01dc';
    # the non-JPEG '00dc'-named junk (wrong-stream data) is ignored
    # (pre-fix: any '##dc' chunk was yielded -> bad-SOI error here)
    mixed = _hand_avi(
        [_strl(b"auds", b"\x01\x00\x00\x00"), _strl(b"vids", b"MJPG")],
        [
            _chunk(b"00wb", b"\x00" * 32),   # audio data
            _chunk(b"00dc", b"not a jpeg"),  # foreign-stream junk
            _chunk(b"01dc", jpg),
        ],
    )
    out = list(avi_mjpeg_frames(mixed))
    assert [(i, f[:2]) for i, f in out] == [(0, b"\xff\xd8")]
