"""Minimal pure-Python AVI/MJPEG container codec — makes VIDEO frame
sampling REAL: ``sample_frames(sampler="avi")`` extracts actual
encoded JPEG frames from an actual video container, and each frame
then flows through the existing real-decode chain
(``phash_media(decoder="jpeg")``) for video near-dup detection — the
last multimodal family that was callback-only.

Scope (documented, loud errors outside it): RIFF 'AVI ' container,
ONE video stream, MJPEG codec ('MJPG' — every frame is a standalone
baseline JPEG, which :mod:`operators.jpeg` decodes).  Other codecs
(XVID/H264/...) raise with the fourcc named — at scale inject
ffmpeg/decord through the same ``sampler=`` seam.  Container layout
follows the public AVI RIFF spec (Microsoft Video for Windows); no
third-party code.

The encoder is the FIXTURE side: a list of grayscale frames ->
MJPEG AVI (each frame via :func:`jpeg.encode_jpeg`), enough to plant
real multi-frame videos and their re-encoded near-dup variants in
tests without ffmpeg.
"""

from __future__ import annotations

import struct

__all__ = ["avi_mjpeg_frames", "encode_avi_mjpeg"]


def _walk_chunks(buf: bytes, pos: int, end: int):
    """The shared RIFF walker (:mod:`operators.riff`), error-labeled
    for this parser."""
    from zeek_duckdb_spark.operators.riff import walk_chunks

    return walk_chunks(buf, pos, end, who="avi_mjpeg_frames")


def avi_mjpeg_frames(payload: bytes):
    """AVI bytes -> generator of ``(frame_idx, jpeg_bytes)`` for the
    video stream's frames, in stream order.  Raises ValueError on
    malformed containers and on non-MJPEG codecs (fourcc named).

    Frames are the raw '00dc' chunk bodies — standalone baseline
    JPEGs under MJPEG, ready for :func:`jpeg.decode_jpeg` /
    ``phash_media(decoder="jpeg")``.  The generator validates each
    frame's SOI marker so a lying header fails at the first frame,
    not downstream in the decoder."""
    if payload is None:
        raise ValueError("avi_mjpeg_frames: payload is None")
    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("avi_mjpeg_frames: not a RIFF/AVI file")

    vids = []                       # (stream index, handler fourcc)
    stream_no = 0
    movi = None
    for cid, start, ln in _walk_chunks(buf, 12, len(buf)):
        if cid == b"LIST:hdrl":
            for c2, s2, l2 in _walk_chunks(buf, start, start + ln):
                if c2 == b"LIST:strl":
                    for c3, s3, l3 in _walk_chunks(buf, s2, s2 + l2):
                        if c3 == b"strh" and l3 >= 8:
                            if buf[s3 : s3 + 4] == b"vids":
                                vids.append((stream_no, buf[s3 + 4 : s3 + 8]))
                    # streams are numbered by strl position, video or not
                    stream_no += 1
        elif cid == b"LIST:movi":
            movi = (start, ln)
    if not vids:
        raise ValueError("avi_mjpeg_frames: no video stream (strh vids)")
    if len(vids) > 1:
        raise ValueError(
            f"avi_mjpeg_frames: {len(vids)} video streams — outside the "
            "one-video-stream scope; inject a real sampler "
            "(ffmpeg/decord) through the sampler= seam"
        )
    v_idx, handler = vids[0]
    if handler.upper() not in (b"MJPG", b"MJPA"):
        raise ValueError(
            f"avi_mjpeg_frames: codec {handler.decode('latin1')!r} is "
            "outside the MJPEG scope — inject a real sampler "
            "(ffmpeg/decord) through the sampler= seam"
        )
    if movi is None:
        raise ValueError("avi_mjpeg_frames: missing movi list")
    # only THE video stream's chunks are frames: '##dc' where ## is the
    # stream's 2-digit ASCII number (audio '##wb' and any other
    # stream's data never interleave into the frame sequence)
    want = b"%02ddc" % v_idx

    def gen():
        idx = 0
        start, ln = movi
        for cid, s, l in _walk_chunks(buf, start, start + ln):
            if cid == want:
                frame = buf[s : s + l]
                if frame[:2] != b"\xff\xd8":
                    raise ValueError(
                        "avi_mjpeg_frames: frame %d is not a JPEG "
                        "(bad SOI) — corrupt MJPEG stream" % idx
                    )
                yield idx, frame
                idx += 1

    return gen()


def encode_avi_mjpeg(frames, fps: int = 10, quality: int = 85) -> bytes:
    """List of 2-D grayscale arrays -> MJPEG AVI bytes (each frame a
    baseline JPEG via :func:`jpeg.encode_jpeg`).  All frames must
    share one shape (the container declares a single frame size).
    Fixture-grade: hdrl + movi, no idx1 index (the frame walk above
    does not need one; seek-happy players do)."""
    import numpy as np

    from zeek_duckdb_spark.operators.jpeg import encode_jpeg

    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("encode_avi_mjpeg: no frames")
    if fps < 1:
        raise ValueError("encode_avi_mjpeg: fps must be >= 1")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("encode_avi_mjpeg: frames must share one shape")
    encoded = [encode_jpeg(f, quality=quality) for f in frames]
    max_len = max(len(e) for e in encoded)

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,   # microseconds per frame
        max_len * fps,      # max bytes/sec (upper bound)
        0,                  # padding granularity
        0x10,               # AVIF_HASINDEX off; 0x10 = interleaved flag
        len(encoded),       # total frames
        0, 1, max_len,      # initial frames, streams, suggested buffer
        w, h, 0, 0, 0, 0,   # width, height, reserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(encoded), max_len, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D,  # 'MJPG' LE
        w * h * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", e) for e in encoded))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
