"""Shared RIFF container chunk walker — ONE implementation of the
word-aligned little-endian chunk framing that both RIFF-family parsers
(:mod:`operators.avi`, :mod:`operators.wav`) consume, so truncation
handling and alignment rules cannot drift between them.

LIST chunks yield their list-type as ``b'LIST:<type>'`` with the body
EXCLUDING the 4-byte list type (callers that treat LIST as opaque just
won't match its fourcc).  Format layout follows the public RIFF spec
(Microsoft/IBM 1991); no third-party code.
"""

from __future__ import annotations

import struct

__all__ = ["walk_chunks"]


def walk_chunks(buf: bytes, pos: int, end: int, who: str = "riff"):
    """Yield ``(fourcc, body_start, body_len)`` for the chunks in
    ``buf[pos:end]``; raises ValueError naming ``who`` on a chunk whose
    declared length runs past ``end``.  Chunks are word-aligned (odd
    lengths pad one byte)."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = pos + 8
        if body + ln > end:
            raise ValueError(f"{who}: truncated {cid!r} chunk")
        if cid == b"LIST":
            yield b"LIST:" + buf[body : body + 4], body + 4, ln - 4
        else:
            yield cid, body, ln
        pos = body + ln + (ln & 1)      # chunks are word-aligned
