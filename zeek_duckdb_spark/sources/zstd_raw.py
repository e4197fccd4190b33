"""Minimal pure-Python zstd frame codec for STORE-mode frames.

The reference engine auto-detects ``.zst`` inputs by magic bytes
(``/root/reference/README.md:52``, ``src/zeek_scanner.cpp:261-262``)
and this environment has no ``zstandard`` module, so the positive scan
path would otherwise be untestable here.  This module implements the
subset of RFC 8878 that needs no entropy decoding:

- **decoder**: any sequence of zstd frames whose blocks are Raw_Block
  or RLE_Block (plus Skippable_Frames, which are skipped).  A
  Compressed_Block raises :class:`ZstdCompressedBlockError` — real
  compressed data still requires the ``zstandard`` module, and the
  caller surfaces that exact remedy;
- **encoder**: spec-valid STORE-mode frames (single segment, raw
  blocks of <= 128 KiB, frame content size present, no checksum).
  Any conformant zstd implementation decodes its output.

Both ends buffer whole payloads in memory — this is a fixture-scale
codec for tests and small logs, not the 100 TB scan path (install
``zstandard`` for streaming decode of real compressed frames).
"""

from __future__ import annotations

import struct

__all__ = [
    "ZstdRawError",
    "ZstdCompressedBlockError",
    "compress_store",
    "decompress",
]

_FRAME_MAGIC = 0xFD2FB528
_SKIPPABLE_LO = 0x184D2A50
_SKIPPABLE_HI = 0x184D2A5F
_MAX_RAW_BLOCK = 128 * 1024


class ZstdRawError(ValueError):
    """Malformed zstd frame (truncated, bad magic, reserved fields)."""


class ZstdCompressedBlockError(ZstdRawError):
    """Frame contains entropy-coded blocks this codec cannot decode."""


def compress_store(data: bytes) -> bytes:
    """Encode ``data`` as one spec-valid zstd frame of raw blocks."""
    out = bytearray(struct.pack("<I", _FRAME_MAGIC))
    n = len(data)
    # Frame_Header_Descriptor: Single_Segment_flag (bit 5) set, no
    # checksum, no dict; FCS field size picked from the content size
    if n < 256:
        out.append(0x20)                      # fcs_flag=0, 1-byte FCS
        out.append(n)
    elif n <= 0xFFFF + 256:
        out.append(0x60)                      # fcs_flag=1, 2-byte FCS
        out += struct.pack("<H", n - 256)
    else:
        out.append(0xA0)                      # fcs_flag=2, 4-byte FCS
        out += struct.pack("<I", n)
    if n == 0:
        out += (1).to_bytes(3, "little")      # last=1, Raw_Block, size 0
        return bytes(out)
    pos = 0
    while pos < n:
        size = min(_MAX_RAW_BLOCK, n - pos)
        last = 1 if pos + size >= n else 0
        out += (last | (size << 3)).to_bytes(3, "little")
        out += data[pos : pos + size]
        pos += size
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode concatenated store-mode zstd frames (raw/RLE blocks)."""
    out = bytearray()
    pos = 0
    end = len(data)
    while pos < end:
        if end - pos < 4:
            raise ZstdRawError("truncated frame magic")
        magic = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        if _SKIPPABLE_LO <= magic <= _SKIPPABLE_HI:
            if end - pos < 4:
                raise ZstdRawError("truncated skippable frame size")
            pos += 4 + struct.unpack_from("<I", data, pos)[0]
            if pos > end:
                raise ZstdRawError("truncated skippable frame body")
            continue
        if magic != _FRAME_MAGIC:
            raise ZstdRawError(f"bad zstd magic 0x{magic:08x}")
        pos = _decode_frame(data, pos, end, out)
    return bytes(out)


def _decode_frame(data: bytes, pos: int, end: int, out: bytearray) -> int:
    if pos >= end:
        raise ZstdRawError("truncated frame header")
    desc = data[pos]
    pos += 1
    if desc & 0x08:
        raise ZstdRawError("reserved frame-descriptor bit set")
    single_segment = bool(desc & 0x20)
    checksum = bool(desc & 0x04)
    dict_flag = desc & 0x03
    fcs_flag = desc >> 6
    if not single_segment:
        pos += 1                               # Window_Descriptor
    pos += (0, 1, 2, 4)[dict_flag]             # Dictionary_ID
    fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    pos += fcs_size                            # content size: unused
    if pos > end:
        raise ZstdRawError("truncated frame header fields")
    while True:
        if end - pos < 3:
            raise ZstdRawError("truncated block header")
        bh = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        if btype == 0:                         # Raw_Block
            if end - pos < bsize:
                raise ZstdRawError("truncated raw block")
            out += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:                       # RLE_Block
            if pos >= end:
                raise ZstdRawError("truncated RLE block")
            out += data[pos : pos + 1] * bsize
            pos += 1
        elif btype == 2:
            raise ZstdCompressedBlockError(
                "frame uses entropy-coded blocks; install the "
                "zstandard module to read real compressed zstd"
            )
        else:
            raise ZstdRawError("reserved block type")
        if last:
            break
    if checksum:
        pos += 4                               # xxh64 low bits: skip
        if pos > end:
            raise ZstdRawError("truncated content checksum")
    return pos
