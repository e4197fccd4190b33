"""Minimal pure-Python WAV (RIFF PCM) codec + spectrogram — the
REAL-decode path for the AUDIO modality, completing the round-11/12
image story (``operators/png.py``, ``operators/jpeg.py``) for the
second media type a crawl corpus carries.

Needs nothing beyond ``struct`` + numpy: RIFF chunk walk, fmt/data
parsing, integer PCM (8/16/24/32-bit) and IEEE-float (32/64-bit)
sample decode, channel averaging to mono.  Compressed codecs (ADPCM,
A-law/µ-law, MP3-in-WAV) raise with the format tag named — inject a
real decoder (soundfile/librosa) through the same ``decoder=`` seam
the image path uses.  Format layout follows the public RIFF/WAVE
spec (Microsoft/IBM 1991, multimedia programming interface) — no
third-party code.

The AUDIO NEAR-DUP path reuses the image machinery wholesale:
``wav_spectrogram`` renders a clip as a (bands x frames) log-energy
grid — a 2-D array exactly like a decoded image — so
``phash_media(decoder="wav")`` hashes it with the SAME DCT-sign pHash
and ``phash_pairs`` buckets it with the same SimHash block
permutations.  pHash drops the DC coefficient and thresholds at the
median, so the hash is invariant to a pure gain change (a constant
shift of all log energies) and robust to requantization noise
(-50 dB at 8-bit) — the two classic audio re-encode variants.

Scale shape: decode + spectrogram are per-payload Python inside
``mapInPandas`` Arrow batches, like the image decoders — right for
clip-length corpora riding binary columns; for hour-long recordings
inject a native decoder and a streaming framer.
"""

from __future__ import annotations

import struct

__all__ = [
    "decode_wav",
    "encode_wav",
    "wav_features",
    "wav_spectrogram",
]

# fmt-tag names for the loud out-of-scope errors
_FMT_NAMES = {
    0x0002: "ADPCM", 0x0006: "A-law", 0x0007: "mu-law",
    0x0011: "IMA ADPCM", 0x0055: "MP3",
}


def decode_wav(payload: bytes):
    """WAV bytes -> (sample_rate: int, samples: 1-D float64 mono in
    [-1, 1]).  Integer PCM 8/16/24/32-bit and IEEE float 32/64-bit;
    multi-channel averages to mono.  Raises ValueError on malformed
    input or out-of-scope codecs (named)."""
    import numpy as np

    if payload is None:
        raise ValueError("decode_wav: payload is None")
    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("decode_wav: not a RIFF/WAVE file")
    from zeek_duckdb_spark.operators.riff import walk_chunks

    fmt = None
    data = None
    for cid, s, ln in walk_chunks(buf, 12, len(buf), who="decode_wav"):
        if cid == b"fmt ":
            fmt = buf[s : s + ln]
        elif cid == b"data":
            data = buf[s : s + ln]
            # fmt is required to interpret data; keep walking only if
            # fmt has not appeared yet (non-canonical chunk order)
            if fmt is not None:
                break
    if fmt is None:
        raise ValueError("decode_wav: missing fmt chunk")
    if data is None:
        raise ValueError("decode_wav: missing data chunk")
    if len(fmt) < 16:
        raise ValueError("decode_wav: short fmt chunk")
    tag, nch, rate, _brate, _align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == 0xFFFE and len(fmt) >= 26:
        # WAVE_FORMAT_EXTENSIBLE: the real tag leads the GUID
        (tag,) = struct.unpack("<H", fmt[24:26])
    if tag not in (1, 3):
        name = _FMT_NAMES.get(tag, f"format tag 0x{tag:04x}")
        raise ValueError(
            f"decode_wav: {name} is outside the PCM/float scope — "
            "inject a real decoder (soundfile) through the decoder= seam"
        )
    if nch < 1:
        raise ValueError("decode_wav: zero channels")
    if rate < 1:
        raise ValueError("decode_wav: zero sample rate")
    if tag == 1:
        if bits == 8:                   # 8-bit PCM is UNSIGNED
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            n = len(data) // 3
            raw = np.frombuffer(data[: n * 3], dtype=np.uint8).reshape(n, 3)
            v = (
                raw[:, 0].astype(np.int64)
                | (raw[:, 1].astype(np.int64) << 8)
                | (raw[:, 2].astype(np.int64) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / float(
                1 << 31
            )
        else:
            raise ValueError(
                f"decode_wav: {bits}-bit integer PCM unsupported "
                "(8/16/24/32)"
            )
    else:                               # IEEE float
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(
                f"decode_wav: {bits}-bit float PCM unsupported (32/64)"
            )
    if nch > 1:
        n = len(x) // nch
        x = x[: n * nch].reshape(n, nch).mean(axis=1)
    if x.size == 0:
        raise ValueError("decode_wav: empty data chunk")
    return int(rate), x


def encode_wav(samples, sample_rate: int, bits: int = 16) -> bytes:
    """1-D float array in [-1, 1] -> mono WAV bytes (integer PCM,
    ``bits`` in {8, 16, 32}).  The fixture side of the codec: lets
    tests plant REAL encoded audio (and its requantized re-encodes)
    without soundfile.  Values are clipped to [-1, 1]."""
    import numpy as np

    if sample_rate < 1:
        raise ValueError("encode_wav: sample_rate must be >= 1")
    x = np.clip(np.asarray(samples, dtype=np.float64).ravel(), -1.0, 1.0)
    if x.size == 0:
        raise ValueError("encode_wav: empty signal")
    if bits == 8:
        pcm = np.round(x * 127.0 + 128.0).astype(np.uint8).tobytes()
    elif bits == 16:
        pcm = np.round(x * 32767.0).astype("<i2").tobytes()
    elif bits == 32:
        pcm = np.round(x * float((1 << 31) - 1)).astype("<i4").tobytes()
    else:
        raise ValueError("encode_wav: bits must be 8, 16 or 32")
    nch, align = 1, bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, nch, sample_rate, sample_rate * align, align, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    if len(pcm) & 1:
        body += b"\x00"                 # word alignment pad
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_spectrogram(payload: bytes, frames: int = 32, bands: int = 32):
    """The ``phash_media(decoder="wav")`` built-in: WAV bytes -> a
    (bands x frames) log-energy grid — a 2-D array shaped exactly
    like a decoded image, so the DCT-sign pHash and the SimHash
    block-permutation pair generator apply unchanged to AUDIO
    near-dup detection.

    Construction (deterministic, partitioning-independent): split the
    mono signal into ``frames`` equal chunks, rFFT magnitude per
    chunk, pool the magnitudes into ``bands`` log-spaced frequency
    bins, log the band energies.  Requantization noise vanishes into
    the log; a pure gain change shifts every cell by a constant,
    which pHash (median-thresholded AC coefficients, DC dropped)
    ignores by construction."""
    import numpy as np

    rate, x = decode_wav(payload)
    n = max(x.size, frames)            # degenerate clips pad to 1/frame
    if x.size < n:
        x = np.pad(x, (0, n - x.size))
    step = n // frames
    x = x[: step * frames].reshape(frames, step)
    mag = np.abs(np.fft.rfft(x, axis=1))        # (frames, step//2+1)
    nf = mag.shape[1]
    # log-spaced band edges over the positive-frequency bins (skip the
    # DC bin; geomspace keeps low-frequency resolution where audio
    # similarity lives)
    edges = np.unique(
        np.geomspace(1, nf, bands + 1).astype(np.int64)
    )
    grid = np.zeros((bands, frames), dtype=np.float64)
    for b in range(min(bands, len(edges) - 1)):
        lo, hi = edges[b], edges[b + 1]
        if hi > lo:
            grid[b, :] = (mag[:, lo:hi] ** 2).sum(axis=1)
    return np.log10(grid + 1e-12)


def wav_features(payload: bytes) -> list:
    """The ``decode_media(decoder="wav")`` built-in: decode and emit
    ``[sample_rate, n_samples, rms, zero_crossing_rate]``, all
    float64 — a deterministic function of the payload bytes alone
    (the audio analog of ``png_features``/``jpeg_features``)."""
    import numpy as np

    rate, x = decode_wav(payload)
    zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return [
        float(rate),
        float(x.size),
        float(np.sqrt((x**2).mean())),
        zc / max(x.size - 1, 1),
    ]
