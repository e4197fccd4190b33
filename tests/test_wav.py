"""Pure-Python WAV codec (operators/wav.py) + the real-decode AUDIO
near-dup path: the clip's log-band spectrogram rides the SAME
DCT-sign pHash / block-permutation pair machinery as images, so
requantized and gain-changed re-encodes collapse via phash_pairs on
REAL RIFF PCM bytes.

Validation: self round-trips at every bit depth, and the decisive
external pin — CPython's audiodata fixtures carry the SAME clip
independently encoded at PCM 8/16/24/32-bit; all four must decode to
matching waveforms and near-identical pHashes."""

import os
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zeek_duckdb_spark.operators.wav import (
    decode_wav,
    encode_wav,
    wav_features,
    wav_spectrogram,
)


def _tone(seed, n=8000, rate=8000):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / rate
    f1, f2 = 200 + (seed * 97) % 1800, 400 + (seed * 211) % 2600
    return (
        0.5 * np.sin(2 * np.pi * f1 * t)
        + 0.2 * np.sin(2 * np.pi * f2 * t)
        + 0.02 * rng.normal(0, 1, n)
    )


def test_roundtrip_all_bit_depths():
    sig = _tone(1)
    # 8-bit tolerance: the encode scale (127, unsigned midpoint 128)
    # and decode scale (128) are the format's own asymmetry — worst
    # case |x|/128 + half-step
    for bits, tol in ((8, 1 / 80.0), (16, 1 / 16000.0), (32, 1e-9)):
        rate, x = decode_wav(encode_wav(sig, 8000, bits))
        assert rate == 8000 and x.size == sig.size
        assert float(np.abs(x - np.clip(sig, -1, 1)).max()) <= tol


def test_stereo_averages_and_float_formats():
    sig = _tone(2, 4000)
    # hand-build a stereo 16-bit file: L = sig, R = -sig -> mono 0
    l = np.round(np.clip(sig, -1, 1) * 32767).astype("<i2")
    pcm = np.empty(2 * l.size, dtype="<i2")
    pcm[0::2], pcm[1::2] = l, -l
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 4, 4, 16)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", pcm.nbytes) + pcm.tobytes()
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, x = decode_wav(wav)
    assert rate == 8000 and x.size == l.size
    assert float(np.abs(x).max()) <= 1 / 32767.0  # L+R cancels

    # IEEE float32 variant (format tag 3)
    f32 = np.clip(sig, -1, 1).astype("<f4")
    fmt3 = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    body3 = (
        b"WAVEfmt " + struct.pack("<I", len(fmt3)) + fmt3
        + b"data" + struct.pack("<I", f32.nbytes) + f32.tobytes()
    )
    rate3, x3 = decode_wav(b"RIFF" + struct.pack("<I", len(body3)) + body3)
    assert float(np.abs(x3 - np.clip(sig, -1, 1)).max()) < 1e-6


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 5000),
    seed=st.integers(0, 10_000),
    bits=st.sampled_from([8, 16, 32]),
)
def test_property_roundtrip_shape_and_range(n, seed, bits):
    rng = np.random.RandomState(seed)
    sig = np.clip(rng.normal(0, 0.5, n), -1, 1)
    rate, x = decode_wav(encode_wav(sig, 44100, bits))
    assert rate == 44100 and x.size == n
    assert float(np.abs(x).max()) <= 1.0 + 1e-9
    # spectrogram always renders a fixed 32x32 grid, even for 1-sample
    # clips (padding), so pHash is defined on every decodable payload
    assert wav_spectrogram(encode_wav(sig, 44100, bits)).shape == (32, 32)


# ----------------------------------------------------------------------
# external fixtures: the same clip, four independent encodings
# ----------------------------------------------------------------------

def _fixtures():
    """CPython's own stdlib test data (the `test` package ships with
    the interpreter) — located portably, skip-if-absent."""
    try:
        import test as _t

        d = os.path.join(os.path.dirname(_t.__file__), "audiodata")
    except ImportError:
        return {}
    out = {}
    for bits in (8, 16, 24, 32):
        p = os.path.join(d, f"pluck-pcm{bits}.wav")
        if os.path.exists(p):
            out[bits] = p
    return out


def test_external_fixtures_cross_bit_depth_agreement():
    """CPython ships the same 'pluck' clip at PCM 8/16/24/32-bit —
    independent encoder, independent source.  All must decode to the
    same waveform (within quantization) and near-identical pHashes:
    the audio analog of the JPEG/PNG cross-codec pin."""
    from zeek_duckdb_spark.operators.multimodal import phash_value

    fx = _fixtures()
    if len(fx) < 2:
        pytest.skip("external audio fixtures not on this system")
    decoded = {b: decode_wav(open(p, "rb").read()) for b, p in fx.items()}
    rates = {r for r, _ in decoded.values()}
    sizes = {x.size for _, x in decoded.values()}
    assert len(rates) == 1 and len(sizes) == 1
    ref_bits = max(decoded)
    ref = decoded[ref_bits][1]
    for b, (_, x) in decoded.items():
        # independent encoders round with their own scale conventions
        # (32767 vs 32768 etc.) — a few LSBs at each depth
        tol = 1 / 80.0 if b == 8 else 1 / 8000.0
        assert float(np.abs(x - ref).max()) <= tol, b
    hashes = {
        b: phash_value(wav_spectrogram(open(p, "rb").read()))
        for b, p in fx.items()
    }
    for b, h in hashes.items():
        assert bin(h ^ hashes[ref_bits]).count("1") <= 3, b


# ----------------------------------------------------------------------
# error surfaces
# ----------------------------------------------------------------------


def test_error_surfaces():
    ok = encode_wav(_tone(3), 8000)
    with pytest.raises(ValueError, match="payload is None"):
        decode_wav(None)
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"\xff\xd8 jpeg bytes")
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(ok[: len(ok) // 2])
    # compressed codecs rejected BY NAME
    fmt = struct.pack("<HHIIHH", 0x0055, 1, 8000, 8000, 1, 16)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    )
    with pytest.raises(ValueError, match="MP3"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    fmt = struct.pack("<HHIIHH", 0x0002, 1, 8000, 8000, 1, 4)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    )
    with pytest.raises(ValueError, match="ADPCM"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(ValueError, match="missing data"):
        decode_wav(ok[: ok.find(b"data")])
    with pytest.raises(ValueError, match="bits must be"):
        encode_wav(_tone(3), 8000, bits=24)
    with pytest.raises(ValueError, match="empty signal"):
        encode_wav([], 8000)


def test_features_deterministic():
    sig = _tone(4)
    f = wav_features(encode_wav(sig, 8000, 16))
    assert f[0] == 8000.0 and f[1] == 8000.0
    assert f[2] == pytest.approx(float(np.sqrt((sig**2).mean())), abs=1e-3)
    assert 0.0 < f[3] < 1.0
    assert f == wav_features(encode_wav(sig, 8000, 16))


# ----------------------------------------------------------------------
# the multimodal path on real WAV bytes
# ----------------------------------------------------------------------


def test_phash_real_wav_planted_near_dups_collapse(spark):
    """Audio near-dup through the image machinery: 8-bit requantized
    and half-gain re-encodes of a clip collapse via phash_pairs on
    real RIFF bytes, distinct clips stay apart, and decode_media's
    'wav' built-in emits the audio feature row."""
    from zeek_duckdb_spark.operators import multimodal as mm

    base = _tone(42)
    rows = [
        (0, bytearray(encode_wav(base, 8000, 16))),
        (1, bytearray(encode_wav(base, 8000, 8))),        # requantize
        (2, bytearray(encode_wav(base * 0.5, 8000, 16))),  # gain change
        (3, bytearray(encode_wav(_tone(77), 8000, 16))),
        (4, bytearray(encode_wav(_tone(101), 8000, 16))),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary").repartition(3)

    hashed = mm.phash_media(df, decoder="wav")
    hs = {r.doc_id: r.phash for r in hashed.collect()}
    assert set(hs) == {0, 1, 2, 3, 4}

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in mm.phash_pairs(hashed, max_hamming=6).collect()
    }
    assert {(0, 1), (0, 2), (1, 2)} <= set(pairs), sorted(pairs)
    for a, b in pairs:
        assert a in (0, 1, 2) and b in (0, 1, 2), (a, b)

    feats = {
        r.doc_id: r.feature
        for r in mm.decode_media(
            df.filter("media IS NOT NULL"), decoder="wav"
        ).collect()
    }
    assert feats[0][0] == 8000.0 and feats[0][1] == 8000.0
    # half gain -> half rms, same clip length
    assert feats[2][2] == pytest.approx(feats[0][2] / 2, rel=0.02)

    with pytest.raises(ValueError, match="unknown built-in"):
        mm.phash_media(df, decoder="flac")
