"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

PNG, baseline JPEG, GIF and WAV audio decode for REAL via the built-in
pure-Python codecs (:mod:`operators.png` — zlib + Paeth unfiltering;
:mod:`operators.jpeg` — Huffman + IDCT, the crawl-dominant image
format; :mod:`operators.gif` — LZW + palette; :mod:`operators.wav` —
RIFF PCM + log-band spectrogram):
``decode_media(decoder="png"|"jpeg"|"gif"|"image"|"wav")`` /
``phash_media(decoder=...)`` run the feature and near-dup paths on
real encoded media bytes end-to-end (``"image"`` sniffs the magic
bytes per payload and dispatches PNG/JPEG/GIF — the mixed-corpus
default; ``"wav"`` hashes the clip's spectrogram through the SAME
DCT-sign pHash, so audio re-encodes collapse via the same
phash_pairs).
Other formats are STUBBED (this container ships no image/audio
libraries): they raise NotImplementedError unless a deterministic fake
decoder is requested OR a user decoder callback is injected.
Everything Spark-side — schema, Arrow batch shape, ``mapInPandas``
plumbing, partition sizing — is real and tested either way.

Injecting a real decoder WITHOUT editing this module: each decode-ish
operator takes a plain-Python callback —

- ``decode_media(df, decoder=fn)`` with ``fn(payload: bytes) ->
  list[float]`` (e.g. a PIL thumbnail histogram, a librosa MFCC mean);
- ``resize_media(df, w, h, resizer=fn)`` with
  ``fn(payload: bytes, width: int, height: int) -> bytes``;
- ``sample_frames(df, sampler=fn)`` with ``fn(payload: bytes) ->
  iterable[(frame_idx: int, frame: bytes)]`` — or ``sampler="avi"``
  for the built-in MJPEG-AVI container parser (:mod:`operators.avi`),
  which emits REAL encoded JPEG frames with no external library, or
  ``sampler="gif"`` for animated GIFs (each image block re-wrapped as
  a standalone single-frame GIF).

The callback is cloudpickled into the ``mapInPandas`` closure like any
Spark UDF body, so it must be importable/self-contained on executors
(import PIL *inside* the function for lazy per-worker import).  It is
called once per payload inside an Arrow batch loop — the per-payload
decode is inherently Python work; everything around it stays batched.

Scale notes: media bytes ride in the row as BinaryType; the decode map
is ``mapInPandas`` (Arrow batches, no per-row Python overhead beyond
the batch loop).  Keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
modest when media cells are MBs so a batch fits executor memory.
"""

from __future__ import annotations

import random

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_media",
    "decode_media",
    "resize_media",
    "sample_frames",
    "media_stats",
    "cdc_chunks",
    "chunk_dedup_groups",
    "phash_media",
    "phash_pairs",
    "phash_pairs_incremental",
    "phash_value",
    "write_phash_index",
    "load_phash_index",
    "compact_phash_index",
]

# typed metadata struct carried alongside the opaque payload
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def _sniffing(png_fn, jpeg_fn, gif_fn, webp_fn=None):
    """Per-payload magic-byte dispatch for ``decoder="image"`` /
    ``resizer="image"``: PNG signature -> the PNG codec, JPEG SOI ->
    the JPEG codec, GIF87a/GIF89a -> the GIF codec, RIFF....WEBP ->
    the lossless-WebP codec (r13), anything else errors loudly (a
    silent passthrough would corrupt downstream features).  Returns a
    closure with the same signature as the codec callables."""

    def dispatch(payload, *args):
        b = bytes(payload)
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            return png_fn(b, *args)
        if b[:2] == b"\xff\xd8":
            return jpeg_fn(b, *args)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            return gif_fn(b, *args)
        if webp_fn is not None and b[:4] == b"RIFF" and b[8:12] == b"WEBP":
            return webp_fn(b, *args)
        raise ValueError(
            "image dispatch: payload matches none of the PNG/JPEG/GIF/"
            "WebP signatures — inject a decoder for other formats"
        )

    return dispatch


def _pd_dtype_for(field) -> str:
    """pandas dtype for a Spark schema field's values inside a
    mapInPandas batch builder — one rule for every id-carrying operator
    here (sample_frames, cdc_chunks): exact integral/float dtypes where
    they exist, object for everything else (string, decimal, ...)."""
    return {
        "bigint": "int64",
        "int": "int32",
        "smallint": "int16",
        "tinyint": "int8",
        "double": "float64",
        "float": "float32",
    }.get(field.dataType.simpleString(), "object")


def attach_media(df: DataFrame, payload_col: str, fmt: str = "utf8") -> DataFrame:
    """Wrap a column's bytes as an opaque media column + typed metadata
    (JVM-side; for real pipelines the payload comes from
    ``spark.read.format('binaryFile')``)."""
    payload = (
        F.encode(F.col(payload_col), "utf-8")
        if fmt == "utf8"
        else F.col(payload_col).cast("binary")
    )
    return df.withColumn("media", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(fmt).alias("format"),
            F.octet_length(F.col("media")).cast("long").alias("n_bytes"),
            F.md5(F.col("media")).alias("checksum"),
        ),
    )


_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


# the Pillow adapter's decompression-bomb default: looser than the
# pure-Python ring's 4 MP (those codecs are also SLOW past it; Pillow
# is not — a 12-48 MP phone photo must decode under decoder='pil'),
# tighter than Pillow's own ~178 MP warn limit, which additionally
# raises its own exception type and would punch through the
# ValueError-only quarantine contract (r14 review, second pass)
_PIL_MAX_PIXELS_DEFAULT = 1 << 26  # 67 MP


def pil_gray(payload: bytes, max_pixels: int = _PIL_MAX_PIXELS_DEFAULT):
    """``phash_media(decoder="pil")`` adapter, behind an import guard:
    decode with Pillow — covering what the pure-Python ring doesn't
    (lossy VP8 WebP, progressive JPEG, TIFF, BMP...) — to the same
    2-D float64 grayscale contract as ``decode_png``/``decode_jpeg``:
    the raw channel for grayscale modes, BT.601 luma for color, alpha
    ignored.  Pillow is NOT bundled in this container; the ImportError
    names it (the honest `skipped: package absent` seam — when Pillow
    IS present, parity with the built-in codecs on overlapping formats
    is pinned by tests/test_multimodal.py).  Ring contract kept (r14
    review): every decode failure — UnidentifiedImageError, truncated-
    file OSError, Pillow's own bomb error — re-raises as ValueError,
    so the ``on_error`` quarantine seams work, and the ring's
    ``max_pixels`` cap applies before pixel data loads."""
    import io

    import numpy as np

    try:
        from PIL import Image
    except ImportError:
        raise ImportError(
            "decoder='pil' needs Pillow (pip install Pillow); the "
            "built-in pure-Python codecs cover png/jpeg(baseline)/"
            "gif/webp(lossless)/wav without it"
        ) from None
    try:
        img = Image.open(io.BytesIO(bytes(payload)))
        w, h = img.size
        if w * h > max_pixels:
            raise ValueError(
                f"pil_gray: {w}x{h} exceeds the {max_pixels}-pixel "
                "bomb guard (pass decoder=functools.partial(pil_gray, "
                "max_pixels=...) — the string form 'pil' binds the "
                "default)"
            )
        img.load()
        if img.mode in ("L", "I", "F"):
            return np.asarray(img, dtype=np.float64)
        if img.mode == "LA":
            return np.asarray(img, dtype=np.float64)[:, :, 0]
        rgb = np.asarray(img.convert("RGB"), dtype=np.float64)
        return rgb @ np.array([0.299, 0.587, 0.114])
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"pil_gray: Pillow decode failed ({exc})") from None


def pil_features(payload: bytes) -> list:
    """``decode_media(decoder="pil")`` adapter: Pillow decode ->
    ``[width, height, mean_gray, std_gray]``, the exact feature
    contract of the built-in codecs (``png_features`` etc.), so
    features cross-match where formats overlap.  Import-guarded like
    :func:`pil_gray`."""
    g = pil_gray(payload)
    return [
        float(g.shape[1]),
        float(g.shape[0]),
        float(g.mean()),
        float(g.std()),
    ]


def _libwebp_lib():
    """Memoized ctypes handle on the SYSTEM libwebp shared library —
    the zero-package seam for LOSSY WebP (VP8/VP8X+ALPH), the one
    crawl-dominant image shape the pure-Python ring leaves stubbed.
    ImportError when the library is absent (the honest
    `skipped: library absent` seam, same contract as Pillow's)."""
    global _LIBWEBP
    if _LIBWEBP is not None:
        return _LIBWEBP
    import ctypes
    import ctypes.util

    lib = None
    for name in (ctypes.util.find_library("webp"), "libwebp.so.7"):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is None:
        raise ImportError(
            "decoder='libwebp' needs the libwebp shared library "
            "(apt install libwebp7 / brew install webp); the built-in "
            "pure-Python codec covers lossless VP8L without it"
        )
    lib.WebPGetInfo.restype = ctypes.c_int
    lib.WebPGetInfo.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    _LIBWEBP = lib
    return lib


_LIBWEBP = None

# libwebp bomb guard: same rationale and default as the Pillow
# adapter's — the native decoder is fast, so the cap is about memory,
# not CPU
_LIBWEBP_MAX_PIXELS_DEFAULT = _PIL_MAX_PIXELS_DEFAULT


def libwebp_gray(
    payload: bytes, max_pixels: int = _LIBWEBP_MAX_PIXELS_DEFAULT
):
    """``phash_media(decoder="libwebp")`` adapter: decode ANY WebP —
    lossy VP8, VP8X+ALPH, and lossless VP8L alike — through the system
    libwebp via ctypes, to the ring's 2-D float64 grayscale contract
    (exact channel when R==G==B, BT.601 luma otherwise — the same fold
    as :func:`operators.webp.decode_webp`, so the two decoders agree
    bit-for-bit on lossless streams, pinned by tests).  The bomb guard
    reads dimensions via ``WebPGetInfo`` BEFORE any pixel decodes;
    every decode failure raises ValueError so the ``on_error``
    quarantine seams apply."""
    import ctypes

    import numpy as np

    lib = _libwebp_lib()
    data = bytes(payload)
    w, h = ctypes.c_int(), ctypes.c_int()
    if not lib.WebPGetInfo(data, len(data), ctypes.byref(w), ctypes.byref(h)):
        raise ValueError("libwebp_gray: not a decodable WebP header")
    if w.value * h.value > max_pixels:
        raise ValueError(
            f"libwebp_gray: {w.value}x{h.value} exceeds the "
            f"{max_pixels}-pixel bomb guard (pass decoder="
            "functools.partial(libwebp_gray, max_pixels=...) — the "
            "string form 'libwebp' binds the default)"
        )
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        raise ValueError("libwebp_gray: libwebp decode failed")
    try:
        n = w.value * h.value * 4
        rgba = np.ctypeslib.as_array(p, shape=(n,)).reshape(
            h.value, w.value, 4
        ).copy()
    finally:
        lib.WebPFree(p)
    r = rgba[:, :, 0].astype(np.float64)
    g = rgba[:, :, 1].astype(np.float64)
    b = rgba[:, :, 2].astype(np.float64)
    if (rgba[:, :, 0] == rgba[:, :, 1]).all() and (
        rgba[:, :, 1] == rgba[:, :, 2]
    ).all():
        return g
    return 0.299 * r + 0.587 * g + 0.114 * b


def libwebp_features(payload: bytes) -> list:
    """``decode_media(decoder="libwebp")`` adapter — the built-in
    codecs' ``[width, height, mean_gray, std_gray]`` contract through
    the system libwebp (see :func:`libwebp_gray`)."""
    g = libwebp_gray(payload)
    return [
        float(g.shape[1]),
        float(g.shape[0]),
        float(g.mean()),
        float(g.std()),
    ]


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    fake: bool = False,
    decoder: Callable[[bytes], list] | str | None = None,
    on_error: str = "raise",
) -> DataFrame:
    """Decode/feature-extract media via mapInPandas.

    ``decoder``: user callback ``fn(payload: bytes) -> list[float]``
    (see module docstring) — the injection point for a real
    PIL/librosa feature extractor — or one of the built-in pure-Python
    codecs: ``"png"`` (:mod:`operators.png`), ``"jpeg"``
    (:mod:`operators.jpeg`, baseline sequential — the crawl-dominant
    format), or ``"image"`` (magic-byte sniff per payload, the
    mixed-corpus default).  All emit [width, height, mean_gray,
    std_gray] from REAL encoded bytes, no extra packages.  fake=True
    uses the deterministic byte-statistics stub instead.  Neither ->
    NotImplementedError (clearly-marked stub; the container has no
    PIL/librosa and other formats need one).

    ``on_error`` (round-14): ``'raise'`` (default) propagates decode
    errors; ``'null'`` QUARANTINES them — an undecodable payload
    yields a NULL ``feature`` (n_bytes kept) instead of killing the
    job, the crawl-reality policy (one hostile image must not take
    down a 100 TB ingest; every built-in codec raises ValueError only,
    fuzz-pinned, so that is what quarantines — real bugs still
    propagate).
    """
    if fake and decoder is not None:
        raise ValueError("pass either fake=True or decoder=, not both")
    if on_error not in ("raise", "null"):
        raise ValueError("decode_media: on_error must be 'raise' or 'null'")
    if isinstance(decoder, str):
        from zeek_duckdb_spark.operators.gif import gif_features
        from zeek_duckdb_spark.operators.jpeg import jpeg_features
        from zeek_duckdb_spark.operators.png import png_features
        from zeek_duckdb_spark.operators.wav import wav_features
        from zeek_duckdb_spark.operators.webp import webp_features

        if decoder == "png":
            decoder = png_features
        elif decoder == "jpeg":
            decoder = jpeg_features
        elif decoder == "gif":
            decoder = gif_features
        elif decoder == "webp":
            decoder = webp_features
        elif decoder == "image":
            decoder = _sniffing(
                png_features, jpeg_features, gif_features, webp_features
            )
        elif decoder == "wav":
            decoder = wav_features
        elif decoder == "pil":
            decoder = pil_features  # import-guarded at call time
        elif decoder == "libwebp":
            decoder = libwebp_features  # library-guarded at call time
        else:
            raise ValueError(
                f"decode_media: unknown built-in decoder {decoder!r} "
                "('png', 'jpeg', 'gif', 'webp', 'image', 'wav', 'pil' "
                "or 'libwebp'); pass a callable for other formats"
            )
    if not fake and decoder is None:
        raise NotImplementedError(
            "real media decode beyond PNG/JPEG/GIF/WebP(lossless)/WAV "
            "requires an image/audio library not present in this "
            "environment; pass decoder='png'/'jpeg'/'gif'/'webp'/"
            "'image'/'wav' for the built-in codecs, 'libwebp'/'pil' "
            "for the guarded native adapters (lossy formats), "
            "fake=True for the deterministic stub, or inject "
            "decoder=fn(payload)->list[float]"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            media = pdf[media_col]
            n = media.map(lambda b: len(b) if b is not None else 0)
            # deterministic fake "features": byte-statistics of the payload
            def fake_feat(b):
                if not b:
                    return [0.0, 0.0, 0.0, 0.0]
                return [
                    float(len(b)),
                    float(b[0]),
                    float(b[-1]),
                    float(sum(b[:64]) % 997),
                ]

            if decoder is not None:
                if on_error == "null":
                    def feat(b):
                        # NULL payloads never reach the user callback;
                        # ValueError = decode failure -> quarantine
                        if b is None:
                            return None
                        try:
                            return list(decoder(bytes(b)))
                        except ValueError:
                            return None
                else:
                    feat = lambda b: None if b is None else list(decoder(bytes(b)))
            else:
                feat = fake_feat
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n,
                    "feature": media.map(feat),
                }
            )

    # project to the two columns the batch fn reads: an opaque
    # mapInPandas over the full frame would ship (and scan) every
    # other column through Arrow for nothing (guide §4.1; r16)
    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        batches, _DECODED_SCHEMA
    )


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    media_col: str = "media",
    fake: bool = False,
    resizer: Callable[[bytes, int, int], bytes] | str | None = None,
) -> DataFrame:
    """Resize an image payload to width x height via mapInPandas.

    ``resizer``: user callback ``fn(payload, width, height) -> bytes``
    (see module docstring) — the injection point for a real PIL resize;
    its return bytes are passed through verbatim (a real encoder's
    output is NOT width*height bytes — that invariant applies to the
    fake path only).  The strings ``"png"`` / ``"jpeg"`` /
    ``"image"`` select the built-in pure-Python paths
    (:func:`operators.png.png_resize` /
    :func:`operators.jpeg.jpeg_resize`; ``"image"`` sniffs the magic
    bytes and re-encodes in the payload's own format): decode ->
    nearest-neighbour grayscale resample -> re-encode, no extra
    packages; wrong-format payloads error loudly.  fake=False
    without a resizer requires a real image library for other formats
    -> NotImplementedError
    (clearly-marked stub; the container has no PIL).  fake=True emits a
    deterministic width*height-byte payload (the source bytes tiled and
    truncated) so the distributed plumbing — binary-in/binary-out Arrow
    batches, output sizing — is testable end-to-end and restatable as a
    DuckDB oracle (repeat + hex-string slice).

    Output: (id, width int, height int, resized binary).  Pure map;
    output rows == input rows; each output cell is exactly
    width*height bytes (empty payload stays empty).
    """
    if fake and resizer is not None:
        raise ValueError("pass either fake=True or resizer=, not both")
    if isinstance(resizer, str):
        from zeek_duckdb_spark.operators.gif import gif_resize
        from zeek_duckdb_spark.operators.jpeg import jpeg_resize
        from zeek_duckdb_spark.operators.png import png_resize
        from zeek_duckdb_spark.operators.webp import webp_resize

        if resizer == "png":
            resizer = png_resize
        elif resizer == "jpeg":
            resizer = jpeg_resize
        elif resizer == "gif":
            resizer = gif_resize
        elif resizer == "webp":
            resizer = webp_resize
        elif resizer == "image":
            # format-preserving: PNG payloads re-encode as PNG, JPEG
            # as JPEG, GIF as GIF, WebP as lossless WebP
            resizer = _sniffing(
                png_resize, jpeg_resize, gif_resize, webp_resize
            )
        else:
            raise ValueError(
                f"resize_media: unknown built-in resizer {resizer!r} "
                "('png', 'jpeg', 'gif', 'webp' or 'image'); pass a "
                "callable for other formats"
            )
    if not fake and resizer is None:
        raise NotImplementedError(
            "real image resize beyond PNG/JPEG/GIF/WebP(lossless) "
            "requires an image library not present in this environment; "
            "pass resizer='png'/'jpeg'/'gif'/'webp'/'image' for the "
            "built-in codecs, fake=True for the deterministic stub, or "
            "inject resizer=fn(payload, width, height)->bytes"
        )
    wh = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def rz(b):
                if b is None:
                    return None
                b = bytes(b)
                if resizer is not None:
                    return resizer(b, width, height)
                if not b:
                    return b
                reps = -(-wh // len(b))
                return (b * reps)[:wh]

            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "resized": pdf[media_col].map(rz),
                }
            )

    schema = T.StructType(
        [
            T.StructField("id", df.schema[id_col].dataType),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("resized", T.BinaryType()),
        ]
    )
    # column-pruned Python boundary (guide §4.1; r16)
    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        batches, schema
    )


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 256,
    stride: int = 2,
    max_frames: int = 4,
    id_col: str = "doc_id",
    media_col: str = "media",
    fake: bool = False,
    sampler: Callable[[bytes], "Iterator[tuple[int, bytes]]"] | str | None = None,
) -> DataFrame:
    """Sample frames from a video payload via mapInPandas — the
    row-EXPANDING multimodal shape (one input row -> up to
    ``max_frames`` frame rows).

    ``sampler="avi"`` (round 12) samples for REAL: MJPEG-AVI
    containers (:mod:`operators.avi`) yield actual encoded JPEG
    frames, honoring ``stride``/``max_frames``; each emitted frame is
    a standalone baseline JPEG, so the full video near-dup chain runs
    without any external library — sample_frames(sampler='avi') ->
    phash_media(decoder='jpeg') -> phash_pairs.  ``sampler="gif"``
    does the same for animated GIFs (:func:`operators.gif.gif_frames`:
    each image block re-wrapped as a standalone single-frame GIF —
    independent rasters, no inter-frame compositing), feeding
    phash_media(decoder='gif').  Other containers (MP4/H264) still
    need an injected ffmpeg/decord callback.

    fake=True treats the payload as consecutive ``frame_bytes``-byte
    frames and emits every ``stride``-th frame up to ``max_frames`` —
    deterministic byte slices, restatable as a DuckDB oracle (range
    unnest + hex-string slice).  Neither -> NotImplementedError.

    The per-row Python loop here is the decode work itself (frame
    extraction is inherently per-payload); everything around it is
    Arrow-batched.  Null payloads emit no frames; the fake path keeps
    a non-empty payload's final partial frame (ceil division), so
    every byte is reachable.

    ``sampler``: user callback ``fn(payload) -> iterable[(frame_idx,
    frame_bytes)]`` (see module docstring) — the injection point for a
    real ffmpeg/decord sampler; ``frame_bytes`` applies to the fake
    path only, ``stride``/``max_frames`` to the fake and ``"avi"``
    paths (a user callback owns its own stride policy).

    Output: (id, frame_idx int, frame binary).
    """
    if fake and sampler is not None:
        raise ValueError("pass either fake=True or sampler=, not both")
    # validate driver-side: stride=0 would otherwise surface as an
    # opaque ZeroDivisionError inside executor tasks
    if stride < 1:
        raise ValueError("sample_frames: stride must be >= 1")
    if max_frames < 1:
        raise ValueError("sample_frames: max_frames must be >= 1")
    if frame_bytes < 1:
        raise ValueError("sample_frames: frame_bytes must be >= 1")
    if isinstance(sampler, str):
        if sampler == "avi":
            from zeek_duckdb_spark.operators.avi import avi_mjpeg_frames as _frames
        elif sampler == "gif":
            # animated GIF: each image block re-wrapped as a standalone
            # single-frame GIF (operators/gif.gif_frames — independent
            # rasters, no inter-frame compositing; see its docstring),
            # so every emitted frame flows through the same chain as
            # AVI frames: phash_media(decoder='gif') -> phash_pairs
            from zeek_duckdb_spark.operators.gif import gif_frames as _frames
        else:
            raise ValueError(
                f"sample_frames: unknown built-in sampler {sampler!r} "
                "('avi' or 'gif'); pass a callable for other containers"
            )

        def sampler(b, _frames=_frames, _stride=stride, _cap=max_frames):
            emitted = 0
            for f_idx, frame in _frames(b):
                if f_idx % _stride:
                    continue
                if emitted >= _cap:
                    break
                emitted += 1
                yield f_idx, frame
    if not fake and sampler is None:
        raise NotImplementedError(
            "real frame sampling beyond MJPEG-AVI and animated GIF "
            "requires a video library not present in this environment; "
            "pass sampler='avi'/'gif' for the built-in container "
            "parsers, fake=True for the deterministic stub, or inject "
            "sampler=fn(payload)->iterable[(frame_idx, frame)]"
        )

    def fake_sample(b: bytes):
        n_frames = -(-len(b) // frame_bytes)
        for j, f_idx in enumerate(range(0, n_frames, stride)):
            if j >= max_frames:
                break
            yield f_idx, b[f_idx * frame_bytes:(f_idx + 1) * frame_bytes]

    sample = sampler if sampler is not None else fake_sample

    # id name/dtype follow the input column (string ids must survive —
    # same contract as cdc_chunks)
    id_field = df.schema[id_col]
    id_dtype = _pd_dtype_for(id_field)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list = []
            idxs: list = []
            frames: list = []
            for i, b in zip(pdf[id_col], pdf[media_col]):
                if b is None:
                    continue
                for f_idx, frame in sample(bytes(b)):
                    ids.append(i)
                    idxs.append(int(f_idx))
                    frames.append(frame)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=id_dtype),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    # column-pruned Python boundary (guide §4.1; r16)
    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        batches, schema
    )


def media_stats(df: DataFrame, group_col: str) -> DataFrame:
    """Per-group media payload stats over the typed metadata — a pure
    relational query on the struct column (no decode needed)."""
    return (
        df.groupBy(group_col)
        .agg(
            F.count("*").alias("n_media"),
            F.sum(F.col("media_meta.n_bytes")).alias("total_bytes"),
            F.round(F.avg(F.col("media_meta.n_bytes")), 4).alias("avg_bytes"),
            # distinct on the payload itself (duckdb 1.0 lacks md5(BLOB),
            # so the oracle counts DISTINCT encode(text) — same cardinality)
            F.count_distinct(F.col("media")).alias("distinct_payloads"),
        )
    )


def _gear_table(seed: int):
    """Deterministic 256-entry uint64 gear table (seeded, no RNG state
    shipped to executors — rebuilt identically in every task)."""
    import numpy as np

    rnd = random.Random(seed)
    return np.array(
        [rnd.getrandbits(64) for _ in range(256)], dtype=np.uint64
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
    window: int = 32,
    seed: int = 9,
) -> DataFrame:
    """Content-defined chunking of binary payloads (Gear/FastCDC-style
    rolling hash): split each blob at content-determined boundaries so
    identical SUBSEQUENCES across blobs produce identical chunks even
    when preceded by different bytes — the shift-resistant storage-dedup
    primitive fixed-size blocks lack.  Output: one row per chunk —
    (id, chunk_idx, offset, length, chunk_hash md5-hex).

    Boundary rule: cut after byte i when ``H(i) % avg_size == avg_size-1``
    (``avg_size`` must be a power of two), where H is the windowed gear
    hash ``sum_{j<window} gear[b[i-j]] << j``; ``min_size``/``max_size``
    bound chunk lengths (a cut candidate inside min_size is skipped, a
    run past max_size force-cuts).

    Execution shape: mapInPandas (binary payloads are opaque to JVM
    expressions — Python is unavoidable, so it is Arrow-batched and
    numpy-vectorized: the windowed hash is ``window`` shifted uint64
    adds over the whole byte array, then candidate boundaries come from
    one vectorized mask; only the min/max enforcement walks the (few)
    candidates).  Chunking is per-row — embarrassingly parallel, no
    shuffle; cross-blob dedup is then one hash-aggregate over the
    8-to-32-byte chunk_hash column (:func:`chunk_dedup_groups`).
    """
    if avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two")
    if not (0 < min_size <= avg_size <= max_size):
        raise ValueError("need 0 < min_size <= avg_size <= max_size")

    # the output id field keeps the INPUT id column's name and type
    # (string ids are as legitimate as longs for blobs) — same derive-
    # from-schema rule as similarity.topk_neighbors_batch
    id_field = df.schema[id_col]
    id_dtype = _pd_dtype_for(id_field)
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("length", T.LongType()),
            T.StructField("chunk_hash", T.StringType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        gear = _gear_table(seed)
        mask = np.uint64(avg_size - 1)
        target = np.uint64(avg_size - 1)
        for pdf in it:
            ids, idxs, offs, lens, hashes = [], [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[media_col]):
                if blob is None or len(blob) == 0:
                    continue
                b = np.frombuffer(bytes(blob), dtype=np.uint8)
                g = gear[b]
                h = np.zeros(len(b), dtype=np.uint64)
                for j in range(min(window, len(b))):
                    # h[i] += gear[b[i-j]] << j  (uint64 wraparound ok)
                    h[j:] += g[: len(b) - j] << np.uint64(j)
                cand = np.flatnonzero((h & mask) == target) + 1  # cut AFTER i
                bounds, start = [], 0
                ci = 0
                n = len(b)
                while start < n:
                    end = min(start + max_size, n)
                    lo = start + min_size
                    while ci < len(cand) and cand[ci] < lo:
                        ci += 1
                    if ci < len(cand) and cand[ci] <= end:
                        end = int(cand[ci])
                        ci += 1
                    bounds.append((start, end))
                    start = end
                for k, (s, e) in enumerate(bounds):
                    ids.append(rid)
                    idxs.append(k)
                    offs.append(s)
                    lens.append(e - s)
                    hashes.append(hashlib.md5(b[s:e].tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=id_dtype),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "offset": pd.Series(offs, dtype="int64"),
                    "length": pd.Series(lens, dtype="int64"),
                    "chunk_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        batches, out_schema
    )


def chunk_dedup_groups(chunks: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Cross-blob chunk dedup stats over :func:`cdc_chunks` output: one
    row per duplicated chunk_hash with copy count, distinct-blob count,
    and reclaimable bytes ((copies-1) · length).  One hash-aggregate on
    a short key — map-side partials, no collect_list, 100 TB-safe.

    ``id_col`` names the blob-id column (:func:`cdc_chunks` keeps the
    input id column's name) — named, not positional, so a projected or
    reordered chunks frame cannot silently aggregate the wrong column."""
    return (
        chunks.groupBy("chunk_hash", "length")
        .agg(
            F.count("*").alias("n_copies"),
            F.count_distinct(id_col).alias("n_blobs"),
        )
        .filter(F.col("n_copies") > 1)
        .withColumn("bytes_reclaimable", (F.col("n_copies") - 1) * F.col("length"))
    )


def _dct_basis(n: int):
    """Orthonormal DCT-II basis matrix (numpy; no scipy in the env)."""
    import numpy as np

    i = np.arange(n)
    C = np.cos(np.pi * (2 * i[None, :] + 1) * i[:, None] / (2 * n))
    C[0] *= 1.0 / np.sqrt(n)
    C[1:] *= np.sqrt(2.0 / n)
    return C


def phash_value(img, bits: int = 60) -> int:
    """Perceptual hash of one 2-D grayscale array (driver/test-side
    reference implementation; the operator applies the same code per
    Arrow batch): nearest-neighbour resize to 32x32, orthonormal 2-D
    DCT-II, take the lowest-frequency coefficients after DC, threshold
    at their median.  Robust to resizing/re-encoding (which perturb
    high frequencies), unlike byte-level hashing."""
    import numpy as np

    a = np.asarray(img, dtype=np.float64)
    if a.ndim != 2 or a.size == 0:
        raise ValueError("phash: decoder must return a non-empty 2-D array")
    from zeek_duckdb_spark.operators.raster import nn_resample

    small = nn_resample(a, 32, 32)
    C = _dct_basis(32)
    coefs = (C @ small @ C.T)[:8, :8].flatten()[1 : bits + 1]
    med = np.median(coefs)
    h = 0
    for b, v in enumerate(coefs):
        if v > med:
            h |= 1 << b
    return h


def _fake_image(payload: bytes):
    """Deterministic 32x32 pseudo-image from raw bytes (test stand-in
    for a real decoder — tile/truncate to 1024 bytes)."""
    import numpy as np

    raw = (payload or b"\0") * (1024 // max(1, len(payload or b"\0")) + 1)
    return np.frombuffer(raw[:1024], dtype=np.uint8).astype(np.float64).reshape(32, 32)


def phash_media(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    fake: bool = False,
    decoder: Callable[[bytes], object] | str | None = None,
    bits: int = 60,
    on_error: str = "raise",
) -> DataFrame:
    """(id, phash): perceptual hash per media payload — the IMAGE
    near-dup key (byte-identical dedup misses re-encoded/resized
    copies; pHash survives them).  ``decoder`` maps payload bytes to a
    2-D grayscale array (inject PIL: ``lambda b:
    np.asarray(Image.open(io.BytesIO(b)).convert('L'))``) — or the
    strings ``"png"`` / ``"jpeg"`` / ``"gif"`` / ``"image"`` for the
    built-in pure-Python codecs (:mod:`operators.png` /
    :mod:`operators.jpeg` / :mod:`operators.gif`;
    ``"image"`` sniffs magic bytes per payload), which run the
    near-dup path on REAL encoded image bytes — including re-encoded
    JPEG copies, the dominant crawl shape — with no extra packages;
    fake=True uses the
    deterministic byte-tile stand-in.  mapInPandas Arrow batches; pure
    map, zero shuffle.  Pair generation: :func:`phash_pairs` (the
    SimHash block-permutation machinery — a pHash IS a 60-bit
    locality-sensitive hash).  ``on_error='skip'`` drops undecodable
    payloads (ValueError from the decoder) like NULLs instead of
    killing the job — the crawl-bytes policy; default ``'raise'``."""
    if fake and decoder is not None:
        raise ValueError("pass either fake=True or decoder=, not both")
    if isinstance(decoder, str):
        from zeek_duckdb_spark.operators.gif import decode_gif
        from zeek_duckdb_spark.operators.jpeg import decode_jpeg
        from zeek_duckdb_spark.operators.png import decode_png
        from zeek_duckdb_spark.operators.wav import wav_spectrogram
        from zeek_duckdb_spark.operators.webp import decode_webp

        if decoder == "png":
            decoder = decode_png
        elif decoder == "jpeg":
            decoder = decode_jpeg
        elif decoder == "gif":
            decoder = decode_gif
        elif decoder == "webp":
            decoder = decode_webp
        elif decoder == "image":
            decoder = _sniffing(
                decode_png, decode_jpeg, decode_gif, decode_webp
            )
        elif decoder == "wav":
            # AUDIO near-dup through the same machinery: the log-band
            # spectrogram is a 2-D array exactly like a decoded image
            decoder = wav_spectrogram
        elif decoder == "pil":
            decoder = pil_gray  # import-guarded at call time
        elif decoder == "libwebp":
            decoder = libwebp_gray  # library-guarded at call time
        else:
            raise ValueError(
                f"phash_media: unknown built-in decoder {decoder!r} "
                "('png', 'jpeg', 'gif', 'webp', 'image', 'wav', 'pil' "
                "or 'libwebp'); pass a callable for other formats"
            )
    if not fake and decoder is None:
        raise NotImplementedError(
            "real media decode beyond PNG/JPEG/GIF/WebP(lossless)/WAV "
            "requires a native library; pass decoder='png'/'jpeg'/"
            "'gif'/'webp'/'image'/'wav' for the built-in codecs, "
            "'libwebp'/'pil' for the guarded native adapters (lossy "
            "formats), fake=True, or inject "
            "decoder=fn(payload)->2-D array"
        )
    if not 1 <= bits <= 60:
        raise ValueError("phash_media: bits must be in [1, 60]")
    if on_error not in ("raise", "skip"):
        raise ValueError("phash_media: on_error must be 'raise' or 'skip'")
    dec = _fake_image if fake else decoder
    id_field = df.schema[id_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payloads are un-hashable and dropped (the pq arrow
            # kernel's degenerate-row policy)
            sub = pdf[pdf[media_col].notna()]
            if len(sub) == 0:
                continue
            ids, hashes = [], []
            for i, b in zip(sub[id_col].values, sub[media_col]):
                try:
                    h = phash_value(dec(bytes(b)), bits)
                except ValueError:
                    # on_error='skip': an undecodable payload is as
                    # un-hashable as a NULL one — drop it instead of
                    # killing the job (crawl bytes are hostile);
                    # ValueError only, real bugs still propagate
                    if on_error == "raise":
                        raise
                    continue
                ids.append(i)
                hashes.append(h)
            if ids:
                yield pd.DataFrame({id_col: ids, "phash": hashes})

    out = T.StructType([id_field, T.StructField("phash", T.LongType())])
    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        batches, schema=out
    )


def phash_pairs(
    hashed: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
    bits: int = 60,
    max_bucket_size: int | None = 100_000,
    on_oversize: str = "error",
) -> DataFrame:
    """(id_a, id_b, hamming) image near-dup candidates from
    :func:`phash_media` output — delegates to the SimHash
    block-permutation pair generator (dedup.simhash_pairs), which is
    hash-agnostic: any ``bits``-wide LSH where near-dups differ in
    <= max_hamming bits gets the same bucketed, never-all-pairs
    shape."""
    from zeek_duckdb_spark.operators.dedup import simhash_pairs

    return simhash_pairs(
        hashed.select(F.col(id_col), F.col("phash").alias("simhash")),
        id_col=id_col,
        max_hamming=max_hamming,
        blocks=blocks,
        bits=bits,
        max_bucket_size=max_bucket_size,
        on_oversize=on_oversize,
    )


def write_phash_index(
    hashed: DataFrame,
    path: str,
    id_col: str = "doc_id",
    blocks: int = 4,
    bits: int = 60,
    pfx_mod: int = 64,
    mode: str = "append",
) -> None:
    """Land a block-permutation chunk index for :func:`phash_media`
    rows — ``dedup.write_chunk_index`` with the phash->simhash rename,
    so the daily image-dedup probe reads only its touched (blk, pfx)
    directories instead of re-deriving and re-scanning the whole flat
    index (:func:`load_phash_index` + ``index_chunked=``)."""
    from zeek_duckdb_spark.operators.dedup import write_chunk_index

    write_chunk_index(
        hashed.select(F.col(id_col), F.col("phash").alias("simhash")),
        path,
        id_col=id_col,
        blocks=blocks,
        bits=bits,
        pfx_mod=pfx_mod,
        mode=mode,
    )


def compact_phash_index(
    spark, path: str, target_file_bytes: int = 128 << 20
) -> dict:
    """Small-file maintenance for a :func:`write_phash_index` landing —
    the phash-named delegation of ``dedup.compact_chunk_index`` (the
    layout IS a chunk index): folds the one-file-per-append growth
    back to size-targeted files with the (blk, pfx) directories,
    pruning, and future appends preserved."""
    from zeek_duckdb_spark.operators.dedup import compact_chunk_index

    return compact_chunk_index(spark, path, target_file_bytes)


def load_phash_index(
    spark, path: str, touched: list[tuple[int, int]] | None = None
) -> DataFrame:
    """Partition-pruned read of a :func:`write_phash_index` landing
    (``dedup.load_chunk_index`` — rows are (id, simhash, blk, chunk),
    already in the delegated pass's column names)."""
    from zeek_duckdb_spark.operators.dedup import load_chunk_index

    return load_chunk_index(spark, path, touched)


def phash_pairs_incremental(
    new_hashed: DataFrame,
    index_hashed: DataFrame | None,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
    bits: int = 60,
    max_bucket_size: int | None = 100_000,
    on_oversize: str = "error",
    include_new_pairs: bool = True,
    index_chunked: DataFrame | None = None,
) -> DataFrame:
    """Image near-dup candidates for an INCREMENTAL ingest: today's
    batch of :func:`phash_media` rows against a persisted corpus
    index, without re-pairing the index against itself — the
    daily-crawl media-dedup shape (pair with
    ``graph.resolve_clusters`` to drop the losers, as
    ``pipeline.clean_media_corpus`` does for the full pass).
    Delegates to ``dedup.simhash_pairs_incremental`` (touched-bucket
    semi-join; the standing index never shuffles wholesale)."""
    from zeek_duckdb_spark.operators.dedup import simhash_pairs_incremental

    ren = lambda d: d.select(  # noqa: E731
        F.col(id_col), F.col("phash").alias("simhash")
    )
    return simhash_pairs_incremental(
        ren(new_hashed),
        ren(index_hashed) if index_hashed is not None else None,
        id_col=id_col,
        max_hamming=max_hamming,
        blocks=blocks,
        bits=bits,
        max_bucket_size=max_bucket_size,
        on_oversize=on_oversize,
        include_new_pairs=include_new_pairs,
        index_chunked=index_chunked,
    )
