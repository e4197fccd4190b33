"""Hostile-byte fuzz across the codec ring (r13 verdict item 5): every
pure-Python decoder now feeds on crawl bytes, so random, truncated, and
bit-flipped payloads must fail CLOSED — a ValueError (the ring's single
documented exception) or a clean decode, never a hang, an unbounded
allocation, or a stray exception type that would punch through the
``except ValueError`` quarantine seams.  Fixed-seed corpus, CI-time
budget; the decompression-bomb caps (max_pixels, the PNG inflate cap,
the WARC record/header caps) are pinned with crafted bombs."""

import gzip
import struct
import zlib

import numpy as np
import pytest

from zeek_duckdb_spark.operators.gif import decode_gif, encode_gif
from zeek_duckdb_spark.operators.jpeg import decode_jpeg, encode_jpeg
from zeek_duckdb_spark.operators.png import decode_png, encode_png
from zeek_duckdb_spark.operators.wav import decode_wav, encode_wav
from zeek_duckdb_spark.operators.webp import decode_webp, encode_webp

_RNG = np.random.RandomState(0xF022)


def _img():
    return _RNG.randint(0, 256, (24, 17)).astype(np.uint8)


def _valid_samples():
    img = _img()
    pcm = (_RNG.randint(-300, 300, 400)).astype(np.int16)
    return {
        "png": encode_png(img),
        "jpeg": encode_jpeg(img),
        "gif": encode_gif(img),
        "webp": encode_webp(img),
        "wav": encode_wav(pcm, sample_rate=8000),
    }


_DECODERS = {
    "png": decode_png,
    "jpeg": decode_jpeg,
    "gif": decode_gif,
    "webp": decode_webp,
    "wav": decode_wav,
}


def _must_fail_closed(fn, payload, ctx):
    """A hostile payload must either decode cleanly or raise ValueError
    — any other exception type is a quarantine-seam escape."""
    try:
        fn(payload)
    except ValueError:
        pass
    except Exception as exc:  # noqa: BLE001 — the assertion itself
        pytest.fail(f"{ctx}: {type(exc).__name__} escaped: {exc}")


def test_codecs_fail_closed_on_hostile_bytes():
    """Random / truncated / bit-flipped payloads through every codec:
    ValueError or clean decode only."""
    samples = _valid_samples()
    for name, dec in _DECODERS.items():
        good = samples[name]
        # pure random bytes (with and without the right magic)
        for i in range(40):
            blob = bytes(_RNG.bytes(_RNG.randint(1, 400)))
            _must_fail_closed(dec, blob, f"{name} random[{i}]")
            _must_fail_closed(
                dec, good[:12] + blob, f"{name} magic+random[{i}]"
            )
        # truncations at every 7th byte
        for cut in range(0, len(good), 7):
            _must_fail_closed(dec, good[:cut], f"{name} trunc[{cut}]")
        # single-bit flips across the payload
        for i in range(0, len(good), 5):
            flipped = bytearray(good)
            flipped[i] ^= 1 << (i % 8)
            _must_fail_closed(dec, bytes(flipped), f"{name} flip[{i}]")
        # degenerate
        _must_fail_closed(dec, b"", f"{name} empty")


def test_warc_parsers_fail_closed_on_hostile_bytes():
    """The WARC framing + HTTP head parsers on the same corpus: the
    record parser raises ValueError only; the HTTP gate quarantines
    (returns) or raises ValueError only."""
    from zeek_duckdb_spark.sources.warc import (
        _http_gate,
        _records_from_chunks,
        encode_warc,
        parse_warc,
    )

    good = encode_warc([
        ({"WARC-Type": "response", "WARC-Record-ID": "<urn:f>",
          "WARC-Target-URI": "http://f.org/x",
          "Content-Type": "application/http; msgtype=response"},
         b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
         b"Transfer-Encoding: chunked\r\n\r\n5\r\nhello\r\n0\r\n\r\n"),
    ])
    plain = gzip.decompress(good)

    def drain_parse(blob):
        list(parse_warc(blob))

    def drain_stream(blob):
        list(_records_from_chunks(
            iter([blob[i : i + 13] for i in range(0, len(blob), 13)]), "f"
        ))

    for fn, tag in ((drain_parse, "parse_warc"),
                    (drain_stream, "stream")):
        for src in (good, plain):
            for cut in range(0, len(src), 11):
                _must_fail_closed(fn, src[:cut], f"{tag} trunc[{cut}]")
            for i in range(0, len(src), 9):
                flipped = bytearray(src)
                flipped[i] ^= 1 << (i % 8)
                _must_fail_closed(fn, bytes(flipped), f"{tag} flip[{i}]")
        for i in range(30):
            _must_fail_closed(
                fn, bytes(_RNG.bytes(_RNG.randint(1, 300))),
                f"{tag} random[{i}]",
            )

    # the HTTP gate never raises on a hostile declared-HTTP payload —
    # it quarantines (residual 'http'/'chunked'/encoding name)
    for i in range(40):
        blob = b"HTTP/" + bytes(_RNG.bytes(_RNG.randint(1, 200)))
        out = _http_gate(
            {"content-type": "application/http"}, blob, "f"
        )
        assert len(out) == 4


def test_bomb_guards_cap_allocation():
    """Crafted decompression bombs abort at the cap, not at the claim:
    a PNG whose IHDR claims 30k x 30k, a zlib bomb inside a small-
    dimension PNG, a JPEG SOF claiming 65535^2, a GIF descriptor
    claiming 65535^2, and a lying WARC Content-Length."""
    import time

    def chunk(tag, data):
        body = tag + data
        return (
            struct.pack(">I", len(data)) + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    t0 = time.time()
    # PNG: huge claimed dimensions
    ihdr = struct.pack(">IIBBBBB", 30_000, 30_000, 8, 0, 0, 0, 0)
    bomb = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\0" * 100))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="pixel bomb guard"):
        decode_png(bomb)
    # PNG: honest dimensions, zlib stream inflating way past them
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bomb = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\0" * (64 << 20), 9))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="inflated size exceeds"):
        decode_png(bomb)
    # JPEG: SOF0 claiming 65535x65535
    img = _img()
    good = bytearray(encode_jpeg(img))
    sof = good.find(b"\xff\xc0")
    assert sof > 0
    good[sof + 5 : sof + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="pixel bomb guard"):
        decode_jpeg(bytes(good))
    # GIF: descriptor claiming 65535x65535.  The descriptor sits at a
    # FIXED offset in encode_gif output (6-byte header + 7-byte screen
    # descriptor + 768-byte global color table) — find() would hit the
    # 0x2C byte inside the gray identity palette first.
    g = bytearray(encode_gif(_img()))
    g[6:10] = struct.pack("<HH", 65535, 65535)
    dsc = 6 + 7 + 768
    assert g[dsc] == 0x2C
    g[dsc + 5 : dsc + 9] = struct.pack("<HH", 65535, 65535)
    with pytest.raises(ValueError, match="pixel bomb guard"):
        decode_gif(bytes(g))
    # PNG: a deflate stream that inflates to EXACTLY the expected size
    # but ends before its final block / adler32 trailer must still
    # raise (r14 review: the capped inflate silently accepted it)
    img = _img()
    good = bytearray(encode_png(img))
    # rebuild with a truncated-but-size-exact zlib stream
    raw = zlib.decompress(
        good[good.find(b"IDAT") + 4 : good.rfind(b"IEND") - 8]
    )
    z = zlib.compress(raw, 9)[:-4]  # drop the adler32 trailer only
    ihdr = struct.pack(">IIBBBBB", img.shape[1], img.shape[0], 8, 0, 0, 0, 0)
    trunc_png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                 + chunk(b"IDAT", z) + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="corrupt IDAT|inflated size"):
        decode_png(trunc_png)
    # WARC: lying Content-Length must abort, not buffer toward 2 TB
    from zeek_duckdb_spark.sources.warc import _records_from_chunks

    lying = (b"WARC/1.0\r\nWARC-Type: resource\r\n"
             b"Content-Length: 2199023255552\r\n\r\n")
    with pytest.raises(ValueError, match="record cap"):
        list(_records_from_chunks(iter([lying]), "f"))
    # the whole bomb block must be CHEAP — caps fire before work
    assert time.time() - t0 < 30


def test_chunk_boundary_invariance_property():
    """Property (hypothesis): the incremental WARC parser yields
    byte-identical records under ANY chunking of the same stream —
    the one invariant every boundary bug breaks."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zeek_duckdb_spark.sources.warc import (
        _records_from_chunks, encode_warc, parse_warc)

    def resp(uri, body):
        http = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"Content-Length: {len(body)}\r\n\r\n").encode() + body
        return ({"WARC-Type": "response", "WARC-Record-ID": f"<urn:{uri}>",
                 "WARC-Target-URI": uri,
                 "Content-Type": "application/http; msgtype=response"},
                http)

    recs = [
        resp("http://h.org/a", b"alpha body " * 9),
        ({"WARC-Type": "metadata", "WARC-Target-URI": "http://h.org/a"},
         b"via: x\r\n"),
        resp("http://h.org/b", b""),
    ]
    plain = encode_warc(recs, compress=False) + b"\r\n\r\n"
    want = list(parse_warc(plain))

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.integers(1, len(plain)), min_size=0, max_size=12))
    def check(cuts):
        points = sorted({0, *cuts, len(plain)})
        chunks = [plain[a:b] for a, b in zip(points, points[1:])]
        assert list(_records_from_chunks(iter(chunks), "t")) == want

    check()


def test_robots_and_sitemap_parsers_fail_closed():
    """The politeness parsers feed on fetched crawl bytes too: random
    and mangled text through parse_robots/robots_allowed and
    extract_sitemap_urls must return or raise ValueError — never hang
    or leak another exception type."""
    from zeek_duckdb_spark.operators.robots import (
        extract_sitemap_urls, parse_robots, robots_allowed)

    for i in range(60):
        blob = bytes(_RNG.bytes(_RNG.randint(1, 500)))
        txt = blob.decode("latin-1")
        rules = parse_robots(txt)  # must never raise on text
        assert isinstance(robots_allowed("/any/path", rules), bool)
        try:
            extract_sitemap_urls(txt)
        except ValueError:
            pass
    # pathological patterns through the matcher
    for pattern in ("*" * 200, "$" * 50, "%", "%2", "%zz*$",
                    "/" + "a*" * 100 + "$"):
        assert isinstance(
            robots_allowed("/a" * 50, [(False, pattern)]), bool
        )


def test_decode_media_quarantine_on_error_null(spark):
    """The Spark-side quarantine: a mixed media column with hostile
    payloads — on_error='null' lands NULL features for undecodable
    rows and real features for good ones; phash_media's
    on_error='skip' drops them; default still raises."""
    from zeek_duckdb_spark.operators import multimodal as mm

    img = _img()
    rows = [
        (1, bytearray(encode_png(img))),
        (2, bytearray(b"\x89PNG\r\n\x1a\n" + b"garbage" * 10)),
        (3, bytearray(_RNG.bytes(200))),          # no known magic
        (4, None),
        (5, bytearray(encode_webp(img))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r.doc_id: r.feature for r in mm.decode_media(
        df, decoder="image", on_error="null").collect()}
    assert got[1] is not None and got[5] is not None
    assert got[1][:2] == [17.0, 24.0]
    assert got[2] is None and got[3] is None and got[4] is None

    hashed = mm.phash_media(df, decoder="image", on_error="skip").collect()
    assert sorted(r.doc_id for r in hashed) == [1, 5]

    # default raises (the strict-batch contract is unchanged)
    with pytest.raises(Exception, match="image dispatch|decode_png"):
        mm.decode_media(df, decoder="image").collect()
    with pytest.raises(ValueError, match="on_error"):
        mm.decode_media(df, decoder="image", on_error="bogus")
    with pytest.raises(ValueError, match="on_error"):
        mm.phash_media(df, decoder="image", on_error="null")
