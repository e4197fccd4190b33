"""write_warc (round 15) — the general write half of read_warc: any
reader-schema frame re-lands as member/frame-per-record WARC shards in
all three containers, with faithful head/header reconstruction from
the headers= maps, recomputed stored-convention payload digests, and
the zst output in the IIPC SEEKABLE layout (directly CDX-indexable)."""

import gzip
import os

import pytest

from zeek_duckdb_spark.sources.warc import (
    cdx_records,
    encode_warc,
    read_warc,
    read_warc_selected,
    resolve_revisits,
    warc_record_bytes_out,
    write_warc,
)

ENTITY = b"<html>stable page</html>"


def _archive(tmp_path):
    gz = gzip.compress(ENTITY)
    recs = [
        ({
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:uuid:r1>",
            "WARC-Target-URI": "http://x.org/p",
            "WARC-Date": "2026-08-16T00:00:00Z",
            "Content-Type": "application/http; msgtype=response",
        }, b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
           b"Server: s/1\r\nContent-Encoding: gzip\r\n"
           b"Content-Length: %d\r\n\r\n" % len(gz) + gz),
        ({
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:uuid:r2>",
            "WARC-Target-URI": "http://x.org/q",
            "WARC-Date": "2026-08-16T00:00:01Z",
            "Content-Type": "application/http; msgtype=response",
            # br can't decode in-container: quarantined residual row
        }, b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
           b"Content-Encoding: br\r\nContent-Length: 4\r\n\r\nBRBR"),
        ({
            "WARC-Type": "metadata",
            "WARC-Record-ID": "<urn:uuid:m1>",
            "WARC-Target-URI": "http://x.org/p",
            "WARC-Date": "2026-08-16T00:00:02Z",
            "Content-Type": "application/warc-fields",
        }, b"k: v\r\n"),
    ]
    arc = tmp_path / "a.warc.gz"
    arc.write_bytes(encode_warc(recs))
    return str(arc)


@pytest.mark.parametrize(
    "compress,ext", [("gz", ".warc.gz"), ("zst", ".warc.zst"),
                     (False, ".warc")]
)
def test_roundtrip_all_containers(spark, tmp_path, compress, ext):
    df = read_warc(spark, _archive(tmp_path), record_types="*",
                   headers=True)
    out = str(tmp_path / "out")
    write_warc(df, out, compress=compress)
    files = os.listdir(out)
    assert files and all(f.endswith(ext) for f in files)
    back = read_warc(spark, f"{out}/part-*{ext}", record_types="*",
                     headers=True)
    rows = {r.record_id: r for r in back.collect()}
    r1 = rows["<urn:uuid:r1>"]
    # the decoded entity round-trips; the rebuilt head dropped the
    # now-false Content-Encoding and kept the rest
    assert bytes(r1.body) == ENTITY
    assert r1.http_status == 200 and r1.content_type == "text/html"
    assert r1.content_encoding is None
    assert "content-encoding" not in r1.http_headers
    assert r1.http_headers["server"] == "s/1"
    assert r1.target_uri == "http://x.org/p"
    assert r1.warc_date == "2026-08-16T00:00:00Z"
    # quarantined row: still-encoded body verbatim, head kept saying so
    r2 = rows["<urn:uuid:r2>"]
    assert bytes(r2.body) == b"BRBR" and r2.content_encoding == "br"
    assert r2.http_headers["content-encoding"] == "br"
    # non-HTTP record passes through raw
    m1 = rows["<urn:uuid:m1>"]
    assert bytes(m1.body) == b"k: v\r\n"
    assert m1.content_type == "application/warc-fields"


def test_zst_output_is_seekable_and_digests_crossmatch(spark, tmp_path):
    df = read_warc(spark, _archive(tmp_path), record_types="*",
                   headers=True)
    out = str(tmp_path / "z")
    write_warc(df, out, compress="zst")
    idx = cdx_records(spark, f"{out}/part-*.warc.zst", record_types="*",
                      digest="stored")
    # frame-per-record layout: selected reads work directly
    got = read_warc_selected(
        spark, idx.filter("url = 'http://x.org/p' and mime = 'text/html'")
    ).collect()
    assert len(got) == 1 and bytes(got[0].body) == ENTITY
    # the recomputed WARC-Payload-Digest equals the stored-convention
    # index digest for every record
    digests = {r.record_id: r.digest for r in idx.collect()}
    back = read_warc(spark, f"{out}/part-*.warc.zst", record_types="*",
                     headers=True).collect()
    for r in back:
        assert r.warc_headers["warc-payload-digest"] == (
            "sha1:" + digests[r.record_id])


def test_byte_deterministic_reexport(spark, tmp_path):
    df = read_warc(spark, _archive(tmp_path), record_types="*",
                   headers=True)
    a, b = str(tmp_path / "e1"), str(tmp_path / "e2")
    write_warc(df, a)
    write_warc(df, b)
    fa, fb = sorted(os.listdir(a)), sorted(os.listdir(b))
    assert fa == fb
    for f in fa:
        assert (open(os.path.join(a, f), "rb").read()
                == open(os.path.join(b, f), "rb").read())


def test_without_header_maps_synthesizes(spark, tmp_path):
    """A frame WITHOUT the headers= maps (e.g. a filtered default-read
    or a hand-built corpus) still lands valid records — minimal head
    from the fixed columns, deterministic urn when record_id NULL."""
    rows = [("http://s.org/a", "2026-01-01T00:00:00Z", None, None,
             200, "text/plain", None, b"hello", None, None)]
    df = spark.createDataFrame(
        rows,
        "target_uri string, warc_date string, record_id string, "
        "warc_type string, http_status int, content_type string, "
        "content_encoding string, body binary, "
        "warc_headers map<string,string>, "
        "http_headers map<string,string>",
    )
    out = str(tmp_path / "o")
    write_warc(df, out)
    back = read_warc(spark, f"{out}/part-*.warc.gz").collect()
    assert len(back) == 1
    assert bytes(back[0].body) == b"hello"
    assert back[0].http_status == 200
    assert back[0].content_type == "text/plain"
    assert back[0].record_id.startswith("<urn:sha1:")


def test_resolved_revisit_archive_compacts(spark, tmp_path):
    """The flagship composition: index with revisits, resolve, read
    the selection, re-land it.  read_warc_selected emits each DISTINCT
    record once (span+record_id dedup — the original and its resolved
    revisit collapse), so the output archive is the dedup-compacted
    corpus: one stored copy of the duplicated content, re-indexing
    cleanly with the same digest."""
    content = b"<html>dup</html>"
    head = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: %d\r\n\r\n" % len(content))
    import base64
    import hashlib

    b32 = base64.b32encode(hashlib.sha1(content).digest()).decode()
    recs = [
        ({"WARC-Type": "response", "WARC-Record-ID": "<urn:uuid:o1>",
          "WARC-Target-URI": "http://d.org/p",
          "WARC-Date": "2026-01-01T00:00:00Z",
          "Content-Type": "application/http; msgtype=response"},
         head + content),
        ({"WARC-Type": "revisit", "WARC-Record-ID": "<urn:uuid:v1>",
          "WARC-Target-URI": "http://d.org/p",
          "WARC-Date": "2026-06-01T00:00:00Z",
          "WARC-Payload-Digest": "sha1:" + b32,
          "Content-Type": "application/http; msgtype=response"},
         b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"),
    ]
    arc = tmp_path / "c.warc.gz"
    arc.write_bytes(encode_warc(recs))
    idx = cdx_records(spark, str(arc),
                      record_types=("response", "revisit"),
                      digest="stored")
    full = read_warc_selected(spark, resolve_revisits(idx))
    out = str(tmp_path / "flat")
    write_warc(full, out)
    back = read_warc(spark, f"{out}/part-*.warc.gz")
    bodies = [bytes(r.body) for r in back.collect()]
    assert bodies == [content]  # ONE stored copy, the real payload
    idx2 = cdx_records(spark, f"{out}/part-*.warc.gz", digest="stored")
    assert idx2.count() == 1
    assert {r.digest for r in idx2.collect()} == {b32}


def test_write_warc_guards(spark):
    df = spark.createDataFrame([(b"x",)], "body binary")
    with pytest.raises(ValueError, match="compress"):
        write_warc(df, "/tmp/nope", compress="lz4")
    with pytest.raises(ValueError, match="mode"):
        write_warc(df, "/tmp/nope", mode="bogus")
    with pytest.raises(ValueError, match="body"):
        write_warc(spark.range(1), "/tmp/nope")


def test_record_bytes_out_unit():
    assert warc_record_bytes_out(
        "u", None, None, None, None, None, None, None, None, None
    ) is None  # NULL body -> skip
    raw = warc_record_bytes_out(
        "http://a/", "2026-01-01T00:00:00Z", "<id>", "response", 200,
        "text/html", None, b"hi",
        {"warc-type": "response", "content-length": "999",
         "warc-block-digest": "sha1:STALE"},
        {"content-type": "text/html", "content-length": "999",
         "transfer-encoding": "chunked"},
        compress=False,
    )
    text = raw.decode("latin-1")
    assert "Content-Length: 999" not in text     # recomputed
    assert "Transfer-Encoding" not in text       # decoded body
    assert "WARC-Block-Digest" not in text       # stale, dropped
    assert "WARC-Payload-Digest: sha1:" in text  # recomputed
    assert "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" in text
