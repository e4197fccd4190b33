"""Byte-exact archive subsetting (round-15): extract_warc copies
CDX-selected raw spans into a standalone member-per-record .warc.gz —
the warcio/pywb "extract" operation, distributed.  Pins: gz members
copy VERBATIM (byte-identity against the source slices), the new
archive round-trips through read_warc AND cdx_records with matching
digests, plain and seekable-zst sources re-land readably, the sink is
staged (no visible shard from a died job), and the opener seam covers
remote sources."""

import gzip
import io
import os

import pytest

from zeek_duckdb_spark.sources.warc import (
    cdx_records,
    encode_warc,
    extract_warc,
    read_warc,
)


def _http(body: bytes, ctype="text/html", status=200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _resp(uri: str, body: bytes, **kw):
    return (
        {"WARC-Type": "response", "WARC-Record-ID": f"<urn:{uri}>",
         "WARC-Target-URI": uri, "WARC-Date": "2026-08-16T00:00:00Z",
         "Content-Type": "application/http; msgtype=response"},
        _http(body, **kw),
    )


def _archive(tmp_path, hosts=3, pages=4, compress="gz"):
    crawl = tmp_path / "crawl"
    crawl.mkdir(parents=True, exist_ok=True)
    ext = {"gz": ".warc.gz", "zst": ".warc.zst", False: ".warc"}[compress]
    for h in range(hosts):
        (crawl / f"host{h}{ext}").write_bytes(encode_warc([
            _resp(f"http://h{h}.org/p{p}", f"<b>{h}.{p}</b>".encode() * 5)
            for p in range(pages)
        ], compress=compress))
    return crawl


def test_gz_subset_verbatim_and_roundtrip(spark, tmp_path):
    crawl = _archive(tmp_path)
    idx = cdx_records(spark, str(crawl / "*.warc.gz"))
    pick = idx.filter("urlkey like 'org,h1)%'")
    out = str(tmp_path / "subset")
    manifest = extract_warc(spark, pick, out)
    assert manifest["record_spans"] == 4 and manifest["files"] >= 1
    shards = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(shards) == manifest["files"]
    assert not [f for f in os.listdir(out) if f.startswith(".")]  # no tmps

    # VERBATIM: every output member byte-slice exists in the source at
    # its indexed span
    src = (crawl / "host1.warc.gz").read_bytes()
    blob = b"".join(
        open(os.path.join(out, s), "rb").read() for s in sorted(shards))
    spans = sorted((r.offset, r.length) for r in pick.collect())
    assert blob == b"".join(src[o:o + l] for o, l in spans)

    # the subset archive reads back as exactly the selected records
    got = read_warc(spark, out + "/part-*.warc.gz")
    assert sorted(r.target_uri for r in got.collect()) == [
        f"http://h1.org/p{p}" for p in range(4)]

    # and re-indexes with IDENTICAL payload digests (content fidelity)
    d0 = {r.record_id: r.digest for r in pick.collect()}
    d1 = {r.record_id: r.digest
          for r in cdx_records(spark, out + "/part-*.warc.gz").collect()}
    assert d1 == d0


@pytest.mark.slow
def test_plain_and_seekable_zst_sources(spark, tmp_path):
    for compress, glob in ((False, "*.warc"), ("zst", "*.warc.zst")):
        crawl = _archive(tmp_path / str(compress), compress=compress,
                         hosts=2, pages=3)
        idx = cdx_records(spark, str(crawl / glob))
        pick = idx.filter("urlkey like 'org,h0)%'")
        out = str(tmp_path / str(compress) / "subset")
        manifest = extract_warc(spark, pick, out)
        assert manifest["record_spans"] == 3
        got = read_warc(spark, out + "/part-*.warc.gz")
        rows = {(r.target_uri, bytes(r.body)) for r in got.collect()}
        assert rows == {(f"http://h0.org/p{p}", f"<b>0.{p}</b>".encode() * 5)
                        for p in range(3)}
        # digests carry over (payload fidelity through re-containering)
        d0 = {r.record_id: r.digest for r in pick.collect()}
        d1 = {r.record_id: r.digest
              for r in cdx_records(spark, out + "/part-*.warc.gz").collect()}
        assert d1 == d0


def test_remote_opener_and_guards(spark, tmp_path):
    """The opener seam: extract FROM an in-memory store; bad spans and
    single-frame zst refuse loudly."""
    blob = encode_warc([_resp("http://m.org/a", b"remote-bytes")])
    snap = {"mem://b/x.warc.gz": blob}

    def opener(path):
        return io.BytesIO(snap[path])

    idx = cdx_records(spark, "mem://b/x.warc.gz", opener=opener)
    out = str(tmp_path / "remote-subset")
    manifest = extract_warc(spark, idx, out, opener=opener)
    assert manifest["record_spans"] == 1
    got = read_warc(spark, out + "/part-*.warc.gz").collect()
    assert bytes(got[0].body) == b"remote-bytes"

    # a span that is not member-aligned errors instead of landing junk
    bad = idx.selectExpr("warc_file", "offset", "length + 7 as length")
    with pytest.raises(Exception, match="member-aligned|corrupt|truncated"):
        extract_warc(spark, bad, str(tmp_path / "junk"), opener=opener)
    # ...and the failed job left no visible shard
    assert not [f for f in os.listdir(str(tmp_path / "junk"))
                if f.startswith("part-")]

    with pytest.raises(Exception, match="decompressed stream"):
        f = tmp_path / "one.warc.zst"
        from zeek_duckdb_spark.sources.warc import _zstd_compress_frame

        f.write_bytes(_zstd_compress_frame(encode_warc(
            [_resp("http://z.org/", b"x")], compress=False)))
        extract_warc(spark, cdx_records(spark, str(f)),
                     str(tmp_path / "zjunk"))

    with pytest.raises(ValueError, match="task_bytes"):
        extract_warc(spark, idx, out, task_bytes=0)


def test_multi_record_member_copies_whole(spark, tmp_path):
    """Span-granular contract: one gz member holding several records
    copies whole even when the selection names one URL."""
    recs = [_resp(f"http://mm.org/{i}", b"v%d" % i) for i in range(3)]
    f = tmp_path / "multi.warc.gz"
    f.write_bytes(gzip.compress(encode_warc(recs, compress=False)))
    idx = cdx_records(spark, str(f))
    assert idx.count() == 3  # three rows sharing one member span
    pick = idx.filter("url = 'http://mm.org/1'")
    out = str(tmp_path / "subset")
    manifest = extract_warc(spark, pick, out)
    assert manifest["record_spans"] == 1  # one SPAN (the shared member)
    got = read_warc(spark, out + "/part-*.warc.gz")
    assert sorted(r.target_uri for r in got.collect()) == [
        f"http://mm.org/{i}" for i in range(3)]  # whole member, stated


def test_warcinfo_leader(spark, tmp_path):
    """warcinfo=True prepends each shard with a deterministic
    warcinfo member (the Common Crawl shard convention); the data
    records stay byte-identical and a default read_warc (responses
    only) returns the same rows."""
    crawl = _archive(tmp_path, hosts=1, pages=2)
    idx = cdx_records(spark, str(crawl / "*.warc.gz"))
    out = str(tmp_path / "subset")
    extract_warc(spark, idx, out, warcinfo=True)
    shard = sorted(f for f in os.listdir(out) if f.startswith("part-"))[0]
    blob = open(os.path.join(out, shard), "rb").read()
    info = read_warc(spark, out + "/part-*.warc.gz",
                     record_types=("warcinfo",)).collect()
    assert len(info) == 1
    first = gzip.GzipFile(fileobj=io.BytesIO(blob)).read(64)
    assert b"WARC-Type: warcinfo" in first or first.startswith(b"WARC/1.0")
    got = read_warc(spark, out + "/part-*.warc.gz")
    assert sorted(r.target_uri for r in got.collect()) == [
        "http://h0.org/p0", "http://h0.org/p1"]
    # deterministic: a re-extract produces identical shard bytes
    extract_warc(spark, idx, str(tmp_path / "again"), warcinfo=True)
    again = sorted(f for f in os.listdir(str(tmp_path / "again")))
    assert open(os.path.join(str(tmp_path / "again"), again[0]), "rb").read() == blob
