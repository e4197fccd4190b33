"""WAT export (round 15) — the Common Crawl derived-metadata artifact
completing the WARC/WET/WAT triple: wat_records builds the JSON
envelope natively (to_json over the headers= maps; links via the
gated Arrow UDF), write_wat lands WARC metadata records that
round-trip through read_warc byte-deterministically."""

import json
import os

import pytest

from zeek_duckdb_spark.sources.warc import (
    encode_warc,
    read_warc,
    wat_records,
    write_wat,
)

HTML = b'<html><a href="http://out.org/x">l</a><a href="/rel">r</a></html>'


def _archive(tmp_path):
    recs = [
        ({
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:uuid:r1>",
            "WARC-Target-URI": "http://x.org/p",
            "WARC-Date": "2026-08-16T00:00:00Z",
            "Content-Type": "application/http; msgtype=response",
        }, b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
           b"Content-Length: %d\r\n\r\n" % len(HTML) + HTML),
        ({
            "WARC-Type": "response",
            "WARC-Record-ID": "<urn:uuid:r2>",
            "WARC-Target-URI": "http://x.org/bin",
            "WARC-Date": "2026-08-16T00:00:00Z",
            "Content-Type": "application/http; msgtype=response",
        }, b"HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n"
           b"Content-Length: 4\r\n\r\nPDF!"),
        ({
            "WARC-Type": "metadata",
            "WARC-Record-ID": "<urn:uuid:m1>",
            "WARC-Target-URI": "http://x.org/p",
            "WARC-Date": "2026-08-16T00:00:00Z",
            "Content-Type": "application/warc-fields",
        }, b"k: v\r\n"),
    ]
    arc = tmp_path / "a.warc.gz"
    arc.write_bytes(encode_warc(recs))
    return str(arc)


def _wat_by_ref(spark, tmp_path, **kw):
    df = read_warc(
        spark, _archive(tmp_path), record_types="*", headers=True
    )
    return {r.refers_to: r for r in wat_records(df, **kw).collect()}


def test_envelope_shape(spark, tmp_path):
    rows = _wat_by_ref(spark, tmp_path)
    j = json.loads(rows["<urn:uuid:r1>"].wat)
    env = j["Envelope"]
    assert env["Format"] == "WARC"
    assert env["WARC-Header-Metadata"]["warc-type"] == "response"
    assert env["WARC-Header-Metadata"]["warc-target-uri"] == "http://x.org/p"
    pm = env["Payload-Metadata"]
    assert pm["Actual-Content-Type"] == "text/html"
    hm = pm["HTTP-Response-Metadata"]
    assert hm["Status-Code"] == 200
    assert hm["Entity-Length"] == len(HTML)
    assert hm["Headers"]["content-type"] == "text/html"
    assert hm["HTML-Metadata"]["Links"] == [
        {"path": "A@/href", "url": "http://out.org/x"},
        {"path": "A@/href", "url": "/rel"},
    ]
    assert j["Container"]["Filename"].endswith("a.warc.gz")
    # non-HTML page: HTTP metadata yes, HTML-Metadata no
    j2 = json.loads(rows["<urn:uuid:r2>"].wat)
    hm2 = j2["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"]
    assert hm2["Status-Code"] == 200 and "HTML-Metadata" not in hm2
    # non-HTTP record: no HTTP-Response-Metadata branch at all
    j3 = json.loads(rows["<urn:uuid:m1>"].wat)
    assert "HTTP-Response-Metadata" not in j3["Envelope"]["Payload-Metadata"]


def test_links_off(spark, tmp_path):
    rows = _wat_by_ref(spark, tmp_path, links=False)
    j = json.loads(rows["<urn:uuid:r1>"].wat)
    hm = j["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"]
    assert "HTML-Metadata" not in hm and hm["Status-Code"] == 200


def test_requires_headers(spark, tmp_path):
    df = read_warc(spark, _archive(tmp_path))
    with pytest.raises(ValueError, match="headers=True"):
        wat_records(df)


def test_write_wat_roundtrip_and_determinism(spark, tmp_path):
    df = read_warc(
        spark, _archive(tmp_path), record_types="*", headers=True
    )
    wat = wat_records(df)
    out = str(tmp_path / "wat1")
    write_wat(wat, out)
    back = read_warc(spark, out + "/part-*.warc.gz",
                     record_types=("metadata",), headers=True)
    got = back.collect()
    assert len(got) == 3
    by_ref = {r.warc_headers.get("warc-refers-to"): r for r in got}
    r1 = by_ref["<urn:uuid:r1>"]
    assert r1.content_type == "application/json"
    assert r1.target_uri == "http://x.org/p"
    j = json.loads(bytes(r1.body).decode())
    assert j["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"][
        "HTML-Metadata"]["Links"][0]["url"] == "http://out.org/x"
    # byte-deterministic re-export
    out2 = str(tmp_path / "wat2")
    write_wat(wat, out2)
    a = sorted(os.listdir(out))
    b = sorted(os.listdir(out2))
    assert a == b
    for f in a:
        assert (
            open(os.path.join(out, f), "rb").read()
            == open(os.path.join(out2, f), "rb").read()
        )


def test_write_wat_mode_error(spark, tmp_path):
    df = read_warc(
        spark, _archive(tmp_path), record_types="*", headers=True
    )
    wat = wat_records(df, links=False)
    out = str(tmp_path / "wat")
    write_wat(wat, out)
    with pytest.raises(Exception, match="already contains"):
        write_wat(wat, out, mode="error")
    with pytest.raises(ValueError, match="mode"):
        write_wat(wat, out, mode="bogus")
