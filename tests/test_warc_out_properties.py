"""Property-test the general WARC record builder: any reader-schema
row warc_record_bytes_out emits (plain container) parses back through
_record_spans as ONE spec-valid record whose payload, identity headers
and rebuilt HTTP head agree with the inputs — the same
format->parse closure discipline as the CDXJ line and zstd-walker
property suites.  Pure Python: no Spark session."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from zeek_duckdb_spark.sources.warc import (
    _record_spans,
    warc_record_bytes_out,
)

# header-safe text: no CR/LF/colon in keys; values may hold colons
_key = st.text(
    alphabet=string.ascii_lowercase + string.digits + "-",
    min_size=1, max_size=12,
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
_val = st.text(
    alphabet=string.ascii_letters + string.digits + " :;/=.,-_",
    min_size=0, max_size=30,
).map(str.strip)
_hmap = st.dictionaries(_key, _val, max_size=5)
_body = st.binary(max_size=200)
_uri = st.text(
    alphabet=string.ascii_letters + string.digits + ":/.?&=_-",
    min_size=1, max_size=40,
)


@settings(max_examples=120, deadline=None)
@given(
    url=st.one_of(st.none(), _uri),
    wdate=st.one_of(st.none(), st.just("2026-08-16T00:00:00Z")),
    record_id=st.one_of(st.none(), st.just("<urn:uuid:x>")),
    wtype=st.sampled_from(["response", "metadata", "conversion"]),
    status=st.one_of(st.none(), st.integers(100, 599)),
    ctype=st.one_of(st.none(), st.just("text/html")),
    body=_body,
    warc_headers=st.one_of(st.none(), _hmap),
    http_headers=st.one_of(st.none(), _hmap),
)
def test_record_out_parses_back(
    url, wdate, record_id, wtype, status, ctype, body,
    warc_headers, http_headers,
):
    raw = warc_record_bytes_out(
        url, wdate, record_id, wtype, status, ctype, None, body,
        warc_headers, http_headers, compress=False,
    )
    recs = list(_record_spans(raw, "prop"))
    assert len(recs) == 1
    _s, _e, rec = recs[0]
    h = rec["headers"]
    assert h["warc-type"] == wtype
    if record_id:
        assert h["warc-record-id"] == record_id
    else:
        assert h["warc-record-id"].startswith("<urn:sha1:")
    if url:
        assert h["warc-target-uri"] == url
    if wdate:
        assert h["warc-date"] == wdate
    assert h["warc-payload-digest"].startswith("sha1:")
    payload = rec["payload"]
    if status is not None:
        # rebuilt head: status line + recomputed Content-Length,
        # entity bytes verbatim after the blank line
        head, _, ent = payload.partition(b"\r\n\r\n")
        assert head.startswith(f"HTTP/1.1 {status} ".encode())
        assert ent == body
        assert f"content-length: {len(body)}".encode() in head.lower()
        tehdr = [
            ln for ln in head.lower().split(b"\r\n")
            if ln.startswith((b"transfer-encoding:", b"content-encoding:"))
        ]
        assert not tehdr  # decoded rows never re-claim an encoding
    else:
        assert payload == body


def test_kept_transfer_encoding_suppresses_content_length():
    """A quarantined row (cenc non-null) keeps Transfer-Encoding
    verbatim — the rebuilt head must then NOT add Content-Length
    (RFC 9112 §6.3 forbids the pair; strict replayers mis-frame it).
    Decoded rows still carry the recomputed Content-Length (r16)."""
    raw = warc_record_bytes_out(
        "http://q/", "2026-08-17T00:00:00Z", "<urn:uuid:q>", "response",
        200, "text/html", "chunked",
        b"5\r\nhello\r\n0\r\n\r\n",
        None, {"transfer-encoding": "chunked", "server": "s/1"},
        compress=False,
    )
    recs = list(_record_spans(raw, "prop"))
    head, _, _ent = recs[0][2]["payload"].partition(b"\r\n\r\n")
    low = head.lower()
    assert b"transfer-encoding: chunked" in low
    assert b"content-length" not in low
    # decoded row (cenc None): Content-Length present, TE dropped
    raw2 = warc_record_bytes_out(
        "http://q/", "2026-08-17T00:00:00Z", "<urn:uuid:q2>", "response",
        200, "text/html", None, b"hello",
        None, {"transfer-encoding": "chunked", "server": "s/1"},
        compress=False,
    )
    head2, _, _ = list(_record_spans(raw2, "prop"))[0][2][
        "payload"].partition(b"\r\n\r\n")
    assert b"content-length: 5" in head2.lower()
    assert b"transfer-encoding" not in head2.lower()
