"""dedup_to_revisits (round 15) — write-time archive deduplication,
the inverse of resolve_revisits: later captures of identical payloads
become spec-conformant revisit rows (empty body, identical-payload-
digest profile, refers-to chain), write_warc keeps the header digest
verbatim for revisit records, and the full circle
dedup -> write -> index -> resolve -> selected-read restores every
capture's real payload."""

import base64
import hashlib

import pytest

from zeek_duckdb_spark.sources.warc import (
    _REVISIT_PROFILE,
    cdx_records,
    dedup_to_revisits,
    encode_warc,
    read_warc,
    read_warc_selected,
    resolve_revisits,
    write_warc,
)

SAME = b"<html>same</html>"
OTHER = b"<html>unique</html>"


def _resp(rid, uri, date, ent):
    return ({
        "WARC-Type": "response",
        "WARC-Record-ID": rid,
        "WARC-Target-URI": uri,
        "WARC-Date": date,
        "Content-Type": "application/http; msgtype=response",
    }, b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
       b"Content-Length: %d\r\n\r\n" % len(ent) + ent)


def _archive(tmp_path):
    arc = tmp_path / "a.warc.gz"
    arc.write_bytes(encode_warc([
        _resp("<urn:uuid:a>", "http://s.org/p",
              "2026-01-01T00:00:00Z", SAME),
        _resp("<urn:uuid:b>", "http://s.org/p",
              "2026-02-01T00:00:00Z", SAME),
        _resp("<urn:uuid:c>", "http://t.org/q",
              "2026-03-01T00:00:00Z", SAME),
        _resp("<urn:uuid:d>", "http://u.org/r",
              "2026-01-15T00:00:00Z", OTHER),
        ({"WARC-Type": "metadata", "WARC-Record-ID": "<urn:uuid:m>",
          "WARC-Target-URI": "http://s.org/p",
          "WARC-Date": "2026-01-01T00:00:00Z",
          "Content-Type": "application/warc-fields"}, SAME),
    ]))
    return str(arc)


def test_dedup_semantics(spark, tmp_path):
    df = read_warc(spark, _archive(tmp_path), record_types="*",
                   headers=True)
    rows = {r.record_id: r for r in dedup_to_revisits(df).collect()}
    b32 = base64.b32encode(hashlib.sha1(SAME).digest()).decode()
    # earliest capture keeps its content
    a = rows["<urn:uuid:a>"]
    assert a.warc_type == "response" and bytes(a.body) == SAME
    # later captures (same AND different urls) become revisits
    for rid in ("<urn:uuid:b>", "<urn:uuid:c>"):
        r = rows[rid]
        assert r.warc_type == "revisit" and bytes(r.body) == b""
        assert r.content_encoding is None
        assert r.warc_headers["warc-profile"] == _REVISIT_PROFILE
        assert r.warc_headers["warc-payload-digest"] == "sha1:" + b32
        assert r.warc_headers["warc-refers-to"] == "<urn:uuid:a>"
        assert r.warc_headers["warc-refers-to-target-uri"] == (
            "http://s.org/p")
        assert r.warc_headers["warc-refers-to-date"] == (
            "2026-01-01T00:00:00Z")
        assert r.http_status == 200  # the re-fetch head survives
    # unique payloads and non-response records pass through untouched
    assert rows["<urn:uuid:d>"].warc_type == "response"
    m = rows["<urn:uuid:m>"]
    assert m.warc_type == "metadata" and bytes(m.body) == SAME


@pytest.mark.slow
def test_full_circle_restores_corpus(spark, tmp_path):
    """dedup -> write -> index -> resolve -> selected-read: every
    distinct payload lands ONCE and every capture still resolves to
    its real content."""
    df = read_warc(spark, _archive(tmp_path), headers=True)
    out = str(tmp_path / "dd")
    write_warc(dedup_to_revisits(df), out)
    idx = cdx_records(spark, f"{out}/part-*.warc.gz",
                      record_types=("response", "revisit"),
                      digest="stored")
    res = resolve_revisits(idx)
    assert res.count() == 4  # all four captures survive in the index
    got = read_warc_selected(spark, res)
    stored = sorted((r.record_id, bytes(r.body)) for r in got.collect())
    assert stored == [("<urn:uuid:a>", SAME), ("<urn:uuid:d>", OTHER)]
    # written revisit records carry the ORIGINAL digest (write_warc's
    # revisit exception), so the index's revisit rows equi-join it
    back = {r.record_id: r for r in read_warc(
        spark, f"{out}/part-*.warc.gz",
        record_types=("revisit",), headers=True).collect()}
    b32 = base64.b32encode(hashlib.sha1(SAME).digest()).decode()
    assert back["<urn:uuid:b>"].warc_headers[
        "warc-payload-digest"] == "sha1:" + b32


def test_without_header_maps_grows_column(spark, tmp_path):
    df = read_warc(spark, _archive(tmp_path))  # no headers= maps
    out = dedup_to_revisits(df)
    assert "warc_headers" in out.columns
    rows = {r.record_id: r for r in out.collect()}
    assert rows["<urn:uuid:b>"].warc_headers["warc-refers-to"] == (
        "<urn:uuid:a>")
    assert rows["<urn:uuid:a>"].warc_headers is None


def test_decode_text_frame_nulls_stale_text(spark, tmp_path):
    """On a decode_text=True frame the revisit rows' body_text nulls
    out with the body — pre-dedup text on an empty record would lie."""
    df = read_warc(spark, _archive(tmp_path), headers=True,
                   decode_text=True)
    rows = {r.record_id: r for r in dedup_to_revisits(df).collect()}
    assert rows["<urn:uuid:b>"].body_text is None
    assert rows["<urn:uuid:a>"].body_text == SAME.decode()


def test_missing_columns_loud(spark):
    with pytest.raises(ValueError, match="missing"):
        dedup_to_revisits(spark.range(1))


def test_no_duplicates_is_identity(spark, tmp_path):
    arc = tmp_path / "u.warc.gz"
    arc.write_bytes(encode_warc([
        _resp("<urn:uuid:x>", "http://a/", "2026-01-01T00:00:00Z",
              b"one"),
        _resp("<urn:uuid:y>", "http://b/", "2026-01-02T00:00:00Z",
              b"two"),
    ]))
    df = read_warc(spark, str(arc), headers=True)
    out = dedup_to_revisits(df).collect()
    assert all(r.warc_type == "response" for r in out)
    assert sorted(bytes(r.body) for r in out) == [b"one", b"two"]


def test_digest_is_jvm_side_and_bit_exact(spark):
    """r16 optimization pin: the payload digest is computed entirely in
    JVM expressions (sha1 + conv-per-40-bit-chunk + alphabet translate)
    — (a) bit-identical to base64.b32encode(hashlib.sha1(body)) on
    random bodies including the empty one, (b) the physical plan has NO
    Python evaluation node, so bodies never cross the JVM-Python
    boundary, and (c) the window partition key carries the NULL-digest
    salt so passthrough record types cannot collapse into one sorted
    partition."""
    import random

    random.seed(16)
    rows = [
        (f"<urn:uuid:{i}>", "response", f"http://x/{i}",
         "2026-01-01T00:00:00Z", 200, "text/html", None,
         bytearray(random.randbytes(random.randint(0, 200))))
        for i in range(64)
    ]
    rows.append(("<urn:uuid:empty>", "response", "http://x/e",
                 "2026-01-01T00:00:00Z", 200, "text/html", None,
                 bytearray(b"")))
    # a metadata row exercises the NULL-digest salt path
    rows.append(("<urn:uuid:meta>", "metadata", "http://x/m",
                 "2026-01-01T00:00:00Z", None, "application/warc-fields",
                 None, bytearray(b"mm")))
    df = spark.createDataFrame(
        rows,
        "record_id string, warc_type string, target_uri string, "
        "warc_date string, http_status int, content_type string, "
        "content_encoding string, body binary",
    )
    out = dedup_to_revisits(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                 "FlatMapGroupsInPandas"):
        assert node not in plan, f"Python node {node} in dedup plan"
    # all bodies distinct -> identity; digests verified via the header
    # map of a forced duplicate below
    assert all(r.warc_type != "revisit" for r in out.collect()
               if r.warc_type == "response")
    # force duplicates: same body twice, check the digest value exactly
    dup = spark.createDataFrame(
        [
            ("<urn:uuid:1>", "response", "http://d/1",
             "2026-01-01T00:00:00Z", 200, "text/html", None,
             bytearray(bytes(b))),
            ("<urn:uuid:2>", "response", "http://d/2",
             "2026-01-02T00:00:00Z", 200, "text/html", None,
             bytearray(bytes(b))),
        ],
        "record_id string, warc_type string, target_uri string, "
        "warc_date string, http_status int, content_type string, "
        "content_encoding string, body binary",
    ) if (b := random.randbytes(133)) else None
    got = {r.record_id: r for r in dedup_to_revisits(dup).collect()}
    want = base64.b32encode(hashlib.sha1(b).digest()).decode()
    assert got["<urn:uuid:2>"].warc_headers["warc-payload-digest"] == (
        "sha1:" + want)
    # (c) the window partition spec carries three keys (digest, salt,
    # warc_type) — the salt spreads NULL-digest rows
    assert "pmod(xxhash64(" in plan
