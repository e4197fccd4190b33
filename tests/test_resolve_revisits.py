"""resolve_revisits — the web-archive dedup join (ISO 28500 §6.7.2
identical-payload-digest profile): revisit rows re-point at the
capture that stored the content, with the as-of preference order and
unmatched policies pinned, plus the end-to-end archive round-trip
(cdx_records with revisits -> resolve -> read_warc_selected returns
the ORIGINAL payload at the revisit's place in history)."""

import base64
import hashlib

import pytest

from zeek_duckdb_spark.sources.warc import (
    _CDX_SCHEMA,
    cdx_records,
    encode_warc,
    read_warc_selected,
    resolve_revisits,
)


def _b32(content: bytes) -> str:
    return base64.b32encode(hashlib.sha1(content).digest()).decode()


def _row(urlkey, ts, digest, mime="text/html", rid=None, off=0,
         length=10, wf="/a.warc.gz", status=200):
    return (urlkey, ts, "http://" + urlkey, rid or f"<urn:{urlkey}:{ts}>",
            mime, status, digest, length, off, wf)


def _cdx(spark, rows):
    return spark.createDataFrame(rows, _CDX_SCHEMA)


def test_rank1_latest_original_at_or_before(spark):
    """Same urlkey: the revisit resolves to the LATEST original with
    cdx_ts <= its own, not the newest overall."""
    rows = [
        _row("a)/", "20260101000000", "D1", off=100),
        _row("a)/", "20260301000000", "D1", off=300),
        _row("a)/", "20260501000000", "D1", off=500),
        _row("a)/", "20260401000000", "D1", mime="warc/revisit", off=7),
    ]
    out = resolve_revisits(_cdx(spark, rows)).collect()
    assert len(out) == 4
    got = [r for r in out if r.cdx_ts == "20260401000000"]
    assert len(got) == 1 and got[0].offset == 300
    assert got[0].mime == "text/html"  # content fields are the original's
    assert got[0].urlkey == "a)/"      # capture identity is the revisit's


def test_equal_ts_original_wins(spark):
    """An original at the SAME cdx_ts as the revisit counts as <=."""
    rows = [
        _row("a)/", "20260101000000", "D1", off=100),
        _row("a)/", "20260101000000", "D1", mime="warc/revisit", off=7),
    ]
    out = resolve_revisits(_cdx(spark, rows)).collect()
    rev = [r for r in out if r.offset == 100 and r.mime == "text/html"]
    assert len(rev) == 2  # passthrough + resolved both point at 100


def test_rank2_original_recorded_later(spark):
    """No original at <= ts (segments are not written in time order):
    the EARLIEST same-urlkey original resolves it."""
    rows = [
        _row("a)/", "20260501000000", "D1", off=500),
        _row("a)/", "20260701000000", "D1", off=700),
        _row("a)/", "20260101000000", "D1", mime="warc/revisit", off=7),
    ]
    out = resolve_revisits(_cdx(spark, rows)).collect()
    got = [r for r in out if r.cdx_ts == "20260101000000"]
    assert len(got) == 1 and got[0].offset == 500


def test_rank3_cross_url_and_cross_url_off(spark):
    rows = [
        _row("b)/", "20260101000000", "D1", off=100),
        _row("b)/", "20260301000000", "D1", off=300),
        _row("a)/", "20260201000000", "D1", mime="warc/revisit", off=7),
    ]
    out = resolve_revisits(_cdx(spark, rows)).collect()
    got = [r for r in out if r.urlkey == "a)/"]
    # cross-url fallback picks the EARLIEST original with the digest
    assert len(got) == 1 and got[0].offset == 100
    out2 = resolve_revisits(_cdx(spark, rows), cross_url=False).collect()
    assert not [r for r in out2 if r.urlkey == "a)/"]  # dropped


def test_on_unmatched_policies(spark):
    rows = [
        _row("a)/", "20260101000000", "D1", off=100),
        _row("a)/", "20260201000000", "NOPE", mime="warc/revisit", off=7),
    ]
    df = _cdx(spark, rows)
    assert len(resolve_revisits(df).collect()) == 1  # drop (default)
    kept = resolve_revisits(df, on_unmatched="keep").collect()
    assert len(kept) == 2
    still = [r for r in kept if r.digest == "NOPE"]
    assert still[0].mime == "warc/revisit" and still[0].offset == 7
    with pytest.raises(Exception, match="no original found"):
        resolve_revisits(df, on_unmatched="error").collect()
    with pytest.raises(ValueError, match="on_unmatched"):
        resolve_revisits(df, on_unmatched="bogus")


def test_missing_columns_loud(spark):
    with pytest.raises(ValueError, match="missing CDX columns"):
        resolve_revisits(_cdx(spark, []).drop("digest"))


def test_null_digest_revisit_never_matches_null_digest_original(spark):
    rows = [
        _row("a)/", "20260101000000", None, off=100),
        _row("a)/", "20260201000000", None, mime="warc/revisit", off=7),
    ]
    out = resolve_revisits(_cdx(spark, rows), on_unmatched="keep").collect()
    got = [r for r in out if r.cdx_ts == "20260201000000"]
    assert got[0].offset == 7 and got[0].mime == "warc/revisit"


def test_end_to_end_archive_roundtrip(spark, tmp_path):
    """The full ring: an archive whose re-crawl wrote revisit records
    indexes with mime='warc/revisit' and the ORIGINAL's stored-payload
    digest (from WARC-Payload-Digest), resolves, and selected-reads
    the original bytes at the revisit capture."""
    content = b"<html>stable page</html>"
    head = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Length: %d\r\n\r\n" % len(content)
    )
    orig = ({
        "WARC-Type": "response",
        "WARC-Record-ID": "<urn:uuid:orig-1>",
        "WARC-Target-URI": "http://site.org/page",
        "WARC-Date": "2026-01-01T00:00:00Z",
        "Content-Type": "application/http; msgtype=response",
    }, head + content)
    revisit = ({
        "WARC-Type": "revisit",
        "WARC-Record-ID": "<urn:uuid:rev-1>",
        "WARC-Target-URI": "http://site.org/page",
        "WARC-Date": "2026-06-01T00:00:00Z",
        "WARC-Profile":
            "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest",
        "WARC-Payload-Digest": "sha1:" + _b32(content),
        "Content-Type": "application/http; msgtype=response",
    }, b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n")
    other = ({
        "WARC-Type": "response",
        "WARC-Record-ID": "<urn:uuid:other-1>",
        "WARC-Target-URI": "http://site.org/other",
        "WARC-Date": "2026-01-01T00:00:00Z",
        "Content-Type": "application/http; msgtype=response",
    }, b"HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nother")
    arc = tmp_path / "crawl.warc.gz"
    arc.write_bytes(encode_warc([orig, other, revisit]))

    idx = cdx_records(
        spark, str(arc), record_types=("response", "revisit"),
        digest="stored",
    )
    rows = {r.record_id: r for r in idx.collect()}
    rev_row = rows["<urn:uuid:rev-1>"]
    assert rev_row.mime == "warc/revisit"
    assert rev_row.digest == _b32(content)          # header digest
    assert rev_row.digest == rows["<urn:uuid:orig-1>"].digest
    assert rev_row.http_status == 200               # re-fetch head parsed

    res = resolve_revisits(idx)
    got = read_warc_selected(spark, res.filter("cdx_ts like '202606%'"))
    recs = got.collect()
    assert len(recs) == 1
    assert recs[0].record_id == "<urn:uuid:orig-1>"
    assert recs[0].body == content  # the original payload, decoded


def test_null_mime_original_passes_through_and_matches(spark):
    """A NULL mime marks an ordinary record (non-HTTP capture): it
    must pass through AND serve as a resolution candidate — the
    null-safe comparison regression pin (plain == drops these)."""
    rows = [
        _row("a)/", "20260101000000", "D1", mime=None, off=100),
        _row("a)/", "20260201000000", "D1", mime="warc/revisit", off=7),
    ]
    out = resolve_revisits(_cdx(spark, rows)).collect()
    assert len(out) == 2
    assert sorted(r.offset for r in out) == [100, 100]


def test_hot_digest_volume(spark):
    """The no-explosion shape under volume: ONE digest shared by 1000
    captures (600 revisits) plus 400 singleton groups resolves
    correctly — the window pass costs a group sort, and every revisit
    lands on the rank-1 original for its timestamp."""
    rows = []
    # hot group: originals at even days, revisits at odd days
    for i in range(1000):
        ts = f"202601{(i % 27) + 1:02d}{i % 24:02d}0000"
        if i % 5 < 2:
            rows.append(_row("hot)/", ts, "HOT", rid=f"<o{i:04d}>",
                             off=i))
        else:
            rows.append(_row("hot)/", ts, "HOT", mime="warc/revisit",
                             rid=f"<r{i:04d}>", off=i))
    for g in range(400):
        rows.append(_row(f"s{g})/", "20260101000000", f"D{g}",
                         rid=f"<s{g}>", off=g))
    in_orig_ts = {  # rid -> ts of the hot group's originals
        r[3]: r[1] for r in rows
        if r[0] == "hot)/" and r[3].startswith("<o")
    }
    earliest = min(in_orig_ts.values())
    out = resolve_revisits(_cdx(spark, rows))
    got = out.collect()
    assert len(got) == 1400  # every row resolved, none dropped
    hot = [r for r in got if r.urlkey == "hot)/"]
    assert len(hot) == 1000
    # every hot row points at an ORIGINAL record (revisit ids gone)
    assert all(r.record_id.startswith("<o") for r in hot)
    # the as-of invariant, row by row: the matched original is at or
    # before the capture — except captures predating every original,
    # which take the earliest (rank 2)
    revisit_caps = {r[1] for r in rows
                    if r[0] == "hot)/" and r[3].startswith("<r")}
    for r in hot:
        if r.cdx_ts not in revisit_caps:
            continue  # a passthrough original
        matched = in_orig_ts[r.record_id]
        if any(ts <= r.cdx_ts for ts in in_orig_ts.values()):
            assert matched <= r.cdx_ts
        else:
            assert matched == earliest


def test_no_revisits_is_identity(spark):
    rows = [
        _row("a)/", "20260101000000", "D1", off=100),
        _row("b)/", "20260201000000", "D2", off=200),
    ]
    df = _cdx(spark, rows)
    out = resolve_revisits(df)
    assert out.schema == df.schema
    assert sorted((r.urlkey, r.offset) for r in out.collect()) == [
        ("a)/", 100), ("b)/", 200)]
