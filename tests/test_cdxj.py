"""CDXJ interop (round-15, r14 verdict item 4): sorted zipnum shards
+ cluster.idx round-trip through the cdx_records schema, a GOLDEN line
pinned against the documented field order, block-level prefix pruning,
and read_warc_selected consuming an imported CDXJ."""

import gzip
import os

import pytest

from zeek_duckdb_spark.sources.cdxj import (
    _cdxj_line,
    _select_blocks,
    read_cdxj,
    write_cdxj,
)
from zeek_duckdb_spark.sources.warc import (
    cdx_records,
    encode_warc,
    read_warc_selected,
)


def _http(body: bytes, ctype="text/html", status=200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _resp(uri: str, body: bytes, **kw):
    return (
        {"WARC-Type": "response", "WARC-Record-ID": f"<urn:{uri}>",
         "WARC-Target-URI": uri, "WARC-Date": "2026-08-16T01:02:03Z",
         "Content-Type": "application/http; msgtype=response"},
        _http(body, **kw),
    )


def _archive(tmp_path, n_hosts=4, pages=3):
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    for h in range(n_hosts):
        (crawl / f"host{h}.warc.gz").write_bytes(encode_warc([
            _resp(f"http://site{h}.org/p{p}", f"<p>{h}-{p}</p>".encode())
            for p in range(pages)
        ]))
    return crawl


def test_golden_cdxj_line():
    """The documented line format, byte-for-byte: urlkey SP ts SP json
    with keys in (url, mime, status, digest, length, offset, filename)
    order, all values strings, record_id appended last."""
    row = ("org,example)/a?x=1", "20260816010203", "http://example.org/A?x=1",
           "<urn:uuid:1234>", "text/html", 200,
           "sha1:ABCDEFGHIJKLMNOPQRSTUVWXYZ234567", 321, 4096,
           "crawl/host0.warc.gz")
    assert _cdxj_line(row) == (
        'org,example)/a?x=1 20260816010203 '
        '{"url": "http://example.org/A?x=1", "mime": "text/html", '
        '"status": "200", "digest": "sha1:ABCDEFGHIJKLMNOPQRSTUVWXYZ234567", '
        '"length": "321", "offset": "4096", '
        '"filename": "crawl/host0.warc.gz", "record_id": "<urn:uuid:1234>"}'
    )
    # optional fields omitted, not written as null/'-'
    no_mime = row[:4] + (None,) + row[5:]
    assert '"mime"' not in _cdxj_line(no_mime)
    # loud on rows that cannot key a line
    with pytest.raises(ValueError, match="urlkey"):
        _cdxj_line((None,) + row[1:])
    with pytest.raises(ValueError, match="14-digit"):
        _cdxj_line((row[0], "2026",) + row[2:])
    with pytest.raises(ValueError, match="no offset"):
        _cdxj_line(row[:8] + (None, row[9]))


@pytest.mark.slow
def test_roundtrip_and_layout(spark, tmp_path):
    """cdx_records -> write_cdxj -> read_cdxj returns the same rows;
    the on-disk layout is genuine zipnum: range-ordered gzip-member
    shards whose members hold <= lines_per_block lines, cluster.idx
    naming every member span in global key order."""
    crawl = _archive(tmp_path)
    idx = cdx_records(spark, str(crawl / "*.warc.gz"))
    out = str(tmp_path / "cdxj")
    write_cdxj(idx, out, shards=3, lines_per_block=2)

    files = sorted(os.listdir(out))
    shards = [f for f in files if f.startswith("cdx-") and f.endswith(".gz")]
    assert "cluster.idx" in files and shards

    # cluster.idx: sorted, tab layout, spans tile each shard
    with open(os.path.join(out, "cluster.idx")) as fh:
        entries = [ln.rstrip("\n").split("\t") for ln in fh]
    keys = [e[0] for e in entries]
    assert keys == sorted(keys)
    assert [int(e[4]) for e in entries] == list(range(len(entries)))
    per_shard: dict = {}
    for _k, shard, off, ln, _s in entries:
        per_shard.setdefault(shard, []).append((int(off), int(ln)))
    for shard, spans in per_shard.items():
        assert spans[0][0] == 0
        assert all(a[0] + a[1] == b[0] for a, b in zip(spans, spans[1:]))
        assert sum(l for _o, l in spans) == os.path.getsize(
            os.path.join(out, shard))

    # every member decompresses alone and holds <= lines_per_block
    # sorted lines; global line order across shards is the key order
    all_lines = []
    for shard in shards:
        blob = open(os.path.join(out, shard), "rb").read()
        for off, ln in per_shard.get(shard, []):
            lines = gzip.decompress(blob[off:off + ln]).decode().splitlines()
            assert 1 <= len(lines) <= 2
            all_lines.extend(lines)
    assert all_lines == sorted(all_lines)
    assert len(all_lines) == idx.count()

    back = read_cdxj(spark, out)
    want = {tuple(r) for r in idx.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want
    assert back.schema == idx.schema

    # byte-stable re-export (gzip mtime pinned to 0)
    blobs = {s: open(os.path.join(out, s), "rb").read() for s in shards}
    write_cdxj(idx, out, shards=3, lines_per_block=2)
    for s in shards:
        assert open(os.path.join(out, s), "rb").read() == blobs[s]

    with pytest.raises(Exception, match="mode='error'"):
        write_cdxj(idx, out, mode="error")


def test_prefix_pruned_read(spark, tmp_path):
    """A prefix probe reads only the blocks cluster.idx says can hold
    it, and returns exactly the matching rows."""
    crawl = _archive(tmp_path, n_hosts=6, pages=4)
    idx = cdx_records(spark, str(crawl / "*.warc.gz"))
    out = str(tmp_path / "cdxj")
    write_cdxj(idx, out, shards=4, lines_per_block=3)

    got = read_cdxj(spark, out, prefix="org,site3)").collect()
    assert sorted(r.url for r in got) == [
        f"http://site3.org/p{p}" for p in range(4)]

    # no match -> empty, schema intact
    none = read_cdxj(spark, out, prefix="zz,nothing)")
    assert none.count() == 0 and "urlkey" in none.columns

    # the pure block-selection function, pinned on its edges
    keys = ["a)/", "c)/", "c)/", "m)/", "t)/"]
    assert _select_blocks(keys, "c)") == [0, 1, 2]   # run straddles
    assert _select_blocks(keys, "a")  == [0]
    assert _select_blocks(keys, "m)/x") == [3]
    assert _select_blocks(keys, "z") == [4]          # last block open
    assert _select_blocks(keys, "0") == []           # before all keys:
    # nothing can match — every key > prefix range
    assert _select_blocks([], "a") == []


def test_selected_read_from_imported_cdxj(spark, tmp_path):
    """The interop payoff: an index that round-tripped through the
    external text format still drives record-exact random access."""
    crawl = _archive(tmp_path)
    idx = cdx_records(spark, str(crawl / "*.warc.gz"))
    out = str(tmp_path / "cdxj")
    write_cdxj(idx, out, shards=2, lines_per_block=4)

    imported = read_cdxj(spark, out, prefix="org,site2)")
    pick = imported.filter("url = 'http://site2.org/p1'")
    rows = read_warc_selected(spark, pick).collect()
    assert [r.target_uri for r in rows] == ["http://site2.org/p1"]
    assert bytes(rows[0].body) == b"<p>2-1</p>"


def test_external_producer_parse(spark, tmp_path):
    """A hand-laid layout in the shape an external tool writes —
    json-number offsets, unknown keys, no record_id — parses into the
    cdx schema (record_id NULL -> read_warc_selected's url fallback)."""
    out = tmp_path / "ext"
    out.mkdir()
    lines = (
        'com,example)/ 20260101000000 {"url": "http://example.com/", '
        '"mime": "text/html", "status": "200", "digest": "sha1:AAA", '
        '"length": 123, "offset": 0, "filename": "a.warc.gz", '
        '"languages": "eng"}\n'
        'com,example)/faq 20260101000001 {"url": "http://example.com/FAQ", '
        '"status": "404", "length": "55", "offset": "123", '
        '"filename": "a.warc.gz"}\n'
    )
    member = gzip.compress(lines.encode(), mtime=0)
    (out / "cdx-00000.gz").write_bytes(member)
    (out / "cluster.idx").write_text(
        f"com,example)/ 20260101000000\tcdx-00000.gz\t0\t{len(member)}\t0\n"
    )
    got = sorted(read_cdxj(spark, str(out)).collect(),
                 key=lambda r: r.urlkey)
    assert [r.urlkey for r in got] == ["com,example)/", "com,example)/faq"]
    assert got[0].length == 123 and got[0].offset == 0
    assert got[1].http_status == 404 and got[1].record_id is None
    assert got[1].mime is None

    with pytest.raises(ValueError, match="cluster.idx"):
        read_cdxj(spark, str(tmp_path / "missing"))


def test_raw_datasource_guards(spark, tmp_path):
    """The raw DataSource path stays loud: wrong columns and unsorted
    partitions both error naming the typed API."""
    from zeek_duckdb_spark.sources.cdxj import CdxjDataSource, _WRITE_COLS

    spark.dataSource.register(CdxjDataSource)
    with pytest.raises(Exception, match="typed API"):
        (spark.range(3).write.format("cdxj")
         .mode("overwrite").save(str(tmp_path / "x")))

    rows = [
        ("b)/", "20260101000000", "http://b/", None, None, 200,
         None, 10, 0, "w.warc.gz"),
        ("a)/", "20260101000000", "http://a/", None, None, 200,
         None, 10, 10, "w.warc.gz"),
    ]
    df = spark.createDataFrame(rows, (
        "urlkey string, cdx_ts string, url string, record_id string, "
        "mime string, http_status int, digest string, length long, "
        "offset long, warc_file string"
    )).coalesce(1)
    with pytest.raises(Exception, match="not sorted"):
        (df.write.format("cdxj").mode("overwrite")
         .save(str(tmp_path / "y")))


def test_cdxj_line_roundtrip_property():
    """Property (hypothesis): any legal index row survives
    _cdxj_line -> _parse_cdxj_line exactly — json quoting, optional
    fields, unicode urls, large offsets."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from zeek_duckdb_spark.sources.cdxj import _cdxj_line, _parse_cdxj_line

    key = st.text(
        alphabet=st.characters(
            blacklist_characters=" \t\r\n",
            blacklist_categories=("Cs", "Zs", "Zl", "Zp", "Cc"),
        ),
        min_size=1, max_size=40,
    )
    ts = st.integers(10**13, 10**14 - 1).map(str)
    opt_text = st.one_of(st.none(), st.text(max_size=30))
    nonneg = st.integers(0, 2**62)

    @settings(max_examples=200, deadline=None)
    @given(
        key, ts,
        st.text(min_size=1, max_size=60),          # url (any text)
        opt_text,                                  # record_id
        opt_text,                                  # mime
        st.one_of(st.none(), st.integers(0, 999)),  # http_status
        opt_text,                                  # digest
        nonneg, nonneg,                            # length, offset
        st.text(min_size=1, max_size=60),          # warc_file
    )
    def run(k, t, url, rid, mime, status, digest, length, offset, wf):
        row = (k, t, url, rid, mime, status, digest, length, offset, wf)
        line = _cdxj_line(row)
        assert "\n" not in line and "\r" not in line
        back = _parse_cdxj_line(line, "t")
        # ''/'-' text optionals read back as NULL (the CDX
        # absent-value convention — a stated one-way fold); the key
        # itself is never folded
        fold = lambda v: None if v in ("", "-") else v  # noqa: E731
        want = (k, t, fold(url), fold(rid), fold(mime), status,
                fold(digest), length, offset, fold(wf))
        assert tuple(back) == want

    run()
