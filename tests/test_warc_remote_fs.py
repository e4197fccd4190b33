"""Object-store streaming front door (round-15): the ``warc``/``cdx``
stream engines work on remote schemes through injected ``opener=``/
``lister=`` callables — rows identical to the POSIX engine on the same
bytes, the bounded-memory watermark holds through the opener seam, and
the streaming source lists/opens remotely.  The fake filesystem here is
the injection contract: any ranged-GET client (fsspec_opener/
fsspec_lister in production) slots into the same two callables."""

import fnmatch
import io

import pytest

from zeek_duckdb_spark.sources.warc import (
    _decompressed_chunks,
    _records_from_chunks,
    _FileSetStreamReader,
    cdx_records,
    encode_warc,
    read_warc,
    read_warc_selected,
    read_warc_stream,
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


def _mem_fs(files: dict):
    """In-memory ``mem://`` filesystem: a dict of path -> bytes ->
    (opener, lister) CLOSURES.  Defined inside a function so
    cloudpickle ships them BY VALUE (the tests/ module is not
    importable on executors or the planning worker); user seams live
    in importable modules — fsspec_opener/fsspec_lister's
    functools.partial shape.  Executors see the dict as pickled at
    plan time — mutations made afterwards in the test process are
    invisible, which is exactly the pickling contract the docstrings
    state (real fsspec seams re-list the live store)."""
    snap = dict(files)

    def opener(path: str):
        if path not in snap:
            raise FileNotFoundError(path)
        return io.BytesIO(snap[path])

    def lister(path: str):
        if any(c in path for c in "*?["):
            return sorted(p for p in snap if fnmatch.fnmatch(p, path))
        if path.endswith("/"):
            return sorted(p for p in snap if p.startswith(path))
        return [path] if path in snap else []

    return opener, lister


def _two_files():
    return {
        "mem://bucket/day0.warc.gz": encode_warc([
            _resp("http://d0.org/a", b"<p>a</p>" * 30),
            _resp("http://d0.org/b", b"<p>b</p>"),
        ]),
        "mem://bucket/day1.warc.gz": encode_warc([
            _resp("http://d1.org/a", b"<p>c</p>"),
        ]),
    }


def _row_key(r):
    return (r.target_uri, bytes(r.body), r.http_status, r.content_type)


def test_remote_batch_rows_match_posix(spark, tmp_path):
    """read_warc over mem:// (stream engine by default — the seams
    make it the default on remote schemes) returns exactly the POSIX
    stream engine's rows on the same bytes."""
    files = _two_files()
    opener, lister = _mem_fs(files)
    for name, blob in files.items():
        (tmp_path / name.rsplit("/", 1)[1]).write_bytes(blob)

    remote = read_warc(
        spark, "mem://bucket/*.warc.gz", opener=opener, lister=lister
    )
    local = read_warc(spark, str(tmp_path / "*.warc.gz"))
    got = sorted(_row_key(r) for r in remote.collect())
    want = sorted(_row_key(r) for r in local.collect())
    assert got == want and len(got) == 3
    # warc_file echoes the remote path (the CDX join key)
    assert {r.warc_file.rsplit("/", 1)[0]
            for r in remote.collect()} == {"mem://bucket"}


def test_remote_cdx_and_selected_read(spark):
    """cdx_records over mem:// + read_warc_selected with the same
    opener: the full remote random-access loop — index remotely, then
    re-read one record by its span through ranged reads."""
    opener, lister = _mem_fs(_two_files())
    idx = cdx_records(
        spark, "mem://bucket/*.warc.gz", opener=opener, lister=lister,
    )
    rows = idx.collect()
    assert len(rows) == 3 and all(r.urlkey for r in rows)
    pick = idx.filter("url = 'http://d0.org/b'")
    got = read_warc_selected(spark, pick, opener=opener).collect()
    assert [r.target_uri for r in got] == ["http://d0.org/b"]
    assert bytes(got[0].body) == b"<p>b</p>"


def test_remote_streaming_source(spark, tmp_path):
    """readStream through the seams: a mem:// archive drains into
    micro-batches with the same rows as the batch read (the file-set
    offsets list through the injected lister)."""
    opener, lister = _mem_fs(_two_files())
    out, ck = str(tmp_path / "landed"), str(tmp_path / "ck")
    q = (
        read_warc_stream(
            spark, "mem://bucket/*.warc.gz", opener=opener, lister=lister,
        )
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    assert {r.target_uri for r in spark.read.parquet(out).collect()} == {
        "http://d0.org/a", "http://d0.org/b", "http://d1.org/a",
    }


def test_remote_watermark_bounded():
    """The bounded-memory watermark HOLDS through the opener seam: a
    multi-record remote plain WARC parses with a buffer high-water
    mark far below the file size (the whole point of the stream
    engine on object stores — no whole-blob materialization).  The
    fake file caps each read() at 64 KiB, the shape a ranged-GET
    client actually returns."""
    body = b"x" * (1 << 16)
    blob = encode_warc(
        [_resp(f"http://w.org/{i}", body) for i in range(128)],
        compress=False,
    )  # ~8 MiB

    def opener(path):
        class _Capped(io.BytesIO):
            def read(self, n=-1):
                return super().read(min(n, 1 << 16) if n > 0 else n)

        return _Capped(blob)

    mem = {}
    got = list(_records_from_chunks(
        _decompressed_chunks("mem://bucket/big.warc", "t", opener),
        "t", mem=mem,
    ))
    assert len(got) == 128
    assert mem["peak_buffered"] < len(blob) // 4, (
        f"watermark {mem['peak_buffered']} vs blob {len(blob)}"
    )


def test_engine_resolution_with_seams(spark):
    """The resolution table (round-15): seams make 'stream' the remote
    default; binaryfile+seams errors; remote stream without seams
    errors naming them; lister-less opener needs a literal path;
    opener-less lister errors."""
    opener, lister = _mem_fs({"mem://bucket/one.warc": encode_warc(
        [_resp("http://o.org/a", b"x")], compress=False)})
    # literal remote file + opener alone: the listing is implied
    got = read_warc(spark, "mem://bucket/one.warc", opener=opener)
    assert [r.target_uri for r in got.collect()] == ["http://o.org/a"]
    with pytest.raises(ValueError, match="lister="):
        read_warc(spark, "mem://bucket/*.warc", opener=opener)
    with pytest.raises(ValueError, match="opener"):
        read_warc(spark, "mem://bucket/*.warc", lister=lister)
    with pytest.raises(ValueError, match="stream-engine seams"):
        read_warc(spark, "mem://bucket/one.warc", opener=opener,
                  engine="binaryfile")
    with pytest.raises(ValueError, match="opener= and\n?\\s*lister="):
        read_warc(spark, "s3a://bucket/x.warc.gz", engine="stream")


def test_offset_format_back_compat():
    """Three offset generations deserialize to the same file set (a
    live stream restarted onto r15 code keeps its offsets): the r14
    ``{"files": {path: 1}}`` dict, the interim sorted list, and the
    r15 directory-grouped form — whose serialize/deserialize pair
    round-trips any path set, including splits that don't rejoin."""
    assert _FileSetStreamReader._offset_files(
        {"files": {"a.warc": 1, "b.warc": 1}}
    ) == {"a.warc", "b.warc"}
    assert _FileSetStreamReader._offset_files(
        {"files": ["a.warc", "b.warc"]}
    ) == {"a.warc", "b.warc"}
    assert _FileSetStreamReader._offset_files({"files": []}) == set()

    paths = {
        "/crawl/2026/day0.warc.gz", "/crawl/2026/day1.warc.gz",
        "/crawl/2027/day0.warc.gz", "mem://bucket/x.warc",
        "bare.warc", "s3://b//doubleslash.warc",  # non-rejoining split
    }
    off = _FileSetStreamReader._serialize_files(paths)
    assert _FileSetStreamReader._offset_files(off) == paths
    # each directory name appears once; the two 2026 files share a key
    assert set(off["d"]["/crawl/2026"]) == {"day0.warc.gz", "day1.warc.gz"}
    assert "s3://b//doubleslash.warc" in off["d"][""]
    assert "bare.warc" in off["d"][""]
    # JSON-primitive (the checkpoint requirement) and deterministic
    import json

    assert json.loads(json.dumps(off)) == off
    assert off == _FileSetStreamReader._serialize_files(set(paths))
