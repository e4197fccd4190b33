"""zstd compression path.  The reference accepts .log, .log.gz AND
.log.zst, auto-detecting the codec by magic bytes (README.md:52;
src/zeek_scanner.cpp:261-262 FileCompressionType::AUTO_DETECT).

This environment may or may not ship the ``zstandard`` module, so the
suite exercises whichever half of the behavior is reachable:

- module absent  -> a magic-detected zstd file must raise the clear
  "zstandard module is unavailable" ZeekHeaderError at bind time
  (never a silent misparse of compressed bytes as text);
- module present -> a real .log.zst round-trips through both scan
  paths' shared opener and yields the same rows as the plain .log.
"""

import gzip
import shutil

import pytest

from zeek_duckdb_spark import read_zeek
from zeek_duckdb_spark.header import ZSTD_MAGIC, ZeekHeaderError, open_zeek_text, parse_header

REF = "/root/reference/data"

try:
    import zstandard  # type: ignore

    HAVE_ZSTD = True
except ImportError:
    HAVE_ZSTD = False


@pytest.fixture()
def dns_log_text(tmp_path):
    """The dns fixture decompressed to plain text."""
    out = tmp_path / "dns.log"
    with gzip.open(f"{REF}/dns.log.gz", "rb") as src, open(out, "wb") as dst:
        shutil.copyfileobj(src, dst)
    return out


@pytest.mark.skipif(HAVE_ZSTD, reason="zstandard installed; error path unreachable")
def test_zstd_without_module_raises_clearly(tmp_path):
    p = tmp_path / "conn.log.zst"
    p.write_bytes(ZSTD_MAGIC + b"\x00" * 32)
    with pytest.raises(ZeekHeaderError, match="zstandard module is unavailable"):
        parse_header(str(p))


@pytest.mark.skipif(HAVE_ZSTD, reason="zstandard installed; error path unreachable")
def test_zstd_without_module_fails_at_bind_not_scan(spark, tmp_path):
    # read_zeek must surface the missing-codec error at bind time, like
    # every other header-level error (no job launched, no misparse)
    p = tmp_path / "conn.log.zst"
    p.write_bytes(ZSTD_MAGIC + b"\x00" * 32)
    with pytest.raises(ZeekHeaderError, match="zstandard module is unavailable"):
        read_zeek(spark, str(p))


@pytest.mark.skipif(not HAVE_ZSTD, reason="zstandard module not installed")
def test_zst_opener_roundtrip(tmp_path, dns_log_text):
    zst = tmp_path / "dns.log.zst"
    zst.write_bytes(zstandard.ZstdCompressor().compress(dns_log_text.read_bytes()))
    with open_zeek_text(str(dns_log_text)) as plain, open_zeek_text(str(zst)) as z:
        assert z.read() == plain.read()


@pytest.mark.skipif(not HAVE_ZSTD, reason="zstandard module not installed")
def test_zst_datasource_scan_matches_plain(spark, tmp_path, dns_log_text):
    from zeek_duckdb_spark.sources.datasource import register_zeek_datasource

    register_zeek_datasource(spark)
    zst = tmp_path / "dns.log.zst"
    zst.write_bytes(zstandard.ZstdCompressor().compress(dns_log_text.read_bytes()))
    plain_rows = sorted(
        tuple(r) for r in spark.read.format("zeek").load(str(dns_log_text)).collect()
    )
    zst_rows = sorted(
        tuple(r) for r in spark.read.format("zeek").load(str(zst)).collect()
    )
    assert zst_rows == plain_rows and len(zst_rows) > 0
