"""Port of /root/reference/test/sql/zeek_ignore_file_errors.test —
corrupt-gzip skipping, fake-gzip skipping, valid/corrupt glob mixes,
interaction with union_by_name and filename."""

import pytest

from pyspark.sql import functions as F

from zeek_duckdb_spark import read_zeek
from zeek_duckdb_spark.header import ZeekHeaderError

ERR = "/root/reference/data/error_test"


def test_corrupted_file_errors_by_default(spark):
    with pytest.raises(Exception):
        read_zeek(spark, f"{ERR}/corrupted.log.gz", inet=False)


def test_fake_gzip_errors_by_default(spark):
    with pytest.raises(Exception, match="GZIP"):
        read_zeek(spark, f"{ERR}/fake_gzip.log.gz", inet=False)


def test_glob_with_corrupt_errors_by_default(spark):
    with pytest.raises(Exception):
        read_zeek(spark, f"{ERR}/*.log.gz", inet=False).count()


def test_ignore_file_errors_skips_corrupt(spark):
    df = read_zeek(spark, f"{ERR}/*.log.gz", inet=False, ignore_file_errors=True)
    assert df.count() == 3  # the 3 valid rows across valid.log.gz + valid2.log.gz


def test_ignore_file_errors_filenames(spark):
    df = read_zeek(
        spark, f"{ERR}/*.log.gz", inet=False, ignore_file_errors=True, filename=True
    )
    names = {r.filename.rsplit("/", 1)[-1] for r in df.select("filename").distinct().collect()}
    assert names == {"valid.log.gz", "valid2.log.gz"}


def test_ignore_file_errors_with_union_by_name(spark):
    df = read_zeek(
        spark,
        f"{ERR}/*.log.gz",
        inet=False,
        ignore_file_errors=True,
        union_by_name=True,
    )
    assert df.count() == 3


def test_ignore_file_errors_values(spark):
    import datetime

    df = read_zeek(spark, f"{ERR}/*.log.gz", inet=False, ignore_file_errors=True)
    rows = df.orderBy("id").collect()
    # reference golden rows (test/sql/zeek_ignore_file_errors.test:46-55)
    assert [(r.id, r.value) for r in rows] == [("A1", 100), ("A2", 200), ("A3", 300)]
    assert rows[0].ts.replace(tzinfo=datetime.timezone.utc) == datetime.datetime.fromtimestamp(
        1737003590.123456, datetime.timezone.utc
    )


def test_all_corrupt_still_errors(spark, tmp_path):
    # if NO file yields a schema the query still errors
    # (ref src/zeek_scanner.cpp:499-505; 'No valid Zeek log files found')
    bad = tmp_path / "only_bad.log.gz"
    bad.write_bytes(b"")
    with pytest.raises(ZeekHeaderError, match="No valid Zeek log files found"):
        read_zeek(spark, str(tmp_path / "*.log.gz"), ignore_file_errors=True)


def test_single_corrupt_with_ignore_still_errors(spark):
    # reference: needs at least one valid file for schema
    # (test/sql/zeek_ignore_file_errors.test:22-32)
    with pytest.raises(ZeekHeaderError, match="No valid Zeek log files found in pattern"):
        read_zeek(spark, f"{ERR}/corrupted.log.gz", ignore_file_errors=True)
    with pytest.raises(ZeekHeaderError, match="No valid Zeek log files found in pattern"):
        read_zeek(spark, f"{ERR}/fake_gzip.log.gz", ignore_file_errors=True)
