"""write_zeek: Zeek TSV sink round-trip (read_zeek -> write_zeek ->
read_zeek equality), wire-form exactness, and the no-escaping guard."""

import glob
import gzip

import pytest

from pyspark.sql import functions as F

from zeek_duckdb_spark import read_zeek, write_zeek

REF = "/root/reference/data"


@pytest.fixture(autouse=True)
def _register(spark):
    from zeek_duckdb_spark.sources.datasource import register_zeek_datasource

    register_zeek_datasource(spark)


def _round_trip_equal(spark, df, out, **kw):
    write_zeek(df, out, **kw)
    back = read_zeek(spark, f"{out}/*.log*")
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    return back


def test_round_trip_known_hosts(spark, tmp_path):
    df = read_zeek(spark, f"{REF}/known_hosts_20260116_0[0-5]*.log.gz")
    _round_trip_equal(
        spark, df, str(tmp_path / "kh"),
        zeek_types={"host_ip": "addr", "conns_opened": "count",
                    "conns_closed": "count"},
    )


def test_round_trip_dns_vectors_and_unset(spark, tmp_path):
    # dns.log carries vector columns and unset markers
    df = read_zeek(spark, f"{REF}/dns.log.gz")
    _round_trip_equal(spark, df, str(tmp_path / "dns"))


def test_round_trip_dhcp_sets(spark, tmp_path):
    df = read_zeek(spark, f"{REF}/dhcp.log.gz")
    _round_trip_equal(spark, df, str(tmp_path / "dhcp"))


def test_round_trip_gz_and_one_file_per_partition(spark, tmp_path):
    df = read_zeek(spark, f"{REF}/known_hosts_20260116_0[0-2]*.log.gz")
    out = str(tmp_path / "gz")
    write_zeek(df, out, compress=True)
    files = sorted(glob.glob(f"{out}/part-*.log.gz"))
    assert len(files) == df.rdd.getNumPartitions()
    with gzip.open(files[0], "rt") as fh:
        assert fh.readline() == "#separator \\x09\n"
    back = read_zeek(spark, f"{out}/*.log.gz")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_wire_forms_exact(spark, tmp_path):
    # µs-exact integer time/interval formatting, T/F bools, markers
    df = spark.sql(
        "SELECT timestamp_micros(1768540789230929) AS ts, "
        "INTERVAL '0 00:05:23.126660' DAY TO SECOND AS dur, "
        "-INTERVAL '0 00:00:01.000001' DAY TO SECOND AS neg, "
        "true AS b, CAST(NULL AS STRING) AS s0, '' AS s1, "
        "array('x', CAST(NULL AS STRING), '') AS v, "
        "array() AS e"
    ).select("ts", "dur", "neg", "b", "s0", "s1", "v",
             F.col("e").cast("array<string>").alias("e"))
    out = str(tmp_path / "wire")
    write_zeek(df, out)
    line = [
        l for l in open(glob.glob(f"{out}/part-*.log")[0])
        if not l.startswith("#")
    ][0].rstrip("\n")
    assert line.split("\t") == [
        "1768540789.230929", "323.126660", "-1.000001", "T", "-",
        "(empty)", "x,-,(empty)", "(empty)",
    ]


def test_unwritable_value_errors_loudly_or_strips(spark, tmp_path):
    df = spark.createDataFrame([(1, "a\tb")], "id long, text string")
    with pytest.raises(Exception, match="no\\s+escaping|escaping"):
        write_zeek(df, str(tmp_path / "bad"))
    write_zeek(df, str(tmp_path / "ok"), on_unwritable="strip")
    back = read_zeek(spark, str(tmp_path / "ok") + "/*.log")
    assert back.collect()[0].text == "a b"


def test_mode_error_refuses_existing_output(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "id long")
    out = str(tmp_path / "dup")
    write_zeek(df, out)
    with pytest.raises(Exception, match="already contains"):
        write_zeek(df, out, mode="error")
    write_zeek(df, out)  # overwrite default replaces
    assert read_zeek(spark, f"{out}/*.log").count() == 1


def test_typed_api_required(spark, tmp_path):
    # raw format("zeek") writes need the pre-formatted single column
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(Exception, match="pre-formatted string column"):
        df.write.format("zeek").mode("overwrite").option(
            "zeek_header", "#fields\tid"
        ).save(str(tmp_path / "raw"))


def test_unsupported_type_names_column(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "id long, blob binary")
    with pytest.raises(ValueError, match="blob"):
        write_zeek(df, "/tmp/never")
