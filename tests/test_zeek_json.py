"""Zeek JSON-log reader (extension surface — the reference scans TSV
only): typed parity with the TSV reader's parse semantics, schema
handling, glob behavior."""

import gzip
import json

import pytest

from pyspark.sql import functions as F

from zeek_duckdb_spark import read_zeek, read_zeek_json

CONN_TYPES = {
    "ts": "time",
    "uid": "string",
    "id.orig_h": "addr",
    "id.orig_p": "port",
    "id.resp_h": "addr",
    "id.resp_p": "port",
    "proto": "enum",
    "duration": "interval",
    "orig_bytes": "count",
    "local_orig": "bool",
    "service_list": "vector[string]",
}


def _write_conn_json(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture(scope="module")
def conn_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("zeekjson")
    rows = [
        {
            "ts": 1591367999.305988,
            "uid": "C1",
            "id.orig_h": "192.168.4.76",
            "id.orig_p": 36844,
            "id.resp_h": "8.8.8.8",
            "id.resp_p": 53,
            "proto": "udp",
            "duration": 0.0668,
            "orig_bytes": 62,
            "local_orig": True,
            "service_list": ["dns"],
        },
        {  # unset fields omitted, out-of-range port, negative count
            "ts": 1591368000.5,
            "uid": "C2",
            "id.orig_h": "192.168.4.1",
            "id.orig_p": 99999,
            "id.resp_p": 443,
            "proto": "tcp",
            "orig_bytes": -3,
            "local_orig": False,
            "service_list": [],
        },
    ]
    _write_conn_json(d / "conn_1.json", rows[:1])
    with gzip.open(d / "conn_2.json.gz", "wt") as f:
        f.write(json.dumps(rows[1]) + "\n")
    return str(d)


def test_typed_read_matches_tsv_semantics(spark, conn_dir):
    df = read_zeek_json(spark, conn_dir + "/conn_*", types=CONN_TYPES)
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert dict(df.dtypes)["id_orig_p"] == "int"
    assert dict(df.dtypes)["orig_bytes"] == "bigint"
    assert dict(df.dtypes)["duration"] == "interval day to second"
    assert dict(df.dtypes)["service_list"] == "array<string>"
    rows = {r.uid: r for r in df.collect()}
    # µs truncation of the epoch double, same as the TSV reader
    assert rows["C1"].ts.microsecond == 305988
    assert rows["C1"].id_orig_p == 36844
    assert rows["C2"].id_orig_p is None       # 99999 out of port range
    assert rows["C2"].orig_bytes is None      # negative count -> NULL
    assert rows["C2"].id_resp_h is None       # omitted field -> NULL
    assert rows["C2"].duration is None        # omitted interval -> NULL
    # empty set stays [] — a real JSON value; NOTE the TSV format cannot
    # say this ("(empty)" reads NULL per the reference), so [] is one
    # thing the JSON surface represents that TSV can't
    assert rows["C2"].service_list == []
    assert rows["C1"].local_orig is True and rows["C2"].local_orig is False


def test_json_and_tsv_readers_agree_on_equivalent_logs(spark, conn_dir, tmp_path):
    # the same two conn records as a Zeek TSV log must parse to the
    # same typed values through read_zeek
    tsv = tmp_path / "conn.log"
    hdr = (
        "#separator \\x09\n#set_separator\t,\n#empty_field\t(empty)\n"
        "#unset_field\t-\n#path\tconn\n"
        "#fields\tts\tuid\tid.orig_h\tid.orig_p\torig_bytes\n"
        "#types\ttime\tstring\taddr\tport\tcount\n"
    )
    tsv.write_text(
        hdr
        + "1591367999.305988\tC1\t192.168.4.76\t36844\t62\n"
        + "1591368000.500000\tC2\t192.168.4.1\t-\t-\n"
    )
    t = read_zeek(spark, str(tsv)).orderBy("uid").collect()
    j = (
        read_zeek_json(spark, conn_dir + "/conn_*", types=CONN_TYPES)
        .select("ts", "uid", "id_orig_h", "id_orig_p")
        .orderBy("uid")
        .collect()
    )
    assert [(r.ts, r.uid, r.id_orig_h) for r in t] == [
        (r.ts, r.uid, r.id_orig_h) for r in j
    ]
    assert t[0].id_orig_p == j[0].id_orig_p == 36844
    # TSV unset ('-') and JSON out-of-range both land NULL
    assert t[1].id_orig_p is None and j[1].id_orig_p is None


def test_iso_timestamps_mode(spark, tmp_path):
    p = tmp_path / "iso.json"
    _write_conn_json(p, [{"ts": "2020-06-05T14:39:59.305988Z", "uid": "C9"}])
    df = read_zeek_json(
        spark, str(p), types={"ts": "time", "uid": "string"}, timestamps="iso"
    )
    r = df.first()
    assert r.ts.year == 2020 and r.ts.microsecond == 305988
    with pytest.raises(ValueError, match="timestamps"):
        read_zeek_json(spark, str(p), timestamps="unix")


def test_inferred_read_and_options(spark, conn_dir):
    # no types: Spark inference; ts stays a double, dotted names kept
    # unless replace_periods
    df = read_zeek_json(spark, conn_dir + "/conn_*", replace_periods=False)
    assert dict(df.dtypes)["ts"] == "double"
    assert "id.orig_h" in df.columns
    named = read_zeek_json(spark, conn_dir + "/conn_*", filename=True)
    assert "filename" in named.columns
    fn = {r.uid: r.filename for r in named.select("uid", "filename").collect()}
    assert fn["C1"].endswith("conn_1.json") and fn["C2"].endswith("conn_2.json.gz")


def test_zero_match_glob_errors(spark, conn_dir):
    with pytest.raises(Exception, match="[Nn]o files"):
        read_zeek_json(spark, conn_dir + "/nope_*")
