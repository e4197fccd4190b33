"""Edge-semantics parity tests on synthesized Zeek files — pins the
reference behaviors documented in SURVEY.md §1.4/§1.5 that the golden
fixtures don't exercise: custom separators/markers, the boolean
no-NULL rule, parse-failure NULLs, port range gating, short rows,
CRLF, '#' mid-line, unknown-type fallback."""

import gzip

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from zeek_duckdb_spark import read_zeek


def write_log(path, body: str, compress=False):
    data = body.encode()
    if compress:
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)
    return str(path)


STD_HEADER = (
    "#separator \\x09\n"
    "#set_separator\t,\n"
    "#empty_field\t(empty)\n"
    "#unset_field\t-\n"
    "#path\ttest\n"
    "#open\t2026-01-01-00-00-00\n"
)


def test_custom_separator_and_markers(spark, tmp_path):
    # pipe separator, semicolon set_separator, custom NULL markers
    body = (
        "#separator \\x7c\n"
        "#set_separator|;\n"
        "#empty_field|EMPTY\n"
        "#unset_field|NONE\n"
        "#path|t\n"
        "#open|x\n"
        "#fields|id|vals|note\n"
        "#types|string|vector[count]|string\n"
        "a|1;2;3|hello\n"
        "b|NONE|EMPTY\n"
    )
    p = write_log(tmp_path / "pipe.log", body)
    df = read_zeek(spark, p, inet=False)
    rows = df.orderBy("id").collect()
    assert rows[0].vals == [1, 2, 3]
    assert rows[0].note == "hello"
    assert rows[1].vals is None      # custom unset marker
    assert rows[1].note is None      # custom empty marker
    # default '-' is NOT a marker in this file
    body2 = body.replace("b|NONE|EMPTY", "c|1|-")
    p2 = write_log(tmp_path / "pipe2.log", body2)
    r = read_zeek(spark, p2, inet=False).filter(F.col("id") == "c").first()
    assert r.note == "-"


def test_bool_never_nulls_on_bad_input(spark, tmp_path):
    body = (
        STD_HEADER
        + "#fields\tid\tflag\n#types\tstring\tbool\n"
        + "a\tT\nb\ttrue\nc\tF\nd\tgarbage\ne\t-\n"
    )
    p = write_log(tmp_path / "bools.log", body)
    rows = {r.id: r.flag for r in read_zeek(spark, p, inet=False).collect()}
    assert rows["a"] is True
    assert rows["b"] is True       # 'true' also accepted
    assert rows["c"] is False
    assert rows["d"] is False      # bad input -> false, never NULL
    assert rows["e"] is None       # marker -> NULL (checked before bool rule)


def test_numeric_parse_failure_is_null(spark, tmp_path):
    body = (
        STD_HEADER
        + "#fields\tid\tn\tp\td\tts\n#types\tstring\tcount\tport\tdouble\ttime\n"
        + "a\t12\t80\t1.5\t1768540789.25\n"
        + "b\tnotnum\t99999\tx\tbadts\n"     # all parse failures
        + "c\t-7\t-1\t2.5\t1768540789.5\n"   # negative count/port -> NULL
    )
    p = write_log(tmp_path / "nums.log", body)
    rows = {r.id: r for r in read_zeek(spark, p, inet=False).collect()}
    assert rows["a"].n == 12 and rows["a"].p == 80 and rows["a"].d == 1.5
    assert rows["b"].n is None and rows["b"].p is None  # bad + out-of-range
    assert rows["b"].d is None and rows["b"].ts is None
    assert rows["c"].n is None and rows["c"].p is None  # uint semantics
    assert rows["c"].d == 2.5


def test_short_rows_pad_null(spark, tmp_path):
    body = (
        STD_HEADER
        + "#fields\tid\tx\ty\n#types\tstring\tcount\tstring\n"
        + "a\t1\tfoo\n"
        + "b\t2\n"        # missing trailing field
        + "c\n"           # only first field
    )
    p = write_log(tmp_path / "short.log", body)
    rows = {r.id: r for r in read_zeek(spark, p, inet=False).collect()}
    assert rows["b"].x == 2 and rows["b"].y is None
    assert rows["c"].x is None and rows["c"].y is None


def test_crlf_and_hash_mid_line(spark, tmp_path):
    body = (
        STD_HEADER
        + "#fields\tid\tnote\n#types\tstring\tstring\n"
        + "a\thas#hash\r\n"   # '#' mid-line is data; CRLF tolerated
        + "b\tplain\r\n"
        + "#close\t2026-01-01-01-00-00\r\n"
    )
    p = write_log(tmp_path / "crlf.log", body)
    df = read_zeek(spark, p, inet=False)
    assert df.count() == 2
    assert df.filter(F.col("id") == "a").first().note == "has#hash"


def test_unknown_type_falls_back_to_string(spark, tmp_path):
    body = (
        STD_HEADER
        + "#fields\tid\tmystery\n#types\tstring\tfancy_new_type\n"
        + "a\twhatever\n"
    )
    p = write_log(tmp_path / "unk.log", body)
    df = read_zeek(spark, p, inet=False)
    assert df.schema["mystery"].dataType == T.StringType()
    assert df.first().mystery == "whatever"


def test_list_element_markers_null(spark, tmp_path):
    body = (
        STD_HEADER
        + "#fields\tid\tvals\n#types\tstring\tvector[string]\n"
        + "a\tx,-,y,(empty)\n"
    )
    p = write_log(tmp_path / "lists.log", body)
    v = read_zeek(spark, p, inet=False).first().vals
    assert v == ["x", None, "y", None]


def test_gzip_same_as_plain(spark, tmp_path):
    body = (
        STD_HEADER
        + "#fields\tid\tn\n#types\tstring\tcount\n"
        + "a\t1\nb\t2\n"
    )
    p1 = write_log(tmp_path / "p.log", body)
    p2 = write_log(tmp_path / "p2.log.gz", body, compress=True)
    d1 = read_zeek(spark, p1, inet=False).orderBy("id").collect()
    d2 = read_zeek(spark, p2, inet=False).orderBy("id").collect()
    assert d1 == d2


def test_time_truncation_matches_reference(spark, tmp_path):
    # reference: static_cast<int64_t>(sec * 1e6) — truncation not rounding
    body = (
        STD_HEADER
        + "#fields\tid\tts\n#types\tstring\ttime\n"
        + "a\t1768540789.9999999\n"    # would round up; must truncate
    )
    p = write_log(tmp_path / "trunc.log", body)
    ts = read_zeek(spark, p, inet=False).first().ts
    micros = int(ts.timestamp() * 1e6)
    # python float(1768540789.9999999)*1e6 truncated
    assert micros == int(1768540789.9999999 * 1e6)


def test_count_decimal_uint64_fidelity(spark, tmp_path):
    import decimal

    big = 2**63 + 12345  # overflows int64, fits uint64
    body = (
        STD_HEADER
        + "#fields\tid\tn\n#types\tstring\tcount\n"
        + f"a\t{big}\nb\t7\n"
    )
    p = write_log(tmp_path / "big.log", body)
    # default LongType: overflow -> NULL (documented caveat)
    rows = {r.id: r.n for r in read_zeek(spark, p, inet=False).collect()}
    assert rows["a"] is None and rows["b"] == 7
    # count_decimal: full fidelity
    df = read_zeek(spark, p, inet=False, count_decimal=True)
    assert df.schema["n"].dataType == T.DecimalType(20, 0)
    rows = {r.id: r.n for r in df.collect()}
    assert rows["a"] == decimal.Decimal(big) and rows["b"] == 7


def test_large_plaintext_log_splits_into_tasks(spark, tmp_path):
    # plain-text Zeek logs are byte-range splittable — at 100 TB one big
    # uncompressed log still parallelizes (the reference's unit is the
    # whole file).  Generate ~8 MB, read with a small partition size,
    # verify >1 input partition and exact row count + sums.
    n = 120_000
    lines = [STD_HEADER + "#fields\tid\tn\tw\n#types\tcount\tcount\tstring\n"]
    lines.extend(f"{i}\t{i % 97}\tword{i % 13}\n" for i in range(n))
    p = tmp_path / "big.log"
    p.write_text("".join(lines))
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(1024 * 1024))
        df = read_zeek(spark, str(p), inet=False)
        assert df.rdd.getNumPartitions() > 1
        agg = df.agg(
            F.count("*").alias("c"), F.sum("n").alias("s")
        ).first()
        assert agg.c == n
        assert agg.s == sum(i % 97 for i in range(n))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


# ---------------------------------------------------------------------------
# Bare-'' cell semantics: unified as NULL across all three scan paths
# (composed CSV, Python DataSource, Structured Streaming).  Real Zeek
# output writes the (empty)/unset markers, never zero-length cells, so
# this is engine-defined behavior for synthetic input only — the three
# paths must simply agree (VERDICT r2 item 9).

EMPTY_CELL_BODY = (
    STD_HEADER
    + "#fields\tid\ta\tn\tv\n#types\tstring\tstring\tcount\tvector[string]\n"
    + "r1\t\t\t\n"            # every cell zero-length
    + "r2\tmid\t7\tx,y\n"     # normal row
    + "r3\t\t3\tz\n"          # leading empty
    + "r4\tend\t9\t\n"        # trailing empty
)


def _empty_cell_expect():
    return {
        "r1": (None, None, None),
        "r2": ("mid", 7, ["x", "y"]),
        "r3": (None, 3, ["z"]),
        "r4": ("end", 9, None),
    }


def test_bare_empty_cell_composed(spark, tmp_path):
    p = write_log(tmp_path / "empty.log", EMPTY_CELL_BODY)
    rows = {r.id: (r.a, r.n, r.v) for r in read_zeek(spark, p, inet=False).collect()}
    assert rows == _empty_cell_expect()


def test_bare_empty_cell_datasource(spark, tmp_path):
    from zeek_duckdb_spark.sources.datasource import register_zeek_datasource

    register_zeek_datasource(spark)
    p = write_log(tmp_path / "empty_ds.log", EMPTY_CELL_BODY)
    df = spark.read.format("zeek").option("inet", "false").load(p)
    rows = {r.id: (r.a, r.n, r.v) for r in df.collect()}
    assert rows == _empty_cell_expect()


def test_bare_empty_cell_stream(spark, tmp_path):
    from zeek_duckdb_spark.streaming.zeek_stream import read_zeek_stream

    d = tmp_path / "empty_stream"
    d.mkdir()
    write_log(d / "a.log", EMPTY_CELL_BODY)
    stream = read_zeek_stream(spark, str(d), inet=False)
    q = (
        stream.writeStream.format("memory")
        .queryName("empty_cells")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r.id: (r.a, r.n, r.v)
        for r in spark.sql("SELECT * FROM empty_cells").collect()
    }
    assert rows == _empty_cell_expect()


def test_valueless_fields_directive_errors(spark, tmp_path):
    from zeek_duckdb_spark.header import ZeekHeaderError, parse_header

    # "#fields" with no values is the same error as a missing directive
    # (ref src/zeek_reader.cpp:107-115 checks the parsed lists)
    body = STD_HEADER + "#fields\n#types\tstring\n" + "a\n"
    p = write_log(tmp_path / "nofields.log", body)
    with pytest.raises(ZeekHeaderError, match="#fields"):
        parse_header(p)

    body2 = STD_HEADER + "#fields\tid\n#types\n" + "a\n"
    p2 = write_log(tmp_path / "notypes.log", body2)
    with pytest.raises(ZeekHeaderError, match="#types"):
        parse_header(p2)
