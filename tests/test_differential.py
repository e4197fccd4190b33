"""Differential parity: the composed CSV reader (sources/zeek.py) and
the Python DataSource (sources/datasource.py) are two independent
implementations of the same Zeek semantics — on randomized generated
files they must produce identical results.  Catches semantics drift
that example-based tests miss."""

import random

import pytest

from pyspark.sql import functions as F

from zeek_duckdb_spark import read_zeek
from zeek_duckdb_spark.sources.datasource import register_zeek_datasource

TYPES = ["string", "count", "int", "port", "double", "bool", "time",
         "interval", "addr", "vector[string]", "vector[count]", "set[string]"]


def gen_cell(rng, zt):
    r = rng.random()
    if r < 0.12:
        return "-"           # unset marker
    if r < 0.18:
        return "(empty)"     # empty marker
    if r < 0.23:
        return rng.choice(["garbage", "x!y", ""])  # malformed
    if zt == "string" or zt == "addr":
        return rng.choice(["abc", "10.0.0.1", "hello world? no - tabs", "#notcomment", "a,b"])
    if zt == "count":
        return str(rng.randint(0, 2**40))
    if zt == "int":
        return str(rng.randint(-2**40, 2**40))
    if zt == "port":
        return str(rng.randint(-10, 70000))
    if zt == "double":
        return f"{rng.uniform(-1e6, 1e6):.6f}"
    if zt == "bool":
        return rng.choice(["T", "F", "true", "false", "weird"])
    if zt in ("time", "interval"):
        return f"{rng.uniform(0, 2e9):.6f}"
    if zt.startswith(("vector[", "set[")):
        inner = zt[zt.index("[") + 1 : -1]
        n = rng.randint(1, 4)
        return ",".join(gen_cell(rng, inner).replace(",", "") for _ in range(n))
    return "?"


def gen_file(rng, path, n_rows=25):
    n_cols = rng.randint(2, 8)
    types = [rng.choice(TYPES) for _ in range(n_cols)]
    names = [f"c{i}" for i in range(n_cols)]
    lines = [
        "#separator \\x09",
        "#set_separator\t,",
        "#empty_field\t(empty)",
        "#unset_field\t-",
        "#path\tfuzz",
        "#open\t2026-01-01-00-00-00",
        "#fields\t" + "\t".join(names),
        "#types\t" + "\t".join(types),
    ]
    for _ in range(n_rows):
        cells = [gen_cell(rng, t).replace("\t", " ") for t in types]
        lines.append("\t".join(cells))
    lines.append("#close\t2026-01-01-01-00-00")
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def norm_rows(df):
    out = []
    for r in df.collect():
        row = []
        for v in r:
            if isinstance(v, float):
                row.append(repr(round(v, 9)))
            elif isinstance(v, list):
                row.append(str(["<n>" if e is None else str(e) for e in v]))
            else:
                row.append("<n>" if v is None else str(v))
        out.append(tuple(row))
    return sorted(out)


@pytest.mark.parametrize("seed", range(8))
def test_composed_vs_datasource_agree(spark, tmp_path, seed):
    register_zeek_datasource(spark)
    rng = random.Random(seed)
    p = gen_file(rng, tmp_path / f"fuzz_{seed}.log")
    a = read_zeek(spark, p, inet=False)
    b = spark.read.format("zeek").option("inet", "false").load(p)
    assert a.schema == b.schema, f"schema mismatch seed={seed}"
    assert norm_rows(a) == norm_rows(b), f"row mismatch seed={seed}"
