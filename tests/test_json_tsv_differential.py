"""Differential parity between the TSV reader (read_zeek) and the JSON
reader (read_zeek_json): the SAME logical Zeek records rendered in both
formats must parse to identical typed values.  Randomized over schemas
and values — catches semantic drift between the two typed-cast
pipelines the way the composed-vs-datasource fuzz does for the two TSV
paths.

Value generation starts from DECIMAL STRINGS (for time/interval/double)
so both formats carry the exact same IEEE double: the TSV cell is the
string, the JSON number is ``float(string)`` (json emits the shortest
round-tripping repr), and both sides parse to the same double before
the µs truncation."""

import json
import random

import pytest

from zeek_duckdb_spark import read_zeek, read_zeek_json

TYPES = [
    "string", "addr", "enum", "count", "int", "port", "double", "bool",
    "time", "interval", "vector[string]", "vector[count]", "set[string]",
]

UNSET = object()


def gen_value(rng, zt):
    """One logical value: (tsv_cell, json_value).  UNSET -> ('-', omit)."""
    if rng.random() < 0.15:
        return UNSET
    if zt in ("string", "addr", "enum"):
        v = rng.choice(["abc", "10.0.0.1", "hello world", "x_y", "fe80::1"])
        return (v, v)
    if zt == "count":
        n = rng.randint(-5, 2**40)          # negatives -> NULL both sides
        return (str(n), n)
    if zt == "int":
        n = rng.randint(-(2**40), 2**40)
        return (str(n), n)
    if zt == "port":
        n = rng.randint(-10, 70000)         # out-of-range -> NULL both sides
        return (str(n), n)
    if zt == "double":
        s = f"{rng.randint(-10**6, 10**6)}.{rng.randint(0, 999999):06d}"
        return (s, float(s))
    if zt in ("time", "interval"):
        s = f"{rng.randint(0, 2 * 10**9)}.{rng.randint(0, 999999):06d}"
        return (s, float(s))
    if zt == "bool":
        b = rng.choice([True, False])
        return ("T" if b else "F", b)
    if zt.startswith(("vector[", "set[")):
        # no empty lists: TSV "(empty)" reads NULL (reference semantics,
        # zeek.py _marker_to_null) while JSON [] is a real empty array —
        # the formats genuinely differ there (covered in test_zeek_json)
        inner = zt[zt.index("[") + 1 : -1]
        n = rng.randint(1, 4)
        cells, vals = [], []
        for _ in range(n):
            e = gen_value(rng, inner)
            if e is UNSET:
                cells.append("-")
                vals.append(None)
            else:
                c, v = e
                cells.append(str(c).replace(",", ""))
                vals.append(
                    v if not isinstance(v, str) else v.replace(",", "")
                )
        cell = ",".join(cells)
        if cell == "-":
            # a one-element [null] list renders as "-" in TSV, which is
            # indistinguishable from a whole-cell unset — the TSV format
            # cannot represent [null]; treat as unset in both formats
            return UNSET
        return (cell, vals)
    raise AssertionError(zt)


def render_files(rng, tmp_path, seed, n_rows=30):
    n_cols = rng.randint(2, 7)
    types = {f"c{i}": rng.choice(TYPES) for i in range(n_cols)}
    rows = []
    for _ in range(n_rows):
        rows.append({name: gen_value(rng, zt) for name, zt in types.items()})
    tsv = tmp_path / f"fuzz_{seed}.log"
    lines = [
        "#separator \\x09", "#set_separator\t,", "#empty_field\t(empty)",
        "#unset_field\t-", "#path\tfuzz",
        "#fields\t" + "\t".join(types),
        "#types\t" + "\t".join(types.values()),
    ]
    for r in rows:
        lines.append(
            "\t".join("-" if r[n] is UNSET else str(r[n][0]) for n in types)
        )
    tsv.write_text("\n".join(lines) + "\n")
    js = tmp_path / f"fuzz_{seed}.json"
    with open(js, "w") as f:
        for r in rows:
            obj = {n: r[n][1] for n in types if r[n] is not UNSET}
            f.write(json.dumps(obj) + "\n")
    return str(tsv), str(js), types


def norm(df, cols):
    out = []
    for r in df.select(*cols).collect():
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


@pytest.mark.parametrize("seed", range(5))
def test_tsv_and_json_readers_agree(spark, tmp_path, seed):
    rng = random.Random(1000 + seed)
    tsv, js, types = render_files(rng, tmp_path, seed)
    t = read_zeek(spark, tsv)
    j = read_zeek_json(spark, js, types=types)
    assert dict(t.dtypes) == dict(j.dtypes), "schemas diverge"
    cols = list(types)
    assert norm(t, cols) == norm(j, cols)
