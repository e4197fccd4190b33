"""Property-based tests (hypothesis) for the pure-Python header layer:
any header we can write, we can parse back exactly."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from zeek_duckdb_spark.header import (
    parse_header,
    same_schema,
    unescape_separator,
    zeek_type_to_spark,
)

name_st = st.text(alphabet=string.ascii_letters + string.digits + "._", min_size=1, max_size=12)
ztype_st = st.sampled_from(
    ["string", "count", "int", "port", "double", "bool", "time", "interval",
     "addr", "subnet", "enum", "vector[string]", "vector[count]", "set[string]",
     "vector[interval]"]
)
sep_st = st.sampled_from(["\t", "|", ";", ","])
marker_st = st.text(alphabet=string.ascii_letters + "()-_", min_size=1, max_size=8)


@settings(max_examples=200, deadline=None)
@given(
    sep=sep_st,
    set_sep=st.sampled_from([",", ";", ":"]),
    unset=marker_st,
    empty=marker_st,
    cols=st.lists(st.tuples(name_st, ztype_st), min_size=1, max_size=12,
                  unique_by=lambda t: t[0]),
)
def test_header_roundtrip(tmp_path_factory, sep, set_sep, unset, empty, cols):
    if sep == set_sep or sep in unset or sep in empty:
        return  # unwritable header combination
    d = tmp_path_factory.mktemp("hdr")
    names = [c[0] for c in cols]
    types = [c[1] for c in cols]
    esc = "\\x%02x" % ord(sep)
    body = (
        f"#separator {esc}\n"
        f"#set_separator{sep}{set_sep}\n"
        f"#empty_field{sep}{empty}\n"
        f"#unset_field{sep}{unset}\n"
        f"#path{sep}prop\n"
        f"#open{sep}now\n"
        f"#fields{sep}" + sep.join(names) + "\n"
        f"#types{sep}" + sep.join(types) + "\n"
    )
    p = d / "prop.log"
    p.write_text(body)
    h = parse_header(str(p))
    assert h.separator == sep
    assert h.set_separator == set_sep
    assert h.unset_field == unset
    assert h.empty_field == empty
    assert h.fields == names
    assert h.types == types
    assert same_schema(h, h) is None
    for t in types:
        zeek_type_to_spark(t)  # never raises


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=12))
def test_unescape_never_raises(s):
    out = unescape_separator(s)
    assert isinstance(out, str) and len(out) == 1


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=255))
def test_unescape_hex(b):
    assert unescape_separator("\\x%02x" % b) == chr(b)
