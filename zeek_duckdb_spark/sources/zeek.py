"""read_zeek: Zeek logs -> typed Spark DataFrame (the engine's source op).

Design (SURVEY.md §7.1 option (a), "composed built-in readers"):
driver-side header parse + schema resolution (the reference also binds
schemas eagerly on one thread, src/zeek_scanner.cpp:439-609), then ONE
``spark.read.csv`` per schema-group with an all-string schema, followed
by a declarative cast pipeline.  Everything after header parse is
DataFrame expressions, so Catalyst keeps column pruning (the CSV parser
only tokenizes projected fields), predicate pushdown on passthrough
string columns, and whole-stage codegen for the casts — no Python
executes per row.  Scale notes:

- one Spark task per (non-splittable) gzip file == the reference's
  per-file parallelism unit (src/zeek_scanner.cpp:245-330); plain-text
  logs additionally split by ``maxPartitionBytes``, which the reference
  cannot do.
- schema work is O(#files) driver-side metadata, never data.
- no shuffle anywhere in the scan; ``union_by_name`` is a narrow
  unionByName of per-group scans.

Behavioral parity targets are cited per function against
/root/reference (see SURVEY.md §1 for chapter and verse).
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zeek_duckdb_spark.header import (
    ZeekHeader,
    ZeekHeaderError,
    glob_zeek_files,
    parse_header,
    resolve_union_schema,
    same_schema,
    zeek_type_to_spark,
)

__all__ = ["read_zeek"]


def _qcol(name: str) -> Column:
    """Column ref tolerant of dots in the name (replace_periods=False)."""
    return F.col("`" + name.replace("`", "``") + "`")


def _java_rx_quote(s: str) -> str:
    """Quote a literal for Java regex (F.split takes a regex pattern)."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _marker_to_null(col: Column, hdr: ZeekHeader) -> Column:
    """unset_field or empty_field marker -> SQL NULL, for every type
    including lists (ref src/zeek_scanner.cpp:798-801; NULL not
    empty-array for '(empty)' on a vector column,
    test/sql/zeek.test:191-206)."""
    return F.when(
        (col == F.lit(hdr.unset_field)) | (col == F.lit(hdr.empty_field)),
        F.lit(None),
    ).otherwise(col)


def _cast_scalar(col: Column, zeek_type: str, count_decimal: bool = False) -> Column:
    """Text -> typed value with the reference's parse semantics
    (ref src/zeek_scanner.cpp:806-884 and :23-31):

    - time/interval: epoch-seconds double * 1e6 truncated to int64 µs
    - port: uint16 range check, out-of-range -> NULL (TryCast failure)
    - count: uint64 in the reference; negative -> NULL here, and values
      in [2^63, 2^64) overflow LongType -> NULL (documented caveat,
      SURVEY.md §1.4 — unrealistic for Zeek counters)
    - bool: 'T'/'true' -> true, anything else -> false, never NULL on
      bad input (ref src/zeek_scanner.cpp:838-841)
    - parse failure on numerics/time/interval -> NULL
    """
    # try_cast throughout: Spark 4 runs in ANSI mode where a plain cast
    # THROWS on malformed text; the reference uses TryCast semantics
    # (bad input -> NULL, src/zeek_scanner.cpp:811-818)
    if zeek_type == "time":
        return F.timestamp_micros(
            (col.try_cast("double") * F.lit(1e6)).try_cast("long")
        )
    if zeek_type == "interval":
        micros = (col.try_cast("double") * F.lit(1e6)).try_cast("long")
        secs = micros.cast("decimal(20,0)") / F.lit(1000000)
        return F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), secs)
    if zeek_type == "port":
        p = col.try_cast("int")
        return F.when(p.between(0, 65535), p)
    if zeek_type == "count":
        if count_decimal:
            # full-uint64 fidelity: DECIMAL(20,0) holds [0, 2^64)
            p = col.try_cast("decimal(20,0)")
            return F.when(p >= 0, p)
        p = col.try_cast("long")
        return F.when(p >= 0, p)
    if zeek_type == "int":
        return col.try_cast("long")
    if zeek_type == "bool":
        return col.isin("T", "true")
    if zeek_type == "double":
        return col.try_cast("double")
    # string / enum / addr / subnet / unknown -> passthrough text
    return col


def _cast_field(raw: Column, zeek_type: str, hdr: ZeekHeader, inet_canon,
                count_decimal: bool = False) -> Column:
    """Full field pipeline: marker->NULL, then list split + element casts
    for vector[...]/set[...] (ref src/zeek_scanner.cpp:332-437 — sets are
    read as lists, order preserved, no dedup), else scalar cast."""
    zt = zeek_type.strip()
    cell = _marker_to_null(raw, hdr)
    if zt.startswith("vector[") or zt.startswith("set["):
        if zt.endswith("]"):
            inner = zt[zt.index("[") + 1 : -1]
        else:
            inner = "string"  # malformed bracket -> string elements
        elems = F.split(cell, _java_rx_quote(hdr.set_separator))

        def elem(e: Column) -> Column:
            e2 = _marker_to_null(e, hdr)  # NULL elements inside arrays
            if inner == "bool":
                # element markers NULL first, then no-NULL bool rule
                return F.when(e2.isNull(), F.lit(None)).otherwise(
                    _cast_scalar(e2, "bool")
                )
            c = _cast_scalar(e2, inner, count_decimal)
            return _canon_maybe(c, inner, inet_canon)

        return F.transform(elems, elem)
    if zt == "bool":
        return F.when(cell.isNull(), F.lit(None)).otherwise(_cast_scalar(cell, "bool"))
    return _canon_maybe(_cast_scalar(cell, zt, count_decimal), zt, inet_canon)


def _canon_maybe(col: Column, zeek_type: str, inet_canon) -> Column:
    if inet_canon is not None and zeek_type in ("addr", "subnet"):
        return inet_canon(col)
    return col


def _clean_file_path(col: Column) -> Column:
    """input_file_name() yields a file: URI; normalize to a plain path."""
    return F.regexp_replace(col, r"^file:(//)?", "")


# Past this many files the abs->as-given map would bloat the plan with a
# literal per file; fall back to the canonical absolute path (on a real
# distributed filesystem the two coincide anyway — relative paths only
# arise from local-filesystem globs).
_FILENAME_MAP_MAX_FILES = 10_000


def _as_given_file_path(col: Column, files: list[str]) -> Column:
    """Echo the path in the form the USER supplied (relative stays
    relative), matching the reference (src/zeek_scanner.cpp:778-781):
    a driver-built literal map from canonical absolute path back to the
    glob's as-given form, applied to input_file_name().  Identity-skip
    when every glob match is already absolute."""
    cleaned = _clean_file_path(col)
    pairs = [(os.path.abspath(f), f) for f in files]
    if len(files) > _FILENAME_MAP_MAX_FILES or all(a == g for a, g in pairs):
        return cleaned
    m = F.create_map(*[F.lit(x) for pair in pairs for x in pair])
    return F.coalesce(m.getItem(cleaned), cleaned)


def _raw_schema(names: list[str]) -> T.StructType:
    return T.StructType([T.StructField(n, T.StringType(), True) for n in names])


def _read_group(
    spark: SparkSession,
    files: list[str],
    hdr: ZeekHeader,
    col_names: list[str],
) -> DataFrame:
    """One CSV scan over files sharing a schema.  quote/escape are
    disabled (\\u0000) because Zeek never quotes or escapes fields —
    a '"' in data is a literal (ref tokenizer src/zeek_scanner.cpp:79-89);
    '#' comment handling matches the reference's line-start-only skip
    (src/zeek_scanner.cpp:703-705)."""
    return (
        spark.read.schema(_raw_schema(col_names))
        .options(
            sep=hdr.separator,
            comment="#",
            quote="\u0000",
            escape="\u0000",
            mode="PERMISSIVE",
            header=False,
            # NOTE: univocity returns null for any zero-length unquoted
            # token before nullValue comparison, so a bare '' cell is NULL
            # here for every type -- an engine-defined unification shared
            # by all three scan paths (DS, streaming).  The reference
            # reads '' as empty string / empty list
            # (src/zeek_scanner.cpp:338-342), but real Zeek output always
            # writes the (empty)/unset markers, never bare empties.
        )
        # absolutize for the JVM: Spark resolves relative paths against
        # the JVM's CWD, which need not match the Python driver's (the
        # as-given form is still echoed by the filename column)
        .csv([os.path.abspath(f) for f in files])
    )


def read_zeek(
    spark: SparkSession,
    path: str,
    *,
    inet: bool = True,
    filename: bool = False,
    replace_periods: bool = True,
    union_by_name: bool = False,
    ignore_file_errors: bool = False,
    count_decimal: bool = False,
) -> DataFrame:
    """Read Zeek log file(s) into a typed DataFrame.

    The Spark-native equivalent of the reference's
    ``read_zeek(path, ...)`` table function (src/zeek_scanner.cpp:913-925)
    with the same five named options and defaults
    (src/include/zeek_reader.hpp:76-85).

    - ``inet``: canonicalize addr/subnet text (IPv4+IPv6) so equality and
      the registered INET functions behave like a native INET type; when
      False, raw text passthrough (bit-compatible with the reference's
      ``inet=false``).
    - ``filename``: append the source path as a ``filename`` column.
    - ``replace_periods``: ``id.orig_h`` -> ``id_orig_h``.
    - ``union_by_name``: union schema across files by field name in
      first-encountered order; absent fields read NULL; type conflicts
      raise (ref src/zeek_scanner.cpp:506-589).
    - ``ignore_file_errors``: skip unreadable/unparseable files; if no
      file yields a schema, still raise (ref src/zeek_scanner.cpp:499-505).
    - ``count_decimal``: map Zeek ``count`` to DECIMAL(20,0) for full
      uint64 fidelity (values in [2^63, 2^64) overflow the default
      LongType to NULL; the reference's UBIGINT keeps them —
      SURVEY.md §1.4 caveat).
    """
    files = glob_zeek_files(path)

    headers: list[ZeekHeader] = []
    for f in files:
        try:
            headers.append(parse_header(f))
        except Exception:
            if ignore_file_errors:
                continue
            raise
    if not headers:
        raise ZeekHeaderError(
            f"No valid Zeek log files found in pattern '{path}'"
        )

    inet_canon = None
    if inet:
        from zeek_duckdb_spark.functions.inet import inet_canon_col

        inet_canon = inet_canon_col

    if union_by_name:
        df = _read_union(spark, headers, replace_periods, inet_canon, count_decimal)
    else:
        df = _read_strict(spark, headers, replace_periods, inet_canon,
                          ignore_file_errors, count_decimal)

    if filename:
        df = df.withColumn(
            "filename", _as_given_file_path(F.input_file_name(), files)
        )
    return df


def _read_strict(
    spark: SparkSession,
    headers: list[ZeekHeader],
    replace_periods: bool,
    inet_canon,
    ignore_file_errors: bool,
    count_decimal: bool = False,
) -> DataFrame:
    """Strict mode: schema = first file's header; every other file must
    match exactly (field names+order, types, separators, markers; #path
    and #open ignored — ref src/zeek_reader.cpp:165-205).  Mismatch
    raises an error naming both files and the first difference
    (ref src/zeek_scanner.cpp:296-303), or skips the file under
    ignore_file_errors."""
    first = headers[0]
    kept = [first]
    for h in headers[1:]:
        reason = same_schema(first, h)
        if reason is None:
            kept.append(h)
        elif ignore_file_errors:
            continue
        else:
            raise ZeekHeaderError(
                f"Schema mismatch between '{first.source_file}' and "
                f"'{h.source_file}': {reason}"
            )
    names = first.column_names(replace_periods)
    raw = _read_group(spark, [h.source_file for h in kept], first, names)
    return raw.select(*typed_columns(first, replace_periods, inet_canon, count_decimal))


def typed_columns(hdr: ZeekHeader, replace_periods: bool, inet_canon=None,
                  count_decimal: bool = False) -> list[Column]:
    """The typed cast pipeline for one header, as a select list over the
    all-string raw columns.  Shared by the batch reader and the
    Structured Streaming reader (streaming/zeek_stream.py)."""
    names = hdr.column_names(replace_periods)
    return [
        _cast_field(_qcol(n), zt, hdr, inet_canon, count_decimal).alias(n)
        for n, zt in zip(names, hdr.types)
    ]


def _read_union(
    spark: SparkSession,
    headers: list[ZeekHeader],
    replace_periods: bool,
    inet_canon,
    count_decimal: bool = False,
) -> DataFrame:
    """union_by_name mode: fields unioned by name in first-encountered
    order across the sorted file list; per-file absent fields -> NULL
    (ref src/zeek_scanner.cpp:506-589,789-794).  Files are grouped by
    identical schema so the plan is one CSV scan per distinct schema,
    narrow-unioned — no shuffle, no per-file DataFrames."""
    union_fields, union_types = resolve_union_schema(headers)
    out_names = (
        [f.replace(".", "_") for f in union_fields]
        if replace_periods
        else list(union_fields)
    )
    from pyspark.sql import types as _T

    def _sp_type(t):
        if count_decimal and t.strip() == "count":
            return _T.DecimalType(20, 0)
        return zeek_type_to_spark(t)

    spark_types = {f: _sp_type(t) for f, t in zip(union_fields, union_types)}

    groups: dict[tuple, list[ZeekHeader]] = {}
    for h in headers:
        groups.setdefault(h.schema_key(), []).append(h)

    parts: list[DataFrame] = []
    for hdrs in groups.values():
        g = hdrs[0]
        g_names = g.column_names(replace_periods)
        raw = _read_group(spark, [h.source_file for h in hdrs], g, g_names)
        have = dict(zip(g.fields, zip(g_names, g.types)))
        cols = []
        for f, zt, out in zip(union_fields, union_types, out_names):
            if f in have:
                src_name, src_zt = have[f]
                cols.append(
                    _cast_field(_qcol(src_name), src_zt, g, inet_canon,
                                count_decimal).alias(out)
                )
            else:
                cols.append(F.lit(None).cast(spark_types[f]).alias(out))
        parts.append(raw.select(*cols))
    return functools.reduce(lambda a, b: a.unionByName(b), parts)
