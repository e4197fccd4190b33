"""Spark 4 Python Data Source for Zeek logs: ``spark.read.format("zeek")``.

This is SURVEY.md §7.1 design (b) — the Spark analogue of the
reference's extension registration (``LoadInternal`` registering the
table function, src/zeek_extension.cpp:31-36):

    spark.dataSource.register(ZeekDataSource)
    df = (spark.read.format("zeek")
          .option("union_by_name", "true")
          .load("logs/*.log.gz"))

The composed-reader ``read_zeek`` (sources/zeek.py) is the primary
engine — JVM-speed parsing, codegen, pushdown.  This DataSource is the
structural mirror of the reference: one InputPartition per file
(= the reference's per-thread file claiming, src/zeek_scanner.cpp:245-330),
schema resolved at "bind" time on the driver, per-file validation
surfaced at scan time, and Python-side decompression — which also makes
it the zstd path when the ``zstandard`` module is available (Hadoop
native zstd isn't in this container).

Both paths share header.py for schema resolution, so option semantics
and error strings are identical by construction.
"""

from __future__ import annotations

import datetime

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql import types as T

from zeek_duckdb_spark.header import (
    ZeekHeader,
    ZeekHeaderError,
    glob_zeek_files,
    open_zeek_text,
    parse_header,
    resolve_union_schema,
    same_schema,
    zeek_type_to_spark,
)

__all__ = ["ZeekDataSource", "register_zeek_datasource"]

UTC = datetime.timezone.utc


def _opt_bool(options: dict, key: str, default: bool) -> bool:
    v = options.get(key)
    if v is None:
        return default
    return str(v).strip().lower() in ("true", "1", "yes")


class ZeekFilePartition(InputPartition):
    def __init__(self, path: str, field_map: list[int] | None):
        self.path = path
        # union mode: output column -> field index in this file (-1 = absent),
        # the reference's per-file inverse mapping (src/zeek_scanner.cpp:580-589)
        self.field_map = field_map


class ZeekDataSource(DataSource):
    """read_zeek as a first-class Spark data source (batch)."""

    @classmethod
    def name(cls) -> str:
        return "zeek"

    def _bind(self):
        """Reference 'bind' phase: glob, parse headers, resolve schema."""
        if getattr(self, "_bound", None) is not None:
            return self._bound
        path = self.options.get("path")
        if not path:
            raise ZeekHeaderError("zeek datasource requires a path (load(path))")
        ignore = _opt_bool(self.options, "ignore_file_errors", False)
        union = _opt_bool(self.options, "union_by_name", False)
        files = glob_zeek_files(path)
        headers: list[ZeekHeader] = []
        for f in files:
            try:
                headers.append(parse_header(f))
            except Exception:
                if ignore:
                    continue
                raise
        if not headers:
            raise ZeekHeaderError(f"No valid Zeek log files found in pattern '{path}'")
        if union:
            names, types = resolve_union_schema(headers)
        else:
            first = headers[0]
            kept = [first]
            for h in headers[1:]:
                reason = same_schema(first, h)
                if reason is None:
                    kept.append(h)
                elif not ignore:
                    raise ZeekHeaderError(
                        f"Schema mismatch between '{first.source_file}' and "
                        f"'{h.source_file}': {reason}"
                    )
            headers = kept
            names, types = list(first.fields), list(first.types)
        self._bound = (headers, names, types, union)
        return self._bound

    def schema(self) -> T.StructType:
        headers, names, types, _ = self._bind()
        replace = _opt_bool(self.options, "replace_periods", True)
        out_names = [n.replace(".", "_") for n in names] if replace else names
        fields = [
            T.StructField(n, zeek_type_to_spark(t), True)
            for n, t in zip(out_names, types)
        ]
        if _opt_bool(self.options, "filename", False):
            fields.append(T.StructField("filename", T.StringType(), True))
        return T.StructType(fields)

    def reader(self, schema: T.StructType) -> "ZeekReader":
        headers, names, types, union = self._bind()
        replace = _opt_bool(self.options, "replace_periods", True)
        out_names = [n.replace(".", "_") for n in names] if replace else list(names)
        cls = ZeekReader
        try:
            from pyspark.sql import SparkSession

            sess = SparkSession.getActiveSession()
            if sess is not None and str(
                sess.conf.get("spark.sql.python.filterPushdown.enabled", "false")
            ).lower() == "true":
                cls = ZeekPushdownReader
        except Exception:
            pass
        return cls(
            headers,
            names,
            types,
            union,
            with_filename=_opt_bool(self.options, "filename", False),
            ignore_file_errors=_opt_bool(self.options, "ignore_file_errors", False),
            out_names=out_names,
        )


def _convert_scalar(v: str, zt: str, hdr: ZeekHeader):
    """Python mirror of the typed parse semantics (SURVEY.md §1.4/§1.5)."""
    if v == hdr.unset_field or v == hdr.empty_field:
        return None
    if zt == "bool":
        return v in ("T", "true")
    try:
        if zt == "time":
            return datetime.datetime.fromtimestamp(int(float(v) * 1e6) / 1e6, UTC)
        if zt == "interval":
            return datetime.timedelta(microseconds=int(float(v) * 1e6))
        if zt == "count":
            n = int(v)
            return n if 0 <= n < (1 << 63) else None
        if zt == "int":
            return int(v)
        if zt == "port":
            n = int(v)
            return n if 0 <= n <= 65535 else None
        if zt == "double":
            return float(v)
    except (ValueError, OverflowError, OSError):
        return None
    return v  # string/enum/addr/subnet/unknown


def _convert(v: str | None, zt: str, hdr: ZeekHeader):
    if v is None:
        return None
    if v == "":
        # whole zero-length cell -> NULL: engine-defined behavior shared
        # with the composed reader (Spark CSV cannot distinguish an empty
        # unquoted token from a missing trailing column; real Zeek output
        # always writes the (empty)/unset markers, never bare empties).
        # Empty *elements* inside arrays keep reference semantics — see
        # _convert_scalar via the vector branch below.
        return None
    if zt.startswith("vector[") or zt.startswith("set["):
        if v == hdr.unset_field or v == hdr.empty_field:
            return None
        inner = zt[zt.index("[") + 1 : -1] if zt.endswith("]") else "string"
        return [_convert_scalar(e, inner, hdr) for e in v.split(hdr.set_separator)]
    return _convert_scalar(v, zt, hdr)


# filter pushdown gating mirrors the reference's supports_pushdown_type
# (src/zeek_scanner.cpp:114-132): only cheap scalar types; LIST and
# addr/subnet (INET) are declined so Spark re-applies them post-scan.
# time/interval are also declined here for timezone-value safety.
_PUSHABLE_ZEEK_TYPES = ("string", "enum", "count", "int", "port", "double", "bool")
_SUPPORTED_FILTERS = (
    EqualTo, In, IsNull, IsNotNull,
    GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
)


def _eval_filter(f: Filter, val):
    """Row-level filter evaluation with the reference's NULL rule: a
    NULL value fails every comparison (src/zeek_scanner.cpp:202-220)."""
    if isinstance(f, IsNull):
        return val is None
    if isinstance(f, IsNotNull):
        return val is not None
    if val is None:
        return False
    if isinstance(f, EqualTo):
        return val == f.value
    if isinstance(f, In):
        return val in f.value
    if isinstance(f, GreaterThan):
        return val > f.value
    if isinstance(f, GreaterThanOrEqual):
        return val >= f.value
    if isinstance(f, LessThan):
        return val < f.value
    if isinstance(f, LessThanOrEqual):
        return val <= f.value
    return True  # unknown -> pass through, Spark re-filters (ref :239-242)


class ZeekReader(DataSourceReader):
    def __init__(self, headers, names, types, union, with_filename,
                 ignore_file_errors, out_names=None):
        self.headers = headers
        self.names = names
        self.types = types
        self.union = union
        self.with_filename = with_filename
        self.ignore_file_errors = ignore_file_errors
        self.out_names = out_names or list(names)
        self.pushed: list[tuple[int, Filter]] = []

    def partitions(self):
        parts = []
        for h in self.headers:
            if self.union:
                idx = {f: i for i, f in enumerate(h.fields)}
                fmap = [idx.get(f, -1) for f in self.names]
            else:
                fmap = None
            parts.append(ZeekFilePartition(h.source_file, fmap))
        return parts

    def read(self, partition: ZeekFilePartition):
        # header re-parse per partition = the reference's scan-time
        # re-validation (src/zeek_scanner.cpp:270-303)
        try:
            hdr = parse_header(partition.path)
        except Exception:
            if self.ignore_file_errors:
                return
            raise
        ncols = len(self.names)
        fmap = partition.field_map
        try:
            with open_zeek_text(partition.path) as fh:
                for raw in fh:
                    line = raw.rstrip("\r\n")
                    if not line or line.startswith("#"):
                        continue
                    cells = line.split(hdr.separator)

                    def cell_value(out_i):
                        src_i = fmap[out_i] if fmap is not None else out_i
                        if src_i < 0 or src_i >= len(cells):
                            return None
                        return _convert(cells[src_i], self.types[out_i], hdr)

                    # pushed filters evaluate before the full row is
                    # converted — the reference's pre-parse row skip
                    # (src/zeek_scanner.cpp:720-771)
                    if self.pushed and not all(
                        _eval_filter(f, cell_value(i)) for i, f in self.pushed
                    ):
                        continue
                    row = [cell_value(out_i) for out_i in range(ncols)]
                    if self.with_filename:
                        row.append(partition.path)
                    yield tuple(row)
        except Exception:
            if self.ignore_file_errors:
                return
            raise


class ZeekPushdownReader(ZeekReader):
    """ZeekReader + Spark 4.1 Python filter pushdown.  Kept as a
    subclass because Spark refuses a reader that *implements*
    pushFilters when spark.sql.python.filterPushdown.enabled is false —
    the plain ZeekReader serves that case."""

    def pushFilters(self, filters):
        """Accept simple comparison filters on pushable scalar columns;
        everything else is returned for Spark to apply post-scan
        (the reference's own fallback contract,
        src/zeek_scanner.cpp:239-242)."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            ok = (
                isinstance(f, _SUPPORTED_FILTERS)
                and attr is not None
                and len(attr) == 1
                and attr[0] in self.out_names
                and self.types[self.out_names.index(attr[0])] in _PUSHABLE_ZEEK_TYPES
            )
            if ok:
                self.pushed.append((self.out_names.index(attr[0]), f))
            else:
                yield f


def register_zeek_datasource(spark) -> None:
    # enable Python-DS filter pushdown for this session (runtime conf);
    # reader() still falls back to the no-pushdown class if a foreign
    # session has it disabled
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    spark.dataSource.register(ZeekDataSource)
