"""Zeek TSV log WRITER: the round-trip complement of read_zeek.

The reference is read-only (its export path is DuckDB's own COPY); a
Spark user additionally needs to LAND data in the Zeek wire format —
to feed downstream Zeek tooling, or to re-emit cleaned/filtered logs.
This writer produces files that the reference scanner (and our three
read paths) parse back to the same values:

- the 8 header directives with the reference's defaults
  (``\\x09`` separator, ``,`` set separator, ``-`` unset, ``(empty)``
  empty — src/zeek_scanner.cpp:120-152 wire constants);
- typed wire forms mirroring the READ parse semantics exactly
  (SURVEY.md §1.4/§1.5): time/interval as epoch/total seconds with 6
  fractional digits (µs-exact integer arithmetic, not float
  formatting), bool as ``T``/``F``, NULL as the unset marker, empty
  string/collection as the empty marker, vector/set joined on the set
  separator with per-element markers.

Scale shape: all row formatting is JVM expressions (one generated
``concat_ws`` projection — zero Python in the data path until the
final byte-copy); the sink itself is a Python DataSource writer that
streams each partition's already-formatted lines into its own
``part-NNNNN.log[.gz]`` file with the full header block — one file per
partition, the rotation-shaped layout the reference's multi-file scan
expects.  Task retries are safe: output is staged per attempt and
``os.replace``d over the deterministic final name (atomic on POSIX;
last successful attempt wins).

Caveat (inherent to the format): Zeek TSV has NO quoting or escaping
(SURVEY §1.4 tokenizer) — a value containing the separator or a
newline would corrupt the row.  ``on_unwritable='error'`` (default)
fails loudly at write time via a validating projection;
``'strip'`` replaces offending characters with a space.
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "write_zeek",
    "write_zeek_stream",
    "format_zeek_lines",
    "zeek_types_for_schema",
]

_UNSET = "-"
_EMPTY = "(empty)"
_SET_SEP = ","


def zeek_types_for_schema(
    schema: T.StructType, overrides: dict[str, str] | None = None
) -> list[str]:
    """Default Spark->Zeek type labels (the §1.3 mapping inverted),
    with per-column ``overrides`` for the labels that don't survive
    the round-trip through Spark's type system (count/port collapse
    to LongType; addr/subnet/enum read back as strings)."""
    overrides = overrides or {}
    out = []
    for f in schema.fields:
        if f.name in overrides:
            out.append(overrides[f.name])
            continue
        out.append(_default_ztype(f.dataType, f.name))
    return out


def _default_ztype(dt: T.DataType, name: str) -> str:
    if isinstance(dt, T.TimestampType):
        return "time"
    if isinstance(dt, T.DayTimeIntervalType):
        return "interval"
    if isinstance(dt, T.IntegerType):
        # IntegerType only arises from Zeek 'port' on the read side
        # ('int'/'count' are int64); label it back as port so the
        # round-trip schema is stable
        return "port"
    if isinstance(dt, (T.LongType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.DecimalType):
        return "count"  # count_decimal=True round-trip (DECIMAL(20,0))
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "double"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.DateType):
        # Zeek has no date type; land as ISO-8601 text (reads back as
        # a string column — lossy on type, exact on value)
        return "string"
    if isinstance(dt, T.ArrayType):
        return f"vector[{_default_ztype(dt.elementType, name)}]"
    raise ValueError(
        f"write_zeek: no Zeek wire form for column '{name}' of type {dt.simpleString()}"
    )


def _us_to_decimal_string(us: Column) -> Column:
    """Integer µs -> decimal-seconds string that parses BACK to the
    same µs under the read side's ``trunc(double(v) * 1e6)`` contract
    (A9 — the reference's own float-then-truncate parse,
    src/zeek_scanner.cpp:23-31).

    Plain 6-digit formatting is NOT enough: ~1.2 % of µs values sit
    where the nearest double to ``n/1e6`` lands just below ``n`` after
    the multiply, so truncation reads back ``n-1`` (measured over 2M
    random epochs).  For exactly those rows — predicted HERE with the
    same IEEE double arithmetic the parsers use — a half-µs guard
    digit ('5') is appended, centering the parsed value safely inside
    ``(n, n+1)``; every other row keeps the canonical 6-digit Zeek
    form.  Result: write->read is µs-exact for ALL values (fuzzed in
    tests/test_zeek_writer.py)."""
    sign = F.when(us < 0, F.lit("-")).otherwise(F.lit(""))
    a = F.abs(us)
    s6 = F.concat(
        sign,
        (a / F.lit(1_000_000)).cast("long").cast("string"),
        F.lit("."),
        F.lpad((a % F.lit(1_000_000)).cast("string"), 6, "0"),
    )
    parsed6 = (s6.cast("double") * F.lit(1_000_000.0)).cast("long")
    return F.when(parsed6 == us, s6).otherwise(F.concat(s6, F.lit("5")))


def _interval_us(col: Column) -> Column:
    """Total µs of a day-time interval, exact via component extracts
    (CAST(interval AS BIGINT) truncates to whole end-unit seconds)."""
    d = F.extract(F.lit("DAY"), col).cast("long")
    h = F.extract(F.lit("HOUR"), col).cast("long")
    m = F.extract(F.lit("MINUTE"), col).cast("long")
    s = F.extract(F.lit("SECOND"), col)  # decimal(8,6), µs-exact, signed
    return (
        (d * 86_400 + h * 3_600 + m * 60) * F.lit(1_000_000).cast("long")
        + (s * F.lit(1_000_000)).cast("long")
    )


def _scalar_wire(col: Column, dt: T.DataType, ztype: str) -> Column:
    base = ztype.split("[", 1)[0]
    if isinstance(dt, T.TimestampType):
        return _us_to_decimal_string(F.unix_micros(col))
    if isinstance(dt, T.DayTimeIntervalType):
        return _us_to_decimal_string(_interval_us(col))
    if isinstance(dt, T.BooleanType):
        # two guarded arms so NULL stays NULL (otherwise() would fold
        # NULL into 'F'); the unset marker lands via the outer coalesce
        return F.when(col, F.lit("T")).when(~col, F.lit("F"))
    if isinstance(dt, T.StringType):
        return F.when(col == "", F.lit(_EMPTY)).otherwise(col)
    if isinstance(dt, T.DateType):
        return col.cast("string")  # ISO-8601
    _ = base  # numeric/decimal: engine string form round-trips via cast
    return col.cast("string")


def _guard(cell: Column, bad_re: str, colname: str, on_unwritable: str) -> Column:
    """The format has no escaping: a value containing the row separator
    (or, inside a collection, the SET separator) would corrupt the row
    — fail loudly (default) or strip to a space BEFORE bytes land."""
    if on_unwritable == "strip":
        return F.regexp_replace(cell, F.lit(bad_re), F.lit(" "))
    return F.when(
        cell.rlike(bad_re),
        F.raise_error(
            F.lit(
                f"write_zeek: value in column '{colname}' contains the "
                "separator, set separator, or a newline (Zeek TSV has no "
                "escaping); pass on_unwritable='strip' to replace"
            )
        ),
    ).otherwise(cell)


def _field_wire(
    col: Column, dt: T.DataType, ztype: str, colname: str, on_unwritable: str
) -> Column:
    """One field's wire text, NULL -> unset marker (and per-element
    markers inside collections — the read side's A10 semantics).
    Separator guards run at ELEMENT level for collections, so a set
    separator hiding inside an element is caught before the join."""
    if isinstance(dt, T.ArrayType):
        ezt = ztype.split("[", 1)[-1].rstrip("]")
        joined = F.array_join(
            F.transform(
                col,
                lambda e: _guard(
                    F.coalesce(
                        _scalar_wire(e, dt.elementType, ezt), F.lit(_UNSET)
                    ),
                    "[\\t\\n\\r" + _SET_SEP + "]",
                    colname,
                    on_unwritable,
                ),
            ),
            _SET_SEP,
        )
        body = F.when(F.size(col) == 0, F.lit(_EMPTY)).otherwise(joined)
        return F.coalesce(body, F.lit(_UNSET))
    body = _scalar_wire(col, dt, ztype)
    return _guard(
        F.coalesce(body, F.lit(_UNSET)), "[\\t\\n\\r]", colname, on_unwritable
    )


def write_zeek(
    df: DataFrame,
    path: str,
    path_name: str = "spark",
    zeek_types: dict[str, str] | None = None,
    compress: "bool | str" = False,
    mode: str = "overwrite",
    on_unwritable: str = "error",
) -> None:
    """Write ``df`` as Zeek TSV log files under ``path`` (one
    ``part-NNNNN.log[.gz|.zst]`` per partition, each with the full
    header block).  ``compress``: False (plain), True/'gz' (gzip), or
    'zst' (zstd via pyarrow's bundled codec — Zeek's own third
    compression format; the scan path auto-detects all three).
    ``zeek_types`` overrides the ``#types`` label per column
    (``{'host_ip': 'addr', 'conns_opened': 'count'}``) — labels that
    Spark's type system can't carry.  ``read_zeek(spark, path + '/*')``
    returns the same values (round-trip pinned + fuzzed in tests).

    Known lossy cases, inherent to the wire format: a first-column
    value starting with ``#`` would read back as a comment line
    (guarded like the separators — error by default); a STRING value
    equal to a marker (``''``, ``'-'``, ``'(empty)'``) is
    indistinguishable from the marker on the wire and reads back NULL
    (scalars) / NULL element (collections); an EMPTY collection writes
    the empty marker, which the reference-pinned read semantics return
    as NULL, not ``[]`` (test/sql/zeek.test:191-206); a SINGLE-element
    collection whose element renders to a marker (e.g. ``[NULL]`` ->
    ``-``) is byte-identical to the cell-level marker and also reads
    back NULL.  Everything else round-trips exactly (fixed- and
    randomized-schema fuzz in tests)."""
    if mode not in ("overwrite", "error"):
        raise ValueError("write_zeek: mode must be 'overwrite' or 'error'")
    if on_unwritable not in ("error", "strip"):
        raise ValueError("write_zeek: on_unwritable must be 'error' or 'strip'")
    from zeek_duckdb_spark.sources.datasource import register_zeek_datasource

    register_zeek_datasource(df.sparkSession)  # idempotent
    lines, header = format_zeek_lines(df, path_name, zeek_types, on_unwritable)
    (
        lines.write.format("zeek")
        .mode("overwrite" if mode == "overwrite" else "append")
        .option("zeek_header", header)
        .option("compress", str(compress).lower())
        .save(path)
    )


def format_zeek_lines(
    df: DataFrame,
    path_name: str = "spark",
    zeek_types: dict[str, str] | None = None,
    on_unwritable: str = "error",
) -> tuple[DataFrame, str]:
    """(single-'line'-column frame, header block): the typed-to-wire
    projection shared by :func:`write_zeek` and
    :func:`write_zeek_stream` — all formatting is JVM expressions."""
    schema = df.schema
    ztypes = zeek_types_for_schema(schema, zeek_types)
    header = "\n".join(
        [
            "#separator \\x09",
            f"#set_separator\t{_SET_SEP}",
            f"#empty_field\t{_EMPTY}",
            f"#unset_field\t{_UNSET}",
            f"#path\t{path_name}",
            "#fields\t" + "\t".join(f.name for f in schema.fields),
            "#types\t" + "\t".join(ztypes),
        ]
    )
    cells = []
    for i, (f, zt) in enumerate(zip(schema.fields, ztypes)):
        cell = _field_wire(F.col(f.name), f.dataType, zt, f.name, on_unwritable)
        if i == 0:
            # a '#' at LINE start reads back as a comment/directive and
            # the whole row silently vanishes — guard the first cell
            if on_unwritable == "strip":
                cell = F.regexp_replace(cell, F.lit("^#"), F.lit(" "))
            else:
                cell = F.when(
                    cell.startswith("#"),
                    F.raise_error(
                        F.lit(
                            f"write_zeek: value in first column '{f.name}' "
                            "starts with '#' (reads back as a comment line); "
                            "pass on_unwritable='strip' to replace"
                        )
                    ),
                ).otherwise(cell)
        cells.append(cell)
    return df.select(F.concat_ws("\t", *cells).alias("line")), header


def write_zeek_stream(
    df: DataFrame,
    path: str,
    checkpoint: str,
    path_name: str = "spark",
    zeek_types: dict[str, str] | None = None,
    compress: "bool | str" = False,
    on_unwritable: str = "error",
    trigger_available_now: bool = False,
):
    """Streaming twin of :func:`write_zeek`: lands each microbatch as
    rotated ``batch-BBBBBB-part-PPPPP.log[.gz]`` files — the multi-file
    layout the reference's glob scan (and read_zeek) consumes directly.

    Exactly-once: tasks stage bytes under ``.staging/`` and the DRIVER
    publishes them atomically at microbatch commit (rename per file; a
    replayed batch after restart overwrites the same deterministic
    names, so duplicates cannot accumulate — pinned by the restart
    test).  Empty partitions publish nothing.  Returns the started
    ``StreamingQuery``."""
    from zeek_duckdb_spark.sources.datasource import register_zeek_datasource

    register_zeek_datasource(df.sparkSession)
    lines, header = format_zeek_lines(df, path_name, zeek_types, on_unwritable)
    w = (
        lines.writeStream.format("zeek")
        .option("zeek_header", header)
        .option("compress", str(compress).lower())
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


# --- the DataSource writer half (registered on ZeekDataSource) ---------


from pyspark.sql.datasource import (
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class _ZstdTextFile:
    """Text sink through pyarrow's bundled zstd codec (the same codec
    the scan path's entropy fallback decodes with — no ``zstandard``
    module needed on executors)."""

    def __init__(self, path: str):
        import pyarrow as pa

        self._f = pa.output_stream(path, compression="zstd")

    def write(self, s: str) -> None:
        self._f.write(s.encode("utf-8"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self._f.close()


def _codec(option_val) -> tuple[str, "object"]:
    """(extension, text-opener) for a ``compress`` option value:
    False/'false' -> plain, True/'true'/'gz' -> gzip,
    'zst'/'zstd' -> zstd via pyarrow (read back by the scan path's
    auto-detect — all three extensions glob together)."""
    v = str(option_val).lower()
    if v in ("false", "none", ""):
        return ".log", lambda p: open(p, "w")
    if v in ("true", "gz", "gzip"):
        return ".log.gz", lambda p: gzip.open(p, "wt")
    if v in ("zst", "zstd"):
        return ".log.zst", _ZstdTextFile
    raise ValueError(
        f"write_zeek: compress must be bool, 'gz', or 'zst' — got '{option_val}'"
    )


class ZeekLogWriter(DataSourceWriter):
    """Per-partition sink: header block + pre-formatted lines into
    ``part-NNNNN.log[.gz|.zst]``.  Constructed by
    ZeekDataSource.writer().  All-or-nothing: tasks stage dot-prefixed
    tmps and the driver publishes them at commit() (same shared-
    filesystem scope as ZeekStreamLogWriter.commit) — a job that dies
    after some tasks succeeded leaves no visible ``part-*`` file."""

    def __init__(self, options: dict, overwrite: bool):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("write_zeek: no output path")
        self._header = options.get("zeek_header", "")
        self._ext, self._open = _codec(options.get("compress", "false"))
        os.makedirs(self._path, exist_ok=True)
        # reap STALE dot-tmps from SIGKILLed prior runs (their abort
        # never ran; glob scans don't see dotfiles, so they'd pile
        # up) — age-gated so a concurrent job's staged files survive
        from zeek_duckdb_spark.sources.datasource import _reap_stale_tmps

        _reap_stale_tmps(self._path)
        if overwrite:
            for f in os.listdir(self._path):
                if f.startswith("part-"):
                    os.remove(os.path.join(self._path, f))
        elif any(f.startswith("part-") for f in os.listdir(self._path)):
            raise ValueError(
                f"write_zeek: '{self._path}' already contains log files "
                "(mode='error'); use mode='overwrite'"
            )

    def write(self, iterator):
        from pyspark import TaskContext

        from zeek_duckdb_spark.sources.datasource import StagedShardMessage

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        final = os.path.join(self._path, f"part-{pid:05d}{self._ext}")
        # dot-prefixed: invisible to glob scans and to the writer's own
        # part-* overwrite/error checks until commit() renames it
        tmp = os.path.join(
            self._path, f".part-{pid:05d}{self._ext}.tmp-{attempt}"
        )
        try:
            with self._open(tmp) as fh:
                fh.write(self._header + "\n")
                for row in iterator:
                    fh.write(row[0])
                    fh.write("\n")
        except BaseException:
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise
        return StagedShardMessage(tmp, final)

    def commit(self, messages):
        from zeek_duckdb_spark.sources.datasource import _publish_staged

        _publish_staged(messages)

    def abort(self, messages):
        from zeek_duckdb_spark.sources.datasource import _discard_staged

        _discard_staged(messages)


class ZeekCommitMessage(WriterCommitMessage):
    """Staged file handoff from a write task to the driver commit."""

    def __init__(self, staged: str | None, partition_id: int, rows: int):
        self.staged = staged
        self.partition_id = partition_id
        self.rows = rows


class ZeekStreamLogWriter(DataSourceStreamWriter):
    """Streaming sink half: tasks stage a file per non-empty partition;
    commit() publishes them under deterministic
    ``batch-BBBBBB-part-PPPPP`` names (idempotent across microbatch
    replays — a restarted batch overwrites, never duplicates); abort()
    discards the staged bytes."""

    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("write_zeek_stream: no output path")
        self._header = options.get("zeek_header", "")
        self._ext, self._open = _codec(options.get("compress", "false"))
        os.makedirs(os.path.join(self._path, ".staging"), exist_ok=True)

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        staged = os.path.join(
            self._path, ".staging", f"task-{pid}-{attempt}"
        )
        rows = 0
        with self._open(staged) as fh:
            fh.write(self._header + "\n")
            for row in iterator:
                fh.write(row[0])
                fh.write("\n")
                rows += 1
        if rows == 0:
            os.remove(staged)
            return ZeekCommitMessage(None, pid, 0)
        return ZeekCommitMessage(staged, pid, rows)

    def commit(self, messages, batchId):
        for m in messages:
            if m is None or m.staged is None:
                continue
            final = os.path.join(
                self._path,
                f"batch-{batchId:06d}-part-{m.partition_id:05d}{self._ext}",
            )
            os.replace(m.staged, final)
        # a retried task's LOSING attempt leaves its staged file behind
        # (abort only runs when the whole batch fails); microbatches are
        # sequential per query, so anything still staged is garbage
        staging = os.path.join(self._path, ".staging")
        for f in os.listdir(staging):
            try:
                os.remove(os.path.join(staging, f))
            except OSError:
                pass

    def abort(self, messages, batchId):
        for m in messages:
            if m is not None and m.staged and os.path.exists(m.staged):
                os.remove(m.staged)
