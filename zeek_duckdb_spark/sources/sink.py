"""Parquet sink for ingested Zeek logs (SURVEY.md §7.2 step 7).

The reference is read-only; the natural Spark extension is a columnar
landing zone: ``ingest_zeek_to_parquet`` reads raw logs once and writes
a partitioned parquet dataset that every later query scans instead of
re-parsing TSV.  At 100 TB this is the difference between re-tokenizing
text on every query and pruned columnar scans.

Partitioning: hourly/daily directories derived from a timestamp column
(Zeek's ``ts``), the standard time-series layout — partition pruning
then serves time-range queries from the directory listing alone.
``target_file_rows`` controls file sizing via a repartition on the
partition key + a salt, avoiding both the many-tiny-files and the
one-giant-file failure modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_zeek_parquet",
    "ingest_zeek_to_parquet",
    "write_bucketed",
    "compact_landing",
    "maybe_compact_landing",
    "recover_landing",
]


def write_zeek_parquet(
    df: DataFrame,
    path: str,
    *,
    ts_col: str = "ts",
    granularity: str = "day",
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Write a (typed) Zeek DataFrame as a time-partitioned parquet
    dataset with partition columns ``p_date`` (and ``p_hour`` when
    granularity='hour')."""
    part_cols = []
    out = df
    if ts_col in df.columns:
        out = out.withColumn("p_date", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        part_cols.append("p_date")
        if granularity == "hour":
            out = out.withColumn("p_hour", F.hour(F.col(ts_col)))
            part_cols.append("p_hour")
    writer = out.write.mode(mode).option("compression", compression)
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(path)


def ingest_zeek_to_parquet(
    spark: SparkSession,
    pattern: str,
    out_path: str,
    *,
    ts_col: str = "ts",
    granularity: str = "day",
    **read_opts,
) -> DataFrame:
    """One-shot ingest: read_zeek(pattern) -> partitioned parquet at
    out_path; returns the re-opened columnar DataFrame."""
    from zeek_duckdb_spark.sources.zeek import read_zeek

    df = read_zeek(spark, pattern, **read_opts)
    write_zeek_parquet(df, out_path, ts_col=ts_col, granularity=granularity)
    return spark.read.parquet(out_path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
    one_file_per_bucket: bool = True,
) -> None:
    """Write a BUCKETED parquet table (Hive-style bucketing via
    ``bucketBy``) — the co-located-join layout: two tables bucketed the
    same way on the join key (e.g. conn and dns on ``id_orig_h``) join
    with ZERO exchange, because matching buckets are read into matching
    partitions.  At 100 TB this turns every host-correlation join from
    a corpus-wide shuffle into a bucket-local merge — pay the shuffle
    once at ingest, never per query.

    ``sort_col`` additionally sorts within buckets
    (``sortBy``) so equality lookups skip via min/max and merge joins
    need no sort.  Bucketed writes must go through the session catalog
    (``saveAsTable``) — plain ``.parquet(path)`` silently drops bucket
    metadata, which is the part that eliminates the exchange.

    ``one_file_per_bucket`` (default, r16) repartitions on the bucket
    column before the write so each bucket lands as exactly ONE file
    (``repartition(n, col)`` and ``bucketBy`` share murmur3 hashing, so
    every write task holds exactly its bucket's rows).  Without it each
    input task writes its own file per bucket — up to tasks x buckets
    small files (guide §6's small-files trap), and, more importantly,
    Spark refuses to report the ``sortBy`` order for multi-file buckets
    (a merge would be needed), so
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` can
    never eliminate the scan-side sorts.  On the one-file layout with
    that conf set, the bucketed merge join needs NO sort on either
    fact side (measured on the sf~5 bucketed q03/q05: -13%/-14%
    query wall; the landing write itself is one shuffle of the input
    either way).  Set it False only when a single file per bucket
    would be unreasonably large for the writer (size buckets so it
    is not).
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    from pyspark.sql import functions as F

    if one_file_per_bucket:
        # advice (r17): the one-file default caps write parallelism at
        # n_buckets and serializes each bucket into one task — name
        # that loudly when the bucket count is far below the cluster's
        # parallelism instead of letting a 4-bucket write quietly run
        # on 4 of 128 cores (behavior is unchanged; opt out with
        # one_file_per_bucket=False when write speed matters more than
        # the sort-free layout)
        cores = df.sparkSession.sparkContext.defaultParallelism
        if n_buckets * 4 <= cores:
            import warnings

            warnings.warn(
                f"write_bucketed: n_buckets={n_buckets} caps the write at "
                f"{n_buckets} tasks on a {cores}-slot cluster (one file "
                "per bucket); raise n_buckets or pass "
                "one_file_per_bucket=False if write throughput matters "
                "more than the sort-free bucketed-join layout",
                stacklevel=2,
            )
    src = df.repartition(n_buckets, F.col(bucket_col)) if one_file_per_bucket else df
    writer = src.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def _exchange_paths(a: str, b: str) -> bool:
    """Atomically swap two paths with Linux ``renameat2(...,
    RENAME_EXCHANGE)`` so a landing-dir swap has no reader-visible
    gap.  Returns False wherever the syscall or glibc wrapper is
    unavailable (non-Linux, old kernels, EINVAL from filesystems that
    don't support exchange) — callers fall back to a rename pair."""
    import ctypes
    import os

    try:
        libc = ctypes.CDLL(None, use_errno=True)
        fn = libc.renameat2
    except (OSError, AttributeError):
        return False
    AT_FDCWD = -100
    RENAME_EXCHANGE = 2
    ret = fn(
        ctypes.c_int(AT_FDCWD),
        os.fsencode(a),
        ctypes.c_int(AT_FDCWD),
        os.fsencode(b),
        ctypes.c_uint(RENAME_EXCHANGE),
    )
    return ret == 0


def recover_landing(path: str) -> str | None:
    """Crash recovery for :func:`compact_landing`'s rename-pair
    fallback: a kill between ``rename(path, .compact-old)`` and
    ``rename(.compact-tmp, path)`` leaves ``path`` MISSING with the
    data stranded in the siblings — and a missing index path would
    otherwise read as the empty-index bootstrap in the ingest loops,
    silently resetting a standing dedup index.  Driver-local (like the
    swap itself; object-store layouts never hit the fallback).

    If ``path`` exists (or is not a local path), does nothing.  If it
    is missing and ``.compact-tmp`` exists, the compacted rewrite was
    complete before the swap began — finish the interrupted swap
    (tmp -> path, drop old).  Else if ``.compact-old`` exists, restore
    the pre-compaction data.  Returns the action taken
    (``"completed-swap"`` / ``"restored-old"``) or None."""
    import os
    import shutil

    if os.path.isdir(path):
        return None
    tmp = path.rstrip("/") + ".compact-tmp"
    old = path.rstrip("/") + ".compact-old"
    if os.path.isdir(tmp):
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
        return "completed-swap"
    if os.path.isdir(old):
        os.rename(old, path)
        return "restored-old"
    return None


def compact_landing(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    partition_col: str | list[str] | None = None,
    sort_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction for a parquet landing directory — the
    standing maintenance job of any streaming/incremental landing zone
    (each microbatch lands a few small files; a 100 TB table becomes
    metadata-bound long before it is IO-bound).

    Rewrites ``path`` so each output file targets
    ``target_file_bytes`` of on-disk parquet: file count =
    ceil(total_bytes / target), derived from driver-side file metadata
    (no job).  With ``partition_col`` (a directory-partitioned layout
    from ``write_zeek_parquet``; a LIST for nested layouts like the
    banded/chunked index landings' ``band=*/pfx=*``), each partition
    directory is preserved — the rewrite repartitions WITHIN
    partitions via partitionBy, so partition pruning keeps working.

    Swap protocol (local/posix filesystems): write to ``path.tmp``,
    then atomically EXCHANGE tmp and path via Linux
    ``renameat2(RENAME_EXCHANGE)`` — a concurrent reader sees either
    the old data or the new, never a missing directory.  Where the
    syscall is unavailable (non-Linux, pre-3.15 kernels, some network
    filesystems return EINVAL) it falls back to the rename pair
    (old away, tmp in), which has a reader-visible instant where
    ``path`` does not exist — a reader landing in that window errors
    rather than reading stale data, and a CRASH in that window leaves
    ``path`` missing with the data stranded in the siblings;
    :func:`recover_landing` repairs that state and runs automatically
    at the top of this function, :func:`maybe_compact_landing`, and
    the ingest loops' index reads.  On an object store, use the table
    format's own compaction (rewrite_data_files) instead — this helper
    is for the plain-directory landing zone.  NOT for bucketed tables
    (write_bucketed) — bucket file layout is part of their contract;
    re-land those with write_bucketed itself.

    ``sort_cols``: order rows by these columns WITHIN each rewritten
    file — for landings whose write established a within-file sort
    that feeds parquet row-group-stats skipping (``write_cdx``'s
    (urlkey, cdx_ts)); the data is being rewritten anyway, so the
    sort costs only the in-task ordering (r14).

    Returns {"files_before", "files_after", "bytes"}.
    """
    import math
    import os
    import shutil

    if target_file_bytes < 1:
        raise ValueError("compact_landing: target_file_bytes must be >= 1")
    recover_landing(path)  # finish/undo a crashed fallback swap first
    files = []
    for root, _dirs, names in os.walk(path):
        files.extend(
            os.path.join(root, n) for n in names
            if n.endswith(".parquet") and not n.startswith(".")
        )
    if not files:
        raise ValueError(f"compact_landing: no parquet files under '{path}'")
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    # read partition values AS STRINGS (inference off) for the rewrite:
    # inference turns 'hour=00' into int 0, which (a) breaks the
    # directory<->column key round-trip below and (b) would REWRITE the
    # directory as 'hour=0' — silently changing the layout readers and
    # pruning predicates were built against.  The schema only lives in
    # the directory names, so downstream readers re-infer as before.
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    infer_prev = spark.conf.get(infer_key, "true")
    spark.conf.set(infer_key, "false")
    try:
        # the file index (and with it the partition schema) is built
        # eagerly here, so restoring the conf after is safe
        df = spark.read.parquet(path)
    finally:
        spark.conf.set(infer_key, infer_prev)
    tmp = path.rstrip("/") + ".compact-tmp"
    old = path.rstrip("/") + ".compact-old"
    shutil.rmtree(tmp, ignore_errors=True)
    if partition_col is not None:
        pcols = (
            [partition_col]
            if isinstance(partition_col, str)
            else list(partition_col)
        )
        # per-PARTITION file target: partition p gets
        # ceil(p_bytes / target) files, derived from the same driver
        # walk (a global salt modulus would spread EVERY partition over
        # n_out tasks — more and smaller files than before compaction).
        # The modulus rides as a partition-value -> count literal map;
        # for nested layouts the key is the '\x1f'-joined value tuple.
        from urllib.parse import unquote

        part_bytes: dict[str, int] = {}
        for f in files:
            rel = os.path.relpath(f, path)
            segs = rel.split(os.sep)
            vals = []
            for c in pcols:
                prefix = f"{c}="
                val = next(
                    (
                        seg[len(prefix):]
                        for seg in segs
                        if seg.startswith(prefix)
                    ),
                    None,
                )
                if val is None:
                    raise ValueError(
                        f"compact_landing: '{f}' is not under a "
                        f"'{c}=' directory; wrong partition_col?"
                    )
                # directory names carry Hive path-escaping (%XX for
                # space/':'/'=' etc.); the column side below yields the
                # UNESCAPED value, so decode here or the keys never
                # match for such values
                decoded = unquote(val)
                # the per-partition modulus map keys on the
                # '\x1f'-joined value tuple; a value CONTAINING \x1f
                # could collide two distinct keys and silently pick the
                # wrong modulus, bypassing the loud no-match path below
                # — reject it here, mirroring that loud-failure
                # contract
                if "\x1f" in decoded:
                    raise ValueError(
                        "compact_landing: partition value "
                        f"{decoded!r} for column '{c}' contains the "
                        "\\x1f key separator — nested-partition keys "
                        "would be ambiguous; rename the partition "
                        "value"
                    )
                vals.append(decoded)
            key = "\x1f".join(vals)
            part_bytes[key] = part_bytes.get(key, 0) + os.path.getsize(f)
        mod_map = F.create_map(
            *[
                F.lit(x)
                for val, b in sorted(part_bytes.items())
                for x in (val, max(1, math.ceil(b / target_file_bytes)))
            ]
        )
        # NULL partition values land as the Hive default-partition
        # token; mirror it so the key matches (concat_ws would silently
        # SKIP a NULL and collapse a 2-col key into a 1-col string)
        key_col = F.concat_ws(
            "\x1f",
            *[
                F.coalesce(
                    F.col(c).cast("string"),
                    F.lit("__HIVE_DEFAULT_PARTITION__"),
                )
                for c in pcols
            ],
        )
        # a key with no modulus means the directory value didn't
        # round-trip (an escaping/format case this walk doesn't
        # handle): fail LOUDLY — the silent alternative compacts that
        # partition to ONE file regardless of size
        salted = df.withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in df.columns]),
                F.when(
                    mod_map[key_col].isNotNull(), mod_map[key_col]
                ).otherwise(
                    F.raise_error(
                        F.format_string(
                            "compact_landing: partition key '%s' has no "
                            "directory match — partition value escaping "
                            "or formatting this tool does not round-trip",
                            key_col,
                        )
                    )
                ),
            ),
        )
        out = salted.repartition(
            *[F.col(c) for c in pcols], F.col("__salt")
        ).drop("__salt")
        if sort_cols:
            out = out.sortWithinPartitions(*pcols, *sort_cols)
        (
            out.write.partitionBy(*pcols)
            .mode("overwrite")
            .parquet(tmp)
        )
    else:
        out = df.repartition(n_out)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    if _exchange_paths(tmp, path):
        shutil.rmtree(tmp)  # tmp now holds the pre-compaction data
    else:
        # fallback rename pair: reader-visible gap, see docstring
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    after = sum(
        1
        for root, _d, names in os.walk(path)
        for n in names
        if n.endswith(".parquet")
    )
    return {"files_before": len(files), "files_after": after, "bytes": total}


def maybe_compact_landing(
    spark: SparkSession,
    path: str,
    max_files_per_dir: int,
    target_file_bytes: int = 128 << 20,
    partition_col: str | list[str] | None = None,
    sort_cols: list[str] | None = None,
) -> dict | None:
    """Threshold trigger for :func:`compact_landing` — the cadence
    hook the incremental ingest loops call after their index appends,
    so a year of daily appends can't quietly degrade the probe paths
    into the metadata-bound regime SCALING.md measures.

    Counts parquet files PER DIRECTORY with one driver-side walk (the
    same metadata :func:`compact_landing` reads anyway; zero Spark
    jobs when under threshold — the common case).  Per-directory, not
    total, because partitioned layouts scale their directory count
    with the data while each directory's file count should stay at
    the one-file-per-dir floor compaction restores.  A missing or
    empty ``path`` returns ``None`` (the bootstrap day has nothing to
    compact).  Compacts only when some directory EXCEEDS
    ``max_files_per_dir``; returns :func:`compact_landing`'s stats
    dict when it ran, else ``None``.
    """
    import os

    if max_files_per_dir < 1:
        raise ValueError(
            "maybe_compact_landing: max_files_per_dir must be >= 1"
        )
    # a crashed fallback swap leaves path missing (os.walk -> nothing,
    # worst=0) — recover first or the trigger would never re-fire
    recover_landing(path)
    worst = 0
    for root, _dirs, names in os.walk(path):
        n = sum(
            1 for nm in names
            if nm.endswith(".parquet") and not nm.startswith(".")
        )
        worst = max(worst, n)
    if worst <= max_files_per_dir:
        return None
    return compact_landing(
        spark, path, target_file_bytes, partition_col, sort_cols
    )
