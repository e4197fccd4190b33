"""Command-line entry point: ``python -m zeek_duckdb_spark <cmd>``.

A reference user's workflow is DuckDB SQL over ``read_zeek('glob')``;
this CLI reproduces that workflow (and the landing-zone lifecycle
around it) without writing a Python driver:

    python -m zeek_duckdb_spark query \
        --view conn=logs/conn_*.log.gz \
        "SELECT id_orig_h, count(*) FROM conn GROUP BY 1 ORDER BY 2 DESC"

    python -m zeek_duckdb_spark ingest  'logs/*.log.gz' landing/conn
    python -m zeek_duckdb_spark compact landing/conn --partition-col p_date
    python -m zeek_duckdb_spark profile landing/docs --text-col text
    python -m zeek_duckdb_spark top     landing/conn id_orig_h -k 50
    python -m zeek_duckdb_spark export  landing/conn out/conn_zeek \
        --zeek-type id_orig_h=addr --gz

Output is TSV on stdout (machine-pipeable, like the reference's
DuckDB shell usage); diagnostics go to stderr.  ``main(argv, spark)``
is importable for in-process use/testing.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys


def _split_spec(spec: str, flag: str, form: str) -> tuple[str, str]:
    if "=" not in spec:
        raise SystemExit(f"error: {flag} expects {form}, got '{spec}'")
    a, b = spec.split("=", 1)
    return a, b


def _batch_id(path: str) -> str:
    """Landing id for clean-incremental: the input's basename (the
    natural daily key) + an 8-hex md5 of the path AS GIVEN (trailing
    slashes stripped).  Same path string -> same id (the crash-repair
    rerun invariant); distinct roots sharing a basename -> distinct
    ids.  Deliberately no os.path normalization: abspath would make
    the id cwd-dependent and normpath mangles URI schemes
    (s3://bucket -> s3:/bucket)."""
    given = path.rstrip("/") or "/"
    tag = hashlib.md5(given.encode()).hexdigest()[:8]
    base_name = given.rsplit("/", 1)[-1] or "root"
    return re.sub(r"[^A-Za-z0-9._-]", "_", base_name) + "-" + tag


def _load_token_classifier(model_path, threshold, cmd: str):
    """Load + validate a TOKEN-classifier model JSON for the clean /
    clean-incremental gates.  Returns the classifier dict for
    ``clean_corpus(classifier=)`` or None when no model was given.
    A missing 'features' key means an EMBEDDING model (the score
    command's original JSONs carried only {weights, bias}) — those are
    refused here, not silently mis-applied as hashed-token weights."""
    if model_path is None:
        return None
    with open(model_path) as f:
        cm = json.load(f)
    if cm.get("features", "embedding") != "tokens":
        raise SystemExit(
            f"{cmd}: --classifier-model must be a TOKEN model "
            "(score --fit --features tokens) — the gate runs over the "
            "text column"
        )
    if not cm.get("weights"):
        raise SystemExit(
            f"{cmd}: --classifier-model JSON has no 'weights' list"
        )
    if not 0.0 <= threshold <= 1.0:
        raise SystemExit(
            f"{cmd}: --classifier-threshold must be in [0, 1] "
            "(it gates a sigmoid)"
        )
    return {"weights": cm["weights"], "bias": cm.get("bias", 0.0),
            "threshold": threshold}


def _hadoop_path_exists(spark, path: str) -> bool:
    """Existence probe through the JVM Hadoop FileSystem — works on
    ANY Spark-visible filesystem (s3a://, hdfs://, abfs://, file://),
    unlike a driver-local os.path stat, which silently answers False
    for every object-store URI (the landing roots this CLI targets)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def _parquet_row_count(path: str) -> int:
    """Row count from parquet footer metadata — a driver-side file
    walk, zero data IO (the row count lives in every footer)."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet") and not n.startswith((".", "_")):
                total += pq.ParquetFile(os.path.join(root, n)).metadata.num_rows
    return total


def _tsv(df, limit: int | None) -> None:
    # `is not None`: --limit 0 must print zero rows, not collect all.
    # The no-limit path streams partition-at-a-time via
    # toLocalIterator() so pointing the CLI at a large view keeps
    # driver memory bounded (a full collect() OOMs on a corpus-sized
    # result); output is identical either way.
    rows = df.limit(limit).collect() if limit is not None else df.toLocalIterator()
    print("\t".join(df.columns))
    for r in rows:
        print("\t".join("" if v is None else str(v) for v in r))


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m zeek_duckdb_spark",
        description="Spark-native Zeek log analytics",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="run SQL over Zeek-log views")
    q.add_argument("sql")
    q.add_argument(
        "--view",
        action="append",
        default=[],
        metavar="NAME=GLOB",
        help="register a Zeek-log view (repeatable)",
    )
    q.add_argument("--filename", action="store_true",
                   help="add the filename virtual column to log views")
    q.add_argument("--parquet-view", action="append", default=[],
                   metavar="NAME=DIR", help="register a parquet view")
    q.add_argument("--limit", type=int, default=None)

    ing = sub.add_parser("ingest", help="land logs as partitioned parquet")
    ing.add_argument("pattern")
    ing.add_argument("out")
    ing.add_argument("--granularity", choices=["day", "hour"], default="day")

    co = sub.add_parser("compact", help="small-file compaction of a landing dir")
    co.add_argument("path")
    co.add_argument("--target-bytes", type=int, default=128 << 20)
    co.add_argument("--partition-col", default=None,
                    help="directory-partition column; comma-separate for "
                         "nested layouts (e.g. band,pfx for the banded "
                         "index landings)")
    co.add_argument("--sort-cols", default=None,
                    help="re-establish a within-file sort in the rewrite "
                         "(comma-separated; e.g. urlkey,cdx_ts for a "
                         "write_cdx landing, preserving its row-group-"
                         "stats skipping)")

    pr = sub.add_parser("profile", help="one-pass corpus health profile")
    pr.add_argument("path", help="parquet directory")
    pr.add_argument("--text-col", default="text")

    ex = sub.add_parser("export", help="write a parquet table as Zeek TSV logs")
    ex.add_argument("path", help="parquet directory")
    ex.add_argument("out")
    ex.add_argument("--path-name", default="spark")
    ex.add_argument(
        "--zeek-type", action="append", default=[], metavar="COL=ZTYPE",
        help="#types label override (repeatable)",
    )
    ex.add_argument("--gz", action="store_true",
                    help="shorthand for --compress gz")
    ex.add_argument("--compress", choices=["gz", "zst"], default=None)

    ic = sub.add_parser(
        "index-crawl",
        help="build a CDX-style index parquet from WARC files",
    )
    ic.add_argument("pattern", help="WARC glob (plain/.gz/.zst)")
    ic.add_argument("out")
    ic.add_argument("--all-types", action="store_true",
                    help="index every record type, not just responses")
    ic.add_argument("--no-sort", action="store_true",
                    help="skip the (urlkey, cdx_ts) sort (saves the "
                         "shuffle when the consumer sorts anyway)")
    ic.add_argument("--digest", choices=("decoded", "stored"),
                    default="decoded",
                    help="'decoded' hashes the decoded entity (same "
                         "content matches across framings); 'stored' "
                         "hashes the payload as stored "
                         "(WARC-Payload-Digest / external-CDX interop)")
    ic.add_argument("--partitioned", action="store_true",
                    help="land via write_cdx (host-hash-partitioned "
                         "directories; domain lookups prune to one) "
                         "instead of flat sorted parquet")

    ew = sub.add_parser(
        "export-wet",
        help="write a text corpus as WET (WARC conversion) shards",
    )
    ew.add_argument("path", help="parquet directory")
    ew.add_argument("out")
    ew.add_argument("--url-col", default="url")
    ew.add_argument("--date-col", default="warc_date")
    ew.add_argument("--text-col", default="text")
    ew.add_argument("--shards", type=int, default=None,
                    help="repartition to N output shards")

    wa = sub.add_parser(
        "export-wat",
        help="derive WAT (WARC metadata) shards from WARC files",
    )
    wa.add_argument("pattern", help="WARC glob (plain/.gz/.zst)")
    wa.add_argument("out")
    wa.add_argument("--all-types", action="store_true",
                    help="cover every record type, not just responses")
    wa.add_argument("--no-links", action="store_true",
                    help="skip a[href] harvesting (no Python in the "
                         "plan at all)")
    wa.add_argument("--shards", type=int, default=None,
                    help="repartition to N output shards")

    da = sub.add_parser(
        "dedup-archive",
        help="rewrite a WARC archive with duplicate payloads as "
             "revisit records (one stored copy per distinct payload)",
    )
    da.add_argument("pattern", help="WARC glob (plain/.gz/.zst)")
    da.add_argument("out")
    da.add_argument("--compress", choices=("gz", "zst", "plain"),
                    default="gz",
                    help="output container ('zst' = the IIPC seekable "
                         "frame-per-record layout)")
    da.add_argument("--shards", type=int, default=None,
                    help="repartition to N output shards")

    ch = sub.add_parser("check", help="data-quality gate from a rules JSON file")
    ch.add_argument("path", help="parquet directory")
    ch.add_argument("rules", help="JSON file: list of rule objects")

    cl = sub.add_parser(
        "clean", help="corpus cleaning pipeline (quality + dedup) to parquet"
    )
    cl.add_argument("path", help="input parquet directory (documents)")
    cl.add_argument("out", help="output parquet directory")
    cl.add_argument("--id-col", default="doc_id")
    cl.add_argument("--text-col", default="text")
    cl.add_argument("--min-tokens", type=int, default=5)
    cl.add_argument("--max-punct-ratio", type=float, default=0.2)
    cl.add_argument("--redact-pii", action="store_true")
    cl.add_argument("--normalize", default=None, metavar="FORM",
                    help="NFC/NFKC/NFD/NFKD text normalization first")
    cl.add_argument("--near-dedup", choices=["minhash", "simhash"], default=None)
    cl.add_argument("--strip-dup-spans", action="store_true")
    cl.add_argument("--classifier-model", default=None, metavar="JSON",
                    help="token-classifier model JSON from "
                         "`score --fit --features tokens` — gates docs "
                         "by learned quality (zero-shuffle expression)")
    cl.add_argument("--classifier-threshold", type=float, default=0.5,
                    help="keep docs scoring >= T (with --classifier-model)")

    ci = sub.add_parser(
        "clean-incremental",
        help="daily-crawl ingest: dedup a batch against persisted indexes",
    )
    ci.add_argument("path", help="input parquet directory (today's batch)")
    ci.add_argument("out", help="output parquet directory (survivors land here)")
    ci.add_argument("--fps", required=True, help="fingerprint index parquet path")
    ci.add_argument("--sigs", required=True, help="signature index parquet path")
    ci.add_argument("--id-col", default="doc_id")
    ci.add_argument("--text-col", default="text")
    ci.add_argument("--threshold", type=float, default=0.7)
    ci.add_argument("--dry-run", action="store_true",
                    help="compute verdicts without touching the indexes")
    ci.add_argument("--allow-id-reruns", action="store_true",
                    help="skip the globally-unique-id check (deliberate reruns)")
    ci.add_argument("--classifier-model", default=None, metavar="JSON",
                    help="token-classifier model JSON (score --fit "
                         "--features tokens): gate each batch by learned "
                         "quality BEFORE dedup — rejects never enter the "
                         "indexes")
    ci.add_argument("--classifier-threshold", type=float, default=0.5,
                    help="keep docs scoring >= T (with --classifier-model)")
    ci.add_argument("--compact-after", type=int, default=None, metavar="N",
                    help="after the index appends, compact any index "
                         "whose worst directory exceeds N parquet files "
                         "(the daily-append maintenance cadence; off by "
                         "default)")
    ci.add_argument("--legacy-ok", action="store_true",
                    help="proceed even if a pre-hash batch=<basename> "
                         "landing (older id scheme) exists next to this "
                         "input's landing — assert it belongs to a "
                         "DIFFERENT input that merely shares the basename")

    tp = sub.add_parser(
        "top",
        help="most frequent values of a column (Misra-Gries heavy hitters)",
    )
    tp.add_argument("path", help="parquet directory")
    tp.add_argument("column")
    tp.add_argument("-k", type=int, default=20)
    tp.add_argument("--capacity", type=int, default=None,
                    help="per-partition summary size (default 8k)")
    tp.add_argument("--approx", action="store_true",
                    help="one-pass [n_lo, n_hi] bounds instead of the "
                         "exact two-pass counts")

    qt = sub.add_parser(
        "quantile",
        help="exact discrete quantiles of a column (no global sort)",
    )
    qt.add_argument("path", help="parquet directory")
    qt.add_argument("column")
    qt.add_argument("-q", action="append", type=float, default=None,
                    metavar="Q", help="quantile in [0,1]; repeatable "
                    "(default: 0.01 0.25 0.5 0.75 0.99)")
    qt.add_argument("--by", default=None, metavar="COL",
                    help="per-group quantiles (bounded-cardinality "
                         "group column)")

    dq = sub.add_parser(
        "distinct",
        help="approximate distinct count of a column (mergeable HLL)",
    )
    dq.add_argument("path", help="parquet directory (a GLOB of landed "
                                  "sketch dirs with --merge)")
    dq.add_argument("column", nargs="?", default=None,
                    help="column to sketch (omitted with --merge: the "
                         "landed sketches already fix it)")
    dq.add_argument("--by", default=None, metavar="COL",
                    help="per-group distinct counts")
    dq.add_argument("--land", default=None, metavar="DIR",
                    help="write the (mergeable) sketch table to DIR "
                         "instead of printing estimates — the per-day/"
                         "per-source slice-catalog landing")
    dq.add_argument("--merge", action="store_true",
                    help="treat PATH as a glob of landed sketch dirs; "
                         "merge the kilobyte sketches and print the "
                         "union's distinct counts without re-scanning "
                         "any source data")

    sc = sub.add_parser(
        "score",
        help="learned quality classifier: fit on labeled embeddings, "
             "score/gate a corpus (classifier.logreg_*)",
    )
    sc.add_argument("path", help="corpus parquet (needs the vector column)")
    sc.add_argument("out", help="output parquet dir for scored/gated rows")
    sc.add_argument("--fit", default=None, metavar="DIR",
                    help="labeled parquet (vector column + --label-col) "
                         "to fit on; omit to score with --model weights")
    sc.add_argument("--model", default=None, metavar="JSON",
                    help="model JSON file ({'weights': [...], 'bias': b}) "
                         "— written here after --fit, read when no --fit")
    sc.add_argument("--label-col", default="label")
    sc.add_argument("--vec-col", default="embedding")
    sc.add_argument("--features", choices=["embedding", "tokens"],
                    default="embedding",
                    help="'embedding': logistic regression over a vector "
                         "column; 'tokens': the fastText-style hashed "
                         "bag-of-tokens classifier over --text-col "
                         "(classifier.token_logreg_fit + the zero-shuffle "
                         "quality_classifier_score fold)")
    sc.add_argument("--text-col", default="text",
                    help="text column for --features tokens")
    sc.add_argument("--dim", type=int, default=None,
                    help="feature dimension (required with --fit; "
                         "hash-bucket count for --features tokens)")
    sc.add_argument("--iters", type=int, default=20)
    sc.add_argument("--lr", type=float, default=1.0)
    sc.add_argument("--threshold", type=float, default=None,
                    help="gate: keep only rows scoring >= THRESHOLD "
                         "(omit to land all rows with their score)")

    sp = sub.add_parser(
        "split",
        help="deterministic leakage-safe train/val/test labeling "
             "(pipeline.split_corpus), landed partitioned by split",
    )
    sp.add_argument("path", help="parquet directory")
    sp.add_argument("out", help="output root (partitioned by split=)")
    sp.add_argument("--key", required=True,
                    help="split key column — use a GROUP key (domain, "
                         "cluster id) to pin whole groups to one split")
    sp.add_argument("--frac", action="append", required=True,
                    metavar="NAME=F", help="split fraction, repeatable; "
                         "must sum to 1 (e.g. --frac train=0.8 "
                         "--frac val=0.1 --frac test=0.1)")
    sp.add_argument("--seed", type=int, default=0)

    cw = sub.add_parser(
        "ingest-crawl",
        help="WARC crawl files -> extracted-text parquet landing "
             "(read_warc -> extract_text_html; utf-8 pages)",
    )
    cw.add_argument("pattern", help="WARC file glob (plain or .warc.gz)")
    cw.add_argument("out", help="parquet output directory")
    cw.add_argument("--keep-title", action="store_true",
                    help="keep the page title as the first text line")
    cw.add_argument("--all-responses", action="store_true",
                    help="keep every response record (default: HTTP 200 "
                         "with an html content type)")
    cw.add_argument("--max-link-density", type=float, default=None,
                    metavar="F",
                    help="drop lines whose anchor-text fraction exceeds F "
                         "(nav/footer boilerplate; 0.5 is a reasonable "
                         "crawl default)")
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    args = _build_parser().parse_args(argv)
    owns = spark is None
    if owns:
        from zeek_duckdb_spark.session import get_spark

        spark = get_spark("zeek-spark-cli")
    from zeek_duckdb_spark import read_zeek, register

    register(spark)
    try:
        if args.cmd == "query":
            for spec in args.view:
                name, glob = _split_spec(spec, "--view", "NAME=GLOB")
                read_zeek(
                    spark, glob, filename=args.filename
                ).createOrReplaceTempView(name)
            for spec in args.parquet_view:
                name, d = _split_spec(spec, "--parquet-view", "NAME=DIR")
                spark.read.parquet(d).createOrReplaceTempView(name)
            _tsv(spark.sql(args.sql), args.limit)
        elif args.cmd == "ingest":
            from zeek_duckdb_spark.sources.sink import ingest_zeek_to_parquet

            out = ingest_zeek_to_parquet(
                spark, args.pattern, args.out, granularity=args.granularity
            )
            print(f"ingested {out.count()} rows -> {args.out}", file=sys.stderr)
        elif args.cmd == "compact":
            from zeek_duckdb_spark.sources.sink import compact_landing

            pcol = args.partition_col
            if pcol and "," in pcol:
                pcol = [c.strip() for c in pcol.split(",") if c.strip()]
            scols = None
            if args.sort_cols is not None:
                scols = [c.strip() for c in args.sort_cols.split(",")
                         if c.strip()]
                if not scols:
                    # a degenerate value (',' / whitespace) would fall
                    # through as no-sort and silently destroy the
                    # landing's within-file order (r14 review)
                    raise SystemExit(
                        "compact: --sort-cols parsed to no columns; "
                        "pass a comma-separated column list"
                    )
            stats = compact_landing(
                spark, args.path, args.target_bytes, pcol, scols
            )
            print(json.dumps(stats))
        elif args.cmd == "profile":
            from zeek_duckdb_spark.operators.pipeline import corpus_profile

            _tsv(
                corpus_profile(spark.read.parquet(args.path), args.text_col),
                None,
            )
        elif args.cmd == "export":
            from zeek_duckdb_spark import write_zeek

            ztypes = dict(
                _split_spec(x, "--zeek-type", "COL=ZTYPE")
                for x in args.zeek_type
            )
            write_zeek(
                spark.read.parquet(args.path),
                args.out,
                path_name=args.path_name,
                zeek_types=ztypes or None,
                compress=args.compress or args.gz,
            )
            print(f"exported -> {args.out}", file=sys.stderr)
        elif args.cmd == "index-crawl":
            from zeek_duckdb_spark.sources.warc import cdx_records, write_cdx

            idx = cdx_records(
                spark, args.pattern,
                record_types=None if args.all_types else ("response",),
                digest=args.digest,
            )
            if args.partitioned:
                if args.no_sort:
                    # write_cdx's repartition+sort IS the landing
                    # layout — a silent no-op flag would lie about the
                    # shuffle being skipped (r14 review)
                    raise SystemExit(
                        "index-crawl: --no-sort conflicts with "
                        "--partitioned (write_cdx sorts within its "
                        "hash directories as part of the layout)"
                    )
                write_cdx(idx, args.out, mode="overwrite")
            else:
                if not args.no_sort:
                    idx = idx.orderBy("urlkey", "cdx_ts")
                idx.write.mode("overwrite").parquet(args.out)
            print(
                f"indexed {_parquet_row_count(args.out)} records -> "
                f"{args.out}",
                file=sys.stderr,
            )
        elif args.cmd == "export-wet":
            from zeek_duckdb_spark.sources.warc import write_wet

            from pyspark.sql import functions as F

            df = spark.read.parquet(args.path)
            if args.date_col not in df.columns:
                # corpora without a capture date still export (the
                # WARC-Date header is optional in our conversion rows)
                df = df.withColumn(args.date_col, F.lit(None).cast("string"))
            if args.shards:
                df = df.repartition(args.shards)
            write_wet(
                df, args.out,
                url_col=args.url_col,
                date_col=args.date_col,
                text_col=args.text_col,
            )
            print(f"exported WET -> {args.out}", file=sys.stderr)
        elif args.cmd == "export-wat":
            from zeek_duckdb_spark.sources.warc import (
                read_warc,
                wat_records,
                write_wat,
            )

            df = read_warc(
                spark, args.pattern,
                record_types=None if args.all_types else ("response",),
                headers=True,
            )
            wat = wat_records(df, links=not args.no_links)
            if args.shards:
                wat = wat.repartition(args.shards)
            write_wat(wat, args.out)
            print(f"exported WAT -> {args.out}", file=sys.stderr)
        elif args.cmd == "dedup-archive":
            from zeek_duckdb_spark.sources.warc import (
                dedup_to_revisits,
                read_warc,
                write_warc,
            )

            df = read_warc(
                spark, args.pattern, record_types="*", headers=True
            )
            dd = dedup_to_revisits(df)
            if args.shards:
                dd = dd.repartition(args.shards)
            write_warc(
                dd, args.out,
                compress=False if args.compress == "plain"
                else args.compress,
            )
            print(f"deduplicated archive -> {args.out}", file=sys.stderr)
        elif args.cmd == "check":
            from zeek_duckdb_spark.operators.quality_checks import check_rules

            with open(args.rules) as fh:
                rules = json.load(fh)
            result = check_rules(spark.read.parquet(args.path), rules)
            rows = result.collect()  # one scan: print AND gate from it
            print("\t".join(result.columns))
            for r in rows:
                print("\t".join("" if v is None else str(v) for v in r))
            if any(not r.passed for r in rows):
                return 1
        elif args.cmd == "clean":
            from zeek_duckdb_spark.operators.pipeline import clean_corpus

            src = spark.read.parquet(args.path)
            # rows_in from parquet FOOTERS (driver-side metadata walk),
            # not a corpus scan — the stat line must not double input IO
            n_in = _parquet_row_count(args.path)
            classifier = _load_token_classifier(
                args.classifier_model, args.classifier_threshold, "clean"
            )
            cleaned = clean_corpus(
                src,
                id_col=args.id_col,
                text_col=args.text_col,
                min_tokens=args.min_tokens,
                max_punct_ratio=args.max_punct_ratio,
                redact_pii=args.redact_pii,
                normalize_form=args.normalize,
                near_dedup=args.near_dedup,
                strip_dup_spans=args.strip_dup_spans,
                classifier=classifier,
            )
            cleaned.write.mode("overwrite").parquet(args.out)
            n_out = spark.read.parquet(args.out).count()
            print(json.dumps({"rows_in": n_in, "rows_out": n_out,
                              "out": args.out}))
        elif args.cmd == "clean-incremental":
            from zeek_duckdb_spark.operators.pipeline import (
                incremental_clean_ingest,
            )

            batch = spark.read.parquet(args.path)
            n_in = _parquet_row_count(args.path)
            # each batch lands in its own batch=<id> partition dir via
            # the operator's land_path (overwrite-before-index-append
            # + skip-on-empty), so a crash-repair rerun of the same
            # batch with --allow-id-reruns replaces its own landing
            # instead of appending a second full copy of the
            # survivors, and a rerun after full success leaves the
            # completed landing intact.  <id> is the input dir's
            # basename — the natural daily key (.../crawl/2026-08-14
            # -> batch=2026-08-14) — SUFFIXED with a short hash of the
            # path as given so same-basename roots land separately and
            # the same path string re-derives the same id (the
            # crash-repair rerun invariant; see _batch_id for the
            # URI/cwd contract).  Readers of the root get it back as a
            # `batch` partition column.
            batch_id = _batch_id(args.path)
            land = os.path.join(args.out, f"batch={batch_id}")
            # one-time migration guard: builds before the path-hash
            # suffix landed this input as batch=<basename> only, so a
            # crash-repair rerun under the new scheme would derive a
            # DIFFERENT id and land a second full copy next to the old
            # one — silent row duplication for readers of the root.
            # The legacy dir can't be cleaned automatically (under the
            # old scheme ANY root sharing the basename landed there);
            # surface it and make the operator decide.
            legacy = os.path.join(
                args.out, f"batch={batch_id.rsplit('-', 1)[0]}"
            )
            if not args.legacy_ok and _hadoop_path_exists(spark, legacy):
                raise SystemExit(
                    f"error: legacy landing {legacy!r} exists (pre-hash "
                    f"id scheme). If it was landed from this same input, "
                    f"rename it to {land!r} (or remove it and re-land) "
                    f"before rerunning; if it belongs to a different "
                    f"input that merely shares the basename, pass "
                    f"--legacy-ok."
                )
            survivors = incremental_clean_ingest(
                batch,
                args.fps,
                args.sigs,
                id_col=args.id_col,
                text_col=args.text_col,
                threshold=args.threshold,
                update_index=not args.dry_run,
                check_ids=not args.allow_id_reruns,
                land_path=land,
                classifier=_load_token_classifier(
                    args.classifier_model, args.classifier_threshold,
                    "clean-incremental",
                ),
                compact_after=args.compact_after,
            )
            n_out = survivors.count()
            print(json.dumps({
                "rows_in": n_in, "rows_out": n_out,
                "dry_run": args.dry_run, "out": land,
            }))
        elif args.cmd == "top":
            from zeek_duckdb_spark.operators.sketches import heavy_hitters

            _tsv(
                heavy_hitters(
                    spark.read.parquet(args.path),
                    args.column,
                    k=args.k,
                    capacity=args.capacity,
                    exact=not args.approx,
                ),
                None,  # result is k rows — already bounded
            )
        elif args.cmd == "quantile":
            from zeek_duckdb_spark.operators.quantiles import (
                exact_quantiles_df,
                exact_quantiles_grouped,
            )

            qs = args.q if args.q else [0.01, 0.25, 0.5, 0.75, 0.99]
            src = spark.read.parquet(args.path)
            if args.by:
                out = exact_quantiles_grouped(src, args.column, qs, args.by)
            else:
                out = exact_quantiles_df(src, args.column, qs)
            _tsv(out, None)  # |groups| * |qs| rows — model-sized
        elif args.cmd == "distinct":
            from zeek_duckdb_spark.operators.sketches import (
                hll_build,
                hll_estimate,
                hll_merge_df,
            )

            groups = (args.by,) if args.by else ()
            if args.merge:
                # union-of-slices: expand the glob driver-side, read
                # every landed sketch table in ONE multi-path scan,
                # merge per group — KB sketch rows move, the source
                # corpora never re-scan
                import glob as _glob

                paths = sorted(
                    p for p in _glob.glob(args.path) if os.path.isdir(p)
                )
                if not paths:
                    raise SystemExit(
                        f"distinct --merge: no sketch dirs match {args.path!r}"
                    )
                sk = spark.read.parquet(*paths)
                _tsv(hll_estimate(hll_merge_df(sk, groups)), None)
            else:
                if args.column is None:
                    raise SystemExit(
                        "distinct: column is required without --merge"
                    )
                src = spark.read.parquet(args.path)
                sk = hll_build(src, args.column, groups)
                if args.land:
                    sk.write.mode("overwrite").parquet(args.land)
                    print(json.dumps({"landed": args.land,
                                      "groups": list(groups)}))
                else:
                    _tsv(hll_estimate(sk), None)  # |groups| rows
        elif args.cmd == "score":
            from zeek_duckdb_spark.operators.classifier import (
                filter_by_classifier,
                logreg_fit,
                logreg_score,
                token_logreg_fit,
            )

            if args.fit:
                if args.dim is None:
                    raise SystemExit("score: --dim is required with --fit")
                labeled = spark.read.parquet(args.fit)
                if args.features == "tokens":
                    model = token_logreg_fit(
                        labeled, args.label_col, text_col=args.text_col,
                        dim=args.dim, iters=args.iters, lr=args.lr,
                    )
                else:
                    model = logreg_fit(
                        labeled, args.label_col, args.dim,
                        vec_col=args.vec_col,
                        iters=args.iters, lr=args.lr,
                    )
                if args.model:
                    with open(args.model, "w") as f:
                        json.dump({"weights": model["weights"],
                                   "bias": model["bias"],
                                   "features": args.features}, f)
            else:
                if not args.model:
                    raise SystemExit("score: provide --fit or --model")
                with open(args.model) as f:
                    model = json.load(f)
                if model.get("features", "embedding") != args.features:
                    raise SystemExit(
                        "score: model was fit with --features "
                        f"{model.get('features', 'embedding')!r}; rerun "
                        "with the matching --features flag"
                    )
            corpus = spark.read.parquet(args.path)
            if args.threshold is not None and not 0.0 <= args.threshold <= 1.0:
                # the embedding path gets this from filter_by_classifier;
                # the tokens path gates inline, so validate here — a fat-
                # fingered threshold would otherwise silently land an
                # EMPTY corpus
                raise SystemExit(
                    "score: --threshold must be in [0, 1] (it gates a sigmoid)"
                )
            if args.features == "tokens":
                from pyspark.sql import functions as F

                from zeek_duckdb_spark.operators.textops import (
                    quality_classifier_score,
                )

                score = quality_classifier_score(
                    F.col(args.text_col), model["weights"], model["bias"]
                )
                scored = corpus.withColumn("quality_score", score)
                out_df = (
                    scored.filter(F.col("quality_score") >= args.threshold)
                    .drop("quality_score")
                    if args.threshold is not None
                    else scored
                )
            elif args.threshold is not None:
                out_df = filter_by_classifier(
                    corpus, model["weights"], model["bias"],
                    args.threshold, vec_col=args.vec_col,
                )
            else:
                out_df = logreg_score(
                    corpus, model["weights"], model["bias"],
                    vec_col=args.vec_col,
                )
            out_df.write.mode("overwrite").parquet(args.out)
            n = _parquet_row_count(args.out)
            print(json.dumps({
                "rows_out": n, "out": args.out,
                "fitted": bool(args.fit),
                "loss": (model.get("loss") or [None])[-1] if args.fit else None,
                "gated": args.threshold is not None,
            }))
        elif args.cmd == "split":
            from zeek_duckdb_spark.operators.pipeline import split_corpus

            fractions: dict[str, float] = {}
            for spec in args.frac:
                name, f = _split_spec(spec, "--frac", "NAME=F")
                fractions[name] = float(f)
            src = spark.read.parquet(args.path)
            (
                split_corpus(src, args.key, fractions, seed=args.seed)
                .repartition("split")
                .write.mode("overwrite")
                .partitionBy("split")
                .parquet(args.out)
            )
            from pyspark.sql import functions as F

            counts = {
                r["split"]: r["n"]
                for r in spark.read.parquet(args.out)
                .groupBy("split").agg(F.count("*").alias("n")).collect()
            }
            print(json.dumps({"out": args.out, "counts": counts}))
        elif args.cmd == "ingest-crawl":
            from pyspark.sql import functions as F

            from zeek_duckdb_spark.operators.htmlops import extract_text_html
            from zeek_duckdb_spark.sources.warc import read_warc

            # decode_text=True: the charset-aware decode happens INSIDE
            # the record-expansion map (body/content_type are already
            # Python objects there), so page bytes cross Arrow once
            recs = read_warc(spark, args.pattern, decode_text=True)
            if not args.all_responses:
                recs = recs.filter(
                    (F.col("http_status") == 200)
                    # lower() first: 'Text/HTML' / 'TEXT/HTML' are
                    # legal and present in real crawls — a
                    # case-sensitive contains silently drops them
                    & F.lower(F.col("content_type")).contains("html")
                    & F.col("content_encoding").isNull()
                )
            pages = recs.select(
                # deterministic id: same record -> same id on re-land
                F.xxhash64("target_uri", "warc_date", "record_id")
                .alias("doc_id"),
                F.col("target_uri").alias("url"),
                "warc_date",
                F.col("body_text").alias("html"),
            )
            out_df = extract_text_html(
                pages, "html", "text",
                keep_title=args.keep_title,
                max_link_density=args.max_link_density,
            ).drop("html")
            out_df.write.mode("overwrite").parquet(args.out)
            print(
                f"landed {_parquet_row_count(args.out)} docs -> {args.out}",
                file=sys.stderr,
            )
        return 0
    finally:
        if owns:
            spark.stop()
