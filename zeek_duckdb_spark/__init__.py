"""zeek_duckdb_spark — a PySpark-native analytics engine for Zeek logs.

Re-expresses the capabilities of the ynadji/zeek-duckdb DuckDB extension
(reference: /root/reference, see SURVEY.md) Spark-first:

- ``read_zeek(spark, path, **options)`` — typed DataFrame from Zeek
  TSV logs (self-describing ``#``-directive headers), with strict /
  union-by-name multi-file schema semantics, marker-aware NULLs,
  gzip auto-detection, a ``filename`` virtual column, and
  ``ignore_file_errors`` tolerance.  The scan composes Spark's built-in
  CSV reader with a declarative cast pipeline so Catalyst keeps column
  pruning / predicate pushdown / whole-stage codegen.
- ``register(spark)`` — installs the INET helper SQL functions
  (``ip_in_subnet``, ``inet_canon``, ...).
- ``operators`` — large-scale training-data pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing).
"""

from zeek_duckdb_spark.header import ZeekHeader, parse_header, zeek_type_to_spark
from zeek_duckdb_spark.sources.zeek import read_zeek
from zeek_duckdb_spark.sources.zeek_json import read_zeek_json
from zeek_duckdb_spark.sources.zeek_writer import write_zeek, write_zeek_stream
from zeek_duckdb_spark.sources.warc import (
    extract_warc,
    read_warc,
    dedup_to_revisits,
    resolve_revisits,
    write_warc,
)
from zeek_duckdb_spark.sources.cdxj import read_cdxj, write_cdxj
from zeek_duckdb_spark.functions.inet import register_inet_functions
from zeek_duckdb_spark.functions.intervals import (
    interval_text,
    register_interval_functions,
)


def register(spark):
    """Install all session-level extensions (the Spark analogue of the
    reference's extension load, src/zeek_extension.cpp:31-36): the INET
    function family, DuckDB-style interval rendering, and the ``zeek``
    data source format."""
    from zeek_duckdb_spark.sources.datasource import register_zeek_datasource

    register_inet_functions(spark)
    register_interval_functions(spark)
    register_zeek_datasource(spark)
    return spark


__all__ = [
    "ZeekHeader",
    "parse_header",
    "zeek_type_to_spark",
    "read_zeek",
    "read_zeek_json",
    "read_warc",
    "extract_warc",
    "resolve_revisits",
    "dedup_to_revisits",
    "write_warc",
    "read_cdxj",
    "write_cdxj",
    "write_zeek",
    "write_zeek_stream",
    "register",
    "interval_text",
]

__version__ = "0.1.0"
