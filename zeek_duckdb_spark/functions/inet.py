"""INET function family — the one non-built-in type in the reference.

The reference maps Zeek ``addr``/``subnet`` to DuckDB's INET type
(src/zeek_reader.cpp:144-154) and its corpus exercises equality against
INET literals and ``<<=`` subnet containment (test/sql/zeek_inet.test,
README.md:91-93).  Spark has no INET type, so this engine represents
addresses as **canonical text** plus a registered function family
(SURVEY.md §2.9):

- scan path (``inet=true``): :func:`inet_canon_col`, a pure-JVM
  normalization (lowercase IPv6) — Zeek itself emits canonical form, so
  this is a near-no-op that keeps the 100 TB hot path out of Python;
- literal / user-input path: ``inet_canon`` (full RFC canonicalization
  via :mod:`ipaddress`), ``ip_in_subnet``, ``ip_to_bytes``,
  ``ip_version`` as Arrow-vectorized pandas UDFs (batch transfer, not
  per-row Python).  ``ip_to_bytes`` yields a 16-byte sortable form
  (IPv4-mapped) for range joins / sorting at scale.
"""

from __future__ import annotations

import ipaddress

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T

__all__ = [
    "inet_canon_col",
    "register_inet_functions",
    "ip_in_subnet",
    "inet_canon",
    "ip_to_bytes",
    "ip_version",
]


def inet_canon_col(col: Column) -> Column:
    """Cheap scan-path canonicalization: IPv6 lowercased; IPv4 and CIDR
    text pass through.  Zeek writes addresses in canonical form already
    (no leading zeros, compressed v6), so full re-parsing per row would
    buy nothing and cost a Python roundtrip at 100 TB."""
    return F.when(col.contains(":"), F.lower(col)).otherwise(col)


def _canon_one(s):
    if s is None:
        return None
    try:
        if "/" in s:
            return str(ipaddress.ip_network(s, strict=False))
        return str(ipaddress.ip_address(s))
    except ValueError:
        return None


@pandas_udf(T.StringType())
def inet_canon(s: pd.Series) -> pd.Series:
    """Full canonicalization of an address or CIDR string (v4+v6);
    invalid input -> NULL (mirrors DuckDB's INET cast failure)."""
    return s.map(_canon_one)


def _in_subnet_one(addr, cidr):
    if addr is None or cidr is None:
        return None
    try:
        return ipaddress.ip_address(addr) in ipaddress.ip_network(cidr, strict=False)
    except ValueError:
        return None


@pandas_udf(T.BooleanType())
def ip_in_subnet(addr: pd.Series, cidr: pd.Series) -> pd.Series:
    """Spark analogue of DuckDB INET ``addr <<= 'net/prefix'``
    (README.md:91-93).  v4 and v6; version mismatch -> False; invalid
    input -> NULL."""

    def one(a, c):
        if a is None or c is None:
            return None
        try:
            net = ipaddress.ip_network(c, strict=False)
            ip = ipaddress.ip_address(a)
        except ValueError:
            return None
        if ip.version != net.version:
            return False
        return ip in net

    return pd.Series([one(a, c) for a, c in zip(addr, cidr)], dtype="object")


@pandas_udf(T.BinaryType())
def ip_to_bytes(addr: pd.Series) -> pd.Series:
    """16-byte big-endian form (IPv4-mapped ::ffff:a.b.c.d) — a sortable,
    equality- and range-comparable normalized key usable for joins,
    sorting, and bucketing at scale."""

    def one(a):
        if a is None:
            return None
        try:
            ip = ipaddress.ip_address(a)
        except ValueError:
            return None
        if ip.version == 4:
            ip = ipaddress.IPv6Address("::ffff:" + a)
        return ip.packed

    return addr.map(one)


@pandas_udf(T.IntegerType())
def ip_version(addr: pd.Series) -> pd.Series:
    def one(a):
        if a is None:
            return None
        try:
            return ipaddress.ip_address(a).version
        except ValueError:
            return None

    return addr.map(one).astype("object")


def register_inet_functions(spark: SparkSession) -> None:
    """Session-level registration (the Spark analogue of loading the
    DuckDB ``inet`` extension, src/zeek_reader.cpp:144-154)."""
    spark.udf.register("inet_canon", inet_canon)
    spark.udf.register("ip_in_subnet", ip_in_subnet)
    spark.udf.register("ip_to_bytes", ip_to_bytes)
    spark.udf.register("ip_version", ip_version)
