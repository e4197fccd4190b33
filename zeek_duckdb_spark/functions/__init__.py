from zeek_duckdb_spark.functions.inet import (
    inet_canon_col,
    register_inet_functions,
)

__all__ = ["inet_canon_col", "register_inet_functions"]
