from zeek_duckdb_spark.sources.zeek import read_zeek

__all__ = ["read_zeek"]
