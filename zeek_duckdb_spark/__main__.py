"""``python -m zeek_duckdb_spark`` -> cli.main (see cli.py)."""

import sys

from zeek_duckdb_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
