"""``python -m zeek_duckdb_spark`` -> cli.main (see cli.py)."""

import sys

from zeek_duckdb_spark.cli import main

sys.exit(main())
