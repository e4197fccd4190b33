import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small local sessions for tests


@pytest.fixture(scope="session")
def spark():
    from zeek_duckdb_spark.session import get_spark

    s = get_spark("zeek-spark-tests")
    yield s
    s.stop()


REF_DATA = "/root/reference/data"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
