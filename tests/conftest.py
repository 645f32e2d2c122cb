from __future__ import annotations

import os

import pytest

# Activate the vendored protobuf shim (no-op when real protobuf exists)
# BEFORE any SparkSession launches its JVM, so python workers inherit
# the PYTHONPATH entry and the TWS state-server channel can import it.
from spark_ifs_spark.streaming.stateful import ensure_protobuf

ensure_protobuf()


@pytest.fixture(scope="session")
def spark():
    from spark_ifs_spark.session import get_spark

    s = get_spark("spark_ifs_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_IFS_TEST_SF_DIR", "/root/testdata/sf0.001")
