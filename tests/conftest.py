from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from spark_ifs_spark.session import get_spark

    s = get_spark("spark_ifs_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_IFS_TEST_SF_DIR", "/root/testdata/sf0.001")
