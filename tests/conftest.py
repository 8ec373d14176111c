from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from ck_spark.session import get_spark

    s = get_spark("ck_spark-tests", cores=4, shuffle_partitions=8)
    yield s
