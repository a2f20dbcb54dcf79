from __future__ import annotations

import pytest

from mknssh_11_bigdata_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Small parallelism for test latency; the engine defaults kick in for
    # real runs (bench.py / driver).
    s = get_spark(
        app_name="mknssh11-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()
