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


@pytest.fixture(scope="session")
def fleet_frames(spark):
    """ONE construction pass over every registered query at sf0.001,
    shared by the fleet-sweep tests (plan invariants, Python-stage
    audit, dtype parity). Each sweep previously rebuilt all 200+ query
    frames itself — construction includes real driver actions (model
    fits, guarded counts, checkpoints), so three sweeps cost ~5 min of
    the suite's budget for identical artifacts. Returns
    ``{name: (schema, executed_plan_string)}``; nothing is executed,
    and each query's checkpoint blocks are freed as soon as its plan
    is stringified."""
    from mknssh_11_bigdata_spark.queries import QUERIES
    from mknssh_11_bigdata_spark.session import release_checkpoints

    out = {}
    for name, spec in QUERIES.items():
        df = spec.spark(spark, SF_SMOKE)
        out[name] = (
            df.schema,
            df._jdf.queryExecution().executedPlan().toString(),
        )
        release_checkpoints(spark)
    return out
