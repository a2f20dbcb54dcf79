"""As-of join semantics: inclusive tie rule, NULL when nothing
precedes, tolerance window — checked against pandas merge_asof."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from mknssh_11_bigdata_spark.operators.asof import asof_join

B = dt.datetime(2024, 1, 1)


def _mk(spark):
    left = spark.createDataFrame(
        [
            (1, B + dt.timedelta(minutes=10), "l1"),
            (1, B + dt.timedelta(minutes=5), "l2"),  # exact tie with r@5
            (1, B + dt.timedelta(minutes=1), "l3"),  # nothing precedes
            (2, B + dt.timedelta(minutes=7), "l4"),  # other key
        ],
        ["user_id", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [
            (1, B + dt.timedelta(minutes=5), 7.0),
            (1, B + dt.timedelta(minutes=9), 8.0),
            (3, B + dt.timedelta(minutes=1), 9.0),  # key absent on left
        ],
        ["user_id", "ts", "rv"],
    )
    return left, right


def test_asof_join_matches_pandas_merge_asof(spark):
    left, right = _mk(spark)
    got = {
        (r.user_id, r.tag): r.rv_asof
        for r in asof_join(
            left, right, on="ts", by=["user_id"], right_cols=["rv"]
        ).collect()
    }
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts")
    expected = pd.merge_asof(lp, rp, on="ts", by="user_id")
    exp = {
        (r.user_id, r.tag): (None if pd.isna(r.rv) else r.rv)
        for r in expected.itertuples()
    }
    assert got == exp
    assert got[(1, "l2")] == 7.0  # inclusive <= on exact tie
    assert got[(1, "l3")] is None  # nothing precedes
    assert got[(2, "l4")] is None  # key with no right rows


def test_asof_join_tolerance(spark):
    left, right = _mk(spark)
    got = {
        (r.user_id, r.tag): r.rv_asof
        for r in asof_join(
            left,
            right,
            on="ts",
            by=["user_id"],
            right_cols=["rv"],
            tolerance="2 minutes",
        ).collect()
    }
    # l1@10 last match r@9 (1 min old: kept); l2@5 matches r@5 (0: kept)
    assert got[(1, "l1")] == 8.0
    assert got[(1, "l2")] == 7.0
    # widen: l1 vs r@5 would be 5 min — dropped under 2-minute tolerance
    got_narrow = {
        (r.user_id, r.tag): r.rv_asof
        for r in asof_join(
            left.filter("tag = 'l1'"),
            right.filter("rv = 7.0"),
            on="ts",
            by=["user_id"],
            right_cols=["rv"],
            tolerance="2 minutes",
        ).collect()
    }
    assert got_narrow[(1, "l1")] is None
