"""Bucketed co-located joins: pre-partitioning both sides on the join key
at write time eliminates the join-time shuffle entirely — the storage-level
strategy for repeated large-table joins at 100 TB (SURVEY.md Part B joins
row; session.py partitioning notes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed(spark):
    # warehouse.dir is a static conf — managed tables land in the session's
    # default warehouse; DROP TABLE removes their files afterwards
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("orders_bucketed")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .saveAsTable("customer_bucketed")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS customer_bucketed")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # force a non-broadcast join so the exchange question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("orders_bucketed")
        c = spark.table("customer_bucketed")
        joined = o.join(c, o.o_custkey == c.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing co-located both sides
        # and it computes the right thing
        n = joined.count()
        plain = (
            spark.read.parquet(f"{SF_SMALL}/orders.parquet")
            .join(
                spark.read.parquet(f"{SF_SMALL}/customer.parquet"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert n == plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_same_join_does_shuffle(bucketed):
    """Control: the identical join on plain parquet needs two exchanges —
    demonstrating what bucketing removed."""
    spark = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        c = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
        plan = (
            o.join(c, o.o_custkey == c.c_custkey)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
