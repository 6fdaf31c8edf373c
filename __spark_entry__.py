"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the engine's flagship pipeline — the reference's core
dataflow (CDC envelope parse → route → partition-key synthesis → Kafka
record assembly, MySQLCDC2AWSMSK.scala:95-168) — over synthesized Debezium
events from the sf0.001 orders table.

``queries`` / ``oracle_sql`` expose every implemented operator from
SURVEY.md §2 (registry in flink_cdc_msk_spark/plans/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_cdc_msk_spark.config import TableRouting
from flink_cdc_msk_spark.operators.route import route_mysql_cdc
from flink_cdc_msk_spark.plans import registry
from flink_cdc_msk_spark.sources.cdc_sim import synthesize_mysql_events


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC routing pipeline at sf0.001 → routed Kafka
    records (db, table, partition_key, topic, partition, value)."""
    routing = TableRouting.parse(
        '[{"db":"test_db","table":"orders","primary_key":"o_orderkey"}]'
    )
    events = synthesize_mysql_events(spark, "/root/testdata/sf0.001")
    return route_mysql_cdc(
        events, routing, topic_prefix="cdc_", num_partitions=12
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.ensure_loaded()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    registry.ensure_loaded()
    return dict(registry.ORACLES)
