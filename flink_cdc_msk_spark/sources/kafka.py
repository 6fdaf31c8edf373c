"""Kafka stream source assembly (SURVEY.md A1-A8 streaming phase).

Maps the reference's MySqlSource/MongoDBSource configuration
(MySQLCDC2AWSMSK.scala:224-274, MongoCDC2AWSMSK.scala:156-169) onto the
Spark Kafka source reading a Debezium/DMS topic. No broker exists in the
test container, so option assembly is unit-tested and the reader is
exercised against file streams (streaming/pipeline.py) which share every
downstream expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import CDCParams, parse_kafka_startup_position


def kafka_source_options(params: CDCParams, topic: str) -> dict[str, str]:
    """Reader options for a Debezium topic, honoring the reference's
    startup-position grammar (A2-A6) and parallel-read sizing (A7/A8 →
    minPartitions)."""
    opts = {
        "kafka.bootstrap.servers": params.broker_list,
        "subscribe": topic,
        "minPartitions": str(params.parallel),
        "failOnDataLoss": "false",
    }
    opts.update(parse_kafka_startup_position(params.position))
    return opts


def read_cdc_stream(
    spark: SparkSession, params: CDCParams, topic: str
) -> DataFrame:
    """→ streaming DataFrame[value: string] of envelope JSON lines, the
    exact shape the route operator consumes."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(params, topic).items():
        reader = reader.option(k, v)
    return reader.load().selectExpr("CAST(value AS STRING) AS value")
