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

from ..config import (
    CDCParams,
    binlog_resume_filter,
    gtid_resume_filter,
    parse_kafka_startup_position,
    timestamp_resume_filter,
)


def kafka_source_options(
    params: CDCParams,
    topic: str,
    binlog_offset_index: dict[int, int] | None = None,
    gtid_offset_index: dict[int, int] | None = None,
) -> dict[str, str]:
    """Reader options for a Debezium topic, honoring the reference's
    startup-position grammar (A2-A6) and parallel-read sizing (A7/A8 →
    minPartitions). ``binlog_offset_index`` (if the caller tracked one)
    turns an A4 ``file:pos`` resume into explicit per-partition
    ``startingOffsets`` JSON instead of earliest+filter;
    ``gtid_offset_index`` is the A5 analog — a seek HINT that bounds
    the scan while the envelope gtid cut still certifies exactness."""
    opts = {
        "kafka.bootstrap.servers": params.broker_list,
        "subscribe": topic,
        "minPartitions": str(params.parallel),
        "failOnDataLoss": "false",
    }
    # A30-style property passthrough applies to the CONSUMER too (an
    # MSK/SASL deployment needs security.protocol etc. on the reader,
    # not just the producer): kafka_properties -> kafka.* options.
    opts.update(params.kafka_options())
    opts.update(
        parse_kafka_startup_position(
            params.position,
            topic=topic,
            binlog_offset_index=binlog_offset_index,
            gtid_offset_index=gtid_offset_index,
        )
    )
    return opts


def read_cdc_stream(
    spark: SparkSession,
    params: CDCParams,
    topic: str,
    binlog_offset_index: dict[int, int] | None = None,
    gtid_offset_index: dict[int, int] | None = None,
) -> DataFrame:
    """→ streaming DataFrame[value: string] of envelope JSON lines, the
    exact shape the route operator consumes. An A4 ``file:pos`` startup
    without an offset index reads from earliest and applies the exact
    binlog-coordinate cut on the envelope (config.binlog_resume_filter);
    an A5 ``gtid:`` startup always applies the exact gtid-set cut, with
    ``gtid_offset_index`` optionally seeking past the topic head."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        params, topic, binlog_offset_index, gtid_offset_index
    ).items():
        reader = reader.option(k, v)
    out = reader.load().selectExpr("CAST(value AS STRING) AS value")
    if params.position.startswith("file:") and binlog_offset_index is None:
        out = out.filter(binlog_resume_filter(params.position))
    if params.position.startswith("gtid:"):
        out = out.filter(gtid_resume_filter(params.position))
    if params.position.startswith("timestamp:"):
        # startingTimestamp seeks by broker append time — bounds the
        # scan; the source.ts_ms cut certifies the exact A6 semantics
        out = out.filter(timestamp_resume_filter(params.position))
    return out
