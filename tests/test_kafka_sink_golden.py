"""Byte-level golden tests for the Kafka sink column contract (A22-A27).

End-to-end without a broker: FIXTURES-style Debezium envelopes →
route_mysql_cdc → to_kafka_columns, asserting the EXACT
(key bytes, value bytes, topic, partition) tuples the producer would see.

Parity targets in /root/reference:
  key   = partition_key UTF-8 bytes  (kafka/CDCKafkaKeySerializationSchema.scala:8-10)
  value = envelope JSON UTF-8 bytes  (kafka/CDCKafkaValueSerializationSchema.scala:8-10)
  topic = prefix + lower(db)         (topicselector/FlinkCDCSimpleTopicSelector.scala:8-12)
  partition = Math.abs(key.hashCode % n)  (partitioner/FlinkCDCSimplePartitioner.scala:11-15)

Every expected tuple below is a hand-computed literal (hashCode by the
31-polynomial by hand-check; truncation/null semantics from
MySQLCDC2AWSMSK.scala:122-142 — Gson serializeNulls, insertion order).
"""

from __future__ import annotations

import json

from flink_cdc_msk_spark.config import TableRouting
from flink_cdc_msk_spark.operators.route import route_mysql_cdc
from flink_cdc_msk_spark.sinks.kafka import to_kafka_columns

ROUTING = TableRouting.parse(
    json.dumps(
        [
            {"db": "test_db", "table": "product", "primary_key": "pid"},
            {
                "db": "test_db",
                "table": "product_01",
                "primary_key": "pid",
                "column_max_length": "col1=10|col2=20",
            },
            {
                "db": "tpcc",
                "table": "order_line",
                "primary_key": "ol_w_id,ol_d_id,ol_o_id,ol_number",
            },
        ]
    )
)

# Compact JSON (Gson-style separators) so pass-through is byte-stable.
INSERT_PRODUCT = (
    '{"before":null,"after":{"pid":1,"pname":"prodcut-001",'
    '"pprice":"125.12"},"source":{"db":"test_db","table":"product"},'
    '"op":"c","ts_ms":1678634463898,"transaction":null}'
)
UPDATE_TRUNC = (
    '{"before":{"pid":9,"col1":"0123456789AB","col2":null},'
    '"after":{"pid":9,"col1":"0123456789AB","col2":null},'
    '"source":{"db":"test_db","table":"product_01"},'
    '"op":"u","ts_ms":1678634463899,"transaction":null}'
)
DELETE_ORDER_LINE = (
    '{"before":{"ol_w_id":1,"ol_d_id":2,"ol_o_id":3,"ol_number":4},'
    '"after":null,"source":{"db":"tpcc","table":"order_line"},'
    '"op":"d","ts_ms":1678634463900,"transaction":null}'
)

# after.col1 (len 12 >= 10) truncated to 10 chars; before side untouched
# (only the delete-aware side is truncated, scala:122-140); col2 null
# PRESERVED in output (serializeNulls, scala:38); field order preserved.
UPDATE_TRUNC_EXPECTED_VALUE = (
    '{"before":{"pid":9,"col1":"0123456789AB","col2":null},'
    '"after":{"pid":9,"col1":"0123456789","col2":null},'
    '"source":{"db":"test_db","table":"product_01"},'
    '"op":"u","ts_ms":1678634463899,"transaction":null}'
)


def _sink_rows(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    routed = route_mysql_cdc(
        df, ROUTING, topic_prefix="cdc_", num_partitions=12
    )
    return {
        bytes(r.key): r for r in to_kafka_columns(routed).collect()
    }


def test_kafka_record_bytes_golden(spark):
    rows = _sink_rows(
        spark, [INSERT_PRODUCT, UPDATE_TRUNC, DELETE_ORDER_LINE]
    )
    assert set(rows) == {
        b"test_db.product.1",
        b"test_db.product_01.9",
        b"tpcc.order_line.1.2.3.4",
    }

    # 1. plain insert: value passes through BYTE-IDENTICAL (no truncation
    #    rule fires, so no re-serialization happens at all)
    r = rows[b"test_db.product.1"]
    assert bytes(r.value) == INSERT_PRODUCT.encode("utf-8")
    assert r.topic == "cdc_test_db"
    # hashCode("test_db.product.1") = 1806061583; 1806061583 % 12 = 11
    assert r.partition == 11

    # 2. truncating update: re-serialized with nulls preserved, after-side
    #    truncated, before-side untouched — exact literal above
    r = rows[b"test_db.product_01.9"]
    assert bytes(r.value) == UPDATE_TRUNC_EXPECTED_VALUE.encode("utf-8")
    assert r.topic == "cdc_test_db"
    # hashCode("test_db.product_01.9") = 1370573471; % 12 = 11
    assert r.partition == 11

    # 3. composite-PK delete: key from `before` (db case preserved in the
    #    key — only the topic selector lowercases, scala:191-220 +
    #    FlinkCDCSimpleTopicSelector.scala:8-12), passthrough value
    r = rows[b"tpcc.order_line.1.2.3.4"]
    assert bytes(r.value) == DELETE_ORDER_LINE.encode("utf-8")
    assert r.topic == "cdc_tpcc"
    # hashCode("tpcc.order_line.1.2.3.4") = -1839970775;
    # Java rem: -1839970775 % 12 = -11 → Math.abs = 11
    assert r.partition == 11


def test_kafka_key_value_are_binary_columns(spark):
    rows = _sink_rows(spark, [INSERT_PRODUCT])
    df = spark.createDataFrame([(INSERT_PRODUCT,)], "value string")
    out = to_kafka_columns(
        route_mysql_cdc(df, ROUTING, topic_prefix="cdc_", num_partitions=12)
    )
    kinds = dict(out.dtypes)
    assert kinds["key"] == "binary" and kinds["value"] == "binary"
    assert kinds["topic"] == "string" and kinds["partition"] == "int"
