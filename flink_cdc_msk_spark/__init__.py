"""flink_cdc_msk_spark — a PySpark-native engine with the capabilities of
yhyyz/flink-cdc-msk (reference snapshot at /root/reference, 2024-08-07).

The reference is a Flink DataStream CDC→Kafka routing pipeline; this package
re-expresses that surface Spark-first (DataFrame / Catalyst / Structured
Streaming) and closes the capability gap with a full relational operator
surface plus LLM-training-data-pipeline operators (dedup, similarity search,
text analysis) — see SURVEY.md §2 for the inventory.

Layout:
    config.py        table_pk routing config + job params (ParamsModel.scala,
                     MySQLCDC2AWSMSK.scala:71-86 semantics)
    envelope.py      Debezium / Mongo change-stream envelope schemas (§1.1-1.3)
    session.py       tuned SparkSession builder
    functions/       java_hash (partitioner parity), text, vectors
    operators/       route (the core parse-route-truncate operator), dedup,
                     similarity, asof, compaction, topk
    sources/         relational table loaders, CDC event synthesis, jdbc/kafka
    sinks/           kafka column assembly
    streaming/       structured-streaming pipelines, windows, restart supervisor
    plans/           the named query registry consumed by __spark_entry__.py
"""

__version__ = "0.1.0"
