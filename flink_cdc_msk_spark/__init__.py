"""flink_cdc_msk_spark — a PySpark-native engine with the capabilities of
yhyyz/flink-cdc-msk (reference snapshot at /root/reference, 2024-08-07).

The reference is a Flink DataStream CDC→Kafka routing pipeline; this package
re-expresses that surface Spark-first (DataFrame / Catalyst / Structured
Streaming) and closes the capability gap with a full relational operator
surface plus LLM-training-data-pipeline operators (dedup, similarity search,
text analysis) — see SURVEY.md §2 for the inventory.

Layout:
    config.py        table_pk routing config + job params (ParamsModel.scala,
                     MySQLCDC2AWSMSK.scala:71-86 semantics) + startup positions
    envelope.py      Debezium / Mongo change-stream envelope schemas (§1.1-1.3)
    session.py       tuned SparkSession builder (AQE, broadcast, RocksDB knob)
    functions/       java_hash (partitioner parity), text (tokens/shingles/
                     fingerprints), type_norm (Debezium type flattening, A35)
    operators/       route (the core parse-route-truncate operator), dedup
                     (exact/jaccard/minhash-LSH/simhash), similarity (top-k/
                     pair-scan/hyperplane-LSH/IVF/k-means), multimodal
                     (binary columns + stubbed codecs), skew (salted joins)
    sources/         relational table loaders, CDC event synthesis (MySQL +
                     Mongo), chunked jdbc snapshot, kafka stream options
    sinks/           kafka column assembly (key/value/topic/partition)
    streaming/       pipelines, watermarked windows, applyInPandasWithState,
                     foreachBatch compaction, restart supervisor
    plans/           the named query registry consumed by __spark_entry__.py

See COVERAGE.md for the SURVEY §2 row-by-row map and PERF.md for the
measured optimization notes.
"""

__version__ = "0.1.0"
