"""Custom Spark 4 Python DataSource for Debezium-envelope JSONL files.

The reference consumes Debezium change events through an embedded CDC
client (MySQLCDC2AWSMSK.scala:224-274). In batch/backfill settings the
same envelopes arrive as JSON-lines dumps (Kafka topic archives, DMS
S3 drops). This source reads such files through Spark's Python
DataSource API (SPARK-44076, public since 4.0) so envelope dumps mount
as a first-class table:

    spark.dataSource.register(DebeziumJsonlDataSource)
    df = (spark.read.format("debezium_jsonl")
          .option("path", "/data/topic-dump").load())

Schema (fixed, table-agnostic like ``envelope.py``): op, ts_ms, db,
table, before_json, after_json — payload stays raw JSON strings so the
downstream route/compaction operators (which own per-table typing)
apply unchanged.

Scale shape: one InputPartition PER FILE — a topic archive is many
part files, so read parallelism follows file count exactly like the
built-in text source; no driver-side parsing (files are opened inside
``read`` on executors). Malformed lines surface with op='__malformed__'
instead of being dropped — the same quarantine contract as
``route.py``'s ``_finish``.

This is deliberately the slow-but-flexible path: the hot CDC pipeline
parses envelopes JVM-side via ``from_json`` (plans/cdc_queries.py).
The custom source exists for format completeness — odd encodings,
multi-line frames, pre-filters — where Python-level control wins.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

ENVELOPE_SCHEMA = StructType(
    [
        StructField("op", StringType()),
        StructField("ts_ms", LongType()),
        StructField("db", StringType()),
        StructField("table", StringType()),
        StructField("before_json", StringType()),
        StructField("after_json", StringType()),
    ]
)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class DebeziumJsonlReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("debezium_jsonl: 'path' option is required")

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith((".json", ".jsonl", ".txt"))
            )
        else:
            files = [self.path]
        return [_FilePartition(f) for f in files]

    def read(self, partition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    env = json.loads(line)
                    src = env.get("source") or {}
                    before = env.get("before")
                    after = env.get("after")
                    yield (
                        env.get("op"),
                        env.get("ts_ms"),
                        src.get("db"),
                        src.get("table"),
                        None if before is None else json.dumps(before),
                        None if after is None else json.dumps(after),
                    )
                except (ValueError, AttributeError):
                    yield ("__malformed__", None, None, None, None, line)


class DebeziumJsonlDataSource(DataSource):
    @classmethod
    def name(cls):
        return "debezium_jsonl"

    def schema(self):
        return ENVELOPE_SCHEMA

    def reader(self, schema):
        return DebeziumJsonlReader(self.options)


def register(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(DebeziumJsonlDataSource)
