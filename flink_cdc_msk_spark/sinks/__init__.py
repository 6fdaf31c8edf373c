from .kafka import to_kafka_columns, write_stream_kafka

__all__ = ["to_kafka_columns", "write_stream_kafka"]
