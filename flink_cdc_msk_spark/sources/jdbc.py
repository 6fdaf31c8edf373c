"""Chunked JDBC snapshot source (SURVEY.md A1 snapshot phase, A7/A8).

The reference's lock-free incremental snapshot splits tables into
``chunk_size``-row chunks read in parallel (``splitSize``,
MySQLCDC2AWSMSK.scala:255-258,271). Spark's JDBC partitioned read is the
same strategy: partitionColumn/lowerBound/upperBound/numPartitions —
each partition issues a bounded range scan, so the snapshot parallelizes
across executors and no chunk exceeds executor memory (the reference's
OOM knob, README.md:18,48).

No MySQL exists in the test container; option assembly is unit-tested and
the snapshot path is exercised via parquet stand-ins (sources/cdc_sim.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import CDCParams


def jdbc_snapshot_options(
    params: CDCParams,
    url: str,
    table: str,
    pk_col: str,
    lower: int,
    upper: int,
) -> dict[str, str]:
    """Partitioned-read options sized so each partition ≈ chunk_size rows
    (A7); partition count also bounded by ``parallel`` (A8's server-id
    range ⇒ reader count)."""
    rows = max(upper - lower + 1, 1)
    by_chunk = max(rows // max(params.chunk_size, 1), 1)
    num_partitions = max(min(by_chunk, params.parallel * 4), 1)
    return {
        "url": url,
        "dbtable": table,
        "partitionColumn": pk_col,
        "lowerBound": str(lower),
        "upperBound": str(upper),
        "numPartitions": str(num_partitions),
        "fetchsize": str(min(params.chunk_size, 10000)),
        "sessionInitStatement": (
            f"SET time_zone = '{params.server_time_zone}'"  # A9 parity
        ),
    }


def read_snapshot(
    spark: SparkSession,
    params: CDCParams,
    url: str,
    table: str,
    pk_col: str,
    lower: int,
    upper: int,
) -> DataFrame:
    reader = spark.read.format("jdbc")
    for k, v in jdbc_snapshot_options(
        params, url, table, pk_col, lower, upper
    ).items():
        reader = reader.option(k, v)
    return reader.load()
