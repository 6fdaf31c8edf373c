"""Sharded training-data export (LLM-pipeline surface).

Training jobs consume fixed-cardinality shards with a manifest (so loaders
can assign shards to workers without listing storage). The shard id is a
deterministic id hash — same rows land in the same shard on any cluster,
partitioning, or retry — and the write is one hash repartition + a
partitioned write (each shard is one directory, one task, no small-file
spray). The manifest is computed from the SAME dataframe in the same job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_shard(df: DataFrame, n_shards: int, id_col: str) -> DataFrame:
    return df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("int")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Write ``df`` as ``path/shard=K/`` parquet dirs plus a manifest at
    ``path/_manifest`` with (shard, rows). Returns the manifest DataFrame.

    One shuffle (repartition on shard) so each shard writes from one task
    as one file-set; at scale pair with maxRecordsPerFile to bound file
    size inside a shard.

    A pre-existing ``shard`` column is honored as-is (callers that need a
    different deterministic hash — e.g. the oracle-reproducible Knuth
    bucket from operators/sampling — shard upstream)."""
    keyed = df if "shard" in df.columns else with_shard(df, n_shards, id_col)
    sharded = keyed.repartition(n_shards, F.col("shard"))
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
    manifest = keyed.groupBy("shard").agg(F.count(F.lit(1)).alias("rows"))
    manifest.write.mode("overwrite").parquet(f"{path}/_manifest")
    return manifest
