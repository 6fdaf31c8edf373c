"""CDC latest-state compaction as a streaming sink (SURVEY.md Part B
CDC-specific row: "latest-row materialization / foreachBatch merge").

Each micro-batch of routed change events is merged into a materialized
table: newest ``ts_ms`` per primary key wins, deletes remove the key —
the streaming twin of plans/cdc_queries.cdc_latest_state.

The local sink is a parquet directory rewritten per batch (fine for tests;
the batch is the unit of atomicity). On a production lake the body of
``_merge_batch`` becomes a MERGE INTO against Delta/Iceberg/Hudi — the
dataflow (group to latest per key inside the batch, then upsert) is
identical, and that per-batch pre-compaction is what keeps the MERGE's
shuffle proportional to the *batch*, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..envelope import MYSQL_ENVELOPE_COMPACT_SCHEMA


def parse_change_events(batch: DataFrame, pk_cols: list[str]) -> DataFrame:
    """Envelope JSON lines → (pk..., op, ts_ms, payload map) — delete-aware
    key extraction (before for d, after otherwise; scala:113-121)."""
    env = F.from_json("value", MYSQL_ENVELOPE_COMPACT_SCHEMA).alias("env")
    side = F.when(F.col("env.op") == "d", F.col("env.before")).otherwise(
        F.col("env.after")
    )
    cols = [
        F.try_element_at(side, F.lit(c)).alias(c) for c in pk_cols
    ]
    return batch.select(env).select(
        *cols,
        F.col("env.op").alias("op"),
        F.col("env.ts_ms").alias("ts_ms"),
        F.when(F.col("env.op") == "d", F.col("env.before"))
        .otherwise(F.col("env.after"))
        .alias("payload"),
    )


def latest_per_key(df: DataFrame, pk_cols: list[str]) -> DataFrame:
    """Newest change per key (ties broken toward deletes-last is not needed:
    ts_ms is strictly increasing per key in CDC order)."""
    w = Window.partitionBy(*pk_cols).orderBy(F.col("ts_ms").desc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")


class ParquetUpsertSink:
    """foreachBatch target: maintains a latest-state parquet table.

    ``num_buckets=N`` partitions the state table by ``pmod(xxhash64(pk),
    N)`` and each batch rewrites ONLY the buckets containing changed keys
    (dynamic partition overwrite + partition-pruned read of the current
    state). With B buckets and a batch touching k of them, merge I/O drops
    from O(table) to O(table·k/B) — the property that keeps continuous
    compaction affordable when the table is 1000× the batch. ``None``
    keeps the simple full-rewrite (fine for small state)."""

    def __init__(
        self, path: str, pk_cols: list[str], num_buckets: int | None = None
    ):
        self.path = path
        self.pk_cols = pk_cols
        self.num_buckets = num_buckets

    def _bucket(self) -> F.Column:
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in self.pk_cols]),
            F.lit(self.num_buckets),
        ).cast("int")

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        changes = latest_per_key(
            parse_change_events(batch, self.pk_cols), self.pk_cols
        )
        if self.num_buckets is None:
            self._merge_full(spark, changes)
        else:
            self._merge_bucketed(spark, changes)

    def _merge_full(self, spark, changes: DataFrame) -> None:
        try:
            current = spark.read.parquet(self.path)
            merged = latest_per_key(
                current.unionByName(changes), self.pk_cols
            )
        except Exception:  # first batch: no table yet
            merged = changes
        live = merged.filter(F.col("op") != "d")
        # stage-then-swap via overwrite; batch-atomic like a MERGE commit
        live.cache()
        live.count()
        live.write.mode("overwrite").parquet(self.path)
        live.unpersist()

    def _merge_bucketed(self, spark, changes: DataFrame) -> None:
        changes = changes.withColumn("bucket", self._bucket()).cache()
        touched = [r.bucket for r in changes.select("bucket").distinct().collect()]
        try:
            current = spark.read.parquet(self.path).filter(
                F.col("bucket").isin(touched)  # partition-pruned read
            )
            merged = latest_per_key(
                current.unionByName(changes), self.pk_cols
            )
        except Exception:  # first batch: no table yet
            merged = changes
        live = merged.filter(F.col("op") != "d")
        live.cache()
        live.count()
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # dynamic mode replaces ONLY the bucket= dirs present in `live`
            live.write.mode("overwrite").partitionBy("bucket").parquet(
                self.path
            )
            # a touched bucket whose keys were ALL deleted has no rows in
            # `live` → dynamic overwrite skips it and stale rows would
            # survive; explicitly empty those dirs
            live_buckets = {
                r.bucket for r in live.select("bucket").distinct().collect()
            }
            for b in set(touched) - live_buckets:
                live.filter(F.lit(False)).drop("bucket").write.mode(
                    "overwrite"
                ).parquet(f"{self.path}/bucket={b}")
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
            live.unpersist()
            changes.unpersist()


def start_compaction_stream(
    routed_stream: DataFrame,
    sink: ParquetUpsertSink,
    checkpoint: str,
    available_now: bool = False,
):
    writer = (
        routed_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
