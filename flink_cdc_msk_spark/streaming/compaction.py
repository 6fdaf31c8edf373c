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


def read_parquet_or_none(spark, path: str) -> DataFrame | None:
    """Scan of a parquet state table, or None before its first write.
    Only a genuinely-missing path means 'first batch' — any other read
    failure (partial table after a crash, corrupt footer) re-raises
    instead of silently discarding the state."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise


def stage_and_swap_buckets(path: str, live: DataFrame, touched) -> None:
    """Stage ONLY the touched pk-hash buckets of a state table, then swap
    each bucket dir in: replaced buckets point at the staged write; a
    touched bucket whose keys all vanished has no staged dir → its dir is
    removed. I/O stays O(touched buckets), and the live table is never
    read-and-overwritten in the same job."""
    import os
    import shutil

    stage = f"{path}__stage"
    shutil.rmtree(stage, ignore_errors=True)
    live.write.mode("overwrite").partitionBy("bucket").parquet(stage)
    os.makedirs(path, exist_ok=True)
    for b in touched:
        src = f"{stage}/bucket={b}"
        dst = f"{path}/bucket={b}"
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.exists(src):
            os.rename(src, dst)
    shutil.rmtree(stage, ignore_errors=True)


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
        self,
        path: str,
        pk_cols: list[str],
        num_buckets: int | None = None,
        transform=None,
        retain_tombstones: bool = False,
    ):
        """``transform`` (optional): a DataFrame→DataFrame applied to each
        batch's latest-per-key changes BEFORE the merge — this is the
        incremental-view-maintenance hook (e.g. broadcast-join a dimension
        so the materialized state is the ENRICHED view; work stays
        proportional to the batch, the view is never recomputed from
        scratch).  Must be deterministic and key-preserving; deletes pass
        through it too, so enrichment joins must be left joins.

        ``retain_tombstones=False`` (default) drops deleted keys at merge
        time — correct ONLY under the per-key in-order arrival a keyed
        Kafka topic guarantees (an out-of-order earlier image arriving
        after the delete would silently resurrect the key).
        ``retain_tombstones=True`` keeps op='d' rows as tombstones, making
        the final state ORDER-INDEPENDENT (global latest per key, however
        the batches were split); readers filter ``op != 'd'`` for the
        live view, and at scale a TTL compaction retires old tombstones."""
        self.path = path
        self.pk_cols = pk_cols
        self.num_buckets = num_buckets
        self.transform = transform
        self.retain_tombstones = retain_tombstones

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
        if self.transform is not None:
            changes = self.transform(changes)
        if self.num_buckets is None:
            self._merge_full(spark, changes)
        else:
            self._merge_bucketed(spark, changes)

    def _read_current(self, spark) -> DataFrame | None:
        return read_parquet_or_none(spark, self.path)

    def _swap_in(self, stage: str) -> None:
        """Atomically (rename-level) replace the table dir with the staged
        write. The staged dir is fully committed before the old table is
        touched, so readers never see a partial table — the parquet
        stand-in for a MERGE commit. (Local-FS rename; on an object-store
        lake this sink is replaced by Delta/Iceberg MERGE anyway.)"""
        import os
        import shutil

        old = f"{self.path}__old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(stage, self.path)
        shutil.rmtree(old, ignore_errors=True)

    def _merge_full(self, spark, changes: DataFrame) -> None:
        current = self._read_current(spark)
        merged = (
            changes
            if current is None
            else latest_per_key(current.unionByName(changes), self.pk_cols)
        )
        live = (
            merged
            if self.retain_tombstones
            else merged.filter(F.col("op") != "d")
        )
        # stage to a NEW dir (the plan still reads the live table), then swap
        stage = f"{self.path}__stage"
        live.write.mode("overwrite").parquet(stage)
        self._swap_in(stage)

    def _merge_bucketed(self, spark, changes: DataFrame) -> None:
        changes = changes.withColumn("bucket", self._bucket()).cache()
        touched = [r.bucket for r in changes.select("bucket").distinct().collect()]
        current = self._read_current(spark)
        if current is None:
            merged = changes
        else:
            merged = latest_per_key(
                current.filter(
                    F.col("bucket").isin(touched)  # partition-pruned read
                ).unionByName(changes),
                self.pk_cols,
            )
        live = (
            merged
            if self.retain_tombstones
            else merged.filter(F.col("op") != "d")
        )
        try:
            stage_and_swap_buckets(self.path, live, touched)
        finally:
            changes.unpersist()


class Scd2IntervalSink:
    """foreachBatch target maintaining an SCD Type-2 HISTORY table — the
    streaming twin of plans/cdc_queries.cdc_scd2_intervals, and the
    history-table counterpart of ParquetUpsertSink's latest-state merge
    (together they are the two standard continuously-maintained CDC
    products; reference MySQLCDC2AWSMSK.scala:95-168 feeds both shapes).

    The interval rows double as the per-key change log (``valid_from``
    IS the change's ts_ms), so each batch can rebuild intervals for
    exactly the keys it touches: read the touched pk-hash buckets
    (partition-pruned), union the batch's parsed changes, drop duplicate
    (pk, ts_ms, op) triples, and re-run the lead() window per key.
    Merge I/O is O(touched buckets); window work is O(touched keys'
    history + batch), never O(table). Because the log is
    content-addressed by (pk, ts_ms, op), the maintained table is both
    retry-IDEMPOTENT and ORDER-INDEPENDENT — any slabbing of the feed,
    including hostile round-robin interleavings, converges to the same
    history (same property the tombstone-retaining latest-state merge
    provides, here for free since history keeps every change)."""

    def __init__(self, path: str, pk_cols: list[str], num_buckets: int = 8):
        self.path = path
        self.pk_cols = pk_cols
        self.num_buckets = num_buckets
        self.batch_ids: list[int] = []

    def _bucket(self) -> F.Column:
        return F.pmod(
            F.xxhash64(*[F.col(c) for c in self.pk_cols]),
            F.lit(self.num_buckets),
        ).cast("int")

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        self.batch_ids.append(batch_id)
        changes = (
            parse_change_events(batch, self.pk_cols)
            .withColumn("bucket", self._bucket())
            .cache()
        )
        touched = [
            r.bucket for r in changes.select("bucket").distinct().collect()
        ]
        if not touched:
            changes.unpersist()
            return
        log = changes.select(
            *self.pk_cols, "op", "ts_ms", "payload", "bucket"
        )
        current = read_parquet_or_none(spark, self.path)
        if current is not None:
            # a key's whole history lives in its hash bucket, so the
            # pruned read below sees every prior change of every touched
            # key — the window recompute is exact, not incremental-lossy
            log = log.unionByName(
                current.filter(F.col("bucket").isin(touched)).select(
                    *self.pk_cols,
                    "op",
                    F.col("valid_from").alias("ts_ms"),
                    "payload",
                    "bucket",
                )
            )
        log = log.dropDuplicates([*self.pk_cols, "ts_ms", "op"])
        # ("ts_ms", "op") tie-break: two ops at the same ts_ms (real in
        # CDC feeds) would otherwise make lead() nondeterministic across
        # runs; mirrored in the cdc_scd2/streaming_scd2 oracles
        w = Window.partitionBy(*self.pk_cols).orderBy("ts_ms", "op")
        valid_to = F.lead("ts_ms").over(w)
        live = log.select(
            *self.pk_cols,
            "op",
            F.col("ts_ms").alias("valid_from"),
            valid_to.alias("valid_to"),
            F.when(valid_to.isNull() & (F.col("op") != "d"), 1)
            .otherwise(0)
            .alias("is_current"),
            "payload",
            "bucket",
        )
        try:
            stage_and_swap_buckets(self.path, live, touched)
        finally:
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
