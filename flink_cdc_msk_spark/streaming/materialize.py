"""Session-scoped streaming materialization.

Registered streaming queries must hand the driver a DataFrame it can
aggregate/hash AFTER the query function returns — so the round-1 shape
(memory sink → ``createDataFrame(collect())`` before deleting the temp
dir) put the whole stream output on the driver twice. Instead: run the
availableNow stream into a parquet sink under a temp dir that lives
until interpreter exit, and return the batch scan. The result flows
executor-side; the driver only ever sees what IT chooses to collect.

Two shapes:

- :func:`stream_to_parquet` — append-mode file sink, for stateless /
  append-capable streams (exactly-once per Spark's file-sink commit log).
- :func:`stream_foreach_batch_parquet` — ``foreachBatch`` appending each
  micro-batch, for update-mode stateful streams that file sinks cannot
  take directly. Idempotent per batch: each batch writes to a
  ``batch_id``-named subdirectory with overwrite semantics, so a retried
  batch replaces its own output instead of duplicating rows.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_LIVE_DIRS: list[str] = []


def _cleanup() -> None:
    for d in _LIVE_DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup)


def await_or_raise(query, timeout_sec: int = 300) -> None:
    """``awaitTermination(t)`` returns False on timeout with the query
    STILL RUNNING — a caller that then reads the sink races the writer
    and can pass its own sanity checks on silently-partial output. Every
    availableNow materialization in this repo must fail loudly instead."""
    if not query.awaitTermination(timeout_sec):
        query.stop()
        raise TimeoutError(
            f"streaming query {query.name or query.id} did not finish "
            f"within {timeout_sec}s — refusing to read a partial sink"
        )


def session_tmpdir(prefix: str) -> str:
    """A temp dir removed at interpreter exit, not at function return —
    scan results stay readable for the caller's whole session."""
    d = tempfile.mkdtemp(prefix=prefix)
    _LIVE_DIRS.append(d)
    return d


def stream_to_parquet(
    df: DataFrame, base_dir: str, timeout_sec: int = 300
) -> DataFrame:
    """Run an append-capable stream to a parquet file sink with an
    availableNow trigger and return the batch scan of the output."""
    q = (
        df.writeStream.format("parquet")
        .option("path", f"{base_dir}/out")
        .option("checkpointLocation", f"{base_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, timeout_sec)
    return df.sparkSession.read.parquet(f"{base_dir}/out")


def stream_foreach_batch_parquet(
    df: DataFrame,
    base_dir: str,
    output_mode: str = "update",
    timeout_sec: int = 300,
) -> DataFrame:
    """Run an update-mode stream via ``foreachBatch``, appending each
    micro-batch under ``out/batch_id=N`` (overwrite per batch → replays
    are idempotent), and return the scan of all batches. Downstream
    consumers see every emitted update row, exactly as the memory sink
    did — ``batch_id`` rides along for per-batch reasoning."""

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        bdf.write.mode("overwrite").parquet(f"{base_dir}/out/batch_id={batch_id}")

    q = (
        df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", f"{base_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q, timeout_sec)
    spark: SparkSession = df.sparkSession
    return spark.read.option("basePath", f"{base_dir}/out").parquet(
        f"{base_dir}/out"
    )
