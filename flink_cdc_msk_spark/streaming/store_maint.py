"""Maintenance for the persistent streaming dedup stores (VERDICT r8
item 7).

The near-dup and substring ingest gates persist admitted state as
``store_path/batch_id=N/...`` parquet, one directory per micro-batch
(retry-idempotent overwrite writes). Per-batch JOIN work is bounded by
key collisions (the band/tile joins are key-pruned), but the store's
FILE population grows forever on a long-lived stream: thousands of
batch_id directories mean per-batch listing + footer-read + task-setup
costs that creep even when the joined row volume is flat. Compaction
folds old generations into one base partition so the file count stays
O(corpus/target_file_rows) instead of O(batches).

Safety contract: ``upto`` must be <= the newest batch the CHECKPOINT
has committed. foreachBatch can only replay the LAST uncommitted batch
after a failure, and the self-exclusion read (``batch_id != current``)
only needs to distinguish the CURRENT batch's own rows — folding
strictly-older batches into the base partition (COMPACTED_ID) can
never collide with a replayed id. Run it from the supervisor between
restarts or on a maintenance tick; on a plain filesystem the final
directory swap is rename-atomic, on an object store run it only while
the stream is paused (documented limitation — a manifest-committing
table format is the production answer there).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

COMPACTED_ID = -1  # the base generation; never a real micro-batch id


def compact_store(
    spark: SparkSession,
    store_path: str,
    upto: int,
    target_rows_per_file: int = 4_000_000,
) -> dict:
    """Fold every ``batch_id < upto`` partition (including a previous
    base) into a single ``batch_id=-1`` base partition. Returns a small
    stats dict ({before_dirs, after_dirs, rows}) for observability.

    Only valid while the stream is stopped or between micro-batches of
    a paused query (see module docstring for why that is sufficient)."""
    from .dedup_stream import _read_or_none

    state = _read_or_none(spark, store_path)
    if state is None:
        return {"before_dirs": 0, "after_dirs": 0, "rows": 0}
    dirs = [
        d
        for d in os.listdir(store_path)
        if d.startswith("batch_id=")
        and int(d.split("=")[1]) < upto
    ]
    if len(dirs) <= 1:
        return {"before_dirs": len(dirs), "after_dirs": len(dirs), "rows": 0}

    old = state.filter(F.col("batch_id") < upto).drop("batch_id")
    n = old.count()
    parts = max(1, n // target_rows_per_file)
    tmp = f"{store_path}.compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    # write the new base OUTSIDE the store so a crash mid-write leaves
    # the live store untouched; the swap below is directory renames
    old.repartition(parts).write.mode("overwrite").parquet(tmp)
    for d in dirs:
        shutil.rmtree(os.path.join(store_path, d))
    os.rename(tmp, os.path.join(store_path, f"batch_id={COMPACTED_ID}"))
    after = len(
        [d for d in os.listdir(store_path) if d.startswith("batch_id=")]
    )
    return {"before_dirs": len(dirs), "after_dirs": after, "rows": n}
