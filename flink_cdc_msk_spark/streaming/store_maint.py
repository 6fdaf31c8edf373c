"""Maintenance for the persistent streaming dedup stores (VERDICT r8
item 7; swap protocol hardened per ADVICE r9).

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
never collide with a replayed id.

Crash safety (ADVICE r9): the swap is *add-before-delete* with a
manifest. Order of operations:

1. write the folded base OUTSIDE the store (``<store>.compact_tmp``);
2. write ``<store>/.compact_manifest.json`` naming the folded dirs;
3. rename the tmp INTO the store as ``batch_id=-2`` (staging id) —
   from here the store always contains at least one full copy of
   every folded row (duplicates are harmless for the semi-join reads);
4. delete the superseded ``batch_id=N`` dirs;
5. rename ``batch_id=-2`` → ``batch_id=-1``;
6. remove the manifest.

A crash at any point is recovered by :func:`recover_store` (called on
entry): a leftover manifest tells it exactly which dirs were being
folded, and the staging dir — the only state that can hold the sole
copy — is never deleted, only promoted. Each individual step is a
single rename/unlink, atomic on a plain filesystem; on an object
store run compaction only while the stream is paused (documented
limitation — a manifest-committing table format is the production
answer there).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

COMPACTED_ID = -1  # the base generation; never a real micro-batch id
STAGING_ID = -2  # in-flight fold target during the swap; never read live
_MANIFEST = ".compact_manifest.json"


def _paths(store_path: str):
    return (
        f"{store_path}.compact_tmp",
        os.path.join(store_path, _MANIFEST),
        os.path.join(store_path, f"batch_id={STAGING_ID}"),
        os.path.join(store_path, f"batch_id={COMPACTED_ID}"),
    )


def recover_store(store_path: str) -> str:
    """Complete or roll back an interrupted :func:`compact_store` swap.
    Idempotent; safe to call on a clean store (no-op). Returns one of
    ``"clean" | "rolled_back" | "completed"`` for observability.

    * manifest absent: any leftover tmp predates the manifest write, so
      the store was never touched — drop the tmp (rolled_back).
    * manifest + staging dir present: the staging dir holds the full
      union of the folded rows; finish the swap (delete the named
      superseded dirs — idempotent — then promote staging to the base).
    * manifest present, staging absent, tmp present: crash before the
      rename-in; the store is untouched — drop tmp + manifest.
    * manifest present, neither staging nor tmp: the final promote
      already happened; just drop the manifest.
    """
    tmp, manifest, staging, base = _paths(store_path)
    if not os.path.exists(manifest):
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
            return "rolled_back"
        return "clean"
    with open(manifest) as fh:
        folded = json.load(fh)["folded"]
    if os.path.isdir(staging):
        for d in folded:
            shutil.rmtree(os.path.join(store_path, d), ignore_errors=True)
        os.rename(staging, base)
        os.remove(manifest)
        return "completed"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
        os.remove(manifest)
        return "rolled_back"
    os.remove(manifest)
    return "completed"


def compact_store(
    spark: SparkSession,
    store_path: str,
    upto: int,
    target_rows_per_file: int = 4_000_000,
    fold=None,
) -> dict:
    """Fold every ``batch_id < upto`` partition (including a previous
    base) into a single ``batch_id=-1`` base partition. Returns a small
    stats dict ({before_dirs, after_dirs, rows}) for observability.

    ``fold``, when given, is a ``DataFrame -> DataFrame`` reducer applied
    to the union of the superseded generations (``batch_id`` already
    dropped) before the base is written — e.g. the streaming
    source-overlap twin's per-source element-wise MIN, which shrinks the
    base to exactly ``n_sources`` rows. The caller must guarantee the
    reducer is LOSSLESS for every downstream read of the store: an
    algebraic aggregate (min/max/sum-of-counts) whose fold of partials
    equals the aggregate of the union — precisely the property
    ``test_round11_extras`` pins for MinHash minima. The crash-safety
    swap is unchanged: the folded base is fully written outside the
    store before any superseded dir is deleted, so :func:`recover_store`
    needs no knowledge of ``fold``.

    Only valid while the stream is stopped or between micro-batches of
    a paused query (see module docstring for why that is sufficient).
    Recovers any interrupted prior swap first (:func:`recover_store`)."""
    from .dedup_stream import _read_or_none

    if os.path.isdir(store_path):
        recover_store(store_path)
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
    if fold is not None:
        old = fold(old)
    n = old.count()
    # ceiling division (ADVICE r9): flooring let a 7.9M-row store compact
    # to one ~2x-target file; ceil keeps every file <= the target bound
    parts = max(1, -(-n // target_rows_per_file))
    tmp, manifest, staging, _ = _paths(store_path)
    # preserve any sub-partitioning below batch_id (the unified near-dup
    # stores write kind={band,set} / kind={bucket,vec} dirs): partition
    # discovery requires a homogeneous directory depth, so the folded
    # base must keep the same nested layout the live generations have
    sub_parts = sorted(
        {
            e.split("=")[0]
            for e in os.listdir(os.path.join(store_path, dirs[0]))
            if "=" in e and not e.startswith(".")
        }
    )
    # tmp cannot exist here: recover_store above removed any leftover
    writer = old.repartition(parts).write.mode("overwrite")
    if sub_parts:
        writer = writer.partitionBy(*sub_parts)
    writer.parquet(tmp)
    with open(manifest, "w") as fh:
        json.dump({"upto": upto, "folded": dirs}, fh)
    os.rename(tmp, staging)  # from here every folded row is IN the store
    for d in dirs:
        shutil.rmtree(os.path.join(store_path, d))
    os.rename(staging, os.path.join(store_path, f"batch_id={COMPACTED_ID}"))
    os.remove(manifest)
    after = len(
        [d for d in os.listdir(store_path) if d.startswith("batch_id=")]
    )
    return {"before_dirs": len(dirs), "after_dirs": after, "rows": n}
