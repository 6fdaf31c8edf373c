"""Store compaction hook (round 9): folding old batch_id generations
into the base partition must change file layout ONLY — the gate's
admit/reject decisions are identical on the compacted store."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_cdc_msk_spark.streaming.store_maint import (
    COMPACTED_ID,
    compact_store,
)
from flink_cdc_msk_spark.streaming.substring_stream import (
    StreamingSubstringDedupFilter,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _feed(spark, root, batches):
    filt = StreamingSubstringDedupFilter(
        f"{root}/store", f"{root}/out", tau=0.5
    )
    for i, rows in enumerate(batches):
        filt(_docs(spark, rows), i)
    return filt


def test_compaction_preserves_gate_decisions(spark, tmp_path):
    base = "the quick brown fox jumps over the lazy dog " * 4
    uniq = [
        f"document number {i} with its own distinctive content "
        f"{'x' * (i % 7)} {i * 1234567} " * 3
        for i in range(12)
    ]
    batches = [
        [(0, base), (1, uniq[0]), (2, uniq[1])],
        [(3, uniq[2]), (4, uniq[3])],
        [(5, base), (6, uniq[4])],          # 5 = clone of 0 -> reject
        [(7, uniq[5]), (8, uniq[6])],
        [(9, base + uniq[7])],
    ]
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    _feed(spark, a, batches)
    _feed(spark, b, batches)

    stats = compact_store(spark, f"{b}/store", upto=4)
    assert stats["before_dirs"] >= 3
    assert stats["after_dirs"] < stats["before_dirs"]
    assert os.path.isdir(f"{b}/store/batch_id={COMPACTED_ID}")

    # same next batch through both stores -> identical decisions
    nxt = [(20, base), (21, uniq[8]), (22, uniq[0])]
    fa = StreamingSubstringDedupFilter(f"{a}/store", f"{a}/out", tau=0.5)
    fb = StreamingSubstringDedupFilter(f"{b}/store", f"{b}/out", tau=0.5)
    fa(_docs(spark, nxt), 10)
    fb(_docs(spark, nxt), 10)
    out_a = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{a}/out").filter(
            F.col("batch_id") == 10
        ).collect()
    )
    out_b = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{b}/out").filter(
            F.col("batch_id") == 10
        ).collect()
    )
    assert out_a == out_b
    assert 20 not in out_a  # the base clone is still rejected
    assert 21 in out_a      # fresh content still admitted


def test_double_compaction_idempotent(spark, tmp_path):
    root = str(tmp_path / "s")
    _feed(
        spark,
        root,
        [
            [(0, f"alpha beta gamma delta {i} " * 6)]
            for i in range(4)
        ],
    )
    s1 = compact_store(spark, f"{root}/store", upto=3)
    total = spark.read.parquet(f"{root}/store").count()
    s2 = compact_store(spark, f"{root}/store", upto=3)
    assert spark.read.parquet(f"{root}/store").count() == total
    assert s1["rows"] >= s2["rows"]


def _crash_state(spark, tmp_path, stage):
    """Build a live store, then reproduce compact_store's on-disk state
    as of a crash at `stage` ('pre_manifest' | 'mid_swap' |
    'pre_rename_in' | 'post_promote')."""
    import json as _json
    import shutil

    root = str(tmp_path / f"crash_{stage}")
    _feed(
        spark,
        root,
        [[(i, f"crash corpus doc {i} {'q' * (i % 5)} " * 8)] for i in range(5)],
    )
    store = f"{root}/store"
    upto = 4
    dirs = sorted(
        d
        for d in os.listdir(store)
        if d.startswith("batch_id=") and int(d.split("=")[1]) < upto
    )
    state = spark.read.option("basePath", store).parquet(store)
    old = state.filter(F.col("batch_id") < upto).drop("batch_id")
    tmp = f"{store}.compact_tmp"
    old.repartition(1).write.mode("overwrite").parquet(tmp)
    if stage == "pre_manifest":
        return root, store
    with open(f"{store}/.compact_manifest.json", "w") as fh:
        _json.dump({"upto": upto, "folded": dirs}, fh)
    if stage == "pre_rename_in":
        return root, store
    os.rename(tmp, f"{store}/batch_id=-2")
    if stage == "mid_swap":
        # crash after deleting SOME of the superseded dirs
        shutil.rmtree(os.path.join(store, dirs[0]))
        shutil.rmtree(os.path.join(store, dirs[1]))
        return root, store
    for d in dirs:
        shutil.rmtree(os.path.join(store, d))
    os.rename(f"{store}/batch_id=-2", f"{store}/batch_id=-1")
    # crash before manifest removal
    return root, store


def _store_keys(spark, store):
    df = spark.read.option("basePath", store).parquet(store)
    key_cols = [c for c in df.columns if c != "batch_id"]
    return sorted(
        tuple(r[c] for c in key_cols)
        for r in df.select(*key_cols).distinct().collect()
    )


def test_recover_store_every_crash_point(spark, tmp_path):
    """ADVICE r9 (medium): a crash anywhere inside the swap must never
    lose admitted state. For each crash point, recovery restores a
    store whose DISTINCT row set equals the uncompacted original's."""
    from flink_cdc_msk_spark.streaming.store_maint import recover_store

    # ground truth: same feed, never compacted
    ref_root = str(tmp_path / "ref")
    _feed(
        spark,
        ref_root,
        [[(i, f"crash corpus doc {i} {'q' * (i % 5)} " * 8)] for i in range(5)],
    )
    truth = _store_keys(spark, f"{ref_root}/store")

    expected = {
        "pre_manifest": "rolled_back",
        "pre_rename_in": "rolled_back",
        "mid_swap": "completed",
        "post_promote": "completed",
    }
    for stage, want in expected.items():
        root, store = _crash_state(spark, tmp_path, stage)
        assert recover_store(store) == want, stage
        assert not os.path.exists(f"{store}.compact_tmp"), stage
        assert not os.path.exists(f"{store}/.compact_manifest.json"), stage
        assert not os.path.isdir(f"{store}/batch_id=-2"), stage
        assert _store_keys(spark, store) == truth, stage
        # a fresh compaction over the recovered store succeeds
        compact_store(spark, store, upto=5)
        assert _store_keys(spark, store) == truth, stage
        assert recover_store(store) == "clean", stage


def test_compact_entry_recovers_interrupted_swap(spark, tmp_path):
    """compact_store itself must self-heal: calling it on a mid-swap
    crashed store completes the old swap first, then compacts."""
    root, store = _crash_state(spark, tmp_path, "mid_swap")
    stats = compact_store(spark, store, upto=5)
    assert stats["after_dirs"] <= 2
    assert os.path.isdir(f"{store}/batch_id={COMPACTED_ID}")
    assert not os.path.exists(f"{store}/.compact_manifest.json")


def _vecs(spark, rows):
    """rows: [(vec_id, hot_dim)] — one-hot 64-dim vectors: distinct dims
    are exactly orthogonal (cos 0), same dim = exact clone (cos 1)."""
    data = [
        (vid, [1.0 if i == dim else 0.0 for i in range(64)])
        for vid, dim in rows
    ]
    return spark.createDataFrame(data, "vec_id long, embedding array<double>")


def _feed_vec(spark, root, batches):
    from flink_cdc_msk_spark.streaming.dedup_stream import (
        StreamingVectorNearDupFilter,
    )

    filt = StreamingVectorNearDupFilter(f"{root}/store", f"{root}/out")
    for i, rows in enumerate(batches):
        filt(_vecs(spark, rows), i)
    return filt


def test_vector_store_compaction_preserves_gate_decisions(spark, tmp_path):
    """VERDICT r9 item 5: the vector near-dup ingest store (unified
    kind=bucket/kind=vec layout) compacts with admit decisions
    unchanged, and the folded base keeps the kind= sub-partitioning."""
    from flink_cdc_msk_spark.streaming.dedup_stream import (
        StreamingVectorNearDupFilter,
    )

    batches = [
        [(0, 0), (1, 1), (2, 2)],
        [(3, 3), (4, 4)],
        [(5, 0), (6, 5)],   # 5 = clone of vec 0 -> reject
        [(7, 6), (8, 7)],
        [(9, 8)],
    ]
    a = str(tmp_path / "va")
    b = str(tmp_path / "vb")
    _feed_vec(spark, a, batches)
    _feed_vec(spark, b, batches)

    stats = compact_store(spark, f"{b}/store", upto=4)
    assert stats["before_dirs"] >= 3
    assert stats["after_dirs"] < stats["before_dirs"]
    assert os.path.isdir(f"{b}/store/batch_id={COMPACTED_ID}/kind=bucket")
    assert os.path.isdir(f"{b}/store/batch_id={COMPACTED_ID}/kind=vec")

    nxt = [(20, 0), (21, 40), (22, 3)]  # clone of 0, fresh, clone of 3
    fa = StreamingVectorNearDupFilter(f"{a}/store", f"{a}/out")
    fb = StreamingVectorNearDupFilter(f"{b}/store", f"{b}/out")
    fa(_vecs(spark, nxt), 10)
    fb(_vecs(spark, nxt), 10)
    out = {}
    for tag, root in (("a", a), ("b", b)):
        out[tag] = sorted(
            r.vec_id
            for r in spark.read.parquet(f"{root}/out").filter(
                F.col("batch_id") == 10
            ).collect()
        )
    assert out["a"] == out["b"]
    assert 20 not in out["a"] and 22 not in out["a"]  # clones rejected
    assert 21 in out["a"]                              # fresh admitted
