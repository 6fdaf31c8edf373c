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
