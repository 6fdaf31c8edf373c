"""Round-12: streaming pHash near-dup ingest — the perceptual-image
member of the streaming ingest family. Unit-level: cross-batch
rejection against the persistent store, within-batch smaller-id-wins
dedup, store append shape. End-to-end + oracle: the registered
`streaming_phash_neardup_ingest` row in tests/test_queries_oracle.py."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from flink_cdc_msk_spark.functions.codecs import encode_png, encode_ppm


def _img_payload(seed: int, png: bool) -> bytes:
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    return encode_png(img, row_filters=[y % 5 for y in range(32)]) if png \
        else encode_ppm(img)


def test_phash_filter_cross_and_intra_batch(spark, tmp_path):
    from flink_cdc_msk_spark.streaming.dedup_stream import (
        StreamingPhashNearDupFilter,
    )

    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    filt = StreamingPhashNearDupFilter(store, out)

    # batch 0: asset 1 (PPM) and asset 2 (distinct PNG) -> both admitted;
    # asset 3 = SAME pixels as asset 1 but PNG-encoded -> format-invariant
    # hash, hamming 0, within-batch smaller id wins (3 rejected)
    p1 = _img_payload(1, png=False)
    p2 = _img_payload(2, png=True)
    rng = np.random.default_rng(1)
    img1 = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    p3 = encode_png(img1, rgb=True, row_filters=2)
    b0 = spark.createDataFrame(
        [(1, bytearray(p1)), (2, bytearray(p2)), (3, bytearray(p3))],
        "media_id long, payload binary",
    )
    filt(b0, 0)
    admitted0 = {
        r.media_id
        for r in spark.read.parquet(f"{out}/batch_id=0").collect()
    }
    assert admitted0 == {1, 2}

    # batch 1: asset 4 = asset 2's pixels re-encoded as PPM -> rejected
    # against the STORE (cross-batch, cross-format); asset 5 fresh ->
    # admitted
    rng = np.random.default_rng(2)
    img2 = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    b1 = spark.createDataFrame(
        [
            (4, bytearray(encode_ppm(img2))),
            (5, bytearray(_img_payload(5, png=True))),
        ],
        "media_id long, payload binary",
    )
    filt(b1, 1)
    admitted1 = {
        r.media_id
        for r in spark.read.parquet(f"{out}/batch_id=1").collect()
    }
    assert admitted1 == {5}

    # store holds 7 band rows per admitted asset, full hash inline
    state = spark.read.parquet(store)
    assert set(state.columns) >= {"id", "band", "band_v", "h", "batch_id"}
    counts = {
        r.id: r.n
        for r in state.groupBy("id").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {1: 7, 2: 7, 5: 7}


def test_phash_filter_batch_id_replay_overwrite(spark, tmp_path):
    """Re-running a batch_id (foreachBatch at-least-once semantics)
    must not double-count its own prior rows as 'store' — the
    batch_id != current filter plus mode=overwrite make replay
    idempotent."""
    from flink_cdc_msk_spark.streaming.dedup_stream import (
        StreamingPhashNearDupFilter,
    )

    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    filt = StreamingPhashNearDupFilter(store, out)
    b = spark.createDataFrame(
        [(1, bytearray(_img_payload(1, png=False)))],
        "media_id long, payload binary",
    )
    filt(b, 0)
    filt(b, 0)  # replay: would self-reject if its own rows counted
    admitted = {
        r.media_id
        for r in spark.read.parquet(f"{out}/batch_id=0").collect()
    }
    assert admitted == {1}
    assert spark.read.parquet(store).count() == 7
