#!/usr/bin/env python
"""Flat-cost steady-state run for the round-12 pHash streaming ingest
(the §32/§35/§44 evidence shape, applied to the fourth dedup twin):
drive ``StreamingPhashNearDupFilter.__call__`` — the literal
foreachBatch body the registered query runs — over N media batches,
compacting the band store every COMPACT_EVERY batches with
``store_maint.compact_store`` (no fold: the store is append-only
admitted state, lossless by union).

Per batch, record:

* wall seconds (decode+hash, store band join, within-batch dedup,
  admit write);
* live ``batch_id=`` generation count after the batch (compaction must
  keep this <= COMPACT_EVERY + 1);
* stored band rows (7 x admitted assets — grows only with ADMITTED
  corpus, the semantics of unbounded-lookback dedup, not with batch
  count).

Flatness claim: per-batch wall is bounded by arriving-batch size x
store-collision fan-in, not by batch index; the first/second-half
medians quantify it. Payload synthesis (mixed PPM/PNG via
``mixed_encode``) is part of the measured batch — the 100 TB analog is
the media-lake scan feeding the filter.

Usage:
  SPARK_GRAFT_DRIVER_MEM=16g python tools/phash_ingest_steady_state.py \
      /root/testdata/sf0.1 24
Prints one RESULT json line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMPACT_EVERY = int(os.environ.get("COMPACT_EVERY", "6"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    from pyspark.sql import functions as F

    from flink_cdc_msk_spark.plans.round12_extras import mixed_encode
    from flink_cdc_msk_spark.functions.phash import synthetic_cells
    from flink_cdc_msk_spark.session import get_spark
    from flink_cdc_msk_spark.sources.tables import load_tables
    from flink_cdc_msk_spark.streaming.dedup_stream import (
        StreamingPhashNearDupFilter,
    )
    from flink_cdc_msk_spark.streaming.store_maint import compact_store

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="phash_ingest_steady_state",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    root = f"/tmp/phash_steady_{os.getpid()}"
    store, out = f"{root}/store", f"{root}/out"
    os.makedirs(root, exist_ok=True)
    filt = StreamingPhashNearDupFilter(store, out)

    batch_s: list[float] = []
    gens: list[int] = []
    rows: list[int] = []
    compact_s: list[float] = []
    for i in range(n_batches):
        media = docs.filter(
            F.abs(F.xxhash64("doc_id")) % n_batches == i
        ).select(
            F.col("doc_id").alias("media_id"),
            mixed_encode(
                F.array(*synthetic_cells(F.col("text"))), F.col("doc_id")
            ).alias("payload"),
        )
        t0 = time.perf_counter()
        filt(media, i)
        batch_s.append(round(time.perf_counter() - t0, 2))
        if (i + 1) % COMPACT_EVERY == 0:
            t0 = time.perf_counter()
            stats = compact_store(spark, store, upto=i)
            compact_s.append(round(time.perf_counter() - t0, 2))
        live = [e for e in os.listdir(store) if e.startswith("batch_id=")]
        gens.append(len(live))
        rows.append(spark.read.parquet(store).count())
        print(
            f"  batch {i}: {batch_s[-1]}s gens={gens[-1]} "
            f"band_rows={rows[-1]}"
            + (
                f" compact={compact_s[-1]}s"
                if (i + 1) % COMPACT_EVERY == 0
                else ""
            ),
            flush=True,
        )

    admitted = spark.read.parquet(out).count()
    ok = max(gens) <= COMPACT_EVERY + 1
    print(
        "RESULT "
        + json.dumps(
            {
                "sf_dir": sf_dir,
                "n_batches": n_batches,
                "compact_every": COMPACT_EVERY,
                "batch_s": batch_s,
                "first_half_median": sorted(batch_s[: n_batches // 2])[
                    n_batches // 4
                ],
                "second_half_median": sorted(batch_s[n_batches // 2 :])[
                    n_batches // 4
                ],
                "gens": gens,
                "max_gens": max(gens),
                "bound": COMPACT_EVERY + 1,
                "bounded": ok,
                "band_rows": rows,
                "compact_s": compact_s,
                "admitted": admitted,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
