#!/usr/bin/env python
"""PERF item (VERDICT r11 item 7): per-batch steady-state cost of the
streaming source-overlap guard over a >=20-batch stream — the §32/§35
flat-cost evidence shape, applied to the round-11 twin after its
partials store got the crash-safe MIN-fold compaction (round 12).

Drives the PRODUCTION foreachBatch body (``maintain_overlap_partials``
— the same function the registered query runs) over N hash-sliced
slabs of the corpus's documents table, recording per batch:

* wall seconds for the batch (ingest + partial write + any fold),
* live ``batch_id=`` generation count after the batch (must stay
  <= OVERLAP_KEEP_GENS + 1 — the O(1)-state claim),
* stored row count (the n_sources x 32-longs claim, x generations),
* readout wall seconds every 4 batches (fold-at-read must stay flat).

Usage:
  SPARK_GRAFT_DRIVER_MEM=16g python tools/overlap_steady_state.py \
      /tmp/sfx1 24
Prints one RESULT json line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    from pyspark.sql import functions as F

    from flink_cdc_msk_spark.plans.round11_extras import (
        OVERLAP_KEEP_GENS,
        maintain_overlap_partials,
        overlap_partials_readout,
    )
    from flink_cdc_msk_spark.session import get_spark
    from flink_cdc_msk_spark.sources.tables import load_tables

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="overlap_steady_state",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "source", "text"
    )
    store = f"/tmp/overlap_steady_{os.getpid()}/partials"
    os.makedirs(os.path.dirname(store), exist_ok=True)
    body = maintain_overlap_partials(spark, store)

    batch_s: list[float] = []
    gens: list[int] = []
    rows: list[int] = []
    readout_s: list[float] = []
    for i in range(n_batches):
        slab = docs.filter(F.abs(F.xxhash64("doc_id")) % n_batches == i)
        t0 = time.perf_counter()
        body(slab, i)
        batch_s.append(round(time.perf_counter() - t0, 2))
        live = [
            e for e in os.listdir(store) if e.startswith("batch_id=")
        ]
        gens.append(len(live))
        rows.append(spark.read.parquet(store).count())
        if (i + 1) % 4 == 0:
            t0 = time.perf_counter()
            overlap_partials_readout(spark, store).collect()
            readout_s.append(round(time.perf_counter() - t0, 2))
        print(
            f"  batch {i}: {batch_s[-1]}s gens={gens[-1]} "
            f"rows={rows[-1]}"
            + (f" readout={readout_s[-1]}s" if (i + 1) % 4 == 0 else ""),
            flush=True,
        )

    n_pairs = overlap_partials_readout(spark, store).count()
    ok = max(gens) <= OVERLAP_KEEP_GENS + 1
    print(
        "RESULT "
        + json.dumps(
            {
                "sf_dir": sf_dir,
                "n_batches": n_batches,
                "batch_s": batch_s,
                "first_half_median": sorted(batch_s[: n_batches // 2])[
                    n_batches // 4
                ],
                "second_half_median": sorted(batch_s[n_batches // 2 :])[
                    n_batches // 4
                ],
                "gens": gens,
                "max_gens": max(gens),
                "bound": OVERLAP_KEEP_GENS + 1,
                "bounded": ok,
                "rows": rows,
                "readout_s": readout_s,
                "n_sources_signatures": n_pairs,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
