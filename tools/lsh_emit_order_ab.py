#!/usr/bin/env python
"""PERF §43: the lsh_hi filter-placement bisect the r11 verdict asked
for at sfx10 (item 2) — lowest-matching-table filter BEFORE the cosine
threshold (the shipped §42 shape) vs AFTER it (``_emit_order=
'cos_first'``). Both orders are exactly-once-correct
(test_lsh_emit_orders_identical); the trade is k cosine evaluations for
a k-table collider (lowest_first saves them) vs (n_tables-1)
long-compares on EVERY candidate instance (cos_first defers them to
survivors). Interleaved within each round (ab_bench's co-tenant-noise
defense), cold = round 0 / warm = median of the rest, engine-default
conf (the §21 decade rule).

Usage:
  SPARK_GRAFT_DRIVER_MEM=64g AB_ROUNDS=2 \
      python tools/lsh_emit_order_ab.py /tmp/sfx10
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = int(os.environ.get("AB_ROUNDS", "2"))
ORDERS = ("lowest_first", "cos_first")


def main() -> None:
    from flink_cdc_msk_spark.operators import similarity as S
    from flink_cdc_msk_spark.plans.round10_extras import (
        _emb_with_planted_neardups,
    )
    from flink_cdc_msk_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="lsh_emit_order_ab",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        # RESULT lines glue to console progress bars (the verify-skill
        # gotcha) — keep the tool's stdout machine-parseable
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = _emb_with_planted_neardups(spark, sf_dir)
    # regime knobs: hi (default) = 0.8/10 planes; dense = e.g.
    # LSH_THRESH=0.3 LSH_PLANES=4 — the §42-addendum-2 form
    kw = dict(
        threshold=float(os.environ.get("LSH_THRESH", "0.8")),
        n_planes=int(os.environ.get("LSH_PLANES", "10")),
        n_tables=int(os.environ.get("LSH_TABLES", "8")),
        portable_dims=64,
    )
    times: dict[str, list[float]] = {o: [] for o in ORDERS}
    counts: dict[str, int] = {}
    for r in range(ROUNDS):
        for order in ORDERS:
            t0 = time.perf_counter()
            n = S.lsh_near_dup_pairs(
                corpus, _emit_order=order, **kw
            ).count()
            dt = round(time.perf_counter() - t0, 2)
            times[order].append(dt)
            counts[order] = n
            print(f"  [r{r}] {order}: {dt}s ({n} pairs)", flush=True)
    if len(set(counts.values())) != 1:
        raise RuntimeError(f"emit orders disagree: {counts}")
    print(
        "RESULT "
        + json.dumps(
            {
                "sf_dir": sf_dir,
                "rounds": ROUNDS,
                "pairs": counts[ORDERS[0]],
                "cold": {o: times[o][0] for o in ORDERS},
                "warm": {
                    o: (
                        round(statistics.median(times[o][1:]), 2)
                        if len(times[o]) > 1
                        else None
                    )
                    for o in ORDERS
                },
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
