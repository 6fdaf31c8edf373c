#!/usr/bin/env python
"""VERDICT r12 item 2: §40-style phase decomposition of the lsh_hi wall.

Times the operator's own INTERNAL sub-plans (via the measurement-only
``_stage`` hook — same code path as the registered query, no drift) so
the sfx10 warm wall attributes to bucket build vs id-join vs the salted
light join skeleton vs payload carriage + per-pair cosine:

  buckets   noop(wide bucket build)             — projections + explode
  entries   noop(buckets ⋈ vecs by id)          — + the id SMJ
  cand      count(salted self-join)             — column pruning strips
            the vector payload here, so this is the JOIN SKELETON
            (bucket projections ×2 + light salt sort + pair
            enumeration); the count value = candidate instances
  cos_all   noop(per-candidate cosine, no filters) — + heavy payload
            carriage through the salt sort + the fold-cosine per
            candidate
  full      count(registered emit order)        — + threshold/lowest
            filters (the shipped query)

Phase deltas, not absolute rows, are the reading: e.g. (cos_all − cand)
≈ what the replicated vector payload + per-pair arithmetic cost, the
adaptive-salt / payload-stripping target. noop sink per guide §1.4.

Usage:
  SPARK_GRAFT_DRIVER_MEM=64g AB_ROUNDS=2 \
      python tools/lsh_hi_decompose.py /tmp/sfx10
  LSH_THRESH=0.3 LSH_PLANES=4 ... for the dense regime
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = int(os.environ.get("AB_ROUNDS", "2"))
PHASES = ("buckets", "entries", "cand", "cos_all", "full")


def main() -> None:
    from flink_cdc_msk_spark.operators import similarity as S
    from flink_cdc_msk_spark.plans.round10_extras import (
        _emb_with_planted_neardups,
    )
    from flink_cdc_msk_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="lsh_hi_decompose",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = _emb_with_planted_neardups(spark, sf_dir)
    kw = dict(
        threshold=float(os.environ.get("LSH_THRESH", "0.8")),
        n_planes=int(os.environ.get("LSH_PLANES", "10")),
        n_tables=int(os.environ.get("LSH_TABLES", "8")),
        portable_dims=64,
        _emit_order=os.environ.get("LSH_EMIT", "cos_first"),
    )

    def run(phase: str) -> tuple[float, int | None]:
        spark.sparkContext.setJobDescription(f"lsh_hi_decompose:{phase}")
        t0 = time.perf_counter()
        n = None
        if phase in ("cand", "full"):
            stage = "joined" if phase == "cand" else None
            n = S.lsh_near_dup_pairs(corpus, _stage=stage, **kw).count()
        else:
            df = S.lsh_near_dup_pairs(corpus, _stage=phase, **kw)
            df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 2)
        spark.sparkContext.setJobDescription(None)
        return dt, n

    times: dict[str, list[float]] = {p: [] for p in PHASES}
    counts: dict[str, int] = {}
    for r in range(ROUNDS):
        for phase in PHASES:
            dt, n = run(phase)
            times[phase].append(dt)
            if n is not None:
                counts[phase] = n
            print(f"  [r{r}] {phase}: {dt}s"
                  + (f" ({n} rows)" if n is not None else ""), flush=True)
    print(
        "RESULT "
        + json.dumps(
            {
                "sf_dir": sf_dir,
                "rounds": ROUNDS,
                "kw": {k: v for k, v in kw.items()},
                "counts": counts,
                "cold": {p: times[p][0] for p in PHASES},
                "warm": {
                    p: (
                        round(statistics.median(times[p][1:]), 2)
                        if len(times[p]) > 1
                        else None
                    )
                    for p in PHASES
                },
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
