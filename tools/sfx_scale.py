#!/usr/bin/env python
"""PERF §21 decade-scaling harness: sfx1 → sfx10 medians for the
relational + dedup families (q18, q3, token-jaccard, minhash-LSH).

PINNED PROTOCOL (VERDICT r9 item 3 — every PERF decade table must say
which column it quotes; round-over-round deltas are only meaningful
within one column):

* queries run interleaved Spark/DuckDB within each round (the same
  co-tenant-noise defense as tools/ab_bench.py), AB_ROUNDS rounds;
* ``cold``   = round-0 wall time, one per engine/query — the first
  execution in the session (plan compilation + codegen + first file
  reads; the number a one-shot batch job pays);
* ``warm``   = median of rounds 1..N-1 — the steady-state number a
  resident service pays. With AB_ROUNDS=1 warm is null.
* both columns are emitted in the RESULT line
  (``spark_cold/spark_warm/duckdb_cold/duckdb_warm``); quote them as
  "cold"/"warm median" — never mix columns across rounds.

DuckDB gets a per-query interrupt cap (DUCK_CAP seconds) — a
quadratic-pair oracle over 495k docs runs for hours; record DNF
honestly instead of waiting.

Unlike ab_bench.py this runs the ENGINE-DEFAULT session conf (AQE on,
shuffle partitions = core count): ab_bench's floor-tuned conf
(8 partitions, AQE off) minimizes scheduling overhead at sf0.1 but is
a misconfiguration one decade up — 495k docs of token arrays in 8
static partitions OOMs the hash builds (observed: "Can't acquire
1073741824 bytes to build hash relation" and a heap OOM at sfx10).
Decade scaling is exactly the regime where AQE's runtime coalescing /
skew handling is the point (PERF §7), so §21 measures the conf a
deployment would run.

Usage:
  SPARK_GRAFT_DRIVER_MEM=64g AB_ROUNDS=3 DUCK_CAP=240 \
    python tools/sfx_scale.py /tmp/sfx1 /tmp/sfx10

The SF dirs come from tools/build_sfx.py (--tpch for the key-shifted
relational replicas).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))
DUCK_CAP = float(os.environ.get("DUCK_CAP", "300"))
# Override the measured set with SFX_QUERIES=name1,name2 (PERF §22 reuses
# this harness for the round-8 curation operators).
QUERIES = (
    os.environ["SFX_QUERIES"].split(",")
    if os.environ.get("SFX_QUERIES")
    else [
        "q18_large_volume_customer",
        "q3_shipping_priority",
        "dedup_token_jaccard",
        "dedup_minhash_lsh",
    ]
)
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> None:
    import duckdb

    from flink_cdc_msk_spark.session import get_spark
    from flink_cdc_msk_spark.sources.tables import load_tables
    import __spark_entry__ as entry_mod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    # Engine defaults: AQE on, shuffle partitions = cores (see module
    # docstring for why NOT ab_bench's floor conf).
    spark = get_spark(app_name="sfx_scale", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()

    for sf_dir in sys.argv[1:]:
        con = duckdb.connect()
        # Cap DuckDB's allocator: its default (80% of RAM) plus the JVM
        # heap OOM-killed the box while a quadratic oracle burned its
        # DUCK_CAP at sfx10 (round-8 finding — the kernel killed the
        # 71 GB java process, not the offender).
        con.execute(
            f"SET memory_limit='{os.environ.get('DUCK_MEM', '24GB')}'"
        )
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for df in load_tables(spark, sf_dir).values():
            df.limit(1).count()  # warm file listing/footers, not data
        spark_t: dict[str, list[float]] = {n: [] for n in QUERIES}
        duck_t: dict[str, list[float]] = {n: [] for n in QUERIES}
        duck_dnf: set[str] = set()
        for r in range(ROUNDS):
            for name in QUERIES:
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).count()
                spark_t[name].append(time.perf_counter() - t0)
                if name in duck_dnf:
                    print(
                        f"  [{sf_dir} r{r}] {name}: spark "
                        f"{spark_t[name][-1]:.2f}s duck DNF(skipped)",
                        flush=True,
                    )
                    continue
                done = threading.Event()

                def reaper() -> None:
                    if not done.wait(DUCK_CAP):
                        con.interrupt()

                threading.Thread(target=reaper, daemon=True).start()
                t0 = time.perf_counter()
                try:
                    # count-wrapper, not fetchall: the Spark side is
                    # timed under .count() (Catalyst prunes the final
                    # projection; every shuffle/join still runs), so
                    # fetching DuckDB's full result set to Python would
                    # charge it materialization Spark never pays — at
                    # sfx10 a 32M-pair result is tens of seconds of pure
                    # fetch. The wrapper gives DuckDB the same pruning
                    # freedom. Corollary for BOTH engines: a MAP-ONLY
                    # query (no shuffle) collapses to a near-empty scan
                    # count under this protocol — its row is a floor
                    # measurement, not operator work.
                    con.execute(
                        f"SELECT count(*) FROM ({osql[name]}) _q"
                    ).fetchone()
                    duck_t[name].append(time.perf_counter() - t0)
                except Exception:
                    duck_dnf.add(name)
                finally:
                    done.set()
                print(
                    f"  [{sf_dir} r{r}] {name}: spark "
                    f"{spark_t[name][-1]:.2f}s duck "
                    f"{'DNF' if name in duck_dnf else f'{duck_t[name][-1]:.2f}s'}",
                    flush=True,
                )
        def cold(v):
            return round(v[0], 3) if v else None

        def warm(v):
            return round(statistics.median(v[1:]), 3) if len(v) > 1 else None

        print(
            "RESULT " + json.dumps(
                {
                    "sf_dir": sf_dir,
                    "rounds": ROUNDS,
                    "protocol": "cold=round0, warm=median(rounds 1..)",
                    "spark_cold": {n: cold(v) for n, v in spark_t.items()},
                    "spark_warm": {n: warm(v) for n, v in spark_t.items()},
                    "duckdb_cold": {
                        n: (cold(v) if v else f"DNF>{DUCK_CAP:.0f}s")
                        for n, v in duck_t.items()
                    },
                    "duckdb_warm": {
                        n: (
                            warm(v)
                            if n not in duck_dnf
                            else f"DNF>{DUCK_CAP:.0f}s"
                        )
                        for n, v in duck_t.items()
                    },
                }
            ),
            flush=True,
        )
        con.close()
    spark.stop()


if __name__ == "__main__":
    main()
