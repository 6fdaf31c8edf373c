#!/usr/bin/env python
"""PERF item (VERDICT r11 item 8): instrumented stage decomposition of
``cdc_latest_state`` — the largest headline query whose cost carried
only an attribution ("semantic JSON parse"), never a measured table.

Stages, each timed as its own action per round (engine-default conf):

* feed    — synthesize_mysql_events materialization (render Debezium
            JSON + repartition + persist; memoized after round 0).
* parse   — from_json with the typed envelope schema, all five
            extracted fields aggregated (sum/count over every column so
            JSON schema-pruning cannot skip work the real query does),
            NO grouping shuffle.
* full    — the registered query (parse + groupBy(pk).max_by + filter).

full − parse ≈ the PK shuffle + partial-agg cost; parse − (feed-warm
scan floor) ≈ the Jackson envelope parse. Usage:

  SPARK_GRAFT_DRIVER_MEM=16g AB_ROUNDS=3 \
      python tools/cdc_latest_decompose.py /root/testdata/sf0.1 /tmp/sfx1
Prints one RESULT json line per sf_dir.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from flink_cdc_msk_spark.envelope import mysql_envelope_keyed_schema
    from flink_cdc_msk_spark.plans.cdc_queries import cdc_latest_state
    from flink_cdc_msk_spark.session import get_spark
    from flink_cdc_msk_spark.sources.cdc_sim import synthesize_mysql_events

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="cdc_latest_decompose",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        # RESULT lines glue to console progress bars (the verify-skill
        # gotcha) — keep the tool's stdout machine-parseable
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    for sf_dir in sys.argv[1:]:
        stages: dict[str, list[float]] = {
            "feed": [],
            "parse": [],
            "full": [],
        }
        for _ in range(ROUNDS):
            t0 = time.perf_counter()
            n_events = synthesize_mysql_events(spark, sf_dir).count()
            stages["feed"].append(round(time.perf_counter() - t0, 3))

            events = synthesize_mysql_events(spark, sf_dir)
            schema = mysql_envelope_keyed_schema(
                {"o_orderkey": LongType}, {"o_custkey": LongType}
            )
            env = F.from_json("value", schema).alias("env")
            parsed = events.select(env).select(
                F.col("env.after.o_orderkey").alias("after_key"),
                F.col("env.before.o_orderkey").alias("before_key"),
                F.col("env.after.o_custkey").alias("o_custkey"),
                F.col("env.op").alias("op"),
                F.col("env.ts_ms").alias("ts_ms"),
            )
            t0 = time.perf_counter()
            parsed.agg(
                F.sum("after_key"),
                F.sum("before_key"),
                F.sum("o_custkey"),
                F.count("op"),
                F.sum("ts_ms"),
            ).collect()
            stages["parse"].append(round(time.perf_counter() - t0, 3))

            t0 = time.perf_counter()
            n_out = cdc_latest_state(spark, sf_dir).count()
            stages["full"].append(round(time.perf_counter() - t0, 3))
        print(
            "RESULT "
            + json.dumps(
                {
                    "sf_dir": sf_dir,
                    "rounds": ROUNDS,
                    "n_events": n_events,
                    "n_out": n_out,
                    "stages_cold_then_warm": stages,
                    "note": (
                        "feed round0 = render+persist (memoized after); "
                        "parse = typed from_json, all fields aggregated, "
                        "no PK shuffle; full = registered query"
                    ),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
