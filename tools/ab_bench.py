#!/usr/bin/env python
"""Interleaved A/B benchmark: alternate Spark / DuckDB per headline query
within each round, median of N rounds — the only comparison this box can
defend (co-tenant load swings ±40% between back-to-back runs; see
BASELINE.md).  Prints one JSON line with per-query medians and the
aggregate ratio."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import HEADLINE  # single source of truth for the set

    import duckdb

    from flink_cdc_msk_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="ab_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus // 4),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    # identical warmup to bench.py (session startup, not query latency)
    from flink_cdc_msk_spark.operators.dedup import jaccard_pairs
    from flink_cdc_msk_spark.sources.cdc_sim import synthesize_mysql_events
    from flink_cdc_msk_spark.sources.tables import load_tables

    for df in load_tables(spark, SF_DIR).values():
        df.limit(1).count()
    spark.range(2).mapInPandas(lambda it: it, "id long").count()
    tiny = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "x y z")],
        "doc_id long, text string",
    )
    jaccard_pairs(tiny, 0.8, ngram=3).count()
    synthesize_mysql_events(spark, SF_DIR).count()

    spark_t: dict[str, list[float]] = {n: [] for n in HEADLINE}
    duck_t: dict[str, list[float]] = {n: [] for n in HEADLINE}
    for _ in range(ROUNDS):
        for name in HEADLINE:
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).count()
            spark_t[name].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            # count-wrapper = the same materialization contract as the
            # Spark side's .count() (PERF §25: fetchall charged DuckDB
            # full-result Python materialization Spark never pays; at
            # sf0.1 outputs are small so historical totals moved <5%,
            # but the contract should be symmetric everywhere)
            con.execute(f"SELECT count(*) FROM ({osql[name]}) _q").fetchone()
            duck_t[name].append(time.perf_counter() - t0)

    med_s = {n: round(statistics.median(v), 3) for n, v in spark_t.items()}
    med_d = {n: round(statistics.median(v), 3) for n, v in duck_t.items()}
    tot_s = round(sum(med_s.values()), 2)
    tot_d = round(sum(med_d.values()), 2)
    print(
        json.dumps(
            {
                "metric": "ab_interleaved",
                "rounds": ROUNDS,
                "spark_total": tot_s,
                "duckdb_total": tot_d,
                "ratio": round(tot_s / tot_d, 2),
                "spark": med_s,
                "duckdb": med_d,
                "sf_dir": SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
