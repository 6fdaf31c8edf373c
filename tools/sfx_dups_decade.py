#!/usr/bin/env python
"""Second-decade (sfx100-scale) measurement for the NEAR-DUP FAMILY
(VERDICT r10 item 2): dedup_token_jaccard and text_substring_dedup_rk.

These two read the planted-variant corpus, which the plain docs-only
sfx100 set cannot serve: (a) its doc_ids (up to 9.9M) collide with the
registered plant offsets CLONE_OFFSET=1M / NEAR_OFFSET=2M, and (b) its
tag-only replicas sit ABOVE the 0.8 jaccard threshold, so at 990
replicas the pair OUTPUT grows ~replicas² — a degenerate workload that
measures result materialization, not the algorithm. The recipe here:

1. corpus = /tmp/sfxd100 from ``build_sfx.py --docs-only-link-from
   ... --differentiated`` — replicas carry a unique token prefix ~1/3
   of their length, pushing cross-replica jaccard to ~0.33-0.59;
2. plants at 10M/20M via the production ``_planted_variants`` with its
   measurement-only offset parameters (the REGISTERED queries keep the
   1M/2M constants; this harness exercises the same operator code on a
   corpus the constants cannot host);
3. DuckDB runs the REGISTERED oracles with only the corpus-CTE offsets
   rewritten — same algorithm text, same plant rule.

Protocol: the pinned §34 shape (interleaved Spark/DuckDB per round,
cold = round 0, warm = median of rounds 1..N-1, per-query DuckDB
interrupt cap). Engine-default session conf like sfx_scale.py (AQE on,
shuffle partitions = cores). Env: AB_ROUNDS (default 2), DUCK_CAP
(default 300 s), SPARK_GRAFT_DRIVER_MEM (set 64g at this scale).

Usage:
  python tools/build_sfx.py --src /root/testdata/sf0.1 --out /tmp/sfxd100 \
      --replicas 990 --docs-only-link-from /tmp/sfx1 --differentiated
  SPARK_GRAFT_DRIVER_MEM=64g AB_ROUNDS=2 DUCK_CAP=300 \
      python tools/sfx_dups_decade.py /tmp/sfxd100
"""

from __future__ import annotations

import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = int(os.environ.get("AB_ROUNDS", "2"))
# Spark rounds past round 0 are skipped for a query whose round-0 wall
# time exceeds SPARK_SOFT_CAP seconds (cold recorded, warm honestly
# absent) — the §41 protocol note for runs near the box's limits.
SPARK_SOFT_CAP = float(os.environ.get("SPARK_SOFT_CAP", "1e9"))
DUCK_CAP = float(os.environ.get("DUCK_CAP", "300"))
CLONE_OFF = 10_000_000
NEAR_OFF = 20_000_000


def main() -> None:
    import duckdb

    import __spark_entry__ as entry_mod
    from flink_cdc_msk_spark.operators.dedup import jaccard_pairs
    from flink_cdc_msk_spark.plans.llm_pipeline import (
        CLONE_OFFSET,
        DOCS_WITH_NEAR_DUPS_SQL,
        NEAR_OFFSET,
        _planted_variants,
    )
    from flink_cdc_msk_spark.plans.round9_extras import (
        _cdc_chunks,
        _dup_span_report,
    )
    from flink_cdc_msk_spark.session import get_spark
    from flink_cdc_msk_spark.sources.tables import load_tables

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfxd100"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark(
        app_name="sfx_dups_decade",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    def corpus():
        d = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
        return _planted_variants(
            d, with_near=True, clone_offset=CLONE_OFF, near_offset=NEAR_OFF
        )

    # SFXD_MAX_FREQ: posting-list cutoff (jaccard_pairs max_token_freq,
    # the operator's documented skew guard). On a replica corpus the
    # replica-shared text shingles carry df == replica count, so the
    # UNGUARDED posting-pair emission is base_docs x C(replicas, 2)
    # (~2.1e9 at 99 replicas) independent of the output threshold —
    # measured to exceed this box's 76 GB of shuffle disk at EVERY
    # differentiated replica count tried (PERF §41 caps). Production
    # dedup at 100 TB runs with a df bound for exactly this reason;
    # set it to (replicas - 1) to prune the structural lists while
    # keeping every planted pair discoverable via its rare units.
    max_freq = os.environ.get("SFXD_MAX_FREQ")
    max_freq = int(max_freq) if max_freq else None
    spark_queries = {
        "dedup_token_jaccard": lambda: jaccard_pairs(
            corpus(), threshold=0.8, ngram=3, max_token_freq=max_freq
        ),
        "text_substring_dedup_rk": lambda: _dup_span_report(
            _cdc_chunks(corpus(), boundary="rk")
        ),
    }
    # SFXD_QUERIES=name[,name]: restrict the measured set — the full
    # sfxd100 jaccard spills past this box's disk (>77 GB at the
    # posting join, PERF §41), so jaccard runs on the largest
    # completable replica count while substring_rk takes the full set
    only = os.environ.get("SFXD_QUERIES")
    if only:
        keep = set(only.split(","))
        spark_queries = {
            k: v for k, v in spark_queries.items() if k in keep
        }

    # DuckDB: the registered oracles with only the corpus plant offsets
    # rewritten (1M/2M -> 10M/20M). String-surgery on the shared corpus
    # CTE keeps every other literal (RK constants etc.) untouched;
    # each numeral must occur EXACTLY once (ADVICE r11: a second
    # occurrence — now or after a future CTE edit — would be silently
    # rewritten, changing the oracle).
    osql = entry_mod.oracle_sql()

    def _replace_exactly_once(s: str, old: str, new: str) -> str:
        n = s.count(old)
        if n != 1:
            raise RuntimeError(
                f"plant-offset numeral {old!r} occurs {n}x in the "
                f"corpus CTE (expected exactly 1) — refusing a blind "
                f"rewrite"
            )
        return s.replace(old, new)

    custom_cte = _replace_exactly_once(
        DOCS_WITH_NEAR_DUPS_SQL, str(CLONE_OFFSET), str(CLONE_OFF)
    )
    custom_cte = _replace_exactly_once(
        custom_cte, str(NEAR_OFFSET), str(NEAR_OFF)
    )
    duck_queries = {}
    for name in spark_queries:
        sql = osql[name]
        if DOCS_WITH_NEAR_DUPS_SQL not in sql:
            raise RuntimeError(f"corpus CTE not found verbatim in {name}")
        duck_queries[name] = sql.replace(
            DOCS_WITH_NEAR_DUPS_SQL, custom_cte
        )

    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('DUCK_MEM', '24GB')}'")
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    load_tables(spark, sf_dir)["documents"].limit(1).count()

    spark_t: dict[str, list[float]] = {n: [] for n in spark_queries}
    duck_t: dict[str, list[float]] = {n: [] for n in spark_queries}
    duck_dnf: set[str] = set()
    spark_capped: set[str] = set()
    for r in range(ROUNDS):
        for name, build in spark_queries.items():
            if name in spark_capped:
                print(f"  [r{r}] {name}: spark skipped (soft cap)",
                      flush=True)
                continue
            t0 = time.perf_counter()
            n_rows = build().count()
            spark_t[name].append(time.perf_counter() - t0)
            print(
                f"  [r{r}] {name}: spark {spark_t[name][-1]:.2f}s "
                f"({n_rows} rows)",
                flush=True,
            )
            if spark_t[name][-1] > SPARK_SOFT_CAP:
                spark_capped.add(name)
            if name in duck_dnf:
                print(f"  [r{r}] {name}: duck DNF(skipped)", flush=True)
                continue
            done = threading.Event()

            def interrupt() -> None:
                if not done.wait(DUCK_CAP):
                    con.interrupt()

            w = threading.Thread(target=interrupt, daemon=True)
            w.start()
            t0 = time.perf_counter()
            try:
                con.execute(duck_queries[name]).fetchall()
                duck_t[name].append(time.perf_counter() - t0)
                print(
                    f"  [r{r}] {name}: duck {duck_t[name][-1]:.2f}s",
                    flush=True,
                )
            except duckdb.InterruptException:
                duck_dnf.add(name)
                print(f"  [r{r}] {name}: duck DNF>{DUCK_CAP:.0f}s", flush=True)
            finally:
                done.set()
                w.join()

    def fmt(samples: list[float], dnf: bool) -> tuple[str, str]:
        if dnf and not samples:
            return (f"DNF>{DUCK_CAP:.0f}s", f"DNF>{DUCK_CAP:.0f}s")
        cold = f"{samples[0]:.2f}" if samples else "-"
        warm = (
            f"{statistics.median(samples[1:]):.2f}"
            if len(samples) > 1
            else "-"
        )
        return cold, warm

    print(f"RESULT sf_dir={sf_dir} rounds={ROUNDS} duck_cap={DUCK_CAP}")
    for name in spark_queries:
        sc, sw = fmt(spark_t[name], False)
        dc, dw = fmt(duck_t[name], name in duck_dnf)
        print(
            f"RESULT {name}: spark_cold={sc} spark_warm={sw} "
            f"duckdb_cold={dc} duckdb_warm={dw}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
