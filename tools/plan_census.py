#!/usr/bin/env python
"""Whole-registry physical-plan census (the PLANS.md method, committed).

For every registered query: build the DataFrame at sf0.01 in a PLAIN
session, walk `executedPlan` (AdaptiveSparkPlanExec unwrapped via
`initialPlan` — `sparkPlan` is pre-EnsureRequirements and has no
Exchange nodes, so never census that), count node classes, and flag the
scale anti-patterns the round audits look for:

  * CartesianProductExec         — quadratic join, never acceptable
  * BatchEvalPythonExec          — row-at-a-time Python on the hot path
  * Exchange SinglePartition     — global funnel (fine only for 1-row
                                   reductions; listed for manual review)

Prints one line per query and a final SUMMARY line. Queries whose build
function materializes side effects (streaming replays, bucketed writes)
execute those side effects during the census — run time ~6-8 min.

Usage: python tools/plan_census.py [name ...]
"""

from __future__ import annotations

import sys
from collections import Counter

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))
))

SF_DIR = "/root/testdata/sf0.01"

# Row-oriented Python nodes flag; Arrow-vectorized nodes
# (ArrowEvalPython, MapInPandas, FlatMapCoGroupsInPandas) do not.
FLAGS = ("CartesianProduct", "BatchEvalPython", "BatchEvalPythonUDTF")


def census(plan, seen_caches: set | None = None) -> Counter:
    """Count node classes in a physical plan tree. ``seen_caches`` (shared
    across the whole census run) dedupes persisted sub-plans: each
    distinct InMemoryRelation's cache-miss plan is walked ONCE — so
    anti-patterns buried inside persisted lineages (which execute on the
    first action) are visible, without re-counting a shared cache under
    every query that references it."""
    counts: Counter = Counter()
    if seen_caches is None:
        seen_caches = set()

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())
            return
        if name.endswith("Exec"):
            name = name[:-4]
        if name == "ShuffleExchange":
            if "SinglePartition" in node.outputPartitioning().toString():
                name = "ShuffleExchange(SinglePartition)"
        counts[name] += 1
        if name == "InMemoryTableScan":
            cached = node.relation().cacheBuilder().cachedPlan()
            key = cached.semanticHash()
            if key not in seen_caches:
                seen_caches.add(key)
                walk(cached)
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(plan)
    return counts


def census_from_string(plan_str: str) -> Counter:
    """Degraded census: count node names from the rendered plan text.
    Fallback when the Py4J walk hits a private-API change across Spark
    versions (initialPlan/cacheBuilder/semanticHash are internals) — less
    precise (no cache dedupe, no SinglePartition split) but the
    anti-pattern flags still fire instead of the tool crashing."""
    import re

    counts: Counter = Counter()
    for line in plan_str.splitlines():
        m = re.search(r"(?:^|[+:\-*\s])([A-Z][A-Za-z]+)(?:Exec)?\s*[\s(]",
                      line)
        if m:
            counts[m.group(1)] += 1
    return counts


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = sys.argv[1:] or list(qs)
    flagged: dict[str, list[str]] = {}
    single_part: list[str] = []
    seen_caches: set = set()  # each persisted sub-plan censused once
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            flagged[name] = ["ERROR"]
            continue
        try:
            counts = census(
                df._jdf.queryExecution().executedPlan(), seen_caches
            )
        except Exception as e:  # noqa: BLE001 - private-API walk broke
            print(f"{name}: walk failed ({type(e).__name__}), "
                  f"degrading to rendered-plan census", flush=True)
            counts = census_from_string(
                df._jdf.queryExecution().executedPlan().toString()
            )
        hits = [f for f in FLAGS if counts.get(f, 0)]
        if counts.get("ShuffleExchange(SinglePartition)"):
            single_part.append(name)
        if hits:
            flagged[name] = hits
        top = ", ".join(f"{k}={v}" for k, v in counts.most_common(8))
        print(f"{name}: {top}", flush=True)
    print(f"SUMMARY flagged={flagged or 'NONE'} "
          f"single_partition_exchanges={single_part}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
