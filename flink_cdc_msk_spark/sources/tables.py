"""Relational table loaders for the driver's test data (TESTDATA.md).

Plain parquet scans — Catalyst handles column pruning / predicate pushdown,
so every query should show PushedFilters/ReadSchema narrowing in explain().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# DataFrame handles are immutable logical plans, so the 10-table load is
# memoized per (session, sf_dir): each spark.read.parquet costs a JVM
# round-trip + footer/schema read (~0.8s for the set), and every registered
# query starts with load_tables — without the memo that cost is a per-QUERY
# floor, with it a per-SESSION one. Keyed by applicationId (unique per
# SparkContext), so a restarted session re-reads schemas.
_CACHE: dict[tuple[str, str], dict[str, DataFrame]] = {}


def memoized_relation(memo: dict, spark, extra: tuple, build) -> DataFrame:
    """Session-keyed materialization memo (the operators/dedup.py
    ``_ORDERED_MEMO`` pattern generalized): one materialization per
    (application, *extra), dead-app entries evicted on access.

    Storage is ``persist(MEMORY_AND_DISK)`` — compressed columnar
    batches that EVICT under memory pressure — deliberately NOT
    localCheckpoint: localCheckpoint pins deserialized row objects on
    the heap, a measured heap-OOM cliff two decades up (PERF §39 —
    DSIR's 740M-row relation at sfx100 killed a 64g driver under
    localCheckpoint and completes under columnar persist). Eviction
    just re-runs the build lineage, so correctness is unaffected."""
    from pyspark import StorageLevel

    app = spark.sparkContext.applicationId
    evict_stale_entries(memo, app)
    key = (app,) + extra
    got = memo.get(key)
    if got is None:
        # bound: caller-specific, always a REDUCED relation (per-doc
        # stats / bucket counts / distinct shingles), never raw corpus
        got = build().persist(StorageLevel.MEMORY_AND_DISK)
        memo[key] = got
    return got


def evict_stale_entries(cache: dict, app_id: str) -> None:
    """Drop memo entries belonging to dead SparkContexts (only one app is
    live per process, so any other applicationId is unreachable — without
    eviction a long-lived process restarting sessions accumulates dead
    plan handles indefinitely)."""
    for k in [k for k in cache if k[0] != app_id]:
        del cache[k]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (spark.sparkContext.applicationId, sf_dir)
    evict_stale_entries(_CACHE, key[0])
    cached = _CACHE.get(key)
    if cached is not None:
        return dict(cached)
    # Runtime-settable SQL conf: required to read the events table's
    # TIMESTAMP(NANOS) column regardless of how the caller built the
    # session (the driver creates its own un-tuned SparkSession).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {}
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if t == "events" and isinstance(df.schema["ts"].dataType, LongType):
            # TIMESTAMP(NANOS) read as long (legacy.parquet.nanosAsLong);
            # truncate ns→us like every us-resolution engine does.
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        out[t] = df
    _CACHE[key] = out
    return dict(out)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
