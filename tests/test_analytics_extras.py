"""Behavioral tests for the round-4c analytics operators beyond the
oracle gate: cascade-consistency of the hypertable rollup, balance of
the equi-depth histogram, locality of the Z-order layout, and recall of
PQ/ADC ANN against the exact L2 ranking.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_msk_spark.plans.registry import QUERIES, ensure_loaded
from tests.conftest import SF_ORACLE

ensure_loaded()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")


def test_rollup_cascade_is_consistent(spark):
    """Each coarser resolution must re-aggregate the finer one exactly:
    summing the minute rows up to their hour equals the hour rows."""
    out = QUERIES["events_hypertable_rollup"](spark, SF_ORACLE).cache()
    minute = out.filter(F.col("resolution") == "minute")
    hour = out.filter(F.col("resolution") == "hour")
    rolled = (
        minute.groupBy(
            F.date_format(
                F.date_trunc("hour", F.to_timestamp("window_start")),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("window_start"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("total_value"), 4).alias("tv"),
        )
    )
    joined = rolled.join(
        hour.select(
            "window_start",
            "event_type",
            F.col("n").alias("hn"),
            F.round("total_value", 4).alias("htv"),
        ),
        ["window_start", "event_type"],
    )
    assert joined.count() == hour.count()
    bad = joined.filter(
        (F.col("n") != F.col("hn")) | (F.col("tv") != F.col("htv"))
    )
    assert bad.count() == 0
    out.unpersist()


def test_equi_depth_buckets_are_balanced(spark):
    """Decile histogram: 10 buckets, each within 2% of n/10 (exact
    percentile boundaries; slack only for boundary-tie mass)."""
    out = QUERIES["agg_equi_depth_histogram"](spark, SF_ORACLE).collect()
    assert len(out) == 10
    total = sum(r["n"] for r in out)
    for r in out:
        assert abs(r["n"] - total / 10) <= total * 0.02, r
    # bucket ranges must not overlap: sorted by bucket, hi <= next lo
    rows = sorted(out, key=lambda r: r["bucket"])
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]


def test_zorder_files_cover_bounded_rectangles(spark):
    """Every Z-order file must span at most a 32x64 rectangle of the
    256x256 key space (9 trailing bits cut -> 2^9 curve cells; the
    Morton property bounds each file's bounding box), versus the
    full-width 256-wide stripes a single-dimension sort would give."""
    out = QUERIES["layout_zorder_stats"](spark, SF_ORACLE).collect()
    assert len(out) > 1
    for r in out:
        assert r["x_hi"] - r["x_lo"] <= 31, r
        assert r["y_hi"] - r["y_lo"] <= 63, r


def test_pq_adc_rerank_recall_vs_exact(spark, emb):
    """PQ shortlist (ADC top-100) + exact re-rank must recover most
    true neighbors: recall@10 vs the exact L2 top-10 >= 0.7 on the
    sf0.01 corpus (8x8 codebooks, shortlist = 20% of corpus)."""
    from flink_cdc_msk_spark.operators.clustering import (
        pq_adc_rerank_topk,
    )

    pq = pq_adc_rerank_topk(emb, emb.filter(F.col("vec_id") < 10), k=10)
    got = {(r["query_id"], r["vec_id"]) for r in pq.collect()}
    exact = _exact_l2_topk(spark, emb, nq=10, k=10)
    hits = len(got & exact)
    assert hits / len(exact) >= 0.7, hits


def test_pq_rerank_exactness_on_shortlist(spark, emb):
    """Re-ranked results must carry TRUE exact L2 distances: every
    returned (query, vec) pair's dist equals the brute-force distance
    (the approximation can only drop candidates, never mis-score
    them)."""
    from flink_cdc_msk_spark.operators.clustering import (
        pq_adc_rerank_topk,
    )

    pq = pq_adc_rerank_topk(
        emb, emb.filter(F.col("vec_id") < 3), k=5
    ).collect()
    v = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    for r in pq:
        d = sum(
            (a - b) * (a - b)
            for a, b in zip(v[r["query_id"]], v[r["vec_id"]])
        )
        assert abs(d - r["dist"]) < 1e-6, r


def _exact_l2_topk(spark, emb, nq, k):
    from pyspark.sql.window import Window

    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = v.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    pairs = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "d",
            F.aggregate(
                F.zip_with(
                    "v", "qv", lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy("d", "vec_id")
    )
    top = pairs.withColumn("rn", rn).filter(F.col("rn") <= k)
    return {(r["query_id"], r["vec_id"]) for r in top.collect()}


def test_zorder_interleave_matches_python_reference(spark):
    """The codegen Morton interleave must equal the bit-twiddling
    reference for a dense grid of (x, y) — 37x37 points covering the
    full 8-bit range including the 0/255 edges."""
    from flink_cdc_msk_spark.plans.analytics_extras import (
        _z_interleave_col,
    )

    pts = [(x, y) for x in range(0, 256, 7) for y in range(0, 256, 7)]
    pts += [(255, 255), (0, 255), (255, 0)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", _z_interleave_col(F.col("x"), F.col("y"))
        ).collect()
    }

    def ref(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert all(got[(x, y)] == ref(x, y) for x, y in pts)
    # bijectivity over the sampled grid
    assert len(set(got.values())) == len(pts)


def test_streaming_rollup_equals_batch_rollup(spark):
    """The foreachBatch-maintained rollup must equal the single-pass
    batch rollup exactly — DECIMAL partials make the micro-batch split
    invisible."""
    batch = {
        tuple(r)
        for r in QUERIES["events_hypertable_rollup"](
            spark, SF_ORACLE
        ).collect()
    }
    stream = {
        tuple(r)
        for r in QUERIES["streaming_hypertable_rollup"](
            spark, SF_ORACLE
        ).collect()
    }
    assert batch == stream


def test_zscore_flags_are_extreme_values(spark):
    """Every flagged event must sit beyond 2.5 sample stddevs of its
    type's mean (recomputed independently with Spark's built-ins,
    loose tolerance for the pop-vs-float path)."""
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    out = QUERIES["events_anomaly_zscore"](spark, SF_ORACLE)
    stats = ev.groupBy("event_type").agg(
        F.mean("value").alias("mu"),
        F.stddev_pop("value").alias("sd"),
    )
    joined = out.join(stats, "event_type").withColumn(
        "z2", (F.col("value") - F.col("mu")) / F.col("sd")
    )
    bad = joined.filter(F.abs("z2") < 2.45)
    assert bad.count() == 0
    assert out.count() > 0


def test_pq_stage_count_independent_of_subspace_count(spark, emb):
    """The banded PQ plan's shuffle-stage count must NOT grow with m —
    the round-5 rewrite's whole point (the old per-subspace Python loop
    produced m sequential Lloyd pipelines; PERF.md §18). Pin it: the
    m=2 and m=8 configurations compile to the SAME number of shuffle
    exchanges."""
    from flink_cdc_msk_spark.operators.clustering import pq_adc_topk

    def n_shuffles(m, sub_dim):
        df = pq_adc_topk(
            emb, emb.filter(F.col("vec_id") < 3),
            k=5, m=m, sub_dim=sub_dim, ksub=4, kmeans_iters=2,
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    assert n_shuffles(2, 32) == n_shuffles(8, 8)


def test_unit_set_cache_spread_is_size_aware(spark):
    """_spread_and_persist widens an under-partitioned unit-set cache
    only past ~1k docs/partition: a tiny 1-partition corpus stays
    1 partition (no near-empty-task scheduling overhead), a 5k-doc
    1-partition corpus spreads to multiple partitions so map-side
    signature stages parallelize (PERF.md §18)."""
    from flink_cdc_msk_spark.operators.dedup import (
        _UNITS_MEMO,
        _unit_sets_persisted,
    )

    def corpus(n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("alpha beta gamma delta epsilon zeta doc "),
                F.col("id").cast("string"),
            ).alias("text"),
        ).coalesce(1)

    small = _unit_sets_persisted(corpus(50), "text", "doc_id", 3, True)
    big = _unit_sets_persisted(corpus(5000), "text", "doc_id", 3, True)
    try:
        assert small.rdd.getNumPartitions() == 1
        par = spark.sparkContext.defaultParallelism
        expect = min(par, 5000 // 1024 + 1)
        assert 1 < big.rdd.getNumPartitions() <= par
        assert big.rdd.getNumPartitions() >= min(expect, 2)
        assert big.count() == 5000
    finally:
        for df in (small, big):
            df.unpersist()
        _UNITS_MEMO.clear()
