"""Round-9 broadcast-audit pin (VERDICT r8 item 5).

Every hard ``F.broadcast`` / ``hint("broadcast")`` site in the engine
must appear in the allowlist below, which mirrors the PLANS.md
§broadcast-census table: hard hints are reserved for CONSTANT or
metadata/config-bounded relations (region/nation, 1-row aggregates,
literal band tables, k centroids, sketch widths) plus the two declared
exact-baseline exceptions. Scale-factor-growing dimensions must go
through ``operators.bcast.dim_broadcast`` (threshold-gated) instead —
a hard hint on a growing relation is a driver OOM at 100× and this
test makes adding one a deliberate, documented act.
"""

from __future__ import annotations

import glob
import os
import re
from collections import Counter

ROOT = os.path.join(os.path.dirname(__file__), "..", "flink_cdc_msk_spark")

# (file, enclosing function) -> number of hard broadcast sites.
# Growth bounds for every entry are documented in PLANS.md
# §"Round-9 broadcast census".
ALLOWED = {
    ("operators/bcast.py", "dim_broadcast"): 1,  # the gate itself
    ("operators/clustering.py", "_dist_table"): 1,  # k centroids
    ("operators/clustering.py", "ivf_topk_exact_repro"): 1,  # query set
    ("operators/clustering.py", "pq_adc_rerank_topk"): 1,  # top-N shortlist
    ("operators/clustering.py", "pq_adc_topk"): 1,  # k x subspace LUT
    ("operators/dedup.py", "bloom_prefilter_dedup"): 1,  # m_bits config
    ("operators/similarity.py", "brute_force_topk"): 1,  # query set
    # declared exceptions: exact O(n²) baselines broadcast the corpus by
    # contract; lsh_near_dup_pairs is the scale path
    ("operators/similarity.py", "gen"): 1,
    ("operators/similarity.py", "near_dup_pairs_catalyst"): 1,
    # r12: the two per-branch centroid broadcasts consolidated into one
    # site (norm hoisted once below the broadcast); probed stays under
    # `nearest` per the nearest-preceding-def attribution
    ("operators/similarity.py", "ivf_topk"): 1,  # k centroids
    ("operators/similarity.py", "kmeans_centroids"): 1,  # k centroids
    ("operators/similarity.py", "nearest"): 1,  # probed cluster list
    ("operators/sketch.py", "cms_estimate"): 1,  # w x d sketch
    ("plans/analytics_extras.py", "agg_equi_depth_histogram"): 1,  # B bounds
    ("plans/analytics_extras.py", "events_anomaly_zscore"): 1,  # per type
    ("plans/analytics_extras2.py", "_kmv_finish"): 1,  # 4 groups
    ("plans/analytics_extras2.py", "graph_bfs_hops"): 1,  # 1-row min
    ("plans/llm_pipeline.py", "llm_corpus_pipeline_v2"): 2,  # 1-row + langs
    ("plans/llm_pipeline.py", "sample_temperature"): 2,  # 1-row + langs
    ("plans/llm_pipeline.py", "text_decontaminate"): 1,  # fixed benchmark
    # tfidf 1-row corpus count (keyed to the nearest preceding def,
    # the inner _tf_rel, after the round-10 memo refactor)
    ("plans/llm_pipeline.py", "_tf_rel"): 1,
    ("plans/relational.py", "agg_hll_sketch"): 1,  # 1-row distinct
    ("plans/relational.py", "agg_rollup"): 2,  # nation+region
    ("plans/relational.py", "agg_rollup_grouping_id"): 2,  # nation+region
    ("plans/relational.py", "agg_string_agg"): 1,  # nation
    ("plans/relational.py", "join_broadcast_dims"): 2,  # nation+region
    ("plans/relational.py", "join_cross_small"): 1,  # literal severities
    ("plans/relational.py", "join_range_bands"): 1,  # literal bands
    ("plans/relational.py", "q10_returned_items"): 1,  # nation
    ("plans/relational.py", "q11_important_stock"): 1,  # 1-row threshold
    ("plans/relational.py", "q15_top_supplier"): 1,  # 1-row max
    ("plans/relational.py", "q22_idle_customers"): 2,  # 1-row avg + nation
    ("plans/relational.py", "q5_local_supplier_volume"): 1,  # region⋈nation
    ("plans/relational.py", "q7_volume_shipping"): 1,  # nation
    ("plans/relational.py", "q8_market_share"): 2,  # nation⋈region, nation
    ("plans/round5_extras.py", "layout_compaction_plan"): 1,  # 1-row target
    ("plans/round5_extras.py", "text_perplexity_filter"): 1,  # 1-row |V|
    ("plans/round6_extras.py", "_bpe_round"): 1,  # 1-row merge pick
    ("plans/round8_extras.py", "llm_mixture_plan"): 1,  # 1-row totals
    ("plans/round8_extras.py", "sample_curriculum_order"): 1,  # bucket×shard
    ("plans/round10b_extras.py", "bm25_rank"): 1,  # 1-row stats
    # ≤DSIR_BUCKETS-row log-ratio model — the r11 refactor moved the
    # hint into the shared _dsir_scored prefix both DSIR consumers use
    ("plans/round10b_extras.py", "_dsir_scored"): 1,
    # sizes table ≤ n_sources rows, joined from both sides
    ("plans/round10b_extras.py", "source_overlap_matrix"): 2,
    # (the streaming twins delegate to bm25_rank/dsir_select, so their
    # broadcasts are the entries above)
    # ≤512-row log-ratio model + the k selected ids (TakeOrdered output)
    ("plans/round10b_extras.py", "llm_dsir_source_mixture"): 1,  # sel_ids
    ("plans/windows_events.py", "events_resample_gapfill"): 1,  # types
    ("plans/windows_events.py", "streaming_incremental_batches"): 1,  # 1-row
}


def _census() -> Counter:
    sites: Counter = Counter()
    for path in sorted(
        glob.glob(os.path.join(ROOT, "**", "*.py"), recursive=True)
    ):
        rel = os.path.relpath(path, ROOT).replace(os.sep, "/")
        fn = "?"
        for line in open(path):
            stripped = line.split("#", 1)[0]
            m = re.match(r"\s*def (\w+)", line)
            if m:
                fn = m.group(1)
            n = stripped.count("F.broadcast(") + stripped.count(
                'hint("broadcast")'
            )
            if n:
                sites[(rel, fn)] += n
    return sites


def test_no_unclassified_hard_broadcasts():
    found = _census()
    extra = {k: v for k, v in found.items() if v > ALLOWED.get(k, 0)}
    assert not extra, (
        "hard broadcast hint(s) not in the PLANS.md census — classify "
        f"the growth bound (or use dim_broadcast): {extra}"
    )
    gone = {k: v for k, v in ALLOWED.items() if found.get(k, 0) < v}
    assert not gone, (
        f"census stale — update ALLOWED and PLANS.md: {gone}"
    )


def test_growing_dims_use_threshold_gate(spark):
    """dim_broadcast hints at test scale (plan equals the old hinted
    plan) and declines when the estimate exceeds the threshold."""
    from pyspark.sql import functions as F

    from flink_cdc_msk_spark.operators.bcast import dim_broadcast
    from flink_cdc_msk_spark.sources.tables import load_tables

    sup = load_tables(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01"
    ))["supplier"]
    li = load_tables(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01"
    ))["lineitem"]

    plan_small = li.join(
        dim_broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
        gated = dim_broadcast(sup)
        # estimate (> 1 byte) exceeds the bar -> NO hint applied
        plan = gated._jdf.queryExecution().logical().toString()
        assert "UnresolvedHint" not in plan and "ResolvedHint" not in plan
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert "Hint" not in dim_broadcast(sup)._jdf.queryExecution(
        ).logical().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_broadcast_threshold_unit_suffixes(spark):
    """ADVICE r9 (low): a user-raised threshold expressed with a byte
    unit ('20mb') must be honored, not silently replaced by the 10 MiB
    fallback."""
    from flink_cdc_msk_spark.operators.bcast import (
        _parse_bytes,
        broadcast_threshold,
        dim_broadcast,
    )
    from flink_cdc_msk_spark.sources.tables import load_tables

    assert _parse_bytes("10485760") == 10 * 1024 * 1024
    assert _parse_bytes("10485760b") == 10 * 1024 * 1024
    assert _parse_bytes("10MB") == 10 * 1024 * 1024
    assert _parse_bytes("512m") == 512 * 1024 * 1024
    assert _parse_bytes("2g") == 2 * 1024 ** 3
    assert _parse_bytes("-1") == -1

    sup = load_tables(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01"
    ))["supplier"]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "512mb")
        assert broadcast_threshold(sup) == 512 * 1024 * 1024
        # under a raised unit-suffixed bar the hint IS applied
        plan = dim_broadcast(sup)._jdf.queryExecution().logical().toString()
        assert "Hint" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
