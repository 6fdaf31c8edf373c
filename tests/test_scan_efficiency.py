"""Scan-efficiency gates: predicate pushdown, column pruning, and
partition pruning must actually reach the parquet scan — the properties
that decide whether a 100 TB read touches 100 TB or 1 TB.
"""

from __future__ import annotations

import re
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _scan_line(plan: str) -> str:
    for line in plan.splitlines():
        if "Scan parquet" in line or "FileScan parquet" in line:
            return line
    return ""


def _formatted(q) -> str:
    jvm = q.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return q._jdf.queryExecution().explainString(mode)


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    q = li.filter(F.col("l_discount") > 0.05).select("l_extendedprice")
    plan = _formatted(q)
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed, plan
    assert "l_discount" in pushed.group(1)  # predicate reached the reader


def test_column_pruning_reaches_scan(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    q = li.filter(F.col("l_discount") > 0.05).select("l_extendedprice")
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    # only the referenced columns — not the 11-column table
    assert cols == {"l_extendedprice", "l_discount"}


def test_partition_pruning_on_partitioned_layout(spark):
    """Hive-style partitioned write + a partition filter: the scan must
    show PartitionFilters and plan only the matching partition
    directories — the data-lake layout story for the events stream."""
    d = tempfile.mkdtemp(prefix="part_events_")
    try:
        from flink_cdc_msk_spark.sources.tables import load_tables

        ev = load_tables(spark, SF_SMALL)["events"]
        ev.withColumn("day", F.to_date("ts")).write.mode(
            "overwrite"
        ).partitionBy("day").parquet(d)

        days = [r.day for r in spark.read.parquet(d).select("day").distinct().collect()]
        target = sorted(days)[0]
        q = spark.read.parquet(d).filter(F.col("day") == F.lit(target))
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
        assert "day" in pf and pf.strip() != ""
        # and the pruned read returns exactly that day's rows
        expect = ev.filter(F.to_date("ts") == F.lit(target)).count()
        assert q.count() == expect
    finally:
        shutil.rmtree(d, ignore_errors=True)

def test_pack_sequences_has_no_global_sort(spark):
    """Scale gate for text_pack_sequences: the packing cumsum must run as
    a shard-partitioned window (hash shuffle + per-shard sorts), never an
    Exchange SinglePartition funneling the whole corpus through one task
    (the round-1 shape)."""
    from flink_cdc_msk_spark.plans.llm_pipeline import text_pack_sequences

    plan = (
        text_pack_sequences(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(shard" in plan, plan


def test_decontaminate_broadcasts_benchmark_shingles(spark):
    """Scale gate for text_decontaminate: the benchmark shingle set must
    BROADCAST (map-side probe) — a shuffled join on shingles would move
    the whole corpus's token stream at 100 TB."""
    from flink_cdc_msk_spark.plans.llm_pipeline import text_decontaminate

    plan = (
        text_decontaminate(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_tfidf_corpus_count_is_plan_side_broadcast(spark):
    """The corpus count in text_tfidf_top_terms must ride INSIDE the plan
    as a broadcast 1-row aggregate (BroadcastNestedLoopJoin of the count
    subtree), not as a driver-side count() stitched in as a literal."""
    from flink_cdc_msk_spark.plans.llm_pipeline import text_tfidf_top_terms

    plan = (
        text_tfidf_top_terms(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_segment_dedup_has_no_global_sort(spark):
    """First-occurrence election must be a window over the SEGMENT key
    (high-cardinality hash partition), never an all-rows global sort; the
    reassembly agg must partition on doc_id."""
    from flink_cdc_msk_spark.plans.llm_pipeline import text_segment_dedup

    plan = (
        text_segment_dedup(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(seg" in plan, plan


def test_q21_no_cartesian_product(spark):
    """The semi+anti self-join decorrelation must stay key-equi: a
    CartesianProduct/BroadcastNestedLoopJoin here means the inequality
    conjunct displaced the equi-key and the plan is corpus² at scale."""
    from flink_cdc_msk_spark.plans.relational import q21_last_shipper

    plan = (
        q21_last_shipper(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_streaming_interval_join_state_is_bounded(spark):
    """The stream-stream join must carry watermarks on BOTH sides and an
    event-time range condition — that pair is what lets Spark expire join
    state. Build the registered query's join topology on a real streaming
    source (rate — analysis only, never started) and assert the analyzed
    plan records both EventTimeWatermark nodes; a batch stand-in would
    silently elide them (withWatermark is a no-op outside streaming)."""
    from pyspark.sql import functions as F

    src = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    clicks = src.select(
        F.col("value").alias("click_id"),
        (F.col("value") % 5).alias("c_user"),
        F.col("timestamp").alias("click_ts"),
    ).withWatermark("click_ts", "2 hours")
    views = src.select(
        F.col("value").alias("view_id"),
        (F.col("value") % 5).alias("v_user"),
        F.col("timestamp").alias("view_ts"),
    ).withWatermark("view_ts", "2 hours")
    j = clicks.join(
        views,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("view_ts") <= F.col("click_ts")),
    )
    logical = j._jdf.queryExecution().analyzed().toString()
    assert logical.count("EventTimeWatermark") == 2, logical


def test_corpus_pipeline_v2_shuffle_budget(spark):
    """The composed prep pipeline's surviving-docs subtree must be CACHED
    and reused (the language-histogram branch re-executing the whole
    filter+dedup subtree doubles the corpus work), and the number of
    DISTINCT shuffle exchanges (unique plan_ids — the printed plan
    repeats the cache-miss subtree under every InMemoryRelation
    reference) must stay within the documented budget."""
    import re

    from flink_cdc_msk_spark.plans.llm_pipeline import llm_corpus_pipeline_v2

    plan = (
        llm_corpus_pipeline_v2(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("InMemoryTableScan") >= 2, "kept-subtree not reused"
    ids = set()
    for ln in plan.splitlines():
        stripped = ln.strip().lstrip("*+-: ").lstrip("(0123456789) ")
        if stripped.startswith("Exchange") and "SinglePartition" not in ln:
            m = re.search(r"plan_id=(\d+)", ln)
            ids.add(m.group(1) if m else ln)
    assert len(ids) <= 5, f"{len(ids)} distinct shuffle exchanges"


def test_brute_force_topk_prunes_before_ranking_exchange(spark):
    """Two-phase top-k: the q×n scored set must be pruned to local
    top-k per partition BEFORE the global ranking exchange. Since r12
    the partial prune is Spark 4's native WindowGroupLimit pushdown
    (mode Partial below the exchange, Final above), replacing the old
    hand-rolled MapInPandas — so the plan must carry NO Python
    boundary at all, and the only hash exchange sits ABOVE a Partial
    WindowGroupLimit, carrying at most queries × partitions × k rows,
    never the full scored set."""
    from flink_cdc_msk_spark.operators import similarity as S
    from flink_cdc_msk_spark.plans.llm_pipeline import load_tables

    emb = load_tables(spark, SF_SMALL)["embeddings"]
    out = S.brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    ex = [i for i, ln in enumerate(lines)
          if "Exchange hashpartitioning" in ln]
    partial = [i for i, ln in enumerate(lines)
               if "WindowGroupLimit" in ln and "Partial" in ln]
    assert len(ex) == 1, f"expected exactly 1 hash exchange:\n{plan}"
    assert partial, f"no Partial WindowGroupLimit prune stage:\n{plan}"
    # plan trees print top-down: the exchange (above) must appear on an
    # EARLIER line than the partial group-limit it consumes
    assert ex[0] < partial[0], f"exchange below the prune stage:\n{plan}"
    # the operator's only former Python boundary is gone for good
    for node in ("MapInPandas", "BatchEvalPython", "ArrowEvalPython"):
        assert node not in plan, f"unexpected Python boundary {node}:\n{plan}"


def test_dedup_verify_joins_never_broadcast_corpus(spark):
    """The jaccard/minhash verify joins bring corpus-sized unit arrays
    back per candidate. Catalyst's stats estimate for the persisted
    units can fall under the broadcast threshold at test scale — but a
    driver-side broadcast of a corpus-sized relation is exactly wrong at
    100 TB (and OOMs a small driver even at sf0.1). The SHUFFLE_HASH
    hint must pin both verify joins: no BroadcastHashJoin anywhere in
    either plan."""
    from flink_cdc_msk_spark.operators import dedup as D
    from flink_cdc_msk_spark.sources.tables import load_tables

    docs = load_tables(spark, SF_SMALL)["documents"]
    for plan_df in (
        D.jaccard_pairs(docs, 0.8, ngram=3),
        D.minhash_lsh_pairs(docs, 0.5, ngram=3),
        D.simhash_pairs(docs, max_hamming=3),
    ):
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan
