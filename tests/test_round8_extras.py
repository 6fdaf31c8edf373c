"""Semantic pins for the round-8 curation operators — properties the
DuckDB-oracle hash can't articulate on its own (the oracle proves the two
engines agree; these prove they agree on the RIGHT thing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cdc_msk_spark.plans import round8_extras as r8
from tests.conftest import SF_ORACLE


def test_substring_dedup_flags_full_clone_as_one_span(spark):
    """A planted exact clone must surface as ONE maximal span covering the
    whole document (dup_frac == 1.0), not a run of per-tile fragments —
    the gaps-and-islands merge is the point of the operator."""
    out = r8.text_substring_dedup(spark, SF_ORACLE)
    clones = out.filter(
        (F.col("doc_id") >= 1_000_000) & (F.col("doc_id") < 2_000_000)
    )  # exact clones only; the 2M+ rows are the planted NEAR dups
    assert clones.count() > 0
    bad = clones.filter(
        (F.col("n_spans") != 1) | (F.col("dup_frac") < 1.0)
    ).count()
    assert bad == 0


def test_substring_dedup_two_islands_merge_separately(spark):
    """Two duplicated regions separated by unique text must come out as
    two spans, with the gap's tiles excluded from dup_chars."""
    shared_a = "a" * 64  # tiles 0-1 of doc 1
    shared_b = "b" * 64  # tiles 4-5 of doc 1
    gap = "x" * 64  # unique to doc 1
    docs = spark.createDataFrame(
        [
            (1, shared_a + gap + shared_b),
            (2, shared_a),
            (3, shared_b),
        ],
        "doc_id long, text string",
    )
    # drive the same pipeline the query builds, minus the corpus loader
    from unittest import mock

    with mock.patch.object(
        r8, "_docs_with_near_dups", lambda spark, sf_dir: docs
    ):
        rows = {
            r.doc_id: r for r in r8.text_substring_dedup(spark, "-").collect()
        }
    assert rows[1].n_spans == 2
    assert rows[1].n_dup_tiles == 4
    assert rows[1].dup_chars == 128
    assert rows[2].n_spans == 1 and rows[2].dup_chars == 64


def test_phash_equal_payloads_hamming_zero(spark):
    """Identical payloads hash identically — every planted clone pair must
    be found with hamming 0 (the LSH-band recall guarantee at distance 0:
    all bands collide)."""
    out = r8.multimodal_phash_near_dup(spark, SF_ORACLE)
    zero = out.filter(F.col("hamming") == 0)
    n_clone_pairs = zero.filter(
        F.col("media_id_2") - F.col("media_id_1") == 1_000_000
    ).count()
    # sf0.01 plants a clone for every doc_id % 5 == 0 (500 docs -> 100)
    assert n_clone_pairs == 100


def test_mixture_plan_invariants(spark):
    """Temperature reweighting must (a) keep shares normalized, (b) give
    every low-resource domain a HIGHER target share than natural share,
    and (c) conserve the token budget across domains."""
    rows = r8.llm_mixture_plan(spark, SF_ORACLE).collect()
    nat = sum(r.nat_share for r in rows)
    tgt = sum(r.target_share for r in rows)
    assert abs(nat - 1.0) < 1e-3 and abs(tgt - 1.0) < 1e-3
    mean_tokens = sum(r.n_tokens for r in rows) / len(rows)
    for r in rows:
        if r.n_tokens < 0.5 * mean_tokens:
            assert r.target_share > r.nat_share, r
    budget = 0.5 * sum(r.n_tokens for r in rows)
    assert abs(sum(r.sample_tokens for r in rows) - budget) < 1.0


def test_quality_prune_keeps_top80_per_domain(spark):
    """The prune is PER-DOMAIN: every source keeps ~80% of its docs (no
    domain is wiped out), and nothing kept ranks below the 0.2 cut."""
    out = r8.text_quality_prune_per_domain(spark, SF_ORACLE)
    kept = out.groupBy("source").count().collect()
    assert len(kept) == 20  # every source survives
    assert out.filter(F.col("qtile") < 0.2).count() == 0


def test_curriculum_order_is_contiguous_staged_permutation(spark):
    """global_pos must be an exact permutation of 0..N-1 (the stitched
    shard offsets leave no gaps), and stages must be contiguous: every
    bucket-b position precedes every bucket-(b+1) position."""
    from flink_cdc_msk_spark.plans.round8_extras import sample_curriculum_order

    rows = sample_curriculum_order(spark, SF_ORACLE).collect()
    positions = sorted(r.global_pos for r in rows)
    assert positions == list(range(len(rows)))
    max_pos = {}
    min_pos = {}
    for r in rows:
        max_pos[r.bucket] = max(max_pos.get(r.bucket, -1), r.global_pos)
        min_pos[r.bucket] = min(
            min_pos.get(r.bucket, 1 << 60), r.global_pos
        )
    buckets = sorted(max_pos)
    for lo, hi in zip(buckets, buckets[1:]):
        assert max_pos[lo] < min_pos[hi]


def test_tokenizer_fertility_sane(spark):
    """Fertility under a learned BPE vocabulary is >= 1 unit per
    whitespace token (BPE can only split words, never merge across
    whitespace — the pre-tokenizer guarantees it), for every language."""
    from flink_cdc_msk_spark.plans.round8_extras import llm_tokenizer_fertility

    rows = llm_tokenizer_fertility(spark, SF_ORACLE).collect()
    assert len(rows) == 5  # en/de/fr/es/zh
    for r in rows:
        assert r.fertility >= 1.0, r
        assert r.chars_per_unit > 0, r


def test_bpe_memo_survives_parent_unpersist(spark):
    """The memoized BPE encode must be lineage-truncated (checkpointed):
    a persisted-but-dependent relation is silently re-computed on every
    action after its parents are unpersisted (PERF §23). Scan the
    memoized plan for the checkpoint scan node and pin the re-scan cost
    class by asserting the plan no longer contains the encode join."""
    from flink_cdc_msk_spark.plans.round6_extras import bpe_doc_units
    from tests.conftest import SF_ORACLE

    du = bpe_doc_units(spark, SF_ORACLE)
    plan = du._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "ExistingRDD" in plan, plan
    assert "Join" not in plan, plan


def test_substring_stream_rejects_assembled_boilerplate(spark, tmp_path):
    """The tile filter's reason to exist: a doc STITCHED from two
    admitted docs' halves is rejected (its tiles are 100% duplicated)
    even though its whole-doc similarity to EITHER source is far below
    any near-dup threshold — invisible to the MinHash twin."""
    from flink_cdc_msk_spark.streaming.substring_stream import (
        StreamingSubstringDedupFilter,
    )

    a_text = "".join(chr(ord("a") + i % 26) * 4 for i in range(40))  # 160ch
    b_text = "".join(chr(ord("z") - i % 26) * 4 for i in range(40))  # 160ch
    stitched = a_text + b_text  # every 32-char tile comes from a or b
    fresh = "qu" * 80  # novel content, must pass
    filt = StreamingSubstringDedupFilter(
        str(tmp_path / "store"), str(tmp_path / "out"), tau=0.5
    )
    b1 = spark.createDataFrame(
        [(1, a_text), (2, b_text)], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(3, stitched), (4, fresh)], "doc_id long, text string"
    )
    filt(b1, 0)
    filt(b2, 1)
    out = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert out == {1, 2, 4}


def test_substring_dedup_prefix_property(spark):
    """Property (hypothesis): two docs sharing a random prefix P and
    diverging after it report EXACTLY the full tiles of P as one
    contiguous span — the operator's aligned-repeat guarantee, on
    inputs it never saw in a fixture."""
    import random
    from unittest import mock

    rng = random.Random(828)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    for trial in range(5):
        plen = rng.randint(64, 200)
        prefix = "".join(rng.choice(alpha) for _ in range(plen))
        tail_a = "".join(rng.choice(alpha.upper()) for _ in range(97))
        tail_b = "".join(rng.choice("0123456789") for _ in range(53))
        docs = spark.createDataFrame(
            [(1, prefix + tail_a), (2, prefix + tail_b)],
            "doc_id long, text string",
        )
        with mock.patch.object(
            r8, "_docs_with_near_dups", lambda spark, sf_dir: docs
        ):
            rows = {
                r.doc_id: r
                for r in r8.text_substring_dedup(spark, "-").collect()
            }
        full_tiles = plen // r8.TILE
        for d in (1, 2):
            assert rows[d].n_spans == 1, (trial, plen, rows[d])
            assert rows[d].n_dup_tiles == full_tiles, (trial, plen, rows[d])
            assert rows[d].dup_chars == full_tiles * r8.TILE
