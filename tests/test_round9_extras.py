"""Round-9 tests: offset-invariant (content-defined-chunk) substring
dedup."""

from __future__ import annotations

import random
from unittest import mock

from pyspark.sql import functions as F

from flink_cdc_msk_spark.plans import round9_extras as r9
from tests.conftest import SF_ORACLE

ALPHA = "abcdefghijklmnopqrstuvwxyz "


def _run_on(spark, docs):
    with mock.patch.object(
        r9, "_docs_with_near_dups", lambda spark, sf_dir: docs
    ):
        return {
            r.doc_id: r
            for r in r9.text_substring_dedup_cdc(spark, "-").collect()
        }


def test_cdc_dedup_flags_full_clone_as_one_span(spark):
    """A planted exact clone is ONE maximal span covering the whole doc
    (dup_frac == 1.0) — same contract as the aligned twin."""
    out = r9.text_substring_dedup_cdc(spark, SF_ORACLE)
    clones = out.filter(
        (F.col("doc_id") >= 1_000_000) & (F.col("doc_id") < 2_000_000)
    )
    assert clones.count() > 0
    bad = clones.filter(
        (F.col("n_spans") != 1) | (F.col("dup_frac") < 1.0)
    ).count()
    assert bad == 0


def test_cdc_dedup_catches_unaligned_offset_copies(spark):
    """THE round-9 property: a passage planted at two offsets that
    differ by a non-multiple of every tile width (so fixed tiling can
    never line them up) is caught in BOTH docs, covering most of the
    passage. Random passages/offsets — inputs the operator never saw."""
    rng = random.Random(909)
    for trial in range(5):
        plen = rng.randint(400, 800)
        passage = "".join(rng.choice(ALPHA) for _ in range(plen))
        # host prefixes with lengths ≢ each other mod 32 (the old TILE),
        # and random suffixes, so the copies share no alignment
        off_a = rng.randint(50, 300)
        off_b = off_a + rng.choice([1, 3, 5, 7, 11, 17, 29, 33])
        pre_a = "".join(rng.choice("0123456789") for _ in range(off_a))
        pre_b = "".join(
            rng.choice("ABCDEFGHIJKLMNOP") for _ in range(off_b)
        )
        suf_a = "".join(rng.choice("QRSTUVWXYZ") for _ in range(63))
        suf_b = "".join(rng.choice("!@#$%^&*()") for _ in range(41))
        docs = spark.createDataFrame(
            [(1, pre_a + passage + suf_a), (2, pre_b + passage + suf_b)],
            "doc_id long, text string",
        )
        rows = _run_on(spark, docs)
        # detection guarantee: interior chunks of the shared passage are
        # identical in both docs; edge loss is bounded by ~2 chunks + the
        # anchor window on each side
        min_cover = plen - 4 * (r9.CDC_M + r9.CDC_W)
        for d in (1, 2):
            assert d in rows, (trial, plen, off_a, off_b, rows)
            assert rows[d].dup_chars >= min_cover, (
                trial, plen, off_a, off_b, rows[d],
            )
            # nothing OUTSIDE the passage is shared: cover can't exceed
            # the passage plus one boundary chunk on each side
            assert rows[d].dup_chars <= plen + 2 * (r9.CDC_M + r9.CDC_W)


def test_cdc_dedup_empty_and_short_docs(spark):
    """Empty docs produce no phantom chunks (the Spark descending-
    sequence trap); short (< W) unique docs produce no dup rows; two
    identical short docs still match (whole-doc chunk)."""
    docs = spark.createDataFrame(
        [
            (1, ""),
            (2, "abc"),
            (3, "xyzzy"),
            (4, "xyzzy"),
            (5, "."),
        ],
        "doc_id long, text string",
    )
    rows = _run_on(spark, docs)
    assert 1 not in rows and 2 not in rows and 5 not in rows
    for d in (3, 4):
        assert rows[d].dup_chars == 5
        assert rows[d].n_spans == 1
        assert float(rows[d].dup_frac) == 1.0


def test_cdc_dedup_disjoint_docs_report_nothing(spark):
    """Documents over disjoint alphabets share no chunk — zero rows."""
    rng = random.Random(17)
    a = "".join(rng.choice("abcdef") for _ in range(500))
    b = "".join(rng.choice("uvwxyz") for _ in range(500))
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    assert _run_on(spark, docs) == {}
