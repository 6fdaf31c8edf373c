"""Round-10 tests: Rabin-Karp boundary fast path for offset-invariant
substring dedup (VERDICT r9 item 1).

The "done" bar: boundary equality between every evaluation form of the
RK chunker (numpy batch UDF == pure-Python reference; the DuckDB SQL
form is covered separately by the registered oracle hash-match), and
the round-9 unaligned-plant property test green on the fast path."""

from __future__ import annotations

import random
from unittest import mock

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_cdc_msk_spark.functions.rolling_hash import (
    _rk_anchor_lists,
    rk_anchors,
    rk_anchors_py,
)
from flink_cdc_msk_spark.plans import round10_extras as r10
from tests.conftest import SF_ORACLE

ALPHA = "abcdefghijklmnopqrstuvwxyz "


def _run_on(spark, docs):
    with mock.patch.object(
        r10, "_docs_with_near_dups", lambda spark, sf_dir: docs
    ):
        return {
            r.doc_id: r
            for r in r10.text_substring_dedup_rk(spark, "-").collect()
        }


@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=300,
        ),
        max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_rk_batch_matches_python_reference(texts):
    """The vectorized batch form (concatenated code-point array, masked
    cross-doc windows) must agree with the character-at-a-time Python
    reference on arbitrary unicode, including empty strings and docs
    shorter than the window."""
    assert _rk_anchor_lists(texts) == [rk_anchors_py(t) for t in texts]


def test_rk_spark_bounds_match_python_reference(spark):
    """Boundary equality through the full Spark path (Arrow batching,
    many docs per batch) on the oracle corpus's documents plus random
    docs — the anchors the plan computes ARE the reference anchors."""
    rng = random.Random(1010)
    rows = [
        (i, "".join(rng.choice(ALPHA) for _ in range(rng.randint(0, 900))))
        for i in range(200)
    ]
    from flink_cdc_msk_spark.sources.tables import load_tables

    docs = load_tables(spark, SF_ORACLE)["documents"].select(
        "doc_id", "text"
    ).limit(300).union(
        spark.createDataFrame(
            [(1_000_000 + i, t) for i, t in rows],
            "doc_id long, text string",
        )
    )
    got = {
        r.doc_id: list(r.anchors)
        for r in docs.withColumn(
            "anchors", rk_anchors(F.col("text"))
        ).collect()
    }
    ref = {
        r.doc_id: rk_anchors_py(r.text) for r in docs.collect()
    }
    assert got == ref


def test_rk_dedup_catches_unaligned_offset_copies(spark):
    """The round-9 detection property, on the fast path: a passage
    planted at offsets that share no alignment is caught in both docs,
    covering most of the passage."""
    rng = random.Random(909)
    for trial in range(5):
        plen = rng.randint(400, 800)
        passage = "".join(rng.choice(ALPHA) for _ in range(plen))
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
        min_cover = plen - 4 * (r10.CDC_M + r10.CDC_W)
        for d in (1, 2):
            assert d in rows, (trial, plen, off_a, off_b, rows)
            assert rows[d].dup_chars >= min_cover, (
                trial, plen, off_a, off_b, rows[d],
            )
            assert rows[d].dup_chars <= plen + 2 * (r10.CDC_M + r10.CDC_W)


def test_rk_dedup_empty_short_and_disjoint_docs(spark):
    """Edge contract parity with the md5 mode: no phantom rows from
    empty docs, identical short docs still whole-doc match, disjoint
    alphabets report nothing."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "abc"), (3, "xyzzy"), (4, "xyzzy"), (5, ".")],
        "doc_id long, text string",
    )
    rows = _run_on(spark, docs)
    assert 1 not in rows and 2 not in rows and 5 not in rows
    for d in (3, 4):
        assert rows[d].dup_chars == 5
        assert float(rows[d].dup_frac) == 1.0
    rng = random.Random(17)
    a = "".join(rng.choice("abcdef") for _ in range(500))
    b = "".join(rng.choice("uvwxyz") for _ in range(500))
    assert _run_on(
        spark,
        spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string"),
    ) == {}


def test_rk_clone_flagged_as_full_span(spark):
    """Planted exact clones on the real oracle corpus: one maximal span
    covering the whole doc — same contract as the md5 mode."""
    out = r10.text_substring_dedup_rk(spark, SF_ORACLE)
    clones = out.filter(
        (F.col("doc_id") >= 1_000_000) & (F.col("doc_id") < 2_000_000)
    )
    assert clones.count() > 0
    assert clones.filter(
        (F.col("n_spans") != 1) | (F.col("dup_frac") < 1.0)
    ).count() == 0


def test_streaming_cdc_unit_catches_shifted_rearrival(spark, tmp_path):
    """The streaming gate's round-10 unit mode: a passage admitted in an
    earlier batch re-arrives at a shifted offset. The aligned-tile store
    shares ~no tiles with the shifted copy (admits it — the documented
    gap); the content-defined unit store reproduces the passage's
    interior chunks at any offset (rejects it)."""
    from flink_cdc_msk_spark.streaming.substring_stream import (
        StreamingSubstringDedupFilter,
    )

    rng = random.Random(42)
    passage = "".join(rng.choice(ALPHA) for _ in range(700))
    host_a = passage + "".join(rng.choice("0123456789") for _ in range(40))
    # shift by 17 — not a multiple of the 32-char tile width
    host_b = (
        "".join(rng.choice("ABCDEFGHIJKLMNOP") for _ in range(17))
        + passage
        + "".join(rng.choice("!@#$%^&*()") for _ in range(23))
    )
    outcomes = {}
    for unit in ("tile", "cdc"):
        root = str(tmp_path / unit)
        filt = StreamingSubstringDedupFilter(
            f"{root}/store", f"{root}/out", tau=0.5, unit=unit
        )
        filt(
            spark.createDataFrame([(1, host_a)], "doc_id long, text string"),
            0,
        )
        filt(
            spark.createDataFrame([(2, host_b)], "doc_id long, text string"),
            1,
        )
        admitted = sorted(
            r.doc_id
            for r in spark.read.parquet(f"{root}/out").collect()
        )
        outcomes[unit] = admitted
    assert outcomes["tile"] == [1, 2]  # aligned tiles miss the shift
    assert outcomes["cdc"] == [1]      # content-defined chunks catch it


def test_streaming_unit_marker_refuses_mismatch(spark, tmp_path):
    """The unit is a property of the store: re-opening a tile store with
    unit='cdc' (or vice versa) must refuse loudly — mixed-unit stores
    silently never match."""
    import pytest

    from flink_cdc_msk_spark.streaming.substring_stream import (
        StreamingSubstringDedupFilter,
    )

    root = str(tmp_path / "s")
    StreamingSubstringDedupFilter(f"{root}/store", f"{root}/out", unit="tile")
    with pytest.raises(ValueError, match="unit"):
        StreamingSubstringDedupFilter(
            f"{root}/store", f"{root}/out", unit="cdc"
        )
    # same unit re-opens fine
    StreamingSubstringDedupFilter(f"{root}/store", f"{root}/out", unit="tile")


@given(st.lists(st.binary(max_size=300), max_size=8))
@settings(max_examples=60, deadline=None)
def test_rk_byte_batch_matches_python_reference(payloads):
    """The byte-stream batch form must agree with the byte-at-a-time
    Python reference on arbitrary BINARY payloads (all 256 byte values,
    empty payloads, payloads shorter than the window)."""
    from flink_cdc_msk_spark.functions.rolling_hash import (
        _rk_byte_anchor_lists,
        rk_byte_anchors_py,
    )

    assert _rk_byte_anchor_lists(payloads, 64) == [
        rk_byte_anchors_py(p, 64) for p in payloads
    ]


def test_rk_byte_char_agreement_on_ascii():
    """The oracle-equivalence premise: on ASCII, byte values == code
    points, so the byte chunker and the text chunker anchor at the same
    positions (same modulus)."""
    from flink_cdc_msk_spark.functions.rolling_hash import (
        RK_M,
        rk_anchors_py,
        rk_byte_anchors_py,
    )

    rng = random.Random(3)
    for _ in range(20):
        s = "".join(rng.choice(ALPHA + "0123456789.,!?") for _ in range(400))
        assert rk_byte_anchors_py(s.encode("ascii"), RK_M) == rk_anchors_py(s)


def test_binary_cdc_dedup_catches_inserted_prefix(spark):
    """The capability the aligned block pass lacks: a payload re-upload
    with bytes INSERTED at the front (offset not a multiple of the
    block width). multimodal_chunk_dedup misses it; the content-defined
    version links the pair."""
    from flink_cdc_msk_spark.plans import round5_extras as r5

    rng = random.Random(77)
    body = "".join(rng.choice(ALPHA) for _ in range(900))
    shifted = "".join(rng.choice("0123456789") for _ in range(37)) + body
    docs = spark.createDataFrame(
        [(1, body), (2, shifted)], "doc_id long, text string"
    )

    with mock.patch.object(
        r10, "_docs_with_near_dups", lambda spark, sf_dir: docs
    ):
        cdc_pairs = {
            (r.id1, r.id2)
            for r in r10.multimodal_cdc_chunk_dedup(spark, "-").collect()
        }
    with mock.patch.object(
        r5, "_docs_with_near_dups", lambda spark, sf_dir: docs
    ):
        block_pairs = {
            (r.id1, r.id2)
            for r in r5.multimodal_chunk_dedup(spark, "-").collect()
        }
    assert (1, 2) in cdc_pairs      # content-defined: caught
    assert (1, 2) not in block_pairs  # aligned blocks: zero shared
