"""Round 13 (optimization round 2) pins: the LSH rework.

The default lsh_near_dup_pairs path changed shape this round — Arrow
bucketing (one vectorized numpy pass), localCheckpoint'ed entry
relation, and a grouped-numpy in-bucket verify with Catalyst doing the
exact round+threshold — so these tests pin (a) that every form still
emits the IDENTICAL pair set, and (b) the default plan shape the
OPTIMIZATION_r13.md evidence claims.
"""

from __future__ import annotations

import pytest

from flink_cdc_msk_spark.operators import similarity as S

SF = "/root/testdata/sf0.01"

LEGACY = dict(
    _entries_form="join", _salt_form="blanket", _verify_form="smj"
)


def _rows(df):
    return sorted((r.id1, r.id2, r.cos) for r in df.collect())


def _emb(spark, planted: bool = False):
    if planted:
        from flink_cdc_msk_spark.plans.round10_extras import (
            _emb_with_planted_neardups,
        )

        return _emb_with_planted_neardups(spark, SF)
    from flink_cdc_msk_spark.sources.tables import load_tables

    return load_tables(spark, SF)["embeddings"]


@pytest.mark.parametrize(
    "kw",
    [
        # the dense registered regime (embedding_near_dup_lsh)
        dict(threshold=0.3, n_planes=4, n_tables=8, portable_dims=64),
        # the hi registered regime (embedding_near_dup_lsh_hi's params;
        # needs the planted-clone corpus for a non-empty survivor set)
        dict(
            threshold=0.8,
            n_planes=10,
            n_tables=8,
            portable_dims=64,
            _emit_order="cos_first",
            _planted=True,
        ),
        # non-portable (xxhash hyperplanes): arrow unavailable → the
        # auto entries form is the hoisted Catalyst fold
        dict(threshold=0.3, n_planes=4, n_tables=8),
    ],
)
def test_lsh_forms_emit_identical_pairs(spark, kw):
    kw = dict(kw)
    emb = _emb(spark, planted=kw.pop("_planted", False))
    legacy = _rows(S.lsh_near_dup_pairs(emb, **kw, **LEGACY))
    assert legacy  # non-degenerate corpus
    assert _rows(S.lsh_near_dup_pairs(emb, **kw)) == legacy
    assert (
        _rows(S.lsh_near_dup_pairs(emb, _entries_form="fold", **kw))
        == legacy
    )
    # adaptive salt on the legacy SMJ verify path
    assert (
        _rows(
            S.lsh_near_dup_pairs(
                emb,
                _entries_form="fold",
                _salt_form="adaptive",
                _verify_form="smj",
                **kw,
            )
        )
        == legacy
    )


def test_lsh_default_plan_shape(spark):
    """The r13 default: 2 MapInArrow stages (bucketing + verify), ONE
    hash exchange on (table, bucket) feeding the verify plus the final
    round/filter projection — no SortMergeJoin, no salted self-join, no
    BatchEvalPython, and the checkpointed entry relation enters as a
    scan of an existing RDD."""
    df = S.lsh_near_dup_pairs(
        _emb(spark), threshold=0.3, n_planes=4, n_tables=8,
        portable_dims=64,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1  # the verify stage
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "ExistingRDD" in plan or "LogicalRDD" in plan  # checkpoint
    # the bucketing MapInArrow ran at construction (eager checkpoint);
    # the executed plan reads its materialization, not the subtree
    assert plan.count("Exchange") == 1


def test_arrow_wide_entries_bit_identical_to_fold(spark):
    """The numpy bucketing stage must produce the SAME buckets, double
    vectors and norms as the Catalyst fold projections — left-deep
    sequential arithmetic both sides."""
    from pyspark.sql import functions as F

    emb = _emb(spark)
    T, P = 8, 4
    arrow = S._arrow_wide_entries(
        emb, P, T, "vec_id", "embedding", dims=64
    )
    fold = S.random_hyperplane_buckets(
        emb, P, T, "vec_id", "embedding", portable_dims=64,
        wide=True, carry_vec=("v", "nv"),
    )
    cols = ["id", "nv", "v"] + [f"tb{t}" for t in range(T)]
    a = sorted(map(str, arrow.select(*cols).collect()))
    # fold output is post-explode (T rows per id) — dedupe to the wide
    # row for the compare
    b = sorted(
        map(str, fold.select(*cols).distinct().collect())
    )
    assert a == b
