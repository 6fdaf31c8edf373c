"""Round-11: streaming source-overlap twin (VERDICT r10 item 8)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_streaming_source_overlap_matches_batch(spark):
    # the lossless-fold argument, pinned end-to-end at sf0.001: the
    # streamed replay's folded signatures must reproduce the batch
    # sketch query's rows EXACTLY (element-wise min of per-batch
    # partials == whole-corpus signature; shared emission tail)
    from flink_cdc_msk_spark.plans.round10b_extras import (
        text_source_overlap_sketch,
    )
    from flink_cdc_msk_spark.plans.round11_extras import (
        streaming_source_overlap,
    )

    sf = "/root/testdata/sf0.001"
    assert sorted(map(str, streaming_source_overlap(spark, sf).collect())) == \
        sorted(map(str, text_source_overlap_sketch(spark, sf).collect()))


def test_minhash_partial_fold_is_lossless(spark):
    # the algebra itself, isolated: signatures of a union == element-
    # wise min of the parts' signatures, for an arbitrary 3-way split
    from flink_cdc_msk_spark.functions import text as T
    from flink_cdc_msk_spark.plans.round10b_extras import (
        _SIG_K,
        source_minhash_sigs,
    )

    docs = spark.createDataFrame(
        [
            (i, f"s{i % 2}", f"tok{i} tok{i+1} tok{i+2} tok{i+3} tok{i%5}")
            for i in range(30)
        ],
        "doc_id long, source string, text string",
    )

    def occ(df):
        return df.select(
            "source",
            F.explode(
                T.shingles_from_tokens(T.tokens("text"), 3)
            ).alias("sh"),
        )

    whole = {
        r.source: [r[f"h{i}"] for i in range(_SIG_K)]
        for r in source_minhash_sigs(occ(docs)).collect()
    }
    parts = [
        source_minhash_sigs(occ(docs.filter(F.col("doc_id") % 3 == k)))
        for k in range(3)
    ]
    folded = {}
    for p in parts:
        for r in p.collect():
            cur = folded.setdefault(r.source, [None] * _SIG_K)
            for i in range(_SIG_K):
                v = r[f"h{i}"]
                cur[i] = v if cur[i] is None else min(cur[i], v)
    assert folded == whole


def test_pruned_jaccard_detection_contract(spark):
    # the guard's documented miss-mode, constructed: ten docs share the
    # SAME text (pairwise jaccard 1.0), so every unit has df=10; with
    # max_token_freq=5 every posting is pruned and NO pair surfaces —
    # while two docs sharing a rare tail still pair up. Production
    # sizes K to the duplication profile; the oracle mirrors the same
    # rule, so the driver gate certifies both engines miss identically.
    from flink_cdc_msk_spark.operators.dedup import jaccard_pairs

    common = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(i, common) for i in range(10)]
        + [(20, common + " iota kappa"), (21, common + " iota kappa")],
        "doc_id long, text string",
    )
    out = jaccard_pairs(
        docs, threshold=0.8, ngram=3, hashed=False, max_token_freq=5
    ).collect()
    pairs = {(r.id1, r.id2) for r in out}
    # the rare-tail pair survives (its junction shingles have df=2)...
    assert (20, 21) in pairs
    # ...and no pair among the 10 all-common docs does (df=10 > K=5
    # prunes every shared posting), despite jaccard 1.0
    assert not any(i < 10 and j < 10 for i, j in pairs)

    unpruned = jaccard_pairs(
        docs, threshold=0.8, ngram=3, hashed=False
    ).collect()
    assert len({(r.id1, r.id2) for r in unpruned}) == 45 + 1  # C(10,2)+1
