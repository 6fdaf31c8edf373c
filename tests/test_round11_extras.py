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
