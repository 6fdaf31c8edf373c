"""Round-10 second-session tests: BM25 ranked retrieval and DSIR
importance resampling — semantic pins on tiny synthetic corpora (the
registered-oracle hash gate at sf0.01 runs in test_queries_oracle.py).
"""

from __future__ import annotations

import math

from flink_cdc_msk_spark.plans.round10b_extras import (
    bm25_rank,
    dsir_select,
)


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_term_frequency_orders_equal_length_docs(spark):
    docs = _docs_df(
        spark,
        [
            (1, "s", "join join join pad pad pad"),
            (2, "s", "join pad pad pad pad pad"),
            (3, "s", "pad pad pad pad pad pad"),
        ],
    )
    got = bm25_rank(docs, terms=("join",), topk=10).collect()
    # doc 3 has no query term: excluded entirely
    assert [r.doc_id for r in got] == [1, 2]
    assert got[0].bm25 > got[1].bm25 > 0


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    # same tf, different lengths: the shorter doc scores higher (b>0)
    docs = _docs_df(
        spark,
        [
            (1, "s", "join pad"),
            (2, "s", "join " + "pad " * 40),
            (3, "s", "pad"),
        ],
    )
    got = {r.doc_id: r.bm25 for r in bm25_rank(docs, terms=("join",), topk=10).collect()}
    assert set(got) == {1, 2}
    assert got[1] > got[2]


def test_bm25_rare_term_outweighs_common_term(spark):
    # 'filter' appears in 1 of 4 docs, 'join' in 3 of 4 → idf(filter) >
    # idf(join); equal tf and dl → the filter-only doc outranks join-only
    docs = _docs_df(
        spark,
        [
            (1, "s", "join pad pad"),
            (2, "s", "join pad pad"),
            (3, "s", "join pad pad"),
            (4, "s", "filter pad pad"),
        ],
    )
    got = bm25_rank(docs, terms=("join", "filter"), topk=10).collect()
    assert got[0].doc_id == 4


def test_bm25_matches_hand_computed_score(spark):
    # one doc, one term: score = idf * tf(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
    docs = _docs_df(spark, [(1, "s", "join join pad pad")])
    [row] = bm25_rank(docs, terms=("join",), topk=5).collect()
    idf = math.log((1 - 1 + 0.5) / (1 + 0.5) + 1.0)
    expect = idf * 2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 1.0))
    assert abs(row.bm25 - round(expect, 4)) < 1e-9
    assert row.dl == 4


def test_bm25_topk_truncates(spark):
    docs = _docs_df(
        spark, [(i, "s", "join pad") for i in range(20)]
    )
    got = bm25_rank(docs, terms=("join",), topk=7).collect()
    assert len(got) == 7
    # identical scores → doc_id ascending tie-break
    assert [r.doc_id for r in got] == list(range(7))


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def _corpus(spark):
    # target slice: 'wiki'-like vocabulary; raw pool: one target-like
    # plant, one off-distribution doc, padding docs
    rows = [
        (1, "tgt", "science theory proof lemma theorem science proof"),
        (2, "tgt", "theory lemma theorem proof science theorem lemma"),
        (10, "raw", "science proof theorem lemma theory proof science"),
        (11, "raw", "buy cheap pills now click here buy cheap"),
        (12, "raw", "weather sunny rain cloud wind rain sunny cloud"),
    ]
    return _docs_df(spark, rows)


def test_dsir_target_like_doc_gets_highest_weight(spark):
    got = dsir_select(_corpus(spark), target_sources=("tgt",), topk=10).collect()
    by_id = {r.doc_id: r for r in got}
    # only raw-pool docs are candidates
    assert set(by_id) == {10, 11, 12}
    # the target-like plant dominates both the log-ratio weight and the
    # gumbel-perturbed selection score
    assert by_id[10].log_ratio > by_id[11].log_ratio
    assert by_id[10].log_ratio > by_id[12].log_ratio
    assert max(got, key=lambda r: r.dsir_score).doc_id == 10


def test_dsir_disjoint_vocab_weight_is_negative(spark):
    got = {
        r.doc_id: r.log_ratio
        for r in dsir_select(
            _corpus(spark), target_sources=("tgt",), topk=10
        ).collect()
    }
    # a doc sharing no features with the target slice has
    # p_target(f) = 1/(Nt+B) for each of its features, below its raw
    # probability → strictly negative summed log-ratio
    assert got[11] < 0


def test_dsir_topk_and_determinism(spark):
    docs = _docs_df(
        spark,
        [(0, "tgt", "alpha beta gamma alpha beta")]
        + [(i, "raw", f"alpha beta tok{i} gamma") for i in range(1, 30)],
    )
    a = dsir_select(docs, target_sources=("tgt",), topk=5).collect()
    b = dsir_select(docs, target_sources=("tgt",), topk=5).collect()
    assert len(a) == 5
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    assert [r.dsir_score for r in a] == [r.dsir_score for r in b]


def test_dsir_excludes_target_slice_from_selection(spark):
    got = dsir_select(_corpus(spark), target_sources=("tgt",), topk=10).collect()
    assert all(r.source == "raw" for r in got)


# ---------------------------------------------------------------------------
# source overlap matrix
# ---------------------------------------------------------------------------


def test_overlap_matrix_detects_shared_shingles(spark):
    docs = _docs_df(
        spark,
        [
            (1, "a", "one two three four five"),
            (2, "b", "one two three nine ten"),
            (3, "c", "p q r s t"),
        ],
    )
    from flink_cdc_msk_spark.plans.round10b_extras import (
        source_overlap_matrix,
    )

    got = {(r.s1, r.s2): r for r in source_overlap_matrix(docs).collect()}
    # a: {one two three, two three four, three four five}
    # b: {one two three, two three nine, three nine ten} → inter=1, union=5
    assert set(got) == {("a", "b")}
    assert got[("a", "b")].intersecting == 1
    assert abs(got[("a", "b")].jaccard - 0.2) < 1e-9


def test_overlap_matrix_identical_sources_jaccard_one(spark):
    docs = _docs_df(
        spark,
        [
            (1, "a", "one two three four"),
            (2, "b", "one two three four"),
        ],
    )
    from flink_cdc_msk_spark.plans.round10b_extras import (
        source_overlap_matrix,
    )

    [row] = source_overlap_matrix(docs).collect()
    assert (row.s1, row.s2) == ("a", "b")
    assert row.jaccard == 1.0


def test_overlap_matrix_three_way_pairs(spark):
    # one shingle shared by all three sources → 3 pairs, each inter=1
    docs = _docs_df(
        spark,
        [
            (1, "a", "x y z"),
            (2, "b", "x y z unique1 tail1 tail2"),
            (3, "c", "x y z other1 other2 other3"),
        ],
    )
    from flink_cdc_msk_spark.plans.round10b_extras import (
        source_overlap_matrix,
    )

    got = {(r.s1, r.s2): r.intersecting
           for r in source_overlap_matrix(docs).collect()}
    assert got == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1}


# ---------------------------------------------------------------------------
# streaming twins
# ---------------------------------------------------------------------------


def test_streaming_twins_match_batch(spark):
    # the additive-stats argument, pinned end-to-end at sf0.001: the
    # streaming replays must produce exactly the batch queries' rows
    from flink_cdc_msk_spark.plans.round10b_extras import (
        llm_dsir_select,
        streaming_bm25_rank,
        streaming_dsir_select,
        text_bm25_rank,
    )

    sf = "/root/testdata/sf0.001"
    assert sorted(map(str, streaming_bm25_rank(spark, sf).collect())) == \
        sorted(map(str, text_bm25_rank(spark, sf).collect()))
    assert sorted(map(str, streaming_dsir_select(spark, sf).collect())) == \
        sorted(map(str, llm_dsir_select(spark, sf).collect()))


def test_overlap_sketch_min_invariance_and_self_gate(spark):
    # occurrence-fed signatures equal distinct-set signatures (min is
    # multiset-invariant) — the claim that lets the standalone sketch
    # path skip the distinct shuffle entirely
    from pyspark.sql import functions as F

    from flink_cdc_msk_spark.functions import text as T
    from flink_cdc_msk_spark.plans.round10b_extras import (
        _source_shingles,
        source_minhash_sigs,
        text_source_overlap_sketch,
    )

    docs = _docs_df(
        spark,
        [(1, "a", "x y z w x y z"), (2, "b", "x y z q r s t")],
    )
    occ = docs.select(
        "source",
        F.explode(T.shingles_from_tokens(T.tokens("text"), 3)).alias("sh"),
    )
    got_occ = sorted(map(str, source_minhash_sigs(occ).collect()))
    got_dist = sorted(
        map(str, source_minhash_sigs(_source_shingles(docs, 3)).collect())
    )
    assert got_occ == got_dist

    # self-gate shape on real data: est in [0,1], err = |est - exact|
    rows = text_source_overlap_sketch(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 190  # all C(20,2) pairs, zero-overlap included
    for r in rows:
        assert 0.0 <= r.est_jaccard <= 1.0
        assert abs(
            r.abs_err - round(abs(r.est_jaccard - r.exact_jaccard), 6)
        ) < 1e-9


def test_dsir_mixture_consistency_with_selection(spark):
    # the mixture view's per-source selected counts must sum to topk
    # and agree with the selection query's membership
    from flink_cdc_msk_spark.plans.round10b_extras import (
        DSIR_TOPK,
        llm_dsir_select,
        llm_dsir_source_mixture,
    )

    sf = "/root/testdata/sf0.001"
    mix = {r.source: r for r in llm_dsir_source_mixture(spark, sf).collect()}
    sel = llm_dsir_select(spark, sf).collect()
    assert sum(r.n_selected for r in mix.values()) == DSIR_TOPK == len(sel)
    from collections import Counter

    by_src = Counter(r.source for r in sel)
    for src, row in mix.items():
        assert row.n_selected == by_src.get(src, 0)
        assert abs(row.mixture_share - round(row.n_selected / DSIR_TOPK, 6)) < 1e-9
