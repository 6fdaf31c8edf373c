"""Round-11 additions.

* ``streaming_source_overlap`` — the streaming contamination guard
  (VERDICT r10 item 8): per-source MinHash signatures maintained
  INCREMENTALLY through Structured Streaming. MinHash state folds
  losslessly — each signature component is an algebraic MIN, so the
  element-wise minimum of per-batch partials equals the whole-corpus
  signature exactly (and occurrence-fed partials equal distinct-set
  partials, min being multiset-invariant). The twin therefore shares
  ``text_source_overlap_sketch``'s oracle VERBATIM and its emission
  tail by injection (``overlap_sketch_view(sigs=...)``), completing
  the retrieval/selection/forensics streaming tier alongside
  streaming_bm25_rank / streaming_dsir_select (§38 pattern).

Reference parity note: the reference repo (yhyyz/flink-cdc-msk) has no
data-curation surface — Part-B capability closure, LLM-pipeline rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..streaming.materialize import await_or_raise as _await_or_raise
from .registry import register
from .round10b_extras import (
    _OVERLAP_SH_MEMO,
    _SIG_K,
    _SKETCH_ORACLE,
    _docs,
    _sig_cols,
    _source_shingles,
    overlap_sketch_view,
)
from ..sources.tables import memoized_relation as _memoized


@register("streaming_source_overlap", oracle=_SKETCH_ORACLE)
def streaming_source_overlap(spark, sf_dir):
    """Source-overlap sketch with its signature state maintained
    incrementally: each micro-batch (maxFilesPerTrigger=1 over a 6-file
    replay of documents, >=2 batches asserted) reduces to at most
    n_sources x 32 partial minima written to a batch_id-keyed store
    (overwrite => retry-idempotent); the partials fold by element-wise
    MIN into signatures BIT-IDENTICAL to the batch path's, which then
    flow through the shared emission tail.

    Why this is the right streaming shape at 100 TB: the contamination
    state a stream must carry is n_sources x 32 longs — never shingles,
    never documents. A new day's crawl updates every source's sketch by
    one map-side-combinable aggregate over just that day's occurrences
    (no distinct shuffle: min is multiset-invariant, so raw occurrence
    feeds fold exactly like distinct sets), and any two sources'
    estimated Jaccard is readable at any time from the folded state.
    The exact/error columns ride the batch-side distinct relation like
    the registered sketch query — they gate the estimator, they are not
    part of the streaming state."""
    from ..sources.tables import load_tables
    from ..streaming.materialize import session_tmpdir

    docs_stream_src = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "source", "text"
    )
    d = session_tmpdir("stream_overlap_")
    src = f"{d}/src"
    docs_stream_src.repartition(6).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    store = f"{d}/partials"

    def maintain(bdf: DataFrame, batch_id: int) -> None:
        # occurrence-fed per-batch partial: tokenize -> shingle ->
        # explode -> 32 map-side minima per source. No distinct, no
        # cross-batch state — the fold below is the only history.
        occ = bdf.select(
            "source", T.tokens("text").alias("_t")
        ).select(
            "source",
            F.explode(T.shingles_from_tokens(F.col("_t"), 3)).alias("sh"),
        )
        occ.groupBy("source").agg(*_sig_cols()).write.mode(
            "overwrite"
        ).parquet(f"{store}/batch={batch_id}")

    q = (
        stream.writeStream.foreachBatch(maintain)
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, 300)

    import glob as _glob

    n_batches = len(_glob.glob(f"{store}/batch=*"))
    if n_batches < 2:
        raise ValueError(f"expected a multi-batch replay, got {n_batches}")

    # lossless fold: element-wise min across batch partials == the
    # whole-corpus signature (min is associative/commutative/idempotent)
    sigs = (
        spark.read.parquet(store)
        .groupBy("source")
        .agg(*[F.min(f"h{i}").alias(f"h{i}") for i in range(_SIG_K)])
    )

    docs = _docs(spark, sf_dir)
    sh = _memoized(
        _OVERLAP_SH_MEMO,
        spark,
        (sf_dir, 3),
        lambda: _source_shingles(docs, 3),
    )
    return overlap_sketch_view(docs, sh, sigs=sigs)
