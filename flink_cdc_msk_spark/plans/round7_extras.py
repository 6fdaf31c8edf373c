"""Round-7 additions: the learned-BPE merge table wired into its
consumers.

Round 6 shipped real corpus-trained BPE (``text_bpe_encode``), but the
packing and dataset-card stages still counted regex PRE-tokens — so
packed-sequence lengths and the card's token stats misstated what a
trainer tokenizing with the learned vocabulary would actually see
(round-6 verdict item 4).  Both consumers now ride the same memoized
per-doc encode (``round6_extras.bpe_doc_units``) and the same unrolled
merge-table oracle CTE (``round6_extras.bpe_units_cte``), so their green
rows re-certify the training replay end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.sampling import hash_bucket, hash_bucket_sql
from .llm_pipeline import N_PACK_SHARDS
from .registry import register
from .round6_extras import _BPE_MERGES, bpe_doc_units, bpe_units_cte


@register(
    "text_pack_sequences_bpe",
    oracle=f"""
    WITH {bpe_units_cte(_BPE_MERGES)},
    t AS (
      SELECT doc_id,
             {hash_bucket_sql('doc_id', N_PACK_SHARDS)} AS shard,
             n_bpe_units
      FROM doc_units
    ), c AS (
      SELECT doc_id, shard, n_bpe_units,
             CAST(coalesce(sum(n_bpe_units) OVER (PARTITION BY shard
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_before
      FROM t
    )
    SELECT doc_id, shard, n_bpe_units,
           CAST(cum_before // 2048 AS BIGINT) AS seq_id,
           CAST(cum_before % 2048 AS BIGINT) AS seq_offset
    FROM c
    """,
)
def text_pack_sequences_bpe(spark, sf_dir):
    """Sequence packing on LEARNED BPE units — `text_pack_sequences`'
    shape (per-shard cumulative fill of 2048-budget bins, exact BIGINT
    arithmetic, same Knuth hash shards) but budgeted in the units the
    trained merge table actually produces, which is what a loader
    feeding a tokenizer consumes.  The oracle replays the full BPE
    training (shared CTE) before packing, so a green row certifies
    merge table → per-doc lengths → bin assignment in one chain.

    Scale: the encode is a vocabulary join memoized per (app, corpus)
    (training scales with |vocab|, not corpus); the packing is one hash
    shuffle + per-shard window sorts, never a global sort —
    ``N_PACK_SHARDS`` is the knob that keeps one shard's stream inside
    an executor's sort budget.  Docs with no BPE token (empty text)
    have no encoded length and are absent on both sides, exactly as in
    `text_bpe_encode`."""
    du = bpe_doc_units(spark, sf_dir)
    base = du.select(
        "doc_id",
        hash_bucket("doc_id", N_PACK_SHARDS).alias("shard"),
        "n_bpe_units",
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = base.withColumn(
        "cum_before",
        F.coalesce(F.sum("n_bpe_units").over(w), F.lit(0)).cast("bigint"),
    )
    return c.select(
        "doc_id",
        "shard",
        "n_bpe_units",
        F.expr("cum_before DIV 2048").cast("bigint").alias("seq_id"),
        F.pmod(F.col("cum_before"), F.lit(2048)).cast("bigint").alias(
            "seq_offset"
        ),
    )


@register(
    "llm_dataset_card_bpe",
    oracle=f"""
    WITH {bpe_units_cte(_BPE_MERGES)}
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bpe_units) AS BIGINT) AS total_bpe_units,
           round(avg(n_bpe_units), 2) AS mean_bpe_units,
           round(median(n_bpe_units), 1) AS median_bpe_units,
           round(sum(n_bpe_units) / sum(n_chars), 4) AS compression
    FROM doc_units
    """,
)
def llm_dataset_card_bpe(spark, sf_dir):
    """The dataset card's TOKEN-BUDGET row under the learned BPE merge
    table: document count, total/mean/median encoded lengths and the
    corpus compression ratio — the numbers a training-run budget and a
    sampling-temperature computation actually need (whitespace counts,
    which `llm_dataset_card` reports, overstate fertility).  One
    aggregate over the memoized per-doc encode; every float is rounded
    so the single-row card is hash-stable.  Oracle replays the full
    training via the shared CTE."""
    du = bpe_doc_units(spark, sf_dir)
    return du.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe_units").cast("bigint").alias("total_bpe_units"),
        F.round(F.avg("n_bpe_units"), 2).alias("mean_bpe_units"),
        F.round(F.median("n_bpe_units"), 1).alias("median_bpe_units"),
        F.round(
            F.sum("n_bpe_units") / F.sum("n_chars"), 4
        ).alias("compression"),
    )
