"""Round-8 additions: seven training-data-pipeline operators that round
out the dedup/curation surface.

* ``text_substring_dedup`` — the exact-substring dedup of Lee et al. 2022
  ("Deduplicating Training Data Makes Language Models Better"), re-expressed
  Spark-first: the paper builds a corpus-wide suffix array (inherently
  sequential, memory-bound); the distributed equivalent is fixed-width
  character tiling + a gram-frequency shuffle + gaps-and-islands span
  merging, which catches every aligned duplicate of length >= 2k-1 and is
  three shuffles at any corpus size.
* ``multimodal_phash_near_dup`` — TRUE 32x32-DCT perceptual hash over the
  binary media lake (upgraded round 11 from the original block-hash
  stand-in): deterministic synthetic rasterization to 8x8 cells, exact
  fixed-point integer DCT in one Arrow-batched pandas UDF, 63-bit
  median-threshold hash, 7x9-bit LSH bands with GUARANTEED recall at the
  hamming admit threshold (functions/phash.py). Only the image decode
  remains behind the declared codec stub (operators/multimodal.py:69).
* ``llm_mixture_plan`` — the domain-mixture arithmetic every pre-training
  run needs (natural share -> temperature-reweighted target share ->
  sampled-token budget -> epochs per domain), one aggregate + a 1-row
  broadcast.
* ``text_quality_prune_per_domain`` — per-domain quantile pruning: drop
  the bottom 20% by quality WITHIN each source so no domain is wiped out
  by a global threshold (the standard fix for quality filters biased
  against low-resource domains).
* ``sample_curriculum_order`` — a contiguous staged training order
  0..N-1 (short-to-long length curriculum, hash-shuffled within stages)
  with NO global sort: bucket x shard rank windows stitched by
  metadata-scale cumulative offsets.
* ``llm_tokenizer_fertility`` — per-language fertility (BPE units per
  whitespace token) under the corpus-trained merge table, riding the
  memoized encode of ``round6_extras.bpe_doc_units``.
* ``streaming_substring_dedup_ingest`` — the tile-granularity streaming
  ingest gate (streaming/substring_stream.py): cross-batch substring
  dedup against a persistent tile store, the third stateful dedup twin.

Reference parity note: the reference repo (yhyyz/flink-cdc-msk) has no
data-curation surface — these extend the Part-B capability closure the
same way rounds 4-7 did (SURVEY.md §2 Part B, LLM-pipeline rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as T
from ..functions.phash import (
    PHASH_BAND_BITS,
    PHASH_BANDS,
    PHASH_HAM_MAX,
    phash63,
    phash63_sql,
    synthetic_cells,
    synthetic_cells_sql,
)
from ..operators.sampling import hash_bucket, hash_bucket_sql
from .llm_pipeline import (
    DOCS_WITH_DUPS_SQL,
    DOCS_WITH_NEAR_DUPS_SQL,
    _docs,
    _docs_with_dups,
    _docs_with_near_dups,
)
from .registry import register
from .round6_extras import _BPE_MERGES, bpe_doc_units, bpe_units_cte

TILE = 32  # substring-dedup granularity (chars): catches dups >= 2*TILE-1



@register(
    "text_substring_dedup",
    oracle=f"""
    WITH corpus AS (
      {DOCS_WITH_NEAR_DUPS_SQL}
    ), t AS (
      SELECT doc_id, text, length(text) AS n_chars FROM corpus
    ), tiles AS (
      SELECT doc_id, n_chars, CAST(s.i AS BIGINT) AS tile_no,
             substr(text, CAST(s.i * {TILE} + 1 AS BIGINT), {TILE}) AS tile
      FROM t, unnest(generate_series(0,
               CAST(floor((n_chars - 1) / {TILE}.0) AS BIGINT))) AS s(i)
    ), flagged AS (
      SELECT doc_id, n_chars, tile_no, length(tile) AS tile_chars,
             min(doc_id) OVER (PARTITION BY tile) AS d_lo,
             max(doc_id) OVER (PARTITION BY tile) AS d_hi
      FROM tiles
    ), marked AS (
      SELECT doc_id, n_chars, tile_no, tile_chars
      FROM flagged WHERE d_lo < d_hi
    ), islands AS (
      SELECT doc_id, n_chars, tile_no, tile_chars,
             tile_no - row_number() OVER (
               PARTITION BY doc_id ORDER BY tile_no) AS grp
      FROM marked
    ), spans AS (
      SELECT doc_id, max(n_chars) AS n_chars,
             CAST(count(*) AS BIGINT) AS span_tiles,
             CAST(sum(tile_chars) AS BIGINT) AS span_chars
      FROM islands GROUP BY doc_id, grp
    )
    SELECT doc_id,
           CAST(sum(span_tiles) AS BIGINT) AS n_dup_tiles,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(span_chars) AS BIGINT) AS dup_chars,
           round(sum(span_chars) * 1.0 / max(n_chars), 6) AS dup_frac
    FROM spans GROUP BY doc_id
    """,
)
def text_substring_dedup(spark, sf_dir):
    """Exact-substring dedup (Lee et al. 2022) as aligned {TILE}-char
    tiling: a tile that appears in >= 2 distinct documents marks
    duplicated text; adjacent duplicated tiles merge into maximal spans
    (gaps-and-islands), and each doc reports its duplicated-character
    footprint. Catches every aligned repeat >= 2*TILE-1 chars — the
    distributed stand-in for the paper's suffix array.

    Scale shape: one map-side explode (tile rows ~= corpus chars / TILE,
    nothing quadratic), then exactly TWO shuffles: a window over the tile
    marks cross-doc tiles in place (min/max doc_id over an unordered
    frame — this replaces a countDistinct aggregate + corpus-scale join,
    which would cost two tile shuffles AND a second scan of the corpus),
    and one shuffle on doc_id for the island window. No step holds more
    than one tile's postings or one doc's tiles in a task."""
    corpus = _docs_with_near_dups(spark, sf_dir)
    # length > 0 guard: for an empty doc the tile upper bound is -1 and
    # Spark's sequence(0, -1) DESCENDS ([0, -1] — two phantom empty
    # tiles), while the oracle's generate_series(0, -1) is zero rows;
    # the filter keeps both sides at zero rows for empty docs
    t = corpus.select(
        "doc_id", "text", F.length("text").alias("n_chars")
    ).filter(F.col("n_chars") > 0)
    tiles = t.select(
        "doc_id",
        "n_chars",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.floor((F.col("n_chars") - 1) / TILE).cast("bigint"),
            )
        ).alias("tile_no"),
        "text",
    ).select(
        "doc_id",
        "n_chars",
        "tile_no",
        F.substring(
            "text", (F.col("tile_no") * TILE + 1).cast("int"), TILE
        ).alias("tile"),
    )
    w_tile = Window.partitionBy("tile")
    marked = (
        tiles.withColumn("d_lo", F.min("doc_id").over(w_tile))
        .withColumn("d_hi", F.max("doc_id").over(w_tile))
        .filter(F.col("d_lo") < F.col("d_hi"))
        .select(
            "doc_id",
            "n_chars",
            "tile_no",
            F.length("tile").alias("tile_chars"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("tile_no")
    islands = marked.withColumn(
        "grp", F.col("tile_no") - F.row_number().over(w)
    )
    spans = islands.groupBy("doc_id", "grp").agg(
        F.max("n_chars").alias("n_chars"),
        F.count(F.lit(1)).alias("span_tiles"),
        F.sum("tile_chars").alias("span_chars"),
    )
    return spans.groupBy("doc_id").agg(
        F.sum("span_tiles").alias("n_dup_tiles"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_chars").alias("dup_chars"),
        F.round(F.sum("span_chars") / F.max("n_chars"), 6).alias(
            "dup_frac"
        ),
    )


PHASH_ORACLE = f"""
    WITH corpus AS (
      {DOCS_WITH_DUPS_SQL}
    ), payloads AS (
      SELECT doc_id AS media_id, text AS payload FROM corpus
    ), cells AS (
      {synthetic_cells_sql("payload")}
    ), {phash63_sql()}, bands AS (
      SELECT media_id, h, CAST(b.i AS INTEGER) AS band,
             (h >> ({PHASH_BAND_BITS} * b.i)) & {(1 << PHASH_BAND_BITS) - 1}
               AS band_v
      FROM ph, unnest(generate_series(0, {PHASH_BANDS - 1})) AS b(i)
    ), pairs AS (
      SELECT a.media_id AS media_id_1, b.media_id AS media_id_2,
             a.h AS h1, b.h AS h2, a.band AS band
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_v = b.band_v
       AND a.media_id < b.media_id
    )
    SELECT media_id_1, media_id_2,
           CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
    FROM pairs
    WHERE bit_count(xor(h1, h2)) <= {PHASH_HAM_MAX}
      AND NOT EXISTS (
        SELECT 1 FROM unnest(generate_series(0, {PHASH_BANDS - 2})) AS lo(i)
        WHERE lo.i < band
          AND ((h1 >> ({PHASH_BAND_BITS} * lo.i))
               & {(1 << PHASH_BAND_BITS) - 1})
            = ((h2 >> ({PHASH_BAND_BITS} * lo.i))
               & {(1 << PHASH_BAND_BITS) - 1})
      )
    """


_PHASH_BANDS_MEMO: dict[tuple, object] = {}


def phash_band_pairs(spark, ph, memo_extra: tuple):
    """Shared banding + exactly-once emission tail of the pHash near-dup
    queries (synthetic-decode and real-PPM-decode twins): explode each
    63-bit hash into 7 x 9-bit (band, band_v) rows, self-join on band
    equality, keep a pair only at its LOWEST matching band (zero extra
    shuffle — band values re-derived in-row from the hashes), admit at
    hamming <= PHASH_HAM_MAX. The banded relation is persisted through
    the session memo (ADVICE r11: a bare .persist() here leaked one
    cache entry per invocation under bench warm rounds) — bound is
    PHASH_BANDS rows x three longs per asset."""
    from ..sources.tables import memoized_relation as _memo

    mask = (1 << PHASH_BAND_BITS) - 1
    bands = _memo(
        _PHASH_BANDS_MEMO,
        spark,
        memo_extra,
        lambda: ph.select(
            "media_id",
            "h",
            F.explode(
                F.array(*[F.lit(b) for b in range(PHASH_BANDS)])
            ).alias("band"),
        ).withColumn(
            # shiftright's Python signature wants a literal count; the
            # SQL form takes a column expression
            "band_v",
            F.expr(f"shiftright(h, {PHASH_BAND_BITS} * band) & {mask}"),
        ),
    )
    # persist (via the memo): the self-join references `bands` twice —
    # without the cache each side re-rasterizes and re-DCTs the whole
    # lake (the census read ArrowEvalPython=4: two UDF evaluations per
    # side). merge-pinned: the band relation is corpus-scale
    # (PHASH_BANDS rows per asset) — Catalyst broadcasts it at test
    # scale, the §21 trap
    a = bands.alias("a").hint("merge")
    b = bands.alias("b").hint("merge")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_v") == F.col("b.band_v"))
        & (F.col("a.media_id") < F.col("b.media_id")),
    ).select(
        F.col("a.media_id").alias("media_id_1"),
        F.col("b.media_id").alias("media_id_2"),
        F.col("a.h").alias("h1"),
        F.col("b.h").alias("h2"),
        F.col("a.band").alias("band"),
    )
    # lowest-matching-band dedup: keep the pair only where no EARLIER
    # band also collided — exactly-once emission with zero extra shuffle
    lowest = F.lit(True)
    for lo in range(PHASH_BANDS - 1):
        collides = F.expr(
            f"(shiftright(h1, {PHASH_BAND_BITS * lo}) & {mask}) = "
            f"(shiftright(h2, {PHASH_BAND_BITS * lo}) & {mask})"
        )
        lowest = lowest & (~((F.col("band") > lo) & collides))
    ham = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (
        pairs.filter(lowest)
        .select(
            "media_id_1",
            "media_id_2",
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
    )


@register("multimodal_phash_near_dup", oracle=PHASH_ORACLE)
def multimodal_phash_near_dup(spark, sf_dir):
    """TRUE 32x32-DCT perceptual-hash near-dup over the media lake
    (round 11 — replaces the r8 proportional-block stand-in): per
    asset, the deterministic synthetic decode rasterizes the payload
    to an 8x8 grid of 4x4-constant cells (functions/phash.py — the
    real codec stays the declared stub, operators/multimodal.py:69),
    a fixed-point integer 2-D DCT keeps the 8x8 low-frequency block,
    and the 63 AC coefficients median-threshold into a 63-bit hash.
    The DCT runs in ONE Arrow-batched pandas UDF (two 8x8 integer
    matmuls over the whole batch — the rolling_hash.py pattern); the
    64 cell lumas are computed JVM-side, so the only Python boundary
    ships 64 longs per asset. Exact-integer arithmetic end-to-end
    makes the hash bit-identical to the DuckDB oracle's re-derivation
    (same literal basis matrix, same order statistics).

    Banding: 7 x 9-bit bands over the 63-bit hash — by pigeonhole a
    pair at hamming <= 6 of 63 ALWAYS shares a clean band, so
    candidate recall at the admit threshold is guaranteed, not
    probabilistic. Scale shape unchanged from r8 (PERF §22): one
    shuffle on (band, band_v), lowest-matching-band dedup instead of
    a pair-distinct re-shuffle, no all-pairs stage anywhere."""
    corpus = _docs_with_dups(spark, sf_dir)
    ph = corpus.select(
        F.col("doc_id").alias("media_id"),
        phash63(F.array(*synthetic_cells(F.col("text")))).alias("h"),
    )
    return phash_band_pairs(spark, ph, (sf_dir, "synthetic"))


@register(
    "llm_mixture_plan",
    oracle="""
    WITH d AS (
      SELECT source, lang,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS ntok
      FROM documents
    ), dom AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(ntok) AS BIGINT) AS n_tokens
      FROM d GROUP BY source, lang
    ), tot AS (
      SELECT sum(n_tokens) AS total, sum(pow(n_tokens, 0.7)) AS ptot
      FROM dom
    )
    SELECT source, lang, n_docs, n_tokens,
           round(n_tokens * 1.0 / total, 6) AS nat_share,
           round(pow(n_tokens, 0.7) / ptot, 6) AS target_share,
           round(pow(n_tokens, 0.7) / ptot * total * 0.5, 4)
             AS sample_tokens,
           round(pow(n_tokens, 0.7) / ptot * total * 0.5 / n_tokens, 6)
             AS epochs
    FROM dom, tot
    """,
)
def llm_mixture_plan(spark, sf_dir):
    """Domain-mixture planning for a pre-training run: per-(source, lang)
    token counts -> natural share -> temperature-reweighted target share
    (tau=0.7, the multilingual-sampling standard: p_i^tau renormalized,
    upweights low-resource domains) -> sampled-token allocation for a
    budget of half the corpus -> epochs each domain is repeated.

    Scale shape: one hash aggregate over the corpus (token counting is
    map-side partial), then a 1-ROW totals relation broadcast to the
    domain table — the only join is against a single row. sample_tokens
    stays a rounded double (no floor) so an ulp of pow/sum noise can't
    flip an integer boundary between engines."""
    d = _docs(spark, sf_dir)
    dom = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count("text")).alias("n_tokens"),
    )
    tot = dom.agg(
        F.sum("n_tokens").alias("total"),
        F.sum(F.pow("n_tokens", F.lit(0.7))).alias("ptot"),
    )
    p = F.pow("n_tokens", F.lit(0.7))
    return dom.join(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("total"), 6).alias("nat_share"),
        F.round(p / F.col("ptot"), 6).alias("target_share"),
        F.round(p / F.col("ptot") * F.col("total") * 0.5, 4).alias(
            "sample_tokens"
        ),
        F.round(
            p / F.col("ptot") * F.col("total") * 0.5 / F.col("n_tokens"), 6
        ).alias("epochs"),
    )


@register(
    "text_quality_prune_per_domain",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id, source,
             len(list_distinct(toks)) * 1.0 / len(toks)
               * ln(1 + len(toks)) AS score
      FROM t
    ), ranked AS (
      SELECT doc_id, source, score,
             percent_rank() OVER (
               PARTITION BY source ORDER BY score, doc_id) AS pr
      FROM scored
    )
    SELECT doc_id, source, round(score, 6) AS score,
           round(pr, 6) AS qtile
    FROM ranked WHERE pr >= 0.2
    """,
)
def text_quality_prune_per_domain(spark, sf_dir):
    """Per-domain quantile pruning: score every doc (lexical diversity x
    log-length — higher = richer text), rank WITHIN each source, and drop
    the bottom 20% of each domain. A global threshold would wipe out
    whole low-resource domains; per-domain quantiles prune the same
    fraction everywhere — the standard curation fix.

    Scale shape: scoring is a codegen'd array expression (map-side); the
    rank is one shuffle on source + a per-partition sort. Ranking orders
    by the RAW double (bit-identical in both engines — the score is
    exact-integer ratios through IEEE ops) and tiebreaks on doc_id, so
    percent_rank is reproducible; rounding happens only on output."""
    d = _docs(spark, sf_dir)
    toks = T.tokens("text")
    t = d.select("doc_id", "source", toks.alias("toks"))
    score = (
        F.size(F.array_distinct("toks"))
        / F.size("toks")
        * F.log(F.lit(1) + F.size("toks"))
    )
    scored = t.select("doc_id", "source", score.alias("score"))
    w = Window.partitionBy("source").orderBy("score", "doc_id")
    ranked = scored.withColumn("pr", F.percent_rank().over(w))
    return ranked.filter(F.col("pr") >= 0.2).select(
        "doc_id",
        "source",
        F.round("score", 6).alias("score"),
        F.round("pr", 6).alias("qtile"),
    )


_CURR_SHARDS = 16  # rank-window parallelism knob: buckets x shards tasks


@register(
    "sample_curriculum_order",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS ntok
      FROM documents
    ), b AS (
      SELECT doc_id,
             CAST(least(9, CAST(floor(ntok / 16.0) AS BIGINT)) AS INTEGER)
               AS bucket,
             {hash_bucket_sql('doc_id', 16)} AS shard,
             {hash_bucket_sql('doc_id', 1048576)} AS ord_h
      FROM t
    ), c AS (
      SELECT bucket, shard, count(*) AS cnt FROM b GROUP BY bucket, shard
    ), o AS (
      SELECT bucket, shard,
             CAST(coalesce(sum(cnt) OVER (ORDER BY bucket, shard
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS off
      FROM c
    ), r AS (
      SELECT b.doc_id, b.bucket, o.off,
             row_number() OVER (PARTITION BY b.bucket, b.shard
                                ORDER BY b.ord_h, b.doc_id) AS rk
      FROM b JOIN o USING (bucket, shard)
    )
    SELECT doc_id, bucket, CAST(off + rk - 1 AS BIGINT) AS global_pos
    FROM r
    """,
)
def sample_curriculum_order(spark, sf_dir):
    """Deterministic curriculum ordering WITHOUT a global sort: assign a
    contiguous training position 0..N-1 to every document, staged
    easy-to-hard (short-to-long token bands — the classic length
    curriculum), shuffled within each stage by a portable Knuth hash.

    The scale trick is the shard-offset pattern (`text_pack_sequences`'
    shape applied to ordering): ranking happens in bucket x shard
    window partitions (parallel, each holds ~N/160 rows), and the
    partitions are stitched into one global order by adding per-(bucket,
    shard) cumulative offsets computed with a window over the COUNTS
    relation — metadata-scale (<=160 rows), the layout_compaction_plan
    precedent. Total: one aggregate shuffle + one rank shuffle over the
    corpus; a naive orderBy would funnel all N rows through one task.
    Buckets are INTEGER token bands (not score quantiles) so bucket
    assignment is exact arithmetic in both engines — no
    percentile-interpolation ulp at the boundaries."""
    d = _docs(spark, sf_dir)
    t = d.select("doc_id", T.token_count("text").alias("ntok"))
    b = t.select(
        "doc_id",
        F.least(
            F.lit(9).cast("bigint"), F.floor(F.col("ntok") / 16)
        ).cast("int").alias("bucket"),
        hash_bucket("doc_id", _CURR_SHARDS).alias("shard"),
        hash_bucket("doc_id", 1_048_576).alias("ord_h"),
    )
    counts = b.groupBy("bucket", "shard").agg(F.count(F.lit(1)).alias("cnt"))
    w_meta = (
        Window.orderBy("bucket", "shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "bucket",
        "shard",
        F.coalesce(F.sum("cnt").over(w_meta), F.lit(0))
        .cast("bigint")
        .alias("off"),
    )
    w_rank = Window.partitionBy("bucket", "shard").orderBy("ord_h", "doc_id")
    return (
        b.join(F.broadcast(offsets), ["bucket", "shard"])
        .select(
            "doc_id",
            "bucket",
            (F.col("off") + F.row_number().over(w_rank) - 1)
            .cast("bigint")
            .alias("global_pos"),
        )
    )


@register(
    "llm_tokenizer_fertility",
    oracle=f"""
    WITH {bpe_units_cte(_BPE_MERGES)}
    SELECT d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(list_filter(string_split(d.text, ' '),
                                    x -> x <> ''))) AS BIGINT) AS ws_tokens,
           CAST(sum(u.n_bpe_units) AS BIGINT) AS bpe_units,
           round(sum(u.n_bpe_units) * 1.0 /
                 sum(len(list_filter(string_split(d.text, ' '),
                                     x -> x <> ''))), 6) AS fertility,
           round(sum(u.n_chars) * 1.0 / sum(u.n_bpe_units), 6)
             AS chars_per_unit
    FROM doc_units u JOIN documents d USING (doc_id)
    GROUP BY d.lang
    """,
)
def llm_tokenizer_fertility(spark, sf_dir):
    """Per-language tokenizer-fertility report under the LEARNED BPE
    merge table: BPE units per whitespace token and characters per unit,
    by language — the standard multilingual-tokenizer health check (a
    vocabulary trained on one language's corpus fragments the others;
    fertility per lang is how that shows up). Rides the memoized per-doc
    encode (`bpe_doc_units`), so the only new work is one doc_id join to
    recover `lang` plus one aggregate; the oracle replays the full
    training via the shared CTE, re-certifying the merge table through a
    third consumer."""
    du = bpe_doc_units(spark, sf_dir)
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang", T.token_count("text").alias("ws")
    )
    return (
        du.join(d, "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").cast("bigint").alias("ws_tokens"),
            F.sum("n_bpe_units").cast("bigint").alias("bpe_units"),
            F.round(F.sum("n_bpe_units") / F.sum("ws"), 6).alias(
                "fertility"
            ),
            F.round(F.sum("n_chars") / F.sum("n_bpe_units"), 6).alias(
                "chars_per_unit"
            ),
        )
    )


# ------------------------------- streaming substring-dedup ingest gate

_SS_SLABS = 4
_SS_TAU = 0.5


def _substring_ingest_oracle() -> str:
    """Unrolled replay of StreamingSubstringDedupFilter's admission
    semantics (the `streaming_neardup_ingest` oracle pattern at tile
    granularity): per slab, reject docs with >= tau of their tile
    INSTANCES present in the admitted tile multiset (greedy across
    slabs), then within the slab reject docs with >= tau of their tiles
    among LOWER-id slab survivors' tiles (the filter's one-step closed
    form)."""
    rounds = ["a0 AS (SELECT CAST(NULL AS BIGINT) AS id WHERE false)"]
    for k in range(1, _SS_SLABS + 1):
        rounds.append(f"""
    sm{k} AS MATERIALIZED (
      SELECT t.id, CAST(count(*) AS BIGINT) AS m
      FROM tiles t JOIN slabs s ON s.id = t.id AND s.slab = {k}
      WHERE EXISTS (SELECT 1 FROM tiles st JOIN a{k - 1} a ON st.id = a.id
                    WHERE st.tile = t.tile)
      GROUP BY t.id
    ),
    surv{k} AS MATERIALIZED (
      SELECT s.id FROM slabs s
      JOIN tc ON tc.id = s.id
      LEFT JOIN sm{k} f ON f.id = s.id
      WHERE s.slab = {k}
        AND round(coalesce(f.m, 0) * 1.0 / tc.nt, 6) < {_SS_TAU}
    ),
    im{k} AS (
      SELECT t.id, CAST(count(*) AS BIGINT) AS m
      FROM tiles t JOIN surv{k} sv ON sv.id = t.id
      WHERE EXISTS (SELECT 1 FROM tiles lt JOIN surv{k} lo ON lo.id = lt.id
                    WHERE lt.tile = t.tile AND lo.id < t.id)
      GROUP BY t.id
    ),
    adm{k} AS (
      SELECT sv.id FROM surv{k} sv
      JOIN tc ON tc.id = sv.id
      LEFT JOIN im{k} f ON f.id = sv.id
      WHERE round(coalesce(f.m, 0) * 1.0 / tc.nt, 6) < {_SS_TAU}
    ),
    a{k} AS MATERIALIZED (
      SELECT id FROM a{k - 1} UNION ALL SELECT id FROM adm{k})""")
    return f"""
    WITH corpus AS (
      {DOCS_WITH_NEAR_DUPS_SQL}
    ), docs AS (
      SELECT doc_id AS id, text FROM corpus
    ), tiles AS (
      SELECT id, CAST(s.i AS BIGINT) AS tile_no,
             substr(text, CAST(s.i * {TILE} + 1 AS BIGINT), {TILE}) AS tile
      FROM docs, unnest(generate_series(0,
               CAST(floor((length(text) - 1) / {TILE}.0) AS BIGINT))) AS s(i)
    ), tc AS (
      SELECT id, CAST(count(*) AS BIGINT) AS nt FROM tiles GROUP BY id
    ), slabs AS (
      SELECT id, ntile({_SS_SLABS}) OVER (ORDER BY id) AS slab FROM docs
    ),
    {','.join(rounds)}
    SELECT id AS doc_id FROM a{_SS_SLABS}
    """


@register(
    "streaming_substring_dedup_ingest", oracle=_substring_ingest_oracle()
)
def streaming_substring_dedup_ingest(spark, sf_dir):
    """The SUBSTRING-granularity streaming ingest gate run end-to-end —
    the third cross-batch dedup twin (MinHash text twin, vector twin,
    now tile twin): every micro-batch tiles its docs, semi-joins the
    tile instances against the PERSISTENT tile store of everything
    admitted (unbounded lookback), rejects docs whose duplicated-tile
    fraction reaches tau=0.5, applies the greedy one-step rule within
    the batch, and appends the survivors' tiles.  This drops
    boilerplate-assembled arrivals whose text is stitched from MANY
    admitted docs' fragments — invisible to whole-doc near-dup filters
    because no single admitted doc is close.  The corpus replays as 4
    doc_id-ordered slabs (forced mtimes => deterministic batch order,
    >= 2 batches asserted in-query); the oracle replays the exact
    admission semantics as 4 unrolled SQL rounds, so a green row
    certifies the tile matching AND the cross-batch state machinery
    with no convergence assumption."""
    import glob as _glob
    import os

    from ..streaming.dedup_stream import start_near_dup_stream
    from ..streaming.materialize import session_tmpdir
    from ..streaming.substring_stream import StreamingSubstringDedupFilter

    docs = _docs_with_near_dups(spark, sf_dir).select("doc_id", "text")
    d = session_tmpdir("substr_ingest_")
    src = f"{d}/src"
    # r12: materialize once before the four slab writes (each write
    # otherwise re-runs the dup-synthesis scan + global ntile window
    # and discards 3/4 of it — the pHash twin's fixture pattern).
    # bound: one copy of the fixture docs (|corpus| rows), fixture
    # setup only.
    slabbed = docs.withColumn(
        "slab", F.ntile(_SS_SLABS).over(Window.orderBy("doc_id"))
    ).localCheckpoint(eager=True)
    for s in range(1, _SS_SLABS + 1):
        (
            slabbed.filter(F.col("slab") == s)
            .drop("slab")
            .coalesce(1)
            .write.mode("overwrite")
            .json(f"{src}/s{s:02d}")
        )
    base = os.stat(src).st_mtime
    for s in range(1, _SS_SLABS + 1):
        for f in _glob.glob(f"{src}/s{s:02d}/part-*.json"):
            os.utime(f, (base + s, base + s))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(f"{src}/s*")
    )
    filt = StreamingSubstringDedupFilter(
        f"{d}/store", f"{d}/out", tau=_SS_TAU
    )
    q = start_near_dup_stream(stream, filt, f"{d}/ckpt", available_now=True)
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "substring-dedup ingest stream did not drain in 300s — a "
            "partial admitted set would silently corrupt the oracle replay"
        )
    n_batches = len(_glob.glob(f"{d}/store/batch_id=*"))
    if n_batches != _SS_SLABS:
        raise ValueError(
            f"expected {_SS_SLABS} incremental batches, got {n_batches}"
        )
    return spark.read.parquet(f"{d}/out").select("doc_id")
