"""Round-10 second-session additions: ranked retrieval (BM25) and
importance-resampling data selection (DSIR).

Two staples of a public training-data curation stack that the registry
did not yet cover:

* ``text_bm25_rank`` — Okapi BM25 ranked retrieval over the corpus for
  a fixed query-term set (Robertson & Zaragoza 2009; the Lucene
  ``k1/b`` form with the +1-inside-the-log idf). The curation use is
  targeted corpus probing: "show me the strongest documents for these
  terms" over billions of docs without an external index.
* ``llm_dsir_select`` — Data Selection via Importance Resampling
  (Xie et al. 2023): fit hashed-n-gram bag models over a small TARGET
  slice and the RAW pool, weight every raw document by its summed
  log-likelihood ratio, and Gumbel-top-k resample — the standard
  "make web crawl look like the target domain" selection stage.

Both are expressed as pure DataFrame plans with full DuckDB oracles
(same tokenizer, same md5 feature hash, same deterministic Gumbel
noise), so they get the row/schema/value-hash gate, not a rows-only
check.

Reference parity note: the reference repo (yhyyz/flink-cdc-msk) has no
data-curation surface — Part-B capability closure (SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..streaming.materialize import await_or_raise as _await_or_raise
from ..operators.dedup import md5_slice32, md5_slice32_sql
from .llm_pipeline import _docs
from .registry import register

_TOKENS_SQL = "list_filter(string_split(lower(text), ' '), x -> x <> '')"


# session-keyed materialization memo — see sources/tables.py for the
# storage rationale (columnar persist, not localCheckpoint: PERF §39)
from ..sources.tables import memoized_relation as _memoized  # noqa: E402


# ---------------------------------------------------------------------------
# BM25 ranked retrieval
# ---------------------------------------------------------------------------

BM25_TERMS = ("join", "filter", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 50


def _tf(tok_col: Column | str, term: str) -> Column:
    """Term frequency as a map-side array expression (no explode),
    in the ALL-BUILTIN form ``size(a) - size(array_remove(a, term))``:
    higher-order lambdas (``filter(a, x -> x = term)``) are interpreted
    per element, not codegen'd — A/B at sfx1 (500k docs, 3 terms):
    filter-lambda 3.2 s warm / 7.3 s cold vs array_remove 3.0 / 3.5 s
    (PERF §38). Identical results (parity-asserted)."""
    c = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    return F.size(c) - F.size(F.array_remove(c, term))


def _bm25_base(docs: DataFrame, terms: tuple[str, ...]) -> DataFrame:
    """Per-doc (dl, tf_0..tf_k) — the tokenize-and-reduce projection
    both BM25 passes consume. Emits only small numeric columns (plus
    the id/source carry), so materializing it is cheap relative to
    re-tokenizing the corpus."""
    return docs.select(
        "doc_id",
        "source",
        T.tokens("text").alias("_t"),
    ).select(
        "doc_id",
        "source",
        F.size("_t").alias("dl"),
        *[_tf("_t", t).alias(f"tf_{i}") for i, t in enumerate(terms)],
    )


def bm25_rank(
    docs: DataFrame,
    terms: tuple[str, ...] = BM25_TERMS,
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
    base: DataFrame | None = None,
    stats: DataFrame | None = None,
) -> DataFrame:
    """Okapi BM25 top-k over ``docs(doc_id, source, text)``.

    Scale shape (the reason this needs no inverted index at 100 TB):

    * per-doc term frequencies are MAP-SIDE array expressions
      (``size(filter(tokens, = term))``) — the corpus-scale relation is
      never exploded and never shuffled;
    * the only global state is ONE row (N, avgdl, per-term df) from a
      map-side-combinable aggregate, broadcast back via crossJoin;
    * the final top-k is ``orderBy().limit()`` → TakeOrdered — a
      per-partition heap + driver merge of topk rows, no global sort.

    Two passes over the per-doc reduction (stats, then scores). Pass
    ``base`` (a materialized :func:`_bm25_base`) to tokenize the corpus
    ONCE — the registered query does, via a session-keyed memoized
    columnar persist (sfx1 warm: 2.3 s → 1.25 s, PERF §38; evictable
    MEMORY_AND_DISK after the §39 heap-OOM fix); without it
    each pass re-derives the reduction from the scan. Ranking uses the
    6-dp-rounded score (ties broken by doc_id) so the cutoff set is
    engine-stable; the emitted score is rounded to 4 dp per the
    registry convention.

    Pass ``stats`` (any 1-row (n_docs, avgdl, df_i...) relation, e.g.
    merged streaming partials) to skip the stats pass — the streaming
    twin does; both passes then share THIS function's scoring tail, so
    the batch and streaming formulations cannot drift.
    """
    if base is None:
        base = _bm25_base(docs, terms)
    else:
        want = ["doc_id", "source", "dl"] + [
            f"tf_{i}" for i in range(len(terms))
        ]
        if list(base.columns) != want:
            raise ValueError(
                f"base columns {base.columns} do not match terms "
                f"{terms} (expected {want}) — a base built for a "
                "different term set would score silently wrong"
            )
    if stats is None:
        stats = base.agg(
            F.count("*").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
            *[
                F.sum((F.col(f"tf_{i}") > 0).cast("int")).alias(f"df_{i}")
                for i in range(len(terms))
            ],
        )
    scored = base.crossJoin(F.broadcast(stats))
    norm = F.lit(k1) * (
        F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    score: Column = F.lit(0.0)
    any_tf: Column = F.lit(0)
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / (tf + norm)
        any_tf = any_tf + tf
    ranked = (
        scored.filter(any_tf > 0)
        .select(
            "doc_id",
            "source",
            "dl",
            score.alias("_score"),
        )
        .orderBy(F.round("_score", 6).desc(), "doc_id")
        .limit(topk)
    )
    return ranked.select(
        "doc_id", "source", "dl", F.round("_score", 4).alias("bm25")
    )


def _bm25_oracle(
    terms: tuple[str, ...] = BM25_TERMS,
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = BM25_TOPK,
) -> str:
    tf_cols = ",\n             ".join(
        f"len(list_filter(a, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    score = " + ".join(
        f"ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
        f" * tf_{i} * {k1 + 1.0}"
        f" / (tf_{i} + {k1} * ({1 - b} + {b} * dl / avgdl))"
        for i in range(len(terms))
    )
    any_tf = " + ".join(f"tf_{i}" for i in range(len(terms)))
    return f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKENS_SQL} AS a FROM documents
    ), base AS (
      SELECT doc_id, source, len(a) AS dl,
             {tf_cols}
      FROM toks
    ), stats AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl, {df_cols} FROM base
    ), scored AS (
      SELECT doc_id, source, dl, {score} AS score
      FROM base, stats
      WHERE {any_tf} > 0
    ), ranked AS (
      SELECT *, row_number() OVER (
        ORDER BY round(score, 6) DESC, doc_id) AS rn
      FROM scored
    )
    SELECT doc_id, source, dl, round(score, 4) AS bm25
    FROM ranked WHERE rn <= {topk}
    """


# session-keyed memo for the materialized per-doc reduction (the
# dedup.py _ORDERED_MEMO pattern): repeated calls in one session reuse
# ONE persisted relation instead of leaking one per call
_BM25_BASE_MEMO: dict[tuple, DataFrame] = {}


@register("text_bm25_rank", oracle=_bm25_oracle())
def text_bm25_rank(spark, sf_dir):
    """BM25 ranked retrieval for a fixed term set — see
    :func:`bm25_rank` for the scale shape (no explode, one broadcast
    stats row, TakeOrdered top-k). The per-doc reduction (6 small
    columns — at 100 TB of text it is ~0.1% of the input) is
    memo-persisted (columnar) so the corpus is tokenized once, not
    once per pass; memoized per (application, sf_dir, terms)."""
    docs = _docs(spark, sf_dir)
    base = _memoized(
        _BM25_BASE_MEMO,
        spark,
        (sf_dir, BM25_TERMS),
        lambda: _bm25_base(docs, BM25_TERMS),
    )
    return bm25_rank(docs, base=base)


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 512
DSIR_TARGET_SOURCES = ("src0", "src1", "src2")
DSIR_TOPK = 100


def _features(docs: DataFrame) -> DataFrame:
    """(doc_id, source, bucket) — one row per hashed unigram+bigram
    occurrence. Map-side explode; the bucket domain is DSIR_BUCKETS."""
    toks = T.tokens("text")
    base = docs.select("doc_id", "source", toks.alias("_t"))
    bigrams = F.transform(
        F.slice("_t", 1, F.greatest(F.size("_t") - 1, F.lit(0))),
        lambda x, i: F.concat(
            x, F.lit(" "), F.element_at("_t", i.cast("int") + 2)
        ),
    )
    feats = base.select(
        "doc_id",
        "source",
        F.explode(F.concat("_t", bigrams)).alias("feat"),
    )
    return feats.select(
        "doc_id",
        "source",
        F.pmod(md5_slice32(F.col("feat")), F.lit(DSIR_BUCKETS)).alias("bucket"),
    )


_FEATS_SQL = f"""
    toks AS (
      SELECT doc_id, source, {_TOKENS_SQL} AS a FROM documents
    ), featlists AS (
      SELECT doc_id, source,
             list_concat(
               a,
               CASE WHEN len(a) >= 2 THEN
                 list_transform(a[1:len(a) - 1],
                                (x, i) -> x || ' ' || a[i + 1])
               ELSE [] END) AS fs
      FROM toks
    ), feats AS (
      SELECT doc_id, source,
             {md5_slice32_sql('f.x')} % {DSIR_BUCKETS} AS bucket
      FROM featlists, unnest(fs) AS f(x)
    )
"""


def _feat_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, source, bucket, cnt) — the feature stream reduced to
    per-doc bucket counts. Both DSIR passes (model fit, scoring) are
    derivable from this relation, so materializing it runs the
    expensive projection (tokenize + bigram build + one md5 per
    feature occurrence) ONCE instead of once per pass."""
    return _features(docs).groupBy("doc_id", "source", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def _dsir_scored(
    counts: DataFrame,
    target_sources: tuple[str, ...],
    model: DataFrame | None = None,
) -> DataFrame:
    """Shared DSIR prefix: feature counts -> per-doc scored relation
    (doc_id, source, w, _score). Both :func:`dsir_select` (top-k
    selection) and :func:`llm_dsir_source_mixture` (per-source mixture
    view) consume THIS function, so a change to the model fit /
    log-ratio / Gumbel formulation propagates to every consumer —
    the same no-twin-drift rule the stats/model injection enforces
    for the streaming twins."""
    is_target = F.col("source").isin(*target_sources)
    if model is None:
        model = counts.groupBy("bucket").agg(
            F.sum(
                F.when(is_target, F.col("cnt")).otherwise(F.lit(0))
            ).alias("c_t"),
            F.sum(
                F.when(is_target, F.lit(0)).otherwise(F.col("cnt"))
            ).alias("c_r"),
        )
    # totals via a global window over the <=DSIR_BUCKETS-row model — a
    # separate `model.agg(...)` + crossJoin would RE-DERIVE the model
    # (one extra full corpus scan, census-caught); the window funnels
    # only the bounded-domain relation through a single partition
    everything = Window.partitionBy()
    lr = model.select(
        "bucket",
        (
            F.log(F.col("c_t") + 1)
            - F.log(F.sum("c_t").over(everything) + F.lit(DSIR_BUCKETS))
            - F.log(F.col("c_r") + 1)
            + F.log(F.sum("c_r").over(everything) + F.lit(DSIR_BUCKETS))
        ).alias("lr"),
    )
    weights = (
        counts.filter(~is_target)
        .join(F.broadcast(lr), "bucket")
        .groupBy("doc_id", "source")
        .agg(F.sum(F.col("cnt") * F.col("lr")).alias("w"))
    )
    u = (
        md5_slice32(F.col("doc_id").cast("string")) + F.lit(0.5)
    ) / F.lit(4294967296.0)
    return weights.select(
        "doc_id",
        "source",
        "w",
        (F.col("w") - F.log(-F.log(u))).alias("_score"),
    )


def dsir_select(
    docs: DataFrame,
    target_sources: tuple[str, ...] = DSIR_TARGET_SOURCES,
    topk: int = DSIR_TOPK,
    counts: DataFrame | None = None,
    model: DataFrame | None = None,
) -> DataFrame:
    """DSIR (Xie et al. 2023) over ``docs(doc_id, source, text)``:
    target slice = ``source IN target_sources``, raw pool = the rest.

    Plan shape (why this is 100 TB-safe):

    * the fitted model is BOUNDED-DOMAIN: the feature stream aggregates
      to at most DSIR_BUCKETS rows (map-side partial combine, then a
      ≤512-row shuffle) no matter the corpus size;
    * totals (Nt, Nr) are one more row over the model; the per-bucket
      log-ratio table is then BROADCAST into the scoring pass — the
      corpus-scale side never shuffles for the join;
    * per-doc weights shuffle once on doc_id (linear, partial-agg
      combinable); selection is TakeOrdered over k rows.

    Determinism across engines: the Gumbel noise is derived from
    md5(doc_id) (u = (h + 0.5) / 2^32, g = -ln(-ln(u))), ranking uses
    the 6-dp-rounded score so float summation order cannot flip the
    cutoff, and the emitted weight is rounded to 4 dp.

    Pass ``counts`` (a materialized :func:`_feat_counts`) to run the
    expensive feature projection once — the registered query does, via
    a session-keyed memoized columnar persist; without it both passes
    work from cnt=1 occurrence rows derived straight from the scan
    (same integers, no extra shuffle). Pass ``model`` (any
    (bucket, c_t, c_r) relation, e.g. merged streaming partials) to
    skip the fit pass — the streaming twin does; both twins then share
    THIS function's log-ratio/Gumbel/top-k tail, so the formulations
    cannot drift.
    """
    if counts is None:
        counts = _features(docs).withColumn("cnt", F.lit(1))
    scored = _dsir_scored(counts, target_sources, model)
    picked = scored.orderBy(F.round("_score", 6).desc(), "doc_id").limit(
        topk
    )
    return picked.select(
        "doc_id",
        "source",
        F.round("w", 4).alias("log_ratio"),
        F.round("_score", 4).alias("dsir_score"),
    )


def _dsir_oracle(
    target_sources: tuple[str, ...] = DSIR_TARGET_SOURCES,
    topk: int = DSIR_TOPK,
) -> str:
    tgt = ", ".join(f"'{s}'" for s in target_sources)
    b = DSIR_BUCKETS
    return f"""
    WITH {_FEATS_SQL},
    model AS (
      SELECT bucket,
             sum(CASE WHEN source IN ({tgt}) THEN 1 ELSE 0 END) AS c_t,
             sum(CASE WHEN source IN ({tgt}) THEN 0 ELSE 1 END) AS c_r
      FROM feats GROUP BY bucket
    ), tot AS (
      SELECT sum(c_t) AS nt, sum(c_r) AS nr FROM model
    ), lr AS (
      SELECT bucket,
             ln(c_t + 1) - ln(nt + {b}) - ln(c_r + 1) + ln(nr + {b}) AS lr
      FROM model, tot
    ), weights AS (
      SELECT doc_id, source, sum(lr.lr) AS w
      FROM feats JOIN lr USING (bucket)
      WHERE source NOT IN ({tgt})
      GROUP BY doc_id, source
    ), scored AS (
      SELECT doc_id, source, w,
             w - ln(-ln(({md5_slice32_sql('CAST(doc_id AS VARCHAR)')} + 0.5)
                        / 4294967296.0)) AS score
      FROM weights
    ), ranked AS (
      SELECT *, row_number() OVER (
        ORDER BY round(score, 6) DESC, doc_id) AS rn
      FROM scored
    )
    SELECT doc_id, source, round(w, 4) AS log_ratio,
           round(score, 4) AS dsir_score
    FROM ranked WHERE rn <= {topk}
    """


# session-keyed memo for the materialized per-doc bucket counts (the
# same pattern as _BM25_BASE_MEMO): one feature projection per
# (application, corpus) instead of one per pass per call
_DSIR_COUNTS_MEMO: dict[tuple, DataFrame] = {}


@register("llm_dsir_select", oracle=_dsir_oracle())
def llm_dsir_select(spark, sf_dir):
    """DSIR importance resampling: hashed unigram+bigram bag models for
    the target slice vs the raw pool, per-doc log-likelihood-ratio
    weights, Gumbel-top-k selection — see :func:`dsir_select` for the
    bounded-domain model / broadcast-scoring scale shape. The per-doc
    bucket-count relation (4 compact columns) is memo-persisted
    (columnar) so the feature projection (tokenize + bigrams + one
    md5 per occurrence) runs once, not once per pass."""
    docs = _docs(spark, sf_dir)
    counts = _memoized(
        _DSIR_COUNTS_MEMO,
        spark,
        (sf_dir, DSIR_BUCKETS),
        lambda: _feat_counts(docs),
    )
    return dsir_select(docs, counts=counts)


# ---------------------------------------------------------------------------
# Cross-source contamination matrix
# ---------------------------------------------------------------------------


def _source_shingles(docs: DataFrame, n: int) -> DataFrame:
    """DISTINCT (source, shingle) — the corpus-scale relation both
    overlap-matrix consumers (sizes, intersections) read."""
    base = docs.select("source", T.tokens("text").alias("_t"))
    return base.select(
        "source",
        F.explode(
            F.array_distinct(T.shingles_from_tokens(F.col("_t"), n))
        ).alias("sh"),
    ).distinct()


def source_overlap_matrix(
    docs: DataFrame, n: int = 3, sh: DataFrame | None = None
) -> DataFrame:
    """Exact pairwise shingle-set Jaccard between SOURCES — the corpus
    forensics view ("how much does crawl slice A replicate slice B")
    that decides which sources a mixture plan can treat as independent.

    Scale shape: the corpus-scale relation is the DISTINCT
    (source, shingle) set — one shuffle on (source, shingle); the
    per-shingle source list is bounded by the SOURCE COUNT (tens), so
    the collect_set groups never skew and the pair fan-out per shingle
    is at most C(n_sources, 2); the result is n_sources² rows. No
    corpus self-join: the quadratic relation here is over SOURCES, not
    documents. All counts are integers — the only float is the final
    division, so the hash needs no summation-order defense.

    Pass ``sh`` (a materialized :func:`_source_shingles`) to run the
    tokenize + shingle + distinct pipeline once — the registered query
    does; without it each consumer re-derives it (including the
    distinct SHUFFLE, the operator's dominant cost) from the scan.
    """
    if sh is None:
        sh = _source_shingles(docs, n)
    sizes = sh.groupBy("source").agg(F.count("*").alias("sz"))
    srcs = F.col("srcs")
    pair_structs = F.flatten(
        F.transform(
            srcs,
            lambda x, i: F.transform(
                F.slice(srcs, i + F.lit(2), F.size(srcs)),
                lambda y: F.struct(x.alias("s1"), y.alias("s2")),
            ),
        )
    )
    inter = (
        sh.groupBy("sh")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
        .agg(F.count("*").alias("intersecting"))
    )
    a = sizes.select(F.col("source").alias("s1"), F.col("sz").alias("sz1"))
    b = sizes.select(F.col("source").alias("s2"), F.col("sz").alias("sz2"))
    return (
        inter.join(F.broadcast(a), "s1")
        .join(F.broadcast(b), "s2")
        .select(
            "s1",
            "s2",
            "intersecting",
            F.round(
                F.col("intersecting")
                / (F.col("sz1") + F.col("sz2") - F.col("intersecting")),
                6,
            ).alias("jaccard"),
        )
    )


_OVERLAP_ORACLE = """
    WITH arrs AS (
      SELECT source, list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS a
      FROM documents
    ), sh AS (
      SELECT DISTINCT source, s.sh AS sh
      FROM arrs, unnest(list_distinct(list_transform(
        generate_series(1, len(a) - 2),
        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2]))) AS s(sh)
    ), sizes AS (
      SELECT source, count(*) AS sz FROM sh GROUP BY source
    ), inter AS (
      SELECT x.source AS s1, y.source AS s2, count(*) AS intersecting
      FROM sh x JOIN sh y ON x.sh = y.sh AND x.source < y.source
      GROUP BY 1, 2
    )
    SELECT s1, s2, intersecting,
           round(intersecting / (za.sz + zb.sz - intersecting), 6)
             AS jaccard
    FROM inter
    JOIN sizes za ON za.source = s1
    JOIN sizes zb ON zb.source = s2
    """


_OVERLAP_SH_MEMO: dict[tuple, DataFrame] = {}


@register("text_source_overlap_matrix", oracle=_OVERLAP_ORACLE)
def text_source_overlap_matrix(spark, sf_dir):
    """Pairwise source-level shingle Jaccard — see
    :func:`source_overlap_matrix` (distinct (source, shingle) relation,
    source-count-bounded pair fan-out, no document self-join). The
    distinct relation is memo-persisted (columnar) behind a
    session-keyed memo: unlike the BM25/DSIR memos this helps the FIRST
    call too, since both consumers otherwise re-run the distinct
    shuffle (PERF §38)."""
    docs = _docs(spark, sf_dir)
    sh = _memoized(
        _OVERLAP_SH_MEMO,
        spark,
        (sf_dir, 3),
        lambda: _source_shingles(docs, 3),
    )
    return source_overlap_matrix(docs, sh=sh)


# ---------------------------------------------------------------------------
# Streaming BM25: additive corpus statistics
# ---------------------------------------------------------------------------


@register(
    "streaming_bm25_rank",
    # BM25's corpus state (N, sum_dl, per-term df) is ADDITIVE — the
    # cell-wise sum of per-batch partials equals the whole-corpus stats
    # exactly, so the final ranking is bit-identical to the batch
    # query's and shares its oracle verbatim.
    oracle=_bm25_oracle(),
)
def streaming_bm25_rank(spark, sf_dir):
    """BM25 with its global statistics maintained INCREMENTALLY through
    Structured Streaming: each micro-batch (maxFilesPerTrigger=1 over a
    6-file replay of documents, >=2 batches asserted) reduces to ONE
    stats row (n_docs, sum_dl, df per term) written to a batch_id-keyed
    store (overwrite => retry-idempotent); the partials are summed and
    broadcast into the scoring pass. At 100 TB this is the point: the
    ranking state a stream must carry is O(|terms|) counters per batch
    — never documents — and a new day's crawl updates the corpus model
    by ADDING its one-row partial, not by re-aggregating history."""
    from ..sources.tables import load_tables
    from ..streaming.materialize import session_tmpdir

    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "source", "text"
    )
    d = session_tmpdir("stream_bm25_")
    src = f"{d}/src"
    docs.repartition(6).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    store = f"{d}/partials"
    terms = BM25_TERMS

    def maintain(bdf: DataFrame, batch_id: int) -> None:
        part = bdf.select(T.tokens("text").alias("_t")).select(
            F.size("_t").alias("dl"),
            *[_tf("_t", t).alias(f"tf_{i}") for i, t in enumerate(terms)],
        )
        part.agg(
            F.count("*").alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
            *[
                F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
                for i in range(len(terms))
            ],
        ).write.mode("overwrite").parquet(f"{store}/batch={batch_id}")

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
        raise ValueError(
            f"expected a multi-batch replay, got {n_batches}"
        )

    # avgdl = exact integer sums then one division — bit-identical to
    # the batch path's F.avg; the scoring tail is bm25_rank's own, so
    # the two formulations cannot drift
    stats = spark.read.parquet(store).agg(
        F.sum("n_docs").alias("n_docs"),
        (F.sum("sum_dl") / F.sum("n_docs")).alias("avgdl"),
        *[
            F.sum(f"df_{i}").alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    return bm25_rank(docs, base=_bm25_base(docs, terms), stats=stats)


# ---------------------------------------------------------------------------
# Streaming DSIR: additive model maintenance
# ---------------------------------------------------------------------------


@register(
    "streaming_dsir_select",
    # the hashed-n-gram bag model is ADDITIVE: per-batch (bucket, c_t,
    # c_r) partials sum cell-wise to the whole-corpus model, so the
    # final selection is bit-identical to the batch query's and shares
    # its oracle verbatim (the streaming_cms_heavy_hitters /
    # streaming_bm25_rank argument).
    oracle=_dsir_oracle(),
)
def streaming_dsir_select(spark, sf_dir):
    """DSIR with its bag models maintained INCREMENTALLY through
    Structured Streaming: each micro-batch (maxFilesPerTrigger=1 over a
    6-file replay of documents, >=2 batches asserted) reduces to at
    most DSIR_BUCKETS (bucket, c_t, c_r) rows written to a
    batch_id-keyed store (overwrite => retry-idempotent); partials sum
    to the exact whole-corpus model, from which the log-ratio table is
    derived and broadcast into the scoring pass. At 100 TB this is the
    ingestion contract: a new crawl day updates the target/raw models
    by ADDING its <=512-row partial — no history re-aggregation — and
    re-selection over any pool then prices at the scoring pass alone."""
    from ..sources.tables import load_tables
    from ..streaming.materialize import session_tmpdir

    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "source", "text"
    )
    d = session_tmpdir("stream_dsir_")
    src = f"{d}/src"
    docs.repartition(6).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    store = f"{d}/partials"
    is_target = F.col("source").isin(*DSIR_TARGET_SOURCES)

    def maintain(bdf: DataFrame, batch_id: int) -> None:
        _features(bdf).groupBy("bucket").agg(
            F.sum(is_target.cast("long")).alias("c_t"),
            F.sum((~is_target).cast("long")).alias("c_r"),
        ).write.mode("overwrite").parquet(f"{store}/batch={batch_id}")

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
        raise ValueError(
            f"expected a multi-batch replay, got {n_batches}"
        )

    # merged partials = the exact batch model (integer sums); the
    # log-ratio/Gumbel/top-k tail — and the counts-based weight
    # formulation — are dsir_select's own, so the twins cannot drift
    model = spark.read.parquet(store).groupBy("bucket").agg(
        F.sum("c_t").alias("c_t"), F.sum("c_r").alias("c_r")
    )
    return dsir_select(docs, counts=_feat_counts(docs), model=model)


# ---------------------------------------------------------------------------
# Source-overlap MinHash sketch — the shuffle-free scale path
# ---------------------------------------------------------------------------

_SIG_K = 32  # 8 md5 digests x 4 independent 32-bit slices


def _sig_cols(sh_col: str = "sh") -> list[Column]:
    """32 portable min-hash aggregates over a shingle column: seed s
    prefixes the digest input, the four 8-hex slices of each digest are
    independent 32-bit hashes (the operators/dedup.py _bloom_bit
    idiom), so 32 signature components cost 8 md5 calls per row. All
    algebraic mins — fully map-side combinable."""
    cols = []
    for i in range(_SIG_K):
        seed, sl = divmod(i, 4)
        digest = F.md5(
            F.concat(F.lit(f"{seed}:"), F.col(sh_col)).cast("binary")
        )
        cols.append(
            F.min(
                F.conv(
                    F.substring(digest, 1 + 8 * sl, 8), 16, 10
                ).cast("long")
            ).alias(f"h{i}")
        )
    return cols


def _sig_sql(expr: str, i: int) -> str:
    seed, sl = divmod(i, 4)
    return (
        f"min(CAST(concat('0x', substr(md5('{seed}:' || {expr}), "
        f"{1 + 8 * sl}, 8)) AS BIGINT))"
    )


def source_minhash_sigs(sh: DataFrame) -> DataFrame:
    """(source, h0..h31) from any (source, sh) relation. Min is
    multiset-invariant, so raw shingle OCCURRENCES give the same
    signature as the distinct set — the standalone scale path feeds
    occurrences straight from the scan and never shuffles anything
    larger than n_sources x 32 partial minima.

    Shuffle-free is not free: the occurrence path hashes EVERY
    occurrence (8 md5/row), so on a corpus with heavy cross-doc
    duplication the distinct-first form wins despite its shuffle —
    measured at sfx100 (485M occurrences, replicas collapse under
    distinct): occurrence-fed 462 s vs 94 s through the memoized
    distinct relation (PERF §39 addendum 2). Feed occurrences when the
    corpus is mostly unique text or no distinct relation exists yet;
    reuse the distinct relation when one is already materialized."""
    return sh.groupBy("source").agg(*_sig_cols())


_SKETCH_ORACLE = f"""
    WITH arrs AS (
      SELECT source, list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS a
      FROM documents
    ), sh AS (
      SELECT DISTINCT source, s.sh AS sh
      FROM arrs, unnest(list_distinct(list_transform(
        generate_series(1, len(a) - 2),
        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2]))) AS s(sh)
    ), sizes AS (
      SELECT source, count(*) AS sz FROM sh GROUP BY source
    ), inter AS (
      SELECT x.source AS s1, y.source AS s2, count(*) AS intersecting
      FROM sh x JOIN sh y ON x.sh = y.sh AND x.source < y.source
      GROUP BY 1, 2
    ), exact AS (
      SELECT s1, s2,
             round(intersecting / (za.sz + zb.sz - intersecting), 6)
               AS exact_jaccard
      FROM inter
      JOIN sizes za ON za.source = s1
      JOIN sizes zb ON zb.source = s2
    ), sigs AS (
      SELECT source,
             {", ".join(f"{_sig_sql('sh', i)} AS h{i}" for i in range(_SIG_K))}
      FROM sh GROUP BY source
    ), est AS (
      SELECT a.source AS s1, b.source AS s2,
             ({" + ".join(f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END" for i in range(_SIG_K))})
               AS matches
      FROM sigs a JOIN sigs b ON a.source < b.source
    )
    SELECT est.s1, est.s2, CAST(matches AS BIGINT) AS matches,
           round(matches / {_SIG_K}.0, 6) AS est_jaccard,
           coalesce(exact.exact_jaccard, 0.0) AS exact_jaccard,
           round(abs(round(matches / {_SIG_K}.0, 6)
                     - coalesce(exact.exact_jaccard, 0.0)), 6) AS abs_err
    FROM est LEFT JOIN exact ON est.s1 = exact.s1 AND est.s2 = exact.s2
    """


@register("text_source_overlap_sketch", oracle=_SKETCH_ORACLE)
def text_source_overlap_sketch(spark, sf_dir):
    """MinHash-signature estimate of the source-overlap matrix,
    self-gated against the exact values — the SHUFFLE-FREE scale path
    of ``text_source_overlap_matrix``: signature state is
    n_sources x 32 algebraic minima, so standalone sketch use reduces
    entirely map-side (no distinct shuffle, no pair explode; see
    :func:`source_minhash_sigs` — occurrence-fed signatures equal
    distinct-set signatures, min being multiset-invariant, pinned by
    test). This registered form ALSO derives the exact matrix (from
    the same memoized distinct relation) and emits per-pair estimate,
    exact value, and absolute error — a green driver row certifies the
    k=32 estimator's error profile on this corpus, the
    agg_kmv_theta_ops sketch-vs-exact pattern."""
    docs = _docs(spark, sf_dir)
    sh = _memoized(
        _OVERLAP_SH_MEMO,
        spark,
        (sf_dir, 3),
        lambda: _source_shingles(docs, 3),
    )
    return overlap_sketch_view(docs, sh)


def overlap_sketch_view(
    docs: DataFrame, sh: DataFrame, sigs: DataFrame | None = None
) -> DataFrame:
    """Shared tail of the sketch query: signature pair-match counting +
    exact-matrix gating. Pass ``sigs`` (any (source, h0..h31) relation,
    e.g. element-wise-min-folded streaming partials) to skip the
    signature aggregation — the streaming twin does; both twins then
    share THIS function's estimate/exact/error emission, so the
    formulations cannot drift (the stats/model-injection rule)."""
    if sigs is None:
        sigs = source_minhash_sigs(sh)
    a = sigs.select(
        F.col("source").alias("s1"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(_SIG_K)],
    )
    b = sigs.select(
        F.col("source").alias("s2"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(_SIG_K)],
    )
    matches: Column = F.lit(0)
    for i in range(_SIG_K):
        matches = matches + (F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
    est = (
        a.join(b, F.col("s1") < F.col("s2"))
        .select("s1", "s2", matches.cast("bigint").alias("matches"))
    )
    exact = source_overlap_matrix(docs, sh=sh).select(
        "s1", "s2", F.col("jaccard").alias("exact_jaccard")
    )
    est_j = F.round(F.col("matches") / F.lit(float(_SIG_K)), 6)
    return (
        est.join(exact, ["s1", "s2"], "left")
        .select(
            "s1",
            "s2",
            "matches",
            est_j.alias("est_jaccard"),
            F.coalesce(F.col("exact_jaccard"), F.lit(0.0)).alias(
                "exact_jaccard"
            ),
            F.round(
                F.abs(
                    est_j - F.coalesce(F.col("exact_jaccard"), F.lit(0.0))
                ),
                6,
            ).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR mixture steering: per-source summary
# ---------------------------------------------------------------------------


@register(
    "llm_dsir_source_mixture",
    oracle=f"""
    WITH {_FEATS_SQL},
    model AS (
      SELECT bucket,
             sum(CASE WHEN source IN ('src0', 'src1', 'src2')
                 THEN 1 ELSE 0 END) AS c_t,
             sum(CASE WHEN source IN ('src0', 'src1', 'src2')
                 THEN 0 ELSE 1 END) AS c_r
      FROM feats GROUP BY bucket
    ), tot AS (
      SELECT sum(c_t) AS nt, sum(c_r) AS nr FROM model
    ), lr AS (
      SELECT bucket,
             ln(c_t + 1) - ln(nt + {DSIR_BUCKETS})
             - ln(c_r + 1) + ln(nr + {DSIR_BUCKETS}) AS lr
      FROM model, tot
    ), weights AS (
      SELECT doc_id, source, sum(lr.lr) AS w
      FROM feats JOIN lr USING (bucket)
      WHERE source NOT IN ('src0', 'src1', 'src2')
      GROUP BY doc_id, source
    ), scored AS (
      SELECT doc_id, source, w,
             w - ln(-ln(({md5_slice32_sql('CAST(doc_id AS VARCHAR)')} + 0.5)
                        / 4294967296.0)) AS score
      FROM weights
    ), ranked AS (
      SELECT *, row_number() OVER (
        ORDER BY round(score, 6) DESC, doc_id) AS rn
      FROM scored
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(w), 4) AS mean_log_ratio,
           CAST(sum(CASE WHEN rn <= {DSIR_TOPK} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_selected,
           round(sum(CASE WHEN rn <= {DSIR_TOPK} THEN 1 ELSE 0 END)
                 / {DSIR_TOPK}.0, 6) AS mixture_share
    FROM ranked
    GROUP BY source
    """,
)
def llm_dsir_source_mixture(spark, sf_dir):
    """The mixture-steering view of a DSIR pass: per raw-pool source,
    candidate count, mean log-likelihood-ratio weight (how target-like
    the source is on average), how many of its docs made the Gumbel
    top-k, and its share of the selection — the table a pipeline uses
    to set per-source sampling rates. Reuses the memoized per-doc
    bucket counts, so after any DSIR call in the session this is
    model fit + one linear agg over the cached relation; no new
    corpus scan."""
    docs = _docs(spark, sf_dir)
    counts = _memoized(
        _DSIR_COUNTS_MEMO,
        spark,
        (sf_dir, DSIR_BUCKETS),
        lambda: _feat_counts(docs),
    )
    scored = _dsir_scored(counts, DSIR_TARGET_SOURCES)
    # top-k membership via TakeOrdered + broadcast semi-mark — a global
    # row_number window would funnel the whole candidate relation
    # through one partition (the census anti-pattern); the k selected
    # ids are driver-merged heap output, metadata-scale
    sel_ids = (
        scored.orderBy(F.round("_score", 6).desc(), "doc_id")
        .limit(DSIR_TOPK)
        .select("doc_id", F.lit(1).alias("is_sel"))
    )
    marked = scored.join(F.broadcast(sel_ids), "doc_id", "left")
    sel = F.coalesce(F.col("is_sel"), F.lit(0))
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("w"), 4).alias("mean_log_ratio"),
        F.sum(sel).cast("bigint").alias("n_selected"),
        F.round(F.sum(sel) / F.lit(float(DSIR_TOPK)), 6).alias(
            "mixture_share"
        ),
    )
