"""Round-5 LLM-pipeline additions: blocked fuzzy record linkage,
streaming Count-Min merge, and chunk-level binary-media near-dup.

Each fills a gap its neighbors point at: `text_edit_distance_pairs`'
docstring defers candidate generation to "an LSH/blocking stage" —
`entity_blocking_linkage` IS that stage; `streaming_kmv_sketch_merge`
proves KMV mergeability — `streaming_cms_heavy_hitters` proves the same
linearity for the frequency domain; the multimodal family verified
binary plumbing — `multimodal_chunk_dedup` adds the content-defined-ish
dedup pass a media lake runs before expensive perceptual hashing.
All three carry full DuckDB oracles (portable md5 hashes, deterministic
planted corpora)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sources.tables import load_tables
from ..streaming.materialize import await_or_raise as _await_or_raise
from .llm_pipeline import (
    DOCS_WITH_NEAR_DUPS_SQL,
    _JACCARD_CTES,
    _docs_with_near_dups,
)
from .registry import register

# --------------------------------------------- blocked record linkage

_LINK_OFFSET = 1_000_000
# typo position inside the 9-digit suffix of 'Customer#%09d' (18 chars):
# positions 10-13, so the LAST FOUR characters (15-18) survive any typo
# and can serve as the blocking key.
_LINK_POS_SQL = "(10 + c_custkey % 4)"


@register(
    "entity_blocking_linkage",
    oracle=f"""
    WITH recs AS (
      SELECT c_custkey AS rec_id, c_name AS name FROM customer
      UNION ALL
      SELECT c_custkey + {_LINK_OFFSET},
             concat(substr(c_name, 1, {_LINK_POS_SQL} - 1), 'x',
                    substr(c_name, {_LINK_POS_SQL} + 1))
      FROM customer WHERE c_custkey % 3 = 0
    ),
    blocked AS (
      SELECT rec_id, name, substr(name, 15, 4) AS blk FROM recs
    )
    SELECT a.rec_id AS id1, b.rec_id AS id2,
           levenshtein(a.name, b.name) AS lev
    FROM blocked a JOIN blocked b
      ON a.blk = b.blk AND a.rec_id < b.rec_id
    WHERE levenshtein(a.name, b.name) <= 2
    """,
)
def entity_blocking_linkage(spark, sf_dir):
    """Record linkage via BLOCKING + bounded edit-distance verify — the
    missing candidate-generation stage `text_edit_distance_pairs`
    defers to.  The corpus plants one deterministic typo variant per
    third customer (one character substituted inside the digit field);
    records block on the typo-surviving suffix key, and Levenshtein
    runs ONLY inside blocks.  Scale shape: the O(m·n)-per-pair edit
    distance touches block-local candidates — at uniform key spread
    that is ~n/|keys| records per block, never the n² cross product; a
    production linker adds more blocking passes (other surviving
    sub-keys) and unions candidates, each pass the same shape."""
    cust = load_tables(spark, sf_dir)["customer"].select(
        "c_custkey", "c_name"
    )
    pos = (F.lit(10) + F.col("c_custkey") % 4).cast("int")
    typo = F.concat(
        F.col("c_name").substr(F.lit(1), pos - 1),
        F.lit("x"),
        F.col("c_name").substr(pos + 1, F.length("c_name")),
    )
    self_row = F.array(
        F.struct(
            F.col("c_custkey").alias("rec_id"), F.col("c_name").alias("name")
        )
    )
    empty = F.array().cast("array<struct<rec_id:bigint,name:string>>")
    variant = F.when(
        F.col("c_custkey") % 3 == 0,
        F.array(
            F.struct(
                (F.col("c_custkey") + _LINK_OFFSET).alias("rec_id"),
                typo.alias("name"),
            )
        ),
    ).otherwise(empty)
    recs = cust.select(
        F.explode_outer(F.concat(self_row, variant)).alias("v")
    ).select("v.rec_id", "v.name", F.substring("v.name", 15, 4).alias("blk"))
    a = recs.select(
        F.col("rec_id").alias("id1"), F.col("name").alias("n1"), "blk"
    )
    b = recs.select(
        F.col("rec_id").alias("id2"), F.col("name").alias("n2"), "blk"
    )
    return (
        a.join(b, ["blk"])
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("lev", F.levenshtein("n1", "n2"))
        .filter(F.col("lev") <= 2)
        .select("id1", "id2", "lev")
    )


# ------------------------------------------- streaming Count-Min merge


@register(
    "streaming_cms_heavy_hitters",
    # The merged streaming sketch must be BIT-IDENTICAL to the batch
    # sketch (Count-Min is linear: cell-wise sum of per-batch sketches
    # equals the sketch of the union), so this query shares the batch
    # query's oracle verbatim (agg_count_min_heavy_hitters).
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '),
                                x -> x <> '')) AS token
      FROM documents
    ),
    exact AS (SELECT token, count(*) AS exact_n FROM toks GROUP BY token),
    probes AS (
      SELECT token, exact_n FROM exact
      ORDER BY exact_n DESC, token LIMIT 20
    ),
    rr AS (SELECT unnest(generate_series(0, 2)) AS r),
    sk AS (
      SELECT rr.r AS row,
             CAST(concat('0x', substr(md5(token), 1 + 8 * rr.r, 8))
                  AS BIGINT) % 1024 AS bucket,
             count(*) AS c
      FROM toks CROSS JOIN rr
      GROUP BY 1, 2
    ),
    est AS (
      SELECT p.token, min(sk.c) AS est
      FROM probes p
      CROSS JOIN rr
      JOIN sk ON sk.row = rr.r
             AND sk.bucket = CAST(concat('0x',
                   substr(md5(p.token), 1 + 8 * rr.r, 8)) AS BIGINT) % 1024
      GROUP BY p.token
    )
    SELECT p.token, p.exact_n, e.est,
           CAST(e.est >= p.exact_n AS INTEGER) AS lower_bound_ok
    FROM probes p JOIN est e USING (token)
    """,
)
def streaming_cms_heavy_hitters(spark, sf_dir):
    """The Count-Min sketch maintained INCREMENTALLY through Structured
    Streaming — the frequency-domain twin of `streaming_kmv_sketch_merge`:
    each micro-batch (maxFilesPerTrigger=1 over a 6-file replay of
    documents, ≥2 batches asserted in-query) builds its own k×m counter
    table inside ``foreachBatch`` and writes it to a batch_id-keyed store
    (overwrite ⇒ retry-idempotent).  CMS is LINEAR, so the cell-wise sum
    of the partials equals the whole-corpus sketch exactly — the
    streaming estimates are bit-identical to the batch query's and share
    its oracle.  At 100 TB this is why sketch state stays k·m-bounded
    per stream regardless of corpus size or batch count."""
    import glob as _glob

    from ..functions.text import tokens
    from ..operators.sketch import cms_estimate, cms_sketch
    from ..streaming.materialize import session_tmpdir

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    d = session_tmpdir("stream_cms_")
    src = f"{d}/src"
    docs.repartition(6).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    store = f"{d}/partials"

    def maintain(bdf: DataFrame, batch_id: int) -> None:
        toks = bdf.select(F.explode(tokens("text")).alias("token"))
        cms_sketch(toks, k=3, m=1024).write.mode("overwrite").parquet(
            f"{store}/batch={batch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(maintain)
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, 300)
    n_batches = len(_glob.glob(f"{store}/batch=*"))
    if n_batches < 2:
        raise ValueError(
            f"expected incremental sketch maintenance, got {n_batches}"
        )
    merged = (
        spark.read.parquet(store)
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    toks = docs.select(F.explode(tokens("text")).alias("token"))
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.orderBy(F.col("exact_n").desc(), F.col("token")).limit(20)
    est = cms_estimate(merged, probes.select("token"), k=3, m=1024)
    return probes.join(est, "token").select(
        "token",
        "exact_n",
        "est",
        (F.col("est") >= F.col("exact_n")).cast("int").alias(
            "lower_bound_ok"
        ),
    )


# ------------------------------------- chunk-level media near-dup pass

_CHUNK_CHARS = 64
_CHUNK_TAU = 0.8


@register(
    "multimodal_chunk_dedup",
    oracle=f"""
    WITH docs AS (
      {DOCS_WITH_NEAR_DUPS_SQL}
    ),
    chunks AS (
      SELECT DISTINCT doc_id AS media_id,
             md5(substr(text, CAST(s.i * {_CHUNK_CHARS} + 1 AS BIGINT),
                        {_CHUNK_CHARS})) AS h
      FROM docs,
           unnest(generate_series(0,
             greatest(CAST(ceil(length(text) / {_CHUNK_CHARS}.0) AS INTEGER),
                      1) - 1)) AS s(i)
    ),
    sizes AS (SELECT media_id, count(*) AS sz FROM chunks GROUP BY media_id),
    shared AS (
      SELECT a.media_id AS id1, b.media_id AS id2,
             count(*) AS shared_chunks
      FROM chunks a JOIN chunks b
        ON a.h = b.h AND a.media_id < b.media_id
      GROUP BY 1, 2
    )
    SELECT id1, id2, shared_chunks,
           round(shared_chunks / least(s1.sz, s2.sz), 6) AS overlap
    FROM shared
    JOIN sizes s1 ON s1.media_id = id1
    JOIN sizes s2 ON s2.media_id = id2
    WHERE round(shared_chunks / least(s1.sz, s2.sz), 6) >= {_CHUNK_TAU}
    """,
)
def multimodal_chunk_dedup(spark, sf_dir):
    """Chunk-level near-dup detection over BINARY media payloads — the
    cheap block-fingerprint pass a media lake runs before perceptual
    hashing (which needs real codecs, stubbed here): split each payload
    into fixed 64-char blocks, md5 each block, and link media sharing
    ≥ τ of the smaller side's distinct blocks.  Catches re-uploads with
    appended/patched tails (the planted suffix variants) without ever
    comparing raw payloads.  Scale shape: the inverted index on block
    hashes is the same posting-list machinery as text dedup — candidate
    volume follows genuinely shared content, never n²; payloads
    themselves never shuffle (blocks hash map-side off the decoded
    column).  The oracle re-derives every block hash in DuckDB."""
    from ..operators.multimodal import synthesize_media

    media = synthesize_media(_docs_with_near_dups(spark, sf_dir))
    txt = F.decode(F.col("payload"), "utf-8")
    n_chunks = F.greatest(
        F.ceil(F.length(txt) / F.lit(float(_CHUNK_CHARS))).cast("int"),
        F.lit(1),
    )
    chunk_hashes = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.md5(
            txt.substr(i * _CHUNK_CHARS + 1, F.lit(_CHUNK_CHARS))
        ),
    )
    chunks = (
        media.select(
            "media_id", F.explode(F.array_distinct(chunk_hashes)).alias("h")
        )
    )
    sizes = chunks.groupBy("media_id").agg(F.count(F.lit(1)).alias("sz"))
    a = chunks.select(F.col("media_id").alias("id1"), "h")
    b = chunks.select(F.col("media_id").alias("id2"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
    )
    overlap = F.round(
        F.col("shared_chunks")
        / F.least(F.col("s1.sz"), F.col("s2.sz")),
        6,
    )
    return (
        shared.join(sizes.alias("s1"), F.col("id1") == F.col("s1.media_id"))
        .join(sizes.alias("s2"), F.col("id2") == F.col("s2.media_id"))
        .withColumn("overlap", overlap)
        .filter(F.col("overlap") >= _CHUNK_TAU)
        .select("id1", "id2", "shared_chunks", "overlap")
    )


# --------------------------- streaming embedding near-dup ingest gate

_VND_SLABS = 4
_VND_TAU = 0.3
_VND_PLANES = 4
_VND_TABLES = 8

# the portable hyperplane-LSH pair pipeline (weights → sign buckets →
# bucket-join candidates → fold-cosine verify) — the same CTE chain the
# batch `embedding_near_dup_lsh` oracle hash-checks
_VND_PAIR_CTES = f"""
    w AS (
      SELECT tt.t, pp.p,
             list(CASE WHEN CAST(concat('0x',
                    substr(md5('42_' || tt.t || '_' || pp.p || '_' || d.i),
                           1, 8)) AS BIGINT) % 2 = 0
                  THEN 1.0 ELSE -1.0 END ORDER BY d.i) AS wv
      FROM (SELECT unnest(generate_series(0, {_VND_TABLES - 1})) AS t) tt,
           (SELECT unnest(generate_series(0, {_VND_PLANES - 1})) AS p) pp,
           (SELECT unnest(generate_series(0, 63)) AS i) d
      GROUP BY tt.t, pp.p
    ),
    vecs AS (
      SELECT vec_id AS id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    proj AS (
      SELECT id, w.t, w.p,
             list_reduce(list_transform(generate_series(1, 64),
                                        i -> v[i] * wv[i]),
                         (a, b) -> a + b) AS pr
      FROM vecs, w
    ),
    buckets AS (
      SELECT id, t,
             sum(CASE WHEN pr > 0 THEN 1 << p ELSE 0 END) AS bucket
      FROM proj GROUP BY id, t
    ),
    cands AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2
      FROM buckets a
      JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket AND a.id < b.id
    ),
    pairs AS (
      SELECT id1, id2 FROM cands
      JOIN vecs x ON x.id = id1 JOIN vecs y ON y.id = id2
      WHERE round(
        list_reduce(list_transform(generate_series(1, 64),
                                   i -> x.v[i] * y.v[i]), (a, b) -> a + b)
        / (sqrt(list_reduce(list_transform(generate_series(1, 64),
                                           i -> x.v[i] * x.v[i]),
                            (a, b) -> a + b))
           * sqrt(list_reduce(list_transform(generate_series(1, 64),
                                             i -> y.v[i] * y.v[i]),
                              (a, b) -> a + b))), 6) >= {_VND_TAU}
    )"""


def _vector_ingest_oracle() -> str:
    """Unrolled replay of the vector filter's admission semantics over
    the LSH-candidate-verified pair set (the operator's OWN semantics,
    bit-reproducible in SQL — the recall question vs exact cosine is the
    recall-gate twin's job, exactly as for the batch pair of queries)."""
    rounds = ["a0 AS (SELECT CAST(NULL AS BIGINT) AS id WHERE false)"]
    for k in range(1, _VND_SLABS + 1):
        rounds.append(f"""
    surv{k} AS MATERIALIZED (
      SELECT s.id FROM slabs s WHERE s.slab = {k} AND NOT EXISTS (
        SELECT 1 FROM pairs p JOIN a{k - 1} a
          ON (p.id1 = s.id AND p.id2 = a.id)
          OR (p.id2 = s.id AND p.id1 = a.id))
    ),
    adm{k} AS (
      SELECT x.id FROM surv{k} x WHERE NOT EXISTS (
        SELECT 1 FROM pairs p JOIN surv{k} y ON p.id1 = y.id
        WHERE p.id2 = x.id)
    ),
    a{k} AS MATERIALIZED (
      SELECT id FROM a{k - 1} UNION ALL SELECT id FROM adm{k})""")
    return f"""
    WITH {_VND_PAIR_CTES},
    slabs AS (
      SELECT vec_id AS id,
             ntile({_VND_SLABS}) OVER (ORDER BY vec_id) AS slab
      FROM embeddings
    ),
    {','.join(rounds)}
    SELECT id AS vec_id FROM a{_VND_SLABS}
    """


@register("streaming_embedding_neardup_ingest", oracle=_vector_ingest_oracle())
def streaming_embedding_neardup_ingest(spark, sf_dir):
    """The cross-batch streaming near-dup filter for EMBEDDINGS — the
    vector twin of `streaming_neardup_ingest`, completing the
    streaming×similarity matrix: every micro-batch hyperplane-LSH-buckets
    its vectors (portable md5-parity planes), bucket-joins them against
    the PERSISTENT store of everything already admitted (unbounded
    lookback), verifies candidates with exact fold-cosine against the
    vector SIDECAR (per-batch verify work bounded by candidates — the
    round-5 sidecar design, built in from day one), dedups within the
    batch, and appends the survivors' buckets + vectors.  The corpus
    replays as 4 vec_id-ordered slabs (forced mtimes ⇒ deterministic
    batch order, ≥2 batches asserted in-query).  The oracle REPLAYS the
    admission semantics over the LSH-candidate-verified pair set — the
    operator's own bit-reproducible semantics (recall vs exact cosine is
    `embedding_lsh_recall_gate`'s job) — so a green row certifies the
    portable bucketing AND the cross-batch state machinery end-to-end.
    Vectors are widened to DOUBLE before the JSON slab write: float32
    values JSON-round-trip to DIFFERENT doubles than a direct
    float→double cast, which would shift 6dp-rounded cosines at the
    admit boundary."""
    import glob as _glob
    import os

    from ..operators.similarity import as_double
    from ..streaming.dedup_stream import (
        StreamingVectorNearDupFilter,
        start_near_dup_stream,
    )
    from ..streaming.materialize import session_tmpdir
    from pyspark.sql.window import Window

    emb = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", as_double("embedding").alias("embedding")
    )
    d = session_tmpdir("vec_neardup_ingest_")
    src = f"{d}/src"
    # r12: materialize once before the four slab writes (same rationale
    # as the pHash twin's fixture — each write otherwise re-runs the
    # scan + cast + global ntile window and discards 3/4 of it).
    # bound: one copy of the fixture embeddings (|corpus| rows), fixture
    # setup only, freed with the session tmpdir.
    slabbed = emb.withColumn(
        "slab", F.ntile(_VND_SLABS).over(Window.orderBy("vec_id"))
    ).localCheckpoint(eager=True)
    for s in range(1, _VND_SLABS + 1):
        (
            slabbed.filter(F.col("slab") == s)
            .drop("slab")
            .coalesce(1)
            .write.mode("overwrite")
            .json(f"{src}/s{s:02d}")
        )
    base = os.stat(src).st_mtime
    for s in range(1, _VND_SLABS + 1):
        for f in _glob.glob(f"{src}/s{s:02d}/part-*.json"):
            os.utime(f, (base + s, base + s))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .json(f"{src}/s*")
    )
    filt = StreamingVectorNearDupFilter(
        f"{d}/store",
        f"{d}/out",
        threshold=_VND_TAU,
        n_planes=_VND_PLANES,
        n_tables=_VND_TABLES,
        dims=64,
    )
    q = start_near_dup_stream(stream, filt, f"{d}/ckpt", available_now=True)
    _await_or_raise(q, 300)
    n_batches = len(_glob.glob(f"{d}/store/batch_id=*"))
    if n_batches < 2:
        raise ValueError(
            f"expected incremental ingest, got {n_batches} batches"
        )
    return spark.read.parquet(f"{d}/out").select("vec_id")


# ----------------------- canonical selection after near-dup clustering

def _cc_steps(iters: int) -> str:
    """min-label-propagation CTE steps (the dedup_connected_components
    oracle's shape — both engines run the identical bounded iteration)."""
    steps = ["l0 AS (SELECT doc_id AS id, doc_id AS lbl FROM docs)"]
    for k in range(1, iters + 1):
        steps.append(f"""l{k} AS (
          SELECT l.id, least(l.lbl, coalesce(min(nl.lbl), l.lbl)) AS lbl
          FROM l{k - 1} l
          LEFT JOIN edges e ON e.src = l.id
          LEFT JOIN l{k - 1} nl ON nl.id = e.dst
          GROUP BY l.id, l.lbl)""")
    return ", ".join(steps)


@register(
    "dedup_canonical_selection",
    oracle=f"""
    WITH {_JACCARD_CTES},
    edges AS (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION ALL
      SELECT id2, id1 FROM pairs
    ),
    {_cc_steps(4)},
    tok AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM docs
    ),
    j AS (
      SELECT l.id, l.lbl AS cluster, t.n_tokens
      FROM l4 l JOIN tok t ON t.doc_id = l.id
    ),
    r AS (
      SELECT cluster, id, n_tokens,
             row_number() OVER (
               PARTITION BY cluster ORDER BY n_tokens DESC, id) AS rn,
             CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT)
               AS cluster_size
      FROM j
    )
    SELECT cluster, id AS keep_id, n_tokens AS keep_tokens, cluster_size
    FROM r WHERE rn = 1
    """,
)
def dedup_canonical_selection(spark, sf_dir):
    """The step every dedup pipeline runs AFTER clustering and that none
    of the pair/cluster queries covered: pick the CANONICAL document per
    near-dup cluster.  Policy: keep the longest version (most-complete —
    the planted suffix-extended variants beat their originals), ties to
    the smallest doc_id.  Composition: exact-jaccard pairs → 4-round
    min-label connected components → one groupBy(cluster) with a
    struct-max argmax — deterministic, no window sort, one extra shuffle
    on the cluster label beyond the CC rounds.  At 100 TB the argmax is
    a plain partial-aggregated shuffle on cluster ids (clusters are tiny;
    no skew), and swapping the policy (quality score, recency) is a
    one-line change of the struct's first field."""
    from ..functions import text as T
    from ..operators import dedup as D

    corpus = _docs_with_near_dups(spark, sf_dir)
    pairs = D.jaccard_pairs(corpus, threshold=0.8, ngram=3)
    labels = D.connected_components(
        corpus.select("doc_id"),
        pairs.select("id1", "id2"),
        iters=4,
        id_col="doc_id",
    )
    toks = corpus.select(
        F.col("doc_id").alias("tok_id"),
        F.size(T.tokens("text")).cast("bigint").alias("n_tokens"),
    )
    j = labels.join(toks, labels["id"] == toks["tok_id"]).select(
        "cluster", "id", "n_tokens"
    )
    return (
        j.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.max(
                F.struct(
                    F.col("n_tokens"), (-F.col("id")).alias("neg_id")
                )
            ).alias("m"),
        )
        .select(
            "cluster",
            (-F.col("m.neg_id")).alias("keep_id"),
            F.col("m.n_tokens").alias("keep_tokens"),
            "cluster_size",
        )
    )


# ------------------------------- point-in-time multi-feature assembly

@register(
    "join_pit_features",
    oracle="""
    WITH tagged AS (
      SELECT event_id, user_id, ts, event_type, value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_spine
      FROM events
      WHERE event_type IN ('purchase', 'click', 'view', 'error')
    ), f AS (
      SELECT event_id, user_id, ts, is_spine,
             last_value(CASE WHEN event_type = 'click' THEN value END
                        IGNORE NULLS) OVER w AS feat_click,
             last_value(CASE WHEN event_type = 'view' THEN value END
                        IGNORE NULLS) OVER w AS feat_view,
             last_value(CASE WHEN event_type = 'error' THEN value END
                        IGNORE NULLS) OVER w AS feat_error
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_spine, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           feat_click, feat_view, feat_error
    FROM f WHERE is_spine = 1
    """,
)
def join_pit_features(spark, sf_dir):
    """Point-in-time-correct FEATURE ASSEMBLY — the feature-store join a
    training pipeline runs to build examples without temporal leakage:
    each label event (purchase) gets the latest value of EVERY feature
    stream (click/view/error) for that user strictly as-of the label's
    timestamp.  Generalizes `join_asof_events` from one feature to k in
    a SINGLE window pass: union-tag all streams, one shuffle on user_id,
    k running last(ignorenulls) columns over the same frame — no
    per-feature scan, no range cross-product, and adding a feature adds
    a column, not a join.  Features at exactly the label ts are visible
    (<= semantics via is_spine sorting after features at equal ts);
    event_id breaks remaining ties so both engines fold identically."""
    from pyspark.sql.window import Window

    feats = ["click", "view", "error"]
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    tagged = ev.filter(
        F.col("event_type").isin(["purchase"] + feats)
    ).withColumn(
        "is_spine",
        F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_spine", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    feat_cols = {
        f"feat_{t}": F.last(
            F.when(F.col("event_type") == t, F.col("value")),
            ignorenulls=True,
        ).over(w)
        for t in feats
    }
    return (
        tagged.withColumns(feat_cols)
        .filter(F.col("is_spine") == 1)
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "purchase_ts"
            ),
            *[F.col(f"feat_{t}") for t in feats],
        )
    )


# ------------------------------------------- small-file compaction plan

_COMPACT_SYNTH_FILES = 37


@register(
    "layout_compaction_plan",
    oracle=f"""
    WITH files AS (
      SELECT doc_id % {_COMPACT_SYNTH_FILES} AS file_id,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(n_chars) AS BIGINT) AS file_bytes
      FROM documents GROUP BY 1
    ),
    target AS (SELECT CAST(sum(file_bytes) AS BIGINT) // 8 AS t FROM files),
    ordered AS (
      SELECT *, sum(file_bytes) OVER (
        ORDER BY file_bytes DESC, file_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM files
    )
    SELECT file_id, n_rows, file_bytes,
           CAST((cum - file_bytes) // (SELECT t FROM target) AS BIGINT)
             AS target_file
    FROM ordered
    """,
)
def layout_compaction_plan(spark, sf_dir):
    """The small-file COMPACTION planner (OPTIMIZE / bin-packing stage of
    lake maintenance — the missing third of the layout family next to
    z-order and partition pruning): given per-file sizes, assign source
    files to target files by size-descending contiguous coalescing
    (cumulative-size // target — the same policy AQE's partition
    coalescing applies to shuffle blocks).  File stats here are
    synthesized as doc_id%{_COMPACT_SYNTH_FILES} row groups so the oracle
    can re-derive them; the production input is the same (file_id, bytes)
    relation from a `binaryFile` listing or the lake manifest.  Scale
    shape: the plan runs over FILE METADATA (one row per file — millions
    of rows at 100 TB, not billions), so the single-partition cumulative
    window is a deliberate driver-scale step, exactly like AQE's
    coalescing decision; the data files themselves are only touched by
    the subsequent rewrite jobs, one per target_file."""
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir)["documents"]
    files = docs.groupBy(
        F.pmod(F.col("doc_id"), F.lit(_COMPACT_SYNTH_FILES)).alias(
            "file_id"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").cast("bigint").alias("file_bytes"),
    )
    target = files.agg(
        (F.sum("file_bytes").cast("bigint") / F.lit(8))
        .cast("bigint")
        .alias("t")
    )
    w = (
        Window.orderBy(F.col("file_bytes").desc(), F.col("file_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        files.withColumn("cum", F.sum("file_bytes").over(w))
        .crossJoin(F.broadcast(target))
        .select(
            "file_id",
            "n_rows",
            "file_bytes",
            F.floor(
                (F.col("cum") - F.col("file_bytes")) / F.col("t")
            ).cast("bigint").alias("target_file"),
        )
    )


# --------------------------------------- streaming SCD2 maintenance

@register(
    "streaming_scd2_maintenance",
    # The maintained history must equal the DECLARATIVE SCD2 build
    # exactly, so this query shares cdc_scd2_intervals' oracle verbatim.
    oracle="""
    WITH changes AS (
        SELECT o_orderkey, o_custkey, 'c' AS op,
               1700000000000 + o_orderkey AS ts_ms
        FROM orders
        UNION ALL
        SELECT o_orderkey, o_custkey, 'u', 1700001000000 + o_orderkey
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey, NULL, 'd', 1700002000000 + o_orderkey
        FROM orders WHERE o_orderkey % 20 = 0
    )
    SELECT o_orderkey, o_custkey, op,
           ts_ms AS valid_from,
           lead(ts_ms) OVER (
             PARTITION BY o_orderkey ORDER BY ts_ms, op) AS valid_to,
           CASE WHEN lead(ts_ms) OVER (
             PARTITION BY o_orderkey ORDER BY ts_ms, op) IS NULL
             AND op <> 'd' THEN 1 ELSE 0 END AS is_current
    FROM changes
    """,
)
def streaming_scd2_maintenance(spark, sf_dir):
    """SCD Type-2 history maintained INCREMENTALLY through Structured
    Streaming — the history-table twin of `cdc_streaming_compaction`
    (which maintains latest-state): the full c/u/d envelope feed replays
    through ``Scd2IntervalSink`` (foreachBatch, bucket-pruned interval
    rebuild) and the resulting table must equal the one-shot declarative
    `cdc_scd2_intervals` bit-for-bit.  The replay is deliberately
    HOSTILE: round-robin repartition(4) slabs interleave every key's
    changes across batches in no particular order — the sink's
    content-addressed change log (pk, ts_ms, op) makes the final history
    order-independent, which the shared oracle certifies.  ≥2 batches
    asserted in-query so a single-batch degenerate run can't pass."""
    from ..sources.cdc_sim import synthesize_mysql_events
    from ..streaming.compaction import Scd2IntervalSink
    from ..streaming.materialize import session_tmpdir
    from ..streaming.pipeline import stream_lines_from_directory

    events = synthesize_mysql_events(spark, sf_dir)
    d = session_tmpdir("cdc_scd2_stream_")
    events.select("value").repartition(4).write.mode("overwrite").text(
        f"{d}/src"
    )
    stream = stream_lines_from_directory(
        spark, f"{d}/src", max_files_per_trigger=1
    )
    sink = Scd2IntervalSink(f"{d}/state", ["o_orderkey"], num_buckets=8)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, 300)
    if len(set(sink.batch_ids)) < 2:
        raise ValueError(
            f"expected incremental SCD2 maintenance, got "
            f"{len(set(sink.batch_ids))} batches"
        )
    state = spark.read.parquet(f"{d}/state")
    return state.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.when(
            F.col("op") != "d",
            F.try_element_at("payload", F.lit("o_custkey")),
        )
        .cast("bigint")
        .alias("o_custkey"),
        "op",
        "valid_from",
        "valid_to",
        "is_current",
    )


# ----------------------------------------- bigram-LM perplexity filter

# splits the synthetic corpus roughly in half at every SF (nll spans
# ~3.26-3.83 with median ~3.39 at sf0.001/0.01/0.1) so the flag stays
# discriminating wherever the gate runs; both engines compare the same
# reconstructed double to the same literal, so the boundary is exact.
_PPL_THRESHOLD = 3.4

# Spread bigram relation per (app, corpus) — lets _spread_and_persist drop
# the narrow base cache (ADVICE r5: drop_base=False held both copies of
# the plan's largest relation for the whole session).
_BIGRAM_MEMO: dict[tuple, DataFrame] = {}


@register(
    "text_perplexity_filter",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS a
      FROM documents
    ),
    vocab AS (
      SELECT CAST(count(DISTINCT u.tok) AS BIGINT) AS v
      FROM t, unnest(a) AS u(tok)
    ),
    b AS (
      SELECT doc_id, a[s.i] AS w1, a[s.i + 1] AS w2
      FROM t, unnest(generate_series(1, len(a) - 1)) AS s(i)
      WHERE len(a) >= 2
    ),
    c12 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12 FROM b GROUP BY 1, 2
    ),
    c1 AS (
      SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM c12 GROUP BY 1
    ),
    scored AS (
      SELECT doc_id,
             CAST(round(-ln((n12 + 1.0) / (n1 + v)) * 1000000)
                  AS BIGINT) AS term_micro
      FROM b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(term_micro) / (count(*) * 1000000.0), 6) + 0 AS nll,
           CASE WHEN round(sum(term_micro) / (count(*) * 1000000.0), 6)
                     <= {_PPL_THRESHOLD} THEN 1 ELSE 0 END AS ppl_pass
    FROM scored GROUP BY doc_id
    """,
)
def text_perplexity_filter(spark, sf_dir):
    """The CCNet/KenLM-style PERPLEXITY quality filter — the scoring use
    of the bigram LM that `text_bigram_lm` only trains: every document
    gets its mean negative log-likelihood under the corpus's own add-one-
    smoothed bigram model, and a pass flag at a fixed threshold (low
    surprise ≈ fluent text; the planted garbled/outlier docs score high).
    Determinism across engines: each bigram's -ln P is rounded to a
    6-decimal MICRO-INTEGER before summing, so the per-doc aggregation is
    exact integer arithmetic — float summation order (Spark's parallel
    partial aggs vs DuckDB's single-threaded fold) cannot move the hash.
    Plan: bigram explode keeps doc_id; counts join back on (w1,w2) and
    (w1) — two shuffles on token keys with map-side combine, the same
    posting-list shape as dedup, never a broadcast of the (potentially
    huge) LM itself; the vocab size is the only broadcast-of-1-row."""
    from ..functions import text as T

    docs = load_tables(spark, sf_dir)["documents"]
    toked = docs.select("doc_id", T.tokens("text").alias("_t"))
    vocab = toked.select(
        F.explode("_t").alias("tok")
    ).agg(F.count_distinct("tok").cast("bigint").alias("v"))
    base = toked.filter(F.size("_t") >= 2)
    bi = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_t") - 1),
                lambda i: F.struct(
                    F.element_at("_t", i).alias("w1"),
                    F.element_at("_t", i + 1).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    # the bigram relation feeds BOTH the count tables and the scoring
    # join probe — persist it (partition-spread, PERF.md §18's lesson)
    # so the 100×-the-corpus explode doesn't recompute per consumer.
    # Memoized per (app, corpus) like _UNITS_MEMO so drop_base can
    # release the narrow pre-spread cache: this is the largest relation
    # in the plan and holding both copies doubles its cache footprint.
    from ..operators.dedup import _spread_and_persist
    from ..sources.tables import evict_stale_entries

    app_id = spark.sparkContext.applicationId
    evict_stale_entries(_BIGRAM_MEMO, app_id)
    memo_key = (app_id, sf_dir)
    cached = _BIGRAM_MEMO.get(memo_key)
    if cached is None:
        cached = _spread_and_persist(bi, spark, key="doc_id")
        _BIGRAM_MEMO[memo_key] = cached
    bi = cached
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    term_micro = (
        F.round(
            -F.log((F.col("n12") + F.lit(1.0)) / (F.col("n1") + F.col("v")))
            * F.lit(1_000_000.0)
        )
    ).cast("bigint")
    scored = (
        bi.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", term_micro.alias("term_micro"))
    )
    nll = F.round(
        F.sum("term_micro") / (F.count(F.lit(1)) * F.lit(1_000_000.0)), 6
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (nll + F.lit(0.0)).alias("nll"),
        F.when(nll <= F.lit(_PPL_THRESHOLD), 1)
        .otherwise(0)
        .alias("ppl_pass"),
    )
