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
from .llm_pipeline import DOCS_WITH_NEAR_DUPS_SQL, _docs_with_near_dups
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
    q.awaitTermination(300)
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
    surv{k} AS (
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
    a{k} AS (SELECT id FROM a{k - 1} UNION ALL SELECT id FROM adm{k})""")
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
    slabbed = emb.withColumn(
        "slab", F.ntile(_VND_SLABS).over(Window.orderBy("vec_id"))
    )
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
    q.awaitTermination(300)
    n_batches = len(_glob.glob(f"{d}/store/batch_id=*"))
    if n_batches < 2:
        raise ValueError(
            f"expected incremental ingest, got {n_batches} batches"
        )
    return spark.read.parquet(f"{d}/out").select("vec_id")
