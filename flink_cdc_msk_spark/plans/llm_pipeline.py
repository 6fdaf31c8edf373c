"""LLM-training-data-pipeline queries over ``documents`` / ``embeddings``
(SURVEY.md Part B north-star row): dedup families, similarity search,
text analysis.

The sf documents table contains no exact duplicates, so dedup queries plant
them deterministically inside the query (docs with doc_id % 5 == 0 get a
clone at doc_id + 1_000_000) — reproduced identically in the oracle SQL, so
the collapse behavior is actually exercised.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as T
from ..streaming.materialize import await_or_raise as _await_or_raise
from ..operators import dedup as D
from ..operators import similarity as S
from ..sources.tables import load_tables, memoized_relation
from .registry import register

CLONE_OFFSET = 1_000_000
NEAR_OFFSET = 2_000_000
NEAR_SUFFIX = " zz yy xx ww vv"

DOCS_WITH_DUPS_SQL = f"""
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {CLONE_OFFSET}, text FROM documents WHERE doc_id % 5 = 0
"""

# exact clones (%5) plus near-duplicates (%7: suffix appended → high-but-
# below-1 shingle jaccard) — both reproduced in oracle SQL
DOCS_WITH_NEAR_DUPS_SQL = f"""
      {DOCS_WITH_DUPS_SQL}
      UNION ALL
      SELECT doc_id + {NEAR_OFFSET}, text || '{NEAR_SUFFIX}'
      FROM documents WHERE doc_id % 7 = 0
"""


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir)["documents"]


def _planted_variants(
    d,
    with_near: bool,
    clone_offset: int = CLONE_OFFSET,
    near_offset: int = NEAR_OFFSET,
):
    """One-scan corpus planting: each doc emits itself plus its planted
    clone/near-dup variants from a map-side array explode — the UNION ALL
    formulation (what the oracle SQL runs) re-scans the parquet once per
    branch. Output rows are identical; the plan reads the corpus once.
    ``explode_outer`` (not explode): the inferred size>0 filter of a
    plain explode would re-inline the array construction (PERF.md §1).

    ``clone_offset``/``near_offset`` exist for MEASUREMENT corpora whose
    base doc_ids exceed the registered constants (the sfx100 decade sets
    span past 1M/2M — tools/sfx_dups_decade.py plants at 10M/20M); every
    registered query uses the defaults, which the oracle SQL mirrors."""
    self_row = F.array(F.struct(F.col("doc_id"), F.col("text")))
    empty = F.array().cast("array<struct<doc_id:bigint,text:string>>")
    clone = F.when(
        F.col("doc_id") % 5 == 0,
        F.array(
            F.struct(
                (F.col("doc_id") + clone_offset).alias("doc_id"),
                F.col("text"),
            )
        ),
    ).otherwise(empty)
    parts = [self_row, clone]
    if with_near:
        parts.append(
            F.when(
                F.col("doc_id") % 7 == 0,
                F.array(
                    F.struct(
                        (F.col("doc_id") + near_offset).alias("doc_id"),
                        F.concat(F.col("text"), F.lit(NEAR_SUFFIX)).alias(
                            "text"
                        ),
                    )
                ),
            ).otherwise(empty)
        )
    return (
        d.select(F.explode_outer(F.concat(*parts)).alias("v"))
        .select("v.doc_id", "v.text")
    )


def _docs_with_dups(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return _planted_variants(d, with_near=False)


def _docs_with_near_dups(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return _planted_variants(d, with_near=True)


def _emb(spark, sf_dir):
    return load_tables(spark, sf_dir)["embeddings"]


# ------------------------------------------------------------------ dedup


@register(
    "dedup_exact",
    oracle=f"""
    SELECT text, min(doc_id) AS keep_id, count(*) AS dup_count
    FROM ({DOCS_WITH_DUPS_SQL})
    GROUP BY text
    """,
)
def dedup_exact(spark, sf_dir):
    return D.exact_dedup(_docs_with_dups(spark, sf_dir))


@register(
    "dedup_exact_fingerprint",
    oracle=f"""
    SELECT md5(text) AS fp,
           {T.rolling_fingerprint_sql('text')} AS roll_fp,
           min(doc_id) AS keep_id,
           count(*) AS dup_count
    FROM ({DOCS_WITH_DUPS_SQL})
    GROUP BY text
    """,
)
def dedup_exact_fingerprint(spark, sf_dir):
    """Fingerprint-based exact dedup: md5 + polynomial rolling hash —
    grouping on a fixed-width key instead of the full text (what you do at
    100 TB so the shuffle carries 16-byte keys, not documents)."""
    d = _docs_with_dups(spark, sf_dir)
    return (
        d.withColumns(
            {
                "fp": F.md5(F.col("text").cast("binary")),
                "roll_fp": T.rolling_fingerprint("text"),
            }
        )
        .groupBy("fp", "roll_fp")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("fp", "roll_fp", "keep_id", "dup_count")
    )


@register(
    "dedup_token_jaccard",
    oracle=f"""
    WITH docs AS (
      {DOCS_WITH_NEAR_DUPS_SQL}
    ), arrs AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS a
      FROM docs
    ), sh AS (
      SELECT doc_id AS id, s.sh AS token
      FROM arrs, unnest(list_distinct(list_transform(
        generate_series(1, len(a) - 2),
        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2]))) AS s(sh)
    ), sizes AS (
      SELECT id, count(*) AS sz FROM sh GROUP BY id
    ), inter AS (
      SELECT a.id AS id1, b.id AS id2, count(*) AS inter
      FROM sh a JOIN sh b ON a.token = b.token AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id1, id2,
           round(inter / (s1.sz + s2.sz - inter), 6) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.id = id1
    JOIN sizes s2 ON s2.id = id2
    WHERE round(inter / (s1.sz + s2.sz - inter), 6) >= 0.8
    """,
)
def dedup_token_jaccard(spark, sf_dir):
    """Exact shingle-set (word 3-gram) Jaccard near-dup pairs via
    inverted-index self-join — the oracle-checkable exact baseline for
    MinHash. Shingles (not unigrams) keep posting lists short on
    shared-vocabulary corpora, so the join stays near-linear."""
    return D.jaccard_pairs(
        _docs_with_near_dups(spark, sf_dir), threshold=0.8, ngram=3
    )


# shared CTE body: exact 3-gram jaccard pairs >= 0.8 over the near-dup
# corpus (also the dedup_token_jaccard oracle's shape)
_JACCARD_CTES = f"""
    docs AS (
      {DOCS_WITH_NEAR_DUPS_SQL}
    ), arrs AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS a
      FROM docs
    ), sh AS (
      SELECT doc_id AS id, s.sh AS token
      FROM arrs, unnest(list_distinct(list_transform(
        generate_series(1, len(a) - 2),
        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2]))) AS s(sh)
    ), sizes AS (
      SELECT id, count(*) AS sz FROM sh GROUP BY id
    ), inter AS (
      SELECT a.id AS id1, b.id AS id2, count(*) AS inter
      FROM sh a JOIN sh b ON a.token = b.token AND a.id < b.id
      GROUP BY a.id, b.id
    ), pairs AS (
      SELECT id1, id2
      FROM inter
      JOIN sizes s1 ON s1.id = id1
      JOIN sizes s2 ON s2.id = id2
      WHERE round(inter / (s1.sz + s2.sz - inter), 6) >= 0.8
    )
"""


def _cc_oracle(iters: int) -> str:
    steps = ["l0 AS (SELECT doc_id AS id, doc_id AS lbl FROM docs)"]
    for k in range(1, iters + 1):
        steps.append(f"""l{k} AS (
          SELECT l.id, least(l.lbl, coalesce(min(nl.lbl), l.lbl)) AS lbl
          FROM l{k - 1} l
          LEFT JOIN edges e ON e.src = l.id
          LEFT JOIN l{k - 1} nl ON nl.id = e.dst
          GROUP BY l.id, l.lbl)""")
    return f"""
    WITH {_JACCARD_CTES},
    edges AS (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION ALL
      SELECT id2, id1 FROM pairs
    ),
    {", ".join(steps)}
    SELECT id AS doc_id, lbl AS cluster FROM l{iters}
    """


@register("dedup_connected_components", oracle=_cc_oracle(iters=4))
def dedup_connected_components(spark, sf_dir):
    """Cluster resolution after pairwise near-dup detection: connected
    components over the jaccard>=0.8 pair graph via 4 rounds of
    min-label propagation — every doc gets its component's minimum
    doc_id as cluster label (keep-one-per-cluster follows as a trivial
    groupBy). Both engines run the IDENTICAL bounded iteration, which is
    what lets an iterative graph algorithm be hash-checked at all; 4
    rounds is exact here (clone/near-dup chains have diameter <= 3)."""
    corpus = _docs_with_near_dups(spark, sf_dir)
    pairs = D.jaccard_pairs(corpus, threshold=0.8, ngram=3)
    labels = D.connected_components(
        corpus.select("doc_id"),
        pairs.select("id1", "id2"),
        iters=4,
        id_col="doc_id",
    )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("cluster").alias("cluster")
    )


@register(
    "dedup_containment",
    oracle=f"""
    WITH docs AS (
      {DOCS_WITH_NEAR_DUPS_SQL}
    ), arrs AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS a
      FROM docs
    ), sh AS (
      SELECT doc_id AS id, s.sh AS token
      FROM arrs, unnest(list_distinct(list_transform(
        generate_series(1, len(a) - 2),
        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2]))) AS s(sh)
    ), sizes AS (
      SELECT id, count(*) AS sz FROM sh GROUP BY id
    ), inter AS (
      SELECT a.id AS id1, b.id AS id2, count(*) AS inter
      FROM sh a JOIN sh b ON a.token = b.token AND a.id < b.id
      GROUP BY a.id, b.id
    )
    SELECT id1, id2,
           round(inter / least(s1.sz, s2.sz), 6) AS containment
    FROM inter
    JOIN sizes s1 ON s1.id = id1
    JOIN sizes s2 ON s2.id = id2
    WHERE round(inter / least(s1.sz, s2.sz), 6) >= 0.9
    """,
)
def dedup_containment(spark, sf_dir):
    """Max-containment near-dup pairs (|A∩B| / min set size >= 0.9) over
    the near-dup corpus: catches subset duplication — the planted
    suffix-extended docs contain their originals completely (containment
    1.0) even where Jaccard dips below its threshold."""
    return D.containment_pairs(
        _docs_with_near_dups(spark, sf_dir), threshold=0.9, ngram=3
    )


@register(
    "dedup_minhash_lsh",
    # Oracle = the EXACT jaccard>=0.8 pair set (dedup_token_jaccard's
    # oracle shape).  The LSH output is the exact-verified subset of its
    # banding candidates, so Spark==oracle holds iff banding recall is
    # 1.0 on this corpus — which the hash match then PROVES each round
    # (the seeds are pinned, so the candidate set is deterministic; the
    # paired recall-gate query asserts the same bound in-query).
    oracle=f"""
    WITH {_JACCARD_CTES}
    SELECT id1, id2,
           round(inter / (s1.sz + s2.sz - inter), 6) AS jaccard
    FROM inter
    JOIN sizes s1 ON s1.id = id1
    JOIN sizes s2 ON s2.id = id2
    WHERE round(inter / (s1.sz + s2.sz - inter), 6) >= 0.8
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(32) + 8-band LSH candidates over 3-gram shingles, exact-
    Jaccard verified at 0.8 — candidate generation is linear in corpus
    size. Oracle-checked against the exact pair set: a green driver row
    is a banding-recall=1.0 certificate at this scale factor."""
    return D.minhash_lsh_pairs(
        _docs_with_near_dups(spark, sf_dir),
        threshold=0.8,
        num_hashes=32,
        bands=8,
        ngram=3,
    )


@register(
    "dedup_simhash",
    # Full oracle: the fingerprint itself is reproduced in DuckDB — the
    # token hash is the engine-portable md5-hexparse 60-bit hash
    # (functions/text.md5_hash60), so both engines compute bit-identical
    # SimHash fingerprints and therefore the identical hamming<=3 pair
    # set (the oracle verifies ALL pairs; Spark's banded candidate
    # generation is exact by pigeonhole, so the sets must agree).
    oracle=f"""
    WITH docs AS (
      {DOCS_WITH_DUPS_SQL}
    ), tok AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(lower(text), ' '),
                                       x -> x <> '')) AS toks
      FROM docs
    ), th AS (
      SELECT doc_id,
             list_transform(toks, s -> {T.md5_hash60_sql('s')}) AS th
      FROM tok WHERE len(toks) >= 1
    ), fp AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(generate_series(0, 59), b ->
               CASE WHEN list_sum(list_transform(th, h ->
                      CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                    THEN CAST(1 AS BIGINT) << b ELSE 0 END))
               AS BIGINT) AS simhash
      FROM th
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash(spark, sf_dir):
    """SimHash banded hamming pairs (distance <= 3) over docs + planted
    clones (clones land at distance 0). Uses the engine-portable 60-bit
    md5 token hash so the ENTIRE fingerprint — not just plumbing — is
    hash-checked against DuckDB; the xxhash64 fast path stays the
    production default in the operator."""
    return D.simhash_pairs(
        _docs_with_dups(spark, sf_dir),
        max_hamming=3,
        token_hash=T.md5_hash60,
        n_bits=60,
    )


# ------------------------------------------------------- similarity search


@register(
    "embedding_cosine_topk",
    oracle="""
    SELECT query_id, vec_id, cos, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round(list_cosine_similarity(q.embedding::DOUBLE[],
                                          c.embedding::DOUBLE[]), 6) + 0
               AS cos,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                               c.embedding::DOUBLE[]) DESC,
                        c.vec_id) AS BIGINT) AS rank
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 10)
    WHERE rank <= 5
    """,
)
def embedding_cosine_topk(spark, sf_dir):
    """Exact cosine top-5 for 10 query vectors — brute-force baseline
    (broadcast queries, corpus streams)."""
    emb = _emb(spark, sf_dir)
    return S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5
    )


@register(
    "embedding_near_dup",
    oracle="""
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           round(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 6) >= 0.3
    """,
)
def embedding_near_dup(spark, sf_dir):
    """All pairs with cosine >= 0.3 (exact O(n²) baseline; LSH variant
    below is the scale path)."""
    return S.near_dup_pairs(_emb(spark, sf_dir), threshold=0.3)


@register(
    "embedding_near_dup_lsh",
    oracle="""
    WITH w AS (
      SELECT tt.t, pp.p,
             list(CASE WHEN CAST(concat('0x',
                    substr(md5('42_' || tt.t || '_' || pp.p || '_' || d.i),
                           1, 8)) AS BIGINT) % 2 = 0
                  THEN 1.0 ELSE -1.0 END ORDER BY d.i) AS wv
      FROM (SELECT unnest(generate_series(0, 7)) AS t) tt,
           (SELECT unnest(generate_series(0, 3)) AS p) pp,
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
      JOIN buckets b
        ON a.t = b.t AND a.bucket = b.bucket AND a.id < b.id
    ),
    scored AS (
      SELECT id1, id2,
             round(
               list_reduce(list_transform(generate_series(1, 64),
                                          i -> x.v[i] * y.v[i]),
                           (a, b) -> a + b)
               / (sqrt(list_reduce(list_transform(generate_series(1, 64),
                                                  i -> x.v[i] * x.v[i]),
                                   (a, b) -> a + b))
                  * sqrt(list_reduce(list_transform(generate_series(1, 64),
                                                    i -> y.v[i] * y.v[i]),
                                     (a, b) -> a + b))), 6) AS cos
      FROM cands JOIN vecs x ON x.id = id1 JOIN vecs y ON y.id = id2
    )
    SELECT id1, id2, cos FROM scored WHERE cos >= 0.3
    """,
)
def embedding_near_dup_lsh(spark, sf_dir):
    """Random-hyperplane LSH near-dup pairs, 8 OR-amplified tables of 4
    planes — run in the PORTABLE form: md5-parity hyperplane literals
    and sequential-fold projections/cosines, which DuckDB re-derives
    from first principles (weights CTE → sign buckets → bucket join →
    fold-cosine verify). A green row hash-checks the ENTIRE approximate
    pipeline — bucketing included — not just the verified survivors.
    The recall gate twin still quantifies quality vs the exact query."""
    return S.lsh_near_dup_pairs(
        _emb(spark, sf_dir), threshold=0.3, n_planes=4, n_tables=8,
        portable_dims=64,
    )


@register(
    "embedding_ann_ivf",
    oracle="""
    WITH elems AS (
      SELECT vec_id AS id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings,
           unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    vecs AS (
      SELECT vec_id AS id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    cent0 AS (
      SELECT CAST(id AS INTEGER) AS cl, pos, val AS cval
      FROM elems WHERE id < 16
    ),
    dist1 AS (
      SELECT e.id, c.cl,
             sum(CAST((e.val - c.cval) * (e.val - c.cval)
                 AS DECIMAL(28,14))) AS dist
      FROM elems e JOIN cent0 c USING (pos)
      GROUP BY e.id, c.cl
    ),
    asg1 AS (
      SELECT id, cl FROM (
        SELECT id, cl,
               row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn
        FROM dist1
      ) WHERE rn = 1
    ),
    cent1 AS (
      SELECT a.cl, e.pos,
             CAST(sum(CAST(e.val AS DECIMAL(24,12))) AS DOUBLE) / count(*)
               AS cval
      FROM elems e JOIN asg1 a USING (id)
      GROUP BY a.cl, e.pos
    ),
    dist2 AS (
      SELECT e.id, c.cl,
             sum(CAST((e.val - c.cval) * (e.val - c.cval)
                 AS DECIMAL(28,14))) AS dist
      FROM elems e JOIN cent1 c USING (pos)
      GROUP BY e.id, c.cl
    ),
    cells AS (
      SELECT id AS vec_id, cl FROM (
        SELECT id, cl,
               row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn
        FROM dist2
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT id AS query_id, cl FROM (
        SELECT id, cl,
               row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn
        FROM dist2 WHERE id < 10
      ) WHERE rn <= 4
    ),
    scored AS (
      SELECT p.query_id, c.vec_id,
             round(
               list_reduce(list_transform(generate_series(1, 64),
                                          i -> x.v[i] * y.v[i]),
                           (a, b) -> a + b)
               / (sqrt(list_reduce(list_transform(generate_series(1, 64),
                                                  i -> x.v[i] * x.v[i]),
                                   (a, b) -> a + b))
                  * sqrt(list_reduce(list_transform(generate_series(1, 64),
                                                    i -> y.v[i] * y.v[i]),
                                     (a, b) -> a + b))), 6) AS cos
      FROM probes p
      JOIN cells c USING (cl)
      JOIN vecs x ON x.id = p.query_id
      JOIN vecs y ON y.id = c.vec_id
      WHERE c.vec_id <> p.query_id
    )
    SELECT query_id, vec_id, cos, rank FROM (
      SELECT query_id, vec_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def embedding_ann_ivf(spark, sf_dir):
    """IVF-style ANN top-k (nprobe=4 of 16 clusters), run in the
    fully-reproducible form (operators/clustering.py): DECIMAL-exact
    Lloyd centroids, exact probe selection, fold-cosine in-cell ranking
    with deterministic tie-breaks — so the APPROXIMATE result, missed
    neighbors and all, is hash-checked against a DuckDB oracle that
    re-derives the whole index from first principles. Recall vs the
    exact query stays measured by `embedding_ann_recall_gate`."""
    from ..operators.clustering import ivf_topk_exact_repro

    emb = _emb(spark, sf_dir)
    return ivf_topk_exact_repro(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_centroids=16, nprobe=4
    )


# ------------------------------------------------------------ text analysis


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split(lower(text), ' '),
                                t -> t <> '')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(list_filter(string_split(lower(text), ' '),
                                t -> t <> ''))) AS BIGINT) AS n_distinct,
           CAST(length(text) AS BIGINT) AS n_chars_computed,
           n_chars
    FROM documents
    """,
)
def text_token_stats(spark, sf_dir):
    # tokenize ONCE into an attribute (r12): the inline form re-ran the
    # split+filter at both references inside one interpreted Project
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", "n_chars", "text", T.tokens("text").alias("_toks")
    ).select(
        "doc_id",
        F.size("_toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("_toks")).cast("bigint").alias(
            "n_distinct"
        ),
        F.length("text").cast("bigint").alias("n_chars_computed"),
        "n_chars",
    )


@register(
    "text_quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                 / length(text), 6) AS punct_ratio,
           round(len(list_filter(toks, x -> list_contains(
                 ['the','a','and','of','to','in','is'], x)))
                 / len(toks), 6) AS stopword_ratio,
           round(list_sum(list_transform(toks, x -> length(x)))
                 / len(toks), 4) AS avg_token_len,
           CASE WHEN len(toks) BETWEEN 10 AND 1000
                 AND len(list_distinct(toks)) / len(toks) > 0.3
                THEN 1 ELSE 0 END AS quality_pass
    FROM t
    """,
)
def text_quality_score(spark, sf_dir):
    """Heuristic quality scoring: punctuation ratio, stopword ratio, mean
    token length, and a pass/fail gate (length band + lexical diversity) —
    the standard pre-training corpus filters, all as codegen'd array
    expressions.

    r12 (guide §4.1/§1.2 per-task work): the token array is MATERIALIZED
    in its own projection and every ratio reads the attribute — the old
    single-projection form inlined ``T.tokens("text")`` at each of its
    ~8 references, and this Project is interpreted (higher-order
    lambdas), so Spark's subexpression elimination (codegen-only) never
    deduped them: split+lower+filter ran ~8× per document.
    CollapseProject keeps the boundary because ``_toks`` is non-cheap
    and multiply-referenced (the ``_unit_sets`` trick). Same
    expressions over the same array — bit-identical output."""
    d = _docs(spark, sf_dir)
    toks = F.col("_toks")
    wl = F.array(*[F.lit(w) for w in T.STOPWORDS["en"]])
    stop_hits = F.size(
        F.filter(toks, lambda t: F.array_contains(wl, t))
    ).cast("bigint")
    avg_len = F.round(
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        )
        / F.size(toks),
        4,
    )
    diversity = F.size(F.array_distinct(toks)) / F.size(toks)
    return d.select(
        "doc_id", "text", T.tokens("text").alias("_toks")
    ).select(
        "doc_id",
        T.punct_ratio("text").alias("punct_ratio"),
        F.round(stop_hits / F.size(toks), 6).alias("stopword_ratio"),
        avg_len.alias("avg_token_len"),
        F.when(
            F.size(toks).between(10, 1000) & (diversity > 0.3), 1
        ).otherwise(0).alias("quality_pass"),
    )


@register(
    "text_lang_id",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
        CAST(len(list_filter(toks, x -> list_contains(['the','a','and','of','to','in','is'], x))) AS BIGINT) AS s_en,
        CAST(len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','von'], x))) AS BIGINT) AS s_de,
        CAST(len(list_filter(toks, x -> list_contains(['le','la','les','et','est','de'], x))) AS BIGINT) AS s_fr,
        CAST(len(list_filter(toks, x -> list_contains(['el','la','los','y','es','de'], x))) AS BIGINT) AS s_es
      FROM t
    )
    SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
           CASE
             WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
             WHEN s_fr >= s_es THEN 'fr'
             ELSE 'es'
           END AS guessed
    FROM scored
    """,
)
def text_lang_id(spark, sf_dir):
    """Stopword-profile language guesser (n-gram-heuristic family).
    Deterministic argmax with fixed precedence en>de>fr>es on ties.

    r12 staging (guide §1.2 per-task work): tokenize once, then
    materialize each language's hit COUNT once, then compare longs.
    The old single projection inlined the tokenizer at every reference
    — 16 tokenize+filter evaluations per row (4 langs × up to 4
    references each, no CSE outside codegen); now 1 tokenize + 4
    filters + long compares. Identical expressions per value —
    bit-identical output."""
    d = _docs(spark, sf_dir)

    def hits(words):
        wl = F.array(*[F.lit(w) for w in words])
        return F.size(
            F.filter("_toks", lambda t: F.array_contains(wl, t))
        ).cast("bigint")

    scored = d.select(
        "doc_id", "lang", T.tokens("text").alias("_toks")
    ).select(
        "doc_id",
        "lang",
        *[
            hits(words).alias(f"s_{lang}")
            for lang, words in T.STOPWORDS.items()
        ],
    )
    s_en, s_de, s_fr, s_es = (
        F.col("s_en"), F.col("s_de"), F.col("s_fr"), F.col("s_es"),
    )
    guessed = (
        F.when((s_en >= s_de) & (s_en >= s_fr) & (s_en >= s_es), "en")
        .when((s_de >= s_fr) & (s_de >= s_es), "de")
        .when(s_fr >= s_es, "fr")
        .otherwise("es")
    )
    return scored.select(
        "doc_id",
        "lang",
        "s_en",
        "s_de",
        "s_fr",
        "s_es",
        guessed.alias("guessed"),
    )


@register(
    "multimodal_binary_stats",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS payload_md5,
           CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
           END AS kind
    FROM documents
    """,
)
def multimodal_binary_stats(spark, sf_dir):
    """Binary-column plumbing check: synthesize a media table (payload =
    utf-8 bytes), compute stats on the binary column JVM-side. The codec
    stage itself is stubbed (operators/multimodal.py) — this verifies the
    schema/bytes path end-to-end."""
    from ..operators.multimodal import synthesize_media

    media = synthesize_media(_docs(spark, sf_dir))
    return media.select(
        "media_id",
        F.length("payload").cast("bigint").alias("byte_len"),
        F.md5("payload").alias("payload_md5"),
        "kind",
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
           END AS kind,
           CAST(s.i AS INTEGER) AS frame_no,
           substring(text, CAST(s.i * 256 + 1 AS BIGINT), 16) AS frame
    FROM documents,
         unnest(generate_series(0,
           greatest(CAST(floor(octet_length(encode(text)) / 256.0) AS INTEGER),
                    1) - 1)) AS s(i)
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing under the oracle gate: slice fixed windows
    out of each media payload every 256 bytes (operators/multimodal.py,
    pure Catalyst, exploded map-side — the video-frame-extraction shape
    with the codec stubbed). The payload is utf-8 text here, so the
    stride counts BYTES (payload length) while the window slices
    CHARACTERS (string substring) — the oracle mirrors exactly that
    hybrid, which keeps parity exact on multibyte (zh) docs too."""
    from ..operators.multimodal import frame_sample, synthesize_media

    media = synthesize_media(_docs(spark, sf_dir))
    return frame_sample(media, every_n_bytes=256, frame_len=16)


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           {T.rolling_fingerprint_sql('text')} AS fingerprint,
           {T.rolling_fingerprint_sql("substring(text, 1, 64)")} AS prefix_fp
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprinting via polynomial rolling hash (whole doc +
    64-char prefix) — exact-match dedup keys cheap enough to compute
    everywhere."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        T.rolling_fingerprint("text").alias("fingerprint"),
        T.rolling_fingerprint(F.substring("text", 1, 64)).alias("prefix_fp"),
    )


@register(
    "llm_prep_pipeline",
    oracle=f"""
    WITH corpus AS (
      {DOCS_WITH_DUPS_SQL}
    ), t AS (
      SELECT doc_id, text,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM corpus
    ), q AS (
      SELECT doc_id, text, len(toks) AS token_count
      FROM t
      WHERE len(toks) BETWEEN 10 AND 1000
        AND len(list_distinct(toks)) / len(toks) > 0.3
    ), d AS (
      SELECT text, min(doc_id) AS keep_id, count(*) AS n_copies
      FROM q GROUP BY text
    )
    SELECT d.keep_id AS doc_id,
           q.token_count,
           d.n_copies,
           round((length(q.text) - length(regexp_replace(q.text,
                 '[.,!?;:]', '', 'g'))) / length(q.text), 6) AS punct_ratio
    FROM d JOIN q ON q.doc_id = d.keep_id
    """,
)
def llm_prep_pipeline(spark, sf_dir):
    """End-to-end training-data prep as ONE composed plan: corpus (with
    planted clones) → quality gate (length band + lexical diversity) →
    exact dedup keeping the lowest doc_id → per-kept-doc stats. The whole
    pipeline is two shuffles (dedup groupBy + the keep-id join); every
    filter runs before the first shuffle, so at 100 TB the expensive
    stages see only surviving documents."""
    corpus = _docs_with_dups(spark, sf_dir)
    toks = T.tokens("text")
    q = corpus.select(
        "doc_id", "text", F.size(toks).alias("token_count")
    ).filter(
        F.size(toks).between(10, 1000)
        & (F.size(F.array_distinct(toks)) / F.size(toks) > 0.3)
    )
    d = q.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return (
        d.alias("d")
        .join(q.alias("q"), F.col("d.keep_id") == F.col("q.doc_id"))
        .select(
            F.col("d.keep_id").alias("doc_id"),
            F.col("q.token_count").alias("token_count"),
            F.col("d.n_copies").alias("n_copies"),
            T.punct_ratio(F.col("q.text")).alias("punct_ratio"),
        )
    )


@register(
    "scalar_array_funcs",
    oracle="""
    -- `+ 0` after every round: normalizes IEEE negative zero (DuckDB's
    -- round yields -0.0 where Spark yields 0.0 — numerically equal,
    -- hash/repr-different)
    SELECT vec_id,
           len(embedding) AS dim,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))), 4) + 0 AS vec_sum,
           round(list_max(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))), 4) + 0 AS vec_max,
           round(CAST(embedding[1] AS DOUBLE), 4) + 0 AS first_dim,
           round(list_sum(list_transform(embedding[1:8],
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) + 0
             AS head_energy
    FROM embeddings
    """,
)
def scalar_array_funcs(spark, sf_dir):
    """Array/vector scalar-function coverage over the embeddings table:
    size, element-wise aggregate (sum/max via higher-order functions),
    indexing, slice + map-reduce. All codegen-eligible JVM expressions —
    the building blocks the similarity operators compose."""
    from ..operators.similarity import as_double

    emb = load_tables(spark, sf_dir)["embeddings"]
    v = as_double("embedding")
    z = F.lit(0.0)  # + 0.0 normalizes -0.0 (see oracle note)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        (F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x), 4) + z)
        .alias("vec_sum"),
        (F.round(F.array_max(v), 4) + z).alias("vec_max"),
        (F.round(F.element_at(v, 1), 4) + z).alias("first_dim"),
        (
            F.round(
                F.aggregate(
                    F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x * x
                ),
                4,
            )
            + z
        ).alias("head_energy"),
    )


@register(
    "text_top_terms",
    oracle="""
    WITH toks AS (
      SELECT t.tok FROM documents,
        unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
        AS t(tok)
    )
    SELECT tok, count(*) AS n
    FROM toks GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
)
def text_top_terms(spark, sf_dir):
    """Corpus vocabulary head: explode tokens → count → global top-20
    (deterministic tie-break on the token). The orderBy+limit compiles to
    TakeOrderedAndProject — per-partition top-k then a single-driver merge
    of k·partitions rows, never a full global sort."""
    d = _docs(spark, sf_dir)
    return (
        d.select(F.explode_outer(T.tokens("text")).alias("tok"))
        .filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(20)
    )


@register(
    "text_bigram_lm",
    oracle="""
    WITH t AS (
      SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS a
      FROM documents
    ), b AS (
      SELECT a[s.i] AS w1, a[s.i + 1] AS w2
      FROM t, unnest(generate_series(1, len(a) - 1)) AS s(i)
      WHERE len(a) >= 2
    ), c12 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12
      FROM b GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM c12 GROUP BY w1
    )
    SELECT c12.w1, c12.w2, n12, round(n12 / c1.n1, 6) + 0 AS cond_p
    FROM c12 JOIN c1 USING (w1)
    ORDER BY n12 DESC, w1, w2
    LIMIT 20
    """,
)
def text_bigram_lm(spark, sf_dir):
    """Corpus bigram statistics with conditional probability
    P(w2|w1) = n(w1 w2)/n(w1 ·) — the n-gram LM / transition-table stage
    (also what contamination and repetition heuristics build on). Top-20
    by raw count with full (n, w1, w2) tie-break so the cut is
    deterministic; counts are integers and the probability an exact
    rational division, so the hash is engine-independent. Plan: bigram
    explode → (w1,w2) count (one shuffle, map-side combine) → context
    totals derived FROM the bigram counts (second tiny shuffle) →
    TakeOrderedAndProject — never a global sort."""
    d = _docs(spark, sf_dir)
    base = d.select(T.tokens("text").alias("_t")).filter(F.size("_t") >= 2)
    k = F.size("_t") - 1
    pairs = base.select(
        F.explode_outer(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.struct(
                    F.element_at("_t", i).alias("w1"),
                    F.element_at("_t", i + 1).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c12 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    return (
        c12.join(c1, "w1")
        .select(
            "w1",
            "w2",
            "n12",
            (F.round(F.col("n12") / F.col("n1"), 6) + F.lit(0.0)).alias(
                "cond_p"
            ),
        )
        .orderBy(F.desc("n12"), "w1", "w2")
        .limit(20)
    )


@register(
    "embedding_centroid_per_label",
    oracle="""
    WITH e AS (
      SELECT label, s.i AS pos, CAST(embedding[s.i] AS DOUBLE) AS x
      FROM embeddings,
           unnest(generate_series(1, len(embedding))) AS s(i)
    ), m AS (
      SELECT label, pos,
             CAST(round(avg(x) * 1000000) AS BIGINT) AS mx
      FROM e GROUP BY label, pos
    )
    SELECT label,
           (SELECT CAST(count(*) AS BIGINT) FROM embeddings v
            WHERE v.label = m.label) AS n_vecs,
           array_to_string(list(mx ORDER BY pos), ',') AS centroid
    FROM m
    GROUP BY label
    """,
)
def embedding_centroid_per_label(spark, sf_dir):
    """Per-label mean vector (class centroids — the building block for
    nearest-centroid classification and cluster summaries):
    posexplode → (label, dim) partial-aggregating avg → re-assemble the
    vector ordered by dimension. One shuffle of n·d (label, dim) rows
    with map-side combine — the centroid never exists as unsplittable
    state, so the same plan holds at any corpus size.

    The centroid is rendered as a comma-joined string of micro-unit
    (×1e6, rounded) integers: integers format identically across engines,
    so the driver's value hash is exact where raw float formatting (and
    its array canonicalization) is not."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    from ..operators.similarity import as_double

    e = emb.select(
        "label", F.posexplode(as_double("embedding")).alias("pos", "x")
    )
    m = e.groupBy("label", "pos").agg(
        F.round(F.avg("x") * 1000000).cast("bigint").alias("mx"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        m.groupBy("label")
        .agg(
            F.max("cnt").alias("n_vecs"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mx"))),
                    lambda s: s.getField("mx").cast("string"),
                ),
                ",",
            ).alias("centroid"),
        )
        .select("label", "n_vecs", "centroid")
    )


_TFIDF_TF_MEMO: dict[tuple, object] = {}


@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents
    ), tok AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, u.tok AS term
      FROM t, unnest(toks) AS u(tok)
      WHERE len(toks) >= 1
    ), tf AS (
      SELECT doc_id, n_tokens, term, CAST(count(*) AS BIGINT) AS tfc
      FROM tok GROUP BY doc_id, n_tokens, term
    ), dfreq AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             (tf.tfc / tf.n_tokens) * (n.n_docs / dfreq.df) AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, round(score, 6) + 0 AS tfidf,
           CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term) AS rn
      FROM scored)
    WHERE rn <= 5
    """,
)
def text_tfidf_top_terms(spark, sf_dir):
    """Per-doc top-5 terms by TF-IDF — the keyword-extraction /
    relevance-weighting stage. IDF is the exact rational ``N/df`` rather
    than ``ln(N/df)``: log ordering is monotone-identical per term, but
    libm ``ln`` is not bit-reproducible across engines while IEEE
    division/multiplication is — which is what makes the rank boundary
    (and so the oracle hash) deterministic.

    Plan: one corpus scan → (doc, term) counts (one shuffle) → document
    frequency by term (second shuffle, the vocabulary aggregate) →
    term-keyed join back + corpus-count broadcast (a 1-row aggregate
    cross-joined, never a driver action) → per-doc top-5 window. At
    100 TB the vocabulary join is the natural shuffle-heavy stage; df
    pruning (drop df=1 hapaxes) bounds it when needed.

    The tf relation feeds TWO consumers (document frequency, the score
    join), so it is materialized once behind a session memo (columnar
    persist — the round-10 memo pattern) instead of re-running the
    tokenize + explode + count shuffle per consumer: sfx100 warm
    58.5 → 18.6 s (PERF §39 addendum 4)."""
    d = _docs(spark, sf_dir)

    def _tf_rel():
        base = d.select("doc_id", T.tokens("text").alias("_t")).filter(
            F.size("_t") >= 1
        )
        tok = base.select(
            "doc_id",
            F.size("_t").cast("bigint").alias("n_tokens"),
            F.explode_outer("_t").alias("term"),
        ).filter(F.col("term").isNotNull())
        return tok.groupBy("doc_id", "n_tokens", "term").agg(
            F.count(F.lit(1)).alias("tfc")
        )

    tf = memoized_relation(
        _TFIDF_TF_MEMO, spark, ("tfidf_tf", sf_dir), _tf_rel
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("tfc") / F.col("n_tokens"))
            * (F.col("n_docs") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select(
            "doc_id",
            "term",
            (F.round("score", 6) + F.lit(0.0)).alias("tfidf"),
            F.col("rn").cast("bigint").alias("rank"),
        )
    )


@register(
    "embedding_quantize",
    oracle="""
    SELECT vec_id,
           round(list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))), 6) + 0 AS scale_max,
           array_to_string(
             list_transform(embedding, x -> CAST(round(
                 CAST(x AS DOUBLE) * 127 / nullif(list_max(list_transform(
                     embedding, y -> abs(CAST(y AS DOUBLE)))), 0)
             ) AS BIGINT)), ',') AS q8
    FROM embeddings
    """,
)
def embedding_quantize(spark, sf_dir):
    """Symmetric int8 quantization (per-vector absmax scaling) — the
    storage/bandwidth stage of an embedding pipeline. Map-only; the scale
    rides along so dequantization is lossless up to rounding. The absmax
    is materialized in its own projection (HOF-inlining trap otherwise).
    The int8 codes are emitted as a comma-joined string: integer text is
    engine-stable, so the driver's canonicalizer/hash handles it where a
    raw array column would not."""
    from ..operators.similarity import as_double

    emb = load_tables(spark, sf_dir)["embeddings"]
    base = emb.select(
        "vec_id",
        as_double("embedding").alias("_v"),
    ).select(
        "vec_id",
        "_v",
        F.array_max(F.transform("_v", lambda x: F.abs(x))).alias("_m"),
    )
    return base.select(
        "vec_id",
        (F.round(F.col("_m"), 6) + F.lit(0.0)).alias("scale_max"),
        F.array_join(
            F.transform(
                "_v",
                lambda x: F.round(
                    x * 127 / F.nullif(F.col("_m"), F.lit(0.0))
                )
                .cast("bigint")
                .cast("string"),
            ),
            ",",
        ).alias("q8"),
    )


@register(
    "text_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS a
      FROM documents
    ), b AS (
      SELECT doc_id,
             list_transform(generate_series(1, len(a) - 1),
                            i -> a[i] || ' ' || a[i+1]) AS bg
      FROM t
      WHERE len(a) >= 2
    )
    SELECT doc_id,
           CAST(len(bg) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(bg)) AS BIGINT) AS distinct_bigrams,
           round(1.0 - len(list_distinct(bg)) / len(bg), 6) + 0
             AS repetition_ratio
    FROM b
    """,
)
def text_repetition(spark, sf_dir):
    """Repetition scoring — the boilerplate/spam filter every pre-training
    pipeline runs: fraction of repeated word bigrams per doc
    (1 - distinct/total). Map-only codegen'd array expressions; the
    integer counts make the oracle hash exact, the ratio is a derived
    display column."""
    d = _docs(spark, sf_dir)
    base = d.select("doc_id", T.tokens("text").alias("_t")).filter(
        F.size("_t") >= 2
    )
    k = F.size("_t") - 1
    bg = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(
            " ", F.element_at("_t", i), F.element_at("_t", i + 1)
        ),
    )
    withbg = base.select("doc_id", bg.alias("_bg")).select(
        "doc_id",
        F.size("_bg").cast("bigint").alias("n_bigrams"),
        F.size(F.array_distinct("_bg")).cast("bigint").alias(
            "distinct_bigrams"
        ),
    )
    return withbg.select(
        "doc_id",
        "n_bigrams",
        "distinct_bigrams",
        (
            F.round(
                F.lit(1.0) - F.col("distinct_bigrams") / F.col("n_bigrams"), 6
            )
            + F.lit(0.0)
        ).alias("repetition_ratio"),
    )


@register(
    "text_chunking",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(s.i AS BIGINT) AS chunk_no,
           array_to_string(toks[(s.i * 64 + 1):(s.i * 64 + 96)], ' ') AS chunk,
           CAST(len(toks[(s.i * 64 + 1):(s.i * 64 + 96)]) AS BIGINT)
             AS chunk_tokens
    FROM t, unnest(generate_series(0,
             CAST(ceil(len(toks) / 64.0) AS BIGINT) - 1)) AS s(i)
    WHERE s.i * 64 < len(toks)
    """,
)
def text_chunking(spark, sf_dir):
    """Sliding-window document chunking (96-token chunks, 64-token
    stride — 32-token overlap), the context-window prep stage. One corpus
    scan, chunks exploded map-side; the token array is materialized once
    per doc (HOF-inlining trap otherwise)."""
    d = _docs(spark, sf_dir)
    base = d.select("doc_id", T.tokens("text").alias("_t"))
    n_chunks = F.ceil(F.size("_t") / 64).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("bigint").alias("chunk_no"),
            F.concat_ws(" ", F.slice("_t", i * 64 + 1, 96)).alias("chunk"),
            F.size(F.slice("_t", i * 64 + 1, 96)).cast("bigint").alias(
                "chunk_tokens"
            ),
        ),
    )
    return (
        base.filter(F.size("_t") >= 1)
        .select("doc_id", F.explode_outer(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_no").alias("chunk_no"),
            F.col("c.chunk").alias("chunk"),
            F.col("c.chunk_tokens").alias("chunk_tokens"),
        )
    )


@register(
    "text_decontaminate",
    oracle=f"""
    WITH corpus AS (
      {DOCS_WITH_DUPS_SQL}
    ), arrs AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS a
      FROM corpus
    ), sh AS (
      SELECT doc_id AS id, s.sh AS g
      FROM arrs, unnest(list_distinct(list_transform(
        generate_series(1, len(a) - 2),
        i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2]))) AS s(sh)
    ), bench AS (
      SELECT DISTINCT g FROM sh
      WHERE id % 50 = 0 AND id < {CLONE_OFFSET}
    ), hits AS (
      SELECT id, CAST(count(*) AS BIGINT) AS n_collisions
      FROM sh JOIN bench USING (g)
      WHERE NOT (id % 50 = 0 AND id < {CLONE_OFFSET})
      GROUP BY id
    )
    SELECT c.doc_id,
           coalesce(h.n_collisions, 0) AS n_collisions,
           CASE WHEN coalesce(h.n_collisions, 0) > 0 THEN 1 ELSE 0 END
             AS contaminated
    FROM (SELECT doc_id FROM corpus
          WHERE NOT (doc_id % 50 = 0 AND doc_id < {CLONE_OFFSET})) c
    LEFT JOIN hits h ON h.id = c.doc_id
    """,
)
def text_decontaminate(spark, sf_dir):
    """Benchmark decontamination — the eval-leak gate every training-data
    pipeline needs: flag candidate docs sharing any word 3-gram with the
    held-out benchmark set (here: doc_id % 50 == 0 originals; the planted
    clones of benchmark docs are candidates and collide on every
    shingle, so the operator provably fires).

    Shape for 100 TB: the benchmark shingle set is small relative to the
    corpus (eval sets are thousands of docs, the corpus billions), so its
    DISTINCT shingles BROADCAST — contamination becomes a map-side hash
    probe per candidate shingle + one groupBy per doc; the corpus never
    shuffles by shingle. Hashed 64-bit shingles (collision P ≈ n²/2⁶⁵)
    keep the broadcast tiny; counts are hash-invariant so the string-
    shingle oracle matches exactly."""
    corpus = _docs_with_dups(spark, sf_dir)
    is_bench = (F.col("doc_id") % 50 == 0) & (
        F.col("doc_id") < CLONE_OFFSET
    )
    shingles = D.distinct_tokens(corpus, ngram=3, hashed=True)
    sh_bench = (F.col("id") % 50 == 0) & (F.col("id") < CLONE_OFFSET)
    bench = shingles.filter(sh_bench).select("token").distinct()
    hits = (
        shingles.filter(~sh_bench)
        .join(F.broadcast(bench), "token")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_collisions"))
    )
    return (
        corpus.filter(~is_bench)
        .select("doc_id")
        .join(hits, F.col("doc_id") == F.col("id"), "left")
        .select(
            "doc_id",
            F.coalesce("n_collisions", F.lit(0)).alias("n_collisions"),
            F.when(F.coalesce("n_collisions", F.lit(0)) > 0, 1)
            .otherwise(0)
            .alias("contaminated"),
        )
    )


@register(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang,
           CAST(((doc_id * 2654435761) % 4294967296) % 100 AS INTEGER)
             AS bucket
    FROM documents
    WHERE CAST(((doc_id * 2654435761) % 4294967296) % 100 AS INTEGER)
          < CASE lang WHEN 'en' THEN 30 WHEN 'zh' THEN 100
                      WHEN 'de' THEN 75 ELSE 10 END
    """,
)
def sample_stratified(spark, sf_dir):
    """Deterministic mixture weighting (corpus assembly): keep 30% of en,
    100% of zh, 75% of de, 10% of everything else — decided by a pure
    arithmetic id hash, identical on any engine/partitioning/retry (the
    oracle runs the SAME formula; RNG sampling can't be cross-checked).
    Map-side only: one filter, no shuffle."""
    from ..operators.sampling import hash_bucket, stratified_sample

    d = _docs(spark, sf_dir).select("doc_id", "lang")
    out = stratified_sample(
        d, "lang", {"en": 30, "zh": 100, "de": 75}, default_pct=10
    )
    return out.select(
        "doc_id", "lang", hash_bucket("doc_id").alias("bucket")
    )


N_PACK_SHARDS = 16

from ..operators.sampling import hash_bucket_sql as _hb_sql


@register(
    "export_shard_manifest",
    oracle=f"""
    SELECT {_hb_sql('doc_id', 8)} AS shard,
           CAST(count(*) AS BIGINT) AS rows,
           CAST(sum({T.rolling_fingerprint_sql('text')}) AS BIGINT) AS fp_sum
    FROM documents GROUP BY 1
    """,
)
def export_shard_manifest(spark, sf_dir):
    """Sharded training export proven ROUND-TRIP: write the corpus as
    deterministic hash shards (operators/export.py — one repartition,
    one dir per shard), then READ THE WRITTEN FILES BACK and manifest
    them (per-shard row count + order-insensitive content fingerprint
    sum). The oracle computes the same manifest straight from the source
    table, so a wrong shard assignment, a dropped/duplicated row, or a
    corrupted text in the exported files all hash-mismatch."""
    from ..operators.export import write_training_shards
    from ..operators.sampling import hash_bucket
    from ..streaming.materialize import session_tmpdir

    d = _docs(spark, sf_dir).select("doc_id", "text")
    sharded = d.withColumn("shard", hash_bucket("doc_id", 8))
    out = session_tmpdir("export_q_")
    write_training_shards(sharded, f"{out}/shards", n_shards=8)
    back = spark.read.parquet(f"{out}/shards")
    return back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(T.rolling_fingerprint("text")).cast("bigint").alias("fp_sum"),
    )


@register(
    "sample_per_source_cap",
    oracle=f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_hb_sql('doc_id', 1000000)}, doc_id) AS rn
      FROM documents)
    WHERE rn <= 200
    """,
)
def sample_per_source_cap(spark, sf_dir):
    """Per-source document caps (the domain-cap stage of crawl curation:
    no single site may dominate the mix): keep at most 200 docs per
    source, selected by a deterministic id-hash order — same survivors
    on any cluster/partitioning/retry, and the hash order (not doc_id
    order) avoids biasing the kept set toward early crawl ids. One
    shuffle on source; per-group rank, no global sort."""
    from ..operators.sampling import hash_bucket

    d = _docs(spark, sf_dir).select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        hash_bucket("doc_id", 1_000_000), "doc_id"
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 200)
        .select("doc_id", "source")
    )


@register(
    "text_pii_scrub",
    oracle="""
    WITH planted AS (
      SELECT doc_id,
             text || ' contact: user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-0' || CAST(doc_id % 1000 AS VARCHAR)
               AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(length(text) - length(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '', 'g'))
             AS BIGINT) AS email_chars,
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+',
                            '<EMAIL>', 'g'),
             '\\+?[0-9][0-9()\\-]{{6,}}[0-9]', '<PHONE>', 'g') AS scrubbed
    FROM planted
    """.replace("{{", "{").replace("}}", "}"),
)
def text_pii_scrub(spark, sf_dir):
    """PII redaction (the scrub stage every pre-training corpus runs):
    emails and phone-like digit runs replaced by placeholder tokens, with
    a removed-chars count as the detection metric. PII is PLANTED in the
    query (deterministic per doc) so the redaction provably fires; the
    regexes stay in the dialect subset where Java regex and RE2 agree
    (character classes, bounded repetition — no lookarounds). Map-only;
    at 100 TB this is pure codegen'd regexp_replace, no Python."""
    d = _docs(spark, sf_dir)
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-0"),
            (F.col("doc_id") % 1000).cast("string"),
        ).alias("text"),
    )
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    phone_re = r"\+?[0-9][0-9()\-]{6,}[0-9]"
    return planted.select(
        "doc_id",
        (
            F.length("text")
            - F.length(F.regexp_replace("text", email_re, ""))
        ).cast("bigint").alias("email_chars"),
        F.regexp_replace(
            F.regexp_replace("text", email_re, "<EMAIL>"),
            phone_re,
            "<PHONE>",
        ).alias("scrubbed"),
    )


@register(
    "text_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             {_hb_sql('doc_id', N_PACK_SHARDS)} AS shard,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, shard, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_before
      FROM t
    )
    SELECT doc_id, shard, n_tokens,
           CAST(cum_before // 2048 AS BIGINT) AS seq_id,
           CAST(cum_before % 2048 AS BIGINT) AS seq_offset
    FROM c
    """,
)
def text_pack_sequences(spark, sf_dir):
    """Sequence packing (context-window assembly): assign docs to
    2048-token budget bins by cumulative token count, independently
    within each of ``N_PACK_SHARDS`` deterministic hash shards (the same
    Knuth id-hash family as ``operators/export.py`` /
    ``operators/sampling.py``, so it cross-checks in DuckDB) —
    (shard, seq_id, seq_offset) tell the loader where each doc starts.
    Contiguous packing within a shard (docs may straddle a boundary; the
    offset makes the split explicit).

    Scale: the window partitions by shard, so the cumsum is one hash
    shuffle + per-shard sorts — never a single-partition global sort
    (plan-asserted in tests). ``N_PACK_SHARDS`` is the scale knob: pick
    it so one shard's token stream fits an executor's sort budget;
    each shard is an independent stream for a data-parallel loader.
    Arithmetic is exact on BIGINT (integer ``div``/``pmod``, no double
    rounding), so bin assignment is stable past 2^53 cumulative tokens."""
    from ..operators.sampling import hash_bucket

    d = _docs(spark, sf_dir)
    base = d.select(
        "doc_id",
        hash_bucket("doc_id", N_PACK_SHARDS).alias("shard"),
        T.token_count("text").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = base.withColumn(
        "cum_before",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"),
    )
    return c.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.expr("cum_before DIV 2048").cast("bigint").alias("seq_id"),
        F.pmod(F.col("cum_before"), F.lit(2048)).cast("bigint").alias(
            "seq_offset"
        ),
    )


@register(
    "text_segment_dedup",
    oracle=f"""
    WITH corpus AS (
      {DOCS_WITH_DUPS_SQL}
    ), t AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS a
      FROM corpus
    ), segs AS (
      SELECT doc_id, CAST(s.i AS BIGINT) AS seg_no,
             array_to_string(a[(s.i * 32 + 1):(s.i * 32 + 32)], ' ') AS seg
      FROM t, unnest(generate_series(0,
               CAST(ceil(len(a) / 32.0) AS BIGINT) - 1)) AS s(i)
      WHERE s.i * 32 < len(a)
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY seg ORDER BY doc_id, seg_no) AS rn
      FROM segs
    ), reassembled AS (
      SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_no) AS clean_text,
             count(*) AS kept_segments
      FROM ranked WHERE rn = 1 GROUP BY doc_id
    ), totals AS (
      SELECT doc_id, count(*) AS total FROM segs GROUP BY doc_id
    )
    SELECT totals.doc_id, reassembled.clean_text,
           coalesce(reassembled.kept_segments, 0) AS kept_segments,
           totals.total - coalesce(reassembled.kept_segments, 0)
             AS removed_segments
    FROM totals LEFT JOIN reassembled USING (doc_id)
    """,
)
def text_segment_dedup(spark, sf_dir):
    """Cross-corpus segment-level dedup (the C4/CCNet "line dedup" stage,
    with deterministic 32-token segments standing in for newline-split
    lines — this corpus has no newlines): every repeated segment is kept
    only at its FIRST occurrence ((doc_id, seg_no) order) anywhere in the
    corpus; documents are reassembled from their surviving segments.

    Scale shape: segments explode map-side; first-occurrence election is
    one hash shuffle on the segment text (high-cardinality key — no skew;
    a window over seg, not a global sort); reassembly is one shuffle on
    doc_id. Reassembly sorts each doc's surviving segments in-array
    (array_sort on (seg_no, seg) structs), so no per-group sort pass.
    Fully-duplicated docs surface with clean_text=NULL, kept=0 — the
    downstream filter decides whether to drop them."""
    corpus = _docs_with_dups(spark, sf_dir)
    base = corpus.select("doc_id", T.tokens("text").alias("_t")).filter(
        F.size("_t") >= 1
    )
    n_segs = F.ceil(F.size("_t") / 32).cast("int")
    seg_arr = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.struct(
            i.cast("bigint").alias("seg_no"),
            F.concat_ws(" ", F.slice("_t", i * 32 + 1, 32)).alias("seg"),
        ),
    )
    segs = base.select("doc_id", F.explode_outer(seg_arr).alias("s")).select(
        "doc_id", F.col("s.seg_no").alias("seg_no"), F.col("s.seg").alias("seg")
    )
    w = Window.partitionBy("seg").orderBy("doc_id", "seg_no")
    kept = (
        segs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    reassembled = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_no", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("kept_segments"),
    )
    # per-doc segment totals come map-side from the token count — no
    # second pass over the exploded segments
    totals = base.select(
        "doc_id", F.ceil(F.size("_t") / 32).cast("bigint").alias("total")
    )
    return totals.join(reassembled, "doc_id", "left").select(
        "doc_id",
        "clean_text",
        F.coalesce("kept_segments", F.lit(0)).alias("kept_segments"),
        (F.col("total") - F.coalesce("kept_segments", F.lit(0))).alias(
            "removed_segments"
        ),
    )


_TEMP_ALPHA = 0.6  # mixture temperature: expected per-source count ∝ n^α


@register(
    "sample_temperature",
    oracle=f"""
    WITH counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ), w AS (
      SELECT lang, pow(n, {_TEMP_ALPHA} - 1.0) AS wr FROM counts
    ), m AS (
      SELECT max(wr) AS mw FROM w
    ), r AS (
      SELECT lang, CAST(round(wr / mw * 1000000) AS BIGINT) AS keep_ppm
      FROM w, m
    )
    SELECT d.doc_id, d.lang, r.keep_ppm
    FROM documents d JOIN r USING (lang)
    WHERE {{hb}} < r.keep_ppm
    """.replace("{hb}", _hb_sql("d.doc_id", 1_000_000)),
)
def sample_temperature(spark, sf_dir):
    """Temperature-flattened mixture sampling (the multilingual
    rebalancing stage): per-language keep-rate ∝ n^(α-1) normalized so
    the rarest language keeps everything — expected post-sample counts ∝ n^α,
    α=0.6. Membership is the deterministic Knuth id-hash (see
    operators/sampling.py): reproducible on any cluster/partitioning, and
    the DuckDB oracle runs the identical formula.

    Scale shape: the per-language histogram is a tiny partial-agg shuffle
    (|langs| rows); rates broadcast back; the membership test is
    map-side arithmetic on the id — the corpus itself never shuffles."""
    from ..operators.sampling import hash_bucket

    d = _docs(spark, sf_dir)
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    w = counts.select(
        "lang", F.pow("n", F.lit(_TEMP_ALPHA - 1.0)).alias("wr")
    )
    m = w.agg(F.max("wr").alias("mw"))
    rates = w.crossJoin(F.broadcast(m)).select(
        "lang",
        F.round(F.col("wr") / F.col("mw") * 1_000_000)
        .cast("bigint")
        .alias("keep_ppm"),
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(hash_bucket("doc_id", 1_000_000) < F.col("keep_ppm"))
        .select("doc_id", "lang", "keep_ppm")
    )


@register(
    "multimodal_resize",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id,
             ['image','audio','video'][(doc_id % 3) + 1] AS kind,
             encode(text) AS payload
      FROM documents
    )
    SELECT media_id, kind, 64 AS width, 64 AS height,
           CAST(4096 AS BIGINT) AS out_len,
           md5(substring(repeat(text, CAST(4096 / greatest(length(text), 1)
               AS INTEGER) + 1), 1, 4096)) AS payload_md5
    FROM media JOIN documents ON doc_id = media_id
    """,
)
def multimodal_resize(spark, sf_dir):
    """Resize/thumbnail plumbing over binary media payloads
    (operators/multimodal.py): Arrow-batched mapInPandas, fixed-size
    output per asset, map-only — the real pipeline swaps the stub stripe
    transform for a PIL/ffmpeg decode+re-encode behind the same
    signature. The oracle reproduces the deterministic stripe (repeat-pad
    to 64×64 bytes) and compares md5 fingerprints — raw binary columns
    don't stringify identically across engines, fingerprints do."""
    from ..operators.multimodal import resize_media, synthesize_media

    media = synthesize_media(_docs(spark, sf_dir))
    out = resize_media(media, width=64, height=64)
    return out.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.length("payload").cast("bigint").alias("out_len"),
        F.md5("payload").alias("payload_md5"),
    )


@register(
    "text_edit_distance_pairs",
    oracle="""
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           levenshtein(substring(a.text, 1, 40), substring(b.text, 1, 40))
             AS edit40,
           abs(length(a.text) - length(b.text)) AS len_diff
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    """,
)
def text_edit_distance_pairs(spark, sf_dir):
    """Character-level edit distance over candidate pairs (the fuzzy
    string-match primitive): adjacent-id pairs via an equi self-join,
    Levenshtein on a 40-char prefix. The prefix bound matters at scale:
    Levenshtein is O(m·n) per pair, so production fuzzy joins always run
    it on bounded keys AFTER cheap candidate generation (here the id
    join; in anger, an LSH/blocking stage like dedup's) — never across
    the raw cross product."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    a = d.select(F.col("doc_id").alias("id1"), F.col("text").alias("t1"))
    b = d.select(F.col("doc_id").alias("id2"), F.col("text").alias("t2"))
    return (
        a.join(b, F.col("id2") == F.col("id1") + 1)
        .select(
            "id1",
            "id2",
            F.levenshtein(
                F.substring("t1", 1, 40), F.substring("t2", 1, 40)
            ).alias("edit40"),
            F.abs(F.length("t1") - F.length("t2")).alias("len_diff"),
        )
    )


@register(
    "text_gopher_filter",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS toks,
             length(text) AS n_chars,
             length(text)
               - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))
               AS n_symbols
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(toks) BETWEEN 20 AND 100000
                THEN 1 ELSE 0 END AS ok_word_count,
           CASE WHEN list_sum(list_transform(toks, x -> length(x)))
                     / len(toks) BETWEEN 3 AND 10
                THEN 1 ELSE 0 END AS ok_mean_word_len,
           CASE WHEN n_symbols / greatest(len(toks), 1) <= 0.1
                THEN 1 ELSE 0 END AS ok_symbol_ratio,
           CASE WHEN len(list_filter(toks, x -> list_contains(
                  ['the','a','and','of','to','in','is'], x))) >= 2
                THEN 1 ELSE 0 END AS ok_stopwords,
           CASE WHEN len(list_distinct(toks)) / len(toks) > 0.2
                THEN 1 ELSE 0 END AS ok_diversity,
           CASE WHEN len(toks) BETWEEN 20 AND 100000
                 AND list_sum(list_transform(toks, x -> length(x)))
                     / len(toks) BETWEEN 3 AND 10
                 AND n_symbols / greatest(len(toks), 1) <= 0.1
                 AND len(list_filter(toks, x -> list_contains(
                       ['the','a','and','of','to','in','is'], x))) >= 2
                 AND len(list_distinct(toks)) / len(toks) > 0.2
                THEN 1 ELSE 0 END AS gopher_pass
    FROM t
    """,
)
def text_gopher_filter(spark, sf_dir):
    """Gopher-style rule-based quality filter (Rae et al. 2021, the
    published pre-training heuristics, adapted to this corpus's bands):
    word-count window, mean-word-length window, symbol-to-word ratio,
    minimum stop-word hits, lexical diversity — each emitted as its own
    flag (a pipeline debugging requirement: you tune rules by seeing
    WHICH one rejects) plus the conjunction. Entirely codegen'd array
    expressions over ONE token-array materialization — map-only, no
    Python, no shuffle."""
    d = _docs(spark, sf_dir)
    base = d.select(
        "doc_id",
        "text",
        T.tokens("text").alias("_t"),
    )
    n = F.size("_t")
    mean_len = F.aggregate(
        "_t", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    ) / n
    n_symbols = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), "[^a-z0-9 ]", "")
    )
    stop_hits = F.size(
        F.filter(
            "_t",
            lambda x: x.isin("the", "a", "and", "of", "to", "in", "is"),
        )
    )
    diversity = F.size(F.array_distinct("_t")) / n

    def flag(cond):
        return F.when(cond, 1).otherwise(0)

    ok_wc = n.between(20, 100_000)
    ok_mwl = mean_len.between(3, 10)
    ok_sym = n_symbols / F.greatest(n, F.lit(1)) <= 0.1
    ok_stop = stop_hits >= 2
    ok_div = diversity > 0.2
    return base.select(
        "doc_id",
        flag(ok_wc).alias("ok_word_count"),
        flag(ok_mwl).alias("ok_mean_word_len"),
        flag(ok_sym).alias("ok_symbol_ratio"),
        flag(ok_stop).alias("ok_stopwords"),
        flag(ok_div).alias("ok_diversity"),
        flag(ok_wc & ok_mwl & ok_sym & ok_stop & ok_div).alias(
            "gopher_pass"
        ),
    )


@register(
    "embedding_ann_recall_gate",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_exact, 1 AS recall_ok
    FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                               c.embedding::DOUBLE[]) DESC,
                        c.vec_id) AS rank
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    ) WHERE rank <= 5
    """,
)
def embedding_ann_recall_gate(spark, sf_dir):
    """Driver-hash-checked quality gate for the approximate ANN path
    (same pattern as agg_approx_distinct): IVF internals are
    engine-specific, so the oracle checks (a) the exact top-k pair count
    and (b) an IN-QUERY recall assertion — IVF(nprobe=4/16) must recover
    ≥ 80% of the exact cosine top-5 pairs, or the emitted constant flips
    and the hash fails. ``embedding_ann_ivf`` (now fully oracle-checked)
    keeps the pair-level output; this gate makes its quality a driver-checked
    fact rather than a local test claim. Measures the SAME reproducible
    IVF form the registered ``embedding_ann_ivf`` ships."""
    from ..operators.clustering import ivf_topk_exact_repro

    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.brute_force_topk(emb, queries, k=5).select(
        "query_id", "vec_id"
    )
    approx = ivf_topk_exact_repro(
        emb, queries, k=5, n_centroids=16, nprobe=4
    ).select("query_id", "vec_id")
    hit = exact.join(approx, ["query_id", "vec_id"], "left_semi")
    return exact.agg(F.count(F.lit(1)).alias("n_exact")).crossJoin(
        hit.agg(F.count(F.lit(1)).alias("n_hit"))
    ).select(
        "n_exact",
        F.when(
            F.col("n_hit") >= F.col("n_exact") * 0.8, 1
        ).otherwise(0).alias("recall_ok"),
    )


@register(
    "dedup_minhash_recall_gate",
    oracle=f"""
    WITH {_JACCARD_CTES}
    SELECT CAST(count(*) AS BIGINT) AS n_exact, 1 AS recall_ok
    FROM pairs
    """,
)
def dedup_minhash_recall_gate(spark, sf_dir):
    """Driver-hash-checked quality gate for MinHash+LSH (same pattern as
    the ANN gate): the oracle checks the exact jaccard>=0.8 pair count
    and an in-query assertion that banding recovers >= 90% of them
    (32 hashes / 8 bands at j>=0.8 → analytic recall ~0.9996, so 0.9 is
    loose). Precision needs no flag: every emitted LSH pair is
    exact-verified inside minhash_lsh_pairs, so false positives are
    structurally impossible — recall is the only free variable."""
    corpus = _docs_with_near_dups(spark, sf_dir)
    exact = D.jaccard_pairs(corpus, threshold=0.8, ngram=3).select(
        "id1", "id2"
    )
    approx = D.minhash_lsh_pairs(
        corpus, threshold=0.8, num_hashes=32, bands=8, ngram=3
    ).select("id1", "id2")
    hit = exact.join(approx, ["id1", "id2"], "left_semi")
    return exact.agg(F.count(F.lit(1)).alias("n_exact")).crossJoin(
        hit.agg(F.count(F.lit(1)).alias("n_hit"))
    ).select(
        "n_exact",
        F.when(
            F.col("n_hit") >= F.col("n_exact") * 0.9, 1
        ).otherwise(0).alias("recall_ok"),
    )


@register(
    "text_token_runs_udtf",
    oracle="""
    WITH arrs AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS a
      FROM documents
    ), toks AS (
      SELECT doc_id, a[i] AS tok, CAST(i AS BIGINT) - 1 AS pos
      FROM arrs, unnest(generate_series(1, len(a))) AS s(i)
    ), flagged AS (
      SELECT *, CASE WHEN lag(tok) OVER w IS DISTINCT FROM tok
                     THEN 1 ELSE 0 END AS brk
      FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), runs AS (
      SELECT doc_id, tok, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
      FROM flagged
    )
    SELECT doc_id, tok AS token,
           min(pos) AS run_start,
           CAST(count(*) AS BIGINT) AS run_len
    FROM runs
    GROUP BY doc_id, tok, run_id
    HAVING count(*) >= 2
    """,
)
def text_token_runs_udtf(spark, sf_dir):
    """Python UDTF surface (Spark 4 ``@udtf`` — arbitrary table-valued
    expansion per input row, LATERAL-joinable): run-length encoding of
    consecutive repeated tokens, emitting runs of length ≥ 2 (the
    stutter-detection primitive). One linear pass per document inside
    the UDTF vs the SQL formulation's two window passes over the
    exploded token stream.

    UDTFs are row-based Python — the slow path (PERF.md §6); this one
    exists to prove the API surface with a real operator. The hot-path
    equivalent of this analysis family is the pure-Catalyst
    ``text_repetition``. Still scale-sane: map-side only (no shuffle,
    no state), output bounded by input tokens."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="d_id: bigint, token: string, run_start: bigint,"
                     " run_len: bigint")
    class TokenRuns:
        def eval(self, doc_id, text):
            toks = [t for t in text.lower().split(" ") if t]
            i = 0
            for j in range(1, len(toks) + 1):
                if j == len(toks) or toks[j] != toks[i]:
                    if j - i >= 2:
                        yield doc_id, toks[i], i, j - i
                    i = j

    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.lateralJoin(
        TokenRuns(F.col("doc_id").outer(), F.col("text").outer())
    ).select(
        F.col("d_id").alias("doc_id"), "token", "run_start", "run_len"
    )


@register(
    "dedup_simhash_recall_gate",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_clone_pairs, 1 AS recall_ok
    FROM documents WHERE doc_id % 5 = 0
    """,
)
def dedup_simhash_recall_gate(spark, sf_dir):
    """Driver-hash-checked gate for SimHash: identical texts ALWAYS
    collide (hamming 0 is deterministic, not probabilistic), so every
    planted clone pair (doc, doc+offset) is a guaranteed-recall subset —
    the oracle knows their exact count, and the in-query assertion flips
    the flag if simhash misses any. Near-dup (nonzero-distance) recall
    stays a pytest property (it is probabilistic by design); this gate
    makes the deterministic floor a driver-verified fact."""
    corpus = _docs_with_dups(spark, sf_dir)
    pairs = D.simhash_pairs(corpus, max_hamming=3).select("id1", "id2")
    clone_pairs = (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % 5 == 0)
        .select(
            F.col("doc_id").alias("id1"),
            (F.col("doc_id") + CLONE_OFFSET).alias("id2"),
        )
    )
    hit = clone_pairs.join(pairs, ["id1", "id2"], "left_semi")
    return clone_pairs.agg(
        F.count(F.lit(1)).alias("n_clone_pairs")
    ).crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit"))).select(
        "n_clone_pairs",
        F.when(F.col("n_hit") == F.col("n_clone_pairs"), 1)
        .otherwise(0)
        .alias("recall_ok"),
    )


@register(
    "embedding_lsh_recall_gate",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_exact, 1 AS recall_ok
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 6) >= 0.3
    """,
)
def embedding_lsh_recall_gate(spark, sf_dir):
    """Driver-hash-checked gate for hyperplane LSH: the oracle checks the
    exact cosine>=0.3 pair count plus an in-query assertion that the
    8-table OR-amplified LSH recovers >= 65% of them. The bound is the
    ANALYTIC boundary expectation: a pair at exactly cos 0.3 collides in
    one 4-plane table with p = (1-θ/π)⁴ ≈ 0.127, so 8 OR'd tables give
    1-(1-p)⁸ ≈ 0.66 — and this corpus's pairs concentrate at the
    boundary (measured recall 0.735, deterministic because the planes
    are hash-derived). Stronger pairs recall higher (0.83 in the 0.4
    band); recall-vs-strength is pytest's property. Precision is
    structural — LSH candidates are exact-verified.

    r12 (guide §4.2/§1.2): the exact arm is the blocked-BLAS operator —
    the same pair set `embedding_near_dup`'s oracle pins hash-exact at
    every driver SF (its oracle IS this gate's counting subquery), ~25 s
    cheaper per run than the interpreted catalyst fold it replaces; and
    the two-agg crossJoin shape (which re-derived the exact arm for the
    semi-join) is one left join + one conditional agg, so each arm is
    evaluated exactly once."""
    emb = _emb(spark, sf_dir)
    exact = S.near_dup_pairs(emb, threshold=0.3).select("id1", "id2")
    approx = (
        S.lsh_near_dup_pairs(emb, threshold=0.3, n_planes=4, n_tables=8)
        .select("id1", "id2")
        .withColumn("_hit", F.lit(1))
    )
    return (
        exact.join(approx, ["id1", "id2"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("_hit").alias("_n_hit"),
        )
        .select(
            "n_exact",
            F.when(F.col("_n_hit") >= F.col("n_exact") * 0.65, 1)
            .otherwise(0)
            .alias("recall_ok"),
        )
    )


@register(
    "llm_corpus_pipeline_v2",
    oracle=f"""
    WITH corpus AS (
      {DOCS_WITH_DUPS_SQL}
    ), langd AS (
      SELECT c.doc_id, c.text, d.lang
      FROM corpus c JOIN documents d ON d.doc_id = c.doc_id % {CLONE_OFFSET}
    ), t AS (
      SELECT doc_id, text, lang,
             list_filter(string_split(lower(text), ' '), x -> x <> '')
               AS toks
      FROM langd
    ), q AS (
      SELECT doc_id, text, lang, len(toks) AS n_tokens
      FROM t
      WHERE len(toks) BETWEEN 20 AND 100000
        AND list_sum(list_transform(toks, x -> length(x))) / len(toks)
            BETWEEN 3 AND 10
        AND len(list_filter(toks, x -> list_contains(
              ['the','a','and','of','to','in','is'], x))) >= 2
        AND len(list_distinct(toks)) / len(toks) > 0.2
    ), ded AS (
      SELECT text, min(doc_id) AS doc_id, count(*) AS n_copies
      FROM q GROUP BY text
    ), kept AS (
      SELECT ded.doc_id, ded.n_copies, q.lang, q.n_tokens
      FROM ded JOIN q ON q.doc_id = ded.doc_id
    ), counts AS (
      SELECT lang, count(*) AS n FROM kept GROUP BY lang
    ), w AS (
      SELECT lang, pow(n, {_TEMP_ALPHA} - 1.0) AS wr FROM counts
    ), m AS (SELECT max(wr) AS mw FROM w),
    r AS (
      SELECT lang, CAST(round(wr / mw * 1000000) AS BIGINT) AS keep_ppm
      FROM w, m
    )
    SELECT k.doc_id, k.lang, k.n_tokens, k.n_copies, r.keep_ppm,
           {{shard}} AS shard
    FROM kept k JOIN r USING (lang)
    WHERE {{hb}} < r.keep_ppm
    """.replace("{hb}", _hb_sql("k.doc_id", 1_000_000)).replace(
        "{shard}", _hb_sql("k.doc_id", 8)
    ),
)
def llm_corpus_pipeline_v2(spark, sf_dir):
    """The full modern corpus-prep recipe as ONE composed Spark plan:
    planted-dup corpus → Gopher rule gate (word count / mean word length /
    stop-words / diversity, text_gopher_filter's rules) → exact dedup
    keeping the lowest id → per-language temperature resampling (α=0.6,
    sample_temperature's arithmetic) → deterministic 8-way shard
    assignment for export. Stage order is the scale order: cheap map-side
    filters FIRST (each survivor avoids the dedup shuffle entirely),
    dedup's one text-hash shuffle next, then the tiny language-histogram
    broadcast and a map-side membership test — three shuffles end to end
    (dedup groupBy, keep-id join, language histogram), none carrying
    filtered-out rows."""
    corpus = _docs_with_dups(spark, sf_dir)
    langs = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("orig_id"), "lang"
    )
    langd = corpus.join(
        langs, corpus["doc_id"] % CLONE_OFFSET == langs["orig_id"]
    ).select("doc_id", "text", "lang")
    toks = T.tokens("text")
    base = langd.select("doc_id", "text", "lang", toks.alias("_t"))
    n = F.size("_t")
    mean_len = F.aggregate(
        "_t", F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
    ) / n
    stop_hits = F.size(
        F.filter(
            "_t", lambda x: x.isin("the", "a", "and", "of", "to", "in", "is")
        )
    )
    q = base.filter(
        n.between(20, 100_000)
        & mean_len.between(3, 10)
        & (stop_hits >= 2)
        & (F.size(F.array_distinct("_t")) / n > 0.2)
    ).select("doc_id", "text", "lang", n.alias("n_tokens"))
    ded = q.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    # persisted: referenced by BOTH the language histogram and the final
    # join — without the cache the whole filter+dedup subtree executes
    # twice (plan-asserted by the shuffle-budget test). Bound: one
    # narrow row per surviving doc, tiny next to the corpus.
    kept = ded.join(
        q.select(F.col("doc_id").alias("qid"), "lang", "n_tokens"),
        ded["doc_id"] == F.col("qid"),
    ).select("doc_id", "n_copies", "lang", "n_tokens").persist()
    from ..operators.sampling import hash_bucket

    counts = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    w = counts.select(
        "lang", F.pow("n", F.lit(_TEMP_ALPHA - 1.0)).alias("wr")
    )
    m = w.agg(F.max("wr").alias("mw"))
    rates = w.crossJoin(F.broadcast(m)).select(
        "lang",
        F.round(F.col("wr") / F.col("mw") * 1_000_000)
        .cast("bigint")
        .alias("keep_ppm"),
    )
    return (
        kept.join(F.broadcast(rates), "lang")
        .filter(hash_bucket("doc_id", 1_000_000) < F.col("keep_ppm"))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "n_copies",
            "keep_ppm",
            hash_bucket("doc_id", 8).cast("bigint").alias("shard"),
        )
    )


@register(
    "scalar_regexp_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+a[a-z]*')) AS BIGINT)
             AS a_words,
           regexp_extract(text, '([a-z]+)\\s+(table)', 1) AS before_table,
           regexp_replace(text, '(data|spark)', 'X', 'g') AS masked,
           CASE WHEN regexp_matches(text, 'stream.*batch')
                THEN 1 ELSE 0 END AS has_stream_then_batch
    FROM documents WHERE doc_id % 20 = 0
    """,
)
def scalar_regexp_funcs(spark, sf_dir):
    """Regexp function family over document text: extract-all with
    count, group extraction, global replace, and pattern testing — all
    JVM-regex map-side (Spark and DuckDB both use RE2-ish NFA semantics
    for this subset; patterns avoid engine-divergent constructs like
    lookbehind)."""
    d = _docs(spark, sf_dir)
    return d.filter(F.col("doc_id") % 20 == 0).select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+a[a-z]*"), F.lit(0)))
        .cast("bigint")
        .alias("a_words"),
        F.regexp_extract("text", r"([a-z]+)\s+(table)", 1).alias(
            "before_table"
        ),
        F.regexp_replace("text", "(data|spark)", "X").alias("masked"),
        F.when(F.col("text").rlike("stream.*batch"), 1)
        .otherwise(0)
        .alias("has_stream_then_batch"),
    )


# ------------------------------------- streaming near-dup ingest gate

_ND_SLABS = 4


def _neardup_ingest_oracle() -> str:
    """Unrolled replay of the streaming filter's admission semantics:
    per slab, drop docs near-dup to anything ALREADY ADMITTED (greedy
    across slabs), then within the slab keep only docs with no lower-id
    surviving near-dup (the filter's batch-internal closed form)."""
    rounds = ["a0 AS (SELECT CAST(NULL AS BIGINT) AS id WHERE false)"]
    for k in range(1, _ND_SLABS + 1):
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
    WITH {_JACCARD_CTES},
    slabs AS (
      SELECT doc_id AS id,
             ntile({_ND_SLABS}) OVER (ORDER BY doc_id) AS slab
      FROM docs
    ),
    {','.join(rounds)}
    SELECT id AS doc_id FROM a{_ND_SLABS}
    """


@register("streaming_neardup_ingest", oracle=_neardup_ingest_oracle())
def streaming_neardup_ingest(spark, sf_dir):
    """The cross-batch streaming NEAR-dup filter run end-to-end as a
    driver-visible query — the training-data ingest gate beyond
    dropDuplicatesWithinWatermark: every micro-batch signatures its docs
    (map-side MinHash), band-joins them against the PERSISTENT store of
    everything already admitted (unbounded lookback), verifies
    candidates with exact hashed-unit Jaccard, dedups within the batch,
    and appends the survivors' signatures.  The corpus replays as 4
    doc_id-ordered slabs (forced mtimes ⇒ deterministic batch order,
    ≥2 batches asserted in-query).  The oracle REPLAYS the exact
    admission semantics — greedy across slabs over admitted docs,
    closed-form within each slab — as 4 unrolled SQL rounds over the
    exact jaccard≥0.8 pair set, so a green row certifies BOTH the
    banding recall (a missed candidate would admit a dup) and the
    cross-batch state machinery, with no convergence assumption."""
    import glob as _glob
    import os

    from ..streaming.dedup_stream import (
        StreamingNearDupFilter,
        start_near_dup_stream,
    )
    from ..streaming.materialize import session_tmpdir
    from pyspark.sql.window import Window

    docs = _docs_with_near_dups(spark, sf_dir).select("doc_id", "text")
    d = session_tmpdir("neardup_ingest_")
    src = f"{d}/src"
    # r12: materialize once before the four slab writes (each write
    # otherwise re-runs the dup-synthesis scan + global ntile window
    # and discards 3/4 of it — the pHash twin's fixture pattern).
    # bound: one copy of the fixture docs (|corpus| rows), fixture
    # setup only.
    slabbed = docs.withColumn(
        "slab", F.ntile(_ND_SLABS).over(Window.orderBy("doc_id"))
    ).localCheckpoint(eager=True)
    for s in range(1, _ND_SLABS + 1):
        (
            slabbed.filter(F.col("slab") == s)
            .drop("slab")
            .coalesce(1)
            .write.mode("overwrite")
            .json(f"{src}/s{s:02d}")
        )
    base = os.stat(src).st_mtime
    for s in range(1, _ND_SLABS + 1):
        for f in _glob.glob(f"{src}/s{s:02d}/part-*.json"):
            os.utime(f, (base + s, base + s))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(f"{src}/s*")
    )
    filt = StreamingNearDupFilter(
        f"{d}/store",
        f"{d}/out",
        threshold=0.8,
        num_hashes=32,
        bands=8,
        ngram=3,
    )
    q = start_near_dup_stream(stream, filt, f"{d}/ckpt", available_now=True)
    _await_or_raise(q, 300)
    n_batches = len(_glob.glob(f"{d}/store/batch_id=*"))
    if n_batches < 2:
        raise ValueError(
            f"expected incremental ingest, got {n_batches} batches"
        )
    return spark.read.parquet(f"{d}/out").select("doc_id")


@register(
    "llm_dataset_card",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, lang, source, n_chars,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tokens
      FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(n_tokens), 2) AS mean_tokens,
           round(median(n_chars), 1) AS median_chars,
           round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                 / count(*), 4) AS en_share,
           CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
             AS n_exact_dups
    FROM base
    """,
)
def llm_dataset_card(spark, sf_dir):
    """The DATASET CARD in one row — the corpus-level summary a training
    run records before touching the data: document / language / source
    counts, token totals and means (whitespace tokenization, matching
    text_token_stats), median document length (rounded to 1dp — an even-count median can
    land on .5, where bigint casts truncate vs round differently across
    engines), English share, and the
    exact-duplicate count (docs minus distinct content fingerprints).
    One scan, two aggregates (the global stats and the distinct-md5
    count share the shuffle-free map side); every output is rounded or
    integral so the card is hash-stable.  At 100 TB this is the cheap
    pre-flight before the expensive pipeline stages — and its numbers
    feed directly into sampling temperatures and dedup budgets."""
    d = _docs(spark, sf_dir)
    base = d.select(
        "lang",
        "source",
        "n_chars",
        F.size(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("n_tokens"),
        F.md5("text").alias("fp"),
    )
    return base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 2).alias("mean_tokens"),
        F.round(F.median("n_chars"), 1).alias("median_chars"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        ).alias("en_share"),
        (F.count(F.lit(1)) - F.countDistinct("fp")).alias("n_exact_dups"),
    )


# Whitespace is the EXPLICIT class [ \t\n\x0B\f\r], not \s: Java's \s is
# exactly that set while RE2's \s excludes \x0B — with \s a vertical tab
# in any document would silently break the Spark/DuckDB byte parity the
# oracle hash certifies.  Spelling the class out makes the two engines'
# semantics identical by construction.
_BPE_WS = r" \t\n\x0B\f\r"
_BPE_PAT = (
    rf" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9{_BPE_WS}]+|[{_BPE_WS}]+"
)


@register(
    "text_bpe_regex_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PAT}')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                AS BIGINT) AS n_ws_tokens,
           round(len(regexp_extract_all(text, '{_BPE_PAT}'))
                 / len(list_filter(string_split(text, ' '), t -> t <> '')),
                 4) AS fertility
    FROM documents
    """,
)
def text_bpe_regex_tokens(spark, sf_dir):
    """Token counting with a BPE-style PRE-TOKENIZER regex (the GPT-2
    pattern family: letter runs, digit runs, punctuation runs, each with
    optional leading space — restricted to ASCII classes, whitespace
    spelled out as [ \\t\\n\\x0B\\f\\r] since Java's \\s and RE2's \\s
    disagree on vertical tab, so Java regex and RE2 agree byte-for-byte,
    pinned by the oracle hash on every doc)
    next to the whitespace count, plus the fertility ratio between them
    — the number a tokenizer-budget estimate actually needs.  Map-side
    regexp_extract_all; no shuffle."""
    d = _docs(spark, sf_dir)
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), 0))
    n_ws = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    return d.select(
        "doc_id",
        n_bpe.alias("n_bpe_tokens"),
        n_ws.alias("n_ws_tokens"),
        F.round(n_bpe / n_ws, 4).alias("fertility"),
    )
