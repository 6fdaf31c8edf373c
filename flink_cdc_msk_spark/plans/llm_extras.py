"""Round-4 LLM-pipeline additions: deterministic k-means clustering,
Bloom-prefiltered cross-pool dedup, and reproducible train/val/test
splitting. Registered with full DuckDB oracles (every stage of each
operator — including the iterative Lloyd rounds — is engineered to be
bit-reproducible across engines; see the operator docstrings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators.clustering import kmeans_assign
from ..operators.sampling import (
    hash_bucket,
    train_val_test_split,
    train_val_test_split_sql,
)
from ..sources.tables import load_tables
from .llm_pipeline import DOCS_WITH_DUPS_SQL, _docs_with_dups
from .registry import register

_KMEANS_K = 4

# one Lloyd round, parameterized by the centroid CTE feeding it
_KMEANS_ROUND = """
    dist{n} AS (
      SELECT e.id, c.cl,
             sum(CAST((e.val - c.cval) * (e.val - c.cval)
                 AS DECIMAL(28,14))) AS dist
      FROM elems e JOIN cent{p} c USING (pos)
      GROUP BY e.id, c.cl
    ),
    asg{n} AS (
      SELECT id, cl FROM (
        SELECT id, cl,
               row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn
        FROM dist{n}
      ) WHERE rn = 1
    )"""


@register(
    "embedding_kmeans",
    oracle=f"""
    WITH elems AS (
      SELECT vec_id AS id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings,
           unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    cent0 AS (
      SELECT CAST(id AS INTEGER) AS cl, pos, val AS cval
      FROM elems WHERE id < {_KMEANS_K}
    ),
    {_KMEANS_ROUND.format(n=1, p=0)},
    cent1 AS (
      SELECT a.cl, e.pos,
             CAST(sum(CAST(e.val AS DECIMAL(24,12))) AS DOUBLE) / count(*)
               AS cval
      FROM elems e JOIN asg1 a USING (id)
      GROUP BY a.cl, e.pos
    ),
    {_KMEANS_ROUND.format(n=2, p=1)}
    SELECT id AS vec_id, cl AS cluster FROM asg2
    """,
)
def embedding_kmeans(spark, sf_dir):
    """Two deterministic Lloyd rounds over the embedding corpus (init =
    the k smallest-id vectors, DECIMAL-exact distance/centroid sums,
    index tie-break) → (vec_id, cluster). The iterative algorithm the
    brief calls out as non-SQL-expressible, made oracle-checkable by
    unrolling a fixed round count. See operators/clustering.py for the
    scale discussion (assignment step swaps to the blocked-BLAS
    mapInPandas kernel beyond oracle scale)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return (
        kmeans_assign(emb, k=_KMEANS_K, iters=2)
        .select(F.col("id").alias("vec_id"), F.col("cl").alias("cluster"))
    )


@register(
    "dedup_bloom_prefilter",
    oracle=f"""
    WITH docs AS (
      {DOCS_WITH_DUPS_SQL}
    ),
    ref AS (
      SELECT * FROM docs
      WHERE CAST(((doc_id * 2654435761) % 4294967296) % 100 AS INTEGER) < 20
    ),
    cand AS (
      SELECT * FROM docs
      WHERE CAST(((doc_id * 2654435761) % 4294967296) % 100 AS INTEGER) >= 20
    ),
    refmin AS (SELECT text, min(doc_id) AS ref_id FROM ref GROUP BY text)
    SELECT c.doc_id, r.ref_id
    FROM cand c JOIN refmin r USING (text)
    """,
)
def dedup_bloom_prefilter(spark, sf_dir):
    """Cross-pool exact dedup behind a distributed Bloom prefilter: the
    reference pool (20% of ids by deterministic bucket) renders to a
    broadcastable bit-set table; candidates probe it map-side and only
    bloom-positive docs reach the exact text join. Output is exact
    (bloom only prunes), so the oracle is the plain cross-pool join —
    a green row certifies the prefilter dropped no true duplicate."""
    docs = _docs_with_dups(spark, sf_dir)
    return D.bloom_prefilter_dedup(docs, hash_bucket("doc_id") < 20)


@register(
    "sample_train_test_split",
    oracle=f"""
    SELECT source,
           {train_val_test_split_sql('doc_id')} AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source, split
    """,
)
def sample_train_test_split(spark, sf_dir):
    """Reproducible 80/10/10 train/val/test assignment from a salted
    arithmetic id-hash (no RNG — stable across engines, partitionings
    and retries), summarized per source. Map-side assignment plus one
    low-cardinality agg shuffle."""
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        train_val_test_split(docs)
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "agg_count_min_heavy_hitters",
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
def agg_count_min_heavy_hitters(spark, sf_dir):
    """Count-Min sketch heavy-hitter estimation (k=3 rows × m=1024
    buckets): the sketch is a bounded (row, bucket, c) relation — fixed
    k·m size at ANY corpus scale — and estimates are a broadcast probe
    + min over rows. Portable md5-slice hashes let DuckDB re-derive the
    sketch bit-for-bit, so the CMS one-sided guarantee (est ≥ exact,
    asserted per row in `lower_bound_ok`) is a hash-checked fact, not a
    claim. Probes = the exact top-20 tokens (deterministic order)."""
    from ..functions.text import tokens
    from ..operators.sketch import cms_estimate, cms_sketch

    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(F.explode(tokens("text")).alias("token"))
    sketch = cms_sketch(toks, k=3, m=1024)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.orderBy(
        F.col("exact_n").desc(), F.col("token")
    ).limit(20)
    est = cms_estimate(sketch, probes.select("token"), k=3, m=1024)
    return probes.join(est, "token").select(
        "token",
        "exact_n",
        "est",
        (F.col("est") >= F.col("exact_n")).cast("int").alias(
            "lower_bound_ok"
        ),
    )


_WKEY_SQL = (
    "round(ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),"
    " 1, 8)) AS BIGINT) + 0.5) / 4294967296.0) / n_chars, 12)"
)


@register(
    "sample_weighted_topn",
    oracle=f"""
    SELECT doc_id, source, n_chars FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               ORDER BY {_WKEY_SQL} DESC, doc_id) AS rn
      FROM documents
    ) WHERE rn <= 100
    """,
)
def sample_weighted_topn(spark, sf_dir):
    """Deterministic weight-proportional sampling (Efraimidis–Spirakis
    one-pass keys, weight = n_chars): top-100 by the portable
    ``round(ln(u)/w, 12)`` key. Compiles to TakeOrdered — per-partition
    top-n then a 100-row merge, no global sort, no RNG; the DuckDB
    oracle re-derives the identical sample."""
    from ..operators.sampling import weighted_sample

    docs = load_tables(spark, sf_dir)["documents"]
    return weighted_sample(docs, 100).select("doc_id", "source", "n_chars")
