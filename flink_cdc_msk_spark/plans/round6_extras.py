"""Round-6 additions.

`dedup_semantic` closes the one major dedup family a training-data
pipeline runs that rounds 1-5 lacked (SemDeDup, arXiv:2303.09540):
embedding-space clustering bounds the candidate pairs, within-cluster
cosine pruning drops the semantic near-copies that string-level
MinHash/SimHash can't see.  Composed entirely from existing verified
machinery: the DECIMAL-exact Lloyd (`operators/clustering.py`, the
`embedding_kmeans` oracle pattern) + the 6dp-rounded cosine boundary
every similarity operator shares.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.clustering import semantic_dedup
from ..sources.tables import load_tables
from .llm_extras import _KMEANS_ROUND
from .registry import register

_SEM_K = 8
_SEM_TAU = 0.3


def _kmeans_cte(k: int) -> str:
    """elems → asg2 (two unrolled DECIMAL-exact Lloyd rounds, init = the
    k smallest-id vectors) — the embedding_kmeans oracle shape with a
    parameterized k."""
    return f"""elems AS (
      SELECT vec_id AS id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings,
           unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    cent0 AS (
      SELECT CAST(id AS INTEGER) AS cl, pos, val AS cval
      FROM elems WHERE id < {k}
    ),
    {_KMEANS_ROUND.format(n=1, p=0)},
    cent1 AS (
      SELECT a.cl, e.pos,
             CAST(sum(CAST(e.val AS DECIMAL(24,12))) AS DOUBLE) / count(*)
               AS cval
      FROM elems e JOIN asg1 a USING (id)
      GROUP BY a.cl, e.pos
    ),
    {_KMEANS_ROUND.format(n=2, p=1)}"""


@register(
    "dedup_semantic",
    oracle=f"""
    WITH {_kmeans_cte(_SEM_K)},
    drops AS (
      SELECT DISTINCT b.id
      FROM asg2 a
      JOIN embeddings va ON va.vec_id = a.id
      JOIN asg2 b ON b.cl = a.cl AND a.id < b.id
      JOIN embeddings vb ON vb.vec_id = b.id
      WHERE round(list_cosine_similarity(va.embedding::DOUBLE[],
                                         vb.embedding::DOUBLE[]), 6)
            >= {_SEM_TAU}
    )
    SELECT a.id AS vec_id, a.cl AS cluster
    FROM asg2 a
    WHERE a.id NOT IN (SELECT id FROM drops)
    """,
)
def dedup_semantic(spark, sf_dir):
    """SemDeDup over the embedding corpus: 2 exact Lloyd rounds (k=8)
    partition the space, then within each cluster every vector with a
    lower-id neighbor at cosine >= 0.3 (6dp boundary) is pruned →
    kept (vec_id, cluster).  Candidate generation is CLUSTER-BOUNDED —
    n²/k pairs for balanced clusters, never corpus-global; k is the
    scale knob (tens of thousands at web scale).  The oracle re-derives
    the exact clustering (embedding_kmeans's unrolled-CTE pattern) and
    the same pruning rule, so a green row certifies clustering + prune
    end-to-end.  Reference has no embedding surface; this is Part-B
    capability closure (SURVEY.md §2, LLM dedup family)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    return semantic_dedup(
        emb, k=_SEM_K, iters=2, threshold=_SEM_TAU
    ).select(F.col("id").alias("vec_id"), F.col("cl").alias("cluster"))
