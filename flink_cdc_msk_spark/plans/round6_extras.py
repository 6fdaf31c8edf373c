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


# ------------------------- A29 effective-once certificate (CDC family)

@register(
    "cdc_effective_once_read",
    oracle="""
    SELECT 'test_db' AS db,
           'orders' AS tbl,
           'test_db.orders.' || CAST(o_orderkey AS VARCHAR) AS partition_key,
           'cdc_test_db' AS topic,
           op
    FROM (
      SELECT o_orderkey, 'c' AS op FROM orders
      UNION ALL
      SELECT o_orderkey, 'u' FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, 'd' FROM orders WHERE o_orderkey % 20 = 0
    )
    """,
)
def cdc_effective_once_read(spark, sf_dir):
    """A29 effective-once CERTIFICATE.  The reference produces with a
    transactional Kafka producer (MySQLCDC2AWSMSK.scala:187-190);
    Spark's Kafka sink is at-least-once, so the shipped mitigation is
    an idempotent record identity that consumers dedup on.  This query
    PROVES the mitigation: the envelope feed is replayed with injected
    duplicate deliveries (~1/3 of records re-delivered once, ~1/7 twice
    more — the at-least-once failure mode), routed normally, then
    deduplicated on read by the record identity (partition_key,
    source.file, source.pos, op, ts_ms); the oracle is the EXACTLY-ONCE
    routed output, so a green row certifies the duplicate deliveries
    are invisible downstream.  (A real binlog feed needs only
    file+pos — the synthetic feed's constant file/pos force op+ts_ms
    into the key.)  One dropDuplicates shuffle on the dedup key — at
    100 TB this is the standard consumer-side effective-once read,
    partitioned by the same key the producer partitions on.  The
    duplicate injection is asserted non-empty in-query."""
    from ..operators.route import route_mysql_cdc
    from .cdc_queries import ORDERS_ROUTING, synthesize_mysql_events

    events = synthesize_mysql_events(spark, sf_dir)
    ts = F.get_json_object("value", "$.ts_ms").cast("long")
    dup_once = events.filter(ts % 3 == 0)
    dup_twice = events.filter(ts % 7 == 0)
    feed = (
        events.unionAll(dup_once).unionAll(dup_twice).unionAll(dup_twice)
    )
    n_injected = dup_once.count() + 2 * dup_twice.count()
    if n_injected == 0:
        raise ValueError("duplicate injection produced no rows")
    routed = route_mysql_cdc(feed, ORDERS_ROUTING, topic_prefix="cdc_")
    identity = [
        "partition_key",
        F.get_json_object("value", "$.source.file").alias("file"),
        F.get_json_object("value", "$.source.pos").alias("pos"),
        F.get_json_object("value", "$.op").alias("op"),
        F.get_json_object("value", "$.ts_ms").alias("ts_ms"),
    ]
    once = routed.select(
        "db", F.col("table").alias("tbl"), "topic", *identity
    ).dropDuplicates(["partition_key", "file", "pos", "op", "ts_ms"])
    return once.select("db", "tbl", "partition_key", "topic", "op")
