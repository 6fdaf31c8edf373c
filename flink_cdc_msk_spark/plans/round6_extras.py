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

# Kept (id, cl) per (applicationId, corpus) — semantic_dedup eagerly
# caches its narrow result (and releases the full-width member cache);
# the memo bounds even that to one entry per session per corpus.
_SEMDEDUP_MEMO: dict[tuple, object] = {}


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
    from ..sources.tables import evict_stale_entries

    app_id = spark.sparkContext.applicationId
    evict_stale_entries(_SEMDEDUP_MEMO, app_id)
    key = (app_id, sf_dir)
    kept = _SEMDEDUP_MEMO.get(key)
    if kept is None:
        emb = load_tables(spark, sf_dir)["embeddings"]
        kept = semantic_dedup(emb, k=_SEM_K, iters=2, threshold=_SEM_TAU)
        _SEMDEDUP_MEMO[key] = kept
    return kept.select(
        F.col("id").alias("vec_id"), F.col("cl").alias("cluster")
    )


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


# ----------------------------------- real BPE: train merges + encode

_BPE_SEP = "\x1f"  # ASCII unit separator — absent from the corpus
_BPE_MERGES = 6


def _bpe_round(vocab):
    """One BPE merge round over (word, cnt, seq): count adjacent symbol
    pairs weighted by word frequency, pick the most frequent pair
    (deterministic (count DESC, s1, s2) tie-break), rewrite every seq.

    ``seq`` renders a symbol list as individually-WRAPPED symbols
    ('\\x1fa\\x1f\\x1fb\\x1f'): a merge is then one string replace whose
    pattern is anchored on both symbols' own wrappers, so it can never
    match inside a longer symbol AND consecutive merge sites stay
    independent (replace('a a a a') collapses to two 'aa's, matching
    greedy left-to-right BPE — a shared-separator rendering gets the
    quadruple case wrong)."""
    s2 = _BPE_SEP + _BPE_SEP
    pairs = (
        vocab.select(
            "cnt",
            F.split(
                F.expr("substring(seq, 2, length(seq) - 2)"), s2
            ).alias("syms"),
        )
        .filter(F.size("syms") >= 2)
        .select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i-1] AS s1, syms[i] AS s2))"
                )
            ).alias("p"),
        )
        .groupBy("p.s1", "p.s2")
        .agg(F.sum("cnt").alias("c"))
    )
    merge = (
        pairs.orderBy(F.col("c").desc(), "s1", "s2")
        .limit(1)
        .select("s1", "s2")
    )
    pat = F.concat(
        F.lit(_BPE_SEP), F.col("s1"), F.lit(s2), F.col("s2"),
        F.lit(_BPE_SEP),
    )
    rep = F.concat(F.lit(_BPE_SEP), F.col("s1"), F.col("s2"), F.lit(_BPE_SEP))
    # LEFT join (not crossJoin): when every word is already a single
    # symbol the pair table — and so the 1-row argmax — is EMPTY, and a
    # cross join would silently empty the vocabulary (round-6 advice:
    # text_bpe_encode then drops every doc).  The left join passes seq
    # through unchanged instead; the oracle mirrors it (LEFT JOIN ON
    # TRUE + the same NULL guard).
    return (
        vocab.join(F.broadcast(merge), F.lit(True), "left")
        .withColumn(
            "seq",
            F.when(F.col("s1").isNull(), F.col("seq")).otherwise(
                F.replace(F.col("seq"), pat, rep)
            ),
        )
        .drop("s1", "s2")
    )


def bpe_units_cte(merges: int) -> str:
    """WITH-body (no ``WITH`` keyword) replaying the exact BPE training
    the Spark side runs — toks → vocabulary → ``merges`` unrolled rounds
    → per-word unit counts — ending in
    ``doc_units(doc_id, n_bpe_units, n_chars)``.  Shared by every oracle
    that consumes the learned merge table (`text_bpe_encode`,
    `text_pack_sequences_bpe`, `llm_dataset_card_bpe`) so a green row on
    any consumer certifies the same training replay."""
    S, SS = "chr(31)", "chr(31)||chr(31)"
    from .llm_pipeline import _BPE_PAT

    rounds = []
    for r in range(1, merges + 1):
        rounds.append(f"""
    p{r} AS (
      SELECT syms[i] AS s1, syms[i+1] AS s2, sum(cnt) AS c
      FROM (SELECT cnt, string_split(trim(seq, chr(31)), {SS}) AS syms
            FROM v{r - 1}) w,
           unnest(generate_series(1, len(syms) - 1)) AS g(i)
      GROUP BY s1, s2
    ),
    m{r} AS (SELECT s1, s2 FROM p{r} ORDER BY c DESC, s1, s2 LIMIT 1),
    v{r} AS (
      SELECT word, cnt,
             CASE WHEN s1 IS NULL THEN seq
                  ELSE replace(seq, {S}||s1||{SS}||s2||{S},
                               {S}||s1||s2||{S})
             END AS seq
      FROM v{r - 1} LEFT JOIN m{r} ON TRUE
    )""")
    return f"""toks AS (
      SELECT doc_id, t AS word
      FROM documents,
           unnest(regexp_extract_all(text, '{_BPE_PAT}')) AS u(t)
    ),
    words AS (SELECT word, count(*) AS cnt FROM toks GROUP BY word),
    v0 AS (
      SELECT word, cnt,
             {S} || array_to_string(
               list_transform(generate_series(1, len(word)),
                              i -> word[i]), {SS}) || {S} AS seq
      FROM words
    ),
    {','.join(rounds)},
    enc AS (
      SELECT word,
             (len(seq) - len(replace(seq, chr(31), ''))) // 2 AS n_units
      FROM v{merges}
    ),
    doc_units AS (
      SELECT t.doc_id,
             CAST(sum(e.n_units) AS BIGINT) AS n_bpe_units,
             CAST(sum(len(t.word)) AS BIGINT) AS n_chars
      FROM toks t JOIN enc e USING (word)
      GROUP BY t.doc_id
    )"""


# Per-doc encoded lengths under the corpus-trained merge table, per
# (applicationId, corpus) — the training (toks explode + 6 merge rounds)
# runs once per session per corpus no matter how many consumers ask.
_BPE_DOC_UNITS_MEMO: dict[tuple, object] = {}


def bpe_doc_units(spark, sf_dir):
    """→ memoized (doc_id, n_bpe_units, n_chars) under the merge table
    trained on this corpus — the shared Spark half of ``bpe_units_cte``.

    Cache hygiene (round-6 advice + verdict item 5, reworked round 8):
    each merge round's unit relation is localCheckpoint-ed — the rows
    materialize and the LINEAGE truncates, so round r's plan no longer
    embeds round r−1 twice (pair branch + rewrite branch), and dropping
    the previous round's Python handle releases its blocks to the GC.
    persist/unpersist was abandoned here because unpersisting a PARENT
    recompiles dependent cache entries back to lazy (the round-8 memo-
    invalidation finding). localCheckpoint is non-reliable storage: an
    executor loss makes later uses fail unrecoverably (acceptable for
    the local bench target; at cluster scale gate on a reliable
    checkpoint dir — same tradeoff as operators/clustering.py). The
    only cache that survives is this memo's per-doc relation, evicted
    with the SparkContext like every other (app, corpus) memo."""
    from ..operators.dedup import _spread_and_persist
    from ..sources.tables import evict_stale_entries
    from .llm_pipeline import _BPE_PAT, _docs

    app_id = spark.sparkContext.applicationId
    evict_stale_entries(_BPE_DOC_UNITS_MEMO, app_id)
    key = (app_id, sf_dir)
    cached = _BPE_DOC_UNITS_MEMO.get(key)
    if cached is not None:
        return cached
    toks = _spread_and_persist(
        _docs(spark, sf_dir).select(
            "doc_id",
            F.explode(
                F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)
            ).alias("word"),
        ),
        spark,
        key="doc_id",
    )
    chars = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    # Exception safety (round-7 advice): any job between the toks
    # persist and the final doc_units.count() can fail with the memo
    # never set — unpersist every live handle before re-raising, or a
    # long-lived session leaks the spread toks relation + one vocab
    # round per failed attempt.
    live = [toks]
    try:
        # localCheckpoint per round, NOT persist + parent-unpersist:
        # uncaching round r-1 recompiles round r's cache entry back to
        # lazy (Spark invalidates DEPENDENT caches), so the old
        # persist/count/unpersist ladder silently re-ran every earlier
        # round on each later action — quadratic recompute inside the
        # build and a cold memo after it (measured round 8: ~7.5 s per
        # consumer action at sfx1). Each checkpoint materializes the
        # vocab-scale round eagerly and truncates lineage; the previous
        # round's blocks free via the ContextCleaner when its handle
        # drops here.
        vocab = (
            toks.groupBy("word")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn(
                "seq",
                F.concat(
                    F.lit(_BPE_SEP),
                    F.array_join(chars, _BPE_SEP + _BPE_SEP),
                    F.lit(_BPE_SEP),
                ),
            )
            # bound: one row per distinct word (vocab-scale, not
            # corpus-scale); non-evictable heap — acceptable only
            # because the domain is bounded by the language's lexicon
            .localCheckpoint()
        )
        for _ in range(_BPE_MERGES):
            # bound: same vocab-scale row count per merge round; the
            # previous round's blocks are freed by GC once unreferenced
            vocab = _bpe_round(vocab).localCheckpoint()
        enc = vocab.select(
            "word",
            (
                (
                    F.length("seq")
                    - F.length(
                        F.replace(F.col("seq"), F.lit(_BPE_SEP), F.lit(""))
                    )
                )
                / F.lit(2)
            ).cast("long").alias("n_units"),
        )
        # localCheckpoint, NOT persist: the memoized relation must
        # survive the toks/vocab unpersists below, and uncaching a
        # PARENT recompiles dependent cache entries back to lazy —
        # a persisted doc_units silently lost its materialization and
        # every consumer re-ran the full encode join (~7.5 s/action at
        # sfx1, measured round 8). The checkpoint materializes the
        # rows and truncates lineage, so nothing can invalidate it.
        doc_units = (
            toks.join(enc, "word")
            .groupBy("doc_id")
            .agg(
                F.sum("n_units").cast("bigint").alias("n_bpe_units"),
                F.sum(F.length("word")).cast("bigint").alias("n_chars"),
            )
            # bound: one 3-column row per doc (~24 B/doc — flat in doc
            # count, never corpus-text-scale)
            .localCheckpoint()
        )
    except Exception:
        for df in live:
            df.unpersist()
        raise
    toks.unpersist()  # checkpointed rounds free themselves via GC
    _BPE_DOC_UNITS_MEMO[key] = doc_units
    return doc_units


@register(
    "text_bpe_encode",
    oracle=f"""
    WITH {bpe_units_cte(_BPE_MERGES)}
    SELECT doc_id, n_bpe_units, n_chars,
           round(n_bpe_units / n_chars, 4) AS compression
    FROM doc_units
    """,
)
def text_bpe_encode(spark, sf_dir):
    """REAL byte-pair encoding — closes the gap text_bpe_regex_tokens
    left open (it stops at the GPT-2 pre-tokenizer): learn a bounded
    merge table FROM the corpus (frequency-weighted adjacent-pair
    argmax per round, Sennrich et al. 2016), apply it, and emit each
    doc's encoded length → (doc_id, n_bpe_units, n_chars, compression).

    Training runs on the distinct-word VOCABULARY with counts (the
    standard trick — merge work scales with |vocab|, not corpus size);
    each round is one weighted pair aggregation plus a 1-row argmax
    broadcast back into a string rewrite, unrolled like lloyd_rounds.
    Encoding is a vocabulary JOIN, never a per-occurrence re-merge.
    The oracle replays the identical rounds in SQL, so a green row
    certifies the learned merge table itself (any divergent merge
    shifts encoded lengths).  At 100 TB: the explode-heavy token
    relation is persisted+spread (PERF.md §18 doctrine) since both the
    vocab aggregation and the final join consume it; per-round state is
    |vocab| rows; the 1-row argmax is the documented SinglePartition
    class.  Training + per-doc encode live in ``bpe_doc_units``
    (memoized per (app, corpus)) so the packing/dataset-card consumers
    ride the same learned merge table."""
    du = bpe_doc_units(spark, sf_dir)
    return du.select(
        "doc_id",
        "n_bpe_units",
        "n_chars",
        F.round(
            F.col("n_bpe_units") / F.col("n_chars"), 4
        ).alias("compression"),
    )
