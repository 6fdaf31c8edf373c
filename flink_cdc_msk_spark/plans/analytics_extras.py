"""Round-4c analytics additions: hypertable-style multi-resolution
rollups, equi-depth histograms, per-group anomaly scoring, Z-order
file-layout statistics, and product-quantization (PQ/ADC) approximate
nearest neighbor. All five carry full DuckDB oracles — the iterative /
approximate ones reuse the DECIMAL-exact reproducibility engineering
from ``operators/clustering.py`` so even the PQ index build is
hash-checked bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import load_tables
from ..streaming.materialize import await_or_raise as _await_or_raise
from .registry import register

TS_FMT = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


# --------------------------------------------- multi-resolution rollup

_ROLLUP_RES_SQL = """
    SELECT '{res}' AS resolution,
           strftime(date_trunc('{res}', m), '{fmt}') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(v) AS DOUBLE) AS total_value
    FROM base GROUP BY date_trunc('{res}', m), event_type"""


_ROLLUP_ORACLE = (
    """
    WITH base AS (
      SELECT date_trunc('minute', ts) AS m, event_type,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events
    )"""
    + " UNION ALL ".join(
        _ROLLUP_RES_SQL.format(res=r, fmt=TS_FMT_DUCK)
        for r in ("minute", "hour", "day")
    )
)


@register("events_hypertable_rollup", oracle=_ROLLUP_ORACLE)
def events_hypertable_rollup(spark, sf_dir):
    """Hypertable-style continuous-aggregate cascade: one scan feeds a
    minute-grain rollup, and each coarser grain re-aggregates the next
    finer one (minute → hour → day) instead of rescanning the fact
    table — the TimescaleDB/continuous-aggregate pattern. At 100 TB the
    cascade is the whole point: the hour and day shuffles run over the
    (tiny) minute aggregate, not the raw events. Values accumulate as
    DECIMAL(18,6) so the cascaded sums are bit-identical to the
    oracle's direct per-resolution GROUP BYs (exact addition is
    associative; double summation would not be)."""
    ev = load_tables(spark, sf_dir)["events"]
    base = ev.select(
        F.date_trunc("minute", "ts").alias("bucket"),
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    # persist() makes the cascade REAL in the physical plan: without it
    # Spark recomputes each union branch from the raw scan (3 scans, 6
    # shuffles); with it the hour/day branches re-aggregate the cached
    # minute/hour outputs (InMemoryTableScan). CacheManager dedupes by
    # canonicalized plan, so repeated calls share one cache entry.
    # bound: one row per (minute, event_type) — time-bucket-bounded,
    # never event-row-scale
    minute = base.groupBy("bucket", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    ).persist()
    return _cascade_render(minute)


def _cascade_render(minute: DataFrame) -> DataFrame:
    """minute-grain (bucket, event_type, n, sv-decimal) → the rendered
    three-resolution union, re-aggregating each coarser grain from the
    next finer one."""
    # bound: 1/60th of the minute-grain rows
    hour = minute.groupBy(
        F.date_trunc("hour", "bucket").alias("bucket"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv")).persist()
    day = hour.groupBy(
        F.date_trunc("day", "bucket").alias("bucket"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))

    def render(df: DataFrame, res: str) -> DataFrame:
        return df.select(
            F.lit(res).alias("resolution"),
            F.date_format("bucket", TS_FMT).alias("window_start"),
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("sv").cast("double").alias("total_value"),
        )

    return (
        render(minute, "minute")
        .unionAll(render(hour, "hour"))
        .unionAll(render(day, "day"))
    )


@register("streaming_hypertable_rollup", oracle=_ROLLUP_ORACLE)
def streaming_hypertable_rollup(spark, sf_dir):
    """The hypertable rollup maintained INCREMENTALLY through real
    Structured Streaming — the continuous-aggregate pattern: each
    micro-batch (maxFilesPerTrigger=1 over a 6-file copy of events, so
    ≥6 batches; asserted in-query) folds its rows into minute-grain
    partials inside ``foreachBatch``, writing to a batch_id-keyed
    directory (overwrite ⇒ a retried batch replaces itself instead of
    double-counting — additive merges are retry-UNSAFE without this).
    The materialized minute store is then cascaded to hour/day exactly
    like the batch query, and the whole three-resolution output equals
    the batch oracle bit-for-bit because partials sum as DECIMAL (exact
    addition commutes with any micro-batch split). At scale this is the
    streaming ingest path of a time-series store: per-batch work is
    proportional to the batch, never to history."""
    import glob

    from ..streaming.materialize import session_tmpdir

    ev = load_tables(spark, sf_dir)["events"]
    base_dir = session_tmpdir("stream_rollup")
    src = f"{base_dir}/src"
    ev.repartition(6).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    store = f"{base_dir}/minute_store"

    def maintain(bdf: DataFrame, batch_id: int) -> None:
        part = (
            bdf.select(
                F.date_trunc("minute", "ts").alias("bucket"),
                "event_type",
                F.col("value").cast("decimal(18,6)").alias("v"),
            )
            .groupBy("bucket", "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        )
        part.write.mode("overwrite").parquet(f"{store}/batch={batch_id}")

    q = (
        stream.writeStream.foreachBatch(maintain)
        .option("checkpointLocation", f"{base_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, 300)
    n_batches = len(glob.glob(f"{store}/batch=*"))
    if n_batches < 2:
        raise ValueError(
            f"expected incremental maintenance, got {n_batches} batches"
        )
    minute = (
        spark.read.parquet(store)
        .groupBy("bucket", "event_type")
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
        # bound: one row per (minute, event_type) — see cascade note
        .persist()
    )
    return _cascade_render(minute)


# --------------------------------------------------- equi-depth histogram

_DECILES = [i / 10 for i in range(1, 10)]


@register(
    "agg_equi_depth_histogram",
    oracle=f"""
    WITH bs AS (
      SELECT list_transform(
               quantile_cont(l_extendedprice,
                             {_DECILES}),
               x -> round(x, 4)) AS b
      FROM lineitem
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           round(min(p), 2) AS lo, round(max(p), 2) AS hi
    FROM (
      SELECT l_extendedprice AS p,
             CAST(1 + len(list_filter(b, x -> l_extendedprice > x))
                  AS INTEGER) AS bucket
      FROM lineitem, bs
    ) GROUP BY bucket
    """,
)
def agg_equi_depth_histogram(spark, sf_dir):
    """Equi-depth (decile) histogram of l_extendedprice — the two-phase
    scale shape, NOT a global ntile window: boundaries come from one
    bounded percentile aggregate (exact here; swaps to
    ``approx_percentile`` verbatim at 100 TB), broadcast to a map-side
    bucket assignment (`1 + #boundaries below`, strict `>` so both
    engines agree on boundary ties), then a 10-group aggregate. No
    global sort, no single-partition window anywhere — `ntile()` over
    the full table, the textbook formulation, would funnel every row
    through one partition. Boundaries are rounded to 4dp on BOTH
    engines before comparison so interpolation ulp noise can't flip a
    bucket."""
    li = load_tables(spark, sf_dir)["lineitem"]
    bounds = li.agg(
        F.percentile(
            "l_extendedprice", F.array(*[F.lit(p) for p in _DECILES])
        ).alias("b")
    ).select(F.transform("b", lambda x: F.round(x, 4)).alias("b"))
    bucketed = li.crossJoin(F.broadcast(bounds)).select(
        F.col("l_extendedprice").alias("p"),
        (
            F.lit(1)
            + F.aggregate(
                "b",
                F.lit(0),
                lambda acc, x: acc
                + F.when(F.col("l_extendedprice") > x, 1).otherwise(0),
            )
        )
        .cast("int")
        .alias("bucket"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("p"), 2).alias("lo"),
        F.round(F.max("p"), 2).alias("hi"),
    )


# ------------------------------------------------------ anomaly z-score


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH st AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
             sum(CAST(value AS DECIMAL(18,6))) AS s1,
             sum(CAST(value * value AS DECIMAL(28,12))) AS s2
      FROM events GROUP BY event_type
    )
    SELECT event_id, event_type, round(value, 2) AS value, z
    FROM (
      SELECT event_id, e.event_type, value,
             round((value - CAST(s1 AS DOUBLE) / cnt)
                   / sqrt(CAST(s2 AS DOUBLE) / cnt
                          - (CAST(s1 AS DOUBLE) / cnt)
                            * (CAST(s1 AS DOUBLE) / cnt)), 3) AS z
      FROM events e JOIN st USING (event_type)
    ) WHERE abs(z) > 2.5
    """,
)
def events_anomaly_zscore(spark, sf_dir):
    """Per-group anomaly detection: population z-score against the
    event_type's mean/stddev, flag |z| > 2.5. Moments accumulate as
    DECIMAL (exact, partition-order independent), then ONE double
    division per group — the identical IEEE expression tree on both
    engines, so z is bit-reproducible and the threshold can't flip.
    Scale shape: tiny stats aggregate broadcast back onto the stream —
    the fact table never shuffles."""
    ev = load_tables(spark, sf_dir)["events"]
    v = F.col("value")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(v.cast("decimal(18,6)")).alias("s1"),
        F.sum((v * v).cast("decimal(28,12)")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("cnt")
    msq = F.col("s2").cast("double") / F.col("cnt")
    z = F.round((v - mean) / F.sqrt(msq - mean * mean), 3)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round(v, 2).alias("value"),
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) > 2.5)
    )


# ------------------------------------------------- Z-order file layout

_ZBITS = 8  # 8 bits per dimension -> 16-bit Z value


def _z_interleave_col(x, y):
    z = F.lit(0).cast("long")
    for i in range(_ZBITS):
        z = z + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(
            F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    return z


def _z_interleave_sql(x: str, y: str) -> str:
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "layout_zorder_stats",
    oracle=f"""
    WITH pts AS (
      SELECT user_id % 256 AS x,
             (hour(ts) * 60 + minute(ts)) % 256 AS y
      FROM events
    ),
    zed AS (
      SELECT x, y, {_z_interleave_sql('x', 'y')} AS z FROM pts
    )
    SELECT CAST(z >> 9 AS INTEGER) AS file_id,
           CAST(count(*) AS BIGINT) AS n,
           min(x) AS x_lo, max(x) AS x_hi,
           min(y) AS y_lo, max(y) AS y_hi
    FROM zed GROUP BY 1
    """,
)
def layout_zorder_stats(spark, sf_dir):
    """Z-order (Morton-curve) file-layout assignment over two scan
    dimensions — user_id and minute-of-day — with per-file min/max
    ranges, i.e. exactly the parquet row-group statistics a clustered
    write would produce. The interleave is a pure JVM bit expression
    (no UDF); at scale the same z column feeds repartitionByRange
    before the write so BOTH `WHERE user_id = ?` and time-range
    predicates prune most files — the Delta/Iceberg OPTIMIZE ZORDER
    pattern. Each emitted file covers a bounded rectangle of the
    (x, y) space; a linear layout would cover full-width stripes."""
    ev = load_tables(spark, sf_dir)["events"]
    pts = ev.select(
        F.pmod(F.col("user_id"), F.lit(256)).cast("long").alias("x"),
        F.pmod(F.hour("ts") * 60 + F.minute("ts"), F.lit(256))
        .cast("long")
        .alias("y"),
    )
    zed = pts.withColumn("z", _z_interleave_col(F.col("x"), F.col("y")))
    return (
        zed.groupBy(F.shiftright("z", 9).cast("int").alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("x_lo"),
            F.max("x").alias("x_hi"),
            F.min("y").alias("y_lo"),
            F.max("y").alias("y_hi"),
        )
    )


# ---------------------------------------- product quantization ADC ANN

_PQ_M = 8          # subspaces
_PQ_SUB = 8        # dims per subspace (8 x 8 = 64-dim embeddings)
_PQ_K = 16         # codes per subspace codebook
_PQ_TOPK = 10
_PQ_SHORT = 100    # ADC shortlist size per query before exact re-rank
_PQ_NQ = 10        # query vectors: vec_id < 10

_PQ_SUBSPACE_SQL = """
    sub{s} AS (
      SELECT id, pos - {lo} AS pos, val FROM elems
      WHERE pos >= {lo} AND pos < {hi}
    ),
    c0_{s} AS (
      SELECT CAST(id AS INTEGER) AS cl, pos, val AS cval
      FROM sub{s} WHERE id < {k}
    ),
    d1_{s} AS (
      SELECT e.id, c.cl,
             sum(CAST((e.val - c.cval) * (e.val - c.cval)
                 AS DECIMAL(28,14))) AS dist
      FROM sub{s} e JOIN c0_{s} c USING (pos) GROUP BY e.id, c.cl
    ),
    a1_{s} AS (
      SELECT id, cl FROM (
        SELECT id, cl,
               row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn
        FROM d1_{s}) WHERE rn = 1
    ),
    c1_{s} AS (
      SELECT a.cl, e.pos,
             CAST(sum(CAST(e.val AS DECIMAL(24,12))) AS DOUBLE) / count(*)
               AS cval
      FROM sub{s} e JOIN a1_{s} a USING (id) GROUP BY a.cl, e.pos
    ),
    d2_{s} AS (
      SELECT e.id, c.cl,
             sum(CAST((e.val - c.cval) * (e.val - c.cval)
                 AS DECIMAL(28,14))) AS dist
      FROM sub{s} e JOIN c1_{s} c USING (pos) GROUP BY e.id, c.cl
    ),
    code{s} AS (
      SELECT id, cl FROM (
        SELECT id, cl,
               row_number() OVER (PARTITION BY id ORDER BY dist, cl) AS rn
        FROM d2_{s}) WHERE rn = 1
    ),
    part{s} AS (
      SELECT l.id AS query_id, co.id AS vec_id, l.dist
      FROM code{s} co JOIN d2_{s} l ON l.cl = co.cl AND l.id < {nq}
    )"""


def _pq_oracle() -> str:
    pieces = [
        _PQ_SUBSPACE_SQL.format(
            s=s,
            lo=s * _PQ_SUB,
            hi=(s + 1) * _PQ_SUB,
            k=_PQ_K,
            nq=_PQ_NQ,
        )
        for s in range(_PQ_M)
    ]
    union = " UNION ALL ".join(
        f"SELECT * FROM part{s}" for s in range(_PQ_M)
    )
    return f"""
    WITH elems AS (
      SELECT vec_id AS id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings,
           unnest(generate_series(1, len(embedding))) AS t(i)
    ),
    {','.join(pieces)},
    tot AS (
      SELECT query_id, vec_id, sum(dist) AS adist
      FROM ({union}) GROUP BY query_id, vec_id
    ),
    short AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adist, vec_id) AS srn
        FROM tot WHERE vec_id <> query_id
      ) WHERE srn <= {_PQ_SHORT}
    ),
    ex AS (
      SELECT s.query_id, s.vec_id,
             sum(CAST((q.val - c.val) * (q.val - c.val)
                 AS DECIMAL(28,14))) AS dist
      FROM short s
      JOIN elems c ON c.id = s.vec_id
      JOIN elems q ON q.id = s.query_id AND q.pos = c.pos
      GROUP BY s.query_id, s.vec_id
    )
    SELECT query_id, vec_id,
           round(CAST(dist AS DOUBLE), 6) AS dist, rank
    FROM (
      SELECT query_id, vec_id, dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY dist, vec_id) AS rank
      FROM ex
    ) WHERE rank <= {_PQ_TOPK}
    """


@register("embedding_pq_adc_topk", oracle=_pq_oracle())
def embedding_pq_adc_topk(spark, sf_dir):
    """Product-quantization ANN, shortlist-then-rerank form: the 64-dim
    corpus splits into 8 subspaces of 8 dims, each with a 16-code
    codebook from the DECIMAL-exact Lloyd rounds
    (operators/clustering.py), so every vector compresses to 8 codes
    (8 bytes vs 256 — the memory contract that makes billion-vector ANN
    fit in RAM). The asymmetric-distance (ADC) scan never decodes the
    corpus — a broadcast per-query LUT of query↔centroid distances
    (m·k entries) makes each corpus vector `sum of m LUT probes` — and
    produces a 100-candidate shortlist; only those are re-ranked by
    exact L2 against raw vectors (recall@10 ≈ 0.85, pinned by
    tests/test_analytics_extras.py). Every stage is bit-reproducible,
    so the APPROXIMATE result carries a full DuckDB oracle that
    re-derives codebooks, codes, LUTs and both rankings from first
    principles."""
    from ..operators.clustering import pq_adc_rerank_topk

    emb = load_tables(spark, sf_dir)["embeddings"]
    return pq_adc_rerank_topk(
        emb,
        emb.filter(F.col("vec_id") < _PQ_NQ),
        k=_PQ_TOPK,
        shortlist=_PQ_SHORT,
        m=_PQ_M,
        sub_dim=_PQ_SUB,
        ksub=_PQ_K,
    )
