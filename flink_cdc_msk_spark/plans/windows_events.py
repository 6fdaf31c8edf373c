"""Event-stream analytics over the ``events`` table (SURVEY.md Part B:
streaming stateful operators, verified here in their batch form — the
streaming variants live in flink_cdc_msk_spark.streaming and are
smoke-tested with availableNow triggers).
"""

from __future__ import annotations

import pandas as pd  # module scope: pandas-UDF type hints must resolve here
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.bcast import dim_broadcast
from ..streaming.materialize import await_or_raise as _await_or_raise
from ..sources.tables import load_tables
from .registry import register

TS_FMT = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _ev(spark, sf_dir):
    return load_tables(spark, sf_dir)["events"]


@register(
    "events_tumbling_hour",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_tumbling_hour(spark, sf_dir):
    """Tumbling 1h window — uses Spark's window() operator (epoch-aligned,
    identical to date_trunc for whole-hour tumbling)."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "streaming_tumbling_counts",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def streaming_tumbling_counts(spark, sf_dir):
    """events_tumbling_hour executed through REAL Structured Streaming:
    parquet file stream → watermarked tumbling window (append mode) →
    parquet sink → batch scan, checked against the SAME relational
    oracle. Append-mode windowed aggregation only emits windows the
    watermark has passed, so a sentinel event 4h past the corpus max
    (watermark delay 2h) pushes every real window final; the sentinel's
    own window stays open and never emits — the streaming output equals
    the batch groupBy exactly, which is the whole claim."""
    from datetime import timedelta

    from ..streaming.materialize import session_tmpdir, stream_to_parquet
    from ..streaming.windows import tumbling_counts

    # Watermarks require TIMESTAMP (not NTZ); pin the session timezone so
    # the ntz→timestamp cast (and the window strings below) are identical
    # under ANY caller session — the driver imports with an un-tuned one.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _ev(spark, sf_dir).select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
    )
    d = session_tmpdir("stream_tumble_")
    max_ts = ev.agg(F.max("ts")).first()[0]  # 1-row bound lookup
    sentinel = spark.createDataFrame(
        [(max_ts + timedelta(hours=4), "__sentinel__", 0.0)],
        "ts timestamp, event_type string, value double",
    )
    ev.unionByName(sentinel).repartition(4).write.parquet(f"{d}/src")
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(f"{d}/src")
    out = tumbling_counts(stream, window="1 hour", watermark="2 hours")
    scan = stream_to_parquet(out, d)
    return scan.select(
        F.date_format("window_start", TS_FMT).alias("window_start"),
        "event_type",
        "n",
        "total_value",
    )


@register(
    "streaming_session_windows",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *, sum(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS session_value
    FROM numbered GROUP BY user_id, session_id
    """,
)
def streaming_session_windows(spark, sf_dir):
    """Built-in ``session_window`` (30-min gap) through REAL Structured
    Streaming — the dynamic-state operator where adjacent sessions merge
    as events arrive — checked against the batch gaps-and-islands oracle
    (same sessionization, two formulations). Sentinel event 4h past the
    corpus max closes every real session under the 2h watermark; append
    mode then emits exactly the final merged sessions."""
    from datetime import timedelta

    from ..streaming.materialize import session_tmpdir, stream_to_parquet
    from ..streaming.windows import sessionized

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _ev(spark, sf_dir).select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id", "value"
    )
    d = session_tmpdir("stream_sess_")
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel = spark.createDataFrame(
        [(max_ts + timedelta(hours=4), -1, 0.0)],
        "ts timestamp, user_id long, value double",
    )
    ev.unionByName(sentinel).repartition(4).write.parquet(f"{d}/src")
    stream = spark.readStream.schema(
        "ts timestamp, user_id long, value double"
    ).parquet(f"{d}/src")
    out = sessionized(stream, gap="30 minutes", watermark="2 hours")
    scan = stream_to_parquet(out, d)
    return scan.filter(F.col("user_id") != -1).select(
        "user_id",
        F.date_format("session_start", TS_FMT).alias("session_start"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("session_value", 2).alias("session_value"),
    )


@register(
    "events_sliding_window",
    oracle=f"""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE, value
      FROM events
    )
    SELECT strftime(ws, '{TS_FMT_DUCK}') AS window_start,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM assigned GROUP BY ws
    """,
)
def events_sliding_window(spark, sf_dir):
    """Sliding window (1h length, 30min slide): each event lands in 2
    windows. Oracle reproduces the assignment with two shifted 30-min
    buckets."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            "n",
            "total_value",
        )
    )


@register(
    "events_session_gaps",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *, CAST(sum(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
           strftime(max(ts), '{TS_FMT_DUCK}') AS session_end,
           round(sum(value), 2) AS session_value
    FROM numbered GROUP BY user_id, session_id
    """,
)
def events_session_gaps(spark, sf_dir):
    """Sessionization with a 30-min inactivity gap (gaps-and-islands).

    Batch equivalent of session_window(): flag session starts with lag(),
    number sessions with a running sum — one shuffle on user_id, both
    window passes reuse the same partitioning (no second exchange)."""
    ev = _ev(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap = F.col("ts") - F.lag(F.col("ts")).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > F.expr("INTERVAL 30 MINUTE")), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id", F.sum("new_session").over(wrun).cast("bigint")
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
        F.date_format(F.max("ts"), TS_FMT).alias("session_end"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


@register(
    "events_latest_state",
    oracle="""
    SELECT user_id, event_type, event_id, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def events_latest_state(spark, sf_dir):
    """Latest event per (user, type) — the keyed-state compaction pattern
    (streaming twin: dropDuplicates within watermark).

    ``max_by`` with a (ts, event_id) ordering struct instead of a
    row_number window: partial aggregation combines map-side and there is
    no per-key sort — the skew-robust argmax shape for hot keys at scale."""
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.max_by(
                F.struct("event_id", "value"), F.struct("ts", "event_id")
            ).alias("s")
        )
        .select(
            "user_id",
            "event_type",
            F.col("s.event_id").alias("event_id"),
            F.col("s.value").alias("value"),
        )
    )


@register(
    "events_type_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'view')     AS view,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'error')    AS error
    FROM events GROUP BY user_id
    """,
)
def events_type_pivot(spark, sf_dir):
    """Pivot on a known value set (explicit values → no extra distinct
    pass, single shuffle)."""
    ev = _ev(spark, sf_dir)
    types = ["click", "view", "purchase", "signup", "error"]
    out = ev.groupBy("user_id").pivot("event_type", types).count()
    # pivot leaves null for absent combos; the oracle's FILTER counts give 0
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types],
    )


@register(
    "events_value_histogram",
    oracle="""
    SELECT CAST(floor(value / 10) AS BIGINT) AS bucket,
           count(*) AS n,
           round(min(value), 2) AS lo,
           round(max(value), 2) AS hi
    FROM events GROUP BY 1
    """,
)
def events_value_histogram(spark, sf_dir):
    ev = _ev(spark, sf_dir)
    return ev.groupBy(
        F.floor(F.col("value") / 10).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 2).alias("lo"),
        F.round(F.max("value"), 2).alias("hi"),
    )


@register(
    "streaming_running_totals",
    oracle="""
    SELECT event_type AS key,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY event_type
    """,
)
def streaming_running_totals(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState) run
    end-to-end and checked against a relational oracle: stream the events
    table through per-key running (count, sum) state, then take each
    key's final emitted row — which must equal the batch groupBy. Proves
    arbitrary-state streaming produces exactly the batch semantics.

    Update-mode state output can't go straight to a file sink, so the
    stream appends each micro-batch via ``foreachBatch`` (idempotent
    per-batch parquet dirs) and the final-row-per-key aggregation runs
    over the batch SCAN — no driver-side collect (the round-1 shape
    re-materialized the memory sink through the driver)."""
    from ..streaming.materialize import (
        session_tmpdir,
        stream_foreach_batch_parquet,
    )
    from ..streaming.stateful import running_totals

    ev = _ev(spark, sf_dir).select("event_type", "value")
    d = session_tmpdir("stream_totals_q_")
    ev.write.mode("overwrite").json(f"{d}/src")
    stream = spark.readStream.schema("event_type string, value double").json(
        f"{d}/src"
    )
    out = running_totals(stream, key="event_type", value_col="value")
    scan = stream_foreach_batch_parquet(out, d, output_mode="update")
    # final row per key = the one with the max running count
    return (
        scan.groupBy("key")
        .agg(F.max_by(F.struct("n", "total"), "n").alias("s"))
        .select(
            "key",
            F.col("s.n").alias("n"),
            F.round(F.col("s.total"), 2).alias("total"),
        )
    )


@register(
    "streaming_tws_user_stats",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total,
           round(min(value), 6) + 0 AS v_min,
           round(max(value), 6) + 0 AS v_max
    FROM events GROUP BY user_id
    """,
)
def streaming_tws_user_stats(spark, sf_dir):
    """``transformWithStateInPandas`` (the Spark 4 arbitrary-state API:
    typed ValueState handles + RocksDB provider) run end-to-end and
    checked against the batch groupBy — the successor of
    applyInPandasWithState (``streaming_running_totals``) verified with
    the same final-row-per-key technique. Requires ``google.protobuf``
    for the state-server protocol; this repo ships a namespace shim
    (``google/``) that aliases the machine's cloud-sdk protobuf runtime
    where no real install exists."""
    from google.protobuf import descriptor  # noqa: F401 — env gate

    from ..streaming.materialize import (
        session_tmpdir,
        stream_foreach_batch_parquet,
    )
    from ..streaming.stateful import user_stats_tws

    ev = _ev(spark, sf_dir).select("user_id", "value")
    d = session_tmpdir("stream_tws_q_")
    ev.write.mode("overwrite").json(f"{d}/src")
    stream = spark.readStream.schema("user_id long, value double").json(
        f"{d}/src"
    )
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov_key, None)
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        out = user_stats_tws(stream)
        scan = stream_foreach_batch_parquet(out, d, output_mode="update")
    finally:
        if prev is None:
            spark.conf.unset(prov_key)
        else:
            spark.conf.set(prov_key, prev)
    return (
        scan.groupBy("user_id")
        .agg(F.max_by(F.struct("n", "total", "v_min", "v_max"), "n").alias("s"))
        .select(
            "user_id",
            F.col("s.n").alias("n"),
            F.round(F.col("s.total"), 2).alias("total"),
            (F.round(F.col("s.v_min"), 6) + F.lit(0.0)).alias("v_min"),
            (F.round(F.col("s.v_max"), 6) + F.lit(0.0)).alias("v_max"),
        )
    )


@register(
    "streaming_dedup_exact",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_kept
    FROM (
      SELECT DISTINCT event_type, CAST(floor(value * 10) AS BIGINT) AS vb
      FROM events
    )
    GROUP BY event_type
    """,
)
def streaming_dedup_exact(spark, sf_dir):
    """Streaming exact dedup via ``dropDuplicatesWithinWatermark`` run
    end-to-end: stream the events table, dedup on a deliberately
    collision-heavy key (event_type, value-decile bucket), count
    survivors per type — which must equal the batch DISTINCT. Watermarked
    so per-key state expires at scale instead of growing forever; the
    availableNow replay keeps every key inside the horizon, so the
    streaming result is exactly the batch semantics."""
    from ..streaming.materialize import session_tmpdir, stream_to_parquet
    from ..streaming.windows import streaming_dedup

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _ev(spark, sf_dir).select(
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        F.floor(F.col("value") * 10).cast("bigint").alias("vb"),
    )
    d = session_tmpdir("stream_dedup_")
    ev.repartition(4).write.parquet(f"{d}/src")
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, vb bigint"
    ).parquet(f"{d}/src")
    deduped = streaming_dedup(
        stream, keys=["event_type", "vb"], watermark="10 days"
    )
    scan = stream_to_parquet(deduped, d)
    return scan.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_kept"))


@register(
    "pandas_grouped_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(median(value), 6) AS median_value,
           round(mad(value), 6) AS mad_value,
           round(exp(avg(ln(1 + value))) - 1, 6) AS geo_mean
    FROM events GROUP BY event_type
    """,
)
def pandas_grouped_stats(spark, sf_dir):
    """The grouped-map + UDAF corner of the UDF surface (SURVEY.md Part B):
    per-type robust statistics via ``applyInPandas`` (median + median
    absolute deviation — order statistics Spark has no combinable
    aggregate for) and a pandas-UDF UDAF (log-space geometric mean) in a
    regular ``agg``. Arrow-batched both ways; groups are the 5 event
    types, so the grouped-map shuffle is tiny — at scale the same shape
    holds as long as group cardinality × group size fits one task (use
    approx_percentile otherwise)."""
    from pyspark.sql.functions import pandas_udf

    ev = _ev(spark, sf_dir).select("event_type", "value")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        med = v.median()
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(v)],
                "median_value": [round(med, 6)],
                "mad_value": [round((v - med).abs().median(), 6)],
            }
        )

    grouped = ev.groupBy("event_type").applyInPandas(
        stats,
        "event_type string, n bigint, median_value double, mad_value double",
    )

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        import numpy as np

        return float(np.expm1(np.log1p(v).mean()))

    udaf = ev.groupBy("event_type").agg(
        F.round(geo_mean("value"), 6).alias("geo_mean")
    )
    return grouped.join(udaf, "event_type").select(
        "event_type", "n", "median_value", "mad_value", "geo_mean"
    )


@register(
    "streaming_interval_join",
    oracle=f"""
    SELECT c.event_id AS click_id,
           c.user_id,
           strftime(c.ts, '{TS_FMT_DUCK}') AS click_ts,
           v.event_id AS view_id,
           strftime(v.ts, '{TS_FMT_DUCK}') AS view_ts,
           round(v.value, 2) AS view_value
    FROM events c
    JOIN events v
      ON v.user_id = c.user_id
     AND v.ts BETWEEN c.ts - INTERVAL 10 MINUTE AND c.ts
    WHERE c.event_type = 'click' AND v.event_type = 'view'
    """,
)
def streaming_interval_join(spark, sf_dir):
    """Stream-stream INTERVAL JOIN through real Structured Streaming:
    every click joined to the same user's views in the preceding 10
    minutes — the attribution join. Both sides carry a 2h watermark and
    the join condition bounds event-time distance, so Spark provably
    expires join state (a stream-stream join without both is unbounded
    state — the planner rejects it in append mode). Inner joins emit on
    match, so no sentinel row is needed; the availableNow run must equal
    the batch interval join, which is the oracle.

    Scale shape: state is hash-partitioned on user_id on both sides and
    bounded by watermark + interval; at 100 TB/day this is the standard
    clickstream-attribution topology."""
    from ..streaming.materialize import session_tmpdir, stream_to_parquet

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _ev(spark, sf_dir).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    d = session_tmpdir("stream_ijoin_")
    ev.repartition(4).write.parquet(f"{d}/src")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    ).parquet(f"{d}/src")
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("value").alias("v_value"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    joined = clicks.join(
        views,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("view_ts") <= F.col("click_ts")),
    )
    scan = stream_to_parquet(joined, d)
    return scan.select(
        "click_id",
        F.col("c_user").alias("user_id"),
        F.date_format("click_ts", TS_FMT).alias("click_ts"),
        "view_id",
        F.date_format("view_ts", TS_FMT).alias("view_ts"),
        F.round("v_value", 2).alias("view_value"),
    )


@register(
    "streaming_left_outer_interval_join",
    oracle=f"""
    SELECT c.event_id AS click_id,
           c.user_id,
           strftime(c.ts, '{TS_FMT_DUCK}') AS click_ts,
           v.event_id AS view_id,
           round(v.value, 2) AS view_value
    FROM events c
    LEFT JOIN events v
      ON v.user_id = c.user_id
     AND v.event_type = 'view'
     AND v.ts BETWEEN c.ts - INTERVAL 10 MINUTE AND c.ts
    WHERE c.event_type = 'click'
    """,
)
def streaming_left_outer_interval_join(spark, sf_dir):
    """Stream-stream LEFT OUTER interval join — the semantically hard
    variant: an unmatched click's null row may only be emitted once the
    watermark proves no matching view can still arrive. Sentinel events
    4h past the corpus max on BOTH branches (each branch's watermark is
    tracked at its own ``withWatermark`` node, after the filter — a
    sentinel that one filter drops would never advance that side) push
    the global watermark past every real click, so availableNow emits
    exactly the batch LEFT JOIN; sentinels are scrubbed from the output.

    Scale shape: identical bounded state to the inner variant plus a
    per-click "seen a match" bit; emission latency is the watermark
    delay, the price of correct null rows."""
    from datetime import timedelta

    from ..streaming.materialize import session_tmpdir, stream_to_parquet

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _ev(spark, sf_dir).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    d = session_tmpdir("stream_lojoin_")
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinels = spark.createDataFrame(
        [
            (-1, max_ts + timedelta(hours=4), -1, "click", 0.0),
            (-2, max_ts + timedelta(hours=4), -1, "view", 0.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    ev.unionByName(sentinels).repartition(4).write.parquet(f"{d}/src")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double"
    ).parquet(f"{d}/src")
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("value").alias("v_value"),
        )
        .withWatermark("view_ts", "2 hours")
    )
    joined = clicks.join(
        views,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("view_ts") <= F.col("click_ts")),
        "left_outer",
    )
    scan = stream_to_parquet(joined, d)
    return scan.filter(F.col("c_user") != -1).select(
        "click_id",
        F.col("c_user").alias("user_id"),
        F.date_format("click_ts", TS_FMT).alias("click_ts"),
        "view_id",
        F.round("v_value", 2).alias("view_value"),
    )


@register(
    "events_resample_gapfill",
    oracle=f"""
    WITH bounds AS (
      SELECT min(date_trunc('hour', ts)) AS lo,
             max(date_trunc('hour', ts)) AS hi
      FROM events
    ), grid AS (
      SELECT g.h FROM bounds,
        unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS g(h)
    ), agg AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             count(*) AS n, round(sum(value), 2) AS total_value
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), types AS (SELECT DISTINCT event_type FROM events)
    SELECT types.event_type,
           strftime(grid.h, '{TS_FMT_DUCK}') AS bucket,
           coalesce(agg.n, 0) AS n,
           coalesce(agg.total_value, 0.0) AS total_value
    FROM grid CROSS JOIN types
    LEFT JOIN agg ON agg.h = grid.h AND agg.event_type = types.event_type
    """,
)
def events_resample_gapfill(spark, sf_dir):
    """Time-series resample with gap filling: hourly buckets per event
    type over the full [min, max] hour grid, empty buckets zero-filled —
    the densification step before rolling-window models (which assume a
    complete, regular grid).

    Scale shape: the dense grid is GENERATED, not scanned — a one-row
    bounds aggregate exploded via ``sequence()`` (map-side), cross-joined
    with the distinct-type dimension (broadcast — |types| rows), then a
    LEFT join against the hourly aggregate on the same (type, hour) key
    the agg already shuffled on. The raw event stream is read once; no
    per-row Python, no global sort. Grid size = hours × types — bounded
    by the time range, independent of event volume."""
    ev = _ev(spark, sf_dir).select(
        F.date_trunc("hour", "ts").alias("h"), "event_type", "value"
    )
    bounds = ev.agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    types = ev.select("event_type").distinct()
    agg = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return (
        grid.crossJoin(F.broadcast(types))
        .join(agg, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.date_format("h", TS_FMT).alias("bucket"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        )
    )


@register(
    "scalar_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           CASE WHEN json_extract(props, '$.k') IS NOT NULL
                THEN 1 ELSE 0 END AS has_k,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled
    FROM events
    """,
)
def scalar_map_funcs(spark, sf_dir):
    """Map-typed column surface: parse the per-event JSON props into a
    real ``map<string,bigint>`` and exercise the map function family —
    size, element_at, membership, and ``transform_values`` (value-side
    higher-order rewrite). Map-side only; the map never shuffles."""
    ev = _ev(spark, sf_dir).select("event_id", "props")
    m = F.from_json("props", "map<string,bigint>")
    doubled = F.transform_values(m, lambda k, v: v * 2)
    return ev.select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.element_at(m, "k").alias("k_value"),
        F.when(F.map_contains_key(m, "k"), 1).otherwise(0).alias("has_k"),
        F.element_at(doubled, "k").alias("k_doubled"),
    )


@register(
    "events_funnel_conversion",
    oracle=f"""
    WITH v AS (
      SELECT user_id, min(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS first_click
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.first_view
        AND e.ts <= v.first_view + INTERVAL 1 HOUR
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.first_click
        AND e.ts <= c.first_click + INTERVAL 1 HOUR
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT count(*) FROM p) AS BIGINT)
             AS n_view_click_purchase
    """,
)
def events_funnel_conversion(spark, sf_dir):
    """Ordered funnel (view → click → purchase, each stage within one
    hour of the previous — the conversion-window variant): per-stage first-occurrence timestamps chained through
    ordered joins, counting users surviving each stage. One pass builds
    all three per-user stage times via conditional aggregation — the
    event stream shuffles ONCE on user_id; stage chaining is then
    row-local arithmetic (no self-joins, vs the oracle's 3-scan
    formulation). At 100 TB: one shuffle of (user, 3 timestamps)."""
    ev = _ev(spark, sf_dir).select("user_id", "event_type", "ts")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        # first click AFTER first view: min over clicks later than the
        # user's first view — needs the view time first, so compute via
        # max_by-style conditional on the sorted event set instead:
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("event_type").isin("view", "click", "purchase"),
                    F.struct("ts", "event_type"),
                )
            )
        ).alias("seq"),
    )
    # walk the per-user time-sorted (ts, type) array once, map-side:
    # aggregate() carries (view_ts, click_ts, purchase_ts) through the
    # fold — the standard funnel automaton, O(events per user)
    state0 = F.struct(
        F.lit(None).cast("timestamp_ntz").alias("v"),
        F.lit(None).cast("timestamp_ntz").alias("c"),
        F.lit(None).cast("timestamp_ntz").alias("p"),
    )

    def step(acc, e):
        is_view = e["event_type"] == "view"
        is_click = e["event_type"] == "click"
        is_purchase = e["event_type"] == "purchase"
        v = F.when(acc["v"].isNull() & is_view, e["ts"]).otherwise(acc["v"])
        c = F.when(
            acc["c"].isNull()
            & is_click
            & acc["v"].isNotNull()
            & (e["ts"] > acc["v"])
            & (e["ts"] <= acc["v"] + F.expr("INTERVAL 1 HOUR")),
            e["ts"],
        ).otherwise(acc["c"])
        p = F.when(
            acc["p"].isNull()
            & is_purchase
            & acc["c"].isNotNull()
            & (e["ts"] > acc["c"])
            & (e["ts"] <= acc["c"] + F.expr("INTERVAL 1 HOUR")),
            e["ts"],
        ).otherwise(acc["p"])
        return F.struct(v.alias("v"), c.alias("c"), p.alias("p"))

    walked = per_user.select(
        F.aggregate("seq", state0, step).alias("s")
    )
    return walked.agg(
        F.count(F.col("s.v")).alias("n_view"),
        F.count(F.col("s.c")).alias("n_view_click"),
        F.count(F.col("s.p")).alias("n_view_click_purchase"),
    )


@register(
    "events_cohort_retention",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
      FROM events
    )
    SELECT strftime(f.cohort_week, '{TS_FMT_DUCK}') AS cohort_week,
           CAST(date_diff('week', f.cohort_week, a.act_week) AS BIGINT)
             AS week_offset,
           count(DISTINCT a.user_id) AS active_users
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY f.cohort_week, date_diff('week', f.cohort_week, a.act_week)
    """,
)
def events_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen week, counted
    distinct in each subsequent week offset — the standard
    retention-curve input. Two shuffles on user_id (first-week agg +
    distinct activity, same key → AQE reuses the exchange), then one
    small agg on (cohort, offset); the event stream is read once."""
    ev = _ev(spark, sf_dir).select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    )
    firsts = ev.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    activity = ev.distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("w"), F.col("cohort_week")) / 7
            ).cast("bigint").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .select(
            F.date_format("cohort_week", TS_FMT).alias("cohort_week"),
            "week_offset",
            "active_users",
        )
    )


@register(
    "scalar_variant_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS missing_null,
           json_extract_string(props, '$.k') AS k_string
    FROM events
    """,
)
def scalar_variant_funcs(spark, sf_dir):
    """VARIANT semi-structured type (Spark 4 / the open-lakehouse variant
    encoding): ``parse_json`` once into a binary variant, then typed
    path extraction — ``variant_get`` for present paths,
    ``try_variant_get`` returning NULL (never throwing, ANSI mode) for
    absent ones. At scale variant beats per-query ``get_json_object``
    re-parsing: one parse, many typed reads, shredded columnar storage."""
    ev = _ev(spark, sf_dir).select("event_id", "props")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_typed"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_null"),
        F.variant_get(v, "$.k", "string").alias("k_string"),
    )


@register(
    "streaming_incremental_batches",
    oracle="""
    SELECT event_type AS key,
           count(*) AS n,
           round(sum(value), 2) AS total,
           CAST(1 AS BIGINT) AS multi_batch
    FROM events GROUP BY event_type
    """,
)
def streaming_incremental_batches(spark, sf_dir):
    """Cross-micro-batch state accumulation under FORCED incremental
    processing: the source is split into 8 files and the stream reads
    them with ``maxFilesPerTrigger=1``, so availableNow runs ≥8
    micro-batches and the per-key running state (applyInPandasWithState)
    must accumulate across ALL of them — a single-batch run would pass
    the other streaming gates trivially; this one cannot. The final
    per-key row must equal the batch groupBy, and the emitted
    ``multi_batch`` flag asserts IN-QUERY that >1 distinct batch_id
    reached the sink (i.e. incremental processing actually happened)."""
    from ..streaming.materialize import (
        session_tmpdir,
        stream_foreach_batch_parquet,
    )
    from ..streaming.stateful import running_totals

    ev = _ev(spark, sf_dir).select("event_type", "value")
    d = session_tmpdir("stream_incr_")
    ev.repartition(8).write.mode("overwrite").json(f"{d}/src")
    stream = (
        spark.readStream.schema("event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(f"{d}/src")
    )
    out = running_totals(stream, key="event_type", value_col="value")
    scan = stream_foreach_batch_parquet(out, d, output_mode="update")
    finals = (
        scan.groupBy("key")
        .agg(F.max_by(F.struct("n", "total"), "n").alias("s"))
        .select(
            "key",
            F.col("s.n").alias("n"),
            F.round(F.col("s.total"), 2).alias("total"),
        )
    )
    batches = scan.agg(
        F.countDistinct("batch_id").alias("n_batches")
    )
    return finals.crossJoin(F.broadcast(batches)).select(
        "key",
        "n",
        "total",
        F.when(F.col("n_batches") > 1, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("multi_batch"),
    )


@register(
    "events_sliding_distinct_users",
    oracle=f"""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) - INTERVAL 5 HOUR AS lo,
             date_trunc('hour', max(ts)) AS hi
      FROM events
    ), grid AS (
      SELECT g.ws FROM bounds,
        unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS g(ws)
    )
    SELECT strftime(grid.ws, '{TS_FMT_DUCK}') AS window_start,
           count(DISTINCT e.user_id) AS distinct_users,
           count(*) AS n_events
    FROM grid
    JOIN events e
      ON e.ts >= grid.ws AND e.ts < grid.ws + INTERVAL 6 HOUR
    GROUP BY grid.ws
    """,
)
def events_sliding_distinct_users(spark, sf_dir):
    """Sliding-window DISTINCT aggregation (6h windows, 1h slide):
    distinct users + event count per overlapping window — the
    active-users-trend query. Spark's ``window()`` slide replicates each
    event into its 6 covering windows MAP-SIDE (an Expand, no
    self-join); the oracle reproduces the same via an hour-grid range
    join. Epoch-aligned hour windows make the two formulations emit the
    same window starts. Distinct-agg shuffles once on (window, user)
    partials then once on window — the standard two-phase distinct."""
    ev = _ev(spark, sf_dir).select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id"
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    w = F.window("ts", "6 hours", "1 hour")
    return (
        ev.groupBy(w.alias("w"))
        .agg(
            F.countDistinct("user_id").alias("distinct_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            "distinct_users",
            "n_events",
        )
    )


@register(
    "streaming_static_enrich",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS window_start,
           c_mktsegment,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    """,
)
def streaming_static_enrich(spark, sf_dir):
    """Stream-static dimension enrichment — the standard CDC/event
    pattern of joining a stream against a slowly-changing dimension
    table: events file-stream ⋈ broadcast customer dim (re-read per
    micro-batch, so dimension updates between batches are picked up),
    then a watermarked tumbling aggregation per market segment. The
    static side broadcasts (dimensions are small next to the stream);
    the only stateful operator is the windowed agg. Sentinel event 4h
    past the corpus max forces every real window final under the 2h
    watermark (same finality device as streaming_tumbling_counts);
    the sentinel maps to customer 0, and its own window never emits."""
    from datetime import timedelta

    from ..streaming.materialize import session_tmpdir, stream_to_parquet

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tabs = load_tables(spark, sf_dir)
    ev = tabs["events"].select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id", "value"
    )
    cust = tabs["customer"].select("c_custkey", "c_mktsegment")
    d = session_tmpdir("stream_enrich_")
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel = spark.createDataFrame(
        [(max_ts + timedelta(hours=4), 0, 0.0)],
        "ts timestamp, user_id bigint, value double",
    )
    ev.unionByName(sentinel).repartition(4).write.parquet(f"{d}/src")
    stream = spark.readStream.schema(
        "ts timestamp, user_id bigint, value double"
    ).parquet(f"{d}/src")
    enriched = stream.withWatermark("ts", "2 hours").join(
        dim_broadcast(cust), F.col("user_id") == F.col("c_custkey")
    )
    agg = (
        enriched.groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "c_mktsegment",
            "n",
            "total_value",
        )
    )
    scan = stream_to_parquet(agg, d)
    return scan.select(
        F.date_format("window_start", TS_FMT).alias("window_start"),
        "c_mktsegment",
        "n",
        "total_value",
    )


@register(
    "streaming_watermark_late_drop",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE date_trunc('day', ts) = DATE '2024-01-05'
    GROUP BY 1, 2
    """,
)
def streaming_watermark_late_drop(spark, sf_dir):
    """Watermark EXCLUSION proven against the oracle — every other
    streaming query equals its full-batch twin; this one must NOT: the
    replay is (1) all of 2024-01-05, (2) a sentinel 4h past the day's
    max that finalizes and EVICTS every real window at that batch's end,
    then (3) LATE clones of the day's hour-2 events (shifted ids, same
    timestamps).  Spark's aggregation merges late rows as long as the
    window state is alive and only DROPS them once the watermark has
    evicted the window — eviction runs at batch end, so the late slab
    must trail the eviction batch (measured: a 2-slab replay silently
    double-counts).  The query asserts ≥3 micro-batches AND
    numRowsDroppedByWatermark ≥ 1 from the query progress, and the
    oracle aggregates only the real day — if the clones leaked, hour-2
    counts would double and the hash would go red."""
    import glob as _glob
    import os
    from datetime import timedelta

    from ..streaming.materialize import session_tmpdir
    from ..streaming.windows import tumbling_counts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _ev(spark, sf_dir).select(
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
        "event_type",
        "value",
    )
    day = ev.filter(F.to_date("ts") == "2024-01-05")
    late_clones = day.filter(F.hour("ts") == 2).select(
        "ts",
        (F.col("event_id") + 10_000_000).alias("event_id"),
        "event_type",
        "value",
    )
    max_ts = day.agg(F.max("ts")).first()[0]  # 1-row bound lookup
    sentinel = spark.createDataFrame(
        [(max_ts + timedelta(hours=4), -1, "__sentinel__", 0.0)],
        "ts timestamp, event_id long, event_type string, value double",
    )
    d = session_tmpdir("late_drop_")
    src = f"{d}/src"
    day.coalesce(1).write.mode("overwrite").parquet(f"{src}/s01")
    sentinel.coalesce(1).write.mode("overwrite").parquet(f"{src}/s02")
    late_clones.coalesce(1).write.mode("overwrite").parquet(f"{src}/s03")
    base = os.stat(src).st_mtime
    for s in (1, 2, 3):
        for f in _glob.glob(f"{src}/s{s:02d}/part-*.parquet"):
            os.utime(f, (base + s, base + s))
    stream = (
        spark.readStream.schema(
            "ts timestamp, event_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/s*")
    )
    out = tumbling_counts(
        stream.drop("event_id"), window="1 hour", watermark="2 hours"
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{d}/out")
        .option("checkpointLocation", f"{d}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, 300)
    progress = q.recentProgress
    dropped = sum(
        (p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
         if p["stateOperators"] else 0)
        for p in progress
    )
    n_batches = len(_glob.glob(f"{d}/ckpt/commits/*"))
    if n_batches < 3:
        raise ValueError(f"expected >=3 micro-batches, got {n_batches}")
    if dropped < 1:
        raise ValueError("watermark dropped nothing - late rows leaked")
    scan = spark.read.parquet(f"{d}/out")
    return scan.filter(F.col("event_type") != "__sentinel__").select(
        F.date_format("window_start", TS_FMT).alias("window_start"),
        "event_type",
        "n",
        "total_value",
    )
