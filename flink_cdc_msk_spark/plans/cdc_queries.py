"""CDC-surface queries: the reference's own dataflow as named queries.

``cdc_route_keys`` runs the full synthesize→parse→route pipeline
(SURVEY.md A13-A18) and is checked against an oracle that computes the
expected routing *directly* from the orders table — i.e. the oracle never
sees the JSON envelope, so a parse/route bug cannot cancel out.

``cdc_latest_state`` is the upsert-compaction operator (SURVEY.md Part B,
"latest-row materialization"): replay c/u/d traffic, keep the latest image
per PK, drop deleted keys.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.bcast import dim_broadcast
from ..streaming.materialize import await_or_raise as _await_or_raise

from ..config import TableRouting
from ..envelope import MYSQL_ENVELOPE_COMPACT_SCHEMA
from ..operators.route import route_mysql_cdc
from ..sources.cdc_sim import synthesize_mysql_events
from .registry import register

ORDERS_ROUTING = TableRouting.parse(
    '[{"db":"test_db","table":"orders","primary_key":"o_orderkey"}]'
)


@register(
    "cdc_route_keys",
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
def cdc_route_keys(spark, sf_dir):
    events = synthesize_mysql_events(spark, sf_dir)
    routed = route_mysql_cdc(events, ORDERS_ROUTING, topic_prefix="cdc_")
    op = F.get_json_object("value", "$.op").alias("op")
    return routed.select(
        F.col("db"),
        F.col("table").alias("tbl"),
        "partition_key",
        "topic",
        op,
    )


@register(
    "cdc_route_malformed",
    oracle="""
    SELECT 'test_db' AS db,
           'orders' AS tbl,
           'test_db.orders.' || CAST(o_orderkey AS VARCHAR) AS partition_key,
           'cdc_test_db' AS topic
    FROM (
      SELECT o_orderkey FROM orders
      UNION ALL
      SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey FROM orders WHERE o_orderkey % 20 = 0
    )
    """,
)
def cdc_route_malformed(spark, sf_dir):
    """A21 null guard proven end-to-end: the valid envelope feed is
    polluted with garbage lines (non-JSON, empty object, envelope with no
    source block, NULL) and the quarantine filter must reduce the routed
    output to exactly the clean feed's routing. The route operator itself
    SURFACES unroutable lines null-keyed instead of crashing (the
    reference's Gson parse would throw and fail the job); the drop is the
    caller's one-line filter shown here — deliberately outside the hot
    operator, where a derived-column predicate would re-inline the JSON
    parse (see route.py::_finish)."""
    junk = spark.createDataFrame(
        [
            ("this is not json at all",),
            ("{}",),
            ('{"op":"c","ts_ms":1}',),  # no source block → no db/table
            (None,),
        ],
        "value string",
    )
    events = synthesize_mysql_events(spark, sf_dir).unionByName(junk)
    routed = route_mysql_cdc(events, ORDERS_ROUTING, topic_prefix="cdc_")
    quarantined = routed.filter(
        F.col("db").isNotNull() & F.col("table").isNotNull()
    )
    return quarantined.select(
        "db", F.col("table").alias("tbl"), "partition_key", "topic"
    )


@register(
    "cdc_latest_state",
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
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderkey ORDER BY ts_ms DESC) AS rn
      FROM changes
    )
    SELECT o_orderkey, o_custkey, op, ts_ms
    FROM ranked WHERE rn = 1 AND op <> 'd'
    """,
)
def cdc_latest_state(spark, sf_dir):
    """Upsert compaction: latest envelope per PK by ts_ms; deletes remove
    the key. Shuffles once on the PK (the natural key for the downstream
    table); at scale this is the standard CDC-merge pattern run inside
    foreachBatch against an ACID table (exact-typed columns only — payload
    fidelity through the JSON round-trip is part of the check).

    ``max_by`` aggregation, not a row_number window: the agg gets map-side
    partial combine and skips the per-key sort — at 100 TB the hot keys of
    a skewed CDC feed partial-aggregate down before the shuffle.

    The parse uses the TYPED per-table envelope schema (the compaction
    knows its target table) — ~10% faster than the table-agnostic map
    schema at sf0.1, identical values."""
    from pyspark.sql.types import LongType

    from ..envelope import mysql_envelope_keyed_schema

    events = synthesize_mysql_events(spark, sf_dir)
    schema = mysql_envelope_keyed_schema(
        {"o_orderkey": LongType}, {"o_custkey": LongType}
    )
    env = F.from_json("value", schema).alias("env")
    parsed = events.select(env).select(
        F.col("env.after.o_orderkey").alias("after_key"),
        F.col("env.before.o_orderkey").alias("before_key"),
        F.col("env.after.o_custkey").alias("o_custkey"),
        F.col("env.op").alias("op"),
        F.col("env.ts_ms").alias("ts_ms"),
    )
    keyed = parsed.withColumn(
        "o_orderkey", F.coalesce("after_key", "before_key")
    )
    return (
        keyed.groupBy("o_orderkey")
        .agg(F.max_by(F.struct("o_custkey", "op", "ts_ms"), "ts_ms").alias("s"))
        .filter(F.col("s.op") != "d")
        .select(
            "o_orderkey",
            F.col("s.o_custkey").alias("o_custkey"),
            F.col("s.op").alias("op"),
            F.col("s.ts_ms").alias("ts_ms"),
        )
    )


@register(
    "cdc_route_multi_table",
    oracle="""
    SELECT 'test_db' AS db, 'orders' AS tbl,
           'test_db.orders.' || CAST(o_orderkey AS VARCHAR) AS partition_key,
           'cdc_test_db' AS topic
    FROM (
      SELECT o_orderkey FROM orders
      UNION ALL
      SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey FROM orders WHERE o_orderkey % 20 = 0
    )
    UNION ALL
    SELECT 'test_db', 'customer',
           'test_db.customer.' || CAST(c_custkey AS VARCHAR) || '.'
                               || CAST(c_nationkey AS VARCHAR),
           'cdc_test_db'
    FROM customer
    """,
)
def cdc_route_multi_table(spark, sf_dir):
    """Multi-table routing through ONE operator instance (the reference's
    whole point — one job fans a mixed binlog out by table): interleaved
    orders (single PK, exact table rule) and customer (composite PK,
    matched via a ``cust.*`` REGEX rule) envelopes, each getting its own
    delete-aware key chain from the longest-match rule lookup. The
    oracle derives both tables' expected keys directly from the
    relational sources."""
    from ..sources.cdc_sim import synthesize_customer_events

    routing = TableRouting.parse(
        '[{"db":"test_db","table":"orders","primary_key":"o_orderkey"},'
        '{"db":"test_db","table":"cust.*",'
        '"primary_key":"c_custkey,c_nationkey"}]'
    )
    events = synthesize_mysql_events(spark, sf_dir).unionByName(
        synthesize_customer_events(spark, sf_dir)
    )
    routed = route_mysql_cdc(events, routing, topic_prefix="cdc_")
    return routed.select(
        "db", F.col("table").alias("tbl"), "partition_key", "topic"
    )


@register(
    "cdc_streaming_compaction",
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
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderkey ORDER BY ts_ms DESC) AS rn
      FROM changes
    )
    SELECT o_orderkey, o_custkey, op, ts_ms
    FROM ranked WHERE rn = 1 AND op <> 'd'
    """,
)
def cdc_streaming_compaction(spark, sf_dir):
    """The A31 compaction SINK under the oracle gate: replay the full
    c/u/d feed through ``ParquetUpsertSink`` (bucket-pruned merge path,
    foreachBatch) and return the materialized state table — which must
    equal the declarative latest-state query bit-for-bit. This is the
    reference's continuous-upsert behavior proven end-to-end, not just
    unit-tested: newest ts_ms wins per PK, deletes drop the key, and the
    staged-swap bucket rewrite leaves exactly the surviving rows."""
    from ..streaming.compaction import (
        ParquetUpsertSink,
        start_compaction_stream,
    )
    from ..streaming.materialize import session_tmpdir
    from ..streaming.pipeline import (
        snapshot_then_stream_paths,
        stream_lines_from_directory,
    )

    events = synthesize_mysql_events(spark, sf_dir)
    d = session_tmpdir("cdc_compact_q_")
    snapshot_then_stream_paths(events, f"{d}/src")
    stream = stream_lines_from_directory(
        spark, f"{d}/src", max_files_per_trigger=None
    )
    sink = ParquetUpsertSink(f"{d}/state", ["o_orderkey"], num_buckets=8)
    q = start_compaction_stream(stream, sink, f"{d}/ckpt", available_now=True)
    _await_or_raise(q, 300)
    state = spark.read.parquet(f"{d}/state")
    return state.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        F.try_element_at("payload", F.lit("o_custkey"))
        .cast("bigint")
        .alias("o_custkey"),
        "op",
        "ts_ms",
    )


@register(
    "cdc_snapshot_then_stream",
    oracle="""
    WITH feed AS (
        SELECT o_orderkey, o_custkey, 'r' AS op,
               1699999000000 + o_orderkey AS ts_ms
        FROM orders
        UNION ALL
        SELECT o_orderkey, o_custkey, 'u', 1700001000000 + o_orderkey
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey, NULL, 'd', 1700002000000 + o_orderkey
        FROM orders WHERE o_orderkey % 20 = 0
    ), ranked AS (
      SELECT *,
             row_number() OVER (
               PARTITION BY o_orderkey ORDER BY ts_ms DESC) AS rn,
             count(*) OVER (PARTITION BY o_orderkey) AS n_events
      FROM feed
    )
    SELECT o_orderkey, o_custkey, op, ts_ms,
           CAST(n_events AS BIGINT) AS n_events
    FROM ranked WHERE rn = 1 AND op <> 'd'
    """,
)
def cdc_snapshot_then_stream(spark, sf_dir):
    """A1 ``initial`` semantics end-to-end: the snapshot phase (op='r'
    envelopes, source.snapshot=true, earlier ts_ms) lands in the stream
    source and is drained by an availableNow run; then the live binlog
    tail (u/d only) lands and a SECOND availableNow run resumes from the
    SAME checkpoint — offset continuity across the snapshot→stream seam
    is load-bearing: if the checkpoint didn't carry over, the snapshot
    files would replay and the per-key ``n_events`` count (hash-checked
    against the oracle) would be wrong. Output is the compacted latest
    state per key (deletes drop), same shape as cdc_latest_state."""
    from ..sources.cdc_sim import (
        synthesize_mysql_changes_only,
        synthesize_mysql_snapshot,
    )
    from ..streaming.materialize import session_tmpdir, stream_to_parquet
    from ..streaming.pipeline import (
        snapshot_then_stream_paths,
        stream_lines_from_directory,
    )

    d = session_tmpdir("snap_stream_")
    src = f"{d}/src"
    # phase 1: snapshot files land, an availableNow run drains them
    snapshot_then_stream_paths(synthesize_mysql_snapshot(spark, sf_dir), src)
    lines = stream_lines_from_directory(spark, src, max_files_per_trigger=None)
    stream_to_parquet(lines, d)
    # phase 2: the binlog tail lands; the same checkpoint resumes past
    # the already-processed snapshot files
    synthesize_mysql_changes_only(spark, sf_dir).select("value").write.mode(
        "append"
    ).text(src)
    scan = stream_to_parquet(lines, d)

    from pyspark.sql.types import LongType

    from ..envelope import mysql_envelope_keyed_schema

    schema = mysql_envelope_keyed_schema(
        {"o_orderkey": LongType}, {"o_custkey": LongType}
    )
    env = F.from_json("value", schema).alias("env")
    parsed = scan.select(env).select(
        F.coalesce(
            "env.after.o_orderkey", "env.before.o_orderkey"
        ).alias("o_orderkey"),
        F.col("env.after.o_custkey").alias("o_custkey"),
        F.col("env.op").alias("op"),
        F.col("env.ts_ms").alias("ts_ms"),
    )
    return (
        parsed.groupBy("o_orderkey")
        .agg(
            F.max_by(F.struct("o_custkey", "op", "ts_ms"), "ts_ms").alias("s"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .filter(F.col("s.op") != "d")
        .select(
            "o_orderkey",
            F.col("s.o_custkey").alias("o_custkey"),
            F.col("s.op").alias("op"),
            F.col("s.ts_ms").alias("ts_ms"),
            "n_events",
        )
    )


@register(
    "cdc_scd2_intervals",
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
def cdc_scd2_intervals(spark, sf_dir):
    """SCD Type-2 history materialization — the OTHER standard CDC
    product besides latest-state: every change becomes a versioned row
    with a [valid_from, valid_to) interval (valid_to = next change's
    ts_ms, open for the live version) and an is_current flag (deletes
    close their interval and are never current). One shuffle on the PK;
    the lead() window reuses that partitioning — at 100 TB this is the
    standard history-table build, run per ingestion batch over the
    merged feed. Typed per-table envelope parse, same as the latest-state
    compaction."""
    from pyspark.sql.types import LongType

    from ..envelope import mysql_envelope_keyed_schema
    from pyspark.sql.window import Window

    events = synthesize_mysql_events(spark, sf_dir)
    schema = mysql_envelope_keyed_schema(
        {"o_orderkey": LongType}, {"o_custkey": LongType}
    )
    env = F.from_json("value", schema).alias("env")
    parsed = events.select(env).select(
        F.coalesce(
            "env.after.o_orderkey", "env.before.o_orderkey"
        ).alias("o_orderkey"),
        F.col("env.after.o_custkey").alias("o_custkey"),
        F.col("env.op").alias("op"),
        F.col("env.ts_ms").alias("ts_ms"),
    )
    w = Window.partitionBy("o_orderkey").orderBy("ts_ms", "op")
    valid_to = F.lead("ts_ms").over(w)
    return parsed.select(
        "o_orderkey",
        "o_custkey",
        "op",
        F.col("ts_ms").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull() & (F.col("op") != "d"), 1)
        .otherwise(0)
        .alias("is_current"),
    )


@register(
    "cdc_type_normalize",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS d_date,
           lpad(CAST(((o_orderkey * 7919) % 86400) // 3600 AS VARCHAR), 2, '0')
             || ':' ||
           lpad(CAST((((o_orderkey * 7919) % 86400) % 3600) // 60 AS VARCHAR), 2, '0')
             || ':' ||
           lpad(CAST(((o_orderkey * 7919) % 86400) % 60 AS VARCHAR), 2, '0')
             AS d_time,
           strftime(o_orderdate + INTERVAL 8 HOUR, '%Y-%m-%d %H:%M:%S')
             AS d_datetime,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS d_timestamp,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS d_decimal,
           CAST(o_orderkey AS BIGINT) AS d_unsigned
    FROM orders
    """,
)
def cdc_type_normalize(spark, sf_dir):
    """Debezium type flattening (SURVEY.md A35 / §1.3) applied to the
    orders table: DATE/TIME/DATETIME/TIMESTAMP renderers (GMT+8 datetime
    shift per DebeziumConverter.java:91-95), decimal→string,
    unsigned-bigint→long. TIME input is synthesized nanos-of-day
    (deterministic from the key) since the TPC-H schema has no TIME col.
    All pure Catalyst — this is the envelope-normalization stage of the
    CDC hot path."""
    from ..functions import type_norm as T
    from ..sources.tables import load_tables

    o = load_tables(spark, sf_dir)["orders"]
    nanos = (
        F.pmod(F.col("o_orderkey") * 7919, F.lit(86400))
        * F.lit(1_000_000_000)
    ).cast("long")
    return o.select(
        "o_orderkey",
        T.debezium_date("o_orderdate").alias("d_date"),
        T.debezium_time(nanos).alias("d_time"),
        T.debezium_datetime("o_orderdate").alias("d_datetime"),
        T.debezium_timestamp("o_orderdate").alias("d_timestamp"),
        T.debezium_decimal("o_totalprice", 18, 2).alias("d_decimal"),
        T.debezium_unsigned_bigint("o_orderkey").alias("d_unsigned"),
    )


@register(
    "streaming_route_keys",
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
def streaming_route_keys(spark, sf_dir):
    """The SAME route pipeline as cdc_route_keys executed through
    Structured Streaming (file source → availableNow trigger → memory
    sink) and checked against the SAME relational oracle — proving the
    engine's streaming and batch paths are one set of expressions
    (SURVEY.md §3.4). The stream runs into a parquet file sink under a
    session-scoped temp dir and the batch SCAN is returned — nothing is
    collected to the driver here (the round-1 memory-sink shape
    re-materialized the full routed output through the driver twice)."""
    from ..streaming.materialize import session_tmpdir, stream_to_parquet
    from ..streaming.pipeline import (
        route_stream_from_directory,
        snapshot_then_stream_paths,
    )

    events = synthesize_mysql_events(spark, sf_dir)
    d = session_tmpdir("stream_route_q_")
    snapshot_then_stream_paths(events, f"{d}/src")
    routed = route_stream_from_directory(
        spark,
        f"{d}/src",
        ORDERS_ROUTING,
        max_files_per_trigger=None,  # bulk replay: one micro-batch
        topic_prefix="cdc_",
    )
    scan = stream_to_parquet(routed, d)
    op = F.get_json_object("value", "$.op").alias("op")
    return scan.select(
        "db", F.col("table").alias("tbl"), "partition_key", "topic", op
    )


@register(
    "cdc_mongo_route_keys",
    oracle=r"""
    SELECT 'test_db' AS db,
           'orders' AS coll,
           'test_db.orders.' || pk AS partition_key,
           'm_test_db' AS topic,
           op
    FROM (
      -- scalar _id → bare value captured by [\d.]+
      SELECT CAST(o_orderkey AS VARCHAR) AS pk, 'insert' AS op FROM orders
      UNION ALL
      -- nested-object _id → whole object captured by {[^}]+}, spaces stripped
      SELECT '{"$numberLong":"' || CAST(o_orderkey AS VARCHAR) || '"}',
             'delete' FROM orders WHERE o_orderkey % 10 = 0
    )
    """,
)
def cdc_mongo_route_keys(spark, sf_dir):
    """Mongo change-stream routing (SURVEY.md A11/A19): synthesized
    change-stream envelopes → ns.db/ns.coll/operationType extraction +
    ``_id`` regex (scalar AND nested-object documentKeys — deletes use the
    object form ``{"$numberLong": "N"}``, whose extracted id is the
    space-stripped object, matching the reference regex's first capture).
    Oracle computes expected keys directly from orders."""
    from ..operators.route import route_mongo_cdc
    from ..sources.cdc_sim import synthesize_mongo_events

    events = synthesize_mongo_events(spark, sf_dir)
    routed = route_mongo_cdc(events, topic_prefix="m_")
    op = F.get_json_object("value", "$.operationType").alias("op")
    return routed.select(
        "db", F.col("table").alias("coll"), "partition_key", "topic", op
    )


@register(
    "cdc_schema_drift_rescue",
    oracle="""
    SELECT o_orderkey, 'c' AS op,
           CASE WHEN o_orderkey % 13 = 0
                THEN '{"o_channel":"ch' || CAST(o_orderkey % 3 AS VARCHAR)
                     || '"}'
           END AS rescued_json
    FROM orders
    """,
)
def cdc_schema_drift_rescue(spark, sf_dir):
    """Schema-evolution tolerance on the CDC parse path (the reference
    inherits this from Debezium's JSON envelope — new columns simply
    appear in ``after``, MySQLCDC2AWSMSK.scala:95-168 passes them
    through): rows are parsed with the TYPED envelope schema for the
    known columns, and any field the schema does not know lands in a
    rescued-data column (the lakehouse "_rescued_data" pattern) instead
    of being silently dropped — so a mid-stream ALTER TABLE ADD COLUMN
    degrades to a visible, queryable map, never data loss.

    Drift is planted deterministically: orderkey%13 rows carry an extra
    ``o_channel`` field (ignoreNullFields=true renders the others
    without it). Parse is one pass: typed ``from_json`` for the known
    payload + a ``map<string,string>`` parse of ``after`` filtered to
    unknown keys. Map-side only — no shuffle; the rescued map is
    re-serialized to JSON so downstream sinks keep a stable schema."""
    from ..sources.tables import load_tables

    o = load_tables(spark, sf_dir)["orders"]
    drifted = F.struct(
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.when(
            F.col("o_orderkey") % 13 == 0,
            F.concat(F.lit("ch"), (F.col("o_orderkey") % 3).cast("string")),
        ).alias("o_channel"),
    )
    feed = o.select(
        F.to_json(
            F.struct(
                drifted.alias("after"),
                F.lit("c").alias("op"),
            )
        ).alias("value")
    )
    known = {"o_orderkey", "o_custkey"}
    typed = F.from_json(
        "value", "struct<after:struct<o_orderkey:bigint>,op:string>"
    )
    raw_after = F.from_json(
        F.get_json_object("value", "$.after"), "map<string,string>"
    )
    rescued = F.map_filter(
        raw_after,
        lambda k, v: ~k.isin(*sorted(known)),
    )
    return feed.select(
        typed["after"]["o_orderkey"].alias("o_orderkey"),
        typed["op"].alias("op"),
        F.when(F.size(F.map_keys(rescued)) > 0, F.to_json(rescued)).alias(
            "rescued_json"
        ),
    )


@register(
    "source_debezium_jsonl_scan",
    oracle="""
    WITH changes AS (
        SELECT 'c' AS op, 1700000000000 + o_orderkey AS ts_ms FROM orders
        UNION ALL
        SELECT 'u', 1700001000000 + o_orderkey
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT 'd', 1700002000000 + o_orderkey
        FROM orders WHERE o_orderkey % 20 = 0
    )
    SELECT op, 'test_db' AS db, 'orders' AS tbl,
           count(*) AS n, max(ts_ms) AS max_ts
    FROM changes GROUP BY op
    """,
)
def source_debezium_jsonl_scan(spark, sf_dir):
    """Custom Python DataSource end-to-end (Spark 4 DataSource API): the
    synthesized envelope feed is dumped as a multi-file JSONL archive
    (what a Kafka topic backfill looks like on disk), mounted through
    ``format("debezium_jsonl")`` — one InputPartition per file, parsed
    executor-side — and aggregated per op. The oracle reproduces the
    deterministic feed arithmetic straight from orders, so a green row
    checks the whole loop: envelope render → JSONL dump → custom-source
    scan → parse → aggregate. See sources/debezium_source.py for the
    scale/parallelism contract and why the HOT path stays on from_json."""
    from ..sources.cdc_sim import synthesize_mysql_events
    from ..sources.debezium_source import register as register_source
    from ..streaming.materialize import session_tmpdir

    register_source(spark)
    d = session_tmpdir("dbz_jsonl_")
    feed = synthesize_mysql_events(spark, sf_dir)
    feed.repartition(8).write.mode("overwrite").text(f"{d}/dump")
    env = (
        spark.read.format("debezium_jsonl")
        .option("path", f"{d}/dump")
        .load()
        # the text sink writes .txt part files plus _SUCCESS; the source
        # filters extensions itself, so no glob needed here
    )
    return (
        env.filter(F.col("op") != "__malformed__")
        .groupBy("op", "db", F.col("table").alias("tbl"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("ts_ms").alias("max_ts"),
        )
    )


@register(
    "streaming_cdc_join_view",
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
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderkey ORDER BY ts_ms DESC) AS rn
      FROM changes
    )
    SELECT r.o_orderkey, r.o_custkey,
           CAST(c.c_nationkey AS BIGINT) AS c_nationkey, r.op, r.ts_ms
    FROM ranked r LEFT JOIN customer c ON r.o_custkey = c.c_custkey
    WHERE r.rn = 1 AND r.op <> 'd'
    """,
)
def streaming_cdc_join_view(spark, sf_dir):
    """Incremental maintenance of a JOIN VIEW (the Materialize-style IVM
    shape): the materialized table is ``orders latest-state ⋈ customer``,
    and every micro-batch maintains it by enriching ONLY the batch's
    changed keys (broadcast dimension join inside the sink's transform
    hook) before the bucket-merge — the view is never recomputed from
    the full fact stream, so per-batch work is proportional to the
    batch while the view stays exactly consistent: deletes tombstone
    enriched rows, updates re-enrich, and the live view must equal the
    oracle's declarative join over the compacted feed.  The replay is
    deliberately HOSTILE: one file per micro-batch in arbitrary order
    (≥2 batches asserted in-query), so per-key events may arrive out of
    order — ``retain_tombstones=True`` makes the merged state the global
    latest-per-key regardless of batch splits, which the oracle hash then
    proves."""
    import glob as _glob

    from ..sources.tables import load_tables
    from ..streaming.compaction import (
        ParquetUpsertSink,
        start_compaction_stream,
    )
    from ..streaming.materialize import session_tmpdir
    from ..streaming.pipeline import (
        snapshot_then_stream_paths,
        stream_lines_from_directory,
    )

    cust = load_tables(spark, sf_dir)["customer"].select(
        "c_custkey", F.col("c_nationkey").cast("bigint").alias("c_nationkey")
    )

    def enrich(changes):
        keyed = changes.withColumn(
            "o_custkey",
            F.try_element_at("payload", F.lit("o_custkey")).cast("bigint"),
        )
        return keyed.join(
            dim_broadcast(cust),
            keyed["o_custkey"] == cust["c_custkey"],
            "left",
        ).drop("c_custkey")

    # bound the replay to 6 files → 6 micro-batches: the multi-batch,
    # out-of-order property under test is preserved while the number of
    # state merges stays constant across scale factors
    events = synthesize_mysql_events(spark, sf_dir).repartition(6)
    d = session_tmpdir("cdc_join_view_")
    snapshot_then_stream_paths(events, f"{d}/src")
    stream = stream_lines_from_directory(
        spark, f"{d}/src", max_files_per_trigger=1
    )
    # tombstone retention: the feed files replay in ARBITRARY order
    # (maxFilesPerTrigger=1 over one distributed write), so a key's delete
    # can precede its create across batches — retained tombstones make the
    # final state order-independent (global latest per key); the live view
    # filters them at read time.
    sink = ParquetUpsertSink(
        f"{d}/view",
        ["o_orderkey"],
        num_buckets=8,
        transform=enrich,
        retain_tombstones=True,
    )
    q = start_compaction_stream(stream, sink, f"{d}/ckpt", available_now=True)
    _await_or_raise(q, 300)
    n_batches = len(
        _glob.glob(f"{d}/ckpt/commits/*")
    )
    if n_batches < 2:
        raise ValueError(
            f"expected incremental view maintenance, got {n_batches} batches"
        )
    view = spark.read.parquet(f"{d}/view").filter(F.col("op") != "d")
    return view.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        "o_custkey",
        "c_nationkey",
        "op",
        "ts_ms",
    )
