"""Deterministic CDC event synthesis from the relational test tables.

Stands in for the MySQL binlog source (SURVEY.md A1): produces
Debezium-envelope JSON strings (format per the sample documented at
MySQLCDC2AWSMSK.scala:91) from parquet rows, entirely with JVM-side
expressions (``to_json`` over a struct — no Python in the loop).

Event mix: every row becomes an insert (``op=c``); rows where
``key % 10 == 0`` additionally get an update (``op=u``) and rows where
``key % 20 == 0`` a delete (``op=d``), with later ``ts_ms`` — giving the
compaction/routing operators real c/u/d traffic. Deterministic: ts_ms is a
function of the key alone, no wall clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_tables

BASE_TS_MS = 1_700_000_000_000


def _envelope(
    payload_cols,
    before,
    after,
    op: str,
    ts_off: int,
    key_col: str,
    snapshot: str = "false",
):
    src = F.struct(
        F.lit("1.6.4.Final").alias("version"),
        F.lit("mysql").alias("connector"),
        F.lit("mysql_binlog_source").alias("name"),
        (F.lit(BASE_TS_MS + ts_off) + F.col(key_col)).alias("ts_ms"),
        F.lit(snapshot).alias("snapshot"),
        F.lit("test_db").alias("db"),
        F.lit(None).cast("string").alias("sequence"),
        F.lit("orders").alias("table"),
        F.lit(57330068).cast("long").alias("server_id"),
        F.lit(None).cast("string").alias("gtid"),
        F.lit("mysql-bin-changelog.007670").alias("file"),
        F.lit(804).cast("long").alias("pos"),
        F.lit(0).alias("row"),
        F.lit(None).cast("string").alias("thread"),
        F.lit(None).cast("string").alias("query"),
    )
    env = F.struct(
        before.alias("before"),
        after.alias("after"),
        src.alias("source"),
        F.lit(op).alias("op"),
        (F.lit(BASE_TS_MS + ts_off) + F.col(key_col)).alias("ts_ms"),
        F.lit(None).cast("string").alias("transaction"),
    )
    # Null preservation parity with Gson serializeNulls (scala:38).
    return F.to_json(env, {"ignoreNullFields": "false"})


# The synthetic feed stands in for a Kafka topic: a real topic is produced
# once and read by every consumer, not re-generated per query. Memoize +
# persist per (session, sf_dir, variant) so the ~0.5 KB/row JSON rendering
# (the expensive part — to_json of the full envelope) happens once per
# session; queries then share one cached feed exactly as they'd share one
# topic. Keyed by applicationId so a restarted session re-synthesizes.
_FEED_CACHE: dict[tuple[str, str, str, bool], DataFrame] = {}


def synthesize_mysql_events(
    spark: SparkSession,
    sf_dir: str,
    table: str = "orders",
    with_updates: bool = True,
) -> DataFrame:
    """→ DataFrame[value: string] of Debezium JSON lines for ``orders``.

    Payload values follow the reference's Debezium type flattening
    (SURVEY.md §1.3): decimals → strings, datetimes → formatted strings,
    integers stay numeric.
    """
    if table != "orders":
        raise ValueError("CDC simulation currently synthesizes from orders")
    key = (spark.sparkContext.applicationId, sf_dir, table, with_updates)
    from .tables import evict_stale_entries

    evict_stale_entries(_FEED_CACHE, key[0])
    cached = _FEED_CACHE.get(key)
    if cached is not None:
        return cached
    o = load_tables(spark, sf_dir)["orders"]

    inserts = o.select(
        _envelope(o.columns, _null_payload(), _payload(F.col("o_totalprice")),
                  "c", 0, "o_orderkey").alias("value")
    )
    if not with_updates:
        feed = inserts
    else:
        feed = inserts.unionAll(_synthesize_changes(o))
    # Repartition to the session's parallelism BEFORE persisting: the
    # feed inherits the source parquet's split count (3 partitions at
    # sf0.1), which would serialize every downstream Jackson parse onto
    # 3 cores. A real Kafka topic carries many partitions — this mirrors
    # that, and the one-time shuffle happens at the same materialization
    # that pays the to_json rendering.
    # bound: the rendered envelope feed — input-row-scale JSON strings;
    # evictable default storage, sized by the simulated topic not corpus
    feed = feed.repartition(spark.sparkContext.defaultParallelism).persist()
    _FEED_CACHE[key] = feed
    return feed


def _payload(price_col):
    # map<string,string>-shaped struct; decimal.handling.mode=string ⇒
    # price as string (scala:248); DATETIME → "yyyy-MM-dd HH:mm:ss"
    # (DebeziumConverter.java:20,82-105).
    return F.struct(
        F.col("o_orderkey").alias("o_orderkey"),
        F.col("o_custkey").alias("o_custkey"),
        F.col("o_orderstatus").alias("o_orderstatus"),
        price_col.cast("string").alias("o_totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
            "o_orderdate"
        ),
        F.col("o_orderpriority").alias("o_orderpriority"),
    )


def _null_payload():
    return F.lit(None).cast(
        "struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,"
        "o_totalprice:string,o_orderdate:string,o_orderpriority:string>"
    )


def _synthesize_changes(o: DataFrame) -> DataFrame:
    upd_rows = o.filter(F.col("o_orderkey") % 10 == 0)
    updates = upd_rows.select(
        _envelope(
            o.columns,
            _payload(F.col("o_totalprice")),
            _payload(F.round(F.col("o_totalprice") * 1.1, 2)),
            "u", 1_000_000, "o_orderkey",
        ).alias("value")
    )
    del_rows = o.filter(F.col("o_orderkey") % 20 == 0)
    deletes = del_rows.select(
        _envelope(o.columns, _payload(F.col("o_totalprice")), _null_payload(),
                  "d", 2_000_000, "o_orderkey").alias("value")
    )
    return updates.unionAll(deletes)


def synthesize_mysql_snapshot(
    spark: SparkSession, sf_dir: str, table: str = "orders"
) -> DataFrame:
    """→ op='r' snapshot-read envelopes (the Debezium snapshot phase of
    ``StartupOptions.initial()``, scala:225): every current row, with
    ``source.snapshot='true'`` and ts_ms strictly BEFORE any change
    event (BASE_TS_MS - 1_000_000 + key)."""
    if table != "orders":
        raise ValueError("CDC simulation currently synthesizes from orders")
    o = load_tables(spark, sf_dir)["orders"]
    return o.select(
        _envelope(
            o.columns,
            _null_payload(),
            _payload(F.col("o_totalprice")),
            "r", -1_000_000, "o_orderkey",
            snapshot="true",
        ).alias("value")
    )


def synthesize_mysql_changes_only(
    spark: SparkSession, sf_dir: str, table: str = "orders"
) -> DataFrame:
    """→ only the live u/d traffic (no inserts) — the post-snapshot binlog
    tail for the snapshot-then-stream seam."""
    if table != "orders":
        raise ValueError("CDC simulation currently synthesizes from orders")
    return _synthesize_changes(load_tables(spark, sf_dir)["orders"])


def synthesize_customer_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """→ insert envelopes for the ``customer`` table (second routed table
    for multi-table routing queries; composite PK c_custkey,c_nationkey
    exercises the multi-column key join)."""
    c = load_tables(spark, sf_dir)["customer"]
    payload = F.struct(
        F.col("c_custkey").alias("c_custkey"),
        F.col("c_nationkey").alias("c_nationkey"),
        F.col("c_name").alias("c_name"),
        F.col("c_acctbal").cast("string").alias("c_acctbal"),
    )
    null_payload = F.lit(None).cast(
        "struct<c_custkey:bigint,c_nationkey:bigint,"
        "c_name:string,c_acctbal:string>"
    )
    env = F.struct(
        null_payload.alias("before"),
        payload.alias("after"),
        F.struct(
            F.lit("1.6.4.Final").alias("version"),
            F.lit("mysql").alias("connector"),
            F.lit("mysql_binlog_source").alias("name"),
            (F.lit(BASE_TS_MS) + F.col("c_custkey")).alias("ts_ms"),
            F.lit("false").alias("snapshot"),
            F.lit("test_db").alias("db"),
            F.lit(None).cast("string").alias("sequence"),
            F.lit("customer").alias("table"),
            F.lit(57330068).cast("long").alias("server_id"),
            F.lit(None).cast("string").alias("gtid"),
            F.lit("mysql-bin-changelog.007670").alias("file"),
            F.lit(804).cast("long").alias("pos"),
            F.lit(0).alias("row"),
            F.lit(None).cast("string").alias("thread"),
            F.lit(None).cast("string").alias("query"),
        ).alias("source"),
        F.lit("c").alias("op"),
        (F.lit(BASE_TS_MS) + F.col("c_custkey")).alias("ts_ms"),
        F.lit(None).cast("string").alias("transaction"),
    )
    return c.select(
        F.to_json(env, {"ignoreNullFields": "false"}).alias("value")
    )


def synthesize_mongo_events(
    spark: SparkSession, sf_dir: str, table: str = "orders"
) -> DataFrame:
    """→ DataFrame[value: string] of Mongo change-stream JSON lines
    (envelope per the sample documented at MongoCDC2AWSMSK.scala:95-96)
    from parquet rows. Insert per row; rows with ``key % 10 == 0`` also get
    a ``delete`` whose documentKey is the nested-object form — exercising
    both arms of the reference's ``_id`` regex (scalar ``[\\d.]+`` and
    object ``\\{[^}]+\\}``, scala:86)."""
    if table != "orders":
        raise ValueError("Mongo CDC simulation currently synthesizes from orders")
    o = load_tables(spark, sf_dir)["orders"]

    def env(op: str, doc_key, full_doc, ts_off: int):
        return F.to_json(
            F.struct(
                doc_key.alias("_id"),
                F.lit(op).alias("operationType"),
                full_doc.alias("fullDocument"),
                F.struct(
                    (F.lit(BASE_TS_MS + ts_off) + F.col("o_orderkey")).alias(
                        "ts_ms"
                    ),
                    F.lit("false").alias("snapshot"),
                ).alias("source"),
                (F.lit(BASE_TS_MS + ts_off) + F.col("o_orderkey")).alias(
                    "ts_ms"
                ),
                F.struct(
                    F.lit("test_db").alias("db"),
                    F.lit(table).alias("coll"),
                ).alias("ns"),
                F.lit(None).cast("string").alias("to"),
                doc_key.alias("documentKey"),
                F.lit(None).cast("string").alias("updateDescription"),
                F.lit(None).cast("string").alias("clusterTime"),
                F.lit(None).cast("string").alias("txnNumber"),
                F.lit(None).cast("string").alias("lsid"),
            ),
            {"ignoreNullFields": "false"},
        )

    scalar_key = F.concat(
        F.lit('{"_id": '), F.col("o_orderkey").cast("string"), F.lit("}")
    )
    object_key = F.concat(
        F.lit('{"_id": {"$numberLong": "'),
        F.col("o_orderkey").cast("string"),
        F.lit('"}}'),
    )
    doc = F.to_json(F.struct("o_orderkey", "o_custkey", "o_totalprice"))
    inserts = o.select(env("insert", scalar_key, doc, 0).alias("value"))
    deletes = o.filter(F.col("o_orderkey") % 10 == 0).select(
        env("delete", object_key, F.lit(None).cast("string"), 1_000_000).alias(
            "value"
        )
    )
    return inserts.unionAll(deletes)
