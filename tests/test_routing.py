"""Golden envelope routing tests (SURVEY.md §5 strategy; FIXTURES.md §B).

Each fixture reproduces the reference map semantics at
MySQLCDC2AWSMSK.scala:95-168 / MongoCDC2AWSMSK.scala:79-102; expected
outputs are hand-computed from that code.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_cdc_msk_spark.config import TableRouting
from flink_cdc_msk_spark.functions.java_hash import (
    java_partition,
    java_partition_py,
    java_string_hashcode,
    java_string_hashcode_py,
)
from flink_cdc_msk_spark.operators.route import route_mongo_cdc, route_mysql_cdc

ROUTING = TableRouting.parse(
    json.dumps(
        [
            {"db": "test_db", "table": "product", "primary_key": "pid"},
            {
                "db": "test_db",
                "table": "product_01",
                "primary_key": "pid",
                "column_max_length": "col1=10|col2=20",
            },
            {
                "db": "tpcc",
                "table": "order_line",
                "primary_key": "ol_w_id,ol_d_id,ol_o_id,ol_number",
            },
            {"db": "test_db", "table": "prodx.*", "primary_key": "pid"},
            {"db": "test_db", "table": "nopk_table", "primary_key": ""},
        ]
    )
)


def mysql_event(
    db="test_db", table="product", op="c", before=None, after=None, ts=1678634463898
):
    return json.dumps(
        {
            "before": before,
            "after": after,
            "source": {
                "version": "1.6.4.Final",
                "connector": "mysql",
                "name": "mysql_binlog_source",
                "ts_ms": 1678634463000,
                "snapshot": "false",
                "db": db,
                "sequence": None,
                "table": table,
                "server_id": 57330068,
                "gtid": None,
                "file": "mysql-bin-changelog.007670",
                "pos": 804,
                "row": 0,
                "thread": None,
                "query": None,
            },
            "op": op,
            "ts_ms": ts,
            "transaction": None,
        }
    )


def route(spark, lines, routing=ROUTING, **kw):
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    kw.setdefault("topic_prefix", "cdc_")
    kw.setdefault("num_partitions", 12)
    rows = route_mysql_cdc(df, routing, **kw).collect()
    return rows


def test_insert_basic_pk(spark):
    row = mysql_event(after={"pid": 1, "pname": "prodcut-001", "pprice": "125.12"})
    [r] = route(spark, [row])
    assert r.partition_key == "test_db.product.1"
    assert r.topic == "cdc_test_db"
    assert r.db == "test_db" and r.table == "product"
    # value forwarded unchanged (no truncation for this table)
    assert json.loads(r.value) == json.loads(row)
    assert r.partition == java_partition_py("test_db.product.1", 12)


def test_delete_reads_pk_from_before(spark):
    row = mysql_event(op="d", before={"pid": 7, "pname": "x"}, after=None)
    [r] = route(spark, [row])
    assert r.partition_key == "test_db.product.7"


def test_update_reads_pk_from_after(spark):
    row = mysql_event(
        op="u", before={"pid": 7, "pname": "old"}, after={"pid": 7, "pname": "new"}
    )
    [r] = route(spark, [row])
    assert r.partition_key == "test_db.product.7"


def test_composite_pk_joined_with_dots(spark):
    row = mysql_event(
        db="tpcc",
        table="order_line",
        after={"ol_w_id": 1, "ol_d_id": 2, "ol_o_id": 3, "ol_number": 4, "x": "y"},
    )
    [r] = route(spark, [row])
    assert r.partition_key == "tpcc.order_line.1.2.3.4"
    assert r.topic == "cdc_tpcc"


def test_unconfigured_table_no_pk_fallback(spark):
    row = mysql_event(table="unknown_table", after={"a": 1})
    [r] = route(spark, [row])
    assert r.partition_key == "test_db.unknown_table.no_pk"


def test_configured_empty_pk_no_pk_fallback(spark):
    row = mysql_event(table="nopk_table", after={"a": 1})
    [r] = route(spark, [row])
    assert r.partition_key == "test_db.nopk_table.no_pk"


def test_regex_key_unanchored_match(spark):
    # rule key "test_db=prodx.*" matches table prodx_42 via findFirstIn
    row = mysql_event(table="prodx_42", after={"pid": 9})
    [r] = route(spark, [row])
    assert r.partition_key == "test_db.prodx_42.9"


def test_longest_key_first_precedence(spark):
    # "test_db=product_01" (len 18) wins over "test_db=product" (len 15)
    # even though both regexes match "test_db=product_01".
    row = mysql_event(table="product_01", after={"pid": 3, "col1": "short"})
    [r] = route(spark, [row])
    assert r.partition_key == "test_db.product_01.3"


def test_truncation_ge_boundary(spark):
    # column_max_length col1=10: length >= 10 triggers (scala:135) —
    # exactly-10 stays itself, 11 truncates to 10, 9 untouched.
    rows = [
        mysql_event(table="product_01", after={"pid": 1, "col1": "a" * 9}),
        mysql_event(table="product_01", after={"pid": 2, "col1": "b" * 10}),
        mysql_event(table="product_01", after={"pid": 3, "col1": "c" * 11}),
    ]
    out = {r.partition_key: json.loads(r.value) for r in route(spark, rows)}
    assert out["test_db.product_01.1"]["after"]["col1"] == "a" * 9
    assert out["test_db.product_01.2"]["after"]["col1"] == "b" * 10
    assert out["test_db.product_01.3"]["after"]["col1"] == "c" * 10


def test_truncation_on_delete_uses_before(spark):
    row = mysql_event(
        table="product_01", op="d", before={"pid": 4, "col2": "z" * 25}, after=None
    )
    [r] = route(spark, [row])
    v = json.loads(r.value)
    assert v["before"]["col2"] == "z" * 20
    assert v["after"] is None  # nulls preserved (serializeNulls parity)


def test_truncation_preserves_null_fields_and_types(spark):
    row = mysql_event(table="product_01", after={"pid": 5, "col1": "x" * 12, "n": 3})
    [r] = route(spark, [row])
    v = json.loads(r.value)
    assert v["before"] is None
    assert v["after"]["n"] == 3  # number type survives re-serialization
    assert v["source"]["gtid"] is None


def test_fixed_topic_when_no_prefix(spark):
    row = mysql_event(after={"pid": 1})
    [r] = route(spark, [row], topic_prefix="", topic="fixed_topic")
    assert r.topic == "fixed_topic"


def test_reserialize_always_canonicalizes(spark):
    line = mysql_event(after={"pid": 1, "s": "x"})
    spaced = line.replace(", ", ",  ")
    [r] = route(spark, [spaced], reserialize="always")
    assert r.value == json.dumps(json.loads(line), separators=(",", ":"))


# ---- Mongo path (MongoCDC2AWSMSK.scala:79-102) ----


def mongo_event(db="test_db", coll="product", doc_key='{"_id": 1.0}', op="insert"):
    return json.dumps(
        {
            "_id": doc_key,
            "operationType": op,
            "fullDocument": '{"price": 2.243}',
            "source": {"ts_ms": 0, "snapshot": "true"},
            "ts_ms": 1684928179757,
            "ns": {"db": db, "coll": coll},
            "to": None,
            "documentKey": doc_key,
            "updateDescription": None,
            "clusterTime": None,
            "txnNumber": None,
            "lsid": None,
        }
    )


def test_mongo_scalar_id(spark):
    df = spark.createDataFrame([(mongo_event(),)], "value string")
    [r] = route_mongo_cdc(df, topic_prefix="m_").collect()
    assert r.partition_key == "test_db.product.1.0"
    assert r.topic == "m_test_db"
    # raw line forwarded untouched (scala:97,100)
    assert r.value == mongo_event()


def test_mongo_nested_object_id_spaces_stripped(spark):
    dk = '{"_id": {"user": "u1", "id": 1.0}}'
    df = spark.createDataFrame([(mongo_event(doc_key=dk),)], "value string")
    [r] = route_mongo_cdc(df, topic="t").collect()
    assert r.partition_key == 'test_db.product.{"user":"u1","id":1.0}'


def test_mongo_missing_id_no_pk(spark):
    df = spark.createDataFrame(
        [(mongo_event(doc_key='{"other": 5}'),)], "value string"
    )
    [r] = route_mongo_cdc(df, topic="t").collect()
    assert r.partition_key == "test_db.product.no_pk"


# ---- java hashCode parity ----


def test_java_hashcode_matches_python_reference(spark):
    samples = [
        "",
        "a",
        "test_db.product.1",
        "tpcc.order_line.1.2.3.4",
        "test_db.orders.no_pk",
        "Ab",  # collides with "BC" in Java — good wraparound probe
        "polygenelubricants",  # famous negative hashCode
        "x" * 50,
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {
        r.s: (r.h, r.p)
        for r in df.select(
            "s",
            java_string_hashcode(F.col("s")).alias("h"),
            java_partition(F.col("s"), 12).alias("p"),
        ).collect()
    }
    for s in samples:
        assert got[s][0] == java_string_hashcode_py(s), s
        assert got[s][1] == java_partition_py(s, 12), s
    # known Java values
    assert java_string_hashcode_py("polygenelubricants") == -2147483648
    assert got["polygenelubricants"][1] == 4  # pmod(-2^31, 12), bug-fixed edge


# ------------------------- config / params (no Spark session needed)


def test_startup_position_mapping():
    from flink_cdc_msk_spark.config import parse_kafka_startup_position as p

    assert p("initial") == {"startingOffsets": "earliest"}  # A2
    assert p("latest") == {"startingOffsets": "latest"}  # A3
    assert p("timestamp:1700000000000") == {  # A6
        "startingTimestamp": "1700000000000"
    }
    # A5: GTID sets don't order against topic offsets — earliest + exact
    # envelope cut (test_gtid_resume_filter_cuts_at_set); unknown grammars
    # still refuse loudly (incl. a truncated non-UUID server field)
    assert p("gtid:3E11FA47-71CA-11E1-9E33-C80AA9429562:1-5") == {
        "startingOffsets": "earliest"
    }
    with pytest.raises(ValueError):
        p("gtid:3E11FA47-71CA-11E1-9E33:1-5")
    with pytest.raises(ValueError):
        p("not-a-position")


def test_startup_binlog_file_pos_mapping():
    """A4 ``file[:pos]``: explicit per-partition offset JSON when an index
    exists; earliest + exact envelope cut when it doesn't."""
    import json

    from flink_cdc_msk_spark.config import (
        parse_binlog_position,
        parse_kafka_startup_position as p,
    )

    assert parse_binlog_position("file:mysql-bin.000003:157") == (
        "mysql-bin.000003", 157
    )
    # pos defaults to 4 (first event after the binlog magic header)
    assert parse_binlog_position("file:mysql-bin.000003") == (
        "mysql-bin.000003", 4
    )
    # with a tracked index: explicit startingOffsets JSON
    opts = p(
        "file:mysql-bin.000003:4",
        topic="cdc_test_db",
        binlog_offset_index={0: 1200, 1: 980},
    )
    assert json.loads(opts["startingOffsets"]) == {
        "cdc_test_db": {"0": 1200, "1": 980}
    }
    # without an index: earliest; the exact cut comes from the envelope
    # filter applied by read_cdc_stream
    assert p("file:mysql-bin.000003:4") == {"startingOffsets": "earliest"}
    with pytest.raises(ValueError):
        parse_binlog_position("file:not-a-pos:xx")


def test_binlog_resume_filter_cuts_at_coordinates(spark):
    """The earliest+filter path is EXACT: events strictly before the
    requested (file, pos) drop; later files and same-file>=pos keep;
    source-less rows (snapshot stand-ins) pass."""
    import json

    from flink_cdc_msk_spark.config import binlog_resume_filter

    rows = [
        ("mysql-bin.000002", 9999, "early_file"),
        ("mysql-bin.000003", 3, "same_file_before"),
        ("mysql-bin.000003", 4, "at_cut"),
        ("mysql-bin.000003", 500, "after_cut"),
        ("mysql-bin.000010", 4, "later_file"),
        (None, None, "snapshot"),
    ]
    df = spark.createDataFrame(
        [
            (
                json.dumps(
                    {"source": {"file": f, "pos": po}, "tag": tag}
                    if f is not None
                    else {"tag": tag}
                ),
            )
            for f, po, tag in rows
        ],
        "value string",
    )
    kept = {
        json.loads(r.value)["tag"]
        for r in df.filter(
            binlog_resume_filter("file:mysql-bin.000003:4")
        ).collect()
    }
    assert kept == {"at_cut", "after_cut", "later_file", "snapshot"}


def test_kafka_properties_passthrough():
    from flink_cdc_msk_spark.config import CDCParams

    params = CDCParams(
        kafka_properties="max.request.size=1073741824, acks=-1"
    )
    assert params.kafka_options() == {
        "kafka.max.request.size": "1073741824",
        "kafka.acks": "-1",
    }
    assert CDCParams().kafka_options() == {}


def test_routing_duplicate_key_last_wins_and_backslash_strip():
    from flink_cdc_msk_spark.config import TableRouting

    r = TableRouting.parse(
        '[{"db":"d","table":"t","primary_key":"a"},'
        '{"db":"d","table":"t","primary_key":"b"}]'
    )
    assert len(r.rules) == 1 and r.rules[0].primary_key == ("b",)
    # scala:71 strips backslashes (KDA property escaping)
    r2 = TableRouting.parse(
        '[{"db":"d\\\\d","table":"t","primary_key":"x"}]'
    )
    assert r2.rules[0].key == "dd=t"


def test_truncation_idempotent_property(spark):
    """Routing an already-routed value is a no-op (SURVEY §5.3): the
    truncation + canonical re-serialization is idempotent, for lengths
    around the >= boundary and multibyte text."""
    rows = [
        mysql_event(
            table="product_01",
            after={"pid": i, "col1": "x" * n, "col2": "é" * m},
        )
        for i, (n, m) in enumerate(
            [(0, 0), (9, 19), (10, 20), (11, 21), (40, 40)]
        )
    ]
    once = route(spark, rows)
    again_in = [r.value for r in once]
    twice = route(spark, again_in)
    assert sorted(r.value for r in once) == sorted(r.value for r in twice)
    assert sorted(r.partition_key for r in once) == sorted(
        r.partition_key for r in twice
    )


@given(
    file=st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz-._0123456789", min_size=1
    ),
    pos=st.integers(min_value=0, max_value=2**48),
)
@settings(max_examples=200, deadline=None)
def test_binlog_position_grammar_roundtrip(file, pos):
    """Property: any file:<name>:<pos> round-trips; bare file:<name>
    defaults pos to 4 (binlog magic-header offset)."""
    from flink_cdc_msk_spark.config import parse_binlog_position

    assert parse_binlog_position(f"file:{file}:{pos}") == (file, pos)
    assert parse_binlog_position(f"file:{file}") == (file, 4)


def test_startup_gtid_mapping_and_set_parse():
    """A5 ``gtid:<set>``: earliest + exact envelope cut (like index-less
    file:pos); the full per-UUID interval structure survives parsing —
    gaps are NOT collapsed (they must replay on resume)."""
    from flink_cdc_msk_spark.config import (
        parse_gtid_set,
        parse_kafka_startup_position as p,
    )

    assert p("gtid:3E11FA47-71CA-11E1-9E33-C80AA9429562:1-5") == {
        "startingOffsets": "earliest"
    }
    assert parse_gtid_set(
        "3E11FA47-71CA-11E1-9E33-C80AA9429562:1-5:11-20,"
        "aaaabbbb-0000-0000-0000-000000000001:1-7"
    ) == {
        "3e11fa47-71ca-11e1-9e33-c80aa9429562": [(1, 5), (11, 20)],
        "aaaabbbb-0000-0000-0000-000000000001": [(1, 7)],
    }
    # touching/overlapping intervals merge; single-txn intervals parse
    assert parse_gtid_set(
        "3E11FA47-71CA-11E1-9E33-C80AA9429562:1-5:6-8:10"
    ) == {"3e11fa47-71ca-11e1-9e33-c80aa9429562": [(1, 8), (10, 10)]}


def test_gtid_set_parse_rejects_malformed():
    """A bare uuid (no intervals), a non-UUID token, junk bounds, or an
    empty interval refuse loudly instead of degrading to an uncut
    full-topic replay."""
    import pytest

    from flink_cdc_msk_spark.config import parse_gtid_set

    U = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    for bad in (
        U,                     # no interval list
        "not-a-uuid:1-5",      # non-UUID server field
        f"{U}:1-x",            # non-numeric bound
        f"{U}:9-5",            # empty interval
        f"{U}:1-5-9",          # too many dashes
    ):
        with pytest.raises(ValueError):
            parse_gtid_set(bad)


def test_gtid_resume_filter_cuts_at_set(spark):
    """Events covered by the executed set drop; later txns, unknown
    server UUIDs (failover!), and gtid-less rows (snapshot/non-GTID
    servers) pass."""
    import json

    from flink_cdc_msk_spark.config import gtid_resume_filter

    U1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    U2 = "bbbbbbbb-0000-0000-0000-000000000002"
    rows = [
        (f"{U1}:19", "covered_old"),
        (f"{U1}:20", "covered_edge"),
        (f"{U1}:7", "gap_txn_replays"),
        (f"{U1.upper()}:21", "next_txn_case_insensitive"),
        (f"{U2}:1", "unknown_uuid_failover"),
        (None, "snapshot_no_gtid"),
    ]
    df = spark.createDataFrame(
        [
            (
                json.dumps(
                    {"source": {"gtid": g}, "tag": tag}
                    if g is not None
                    else {"tag": tag}
                ),
            )
            for g, tag in rows
        ],
        "value string",
    )
    kept = {
        json.loads(r.value)["tag"]
        for r in df.filter(
            gtid_resume_filter(f"gtid:{U1}:1-5:11-20")
        ).collect()
    }
    assert kept == {
        "gap_txn_replays",
        "next_txn_case_insensitive",
        "unknown_uuid_failover",
        "snapshot_no_gtid",
    }


def test_gtid_set_parse_property():
    """Property: for any set of (uuid, interval-list) entries the parsed
    structure is sorted, disjoint, non-adjacent, and MEMBERSHIP-exact —
    probing each generated bound ±1 agrees with the raw spans (so merge
    normalization never widens or narrows coverage); whitespace/newlines
    and case are normalized. Mirrors the grammar MySQL SHOW MASTER
    STATUS emits."""
    from hypothesis import given, strategies as st

    from flink_cdc_msk_spark.config import parse_gtid_set

    uuids = st.uuids().map(str)
    intervals = st.lists(
        st.tuples(st.integers(1, 10**9), st.integers(0, 10**6)),
        min_size=1,
        max_size=4,
    )

    @given(st.dictionaries(uuids, intervals, min_size=1, max_size=5))
    def check(entries):
        parts = []
        for u, ivs in entries.items():
            spans = [f"{lo}-{lo + width}" for lo, width in ivs]
            parts.append(f"{u.upper()}:" + ":".join(spans))
        got = parse_gtid_set(", \n".join(parts))
        assert set(got) == {u.lower() for u in entries}
        for u, ivs in entries.items():
            raw = [(lo, lo + width) for lo, width in ivs]
            merged = got[u.lower()]
            # canonical form: sorted, disjoint, gaps of >= 2
            assert merged == sorted(merged)
            for (_, phi), (nlo, _) in zip(merged, merged[1:]):
                assert nlo > phi + 1
            # membership equivalence at every boundary and its neighbors
            probes = {p for lo, hi in raw for p in (lo - 1, lo, hi, hi + 1)}
            for p in probes:
                want_in = any(lo <= p <= hi for lo, hi in raw)
                got_in = any(lo <= p <= hi for lo, hi in merged)
                assert got_in == want_in, (u, p, raw, merged)

    check()


def test_debezium_jsonl_source_quarantines_malformed(spark, tmp_path):
    """The custom Python DataSource must surface unparseable lines as
    op='__malformed__' rows (route.py's quarantine contract), never
    drop or crash on them — and must parallelize one partition per
    file."""
    from flink_cdc_msk_spark.sources.debezium_source import register

    register(spark)
    good = '{"op":"c","ts_ms":5,"source":{"db":"d","table":"t"},"before":null,"after":{"k":1}}'
    (tmp_path / "a.jsonl").write_text(good + "\n{not json}\n")
    (tmp_path / "b.jsonl").write_text(good + "\n")
    df = (
        spark.read.format("debezium_jsonl")
        .option("path", str(tmp_path))
        .load()
    )
    rows = df.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r.op == "__malformed__"]
    assert len(bad) == 1 and bad[0].after_json == "{not json}"
    ok = [r for r in rows if r.op == "c"]
    assert all(r.db == "d" and r.table == "t" and r.ts_ms == 5 for r in ok)
    assert df.rdd.getNumPartitions() == 2


# ---- JVM re-serialization fast path (A17+A20, VERDICT r8 item 6) ----

PAYLOAD_SCHEMA = None


def _payload_schema():
    global PAYLOAD_SCHEMA
    if PAYLOAD_SCHEMA is None:
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        PAYLOAD_SCHEMA = StructType(
            [
                StructField("pid", LongType()),
                StructField("col1", StringType()),
                StructField("col2", StringType()),
                StructField("n", LongType()),
            ]
        )
    return PAYLOAD_SCHEMA


def _event_declared(table, op="c", before=None, after=None):
    """mysql_event with the payload emitted in DECLARED field order and
    every declared field present — the certified-envelope contract the
    JVM path requires for byte parity."""

    def full(d):
        if d is None:
            return None
        return {
            "pid": d.get("pid"),
            "col1": d.get("col1"),
            "col2": d.get("col2"),
            "n": d.get("n"),
        }

    return mysql_event(table=table, op=op, before=full(before), after=full(after))


def _route_both(spark, lines, **kw):
    """(pandas rows, jvm rows) for the same input."""
    pd_rows = route(spark, lines, **kw)
    jvm_rows = route(spark, lines, payload_schema=_payload_schema(), **kw)
    return pd_rows, jvm_rows


def test_jvm_mode_truncation_golden_parity(spark):
    """Both modes byte-agree on the full truncation golden set: the >=
    boundary, delete-side truncation, null preservation, numeric types."""
    rows = [
        _event_declared("product_01", after={"pid": 1, "col1": "a" * 9}),
        _event_declared("product_01", after={"pid": 2, "col1": "b" * 10}),
        _event_declared("product_01", after={"pid": 3, "col1": "c" * 11}),
        _event_declared(
            "product_01", op="d", before={"pid": 4, "col2": "z" * 25}
        ),
        _event_declared(
            "product_01", after={"pid": 5, "col1": "x" * 12, "n": 3}
        ),
    ]
    pd_rows, jvm_rows = _route_both(spark, rows)
    pd_out = {r.partition_key: r for r in pd_rows}
    jvm_out = {r.partition_key: r for r in jvm_rows}
    assert set(pd_out) == set(jvm_out)
    for k in pd_out:
        assert pd_out[k].value == jvm_out[k].value, k
    v = json.loads(jvm_out["test_db.product_01.3"].value)
    assert v["after"]["col1"] == "c" * 10
    v = json.loads(jvm_out["test_db.product_01.4"].value)
    assert v["before"]["col2"] == "z" * 20
    assert v["after"] is None
    v = json.loads(jvm_out["test_db.product_01.5"].value)
    assert v["after"]["n"] == 3
    assert v["source"]["gtid"] is None


def test_jvm_mode_untruncated_tables_canonical(spark):
    """A matched rule WITHOUT column_max_length: the JVM path re-emits
    the canonical (compact, nulls-preserved) envelope — byte-identical
    to the pandas reserialize="always" Gson-parity mode, and to the
    input itself when the producer already emits compact JSON in the
    declared order."""
    line = _event_declared("product", after={"pid": 1, "col1": "x"})
    compact = json.dumps(json.loads(line), separators=(",", ":"))
    [r] = route(spark, [line], payload_schema=_payload_schema())
    assert r.value == compact
    [r2] = route(spark, [compact], payload_schema=_payload_schema())
    assert r2.value == compact
    [rp] = route(spark, [line], reserialize="always")
    assert rp.value == compact
    assert r.partition_key == "test_db.product.1"


def test_jvm_mode_malformed_line_forwarded_raw(spark):
    """from_json -> null envelope must forward the original bytes so the
    A21 quarantine still sees them (pandas-mode behavior)."""
    bad = "not json at all"
    [r] = route(spark, [bad], payload_schema=_payload_schema())
    assert r.value == bad
    assert r.db is None and r.table is None


def test_jvm_mode_plan_has_no_python(spark):
    """The point of the fast path: no Python worker in the plan."""
    df = spark.createDataFrame(
        [(_event_declared("product_01", after={"pid": 1, "col1": "y" * 30}),)],
        "value string",
    )
    out = route_mysql_cdc(
        df, ROUTING, topic_prefix="cdc_", num_partitions=12,
        payload_schema=_payload_schema(),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    pd_plan = route_mysql_cdc(
        df, ROUTING, topic_prefix="cdc_", num_partitions=12
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in pd_plan


def test_payload_schema_drift_guard(spark):
    """ADVICE r9: the JVM fast path DROPS undeclared payload fields.
    payload_schema_drift must surface exactly those fields (the loud
    pre-flight), and this test pins the drop itself: the pandas mode
    forwards the drifted column, the JVM mode sheds it."""
    from flink_cdc_msk_spark.operators.route import payload_schema_drift

    drifted = mysql_event(
        table="product_01",
        after={"pid": 1, "col1": "a" * 11, "new_col": "surprise"},
    )
    clean = _event_declared("product_01", after={"pid": 2, "col1": "b"})
    df = spark.createDataFrame([(drifted,), (clean,)], "value string")

    drift = payload_schema_drift(df, _payload_schema()).collect()
    assert [(r.undeclared_column, r.n_rows) for r in drift] == [
        ("new_col", 1)
    ]
    clean_df = spark.createDataFrame([(clean,)], "value string")
    assert payload_schema_drift(clean_df, _payload_schema()).count() == 0

    # the drop this guard exists to catch:
    [pd_r] = route(spark, [drifted])
    [jvm_r] = route(spark, [drifted], payload_schema=_payload_schema())
    assert json.loads(pd_r.value)["after"]["new_col"] == "surprise"
    assert "new_col" not in json.loads(jvm_r.value)["after"]
    # both modes still truncate the declared column
    assert json.loads(pd_r.value)["after"]["col1"] == "a" * 10
    assert json.loads(jvm_r.value)["after"]["col1"] == "a" * 10
