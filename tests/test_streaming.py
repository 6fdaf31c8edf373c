"""Streaming smoke tests (SURVEY.md §5.4): file-source CDC stream through
the same route pipeline, watermarked windows, streaming dedup, foreachBatch
compaction, checkpoint restart, restart supervisor.
"""

from __future__ import annotations

import json
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from flink_cdc_msk_spark.config import TableRouting
from flink_cdc_msk_spark.sources.cdc_sim import synthesize_mysql_events
from flink_cdc_msk_spark.streaming import (
    RestartSupervisor,
    route_stream_from_directory,
    snapshot_then_stream_paths,
    sessionized,
    streaming_dedup,
    tumbling_counts,
)
from flink_cdc_msk_spark.streaming.compaction import (
    ParquetUpsertSink,
    start_compaction_stream,
)
from tests.conftest import SF_SMALL

ROUTING = TableRouting.parse(
    '[{"db":"test_db","table":"orders","primary_key":"o_orderkey"}]'
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="cdc_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_available_now(stream_df, tmpdir, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", f"{tmpdir}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_route_matches_batch(spark, tmpdir):
    """File-stream route == batch route on identical input (exactly the
    same operator expressions run in both modes)."""
    events = synthesize_mysql_events(spark, SF_SMALL, with_updates=False)
    src = f"{tmpdir}/src"
    snapshot_then_stream_paths(events, src)

    routed = route_stream_from_directory(
        spark, src, ROUTING, topic_prefix="cdc_", num_partitions=12
    )
    _run_available_now(routed, tmpdir, "routed_stream")
    got = spark.sql(
        "SELECT partition_key, partition FROM routed_stream ORDER BY partition_key"
    ).collect()

    from flink_cdc_msk_spark.operators.route import route_mysql_cdc

    want = (
        route_mysql_cdc(events, ROUTING, topic_prefix="cdc_", num_partitions=12)
        .select("partition_key", "partition")
        .orderBy("partition_key")
        .collect()
    )
    assert got == want
    assert len(got) == 1500


def test_streaming_tumbling_window_drops_late_data(spark, tmpdir):
    lines = [
        # window 10:00, on time
        ("e1", "2024-01-01 10:05:00"),
        ("e2", "2024-01-01 10:55:00"),
        # advances watermark far past 10:00+2h
        ("e3", "2024-01-01 15:00:00"),
        # late beyond watermark → dropped
        ("e4", "2024-01-01 10:10:00"),
    ]
    src = f"{tmpdir}/ev"
    import os

    os.makedirs(src)
    # two files → two micro-batches: watermark advances between them
    with open(f"{src}/a.json", "w") as f:
        for i, (eid, ts) in enumerate(lines[:3]):
            f.write(json.dumps({"event_id": i, "ts": ts, "event_type": "click",
                                "value": 1.0}) + "\n")
    schema = "event_id long, ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    agg = tumbling_counts(stream, "1 hour", "2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling")
        .option("checkpointLocation", f"{tmpdir}/ckpt_tw")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only finalized windows (watermark passed) — the
    # 10:00 window (2 events) is final once the 15:00 event advanced the
    # watermark to 13:00.
    rows = spark.sql("SELECT * FROM tumbling").collect()
    finals = {str(r.window_start): r.n for r in rows}
    assert finals.get("2024-01-01 10:00:00") == 2


def test_streaming_dedup(spark, tmpdir):
    import os

    src = f"{tmpdir}/dups"
    os.makedirs(src)
    with open(f"{src}/a.json", "w") as f:
        for eid, ts in [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:00:01"),
                        (2, "2024-01-01 10:00:02"), (1, "2024-01-01 10:00:03")]:
            f.write(json.dumps({"event_id": eid, "ts": ts}) + "\n")
    stream = spark.readStream.schema("event_id long, ts timestamp").json(src)
    deduped = streaming_dedup(stream, ["event_id"], watermark="1 hour")
    _run_available_now(deduped, tmpdir, "deduped")
    rows = spark.sql("SELECT event_id FROM deduped").collect()
    assert sorted(r.event_id for r in rows) == [1, 2]


def test_streaming_dedup_rocksdb_state(spark, tmpdir):
    """Same dedup on the RocksDB state store provider (parity with the
    reference's RocksDB backend, emr/MySQLCDC2AWSMSK.scala:59 — spill-aware
    state for 100 TB keyed dedup). providerClass is a runtime SQLConf."""
    import os

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = f"{tmpdir}/dups_rocks"
        os.makedirs(src)
        with open(f"{src}/a.json", "w") as f:
            for eid, ts in [(1, "2024-01-01 10:00:00"),
                            (1, "2024-01-01 10:00:01"),
                            (2, "2024-01-01 10:00:02")]:
                f.write(json.dumps({"event_id": eid, "ts": ts}) + "\n")
        stream = spark.readStream.schema("event_id long, ts timestamp").json(src)
        deduped = streaming_dedup(stream, ["event_id"], watermark="1 hour")
        _run_available_now(deduped, tmpdir, "deduped_rocks")
        rows = spark.sql("SELECT event_id FROM deduped_rocks").collect()
        assert sorted(r.event_id for r in rows) == [1, 2]
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_session_window_stream(spark, tmpdir):
    import os

    src = f"{tmpdir}/sess"
    os.makedirs(src)
    with open(f"{src}/a.json", "w") as f:
        # user 1: two sessions separated by > 30 min; closer watermark-advancer
        for eid, ts, uid in [
            (1, "2024-01-01 10:00:00", 1),
            (2, "2024-01-01 10:10:00", 1),
            (3, "2024-01-01 12:00:00", 1),
            (4, "2024-01-01 23:00:00", 2),  # far future: finalizes sessions
        ]:
            f.write(json.dumps({"event_id": eid, "ts": ts, "user_id": uid,
                                "value": 2.0}) + "\n")
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, value double"
    ).json(src)
    sess = sessionized(stream, gap="30 minutes", watermark="1 hour")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions")
        .option("checkpointLocation", f"{tmpdir}/ckpt_sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT user_id, n_events FROM sessions WHERE user_id = 1"
    ).collect()
    # both user-1 sessions finalized: (2 events) + (1 event)
    assert sorted(r.n_events for r in rows) == [1, 2]


def test_stateful_running_totals_across_batches(spark, tmpdir):
    """applyInPandasWithState: per-key state must accumulate ACROSS
    micro-batches (two files, one per trigger) — the second batch's emitted
    running count includes the first batch's rows."""
    import os

    from flink_cdc_msk_spark.streaming import running_totals

    src = f"{tmpdir}/stateful"
    os.makedirs(src)
    with open(f"{src}/batch_a.json", "w") as f:
        f.write(json.dumps({"event_type": "click", "value": 1.0}) + "\n")
        f.write(json.dumps({"event_type": "click", "value": 2.0}) + "\n")
        f.write(json.dumps({"event_type": "view", "value": 5.0}) + "\n")
    with open(f"{src}/batch_b.json", "w") as f:
        f.write(json.dumps({"event_type": "click", "value": 4.0}) + "\n")

    stream = (
        spark.readStream.schema("event_type string, value double")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    out = running_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("running")
        .option("checkpointLocation", f"{tmpdir}/ckpt_running")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT key, n, total FROM running").collect()
    # update mode emits one row per active key per batch; the LAST click
    # row must carry cumulative state (file order across triggers isn't
    # guaranteed, so check the cumulative row exists with both orderings
    # collapsing to n=3/total=7)
    clicks = sorted((r.n, r.total) for r in rows if r.key == "click")
    assert clicks[-1] == (3, 7.0)
    views = [(r.n, r.total) for r in rows if r.key == "view"]
    assert (1, 5.0) in views


def test_foreach_batch_compaction(spark, tmpdir):
    """Streamed c/u/d envelopes compact to the same latest-state table the
    batch query produces."""
    events = synthesize_mysql_events(spark, SF_SMALL, with_updates=True)
    src = f"{tmpdir}/cdc"
    snapshot_then_stream_paths(events, src)
    stream = (
        spark.readStream.format("text").load(src)
    )
    sink = ParquetUpsertSink(f"{tmpdir}/state", ["o_orderkey"])
    q = start_compaction_stream(
        stream, sink, f"{tmpdir}/ckpt_compact", available_now=True
    )
    q.awaitTermination(180)

    state = spark.read.parquet(f"{tmpdir}/state")
    # orders: 1500 keys, every 20th deleted → 1425 live keys
    assert state.count() == 1500 - 75
    # updated keys carry the op=u image
    ups = state.filter(F.col("op") == "u").count()
    assert ups == 150 - 75  # %10==0 updated, half of those (%20==0) deleted


def test_bucketed_compaction_matches_full(spark, tmpdir):
    """Partition-aware upsert (rewrite only touched pk-hash buckets) must
    produce exactly the same live state as the full-rewrite sink."""
    events = synthesize_mysql_events(spark, SF_SMALL, with_updates=True)
    src = f"{tmpdir}/cdc_b"
    snapshot_then_stream_paths(events, src)
    stream = spark.readStream.format("text").load(src)
    sink = ParquetUpsertSink(f"{tmpdir}/state_b", ["o_orderkey"], num_buckets=8)
    q = start_compaction_stream(
        stream, sink, f"{tmpdir}/ckpt_compact_b", available_now=True
    )
    q.awaitTermination(180)

    got = spark.read.parquet(f"{tmpdir}/state_b")
    assert got.count() == 1500 - 75
    assert got.filter(F.col("op") == "u").count() == 150 - 75
    # bucket layout exists and covers the keyspace
    import os

    assert any(d.startswith("bucket=") for d in os.listdir(f"{tmpdir}/state_b"))


def test_bucketed_compaction_empties_fully_deleted_bucket(spark, tmpdir):
    """A batch that deletes EVERY key of one bucket must empty that bucket
    dir (dynamic partition overwrite alone would skip it)."""
    import json as _json

    def env(op, key, ts):
        return _json.dumps(
            {
                "before": {"o_orderkey": key} if op == "d" else None,
                "after": {"o_orderkey": key} if op != "d" else None,
                "source": {"db": "test_db", "table": "orders"},
                "op": op,
                "ts_ms": ts,
            }
        )

    sink = ParquetUpsertSink(f"{tmpdir}/state_e", ["o_orderkey"], num_buckets=2)
    b1 = spark.createDataFrame(
        [(env("c", k, 1),) for k in range(20)], "value string"
    )
    sink(b1, 0)
    state1 = spark.read.parquet(f"{tmpdir}/state_e")
    buckets = {
        r.bucket: [x.o_orderkey for x in
                   state1.filter(F.col("bucket") == r.bucket).collect()]
        for r in state1.select("bucket").distinct().collect()
    }
    victim, keys = next(iter(buckets.items()))
    b2 = spark.createDataFrame(
        [(env("d", k, 2),) for k in keys], "value string"
    )
    sink(b2, 1)
    state2 = spark.read.parquet(f"{tmpdir}/state_e")
    assert state2.filter(F.col("bucket") == victim).count() == 0
    assert state2.count() == 20 - len(keys)


def test_restart_supervisor_retries(spark, tmpdir):
    calls = {"n": 0}

    class FakeQuery:
        def __init__(self, fail):
            self.fail = fail

        def awaitTermination(self):
            if self.fail:
                raise RuntimeError("boom")

    def start():
        calls["n"] += 1
        return FakeQuery(fail=calls["n"] < 3)

    sup = RestartSupervisor(max_attempts=3, delay_s=0.01)
    sup.run(start)  # two failures then success
    assert calls["n"] == 3

    calls["n"] = 0

    def always_fail():
        calls["n"] += 1
        return FakeQuery(fail=True)

    sup2 = RestartSupervisor(max_attempts=2, delay_s=0.01)
    with pytest.raises(RuntimeError):
        sup2.run(always_fail)
    assert calls["n"] == 2


def test_streaming_near_dup_filter_across_batches(spark, tmpdir):
    """Cross-batch near-dup suppression: batch 2's near-copy of a batch-1
    doc must be rejected; its genuinely-new doc admitted; batch-1-internal
    near-dups keep only the lowest id. Unbounded lookback via the
    signature store — beyond dropDuplicatesWithinWatermark."""
    import os

    from flink_cdc_msk_spark.streaming.dedup_stream import (
        StreamingNearDupFilter,
        start_near_dup_stream,
    )

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the cat watches from the warm stone wall near the gate"
    )
    other = (
        "completely different content about spark structured streaming "
        "state stores and watermark semantics for large scale pipelines"
    )
    third = (
        "yet another unique document discussing minhash banding theory "
        "and the probability of candidate collisions at given thresholds"
    )
    src = f"{tmpdir}/neardup_src"
    os.makedirs(src)
    # batch A: doc 1, its near-dup 2 (suffix), unique 3
    with open(f"{src}/a.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": base}) + "\n")
        f.write(json.dumps({"doc_id": 2, "text": base + " zz yy"}) + "\n")
        f.write(json.dumps({"doc_id": 3, "text": other}) + "\n")
    # batch B: near-dup of doc 1 again, plus unique 5
    with open(f"{src}/b.json", "w") as f:
        f.write(json.dumps({"doc_id": 4, "text": base + " ww vv"}) + "\n")
        f.write(json.dumps({"doc_id": 5, "text": third}) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    filt = StreamingNearDupFilter(
        f"{tmpdir}/nd_store", f"{tmpdir}/nd_out", threshold=0.7
    )
    q = start_near_dup_stream(
        stream, filt, f"{tmpdir}/ckpt_nd", available_now=True
    )
    q.awaitTermination(180)

    admitted = sorted(
        r.doc_id for r in spark.read.parquet(f"{tmpdir}/nd_out").collect()
    )
    assert admitted == [1, 3, 5]


def test_near_dup_filter_batch_retry_is_idempotent(spark, tmpdir):
    """foreachBatch is at-least-once: re-invoking the SAME batch_id (a
    retry) must not duplicate admitted docs or band rows — each batch
    owns an overwrite-mode batch_id= dir."""
    from flink_cdc_msk_spark.streaming.dedup_stream import (
        StreamingNearDupFilter,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
         (2, "totally different words about distributed query engines")],
        "doc_id long, text string",
    )
    filt = StreamingNearDupFilter(
        f"{tmpdir}/r_store", f"{tmpdir}/r_out", threshold=0.7
    )
    filt(docs, batch_id=0)
    filt(docs, batch_id=0)  # simulated retry of the same micro-batch
    out = spark.read.parquet(f"{tmpdir}/r_out")
    assert sorted(r.doc_id for r in out.collect()) == [1, 2]
    state = spark.read.parquet(f"{tmpdir}/r_store")
    bands = state.filter(state.kind == "band")
    assert bands.count() == bands.dropDuplicates(["id", "band", "bucket"]).count()
    sets = state.filter(state.kind == "set")
    assert sorted(r.id for r in sets.select("id").collect()) == [1, 2]


def test_near_dup_verify_reads_persisted_sets_not_corpus(spark, tmpdir):
    """The round-4 audit's one scale-killer: cross-batch Jaccard verify
    must run against the PERSISTED unit-set sidecar, never by
    re-tokenizing the admitted corpus (O(corpus) per batch at 100 TB).
    Proof is behavioral: after batch 0, replace the admitted doc's TEXT
    in out_path with garbage while leaving the sidecar intact — a
    batch-1 near-dup of the original text must still be rejected, which
    is only possible if verify never touches out_path text."""
    from flink_cdc_msk_spark.streaming.dedup_stream import (
        StreamingNearDupFilter,
    )

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the cat watches from the warm stone wall near the gate"
    )
    filt = StreamingNearDupFilter(
        f"{tmpdir}/v_store", f"{tmpdir}/v_out", threshold=0.7
    )
    filt(
        spark.createDataFrame([(1, base)], "doc_id long, text string"),
        batch_id=0,
    )
    # corrupt the admitted TEXT on disk (ids unchanged)
    garbled = spark.createDataFrame(
        [(1, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii")],
        "doc_id long, text string",
    )
    garbled.write.mode("overwrite").parquet(f"{tmpdir}/v_out/batch_id=0")
    filt(
        spark.createDataFrame(
            [(2, base + " zz yy"), (3, "entirely new content about "
             "columnar shuffle formats and adaptive execution plans")],
            "doc_id long, text string",
        ),
        batch_id=1,
    )
    admitted = sorted(
        r.doc_id for r in spark.read.parquet(f"{tmpdir}/v_out").collect()
    )
    # 2 rejected via the sidecar sets (garbled text would have admitted it)
    assert admitted == [1, 3]


def test_user_stats_tws_if_protobuf_available(spark, tmp_path):
    """transformWithStateInPandas end-to-end — skipped where the
    container's protobuf is broken (the state-server protocol needs it);
    the operator itself is import-clean everywhere."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable in this container")
    from pyspark.sql import functions as F

    from flink_cdc_msk_spark.streaming.stateful import user_stats_tws

    prov_key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(
        prov_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "src"
        spark.createDataFrame(
            [(1, 2.0), (1, 3.0), (2, 5.0)], "user_id long, value double"
        ).write.json(str(src))
        stream = spark.readStream.schema("user_id long, value double").json(
            str(src)
        )
        out = user_stats_tws(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("tws_test")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = {
            r.user_id: r
            for r in spark.sql(
                "SELECT * FROM tws_test ORDER BY n"
            ).collect()
        }
        assert rows[1].n == 2 and abs(rows[1].total - 5.0) < 1e-9
        assert rows[2].v_min == 5.0 == rows[2].v_max
    finally:
        spark.conf.unset(prov_key)


def test_vector_near_dup_filter_across_batches(spark, tmpdir):
    """Vector twin of the cross-batch near-dup suppression: batch 2's
    near-copy (same direction, scaled) of a batch-1 vector must be
    rejected; an orthogonal vector admitted; the verify must read the
    VECTOR SIDECAR, not out_path (corrupted on disk between batches)."""
    from flink_cdc_msk_spark.streaming.dedup_stream import (
        StreamingVectorNearDupFilter,
    )

    def vec(axis, scale=1.0):
        v = [0.0] * 64
        v[axis] = scale
        return v

    filt = StreamingVectorNearDupFilter(
        f"{tmpdir}/v_store", f"{tmpdir}/v_out", threshold=0.9, dims=64
    )
    filt(
        spark.createDataFrame(
            [(1, vec(0)), (2, vec(1))],
            "vec_id long, embedding array<double>",
        ),
        batch_id=0,
    )
    # corrupt admitted vectors in out_path (ids unchanged): if verify
    # read out_path, the batch-1 near-dup would sail through
    spark.createDataFrame(
        [(1, vec(5)), (2, vec(6))], "vec_id long, embedding array<double>"
    ).write.mode("overwrite").parquet(f"{tmpdir}/v_out/batch_id=0")
    filt(
        spark.createDataFrame(
            # 3 ≈ vector 1 (cos 1.0); 4 orthogonal to everything
            [(3, vec(0, 2.5)), (4, vec(2))],
            "vec_id long, embedding array<double>",
        ),
        batch_id=1,
    )
    admitted = sorted(
        r.vec_id for r in spark.read.parquet(f"{tmpdir}/v_out").collect()
    )
    assert admitted == [1, 2, 4]
    # sidecar rows hold exactly the admitted ids
    side = spark.read.parquet(f"{tmpdir}/v_store").filter("kind = 'vec'")
    assert sorted(r.id for r in side.select("id").collect()) == [1, 2, 4]


def test_vector_near_dup_retry_is_idempotent(spark, tmpdir):
    """Re-invoking the SAME batch_id (foreachBatch retry) must not
    duplicate admitted vectors, bucket rows, or sidecar rows."""
    from flink_cdc_msk_spark.streaming.dedup_stream import (
        StreamingVectorNearDupFilter,
    )

    v1 = [1.0] + [0.0] * 63
    v2 = [0.0] * 63 + [1.0]
    vecs = spark.createDataFrame(
        [(1, v1), (2, v2)], "vec_id long, embedding array<double>"
    )
    filt = StreamingVectorNearDupFilter(
        f"{tmpdir}/r_store", f"{tmpdir}/r_out", threshold=0.9
    )
    filt(vecs, batch_id=0)
    filt(vecs, batch_id=0)
    out = spark.read.parquet(f"{tmpdir}/r_out")
    assert sorted(r.vec_id for r in out.collect()) == [1, 2]
    store = spark.read.parquet(f"{tmpdir}/r_store").filter("kind = 'bucket'")
    assert store.count() == store.dropDuplicates(
        ["id", "table", "bucket"]
    ).count()


def test_backfill_migrates_presidecar_store(spark, tmpdir):
    """A round-4 PRE-SIDECAR store (band rows only, no unit-set state)
    must (a) fail fast under the new unified-layout code, and (b) resume
    after backfill_unified_state re-derives the unit-sets from out_path —
    with cross-batch near-dup suppression still working."""
    import pytest

    from flink_cdc_msk_spark.streaming.dedup_stream import (
        StreamingNearDupFilter,
        backfill_unified_state,
    )

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the cat watches from the warm stone wall near the gate"
    )
    # stage batch 0 with current code, then strip its store down to the
    # legacy band-only layout (the exact on-disk state a round-4
    # checkpoint leaves behind)
    filt = StreamingNearDupFilter(
        f"{tmpdir}/m_store", f"{tmpdir}/m_out", threshold=0.7
    )
    filt(
        spark.createDataFrame([(1, base)], "doc_id long, text string"),
        batch_id=0,
    )
    legacy = f"{tmpdir}/legacy_store"
    spark.read.parquet(f"{tmpdir}/m_store").filter("kind = 'band'").select(
        "id", "band", "bucket"
    ).write.parquet(f"{legacy}/batch_id=0")

    filt2 = StreamingNearDupFilter(
        legacy, f"{tmpdir}/m_out", threshold=0.7
    )
    b1 = spark.createDataFrame(
        [(2, base + " zz yy"),
         (3, "entirely new content about columnar shuffle formats and "
             "adaptive execution plan strategies in modern engines")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="legacy near-dup state"):
        filt2(b1, batch_id=1)

    backfill_unified_state(spark, legacy, out_path=f"{tmpdir}/m_out")
    filt2(b1, batch_id=1)
    admitted = sorted(
        r.doc_id for r in spark.read.parquet(f"{tmpdir}/m_out").collect()
    )
    assert admitted == [1, 3]  # 2 is a near-dup of stored doc 1


def test_backfill_migrates_vector_store(spark, tmpdir):
    """The VECTOR twin's legacy layouts must migrate too (round-6 advice:
    backfill only handled text).  Round-5 layout = bucket store +
    ``_vecs`` sidecar; round-4 layout = bucket store only, vectors
    re-derived from out_path.  Both must fail fast before the migration
    and suppress a cross-batch near-dup after it."""
    import pytest

    from flink_cdc_msk_spark.streaming.dedup_stream import (
        StreamingVectorNearDupFilter,
        backfill_unified_state,
    )

    def vec(axis, scale=1.0):
        v = [0.0] * 64
        v[axis] = scale
        return v

    # stage batch 0 with current code, then strip to each legacy layout
    filt = StreamingVectorNearDupFilter(
        f"{tmpdir}/u_store", f"{tmpdir}/u_out", threshold=0.9, dims=64
    )
    filt(
        spark.createDataFrame(
            [(1, vec(0)), (2, vec(1))],
            "vec_id long, embedding array<double>",
        ),
        batch_id=0,
    )
    unified = spark.read.parquet(f"{tmpdir}/u_store")
    b1 = spark.createDataFrame(
        # 3 ≈ stored vector 1 (cos 1.0) → reject; 4 orthogonal → admit
        [(3, vec(0, 2.5)), (4, vec(2))],
        "vec_id long, embedding array<double>",
    )
    for name, with_sidecar in [("r5", True), ("r4", False)]:
        legacy = f"{tmpdir}/legacy_{name}"
        unified.filter("kind = 'bucket'").select(
            "id", "table", "bucket"
        ).write.parquet(f"{legacy}/batch_id=0")
        if with_sidecar:
            unified.filter("kind = 'vec'").select(
                "id", "v", F.lit(0).alias("batch_id")
            ).write.parquet(f"{legacy}_vecs")
        out = f"{tmpdir}/out_{name}"
        spark.read.parquet(f"{tmpdir}/u_out").write.parquet(
            f"{out}/batch_id=0"
        )
        filt2 = StreamingVectorNearDupFilter(
            legacy, out, threshold=0.9, dims=64
        )
        with pytest.raises(ValueError, match="legacy near-dup state"):
            filt2(b1, batch_id=1)
        backfill_unified_state(spark, legacy, out_path=out)
        filt2(b1, batch_id=1)
        admitted = sorted(
            r.vec_id for r in spark.read.parquet(out).collect()
        )
        assert admitted == [1, 2, 4], name


def test_near_dup_explosion_gate_paths_agree(spark, tmpdir):
    """The adaptive explosion insurance (candidate-volume gate on the
    pre-verify repartition) must not change admissions: forcing the
    spread path (gate=0) and the skip path (gate=huge) over the same
    batches admits identical ids."""
    from flink_cdc_msk_spark.streaming.dedup_stream import (
        StreamingNearDupFilter,
    )

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the cat watches from the warm stone wall near the gate"
    )
    b0 = spark.createDataFrame(
        [(1, base), (2, base + " zz yy"),
         (3, "totally different words about distributed query engines")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(4, base + " ww vv"),
         (5, "yet another unique document discussing minhash banding")],
        "doc_id long, text string",
    )
    results = {}
    for name, gate in [("spread", 0), ("skip", 1 << 60)]:
        filt = StreamingNearDupFilter(
            f"{tmpdir}/g{name}_store", f"{tmpdir}/g{name}_out",
            threshold=0.7, spread_min_candidates=gate,
        )
        filt(b0, batch_id=0)
        filt(b1, batch_id=1)
        results[name] = sorted(
            r.doc_id
            for r in spark.read.parquet(f"{tmpdir}/g{name}_out").collect()
        )
    assert results["spread"] == results["skip"] == [1, 3, 5]


def test_near_dup_lagged_observation_feeds_gate(spark, tmpdir):
    """The insurance gate's input is the PREVIOUS batch's candidate
    count, observed via a zero-job CollectMetrics node: a first batch
    never insures (lagged by design), a batch with band collisions
    raises ``_last_candidates`` so the next batch insures at a low
    threshold, and a collision-free batch resets it to zero."""
    from flink_cdc_msk_spark.streaming.dedup_stream import (
        StreamingNearDupFilter,
    )

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the cat watches from the warm stone wall near the gate"
    )
    filt = StreamingNearDupFilter(
        f"{tmpdir}/lag_store", f"{tmpdir}/lag_out",
        threshold=0.7, spread_min_candidates=1,
    )
    assert not filt._insure()  # lagged: batch 0 always skips
    filt(
        spark.createDataFrame(
            [(1, base), (2, base + " zz yy")],
            "doc_id long, text string",
        ),
        batch_id=0,
    )
    assert filt._last_candidates >= 1  # the intra near-dup pair collided
    assert filt._insure()
    filt(  # insured path; admissions must be unaffected
        spark.createDataFrame(
            [(3, "completely unrelated prose about catalyst plans")],
            "doc_id long, text string",
        ),
        batch_id=1,
    )
    assert filt._last_candidates == 0  # no collisions → gate re-arms off
    assert sorted(
        r.doc_id
        for r in spark.read.parquet(f"{tmpdir}/lag_out").collect()
    ) == [1, 3]


def _scd2_env(key, op, ts, val=""):
    import json

    payload = {"o_orderkey": str(key), "v": val}
    return json.dumps(
        {
            "before": payload if op == "d" else None,
            "after": None if op == "d" else payload,
            "op": op,
            "ts_ms": ts,
        }
    )


def test_scd2_sink_cross_batch_and_retry(spark, tmpdir):
    """A later batch's update must CLOSE the interval opened in an
    earlier batch; deletes close and are never current; re-invoking the
    same batch (foreachBatch retry) must not duplicate interval rows."""
    from flink_cdc_msk_spark.streaming.compaction import Scd2IntervalSink

    sink = Scd2IntervalSink(f"{tmpdir}/scd2", ["o_orderkey"], num_buckets=4)
    sink(
        spark.createDataFrame(
            [(_scd2_env(1, "c", 100, "a"),), (_scd2_env(2, "c", 110, "b"),)],
            "value string",
        ),
        0,
    )
    b1 = spark.createDataFrame(
        [(_scd2_env(1, "u", 200, "a2"),), (_scd2_env(2, "d", 210),)],
        "value string",
    )
    sink(b1, 1)
    sink(b1, 1)  # retry
    rows = {
        (r.o_orderkey, r.op): r
        for r in spark.read.parquet(f"{tmpdir}/scd2").collect()
    }
    assert len(rows) == 4
    assert rows[("1", "c")].valid_to == 200
    assert rows[("1", "c")].is_current == 0
    assert rows[("1", "u")].valid_to is None
    assert rows[("1", "u")].is_current == 1
    assert rows[("2", "c")].valid_to == 210
    assert rows[("2", "d")].is_current == 0


def test_scd2_sink_out_of_order_converges(spark, tmpdir):
    """A late-arriving EARLIER change (hostile slabbing) must slot into
    history correctly: the content-addressed log makes the maintained
    table order-independent."""
    from flink_cdc_msk_spark.streaming.compaction import Scd2IntervalSink

    sink = Scd2IntervalSink(f"{tmpdir}/scd2_o", ["o_orderkey"], num_buckets=4)
    sink(
        spark.createDataFrame(
            [(_scd2_env(1, "u", 200, "a2"),)], "value string"
        ),
        0,
    )
    sink(
        spark.createDataFrame(
            [(_scd2_env(1, "c", 100, "a"),)], "value string"
        ),
        1,
    )
    rows = {
        r.op: r for r in spark.read.parquet(f"{tmpdir}/scd2_o").collect()
    }
    assert rows["c"].valid_from == 100
    assert rows["c"].valid_to == 200
    assert rows["c"].is_current == 0
    assert rows["u"].valid_to is None
    assert rows["u"].is_current == 1
