"""Round-4d operator properties the oracle sweep can't see: strict
contiguity of CEP matches (verified independently against the raw event
stream), PageRank mass conservation, the KMV estimator actually taking
its sketch path, and path-mining counts against a pandas recomputation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from flink_cdc_msk_spark.plans.analytics_extras2 import (
    agg_kmv_theta_ops,
    events_cep_pattern,
    events_top_paths,
    graph_pagerank_copurchase,
)
from tests.conftest import SF_ORACLE, SF_SMALL


def test_cep_matches_are_strictly_contiguous(spark):
    """Every (view, click, purchase) match must have EXACTLY one event —
    the matched click — strictly between its endpoints for that user:
    the property that distinguishes CEP `next` from funnel
    `followedBy`, checked against the raw stream, not the window."""
    matches = events_cep_pattern(spark, SF_SMALL)
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet").select(
        "user_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t")
    )
    between = (
        matches.join(ev, "user_id")
        .filter((F.col("t") > F.col("start_ts")) & (F.col("t") < F.col("end_ts")))
        .groupBy("user_id", "start_event_id")
        .agg(F.count(F.lit(1)).alias("n_between"))
    )
    bad = between.filter(F.col("n_between") != 1).count()
    assert bad == 0
    # and the pattern does fire on this corpus
    assert matches.count() > 0


def test_top_paths_match_pandas_recomputation(spark):
    pdf = pd.read_parquet(f"{SF_SMALL}/events.parquet")[
        ["user_id", "ts", "event_id", "event_type"]
    ].sort_values(["user_id", "ts", "event_id"])
    counts: dict[str, int] = {}
    for _, g in pdf.groupby("user_id"):
        types = g["event_type"].tolist()
        for i in range(len(types) - 2):
            p = ">".join(types[i : i + 3])
            counts[p] = counts.get(p, 0) + 1
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["path"], r["n"])
        for r in events_top_paths(spark, SF_SMALL).collect()
    ]
    assert got == expected


def test_pagerank_conserves_mass(spark):
    """Symmetric edges ⇒ no dangling mass: total rank stays at N (the
    uniform-start fixed-point sum) through every iteration."""
    ranks = graph_pagerank_copurchase(spark, SF_SMALL)
    agg = ranks.agg(
        F.count(F.lit(1)).alias("n"), F.sum("rank").alias("total")
    ).collect()[0]
    assert agg["n"] > 0
    assert abs(agg["total"] - agg["n"]) < 1e-4 * agg["n"]
    assert ranks.filter(F.col("rank") <= 0.15).count() == 0


def test_kmv_takes_sketch_path_and_stays_in_gate(spark):
    rows = {r["set_name"]: r for r in agg_kmv_theta_ops(spark, SF_ORACLE).collect()}
    assert set(rows) == {"urgent", "low", "union", "intersection"}
    # the corpus is big enough that the estimator path (not the exact
    # fallback) is what the oracle hash actually verified — and the sets
    # genuinely differ, so the union/intersection algebra is non-trivial
    for s in ("urgent", "low", "union"):
        assert rows[s]["exact_n"] > 256
        assert rows[s]["est_n"] != rows[s]["exact_n"]
    assert rows["union"]["exact_n"] > rows["urgent"]["exact_n"]
    assert rows["intersection"]["exact_n"] < rows["low"]["exact_n"]
    assert all(r["within_20pct"] for r in rows.values())


def test_streaming_cep_state_crosses_batch_boundary(spark, tmp_path):
    """Two hand-built slabs: user 1's view+click arrive in slab 1, the
    purchase in slab 2 — the match REQUIRES the automaton state to
    survive the micro-batch boundary.  User 2 has an intervening error
    event, which must kill the strict-contiguity match."""
    import json
    import os

    from flink_cdc_msk_spark.streaming.cep import cep_strict_triple
    from flink_cdc_msk_spark.streaming.materialize import (
        stream_foreach_batch_parquet,
    )

    src = tmp_path / "src"
    slab1 = [
        {"user_id": 1, "event_id": 10, "event_type": "view",
         "tss": "2024-01-01 10:00:00.000000"},
        {"user_id": 1, "event_id": 11, "event_type": "click",
         "tss": "2024-01-01 10:05:00.000000"},
        {"user_id": 2, "event_id": 20, "event_type": "view",
         "tss": "2024-01-01 10:00:00.000000"},
        {"user_id": 2, "event_id": 21, "event_type": "click",
         "tss": "2024-01-01 10:05:00.000000"},
        {"user_id": 2, "event_id": 22, "event_type": "error",
         "tss": "2024-01-01 10:06:00.000000"},
    ]
    slab2 = [
        {"user_id": 1, "event_id": 12, "event_type": "purchase",
         "tss": "2024-01-01 10:10:00.000000"},
        {"user_id": 2, "event_id": 23, "event_type": "purchase",
         "tss": "2024-01-01 10:10:00.000000"},
    ]
    for i, slab in enumerate((slab1, slab2), start=1):
        p = src / f"s{i:02d}"
        p.mkdir(parents=True)
        f = p / "data.json"
        f.write_text("\n".join(json.dumps(r) for r in slab))
        os.utime(f, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, event_type string, tss string"
        )
        .option("maxFilesPerTrigger", "1")
        .json(f"{src}/s*")
    )
    out = cep_strict_triple(stream)
    scan = stream_foreach_batch_parquet(
        out, str(tmp_path / "mat"), output_mode="update"
    )
    rows = scan.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["user_id"], r["start_event_id"], r["end_event_id"]) == (1, 10, 12)
    assert r["start_ts"] == "2024-01-01 10:00:00"
    assert r["end_ts"] == "2024-01-01 10:10:00"
    # and it genuinely ran as two micro-batches
    assert (tmp_path / "mat" / "out" / "batch_id=1").exists()


def test_ewma_matches_pandas_reference(spark):
    """Third implementation: pandas ewm(adjust=False, alpha=0.25) over
    the same per-user time-ordered series must reproduce the engine's
    fold (the oracle only proves Spark==DuckDB; this catches a shared
    misunderstanding of the recurrence in both twins)."""
    from flink_cdc_msk_spark.plans.analytics_extras2 import (
        events_ewma_smoothing,
    )

    got = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in events_ewma_smoothing(spark, SF_SMALL).collect()
    }
    pdf = pd.read_parquet(f"{SF_SMALL}/events.parquet")[
        ["user_id", "ts", "event_id", "value"]
    ].sort_values(["user_id", "ts", "event_id"])
    for uid, g in pdf.groupby("user_id"):
        ref = g["value"].ewm(alpha=0.25, adjust=False).mean().iloc[-1]
        n, ewma = got[uid]
        assert n == len(g)
        assert abs(ewma - round(ref, 6)) < 1e-9, uid


def test_tombstone_retention_survives_out_of_order_delete(spark, tmp_path):
    """A late-arriving earlier image after a delete must NOT resurrect the
    key when tombstones are retained — and the default in-order mode
    documents exactly this hazard (it would resurrect)."""
    import json as _json

    from pyspark.sql import functions as F2

    from flink_cdc_msk_spark.streaming.compaction import ParquetUpsertSink

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

    for retain, expect_live in ((True, 0), (False, 1)):
        path = str(tmp_path / f"state_{retain}")
        sink = ParquetUpsertSink(
            path, ["o_orderkey"], retain_tombstones=retain
        )
        sink(spark.createDataFrame([(env("c", 1, 1),)], "value string"), 0)
        sink(spark.createDataFrame([(env("d", 1, 3),)], "value string"), 1)
        # the late batch: an UPDATE whose ts predates the delete
        sink(spark.createDataFrame([(env("u", 1, 2),)], "value string"), 2)
        state = spark.read.parquet(path)
        live = state.filter(F2.col("op") != "d").count()
        assert live == expect_live, f"retain_tombstones={retain}"


def test_cep_automaton_split_invariance_property():
    """Hypothesis: for ANY time-ordered event stream and ANY split into
    micro-batches, threading the automaton state across batches yields
    exactly the single-pass matches, which equal a brute-force scan for
    strictly-consecutive (view, click, purchase) triples within the
    window — the property that makes the streaming CEP query equal its
    batch oracle regardless of slab boundaries."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_cdc_msk_spark.streaming.cep import advance_automaton

    types = ["view", "click", "purchase", "error"]
    events_strategy = st.lists(
        st.tuples(st.sampled_from(types), st.integers(0, 3_000_000)),
        min_size=0,
        max_size=30,
    )

    def mk_batch(rows):
        return pd.DataFrame(
            rows, columns=["event_id", "event_type", "tss"]
        )

    @settings(max_examples=150, deadline=None)
    @given(events=events_strategy, data=st.data())
    def run(events, data):
        # build a time-ordered stream with unique (tss, event_id)
        rows = []
        t0 = pd.Timestamp("2024-01-01")
        acc = 0
        for i, (etype, gap_s) in enumerate(events):
            acc += gap_s
            ts = t0 + pd.Timedelta(seconds=acc)
            rows.append((i, etype, ts.strftime("%Y-%m-%d %H:%M:%S.%f")))
        # brute force: strictly consecutive triples within 1 day
        expected = []
        for i in range(len(rows) - 2):
            (ia, ta, sa), (_, tb, _), (ic, tc, sc) = (
                rows[i], rows[i + 1], rows[i + 2],
            )
            if (
                ta == "view" and tb == "click" and tc == "purchase"
                and pd.to_datetime(sc)
                <= pd.to_datetime(sa) + pd.Timedelta(days=1)
            ):
                expected.append((7, ia, ic, sa[:19], sc[:19]))
        # single pass
        state0 = ("", "", -1, "", "", -1)
        _, single = advance_automaton(
            state0, 7, mk_batch(rows), ("view", "click", "purchase"), 1
        )
        assert single == expected
        # arbitrary contiguous split into batches
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(0, len(rows)), min_size=0, max_size=4
                )
            )
        )
        state, out = state0, []
        prev = 0
        for c in cuts + [len(rows)]:
            state, emitted = advance_automaton(
                state, 7, mk_batch(rows[prev:c]),
                ("view", "click", "purchase"), 1,
            )
            out.extend(emitted)
            prev = c
        assert out == expected

    run()


def test_kmv_merge_lossless_property():
    """The lemma streaming_kmv_sketch_merge rests on: the k smallest
    distinct hashes of a union equal the k smallest of the union of
    per-chunk k-smallest partials, for ANY chunking — KMV merge is
    lossless. Hypothesis drives random value multisets and splits."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    K = 8

    @settings(max_examples=200, deadline=None)
    @given(
        values=st.lists(st.integers(0, 10_000), min_size=0, max_size=120),
        n_chunks=st.integers(1, 6),
        data=st.data(),
    )
    def run(values, n_chunks, data):
        chunks = [[] for _ in range(n_chunks)]
        for v in values:
            chunks[data.draw(st.integers(0, n_chunks - 1))].append(v)
        direct = sorted(set(values))[:K]
        partials = []
        for c in chunks:
            partials.extend(sorted(set(c))[:K])
        merged = sorted(set(partials))[:K]
        assert merged == direct

    run()
