"""Streaming CEP: the strict-contiguity pattern automaton
(``plans/analytics_extras2.events_cep_pattern``) run as a TRUE streaming
operator — per-key NFA state carried across micro-batches via
``applyInPandasWithState``, the Spark form of Flink's keyed CEP operator
(the reference ecosystem's flagship feature; its own pipeline is
stateless, SURVEY.md A36, so this lives in the Part-B closure).

State per user is the last TWO events (type, time, id) — constant-width,
exactly what a strict-contiguity ``begin.next.next`` NFA needs; matches
are emitted the moment the third event arrives.  Correctness requires
per-key time-ordered arrival across batches (Flink's CEP makes the same
in-order assumption after watermark alignment); the feed builder in the
registered query replays the corpus as monotonic time slabs to honor it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CEP_OUT_SCHEMA = (
    "user_id bigint, start_event_id bigint, end_event_id bigint, "
    "start_ts string, end_ts string"
)
# previous-previous and previous event per user; '' / -1 = empty slots
CEP_STATE_SCHEMA = (
    "t1 string, s1 string, i1 bigint, t2 string, s2 string, i2 bigint"
)

TS_FULL = "yyyy-MM-dd HH:mm:ss.SSSSSS"  # lexicographically time-ordered


def advance_automaton(prev_state, uid, batch, pattern, within_days):
    """The PURE per-key NFA step: ((t1,s1,i1,t2,s2,i2) state, a pandas
    batch of (event_id, event_type, tss)) → (new state, emitted match
    tuples).  Factored out of the streaming closure so the cross-batch
    property — any split of a stream into batches yields the same
    concatenated matches as one pass — is testable without a stream
    (hypothesis test in tests/test_analytics_extras2.py)."""
    import pandas as pd

    p0, p1, p2 = pattern
    bound = pd.Timedelta(days=within_days)
    t1, s1, i1, t2, s2, i2 = prev_state
    # per-key in-batch order: strings sort as time (TS_FULL)
    batch = batch.sort_values(["tss", "event_id"])
    # parse the whole batch's timestamps ONCE (vectorized); the scalar
    # loop below only compares pre-parsed values.  The carried-in state
    # slots are the only per-call scalar parses.
    ts_parsed = pd.to_datetime(batch["tss"]).tolist()
    d1 = pd.to_datetime(s1) if s1 else None
    d2 = pd.to_datetime(s2) if s2 else None
    out: list[tuple] = []
    for r, rts in zip(batch.itertuples(index=False), ts_parsed):
        if (
            t1 == p0  # implies slot 1 is filled, so d1 is parsed
            and t2 == p1
            and r.event_type == p2
            and rts <= d1 + bound
        ):
            out.append((uid, i1, r.event_id, s1[:19], r.tss[:19]))
        t1, s1, i1, d1 = t2, s2, i2, d2
        t2, s2, i2, d2 = r.event_type, r.tss, r.event_id, rts
    return (t1, s1, i1, t2, s2, i2), out


def cep_strict_triple(
    events: DataFrame,
    pattern: tuple[str, str, str] = ("view", "click", "purchase"),
    within_days: int = 1,
) -> DataFrame:
    """events(user_id, event_id, event_type, tss) → matches of
    ``pattern[0] → pattern[1] → pattern[2]`` with NO intervening event
    for that user and ``end - start <= within_days``.

    ``tss`` must be the microsecond-resolution formatted timestamp
    (TS_FULL) so plain string comparison is time order — the automaton
    never parses times except for the window bound."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key_tuple, pdfs, state: GroupState):
        prev = state.get if state.exists else ("", "", -1, "", "", -1)
        batch = pd.concat(list(pdfs), ignore_index=True)
        new_state, out = advance_automaton(
            prev, key_tuple[0], batch, pattern, within_days
        )
        state.update(new_state)
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "start_event_id",
                "end_event_id",
                "start_ts",
                "end_ts",
            ],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        CEP_OUT_SCHEMA,
        CEP_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
