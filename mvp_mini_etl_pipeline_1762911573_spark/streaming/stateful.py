"""Custom stateful streaming operator (SURVEY.md §2.9 ST5+ / §2.11):
per-user running totals via applyInPandasWithState — the escape hatch
for operators Spark's built-in streaming aggs can't express (custom
state transitions, conditional emission, model-ish state).

Scale notes: state lives in the state store keyed by the groupBy key
(RocksDB-backed on a real cluster); each micro-batch routes a key's
rows to its state partition — the shuffle is on user_id, state reads
are local.  GroupStateTimeout would bound state lifetime for keyed
TTL; the running-total demo keeps state forever (bounded by key
cardinality, not stream length).

Spark 4's successor API, transformWithStateInPandas (typed value/list/
map state, timers, TTL), is the upgrade path for richer state — it
requires the python protobuf package for its driver-side runner, which
this container lacks (ImportError: google.protobuf.descriptor), so the
engine ships the applyInPandasWithState flavor which has no such
dependency.  The operator shape (groupBy key → per-key generator →
typed output rows) is identical; migration is mechanical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id bigint, events_seen bigint, value_sum double"
STATE_SCHEMA = "events_seen bigint, value_sum double"


CDC_OUT_SCHEMA = ("user_id bigint, k int, ts_us bigint, "
                  "event_id bigint, is_del boolean, value double")
CDC_STATE_SCHEMA = "ts_us bigint, event_id bigint, is_del boolean, value double"


def cdc_state_stream(events: DataFrame) -> DataFrame:
    """Streaming flavor of the batch `cdc_apply` operator: last-
    writer-wins CDC state per (user_id, k) key, maintained across
    micro-batches — the live materialized-view half of log-to-table
    replay (the batch flavor is the compaction pass; this is what the
    ingest path runs between compactions).

    State per key is just the winning op (max (ts_us, event_id)) —
    taking a max is commutative and associative, so the converged
    state is IDENTICAL under any micro-batch split of the log, which
    is exactly what the convergence pytest exercises by replaying the
    same log as one, and as three, source files.  Emits the updated
    state for every key touched in a batch (update mode); tombstones
    (is_del) stay IN state rather than deleting it — a later re-upsert
    of the key must still compare against the tombstone's position."""

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        user_id, k = key
        best = state.get if state.exists else None
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                cand = (int(r.ts_us), int(r.event_id),
                        bool(r.is_del), float(r.value))
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
        state.update(best)
        yield pd.DataFrame({
            "user_id": [user_id], "k": [k],
            "ts_us": [best[0]], "event_id": [best[1]],
            "is_del": [best[2]], "value": [best[3]],
        })

    from pyspark.sql import functions as F
    keyed = events.select(
        "user_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        (F.col("event_type") == "error").alias("is_del"),
        "value",
    )
    return (
        keyed.groupBy("user_id", "k")
        .applyInPandasWithState(
            update,
            outputStructType=CDC_OUT_SCHEMA,
            stateStructType=CDC_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user (events_seen, value_sum) carried across micro-batches;
    emits the updated running totals for every user seen in a batch."""

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        seen, vsum = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            seen += len(pdf)
            vsum += float(pdf["value"].sum())
        state.update((seen, vsum))
        yield pd.DataFrame({
            "user_id": [user_id],
            "events_seen": [seen],
            "value_sum": [round(vsum, 2)],
        })

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


RL_OUT_SCHEMA = ("user_id bigint, event_id bigint, ts_us bigint, "
                 "n_in_window bigint")
RL_STATE_SCHEMA = "ts_us array<bigint>, ev array<bigint>"


def rate_limit_stream(events: DataFrame) -> DataFrame:
    """Streaming flavor of the batch `events_rate_limit` operator
    (operators/analytics.py): per-user trailing-24 h event counts
    maintained across micro-batches — the live ingest-side throttle
    (the batch flavor is the audit/backfill pass).

    Convergence contract: state keeps the user's full (ts, event_id)
    multiset, and every batch that touches a user re-derives the
    trailing-window count for ALL of that user's events and re-emits
    them keyed by event_id (update mode).  Adding events can only
    GROW a window count, so the MAX emission per event_id is the
    converged value under ANY micro-batch split or arrival order —
    late events with earlier timestamps retro-correct previously
    emitted counts, exactly matching the batch RANGE window on the
    drained log (the convergence pytest replays one log as one and as
    three source files).

    Scale: state is bounded by per-user event count; a production
    deployment bounds it further by evicting timestamps older than
    (max seen ts − 24 h − allowed lateness) per key — the watermark
    argument — and emits only changed rows.  The demo keeps the full
    multiset so convergence is provable row-for-row."""
    import bisect

    from pyspark.sql import functions as F

    from ..operators.analytics import RATE_LIMIT_US

    def update(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            ts_list, ev_list = state.get
            pairs = list(zip(list(ts_list), list(ev_list)))
        else:
            pairs = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                pairs.append((int(r.ts_us), int(r.event_id)))
        pairs.sort()
        state.update(([t for t, _ in pairs], [e for _, e in pairs]))
        ts_sorted = [t for t, _ in pairs]
        rows = {
            "user_id": [], "event_id": [], "ts_us": [], "n_in_window": [],
        }
        for t, e in pairs:
            lo = bisect.bisect_left(ts_sorted, t - RATE_LIMIT_US)
            hi = bisect.bisect_right(ts_sorted, t)
            rows["user_id"].append(user_id)
            rows["event_id"].append(e)
            rows["ts_us"].append(t)
            rows["n_in_window"].append(hi - lo)
        yield pd.DataFrame(rows)

    keyed = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
    return (
        keyed.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RL_OUT_SCHEMA,
            stateStructType=RL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
