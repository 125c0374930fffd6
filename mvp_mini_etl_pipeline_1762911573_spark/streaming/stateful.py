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
