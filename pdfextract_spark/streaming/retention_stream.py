"""Streaming cohort-retention grid: the readStream face of
q_window_retention — first-seen-day cohorts and per-offset activity,
evolving as events arrive.

Semantics: the batch op buckets each user by its MIN event day, then
counts, per (cohort_day, day_offset), the users active that day. A stream
sees consecutive chunks, so the twin carries per user (cohort_day,
seen_days) — the seen set is CALENDAR-bounded (days since the user's
cohort), the same boundedness argument the batch relation's output keys
make; it is volume-independent (a billion events on one day is one seen
entry).

Under in-order delivery (micro-batch boundaries respect event-time order,
the funnel/transitions contract), a user's first chunk contains its true
min day, so the carried cohort equals the batch cohort EXACTLY;
out-of-order delivery degrades to first-arrival cohorts.

Each emission is the micro-batch's grid DELTAS: (cohort_day, day_offset,
d_active, d_cohort) — d_active = newly-seen (user, day) pairs landing on
that cell, d_cohort = new users (carried only on the user's offset-0
row). Deltas merge by ADDITION, so the drained sums reproduce the batch
n_active / n_cohort censuses bit-exactly (pinned by test) and
retained_milli is a read-time division over the drained sink, not stream
state.

The per-batch fold is numpy-vectorized (np.unique day census +
np.setdiff1d against the carried seen set), no per-row Python.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DAY_US = 86_400_000_000  # mirrors q_window_retention's day bucketing

RET_SCHEMA = "cohort_day long, day_offset long, d_active long, d_cohort long"
_STATE_SCHEMA = "cohort_day long, seen_days array<long>"


def _update_retention(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        return
    days = np.unique(pd.concat(frames)["day"].to_numpy(dtype="int64"))
    if state.exists:
        cohort, seen = state.get
        seen = np.asarray(seen, dtype="int64")
        new_days = np.setdiff1d(days, seen)
        is_new_user = False
    else:
        cohort = int(days[0])  # min of the sorted unique days
        seen = np.array([], dtype="int64")
        new_days = days
        is_new_user = True
    if len(new_days) == 0:
        return
    state.update((int(cohort), [int(d) for d in np.union1d(seen, new_days)]))
    out = pd.DataFrame(
        {
            "cohort_day": np.int64(cohort),
            "day_offset": new_days - np.int64(cohort),
            "d_active": np.int64(1),
            "d_cohort": np.int64(0),
        }
    )
    if is_new_user:
        out.loc[out["day_offset"] == 0, "d_cohort"] = 1
    yield out.astype("int64")


def retention_deltas(events: DataFrame) -> DataFrame:
    """applyInPandasWithState over the event stream: per micro-batch
    retention-grid deltas. Summing d_active per (cohort_day, day_offset)
    and d_cohort per cohort_day over the drained sink equals the batch
    censuses exactly under in-order delivery."""
    ev = events.select(
        "user_id",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {DAY_US}").alias("day"),
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _update_retention,
        outputStructType=RET_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
