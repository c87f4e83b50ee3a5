"""Streaming window funnel: the readStream face of q_window_funnel —
per-user deepest view -> click -> purchase chain inside a 1h window of the
chain's first step, evolving as events arrive.

Semantics: the batch op folds each user's TIME-sorted events through the
latest-start DP; a stream sees arrival order, so the twin carries the DP
accumulator (s1, s2, s3 — THREE longs per user, volume-independent state)
across micro-batches and sorts within each micro-batch by (t, event_id).
Because the fold is a left-to-right recurrence, splitting a time-sorted
event sequence into consecutive micro-batches and carrying the accumulator
is EXACTLY the batch fold — stream == batch whenever delivery respects
event-time order across micro-batches (the in-order contract; a watermark
+ per-user buffer would buy bounded disorder at the cost of state width).
Out-of-order delivery degrades to the same arrival-order semantics every
funnel engine documents.

The per-batch fold is numpy-vectorized (three cummax recurrences over the
shifted accumulator), no per-row Python: for event i with pre-update
state s_k, s1 = running max of view times, s2 = running max of s1-before
where (click and t - s1_before <= W), s3 likewise over s2_before.

Depth is monotone non-decreasing over a user's lifetime, so the memory
sink's max per user IS the final depth."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# mirrors queries.q_window_funnel (W = 1h in micros, the 3-step chain);
# tests assert batch equality so the two cannot drift silently
FUNNEL_WINDOW_US = 3_600_000_000
FUNNEL_STEPS = ("view", "click", "purchase")

FUNNEL_SCHEMA = "user_id long, depth int"
_STATE_SCHEMA = "s1 long, s2 long, s3 long"


def _fold(t, ty, s1, s2, s3):
    """Vectorized latest-start funnel DP over one time-sorted batch.
    Returns the carried-out (s1, s2, s3)."""
    neg = np.int64(-1)
    vt = np.where(ty == FUNNEL_STEPS[0], t, neg)
    s1_run = np.maximum.accumulate(np.concatenate(([np.int64(s1)], vt)))
    s1_before = s1_run[:-1]
    c2 = np.where(
        (ty == FUNNEL_STEPS[1]) & (s1_before >= 0) & (t - s1_before <= FUNNEL_WINDOW_US),
        s1_before,
        neg,
    )
    s2_run = np.maximum.accumulate(np.concatenate(([np.int64(s2)], c2)))
    s2_before = s2_run[:-1]
    c3 = np.where(
        (ty == FUNNEL_STEPS[2]) & (s2_before >= 0) & (t - s2_before <= FUNNEL_WINDOW_US),
        s2_before,
        neg,
    )
    s3_run = np.maximum.accumulate(np.concatenate(([np.int64(s3)], c3)))
    return int(s1_run[-1]), int(s2_run[-1]), int(s3_run[-1])


def _update_funnel(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    s1, s2, s3 = state.get if state.exists else (-1, -1, -1)
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        return
    batch = pd.concat(frames).sort_values(["t", "eid"])
    s1, s2, s3 = _fold(
        batch["t"].to_numpy(dtype="int64"),
        batch["ty"].to_numpy(),
        s1, s2, s3,
    )
    state.update((s1, s2, s3))
    depth = 3 if s3 >= 0 else 2 if s2 >= 0 else 1 if s1 >= 0 else 0
    yield pd.DataFrame({"user_id": [key[0]], "depth": [depth]})


def funnel_depths(events: DataFrame) -> DataFrame:
    """applyInPandasWithState over the event stream: one evolving funnel
    depth per user_id. Streaming-only (Spark rejects the stateful surface
    on batch frames); a single-micro-batch run is one fold per user and
    equals the batch DP exactly (pinned by test)."""
    ev = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.col("event_id").cast("long").alias("eid"),
        F.col("event_type").alias("ty"),
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
