"""Streaming session-transition census: the readStream face of
q_window_transitions — consecutive event pairs inside a session (gap <=
30 min), evolving as events arrive.

Semantics: the batch op zips each user's TIME-sorted events with their
successors; a stream sees consecutive chunks, so the twin carries the
boundary — (last_t, last_ty), TWO fields per user, volume-independent —
and sorts within each micro-batch by (t, event_id). Prepending the carried
last event to the sorted chunk makes the chunk-local pair zip EXACTLY the
batch zip whenever delivery respects event-time order across micro-batches
(the same in-order contract funnel_stream documents; out-of-order delivery
degrades to arrival-order semantics).

Each emission is the micro-batch's transition DELTAS (src, dst, d): counts
merge by addition, so the drained sum per (src, dst) equals the batch
census bit-exactly (pinned by test). The per-source share_milli tail of
the batch relation is a census-sized batch read over the sink, not stream
state.

The per-batch fold is numpy/pandas-vectorized (shifted-array pair gap
filter + a value_counts census), no per-row Python."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# mirrors queries.q_window_transitions (30 min session gap in micros);
# tests assert drained-sum == batch census so the two cannot drift
TRANS_GAP_US = 1_800_000_000

TRANS_SCHEMA = "src string, dst string, d long"
_STATE_SCHEMA = "last_t long, last_ty string"


def _update_transitions(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        return
    batch = pd.concat(frames).sort_values(["t", "eid"])
    t = batch["t"].to_numpy(dtype="int64")
    ty = batch["ty"].to_numpy()
    if state.exists:
        last_t, last_ty = state.get
        t = np.concatenate(([np.int64(last_t)], t))
        ty = np.concatenate(([last_ty], ty))
    state.update((int(t[-1]), str(ty[-1])))
    ok = (t[1:] - t[:-1]) <= TRANS_GAP_US
    if not ok.any():
        return
    census = (
        pd.DataFrame({"src": ty[:-1][ok], "dst": ty[1:][ok]})
        .value_counts()
        .reset_index(name="d")
    )
    yield census.astype({"d": "int64"})


def transition_deltas(events: DataFrame) -> DataFrame:
    """applyInPandasWithState over the event stream: per micro-batch
    session-transition deltas (src, dst, d). Summing the drained deltas
    per (src, dst) equals the batch census exactly under in-order
    delivery."""
    ev = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.col("event_id").cast("long").alias("eid"),
        F.col("event_type").alias("ty"),
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _update_transitions,
        outputStructType=TRANS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
