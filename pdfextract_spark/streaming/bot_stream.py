"""Streaming bot detection: the readStream face of window_bot_users'
per-user gap-dispersion census.

State per user = FOUR longs (n_events, sum_gaps, sum_sq_gaps, last_ts_us):
the gap moments are additive once the chunk boundary gap is accounted for,
so under the in-order delivery contract (micro-batches arrive in event-time
order per user — the dedup/transitions/funnel stream contract) the drained
stats equal the batch census bit-exactly INCLUDING boundary-straddling
gaps: the carried last_ts stitches each batch's first gap to the previous
batch's last event. Per-batch work is a numpy sort + diff per user group;
the dispersion flag is recomputed on every emission from the exact integer
identity n*ssq - s^2, same expression as the batch op."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

BOT_MIN_EVENTS = 20
BOT_DISP_PM = 10

BOT_STREAM_SCHEMA = (
    "user_id string, n_events long, n_gaps long, mean_gap_s long,"
    " dispersion_pm long, bot_flag boolean"
)
_STATE_SCHEMA = "n long, s long, ssq long, last_us long"


def _update_user(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, s, ssq, last_us = state.get if state.exists else (0, 0, 0, -1)
    for pdf in pdfs:
        if not len(pdf):
            continue
        us = np.sort(pdf["us"].to_numpy(dtype="int64"))
        if last_us >= 0:
            us_all = np.concatenate(([last_us], us))
        else:
            us_all = us
        gaps = np.diff(us_all) // 1_000_000
        n += len(us)
        s += int(gaps.sum())
        ssq += int((gaps * gaps).sum())
        last_us = int(us[-1])
    state.update((n, s, ssq, last_us))
    n_gaps = n - 1 if n > 0 else 0
    if s == 0:
        disp = 1_000_000
    else:
        disp = (1000 * (n_gaps * ssq - s * s)) // (s * s)
    mean_gap = s // max(1, n_gaps)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "n_gaps": [n_gaps],
            "mean_gap_s": [mean_gap],
            "dispersion_pm": [disp],
            "bot_flag": [n >= BOT_MIN_EVENTS and disp <= BOT_DISP_PM],
        }
    )


def bot_stream(events: DataFrame) -> DataFrame:
    """applyInPandasWithState over an event stream: the evolving per-user
    gap-dispersion stats + bot flag. Drained output equals the batch
    census exactly under the in-order contract (boundary gaps carried via
    last_ts — pinned by test)."""
    rows = events.select(
        F.col("user_id").cast("string").alias("user_id"),
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
    )
    return rows.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=BOT_STREAM_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
