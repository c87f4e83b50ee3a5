"""Streaming daily-volume census: the readStream face of
window_anomaly_days' day census.

EXACT twin #4 (after HLL, CMS, gate-agreement): per-day event counts merge
by addition — associative and commutative — so any micro-batch partition of
the event log in ANY arrival order drains to the bit-identical daily census
the batch operator aggregates. State = ONE long per calendar day
(calendar-bounded regardless of event volume). The median/MAD anomaly
flags are a BOUNDED post-pass over the drained census (|days| rows), run
consumer-side exactly as the batch op's 1-row fold — the stream ships the
additive part, the robust statistics need the whole census by definition.

The day derivation is the SAME Column expression as the batch op
(unix_micros div DAY_US), so the two cannot drift."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DAY_US = 86_400_000_000

ANOMALY_STREAM_SCHEMA = "day long, n_events long"
_STATE_SCHEMA = "c long"


def _update_day(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    c = state.get[0] if state.exists else 0
    for pdf in pdfs:
        c += len(pdf)
    state.update((c,))
    yield pd.DataFrame({"day": [key[0]], "n_events": [c]})


def anomaly_stream(events: DataFrame) -> DataFrame:
    """applyInPandasWithState over an event stream: the evolving per-day
    event census. Drained counts equal the batch daily census exactly
    under any arrival order (add-merge commutativity — pinned by test);
    feed the drained relation to the batch median/MAD fold for flags."""
    days = events.select(
        F.expr(f"unix_micros(cast(ts as timestamp)) div {DAY_US}").alias(
            "day"
        )
    )
    return days.groupBy("day").applyInPandasWithState(
        _update_day,
        outputStructType=ANOMALY_STREAM_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
