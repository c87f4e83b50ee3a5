"""Event-time streaming aggregation: watermark + tumbling windows, plus a
custom stateful operator via applyInPandasWithState.

The reference engine is batch-only (SURVEY.md §2.6); these are the
continuous-pipeline operators a production deployment runs over its event
stream (ingestion metrics, extraction telemetry): late data bounded by the
watermark, window state dropped once the watermark passes, exactly-once via
the sink checkpoint. The stateful operator keeps one running record per key
with an explicit timeout — the applyInPandasWithState surface the brief's
streaming bullet names."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

WINDOW = "10 minutes"
WATERMARK = "20 minutes"

WINDOWED_SCHEMA = (
    "window_start timestamp, window_end timestamp, event_type string, "
    "n long, total double"
)


def windowed_event_counts(events: DataFrame) -> DataFrame:
    """Tumbling-window counts/sums per event type with a late-data watermark.
    Works identically on a batch DataFrame (watermark is a no-op there) and a
    streaming one (state for windows older than the watermark is dropped) —
    the batch run doubles as the correctness oracle for the stream."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )


RUNNING_SCHEMA = "user_id long, n_events long, total double"
_STATE_SCHEMA = "n long, total_fp long"
_FP = 10_000  # fixed-point scale (matches similarity.py's quantization rule)


def _update_user_state(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: per-user running event count + value sum.
    State lives across micro-batches with GroupStateTimeout.NoTimeout (users
    never expire; switch to ProcessingTimeTimeout to drop idle keys).

    The running sum accumulates in FIXED-POINT integers: float addition is
    non-associative, so a float accumulator would make totals depend on
    row/micro-batch arrival order — integers keep the operator deterministic
    across replays and batch/stream runs (the cross-engine rule everywhere
    else in this codebase)."""
    import numpy as np

    n, total_fp = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total_fp += int(
            np.floor(pdf["value"].to_numpy(dtype="float64") * _FP + 0.5)
            .astype("int64")
            .sum()
        )
    state.update((n, total_fp))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total": [total_fp / _FP]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """applyInPandasWithState over the event stream: one evolving record per
    user_id, updated each micro-batch."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
