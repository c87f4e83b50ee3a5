"""Streaming count-min sketch: the readStream face of
sketches.heavy_hitters' candidate census.

Like the HLL twin (hll_stream.py), this stream is EXACT, not weaker than
batch: count-per-cell state merges by addition, which is associative AND
commutative, so any micro-batch partition of the corpus in ANY arrival
order drains to the bit-identical 2048-cell census the batch operator
computes. State = one CMS_W-slot int64 array per hash row (CMS_D keys
total — volume-independent regardless of vocabulary or corpus size).

The token -> (r, b) cell hashing is computed JVM-side in the stream
projection with the SAME Column expressions as the batch op (the shared
_cms_bucket kernel), so the two cannot drift; the per-batch update is
numpy-vectorized (np.add.at). Each emission carries the evolving hot-cell
flag under the batch op's own threshold rule (c >= greatest(1,
HH_PERMILLE * total / 1000), where the row total IS the token total —
every token increments every row exactly once), so a monitoring consumer
sees candidate heavy cells live; the exact per-token verify pass stays a
batch job over the kept corpus, as in sketches.heavy_hitters."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.sketches import CMS_D, CMS_W, HH_PERMILLE, _cms_bucket

CMS_STREAM_SCHEMA = "r int, b int, c long, row_total long, hot boolean"
_STATE_SCHEMA = "cells array<long>"


def _update_cms(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    cells = (
        np.array(state.get[0], dtype=np.int64)
        if state.exists
        else np.zeros(CMS_W, dtype=np.int64)
    )
    for pdf in pdfs:
        if not len(pdf):
            continue
        np.add.at(cells, pdf["b"].to_numpy(dtype="int64"), 1)
    state.update((cells.tolist(),))
    total = int(cells.sum())
    thr = max(1, (HH_PERMILLE * total) // 1000)
    nz = np.flatnonzero(cells)
    yield pd.DataFrame(
        {
            "r": np.full(len(nz), key[0], dtype=np.int32),
            "b": nz.astype(np.int32),
            "c": cells[nz],
            "row_total": np.full(len(nz), total, dtype=np.int64),
            "hot": cells[nz] >= thr,
        }
    )


def cms_stream(documents: DataFrame) -> DataFrame:
    """applyInPandasWithState over a document stream: the evolving
    count-min cell census (r, b, c) plus the live hot-cell flag. Exactly
    equals the batch census on any drained backlog regardless of
    micro-batch boundaries or arrival order (add-merge commutativity —
    pinned by test)."""
    toks = documents.select(
        F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    cells = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        _cms_bucket(F.col("token"), i).cast("int").alias("b"),
                    )
                    for i in range(CMS_D)
                ]
            )
        ).alias("cell")
    ).select("cell.r", "cell.b")
    return cells.groupBy("r").applyInPandasWithState(
        _update_cms,
        outputStructType=CMS_STREAM_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
