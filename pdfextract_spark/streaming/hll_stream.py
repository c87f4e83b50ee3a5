"""Streaming HyperLogLog: the readStream face of sketches.hll_host_distinct.

This is the operator the sketch was built for: max-per-register state
merges associatively AND commutatively, so the streaming twin is exact —
not weaker than batch (unlike the arrival-order packing/dedup streams):
any micro-batch partition of the corpus, in ANY order, yields the
bit-identical register state and estimate. State = one 64-slot register
array per host (HLL_M bytes-scale, volume-independent).

The per-batch update is numpy-vectorized (np.maximum.at over register
indices); the hash split (reg, rho) is computed JVM-side in the stream
projection with the SAME Column expressions as the batch op, so the two
cannot drift. The estimator (alpha_64, linear-counting table) is the
batch module's own constants replayed in int64 numpy."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.graphops import _host_of
from ..functions.sketches import (
    HLL_ALPHA_DEN,
    HLL_ALPHA_NUM,
    HLL_LC_BOUND,
    HLL_LC_TABLE,
    HLL_M,
    HLL_TERM,
    HLL_W_BITS,
)

HLL_STREAM_SCHEMA = (
    "host string, n_regs long, zeros long, hll_raw long, hll_est long"
)
_STATE_SCHEMA = "regs array<int>"


def _estimate(regs: np.ndarray) -> tuple[int, int, int, int]:
    """Replay the batch estimator in int64 numpy (identical constants)."""
    seen = regs > 0
    n_regs = int(seen.sum())
    zeros = HLL_M - n_regs
    s = int((HLL_TERM >> regs[seen]).sum()) + zeros * HLL_TERM
    raw = (HLL_ALPHA_NUM * HLL_M * HLL_M * HLL_TERM) // (HLL_ALPHA_DEN * s)
    est = HLL_LC_TABLE[zeros - 1] if (zeros > 0 and raw <= HLL_LC_BOUND) else raw
    return n_regs, zeros, raw, est


def _update_hll(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    regs = (
        np.array(state.get[0], dtype=np.int64)
        if state.exists
        else np.zeros(HLL_M, dtype=np.int64)
    )
    for pdf in pdfs:
        if not len(pdf):
            continue
        np.maximum.at(
            regs,
            pdf["reg"].to_numpy(dtype="int64"),
            pdf["rho"].to_numpy(dtype="int64"),
        )
    state.update((regs.astype("int32").tolist(),))
    n_regs, zeros, raw, est = _estimate(regs)
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "n_regs": [n_regs],
            "zeros": [zeros],
            "hll_raw": [raw],
            "hll_est": [est],
        }
    )


def hll_stream(documents: DataFrame) -> DataFrame:
    """applyInPandasWithState over a document stream: one evolving
    HyperLogLog distinct-doc estimate per host. Exactly equals the batch
    sketch on any drained backlog regardless of micro-batch boundaries or
    arrival order (max-merge commutativity — pinned by test)."""
    doc = F.col("doc_id").cast("string")
    hx = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll|"), doc)), 1, 15), 16, 10
    ).cast("long")
    keyed = documents.select(
        _host_of(doc).alias("host"), hx.alias("_hx")
    ).select(
        "host",
        (F.col("_hx") % HLL_M).cast("int").alias("reg"),
        F.when(F.expr(f"_hx div {HLL_M}") == 0, F.lit(HLL_W_BITS + 1))
        .otherwise(
            F.lit(HLL_W_BITS + 1)
            - F.length(F.conv(F.expr(f"cast(_hx div {HLL_M} as string)"), 10, 2))
        )
        .cast("int")
        .alias("rho"),
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _update_hll,
        outputStructType=HLL_STREAM_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
