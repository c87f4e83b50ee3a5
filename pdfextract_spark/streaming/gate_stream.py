"""Streaming gate-agreement census: the readStream face of
textops.gate_agreement.

EXACT twin #3 (after the HLL and CMS streams): the 2x2 confusion cells are
plain counts, and count state merges by addition — associative AND
commutative — so any micro-batch partition of the corpus in ANY arrival
order drains to the bit-identical confusion census the batch aggregate
computes. Both gate verdicts are evaluated JVM-side in the stream
projection by the SAME shared kernel the batch op uses
(textops.gate_flags), so the two cannot drift.

State layout: 4 longs per hash bucket (GATE_BUCKETS = 64 buckets keyed on
crc32(doc_id) — volume-independent, and the bucket key keeps the stateful
stage parallel instead of funneling the corpus through one task). Each
emission carries the bucket's cumulative cells; kappa over the drained
backlog is computed from the SUM of bucket cells (addition again), tested
equal to the batch kappa_milli bit-exactly.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.textops import gate_flags

GATE_BUCKETS = 64

GATE_STREAM_SCHEMA = (
    "bucket int, both_keep long, rule_only long, clf_only long, both_drop long"
)
_STATE_SCHEMA = "bk long, ro long, co long, bd long"


def _update_gate(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    bk, ro, co, bd = state.get if state.exists else (0, 0, 0, 0)
    for pdf in pdfs:
        if not len(pdf):
            continue
        rk = pdf["rk"].to_numpy(dtype=bool)
        ck = pdf["ck"].to_numpy(dtype=bool)
        bk += int((rk & ck).sum())
        ro += int((rk & ~ck).sum())
        co += int((~rk & ck).sum())
        bd += int((~rk & ~ck).sum())
    state.update((bk, ro, co, bd))
    yield pd.DataFrame(
        {
            "bucket": [key[0]],
            "both_keep": [bk],
            "rule_only": [ro],
            "clf_only": [co],
            "both_drop": [bd],
        }
    )


def gate_stream(documents: DataFrame) -> DataFrame:
    """applyInPandasWithState over a document stream: per hash bucket the
    cumulative 2x2 gate-confusion cells. Drained bucket sums equal the
    batch gate_agreement census exactly under any arrival order (add-merge
    commutativity — pinned by test)."""
    flags = gate_flags(documents).select(
        F.pmod(F.crc32(F.col("doc_id")), F.lit(GATE_BUCKETS))
        .cast("int")
        .alias("bucket"),
        "rk",
        "ck",
    )
    return flags.groupBy("bucket").applyInPandasWithState(
        _update_gate,
        outputStructType=GATE_STREAM_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
