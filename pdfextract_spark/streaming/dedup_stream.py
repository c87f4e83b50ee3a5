"""Streaming exact deduplication: first-seen-wins over an unbounded stream.

A production ingestion pipeline dedups continuously — the batch md5-groupBy
(queries.q_dedup_exact) cannot see across micro-batches, so the streaming
form keeps one state record per content fingerprint (applyInPandasWithState)
and emits only the FIRST document that carried it; later arrivals (same batch
or any later batch) are dropped. State is one tiny record per distinct
fingerprint, partitioned by the groupBy key — the same hash-partitioned
layout the batch dedup shuffles on, so the operator scales with distinct
content volume, not stream volume.

First-seen-wins inside a micro-batch is made deterministic by ordering the
batch's rows by doc_id (arrival order within a micro-batch is not a stable
notion; the reference rule "keep the smallest doc_id of the batch, then
stream order across batches" is reproducible for tests)."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_SCHEMA = "fingerprint string, keeper_doc_id string"
_SEEN_SCHEMA = "seen boolean"


def _make_first_seen(ttl_ms: int, key_col: str = "fingerprint"):
    def _first_seen(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL expiry tick: forget the fingerprint (bounded state — a
            # repeat arriving later than the TTL re-emits, the documented
            # at-least-once window of TTL'd streaming dedup)
            state.remove()
            return
        if state.exists:
            # fingerprint already emitted in an earlier micro-batch: drop all
            for _ in pdfs:
                pass
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            return
        # Keeper within the first micro-batch matches the batch keeper rule
        # (min(cast(doc_id as long)), e.g. webclean.url_dedup_params): compare
        # numerically when every id parses as an integer, else fall back to
        # lexicographic string order. '2' vs '10' therefore keeps '2', same
        # as the batch window-min, not the string-min '10'.
        best = None  # (numeric_or_none, string) comparison key
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ids = pdf["doc_id"].astype(str)
            nums = pd.to_numeric(ids, errors="coerce")
            if nums.notna().all():
                i = int(nums.idxmin())
                cand = (int(nums.loc[i]), ids.loc[i])
            else:
                cand = (None, ids.min())
            if best is None:
                best = cand
            elif cand[0] is not None and best[0] is not None:
                best = min(best, cand)
            else:
                best = min(best, cand, key=lambda c: c[1])
        if best is None:
            return
        state.update((True,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({key_col: [key[0]], "keeper_doc_id": [best[1]]})

    return _first_seen


def streaming_dedup(documents: DataFrame, ttl_minutes: int = 0) -> DataFrame:
    """documents stream (doc_id, text) -> (fingerprint, keeper_doc_id):
    one output row per NEW distinct fingerprint, none for repeats.

    ttl_minutes=0 keeps state forever (exact dedup; state = one record per
    distinct fingerprint). A positive TTL switches to ProcessingTimeTimeout
    and expires fingerprints idle longer than the TTL — bounding state to the
    churn window at the cost of re-admitting repeats that arrive after it
    (the standard state/exactness dial for unbounded streams)."""
    fp = documents.select(
        F.md5(F.lower(F.trim(F.col("text")))).alias("fingerprint"),
        F.col("doc_id").cast("string").alias("doc_id"),
    )
    ttl_ms = int(ttl_minutes * 60_000)
    return fp.groupBy("fingerprint").applyInPandasWithState(
        _make_first_seen(ttl_ms),
        outputStructType=DEDUP_SCHEMA,
        stateStructType=_SEEN_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms
            else GroupStateTimeout.NoTimeout
        ),
    )
