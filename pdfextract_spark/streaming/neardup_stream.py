"""Streaming near-duplicate detection: banded simhash over an unbounded
stream (VERDICT r2 task #6 — the streaming surface had exact dedup only).

Same signature, banding, cap, and reporting machinery as the batch operator
(functions/dedup.py: simhash_neardups): each document's 60-bit token simhash
is split into SIMHASH_BANDS band keys; state lives per (band_id, band_val)
bucket and holds the (doc_id, simhash) members seen so far, capped at
max_bucket. The cap's GUARANTEE IS WEAKER than the batch hot-bucket trim:
batch anti-joins the ENTIRE over-cap bucket (no pairs at all are emitted
from it), while the stream keeps the first max_bucket members — those still
pair among themselves — and only trims/reports arrivals AFTER the cap
(a stream cannot retroactively unemit pairs it produced before the bucket
went hot). Like batch, the trim is REPORTED (kind='trimmed' rows carry the
per-batch trimmed count), never silent. A new document is hamming-verified (<= ham_max, on the fingerprint
word — the batch contract) against the bucket's members and every verified
pair is emitted as kind='pair' (doc_a < doc_b, like batch pairs). Documents
are inserted into the bucket whether or not they matched, so chains of
near-dups stay connected across time the same way batch components connect
transitive pairs.

The same pair can surface from more than one band (batch runs
dropDuplicates; a streaming distinct would be a second stateful operator) —
rows carry band_id and consumers distinct on (doc_a, doc_b).

Scale shape: state is bounded by max_bucket members per occupied bucket;
the band key space is the dial exactly as in batch — but a stream cannot be
count()'d for auto-sizing, so band_bits is explicit config here (size it
with functions.dedup.simhash_band_bits(expected_corpus_size)). A positive
TTL expires idle buckets (ProcessingTimeTimeout), bounding state to the
churn window at the cost of re-admitting near-dups that arrive after it —
the same dial streaming_dedup exposes.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.dedup import (
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SIMHASH_HAM_MAX,
    SIMHASH_MAX_BUCKET,
    SIMHASH_MIN_BAND_BITS,
    _simhash_bands,
    _simhash_word,
    _words,
)

NEARDUP_SCHEMA = "kind string, band_id int, doc_a string, doc_b string, hamming int"
_BUCKET_STATE = "doc_ids array<string>, sigs array<long>"


def _make_bucket_fn(ham_max: int, max_bucket: int, ttl_ms: int):
    def _bucket(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        band_id = int(key[0])
        if state.exists:
            stored_ids, stored_sigs = state.get
            doc_ids, sigs = list(stored_ids), [int(s) for s in stored_sigs]
        else:
            doc_ids, sigs = [], []
        incoming = []
        for pdf in pdfs:
            for d, s in zip(pdf["doc_id"], pdf["simhash"]):
                incoming.append((str(d), int(s)))
        # doc_id order makes within-batch pairing deterministic (arrival
        # order inside a micro-batch is not a stable notion)
        incoming.sort()
        rows = []
        n_trimmed = 0
        for d, s in incoming:
            if len(doc_ids) >= max_bucket:
                n_trimmed += 1
                continue
            for kd, ks in zip(doc_ids, sigs):
                h = bin(ks ^ s).count("1")
                if h <= ham_max:
                    a, b = (kd, d) if kd < d else (d, kd)
                    rows.append(("pair", band_id, a, b, h))
            doc_ids.append(d)
            sigs.append(s)
        if n_trimmed:
            rows.append(("trimmed", band_id, "", "", n_trimmed))
        state.update((doc_ids, sigs))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        if rows:
            yield pd.DataFrame(
                rows, columns=["kind", "band_id", "doc_a", "doc_b", "hamming"]
            )

    return _bucket


def streaming_neardup(
    documents: DataFrame,
    band_bits: int = SIMHASH_MIN_BAND_BITS,
    ham_max: int = SIMHASH_HAM_MAX,
    max_bucket: int = SIMHASH_MAX_BUCKET,
    ttl_minutes: int = 0,
) -> DataFrame:
    """documents stream (doc_id, text) -> kind='pair' rows (doc_a, doc_b,
    band_id, hamming) for every hamming-verified near-dup, plus kind='trimmed'
    rows reporting docs skipped in saturated buckets. The signature fold is
    Column-native (JVM-side, identical to batch simhash); only the bucket
    membership step is stateful Python."""
    words = _words(F.col("text"))
    bands_per_word = SIMHASH_BITS // band_bits
    sig_cols = [
        F.col("doc_id").cast("string").alias("doc_id"),
        _simhash_word(words, 1).alias("simhash"),
        (
            _simhash_word(words, 17)
            if SIMHASH_BANDS > bands_per_word
            else F.lit(0).cast("long")
        ).alias("simhash2"),
    ]
    bands = _simhash_bands(documents.select(*sig_cols), band_bits)
    ttl_ms = int(ttl_minutes * 60_000)
    return bands.groupBy("band_id", "band_val").applyInPandasWithState(
        _make_bucket_fn(ham_max, max_bucket, ttl_ms),
        outputStructType=NEARDUP_SCHEMA,
        stateStructType=_BUCKET_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms
            else GroupStateTimeout.NoTimeout
        ),
    )
