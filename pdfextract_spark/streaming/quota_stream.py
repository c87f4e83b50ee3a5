"""Streaming per-domain quota: admit at most `cap` documents per URL host
over an unbounded stream (the streaming face of webclean.domain_cap's
anti-domination rule — a per-key rate cap, the shape a live crawl ingester
actually needs).

Semantics are deliberately WEAKER than the batch op and stated as such:
batch domain_cap ranks by md5 priority over the whole corpus (reorderable —
a later doc can outrank an earlier one); a stream cannot reorder the past,
so the streaming quota is ARRIVAL-ORDER — the first `cap` docs of a domain
pass (within a micro-batch, doc_id ascending makes "first" deterministic),
everything after is dropped and COUNTED. Same honesty rule as
neardup_stream's state-cap note: the weaker guarantee is documented, not
papered over.

State: ONE int per domain seen (admitted count, saturating at cap),
hash-partitioned by the groupBy key — state scales with distinct domains,
not stream volume. An optional TTL expires idle domains (the state-bound /
exactness dial, identical to streaming_dedup's).

Output: (doc_id, domain, admitted) for EVERY arriving doc — rejects are
flagged rows, not silence, so a downstream metrics sink can count drops
per domain (the no-silent-caps rule).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType

from ..functions.webclean import RE_HOST

QUOTA_CAP = 4  # sandbox dial, same as webclean.DOMAIN_CAP

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
    ]
)
OUT_SCHEMA = "doc_id string, domain string, admitted boolean"
_STATE_SCHEMA = "n int"


def _make_quota(cap: int, ttl_ms: int):
    def _quota(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n = state.get[0] if state.exists else 0
        rows = []
        for pdf in pdfs:
            if len(pdf):
                rows.append(pdf[["doc_id"]])
        if not rows:
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            return
        batch = pd.concat(rows).sort_values("doc_id").reset_index(drop=True)
        admitted = (n + batch.index) < cap
        n = min(cap, n + int(admitted.sum()))
        state.update((n,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(str),
                "domain": key[0],
                "admitted": admitted,
            }
        )

    return _quota


def streaming_domain_quota(
    documents: DataFrame, cap: int = QUOTA_CAP, ttl_minutes: int = 0
) -> DataFrame:
    """documents stream (doc_id, text) -> (doc_id, domain, admitted):
    arrival-order per-domain admission under the cap; every doc gets an
    output row (rejects flagged, never silent)."""
    host = F.regexp_extract("text", RE_HOST, 1)
    keyed = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.when(host == "", F.lit("(none)")).otherwise(host).alias("domain"),
    )
    ttl_ms = int(ttl_minutes * 60_000)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("domain").applyInPandasWithState(
        _make_quota(QUOTA_CAP if cap is None else cap, ttl_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def start_quota_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cap: int = QUOTA_CAP,
    max_files_per_trigger: Optional[int] = None,
    available_now: bool = True,
):
    reader = spark.readStream.format("parquet").schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    writer = (
        streaming_domain_quota(reader.load(input_dir), cap)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
