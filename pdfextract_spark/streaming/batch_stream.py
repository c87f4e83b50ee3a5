"""Streaming length-bucketed batch assignment: the readStream face of
packing.length_bucket_batches (the padding-efficient layout for non-packed
batching — SFT, eval, embedding inference) over an unbounded document
stream.

Semantics are deliberately WEAKER than the batch op and stated as such
(the quota/neardup honesty rule): batch length_bucket_batches fills each
(bucket, stream) in md5 order over the whole corpus — reorderable, a later
doc can land in an earlier batch; a stream cannot reorder the past, so
assignment here is ARRIVAL-ORDER (within a micro-batch, numeric-doc_id
ascending makes "arrival" deterministic — the url_stream lesson: numeric,
never lexicographic). The property that MATTERS is order-free and
therefore survives verbatim: bucket = floor(log2(n_tokens)) means every
batch's length spread is < 2x regardless of fill order, so the per-doc
padding bound (pad < n_tokens of the doc itself) holds exactly as in the
batch layout. Batch ids continue across micro-batches (state carries the
next slot), so a restart never restarts numbering.

State: ONE long per (bucket, stream) — the key space is bounded by
log2(max_doc_len) x n_streams (~200 keys at production dials), independent
of stream volume; no TTL needed. Output: (doc_id, n_tokens, bucket,
stream, batch_id, slot) for EVERY arriving doc — nothing is dropped, and a
closed batch's width/padding is a trivial batch-side groupBy over the sink
(batch_max cannot be known before its batch closes on an unbounded
stream)."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType

from ..functions.packing import BATCH_SIZE, N_STREAMS

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
    ]
)
OUT_SCHEMA = (
    "doc_id string, n_tokens int, bucket int, stream int, "
    "batch_id int, slot int"
)
_STATE_SCHEMA = "pos long"


def _make_assign(batch_size: int):
    def _assign(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        pos = state.get[0] if state.exists else 0
        rows = [pdf for pdf in pdfs if len(pdf)]
        if not rows:
            return
        batch = pd.concat(rows)
        batch = (
            batch.assign(_num=batch["doc_id"].astype("int64"))
            .sort_values("_num")
            .reset_index(drop=True)
        )
        p = pos + batch.index
        state.update((int(pos + len(batch)),))
        yield pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype(str),
                "n_tokens": batch["n_tokens"].astype("int32"),
                "bucket": key[0],
                "stream": key[1],
                "batch_id": (p // batch_size).astype("int32"),
                "slot": (p % batch_size).astype("int32"),
            }
        )

    return _assign


def streaming_length_buckets(
    documents: DataFrame,
    batch_size: int = BATCH_SIZE,
    n_streams: int = N_STREAMS,
) -> DataFrame:
    """documents stream (doc_id, text) -> (doc_id, n_tokens, bucket,
    stream, batch_id, slot): arrival-order batch fill inside the SAME
    (bucket, stream) geometry as packing.length_bucket_batches (identical
    n_tokens/bucket/stream per doc; only the fill order differs, which the
    <2x in-batch spread bound does not depend on)."""
    doc_id = F.col("doc_id").cast("string")
    keyed = documents.select(
        doc_id.alias("doc_id"),
        F.size(F.split("text", " ")).cast("int").alias("n_tokens"),
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("lb|"), doc_id)), 1, 4),
                16,
                10,
            ).cast("long")
            % n_streams
        )
        .cast("int")
        .alias("stream"),
    ).withColumn("bucket", (F.length(F.bin("n_tokens")) - 1).cast("int"))
    return keyed.groupBy("bucket", "stream").applyInPandasWithState(
        _make_assign(batch_size),
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_length_bucket_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    batch_size: int = BATCH_SIZE,
    n_streams: int = N_STREAMS,
    max_files_per_trigger: Optional[int] = None,
    available_now: bool = True,
):
    reader = spark.readStream.format("parquet").schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    writer = (
        streaming_length_buckets(reader.load(input_dir), batch_size, n_streams)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
