"""Streaming interleave-quality gates (MMC4/OBELICS rules) over arriving
interleaved documents.

functions/multimodal.interleave_stats is a stateless pure-Column Project
over the (doc_id, spans) row — no corpus aggregate anywhere in the rule
set — so the streaming plan IS the batch plan under a micro-batch harness:
file-source readStream -> one Project -> checkpointed parquet sink.
Exactly-once from source offsets + sink checkpoint; AvailableNow drains a
backlog with the same code that tails a live feed. Same surface pattern as
hygiene_stream (per-doc stages stream; corpus-census stages stay batch).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.multimodal import interleave_stats

SPAN_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType()),
                        StructField("text", StringType()),
                        StructField("media_ref", StringType()),
                        StructField("offset", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def interleave_gate_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    reader = spark.readStream.format("parquet").schema(SPAN_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return interleave_stats(reader.load(input_dir))


def start_interleave_gate_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (or drain, with available_now) the interleave-gate stream into
    a parquet sink."""
    writer = (
        interleave_gate_stream(spark, input_dir)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def chunk_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming context-boundary chunking of arriving interleaved docs.

    functions/packing.chunk_interleaved is per-document Column algebra
    (in-row prefix fold + narrow explode, no corpus aggregate), so the
    streaming plan IS the batch plan — same stateless pattern as the gate
    stream above. Chunk ids are per-document, so they are stable however
    the stream micro-batches the input."""
    from ..functions.packing import chunk_interleaved

    reader = spark.readStream.format("parquet").schema(SPAN_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return chunk_interleaved(reader.load(input_dir))


def start_chunk_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (or drain, with available_now) the chunking stream into a
    parquet sink."""
    writer = (
        chunk_stream(spark, input_dir)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def caption_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming caption-pair mining over arriving interleaved docs.

    functions/multimodal.caption_pairs is per-document Column algebra (the
    nearest-text lookup never leaves the row's spans array), so the
    streaming plan IS the batch plan minus the batch contract's ordering
    sort (unsupported in append streams; pair content is identical)."""
    from ..functions.multimodal import caption_pairs

    reader = spark.readStream.format("parquet").schema(SPAN_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return caption_pairs(reader.load(input_dir), ordered=False)


def start_caption_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (or drain, with available_now) the caption-pair stream into a
    parquet sink."""
    writer = (
        caption_stream(spark, input_dir)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
