"""Streaming perceptual hashing of arriving media payloads.

functions/multimodal.media_payload_phash is a stateless Arrow mapInPandas
over the (doc_id, media_ref, payload) row — no corpus aggregate anywhere —
so the streaming plan IS the batch plan under a micro-batch harness:
file-source readStream -> one MapInPandas -> checkpointed parquet sink.
Exactly-once from source offsets + sink checkpoint; AvailableNow drains a
backlog with the same code that tails a live feed. Same surface pattern as
interleave_stream (per-item stages stream; the banded near-dup JOIN stage —
a corpus census — stays batch, exactly like hygiene_stream's split).

100 TB shape: hashing is the classic no-shuffle CPU map stage (linear in
executors); the downstream pHash near-dup census consumes the SINK table
in batch, so a crawl can hash continuously and dedup on a schedule.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from ..functions.multimodal import media_payload_phash

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def phash_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    reader = spark.readStream.format("parquet").schema(MEDIA_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return media_payload_phash(reader.load(input_dir))


def start_phash_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (or drain, with available_now) the pHash stream into a
    parquet sink."""
    writer = (
        phash_stream(spark, input_dir)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
