"""Streaming front-end for the HTML boilerplate strip (functions/htmlops).

Like extraction, main-content stripping is stateless per document, so the
streaming plan is the batch plan under a micro-batch harness: file-source
readStream over a parquet directory of (doc_id, html) pages -> the SAME
Arrow-batched block classifier -> checkpointed parquet sink. Exactly-once
comes from file-source offsets + the sink checkpoint; AvailableNow drains a
backlog with the code that tails a live crawl feed."""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from ..functions.htmlops import extract_main_content

PAGE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("html", StringType()),
    ]
)


def html_strip_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Streaming DataFrame (doc_id, main_text) from a parquet directory of
    raw pages (doc_id kept as string: crawl ids are opaque)."""
    reader = spark.readStream.format("parquet").schema(PAGE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.load(input_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "main_text": [extract_main_content(h) for h in pdf["html"]],
                    }
                )

    return pages.mapInPandas(run, schema="doc_id string, main_text string")


def start_html_strip_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (or drain, with available_now) the strip stream into a parquet
    sink with exactly-once checkpointing. Returns the query."""
    out = html_strip_stream(spark, input_dir)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
