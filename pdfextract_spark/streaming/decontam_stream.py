"""Streaming benchmark decontamination: flag arriving training documents
whose word n-grams overlap a FIXED benchmark gram set.

Production shape: the benchmark/eval suite is a static reference (built
once, batch-side, bounded by the benchmark's nature — functions/decontam's
broadcast argument), while training documents arrive as a stream. Each
arriving doc's hit count is |its distinct n-grams ∩ the benchmark set| —
a pure per-row expression once the set is fixed, so the stream stays
STATELESS append-mode (no streaming aggregation, no watermark): file-source
readStream -> one Project -> checkpointed sink, exactly-once from source
offsets + sink checkpoint, same as hygiene_stream.

The gram set rides the plan as one array literal (array_intersect against
it), capped by BENCH_GRAMS_CAP with a loud error — a benchmark set past the
cap should move to a stream-static broadcast join + per-doc streaming
aggregation instead (the documented dial); the cap makes the choice
explicit rather than letting a plan-embedded literal grow unbounded.

Semantics match functions/decontam.contamination_report exactly: n_hits
counts DISTINCT matching grams per doc (the batch join explodes
array_distinct grams), pinned by the batch-equality test.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..functions.decontam import NGRAM, _grams

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
    ]
)

BENCH_GRAMS_CAP = 200_000  # plan-literal bound; past it use the join dial


def bench_gram_set(bench_docs: DataFrame, n: int = NGRAM) -> List[str]:
    """Sorted distinct n-gram list of the benchmark documents (expects a
    `text` column) — built ONCE, batch-side; the stream's fixed reference.
    Bounded driver traffic by the benchmark's nature (eval suites are
    thousands of docs, not the corpus)."""
    rows = (
        bench_docs.select(F.explode(_grams(F.col("text"), n)).alias("gram"))
        .distinct()
        .collect()
    )
    grams = sorted(r["gram"] for r in rows)
    if len(grams) > BENCH_GRAMS_CAP:
        raise ValueError(
            f"benchmark gram set ({len(grams)}) exceeds BENCH_GRAMS_CAP "
            f"({BENCH_GRAMS_CAP}); switch to the stream-static join dial"
        )
    return grams


def decontam_columns(
    docs: DataFrame, bench_grams: Sequence[str], n: int = NGRAM
) -> DataFrame:
    """(doc_id, n_hits, contaminated) — per-row distinct-gram overlap with
    the fixed benchmark set; shared verbatim by the stream and its
    batch-equality oracle."""
    hits = F.size(
        F.array_intersect(
            _grams(F.col("text"), n),
            F.lit(list(bench_grams)).cast("array<string>"),
        )
    )
    return docs.select(
        "doc_id",
        hits.cast("long").alias("n_hits"),
        (hits > 0).alias("contaminated"),
    )


def decontam_stream(
    spark: SparkSession,
    input_dir: str,
    bench_grams: Sequence[str],
    n: int = NGRAM,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    reader = spark.readStream.format("parquet").schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return decontam_columns(reader.load(input_dir), bench_grams, n)


def start_decontam_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    bench_grams: Sequence[str],
    available_now: bool = True,
):
    """Start (or drain, with available_now) the decontamination stream
    into a parquet sink."""
    writer = (
        decontam_stream(spark, input_dir, bench_grams)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
