"""Streaming FUZZY benchmark decontamination: flag arriving training
documents whose short-shingle overlap with a fixed benchmark set clears a
floor — the perturbation-robust pass (functions/decontam.
fuzzy_contamination_report) over readStream.

Production shape mirrors decontam_stream exactly: the benchmark suite is a
static reference built ONCE batch-side (two fixed sets — the FUZZY_N-gram
shingles that survive token-swap evasion, and the exact NGRAM grams reported
alongside them), while training documents arrive as a stream. Both overlap
counts are pure per-row expressions against plan-embedded array literals
(array_intersect), so the stream stays STATELESS append-mode: file-source
readStream -> one Project -> checkpointed sink, exactly-once from source
offsets + sink checkpoint. No streaming aggregation, no watermark, no state
store — corpus volume never touches memory.

Both literals are bounded by BENCH_GRAMS_CAP with a loud error (shingle
sets are larger than 8-gram sets for the same suite — n=3 windows overlap
more — but still benchmark-sized, not corpus-sized); past the cap the
documented dial is the stream-static broadcast join.

Semantics match the batch report exactly: n_shared counts DISTINCT shared
shingles per doc (the batch side explodes array_distinct shingles and the
per-row array_intersect is distinct by construction), n_exact_hits the
DISTINCT exact grams, fuzzy_contaminated applies the same min_shared floor
— pinned by the batch-equality test against BOTH the column twin and the
join-based batch path."""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.decontam import FUZZY_MIN_SHARED, FUZZY_N, NGRAM, _grams
from .decontam_stream import DOC_SCHEMA


def fuzzy_bench_sets(
    bench_docs: DataFrame, n: int = FUZZY_N, n_exact: int = NGRAM
) -> tuple:
    """(shingles, exact_grams): sorted distinct FUZZY_N-gram shingle list
    and exact NGRAM-gram list of the benchmark documents (expects a `text`
    column) — built ONCE, batch-side; the stream's fixed reference. ONE
    driver collect over two exploded projections of benchmark-sized data."""
    rows = (
        bench_docs.select(
            F.explode(
                F.array_union(
                    F.transform(
                        _grams(F.col("text"), n), lambda g: F.concat(F.lit("s|"), g)
                    ),
                    F.transform(
                        _grams(F.col("text"), n_exact),
                        lambda g: F.concat(F.lit("e|"), g),
                    ),
                )
            ).alias("tagged")
        )
        .distinct()
        .collect()
    )
    # read the cap at call time so the shared dial (and its tests) see one
    # live value, not an import-time copy
    from .decontam_stream import BENCH_GRAMS_CAP

    shingles = sorted(r["tagged"][2:] for r in rows if r["tagged"].startswith("s|"))
    exact = sorted(r["tagged"][2:] for r in rows if r["tagged"].startswith("e|"))
    for name, grams in (("shingle", shingles), ("exact-gram", exact)):
        if len(grams) > BENCH_GRAMS_CAP:
            raise ValueError(
                f"benchmark {name} set ({len(grams)}) exceeds BENCH_GRAMS_CAP "
                f"({BENCH_GRAMS_CAP}); switch to the stream-static join dial"
            )
    return shingles, exact


def fuzzy_decontam_columns(
    docs: DataFrame,
    shingles: Sequence[str],
    exact_grams: Sequence[str],
    n: int = FUZZY_N,
    n_exact: int = NGRAM,
    min_shared: int = FUZZY_MIN_SHARED,
) -> DataFrame:
    """(doc_id, n_shared, n_exact_hits, fuzzy_contaminated) — per-row
    distinct-overlap counts against the fixed benchmark sets; shared
    verbatim by the stream and its batch-equality oracle."""
    shared = F.size(
        F.array_intersect(
            _grams(F.col("text"), n),
            F.lit(list(shingles)).cast("array<string>"),
        )
    )
    exact = F.size(
        F.array_intersect(
            _grams(F.col("text"), n_exact),
            F.lit(list(exact_grams)).cast("array<string>"),
        )
    )
    return docs.select(
        "doc_id",
        shared.cast("long").alias("n_shared"),
        exact.cast("long").alias("n_exact_hits"),
        (shared >= min_shared).alias("fuzzy_contaminated"),
    )


def fuzzy_decontam_stream(
    spark: SparkSession,
    input_dir: str,
    shingles: Sequence[str],
    exact_grams: Sequence[str],
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    reader = spark.readStream.format("parquet").schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return fuzzy_decontam_columns(reader.load(input_dir), shingles, exact_grams)


def start_fuzzy_decontam_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    shingles: Sequence[str],
    exact_grams: Sequence[str],
    available_now: bool = True,
):
    """Start (or drain, with available_now) the fuzzy decontamination
    stream into a parquet sink."""
    writer = (
        fuzzy_decontam_stream(spark, input_dir, shingles, exact_grams)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
