"""Streaming front-end for the per-document hygiene stages (PII redaction
+ quality gates, functions/webclean + the Gopher rules).

Both stages are stateless pure-Column expressions, so the streaming plan
IS the batch plan under a micro-batch harness — not even an Arrow boundary
(contrast html_stream's mapInPandas): file-source readStream -> one
Project -> checkpointed parquet sink. Exactly-once from file-source
offsets + sink checkpoint; AvailableNow drains a backlog with the same
code that tails a live feed.

Corpus-level stages (boilerplate census, dedup keeper, packing) stay
batch: they need a full-corpus aggregate, which is the bucket pipeline's
job (jobs/hygiene_job.py) — the streaming surface covers the per-document
stages the way streaming exact-dedup covers the stateful one.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..functions.webclean import RE_EMAIL, RE_IPV4, RE_PHONE, RE_URL

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
    ]
)

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def hygiene_columns(docs: DataFrame) -> DataFrame:
    """(doc_id, text, pii_found, ok_quality, enc_bad, has_badword) — the
    stateless hygiene stages as one Project (stage order mirrors
    jobs/hygiene_job.py: encoding fix FIRST, then PII redaction, then the
    quality rules over the repaired+redacted text); shared verbatim by the
    stream and its batch-equality oracle."""
    from ..functions.webclean import (
        BADWORDS,
        CTRL_BELL,
        ENC_MAX_REPL_PERMILLE,
        MOJI_APOS,
        MOJI_EACUTE,
        REPL_CHAR,
    )

    t0 = F.col("text")
    n_repl = F.length(t0) - F.length(F.replace(t0, F.lit(REPL_CHAR), F.lit("")))
    enc_bad = (n_repl * 1000) > (F.length(t0) * ENC_MAX_REPL_PERMILLE)
    t = F.replace(
        F.replace(t0, F.lit(MOJI_APOS), F.lit("’")),
        F.lit(MOJI_EACUTE), F.lit("é"),
    )
    t = F.replace(
        F.replace(t, F.lit(REPL_CHAR), F.lit("")), F.lit(CTRL_BELL), F.lit("")
    )
    toks0 = F.filter(F.split(F.lower(t), " "), lambda w: w != "")
    has_badword = F.size(F.filter(toks0, lambda w: w.isin(*BADWORDS))) > 0
    n_pii = (
        F.regexp_count(t, F.lit(RE_EMAIL))
        + F.regexp_count(t, F.lit(RE_URL))
        + F.regexp_count(t, F.lit(RE_IPV4))
        + F.regexp_count(t, F.lit(RE_PHONE))
    )
    red = F.regexp_replace(t, RE_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, RE_URL, "<URL>")
    red = F.regexp_replace(red, RE_IPV4, "<IP>")
    red = F.regexp_replace(red, RE_PHONE, "<PHONE>")
    words = F.split(red, " ")
    n_words = F.size(words)
    mean_wlen = F.length(F.regexp_replace(red, " ", "")) / n_words
    digit_words = F.size(F.filter(words, lambda w: w.rlike("^[0-9]+$")))
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    ok = (
        (n_words >= 5)
        & (n_words <= 100000)
        & (mean_wlen >= 2.0)
        & (mean_wlen <= 12.0)
        & ((digit_words / n_words) <= 0.3)
        & (stop_hits >= 1)
    )
    return docs.select(
        "doc_id",
        red.alias("text"),
        n_pii.cast("int").alias("pii_found"),
        ok.alias("ok_quality"),
        enc_bad.alias("enc_bad"),
        has_badword.alias("has_badword"),
    )


def hygiene_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    reader = spark.readStream.format("parquet").schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return hygiene_columns(reader.load(input_dir))


def start_hygiene_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (or drain, with available_now) the hygiene stream into a
    parquet sink."""
    writer = (
        hygiene_stream(spark, input_dir)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
