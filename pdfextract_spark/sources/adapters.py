"""Adapters that produce the canonical interleaved-document table.

The engine's input contract (BASELINE.json ``input_hint``) is
``(doc_id: string, spans: array<struct<kind,text,media_ref,offset:int>>)``.

``documents_to_interleaved`` converts a flat text-document table
(doc_id, text, ...) into that shape **with native Spark functions only**
(split → chunk → transform → struct): fully Catalyst-visible, no Python.
Every CHUNK_WORDS-word run of the text becomes one text span; documents whose
numeric doc_id % 4 == 0 get one trailing media span so media plumbing is
always exercised. Deterministic: same input row → same spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CHUNK_WORDS = 8


def documents_to_interleaved(documents: DataFrame) -> DataFrame:
    words = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(CHUNK_WORDS)).cast("int")

    text_spans = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.lit("text").alias("kind"),
            F.concat_ws(" ", F.slice(words, i * CHUNK_WORDS + 1, CHUNK_WORDS)).alias("text"),
            F.lit("").alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )

    doc_id_str = F.col("doc_id").cast("string")
    media_span = F.array(
        F.struct(
            F.lit("media").alias("kind"),
            F.lit("").alias("text"),
            F.concat(F.lit("img://"), doc_id_str, F.lit("/fig0")).alias("media_ref"),
            n_chunks.cast("int").alias("offset"),
        )
    )

    has_media = F.col("doc_id").cast("long") % 4 == 0
    spans = F.when(has_media, F.concat(text_spans, media_span)).otherwise(text_spans)

    return documents.select(doc_id_str.alias("doc_id"), spans.alias("spans"))


def documents_to_interleaved_rich(documents: DataFrame) -> DataFrame:
    """Richer deterministic interleave for multimodal-gate exercises: after
    chunk i, an md5 schedule inserts media spans — r = hex2(md5('mm|doc|i'))
    % 8; r==0 -> a run of THREE media spans (violates the consecutive-run
    gate), r in {1,2} -> one media span, else none. Offsets re-sequenced
    over the final array. Same schedule is mirrored in the DuckDB oracle
    (functions/multimodal.sql_interleave_stats)."""
    words = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(CHUNK_WORDS)).cast("int")
    doc_id_str = F.col("doc_id").cast("string")

    def media(i, j):
        return F.struct(
            F.lit("media").alias("kind"),
            F.lit("").alias("text"),
            F.concat(
                F.lit("img://"), doc_id_str, F.lit("/m"),
                i.cast("string"), F.lit("_"), F.lit(j).cast("string"),
            ).alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        )

    def per_chunk(i):
        text_span = F.struct(
            F.lit("text").alias("kind"),
            F.concat_ws(
                " ", F.slice(words, i * CHUNK_WORDS + 1, CHUNK_WORDS)
            ).alias("text"),
            F.lit("").alias("media_ref"),
            F.lit(0).cast("int").alias("offset"),
        )
        r = F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mm|"), doc_id_str, F.lit("|"), i.cast("string"))),
                1, 2,
            ),
            16, 10,
        ).cast("long") % 8
        med = (
            F.when(r == 0, F.array(media(i, 0), media(i, 1), media(i, 2)))
            .when(r <= 2, F.array(media(i, 0)))
            .otherwise(F.array().cast(
                "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
            ))
        )
        return F.concat(F.array(text_span), med)

    flat = F.flatten(F.transform(F.sequence(F.lit(0), n_chunks - 1), per_chunk))
    spans = F.transform(
        flat,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return documents.select(doc_id_str.alias("doc_id"), spans.alias("spans"))
