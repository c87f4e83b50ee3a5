"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with typed metadata. The decode /
feature-extract step runs as a vectorized mapInPandas over Arrow batches —
the real Spark-side machinery (schema, batching, binary transport) — while
the codec itself is STUBBED: the container has no image/audio libraries, so
`decode_image_meta` is a clearly-marked deterministic fake that parses the
first bytes; `decode_image_real` raises NotImplementedError until PIL/ffmpeg
are available (import-gated).

Scale notes: decode is the classic CPU-heavy map stage — no shuffle, scales
linearly with executors; `arrow.maxRecordsPerBatch` bounds per-batch memory
for large payloads; oversized payloads would be size-banded exactly like
oversized documents in the extraction path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

META_SCHEMA = "doc_id string, media_ref string, width int, height int, fmt string"


def media_table(documents: DataFrame) -> DataFrame:
    """Synthesize the media table for docs carrying media (doc_id % 4 == 0,
    matching sources.adapters): (doc_id, media_ref, payload:binary).
    The payload is deterministic opaque bytes (md5 of the ref)."""
    doc_id = F.col("doc_id").cast("string")
    ref = F.concat(F.lit("img://"), doc_id, F.lit("/fig0"))
    return (
        documents.filter(F.col("doc_id").cast("long") % 4 == 0)
        .select(
            doc_id.alias("doc_id"),
            ref.alias("media_ref"),
            F.unhex(F.md5(ref)).alias("payload"),
        )
    )


def _fake_decode(payload: bytes) -> tuple:
    """STUB CODEC (deterministic fake): 'width'/'height' from the first four
    big-endian bytes, format from byte 0 parity. Replaces a real image
    decoder; the surrounding Arrow/batch plumbing is production-shaped."""
    width = 64 + int.from_bytes(payload[0:2], "big") % 512
    height = 64 + int.from_bytes(payload[2:4], "big") % 512
    fmt = "png" if payload[0] % 2 == 0 else "jpg"
    return width, height, fmt


def decode_image_real(payload: bytes):
    """Real decode path — unavailable in this container (no PIL/opencv)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image codecs not installed in this environment; "
            "decode uses the deterministic stub (_fake_decode)"
        ) from exc
    raise NotImplementedError("real decode wiring lands with the codec dependency")


def decode_media_meta(media: DataFrame) -> DataFrame:
    """(doc_id, media_ref, width, height, fmt) via vectorized mapInPandas
    over the binary payload column."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            meta = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype(object),
                    "media_ref": pdf["media_ref"].astype(object),
                    "width": pd.Series([m[0] for m in meta], dtype="int32"),
                    "height": pd.Series([m[1] for m in meta], dtype="int32"),
                    "fmt": pd.Series([m[2] for m in meta], dtype=object),
                }
            )

    return media.mapInPandas(decode, schema=META_SCHEMA)


def media_meta_query(documents: DataFrame) -> DataFrame:
    return decode_media_meta(media_table(documents))


def sql_media_meta(table: str = "documents") -> str:
    """DuckDB oracle: the stub parses md5(ref) bytes; big-endian first two
    byte pairs == first four hex digits."""
    ref = "('img://' || CAST(doc_id AS VARCHAR) || '/fig0')"
    return f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       {ref} AS media_ref,
       CAST(64 + ('0x' || substr(md5({ref}), 1, 4))::BIGINT % 512 AS INT) AS width,
       CAST(64 + ('0x' || substr(md5({ref}), 5, 4))::BIGINT % 512 AS INT) AS height,
       CASE WHEN ('0x' || substr(md5({ref}), 1, 2))::BIGINT % 2 = 0
            THEN 'png' ELSE 'jpg' END AS fmt
FROM {table}
WHERE doc_id % 4 = 0
"""
