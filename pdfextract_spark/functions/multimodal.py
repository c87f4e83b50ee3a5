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


RESIZE_MAX_DIM = 256
RESIZE_SCHEMA = (
    "doc_id string, media_ref string, width int, height int, payload_sha string"
)


def resize_media(media: DataFrame, max_dim: int = RESIZE_MAX_DIM) -> DataFrame:
    """Resize stage: vectorized mapInPandas over binary payloads. The
    geometry math is real (integer floor scaling to fit max_dim, no-op when
    already small enough); the pixel resample is STUBBED — the output
    payload is a deterministic digest of (ref, new dims) standing in for
    re-encoded bytes."""
    import hashlib

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                w, h, _fmt = _fake_decode(payload)
                m = max(w, h)
                if m > max_dim:
                    nw = w * max_dim // m
                    nh = h * max_dim // m
                else:
                    nw, nh = w, h
                digest = hashlib.md5(f"{ref}|{nw}x{nh}".encode()).hexdigest()
                rows.append((nw, nh, digest))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype(object),
                    "media_ref": pdf["media_ref"].astype(object),
                    "width": pd.Series([r[0] for r in rows], dtype="int32"),
                    "height": pd.Series([r[1] for r in rows], dtype="int32"),
                    "payload_sha": pd.Series([r[2] for r in rows], dtype=object),
                }
            )

    return media.mapInPandas(resize, schema=RESIZE_SCHEMA)


def sql_resize_media(table: str = "documents", max_dim: int = RESIZE_MAX_DIM) -> str:
    ref = "('img://' || CAST(doc_id AS VARCHAR) || '/fig0')"
    w = f"(64 + ('0x' || substr(md5({ref}), 1, 4))::BIGINT % 512)"
    h = f"(64 + ('0x' || substr(md5({ref}), 5, 4))::BIGINT % 512)"
    m = f"greatest({w}, {h})"
    nw = f"CASE WHEN {m} > {max_dim} THEN {w} * {max_dim} // {m} ELSE {w} END"
    nh = f"CASE WHEN {m} > {max_dim} THEN {h} * {max_dim} // {m} ELSE {h} END"
    return f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id, {ref} AS media_ref,
       CAST({nw} AS INT) AS width, CAST({nh} AS INT) AS height,
       md5({ref} || '|' || CAST({nw} AS VARCHAR) || 'x' || CAST({nh} AS VARCHAR))
         AS payload_sha
FROM {table} WHERE doc_id % 4 = 0
"""


N_FRAMES = 4
FRAME_SCHEMA = (
    "doc_id string, media_ref string, frame_idx int, ts_ms int, frame_sha string"
)


def frame_sample(media: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """Frame sampling stage (video analog): one input payload fans out to
    n_frames rows — the one-to-many shape a real sampler has, produced
    inside the same Arrow batch (no explode shuffle). Duration is decoded
    from the payload (stub), timestamps are evenly spaced, frame payloads
    are deterministic digests."""
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in ("doc_id", "media_ref", "frame_idx", "ts_ms", "frame_sha")}
            for doc_id, ref, payload in zip(pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
                duration_ms = 1000 + int.from_bytes(payload[4:6], "big") % 60_000
                for k in range(n_frames):
                    out["doc_id"].append(doc_id)
                    out["media_ref"].append(ref)
                    out["frame_idx"].append(k)
                    out["ts_ms"].append(k * duration_ms // n_frames)
                    out["frame_sha"].append(
                        hashlib.md5(f"{ref}|frame{k}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype=object),
                    "media_ref": pd.Series(out["media_ref"], dtype=object),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "ts_ms": pd.Series(out["ts_ms"], dtype="int32"),
                    "frame_sha": pd.Series(out["frame_sha"], dtype=object),
                }
            )

    return media.mapInPandas(sample, schema=FRAME_SCHEMA)


def sql_frame_sample(table: str = "documents", n_frames: int = N_FRAMES) -> str:
    ref = "('img://' || CAST(doc_id AS VARCHAR) || '/fig0')"
    dur = f"(1000 + ('0x' || substr(md5({ref}), 9, 4))::BIGINT % 60000)"
    return f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id, {ref} AS media_ref,
       CAST(k AS INT) AS frame_idx,
       CAST(k * {dur} // {n_frames} AS INT) AS ts_ms,
       md5({ref} || '|frame' || CAST(k AS VARCHAR)) AS frame_sha
FROM {table}, unnest(range({n_frames})) AS t(k)
WHERE doc_id % 4 = 0
"""


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
