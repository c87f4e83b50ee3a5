"""Multi-format document sources.

The reference's entry point walks a directory and accepts whatever files it
finds (`TextExtractor.java:63-81` / `util/FileWalker.java`); the engine's
analog accepts the documents table in the formats a real corpus shows up
in — parquet (the canonical layout), JSONL, and CSV — and normalizes all
of them to the same schema so every downstream operator is
format-agnostic.

All readers are declarative `spark.read` plans: format detection picks the
DataSource, the explicit schema (a) skips Spark's sampling-based inference
pass over JSON/CSV (a full extra scan at corpus scale) and (b) pins column
types so a malformed corpus fails loudly at read time instead of silently
widening doc_id to string-typed garbage downstream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".jsonl": "json",
    ".json": "json",
    ".ndjson": "json",
    ".csv": "csv",
    ".orc": "orc",
}


def detect_format(path: str) -> str:
    """File-extension dispatch; directories of part files keep the dir
    suffix convention (e.g. `docs.parquet/` from a Spark write)."""
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    try:
        return _EXT_FORMAT[ext]
    except KeyError:
        raise ValueError(
            f"cannot infer document format from {path!r}; "
            f"known extensions: {sorted(_EXT_FORMAT)}"
        ) from None


def read_documents(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    """documents table from parquet/JSONL/CSV, normalized to
    DOCUMENTS_SCHEMA column order and types."""
    fmt = fmt or detect_format(path)
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "orc":
        # columnar like parquet: schema travels with the file, predicate
        # pushdown and column pruning work the same — no inference scan
        df = spark.read.orc(path)
    elif fmt == "json":
        df = spark.read.schema(DOCUMENTS_SCHEMA).json(path)
    elif fmt == "csv":
        df = spark.read.schema(DOCUMENTS_SCHEMA).option("header", "true").csv(path)
    else:
        raise ValueError(f"unsupported document format {fmt!r}")
    missing = {f.name for f in DOCUMENTS_SCHEMA.fields} - set(df.columns)
    if {"doc_id", "text"} & missing:
        raise ValueError(f"documents source {path!r} lacks required columns {missing}")
    return df.select(
        *[
            (F.col(f.name) if f.name not in missing else F.lit(None))
            .cast(f.dataType)
            .alias(f.name)
            for f in DOCUMENTS_SCHEMA.fields
        ]
    )
