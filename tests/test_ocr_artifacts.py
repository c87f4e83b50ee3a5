"""OCR gate: zero false positives on the clean corpus, full recall on
planted docs the damage actually changed."""

import hashlib

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from pdfextract_spark.functions import textops

SF_DIR = "/root/testdata/sf0.001"


def _planted(doc_id):
    return int(hashlib.md5(f"ocr|{doc_id}".encode()).hexdigest()[:4], 16) % 8 == 0


def test_zero_false_positives_on_clean(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    out = textops.ocr_artifacts(docs).toPandas()
    assert not out.ocr_flag.any()


def test_full_recall_on_effective_damage(spark):
    out = entry.queries()["text_ocr_artifacts"](spark, SF_DIR).toPandas()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").toPandas()
    docs["doc_id"] = docs.doc_id.astype(str)
    text_of = dict(zip(docs.doc_id, docs.text))
    flagged = dict(zip(out.doc_id, out.ocr_flag))
    n_effective = 0
    for d, t in text_of.items():
        if _planted(d):
            effective = ("m" in t) or (" the " in t)
            if effective:
                n_effective += 1
                assert flagged[d], f"planted+changed doc {d} not flagged"
        else:
            assert not flagged[d], f"clean doc {d} falsely flagged"
    assert n_effective > 10  # the plant actually exercised the gate
