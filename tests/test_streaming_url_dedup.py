"""Streaming URL dedup: first-seen-wins per canonical URL across
micro-batches; param-shuffled / tracking-tagged recrawls of a seen URL are
dropped, and a single batch reproduces the batch keeper set exactly."""

import os

import pandas as pd
import pytest

from pdfextract_spark.functions.webclean import url_dedup_params
from pdfextract_spark.streaming.url_stream import streaming_url_dedup


@pytest.fixture()
def url_batches(tmp_path):
    d = str(tmp_path / "urls_in")
    os.makedirs(d, exist_ok=True)
    # batch 1: 2 and 10 are the same page (param order shuffled; multi-width
    # ids so numeric-min keeper '2' differs from string-min '10'); 3 unique
    b1 = pd.DataFrame(
        {
            "doc_id": ["10", "2", "3"],
            "url": [
                "https://shop.example/item?a=1&b=2",
                "https://shop.example/item?b=2&a=1",
                "https://other.example/page?x=9",
            ],
        }
    )
    # batch 2: 4 recrawls batch-1's page with a tracking tag; 5 is new
    b2 = pd.DataFrame(
        {
            "doc_id": ["4", "5"],
            "url": [
                "https://shop.example/item?a=1&utm_source=feed&b=2",
                "https://new.example/fresh",
            ],
        }
    )
    return d, b1, b2


def _drain(spark, in_dir, out, ckpt):
    stream = spark.readStream.schema("doc_id string, url string").parquet(in_dir)
    q = (
        streaming_url_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_url_dedup_cross_batch(spark, url_batches, tmp_path):
    in_dir, b1, b2 = url_batches
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out, ckpt)
    got1 = {
        r["canonical"]: r["keeper_doc_id"]
        for r in spark.read.parquet(out).collect()
    }
    # single batch == batch keeper set (canonical -> min doc_id)
    batch = {
        r["canonical"]: str(r["keeper_doc"])
        for r in url_dedup_params(spark.createDataFrame(b1)).collect()
    }
    assert got1 == batch
    # numeric keeper: '2' wins over '10' (string min would wrongly keep '10')
    assert len(got1) == 2 and got1["shop.example/item?a=1&b=2"] == "2"

    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(in_dir)
    _drain(spark, in_dir, out, ckpt)
    rows = spark.read.parquet(out).collect()
    # doc 4's tracking-tagged recrawl canonicalizes to the seen key -> dropped
    assert len(rows) == 3
    keepers = {r["keeper_doc_id"] for r in rows}
    assert keepers == {"2", "3", "5"}
