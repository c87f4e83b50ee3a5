"""Streaming per-domain quota: arrival-order cap semantics, cross-micro-
batch state, no-silent-drops (every doc gets a flagged row), exactly-once
resume."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions import webclean
from pdfextract_spark.streaming.quota_stream import start_quota_stream

SF_DIR = "/root/testdata/sf0.001"
CAP = 3


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    """Synthesized web corpus (URL-bearing text) written as MANY small
    files so maxFilesPerTrigger yields real multi-batch state carry."""
    d = str(tmp_path_factory.mktemp("quota_in"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 100
    )
    webclean.synthesize_web(docs).select(
        "doc_id", F.col("web_text").alias("text")
    ).repartition(10).write.mode("overwrite").parquet(d)
    return d


def test_quota_caps_per_domain_across_batches(spark, docs_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_quota_stream(
        spark, docs_dir, out, ckpt, cap=CAP, max_files_per_trigger=2
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out).toPandas()
    # every input doc got exactly one flagged row (no silent drops)
    assert len(got) == 100
    assert got.doc_id.nunique() == 100

    per_dom = got.groupby("domain").admitted.sum()
    sizes = got.groupby("domain").size()
    for dom in sizes.index:
        assert per_dom[dom] == min(sizes[dom], CAP), dom
    # at least one domain actually overflowed the cap in the fixture
    assert (sizes > CAP).any()
    assert (~got.admitted).sum() > 0

    # exactly-once: re-draining with the same checkpoint adds nothing
    q2 = start_quota_stream(
        spark, docs_dir, out, ckpt, cap=CAP, max_files_per_trigger=2
    )
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == 100
