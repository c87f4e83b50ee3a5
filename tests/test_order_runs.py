"""Order-run audit: conservation, run identities, and order equivalence
with epoch_shuffle (same md5 schedule)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from pdfextract_spark.functions import webclean

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stats(spark):
    return entry.queries()["corpus_order_runs"](spark, SF_DIR).toPandas()


def test_conservation_and_bounds(spark, stats):
    total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert int(stats.n_docs.sum()) == total
    assert (stats.n_runs <= stats.n_docs).all()
    assert (stats.max_run >= 1).all()
    assert (stats.mean_run_milli >= 1000).all()


def test_python_recompute_one_shard(spark, stats):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    order = webclean.epoch_shuffle(docs).join(
        docs.select(F.col("doc_id").cast("string").alias("doc_id"), "lang"),
        "doc_id",
    )
    pdf = order.filter(F.col("shard") == 0).orderBy("pos").toPandas()
    runs = 0
    prev = None
    best = cur = 0
    for lang in pdf.lang:
        if lang != prev:
            runs += 1
            cur = 1
            prev = lang
        else:
            cur += 1
        best = max(best, cur)
    row = stats[stats.shard == 0].iloc[0]
    assert int(row.n_docs) == len(pdf)
    assert int(row.n_runs) == runs
    assert int(row.max_run) == best
