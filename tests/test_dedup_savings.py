"""Dedup savings: per-strategy totals agree with the standalone keepers."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def savings(spark):
    return (
        entry.queries()["dedup_savings"](spark, SF_DIR)
        .toPandas()
        .set_index("strategy")
    )


def test_before_totals_agree(spark, savings):
    total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert (savings.n_docs_before == total).all()
    assert savings.n_tokens_before.nunique() == 1


def test_url_matches_standalone(spark, savings):
    url = entry.queries()["web_url_dedup"](spark, SF_DIR)
    kept = url.filter(F.col("is_keeper")).count()
    assert int(savings.loc["url"].n_docs_after) == kept


def test_neardup_matches_components(spark, savings):
    from pdfextract_spark.functions import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cc = dedup.connected_components(dedup.lsh_candidate_pairs(docs))
    reps = cc.filter(F.col("doc_id") == F.col("rep")).count()
    in_cc = cc.count()
    total = docs.count()
    assert int(savings.loc["neardup"].n_docs_after) == total - in_cc + reps


def test_bounds(savings):
    assert (savings.n_docs_after <= savings.n_docs_before).all()
    assert (savings.n_tokens_after <= savings.n_tokens_before).all()
    assert (savings.docs_removed_pm < 1000).all()
