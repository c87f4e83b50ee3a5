"""Source overlap: symmetry of coverage, bounds, WindowGroupLimit plan."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ov(spark):
    return entry.queries()["corpus_source_overlap"](spark, SF_DIR).toPandas()


def test_bounds_and_orientation(ov):
    assert (ov.jaccard_milli >= 0).all() and (ov.jaccard_milli <= 1000).all()
    assert (ov.source_a < ov.source_b).all()
    assert (ov.shared >= 1).all()


def test_pair_count_covers_sources(spark, ov):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_src = docs.select("source").distinct().count()
    # shared-vocab pairs are at most C(n,2); on this fixture the shared
    # stopword head makes every pair overlap, so the relation is complete
    assert len(ov) == n_src * (n_src - 1) // 2


def test_windowgrouplimit_in_plan(spark):
    from pdfextract_spark.functions import curation

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = curation.source_overlap(docs)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
