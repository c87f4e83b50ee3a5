"""Cluster-size histogram: doc conservation, removable identity, CC match."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def hist(spark):
    return entry.queries()["dedup_cluster_sizes"](spark, SF_DIR).toPandas()


def test_conserves_documents(spark, hist):
    total = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert int(hist.n_docs.sum()) == total


def test_removable_identity(hist):
    assert (hist.n_removable == hist.n_docs - hist.n_clusters).all()
    assert (hist[hist.cluster_size == 1].n_removable == 0).all()


def test_no_size_one_cluster_from_cc(spark, hist):
    # the size-1 row is exactly the out-of-graph singleton count
    from pdfextract_spark.functions import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cc = dedup.connected_components(dedup.lsh_candidate_pairs(docs))
    in_cc = cc.count()
    total = docs.count()
    row1 = hist[hist.cluster_size == 1]
    assert len(row1) == 1
    assert int(row1.n_docs.iloc[0]) == total - in_cc
    # clustered mass matches the CC relation
    assert int(hist[hist.cluster_size > 1].n_docs.sum()) == in_cc
