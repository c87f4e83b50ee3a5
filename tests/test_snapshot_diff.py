"""Snapshot diff: status totality, planted-schedule conservation."""

import pytest

import __spark_entry__ as entry
from pdfextract_spark.functions import webclean

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def diff(spark):
    return entry.queries()["corpus_snapshot_diff"](spark, SF_DIR).toPandas()


def test_all_statuses_present(diff):
    assert set(diff.status) == {"added", "removed", "changed", "unchanged"}
    assert (diff.n_docs >= 1).all()


def test_conservation_against_snapshots(spark, diff):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    snap_a, snap_b = webclean.synthesize_snapshots(docs)
    n_a, n_b = snap_a.count(), snap_b.count()
    by = dict(zip(diff.status, diff.n_docs))
    # A = removed + changed + unchanged; B = added + changed + unchanged
    assert by["removed"] + by["changed"] + by["unchanged"] == n_a
    assert by["added"] + by["changed"] + by["unchanged"] == n_b
    # union = all four
    total = sum(by.values())
    assert total == n_a + by["added"]


def test_share_pm_sums_near_1000(diff):
    s = int(diff.share_pm.sum())
    assert 997 <= s <= 1000  # floor division loses at most 3 per-mille
