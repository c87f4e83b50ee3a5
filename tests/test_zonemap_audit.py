"""Zone-map audit: sorted layout never touches more files than hash,
in-range probes hit >=1 sorted file, hash layout spans the domain."""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def audit(spark):
    return (
        entry.queries()["corpus_zonemap_audit"](spark, SF_DIR)
        .toPandas()
        .sort_values("probe_id")
    )


def test_sorted_never_worse(audit):
    assert (audit.files_sorted <= audit.files_hash).all()
    assert (audit.touch_ratio_pm <= 1000).all()


def test_sorted_layout_prunes_somewhere(audit):
    # on a non-degenerate corpus at least one probe must do strictly better
    assert (audit.files_sorted < audit.files_hash).any()


def test_probes_with_data_hit_both_layouts(spark, audit):
    # a probe whose range contains ACTUAL data points must touch >= 1 file
    # under both layouts (zone maps never false-negative); probes that only
    # overlap a coarse hash span but sit in a data gap MAY hit 0 sorted
    # files — that asymmetry is exactly the pruning win, not a bug
    from pyspark.sql import functions as F
    from pdfextract_spark.functions.textops import (
        flesch_milli,
        readability_counts,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w_, s_, y_ = readability_counts(F.col("text"))
    pts = {
        r.pt
        for r in docs.select(flesch_milli(w_, s_, y_).alias("_f"))
        .select(
            F.expr("CASE WHEN _f < 0 THEN 0 ELSE _f div 1000 END").alias("pt")
        )
        .distinct()
        .collect()
    }
    for _, row in audit.iterrows():
        if any(row.probe_lo <= p <= row.probe_hi for p in pts):
            assert row.files_sorted >= 1
            assert row.files_hash >= 1
