"""Streaming fuzzy decontamination: batch equality (against BOTH the
stateless column twin and functions/decontam.fuzzy_contamination_report's
join-based batch path), evasion recovery (perturbed plants: zero exact
hits, fuzzy flag set), and exactly-once resume."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions import decontam
from pdfextract_spark.streaming.fuzzy_decontam_stream import (
    fuzzy_bench_sets,
    fuzzy_decontam_columns,
    start_fuzzy_decontam_stream,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_dirs(spark, tmp_path_factory):
    """(train_dir, shingles, exact_grams, split_df) from the synthesized
    perturbed-leak split."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") < 120
    )
    split = decontam.synthesize_perturbed_leaks(docs)
    d = str(tmp_path_factory.mktemp("fdc_in"))
    split.filter(F.col("role") == "train").select(
        "doc_id", F.col("text2").alias("text")
    ).coalesce(4).write.mode("overwrite").parquet(d)
    shingles, exact = fuzzy_bench_sets(
        split.filter(F.col("role") == "bench").select(
            F.col("text2").alias("text")
        )
    )
    assert shingles and exact  # the passage guarantees non-empty sets
    return d, shingles, exact, split


def test_stream_matches_batch_join_path(spark, split_dirs, tmp_path):
    train_dir, shingles, exact_grams, split = split_dirs
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_fuzzy_decontam_stream(
        spark, train_dir, out, ckpt, shingles, exact_grams
    )
    q.awaitTermination(120)

    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    # oracle 1: the stateless column twin on the same input
    want_cols = {
        r.doc_id: r
        for r in fuzzy_decontam_columns(
            spark.read.parquet(train_dir), shingles, exact_grams
        ).collect()
    }
    # oracle 2: the batch join-based report over the same split
    want_join = {
        r.doc_id: r
        for r in decontam.fuzzy_contamination_report(split).collect()
    }
    assert set(got) == set(want_cols) == set(want_join)
    for k in got:
        assert got[k].n_shared == want_cols[k].n_shared == want_join[k].n_shared, k
        assert (
            got[k].n_exact_hits
            == want_cols[k].n_exact_hits
            == want_join[k].n_exact_hits
        ), k
        assert got[k].fuzzy_contaminated == want_join[k].fuzzy_contaminated, k

    # the point of the fuzzy pass: perturbed plants carry ZERO exact 8-gram
    # hits yet clear the shared-shingle floor
    evaders = [
        r for r in got.values() if r.fuzzy_contaminated and r.n_exact_hits == 0
    ]
    assert evaders, "no perturbed plant recovered — synthesis premise broken"
    assert any(not r.fuzzy_contaminated for r in got.values())

    # exactly-once: re-draining with the same checkpoint adds nothing
    q2 = start_fuzzy_decontam_stream(
        spark, train_dir, out, ckpt, shingles, exact_grams
    )
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == len(got)


def test_fuzzy_set_cap_is_loud(spark, split_dirs):
    import pdfextract_spark.streaming.decontam_stream as ds

    _, _, _, split = split_dirs
    old = ds.BENCH_GRAMS_CAP
    ds.BENCH_GRAMS_CAP = 1
    try:
        with pytest.raises(ValueError, match="BENCH_GRAMS_CAP"):
            fuzzy_bench_sets(
                split.filter(F.col("role") == "bench").select(
                    F.col("text2").alias("text")
                )
            )
    finally:
        ds.BENCH_GRAMS_CAP = old
