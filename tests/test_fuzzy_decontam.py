"""Fuzzy decontamination: the period-7 perturbation provably evades the
exact 8-gram detector while every plant clears the shared-shingle floor —
plus zero false positives on clean docs (vocab disjoint from the passage)."""

import pytest
from pyspark.sql import functions as F

from pdfextract_spark.functions.decontam import (
    FUZZY_MIN_SHARED,
    NGRAM,
    PERTURB_MOD,
    fuzzy_contamination_report,
    synthesize_perturbed_leaks,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def report(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    split = synthesize_perturbed_leaks(docs)
    return fuzzy_contamination_report(split).toPandas()


def test_perturbation_breaks_every_exact_gram():
    # the analytical guarantee the synthesis encodes: a swap every
    # PERTURB_MOD tokens leaves no clean window of NGRAM tokens
    assert PERTURB_MOD < NGRAM


def test_exact_detector_is_blind(report):
    assert (report.n_exact_hits == 0).all()


def test_all_plants_detected_no_false_positives(report):
    plants = report[report.fuzzy_contaminated]
    clean = report[~report.fuzzy_contaminated]
    assert len(plants) > 0
    assert (plants.n_shared >= FUZZY_MIN_SHARED).all()
    # clean docs share NOTHING with the passage (disjoint vocabulary)
    assert (clean.n_shared == 0).all()


def test_plant_rate_matches_synthesis(spark, report):
    # ~1/PLANT_MOD of train docs planted (md5 coin), loose band
    frac = report.fuzzy_contaminated.mean()
    assert 0.04 < frac < 0.25
