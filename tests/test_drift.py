"""Snapshot drift semantics: identical halves drift ~0, a planted
distribution shift is detected and localized to its bucket, and the
bucket-L1 lower-bounds the true token L1 direction. Value parity runs in
the oracle suite (corpus_drift_report)."""

import pytest

from pyspark.sql import functions as F

from pdfextract_spark.functions.textops import DRIFT_PPM, snapshot_drift


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_identical_distributions_near_zero(spark):
    # both snapshot halves draw from the SAME token distribution: drift is
    # only sampling noise, far below a real shift
    rows = [(i, "alpha beta gamma delta " * 10, "en") for i in range(400)]
    out = snapshot_drift(_docs(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["l1_ppm"] <= DRIFT_PPM // 100  # < 1% — same text everywhere


def test_planted_shift_detected_and_localized(spark):
    # plant by the operator's own snapshot coin: snap-1 docs carry a
    # divergent vocabulary, so the two halves genuinely differ
    import hashlib

    def snap(doc_id):
        return int(hashlib.md5(f"snap|{doc_id}".encode()).hexdigest()[:4], 16) % 2

    rows = []
    for i in range(400):
        base = "common words shared across snapshots " * 3
        extra = "zzzshifted " * 10 if snap(i) == 1 else "zzzoriginal " * 10
        rows.append((i, base + extra, "en"))
    out = snapshot_drift(_docs(spark, rows)).collect()[0]
    # ~37% of each side's tokens differ -> l1 far above noise
    assert out["l1_ppm"] >= DRIFT_PPM // 4
    # the top bucket's shift is a real share, positive and large
    assert out["top_shift_ppm"] > DRIFT_PPM // 20
    assert out["tokens_a"] > 0 and out["tokens_b"] > 0


def test_per_language_isolation(spark):
    import hashlib

    def snap(doc_id):
        return int(hashlib.md5(f"snap|{doc_id}".encode()).hexdigest()[:4], 16) % 2

    rows = []
    for i in range(300):
        rows.append((i, "stable tokens forever " * 5, "en"))
    for i in range(300, 600):
        w = "neu " if snap(i) == 1 else "alt "
        rows.append((i, ("gleich bleibend " * 3) + w * 8, "de"))
    out = {r["lang"]: r for r in snapshot_drift(_docs(spark, rows)).collect()}
    assert out["de"]["l1_ppm"] > out["en"]["l1_ppm"] * 5


def test_deterministic(spark):
    rows = [(i, f"tok{i % 7} tok{i % 3} filler", "en") for i in range(200)]
    a = [tuple(r) for r in snapshot_drift(_docs(spark, rows)).collect()]
    b = [tuple(r) for r in snapshot_drift(_docs(spark, rows)).collect()]
    assert a == b
