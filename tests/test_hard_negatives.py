"""Hard-negative mining semantics: planted cross-label near-duplicates must
be found as each other's hard negative, same-label candidates are never
returned, and the argmax tie rule is deterministic. Value-level DuckDB
parity runs in the parametrized oracle suite (embed_hard_negatives)."""

import numpy as np
import pytest

from pdfextract_spark.functions.similarity import DIM, hard_negatives


def _corpus():
    """40 background vectors (label = id % 4) + 8 planted pairs: vector
    1000+i is vector i nudged by a tiny dyadic delta but carries a
    DIFFERENT label — the unambiguous hard negative."""
    rng = np.random.RandomState(7)
    rows = []
    base = rng.randn(40, DIM).astype(np.float64)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    for i in range(40):
        rows.append((i, [float(x) for x in base[i]], i % 4))
    for i in range(8):
        v = base[i].copy()
        v[0] += 0.015625  # 2^-6: exact in float and double
        rows.append((1000 + i, [float(x) for x in v], (i % 4) + 1))
    return rows


@pytest.fixture(scope="module")
def mined(spark):
    df = spark.createDataFrame(
        _corpus(), "vec_id long, embedding array<double>, label int"
    )
    out = hard_negatives(df, n_vecs=48)
    return {r["vec_id"]: r for r in out.collect()}


def test_planted_pairs_found(mined):
    for i in range(8):
        assert mined[i]["neg_id"] == 1000 + i, (i, mined.get(i))
        assert mined[1000 + i]["neg_id"] == i


def test_negatives_are_cross_label(mined):
    for r in mined.values():
        assert r["label"] != r["neg_label"]


def test_planted_similarity_dominates(mined):
    for i in range(8):
        assert mined[i]["cos_sim"] > 0.99


def test_deterministic_rerun(spark, mined):
    df = spark.createDataFrame(
        _corpus(), "vec_id long, embedding array<double>, label int"
    )
    again = {r["vec_id"]: tuple(r) for r in hard_negatives(df, n_vecs=48).collect()}
    assert again == {k: tuple(v) for k, v in mined.items()}
