"""Flesch readability semantics on handcrafted texts: band boundaries,
syllable/sentence counting edge cases, and fixed-point integer math.
Value-level DuckDB parity runs in the parametrized oracle suite."""

import pytest

from pdfextract_spark.functions.textops import (
    READ_EASY_MILLI,
    READ_MEDIUM_MILLI,
    readability,
)


@pytest.fixture(scope="module")
def scored(spark):
    rows = [
        # short simple sentences, monosyllabic words -> high score
        ("easy", "the cat sat. the dog ran. we all nap."),
        # one long sentence of polysyllabic words -> deeply negative score
        ("hard", "extraordinary organizational revolutionary considerations "
                 "necessitate infrastructural reorganization unequivocally"),
        # no terminal punctuation at all -> sentence count floors at 1
        ("nopunct", "plain words without any stops"),
        # empty-ish text -> all counts floor at 1, formula still defined
        ("tiny", "a"),
    ]
    df = readability(spark.createDataFrame(rows, "doc_id string, text string"))
    return {r["doc_id"]: r for r in df.collect()}


def test_easy_text_scores_easy(scored):
    r = scored["easy"]
    assert r["band"] == "easy"
    assert r["flesch_milli"] >= READ_EASY_MILLI


def test_hard_text_scores_hard(scored):
    r = scored["hard"]
    assert r["band"] == "hard"
    assert r["flesch_milli"] < READ_MEDIUM_MILLI


def test_sentence_floor(scored):
    assert scored["nopunct"]["n_sentences"] == 1


def test_counts_floor_at_one(scored):
    r = scored["tiny"]
    assert r["n_words"] == 1
    assert r["n_sentences"] == 1
    assert r["n_syllables"] == 1


def test_fixed_point_formula(scored):
    # recompute the integer formula for one row — guards against float drift
    r = scored["easy"]
    expect = (
        206_835
        - (1015 * r["n_words"]) // r["n_sentences"]
        - (84_600 * r["n_syllables"]) // r["n_words"]
    )
    assert r["flesch_milli"] == expect
    assert READ_MEDIUM_MILLI < READ_EASY_MILLI
