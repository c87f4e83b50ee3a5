"""ExactSubstr removal (Lee et al. 2022) semantic gates: planted cross-doc
and within-doc duplicated passages are removed token-exactly; unique and
sub-window docs pass through untouched. The value-level DuckDB parity gate
is the parametrized oracle suite (tests/test_oracle_queries.py)."""

import pytest

from pdfextract_spark.functions.dedup import WINDOW_W, exact_substr_removal

W = WINDOW_W  # 5

# 8-token duplicated passage (> w, so interior tokens are covered by
# multiple windows) shared verbatim by docs 1 and 2.
PASSAGE = "alpha bravo charlie delta echo foxtrot golf hotel"


def _docs(spark):
    rows = [
        ("1", f"u11 u12 u13 {PASSAGE} u14 u15 u16"),
        ("2", f"u21 {PASSAGE} u22 u23 u24 u25"),
        # unique doc, long enough to have windows
        ("3", "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10"),
        # shorter than the window: no windows, never touched
        ("4", "w1 w2 w3"),
        # within-doc repeat of one exact window (multiplicity >= 2)
        ("5", "x1 x2 r1 r2 r3 r4 r5 x3 x4 r1 r2 r3 r4 r5 x5 x6"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


@pytest.fixture(scope="module")
def result(spark):
    out = exact_substr_removal(_docs(spark)).collect()
    return {r["doc_id"]: r for r in out}


def test_cross_doc_passage_removed(result):
    for d in ("1", "2"):
        clean = result[d]["text_clean"]
        for tok in PASSAGE.split():
            assert tok not in clean.split(), (d, tok, clean)
        assert result[d]["n_removed"] == len(PASSAGE.split())


def test_unique_fillers_survive(result):
    assert result["1"]["text_clean"] == "u11 u12 u13 u14 u15 u16"
    assert result["2"]["text_clean"] == "u21 u22 u23 u24 u25"


def test_unique_doc_untouched(result):
    assert result["3"]["n_removed"] == 0
    assert result["3"]["text_clean"] == "v1 v2 v3 v4 v5 v6 v7 v8 v9 v10"


def test_subwindow_doc_untouched(result):
    assert result["4"]["n_removed"] == 0
    assert result["4"]["text_clean"] == "w1 w2 w3"
    assert result["4"]["n_tokens"] == 3


def test_within_doc_repeat_removed(result):
    r = result["5"]
    toks = r["text_clean"].split()
    for t in ("r1", "r2", "r3", "r4", "r5"):
        assert t not in toks
    # both occurrences removed: 10 repeated tokens gone
    assert r["n_removed"] == 10
    assert toks == ["x1", "x2", "x3", "x4", "x5", "x6"]
