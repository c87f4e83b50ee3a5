"""C4 filter (Raffel et al. 2020 §2.2) semantic gates on handcrafted pages;
the value-level DuckDB parity gate is the parametrized oracle suite."""

import pytest

from pdfextract_spark.functions.webclean import c4_filters

GOOD = "this line has enough words and ends well."


def _web(spark):
    rows = [
        # 3 good sentences -> kept doc
        ("1", "\n".join([GOOD, "another proper sentence with seven words total!",
                         'a third one that also qualifies nicely?'])),
        # only 2 good lines -> dropped (min 3 kept lines)
        ("2", "\n".join([GOOD, "another proper sentence with seven words total!",
                         "no terminal punctuation on this line"])),
        # line rules: short line, no terminal, javascript line all dropped
        ("3", "\n".join([GOOD, GOOD, GOOD, "too short.",
                         "terminal missing from this perfectly long line",
                         "enable JavaScript to view this content."])),
        # doc poisons
        ("4", "\n".join([GOOD, GOOD, GOOD, "Lorem Ipsum filler text here."])),
        ("5", "\n".join([GOOD, GOOD, GOOD, "if (x) { return y; }"])),
    ]
    return spark.createDataFrame(rows, "doc_id string, web_text string")


@pytest.fixture(scope="module")
def result(spark):
    return {r["doc_id"]: r for r in c4_filters(_web(spark)).collect()}


def test_clean_doc_kept(result):
    r = result["1"]
    assert r["keep_doc"] and r["n_kept_lines"] == 3
    assert r["text_c4"].count("\n") == 2


def test_two_sentence_doc_dropped(result):
    r = result["2"]
    assert r["n_kept_lines"] == 2 and not r["keep_doc"]


def test_line_rules(result):
    r = result["3"]
    # the 3 GOOD lines survive; short / unterminated / javascript lines don't
    assert r["n_lines"] == 6 and r["n_kept_lines"] == 3
    assert "javascript" not in r["text_c4"].lower()
    assert "too short." not in r["text_c4"]


def test_lorem_ipsum_poisons_doc(result):
    r = result["4"]
    assert r["has_lorem_ipsum"] and not r["keep_doc"]
    assert r["n_kept_lines"] >= 3  # dropped by the doc rule, not line count


def test_brace_poisons_doc(result):
    r = result["5"]
    assert r["has_brace"] and not r["keep_doc"]
