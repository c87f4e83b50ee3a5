"""Caption-pair mining semantics on handcrafted span sequences: nearest-text
side rule (ties to the following span), missing-side fallback, min-words
grounding gate. Value-level DuckDB parity over the rich interleave schedule
runs in the parametrized oracle suite."""

import pytest

from pdfextract_spark.functions.multimodal import MIN_CAPTION_WORDS, caption_pairs

SPAN_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def _t(text, off):
    return ("text", text, "", off)


def _m(ref, off):
    return ("media", "", ref, off)


@pytest.fixture(scope="module")
def pairs(spark):
    rows = [
        # media between two texts at equal distance -> tie goes to NEXT
        ("tie", [_t("before words here", 0), _m("a", 1), _t("after words here", 2)]),
        # closer preceding text wins
        ("prev", [_t("the previous caption", 0), _m("a", 1),
                  _m("b", 2), _t("far next caption", 5)]),
        # trailing media: no following text -> prev side
        ("tail", [_t("only caption text", 0), _m("a", 1)]),
        # caption too short -> pair_ok false
        ("short", [_t("tiny", 0), _m("a", 1)]),
        # leading media: no preceding text -> next side
        ("head", [_m("a", 0), _t("caption comes after", 1)]),
        # media with no text at all -> side 'none', not ok
        ("orphan", [_m("a", 0), _m("b", 1)]),
    ]
    df = caption_pairs(spark.createDataFrame(rows, SPAN_SCHEMA))
    return {(r["doc_id"], r["media_ref"]): r for r in df.collect()}


def test_tie_goes_to_next(pairs):
    r = pairs[("tie", "a")]
    assert r["caption_side"] == "next"
    assert r["caption"] == "after words here"
    assert r["caption_dist"] == 1
    assert r["pair_ok"]


def test_closer_prev_wins(pairs):
    a = pairs[("prev", "a")]
    assert a["caption_side"] == "prev"
    assert a["caption"] == "the previous caption"
    # second media: prev dist 2, next dist 3 -> still prev
    b = pairs[("prev", "b")]
    assert b["caption_side"] == "prev"
    assert b["caption_dist"] == 2


def test_trailing_media_uses_prev(pairs):
    r = pairs[("tail", "a")]
    assert r["caption_side"] == "prev"
    assert r["pair_ok"]


def test_min_words_gate(pairs):
    r = pairs[("short", "a")]
    assert r["caption"] == "tiny"
    assert not r["pair_ok"]
    assert MIN_CAPTION_WORDS > 1


def test_leading_media_uses_next(pairs):
    r = pairs[("head", "a")]
    assert r["caption_side"] == "next"
    assert r["caption"] == "caption comes after"


def test_orphan_media_not_ok(pairs):
    for ref in ("a", "b"):
        r = pairs[("orphan", ref)]
        assert r["caption_side"] == "none"
        assert not r["pair_ok"]
        assert r["caption_dist"] == -1


def test_one_row_per_media_span(spark):
    rows = [("d", [_t("words and more words", 0), _m("a", 1), _m("b", 2),
                   _t("yet more caption words", 3), _m("c", 4)])]
    df = caption_pairs(spark.createDataFrame(rows, SPAN_SCHEMA))
    got = df.collect()
    assert len(got) == 3
    assert [r["media_offset"] for r in got] == [1, 2, 4]
