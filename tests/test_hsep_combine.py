"""Repeated-hsep combining (GraphicSegmentatorImpl.combineHorizontalSeparators
:182-232): stacked table rules sharing the (x/3, w/3) combine key merge into
one box that is re-categorized and stops splitting the page into bands.
"""

import numpy as np

from pdfextract_spark.engine import extract_document_fast
from pdfextract_spark.oracle.document import extract_document
from pdfextract_spark.oracle.regions import (
    MEDIA_HSEP,
    MEDIA_HSEP_MEMBER,
    MEDIA_IMAGE,
    categorize_media,
    categorize_media_combined,
    combine_hsep_stacks,
)

F32 = np.float32


def _words_grid():
    """A loose grid of words so hseps qualify (cut no words, width >= 60%)."""
    xs, ys = [], []
    for r in range(8):
        for c in range(6):
            xs.append(50.0 + c * 60.0)
            ys.append(100.0 + r * 40.0)
    w_x = np.array(xs, dtype=F32)
    w_y = np.array(ys, dtype=F32)
    return w_x, w_y, w_x + 40.0, w_y + 10.0


def test_combine_hsep_stacks_merges_close_rules():
    # three stacked rules, same x/width, 12px apart -> one merged chunk
    m_x = np.array([50.0, 50.0, 50.0], dtype=F32)
    m_y = np.array([120.0, 135.0, 150.0], dtype=F32)
    m_w = np.array([300.0, 300.0, 300.0], dtype=F32)
    m_h = np.array([3.0, 3.0, 3.0], dtype=F32)
    roles = [MEDIA_HSEP, MEDIA_HSEP, MEDIA_HSEP]
    stacks = combine_hsep_stacks(roles, m_x, m_y, m_w, m_h)
    assert len(stacks) == 1
    run, (bx, by, bex, bey) = stacks[0]
    assert sorted(run) == [0, 1, 2]
    assert (bx, by, bex, bey) == (50.0, 120.0, 350.0, 153.0)


def test_combine_hsep_stacks_distance_break_and_key():
    # rules >50 apart flush into separate single chunks
    m_x = np.array([50.0, 50.0], dtype=F32)
    m_y = np.array([120.0, 200.0], dtype=F32)
    m_w = np.array([300.0, 300.0], dtype=F32)
    m_h = np.array([3.0, 3.0], dtype=F32)
    stacks = combine_hsep_stacks([MEDIA_HSEP, MEDIA_HSEP], m_x, m_y, m_w, m_h)
    assert sorted(len(r) for r, _ in stacks) == [1, 1]
    # different width key -> no group at all
    m_w2 = np.array([300.0, 200.0], dtype=F32)
    assert combine_hsep_stacks([MEDIA_HSEP, MEDIA_HSEP], m_x, m_y, m_w2, m_h) == []


def test_categorize_media_combined_demotes_stack():
    w_x, w_y, w_ex, w_ey = _words_grid()
    region_w = float(w_ex.max() - w_x.min())
    # stack of three rules between word rows (cut no words: rows are 40 apart
    # at y=100,140,180...; rules at y=121,131,141 would cut the y=140 row, so
    # use x-span words only above/below) — simpler: grid rows at 100+40k,
    # rules in the 260..300 gap region
    m_x = np.array([50.0, 50.0, 50.0, 50.0], dtype=F32)
    m_y = np.array([262.0, 272.0, 282.0, 30.0], dtype=F32)
    m_w = np.full(4, region_w * 0.8, dtype=F32)
    m_h = np.array([3.0, 3.0, 3.0, 3.0], dtype=F32)
    texts = ["word"] * len(w_x)
    before = categorize_media(m_x, m_y, m_w, m_h, w_x, w_y, w_ex, w_ey, region_w, texts)
    assert before == [MEDIA_HSEP] * 4
    after, synth = categorize_media_combined(
        m_x, m_y, m_w, m_h, w_x, w_y, w_ex, w_ey, region_w, texts
    )
    # the 3-stack merges into a 23px-tall box -> fails HSEP height -> image;
    # the isolated rule at y=30 is >50 away -> flushes alone -> stays hsep
    assert after[:3] == [MEDIA_IMAGE] * 3
    assert after[3] == MEDIA_HSEP
    assert synth == []


def test_merged_stack_still_hsep_yields_one_synthetic_separator():
    """When the merged box STILL qualifies as a separator (members nearly
    coincide), the reference keeps ONE merged separator in place of the
    members (combineHorizontalSeparators removeAll + re-add): members demote
    to MEDIA_HSEP_MEMBER (inert for band splitting) and the merged box comes
    back as a synthetic separator."""
    w_x, w_y, w_ex, w_ey = _words_grid()
    region_w = float(w_ex.max() - w_x.min())
    # two rules 4px apart: union is 6px tall -> still <= HSEP_MAX_HEIGHT
    m_x = np.array([50.0, 50.0], dtype=F32)
    m_y = np.array([262.0, 266.0], dtype=F32)
    m_w = np.full(2, region_w * 0.8, dtype=F32)
    m_h = np.array([2.0, 2.0], dtype=F32)
    texts = ["word"] * len(w_x)
    before = categorize_media(m_x, m_y, m_w, m_h, w_x, w_y, w_ex, w_ey, region_w, texts)
    assert before == [MEDIA_HSEP] * 2
    after, synth = categorize_media_combined(
        m_x, m_y, m_w, m_h, w_x, w_y, w_ex, w_ey, region_w, texts
    )
    assert after == [MEDIA_HSEP_MEMBER] * 2
    assert len(synth) == 1
    bx, by, bex, bey = synth[0]
    assert (by, bey) == (262.0, 268.0)


def _ruled_table_doc():
    spans = []
    off = 0

    def add(kind, text="", ref=""):
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": ref, "offset": off})
        off += 1

    add("text", "Ruled Table Fodder Document")
    add("text", "intro body line with several plain words here")
    add("text", "another body line flows before the table content")
    for r in range(3):
        add("media", "", f"img://tbl/rule0_{r}")
        add("text", "row alpha beta gamma")
    add("text", "closing body line after the ruled table block")
    add("text", "final paragraph with ordinary words in flow")
    return spans


def test_ruled_table_page_keeps_reading_order_and_parity():
    spans = _ruled_table_doc()
    args = (
        [s["kind"] for s in spans],
        [s["text"] for s in spans],
        [s["media_ref"] for s in spans],
        [s["offset"] for s in spans],
    )
    oracle = extract_document("tbl", *args)
    engine = extract_document_fast("tbl", *args)
    assert [(s.kind, s.text, s.media_ref) for s in oracle] == [
        (s.kind, s.text, s.media_ref) for s in engine
    ]
    # all three rule media preserved 1:1
    out_refs = sorted(s.media_ref for s in oracle if s.kind == "media")
    assert out_refs == sorted(s["media_ref"] for s in spans if s["kind"] == "media")
    # the table rows stay in input order (page not sliced into per-rule bands)
    texts = [s.text for s in oracle if s.kind != "media"]
    joined = " ".join(texts)
    first = joined.find("row alpha beta gamma")
    assert first != -1
    assert joined.count("row alpha beta gamma") == 3
    assert "intro body line" in joined.split("row alpha")[0]
    assert "closing body line" in joined.rsplit("row alpha", 1)[1]
