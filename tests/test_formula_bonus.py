"""B2 containedGraphics bonus (Formulas.java:83-103): a MATH_BAR graphic in
the line-set boosts the math score by 10% per bar (Java float truncation) and
can flip a marginal indented line-set into a formula block.
"""

import numpy as np

from pdfextract_spark.corpus import generate
from pdfextract_spark.engine import extract_document_fast
from pdfextract_spark.oracle.blocks import find_blocks, math_score_exceeds
from pdfextract_spark.oracle.document import extract_document

F32 = np.float32


def test_bonus_arithmetic():
    # "====" scores 12 (3 per Sm), "abcdefgh" scores 0; chars = 12
    texts = ["====", "abcd", "efgh"]
    assert not math_score_exceeds(texts)                       # 12 > 12 false
    assert math_score_exceeds(texts, contained_graphics=1)     # int(12+1.2)=13 > 12
    # bonus multiplies the existing score — zero score stays zero
    assert not math_score_exceeds(["abcd", "efgh", "ijkl"], contained_graphics=3)
    # bars count toward the min-contents gate (contents.size() includes them)
    assert math_score_exceeds(["====", "abcdefgh"], contained_graphics=2)
    assert not math_score_exceeds(["====", "abcdefgh"], contained_graphics=0)


def _marginal_lines():
    """Two indented lines whose combined score EQUALS the char count: only
    the bar bonus pushes them over."""
    # line 1: "==", "==" (score 6+6, chars 2+2); line 2: "abcdefgh" (score 0,
    # chars 8) -> combined score 12 == chars 12, 3 words + 1 bar = 4 contents.
    # Line 2 is X-DISJOINT from line 1 so B1's vertical slab adjacency cannot
    # join the lines on its own — only the B2 bar path can.
    w_x = np.array([140.0, 170.0, 210.0], dtype=F32)
    w_y = np.array([100.0, 100.0, 130.0], dtype=F32)
    w_ex = np.array([160.0, 190.0, 270.0], dtype=F32)
    w_ey = np.array([112.0, 112.0, 142.0], dtype=F32)
    texts = ["==", "==", "abcdefgh"]
    bound = (100.0, 90.0, 400.0, 160.0)
    # bar between the lines, overlapping both lines' row bands so the
    # working set never resets (y 111..131 covers the gap)
    bar = (140.0, 111.0, 320.0, 131.0)
    return w_x, w_y, w_ex, w_ey, texts, bound, bar


def test_bar_flips_lineset_to_formula_block():
    w_x, w_y, w_ex, w_ey, texts, bound, bar = _marginal_lines()
    # without the bar: working set resets in the blank band between the
    # lines, score never fires -> B1 yields the top line and the bottom
    # line as separate blocks
    without = find_blocks(w_x, w_y, w_ex, w_ey, texts, bound, blockers=[])
    assert sorted(sorted(b) for b in without) == [[0, 1], [2]]
    # with the bar: rows stay occupied through the gap, the bonus tips the
    # marginal score, hungry absorb -> ONE formula block with all words
    with_bar = find_blocks(
        w_x, w_y, w_ex, w_ey, texts, bound, blockers=[bar], math_bars=[bar]
    )
    assert sorted(sorted(b) for b in with_bar) == [[0, 1, 2]]


def test_engine_oracle_parity_with_fraction_bars():
    """Corpus docs containing fraction-bar media must extract identically on
    both sides with the bonus wired (the bar plumbing is per-side code)."""
    checked = 0
    for doc_id, spans in generate(60, seed=13, skew_frac=0.0):
        if not any("/bar" in s["media_ref"] for s in spans):
            continue
        args = (
            [s["kind"] for s in spans],
            [s["text"] for s in spans],
            [s["media_ref"] for s in spans],
            [s["offset"] for s in spans],
        )
        o = extract_document(doc_id, *args)
        e = extract_document_fast(doc_id, *args)
        assert [(s.kind, s.text, s.media_ref) for s in o] == [
            (s.kind, s.text, s.media_ref) for s in e
        ], doc_id
        checked += 1
    assert checked >= 3
