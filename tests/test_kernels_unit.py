"""Unit tests for the shared page-analysis kernels (P2 / P7-P9 / B1-B2),
pinning the reference semantics at the kernel boundary (the end-to-end
corpus tests cover them in composition)."""

import numpy as np

from pdfextract_spark.oracle.blocks import find_blocks, math_score_exceeds
from pdfextract_spark.oracle.regions import (
    MEDIA_CONTAINER,
    MEDIA_HSEP,
    MEDIA_IMAGE,
    MEDIA_MATH_BAR,
    categorize_media,
    split_ys_by_spacing,
)


def _rows(words):
    """words: list of (x, y, ex, ey, style, text)."""
    a = np.array
    return (
        a([w[0] for w in words], dtype=np.float32),
        a([w[1] for w in words], dtype=np.float32),
        a([w[2] for w in words], dtype=np.float32),
        a([w[3] for w in words], dtype=np.float32),
        [w[4] for w in words],
        [len(w[5]) for w in words],
        [w[5] for w in words],
    )


SAME = lambda a, b: a == b  # noqa: E731


# ------------------------------------------------------------- P7/P9 kernel

def test_split_needs_min_gap_and_style_change():
    # two stacked rows, gap 30px, different styles -> split at prev+min_dist
    words = [(0, 0, 50, 10, "A", "xxxx"), (0, 40, 50, 50, "B", "yyyy")]
    x, y, ex, ey, st, wt, _ = _rows(words)
    splits = split_ys_by_spacing(50, y, ey, st, wt, SAME, 0, 200, 10)
    assert splits == [20.0]  # last occupied row 10 + min_dist 10
    # same style -> no split
    words2 = [(0, 0, 50, 10, "A", "xxxx"), (0, 40, 50, 50, "A", "yyyy")]
    x, y, ex, ey, st, wt, _ = _rows(words2)
    assert split_ys_by_spacing(50, y, ey, st, wt, SAME, 0, 200, 10) == []
    # gap below min_dist -> no split
    words3 = [(0, 0, 50, 10, "A", "xxxx"), (0, 15, 50, 25, "B", "yyyy")]
    x, y, ex, ey, st, wt, _ = _rows(words3)
    assert split_ys_by_spacing(25, y, ey, st, wt, SAME, 0, 200, 10) == []


def test_split_blocked_by_obstacle_rows():
    # a media box filling the gap -> rows occupied -> no split
    words = [(0, 0, 50, 10, "A", "xxxx"), (0, 40, 50, 50, "B", "yyyy")]
    x, y, ex, ey, st, wt, _ = _rows(words)
    o_y = np.array([12.0])
    o_ey = np.array([38.0])
    assert (
        split_ys_by_spacing(50, y, ey, st, wt, SAME, 0, 200, 10, o_y=o_y, o_ey=o_ey)
        == []
    )


def test_split_scan_range_respects_stop():
    # the gap qualifies only past end_y -> no split (P7's top-40% window)
    words = [(0, 0, 50, 10, "A", "xxxx"), (0, 60, 50, 70, "B", "yyyy")]
    x, y, ex, ey, st, wt, _ = _rows(words)
    assert split_ys_by_spacing(70, y, ey, st, wt, SAME, 0, 15, 10) == []


def test_split_dominating_style_is_letter_weighted():
    # style A dominates the working set by letter mass even though B appears
    words = [
        (0, 0, 80, 10, "A", "longlongword"),
        (90, 0, 99, 10, "B", "x"),
        (0, 40, 50, 50, "A", "same"),
    ]
    x, y, ex, ey, st, wt, _ = _rows(words)
    # over dominated by A, under is A -> same style, no split
    assert split_ys_by_spacing(50, y, ey, st, wt, SAME, 0, 200, 10) == []


# ----------------------------------------------------------------- B1 blocks

def test_blocks_split_by_whitespace_trail():
    # two word clusters sharing rows, separated by a whitespace rect blocker
    words = [
        (0, 0, 40, 10, "A", "left"),
        (0, 12, 40, 22, "A", "left"),
        (100, 0, 140, 10, "A", "right"),
        (100, 12, 140, 22, "A", "right"),
    ]
    x, y, ex, ey, st, wt, texts = _rows(words)
    blocker = [(45.0, -5.0, 95.0, 30.0)]
    blocks = find_blocks(x, y, ex, ey, texts, (0, 0, 140, 22), blocker)
    assert sorted(sorted(b) for b in blocks) == [[0, 1], [2, 3]]
    # without the blocker the row slabs connect everything
    blocks2 = find_blocks(x, y, ex, ey, texts, (0, 0, 140, 22), [])
    assert sorted(sorted(b) for b in blocks2) == [[0, 1, 2, 3]]


def test_blocks_connect_vertically_through_column_slabs():
    # stacked words with x-overlap but disjoint rows join via column slabs
    words = [(0, 0, 40, 10, "A", "top"), (10, 30, 50, 40, "A", "bottom")]
    x, y, ex, ey, st, wt, texts = _rows(words)
    blocks = find_blocks(x, y, ex, ey, texts, (0, 0, 50, 40), [])
    assert sorted(sorted(b) for b in blocks) == [[0, 1]]


def test_formula_pregrouping_requires_indent_and_score():
    assert math_score_exceeds(["x", "=", "1", "+", "2"])
    assert not math_score_exceeds(["plain", "words", "only", "here"])
    # indented mathy rows become one block separate from the body
    words = [
        (0, 0, 60, 10, "A", "body"),
        (0, 2, 70, 10, "A", "text"),
        (30, 30, 34, 40, "A", "x"),
        (40, 30, 44, 40, "A", "="),
        (50, 30, 54, 40, "A", "1"),
        (60, 30, 64, 40, "A", "+"),
        (70, 30, 74, 40, "A", "2"),
        (0, 60, 60, 70, "A", "body"),
    ]
    x, y, ex, ey, st, wt, texts = _rows(words)
    blocks = find_blocks(x, y, ex, ey, texts, (0, 0, 74, 70), [])
    formula_block = next(b for b in blocks if 2 in b)
    assert sorted(formula_block) == [2, 3, 4, 5, 6]


# ------------------------------------------------------------------ P2 roles

def test_media_roles():
    w = [
        # >=5 words inside box 2 (container)
        (105, 105, 115, 112, "A", "in1"),
        (120, 105, 130, 112, "A", "in2"),
        (135, 105, 145, 112, "A", "in3"),
        (105, 115, 115, 122, "A", "in4"),
        (120, 115, 130, 122, "A", "in5"),
        # mathy text around box 3 (math bar)
        (300, 195, 340, 203, "A", "x=1"),
        (300, 212, 340, 220, "A", "y+2"),
    ]
    x, y, ex, ey, st, wt, texts = _rows(w)
    roles = categorize_media(
        np.array([0, 100, 295, 400], dtype=np.float32),      # m_x
        np.array([50, 100, 205, 300], dtype=np.float32),     # m_y
        np.array([500, 80, 50, 30], dtype=np.float32),       # m_w
        np.array([4, 60, 3, 30], dtype=np.float32),          # m_h
        x, y, ex, ey, region_w=500.0, w_texts=texts,
    )
    assert roles == [MEDIA_HSEP, MEDIA_CONTAINER, MEDIA_MATH_BAR, MEDIA_IMAGE]
