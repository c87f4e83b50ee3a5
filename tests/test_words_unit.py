"""Unit tests for geometry, style lattice, and word segmentation semantics."""

import numpy as np
import pytest

from pdfextract_spark.oracle.geom import Rect, f32, is_within_variance
from pdfextract_spark.oracle.style import (
    BIG_DIFFERENCE,
    SAME_STYLE,
    SAME_STYLE_AND_BIG_TEXT,
    SPLIT,
    SUBTLE_DIFFERENCE,
    FORMULA,
    Style,
    style_compare,
)
from pdfextract_spark.oracle.words import (
    Glyph,
    approximate_char_spacing,
    create_words_in_line,
    estimate_boundary_cut,
    segment_words,
)


def g(text, x, *, y=0.0, w=10.0, h=10.0, baseline=0.0, style=None):
    return Glyph(
        text=text,
        style=style or Style("font", "", 10, 10),
        pos=Rect.make(x, y, w, h),
        baseline=f32(baseline),
    )


class TestGeom:
    def test_distance_zero_when_intersecting(self):
        a = Rect.make(0, 0, 10, 10)
        b = Rect.make(5, 5, 10, 10)
        assert a.distance(b) == 0.0

    def test_distance_x_gap(self):
        a = Rect.make(0, 0, 10, 10)
        b = Rect.make(13, 0, 10, 10)
        assert a.distance(b) == pytest.approx(3.0)

    def test_distance_diagonal(self):
        a = Rect.make(0, 0, 10, 10)
        b = Rect.make(13, 14, 10, 10)
        assert a.distance(b) == pytest.approx(5.0)

    def test_touching_rects_distance_zero(self):
        a = Rect.make(0, 0, 10, 10)
        b = Rect.make(10, 0, 10, 10)
        assert a.distance(b) == 0.0

    def test_union(self):
        a = Rect.make(0, 0, 10, 10)
        b = Rect.make(20, 5, 10, 10)
        u = a.union(b)
        assert (u.x, u.y, u.w, u.h) == (0.0, 0.0, 30.0, 15.0)

    def test_within_variance(self):
        assert is_within_variance(10.0, 12.0, 2.0)
        assert not is_within_variance(10.0, 12.1, 2.0)


class TestStyleCompare:
    def test_formula_splits(self):
        assert style_compare(FORMULA, Style("f", "", 10, 10)) == SPLIT

    def test_bold_big_difference(self):
        a, b = Style("f", "", 10, 10, bold=True), Style("f", "", 10, 10)
        assert style_compare(a, b) == BIG_DIFFERENCE

    def test_size_one_subtle(self):
        assert style_compare(Style("f", "", 10, 10), Style("f", "", 11, 11)) == SUBTLE_DIFFERENCE

    def test_big_text(self):
        assert style_compare(Style("f", "", 14, 14), Style("f", "", 14, 14)) == SAME_STYLE_AND_BIG_TEXT

    def test_same(self):
        assert style_compare(Style("f", "", 10, 10), Style("f", "", 10, 10)) == SAME_STYLE

    def test_math_fonts_same(self):
        a = Style("f", "", 10, 10, math_font=True)
        b = Style("g", "", 12, 12, math_font=True)
        assert style_compare(a, b) == SAME_STYLE


class TestCharSpacing:
    def test_legacy_average(self):
        # distances 1,1,4 -> maxBoundary = max(5, 2) = 5 -> mean of all = 2
        line = [g("a", 0), g("b", 11), g("c", 22), g("d", 36)]
        assert approximate_char_spacing(line) == pytest.approx(2.0)

    def test_single_glyph_zero(self):
        assert approximate_char_spacing([g("a", 0)]) == 0.0

    def test_cut_two_clusters(self):
        d = np.array([0.2, 0.25, 3.0, 0.22, 3.1], dtype=np.float32)
        cut = estimate_boundary_cut(d, np.float32(10.0))
        assert 0.25 < cut < 3.0

    def test_cut_no_boundary(self):
        d = np.array([0.2, 0.25, 0.22], dtype=np.float32)
        assert estimate_boundary_cut(d, np.float32(10.0)) == np.inf

    def test_cut_all_boundaries(self):
        d = np.array([3.0, 3.1, 2.9], dtype=np.float32)
        cut = estimate_boundary_cut(d, np.float32(10.0))
        assert cut < 2.9


class TestWordsInLine:
    def test_two_words_numeric(self):
        # 'ab cd': small intra gaps, one big gap
        line = [g("a", 0), g("b", 10.3), g("c", 25), g("d", 35.3)]
        words = create_words_in_line(line)
        assert [w.text for w in words] == ["ab", "cd"]

    def test_existing_spaces_win(self):
        line = [g("a", 0), g(" ", 10), g("b", 20)]
        words = create_words_in_line(line)
        assert [w.text for w in words] == ["a", "b"]

    def test_word_bbox_is_union(self):
        line = [g("a", 0), g("b", 10.2)]
        (w,) = create_words_in_line(line)
        assert w.pos.x == 0.0
        assert w.pos.end_x == pytest.approx(20.2)

    def test_single_word(self):
        line = [g("x", 0)]
        assert [w.text for w in create_words_in_line(line)] == ["x"]


class TestSegmentWords:
    def test_two_lines_by_baseline(self):
        # second line starts at left margin far from prev endX -> horizontal break
        l1 = [g("a", 100, baseline=10), g("b", 110.2, baseline=10)]
        l2 = [g("c", 0, baseline=30), g("d", 10.2, baseline=30)]
        words = segment_words(l1 + l2)
        assert [w.text for w in words] == ["ab", "cd"]

    def test_style_break_splits_line(self):
        bold = Style("font", "", 10, 10, bold=True)
        line = [g("a", 0), g("b", 10.2), g("c", 20.4, style=bold), g("d", 30.6, style=bold)]
        words = segment_words(line)
        assert [w.text for w in words] == ["ab", "cd"]

    def test_empty(self):
        assert segment_words([]) == []
