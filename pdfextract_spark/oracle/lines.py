"""Line segmentation (B3/B4/B8): words → lines.

Faithful to the reference's y-projection line segmentator (SURVEY.md §2.4 B3;
reference LineSegmentator.java:46-203):

- integer-y histogram: for each content, add int(width) to every integer row
  int(y)+0..int(height)-1
- boundaries: after text was seen, a row with count < LOOKAHEAD(2) is a
  boundary iff the next LOOKAHEAD-1 rows are all > LIMIT(1) — quirky but
  preserved verbatim (including the lookahead loop's early-false on <= LIMIT)
- line assignment: contents with y > start-1 and endY < stop+1, first
  boundary window wins; contents sorted by lower y first
- combineLines: a line with <4 words, same dominating style as the previous,
  height <= 0.7x previous, vertical gap <= 2 is merged up
- B4 in-line order: words sorted by x (stable)
- B8 dominating style: letter-count-weighted mode over word styles
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .geom import F32, Rect, f32
from .style import Style
from .words import Glyph

LIMIT = 1
LOOKAHEAD = 2


@dataclass
class Line:
    words: List[Glyph] = field(default_factory=list)

    @property
    def pos(self) -> Rect:
        p = self.words[0].pos
        for w in self.words[1:]:
            p = p.union(w.pos)
        return p

    def dominating_style(self) -> Style:
        """B8: letter-count-weighted mode (TextUtils.findDominatingStyle),
        overridden to FORMULA for mathy lines (LineNode.findDominatingStyle:
        64-71 — the override IS the method every consumer calls)."""
        from .blocks import math_score_exceeds
        from .style import FORMULA

        if math_score_exceeds([w.text for w in self.words]):
            return FORMULA
        weights: dict = {}
        order: dict = {}
        for i, w in enumerate(self.words):
            k = w.style
            weights[k] = weights.get(k, 0) + len(w.text)
            if k not in order:
                order[k] = i
        # highest weight wins; ties broken by first appearance
        return max(weights, key=lambda k: (weights[k], -order[k]))

    @property
    def text(self) -> str:
        return " ".join(w.text for w in self.words)


def find_line_boundaries(counts: np.ndarray) -> List[int]:
    """LineSegmentator.findLineBoundaries:170-203, verbatim semantics."""
    boundaries = [0]
    has_found_text = False
    n = len(counts)
    for i in range(n):
        if has_found_text and counts[i] < LOOKAHEAD:
            is_boundary = True
            j = i + 1
            while j < i + LOOKAHEAD and j < n:
                if counts[j] <= LIMIT:
                    is_boundary = False
                    break
                j += 1
            if is_boundary:
                boundaries.append(i + 1)
                has_found_text = False
        elif counts[i] > LIMIT:
            has_found_text = True
    boundaries.append(n)
    return boundaries


def create_lines(words: List[Glyph]) -> List[Line]:
    """LineSegmentator.createLinesFromBlocks:46-116 over one block of words."""
    if not words:
        return []

    min_y = min(int(w.pos.y) for w in words)
    max_y = max(int(w.pos.end_y) for w in words) + 1  # account for rounding
    counts = np.zeros(max_y - min_y, dtype=np.int64)
    for w in words:
        h = int(w.pos.h)
        start = int(w.pos.y)
        width = int(w.pos.w)
        counts[start - min_y : start - min_y + h] += width

    boundaries = find_line_boundaries(counts)
    ordered = sorted(words, key=lambda w: w.pos.y)  # Sorting.sortByLowerY, stable

    lines: List[Line] = []
    assigned = [False] * len(ordered)
    for bi in range(len(boundaries) - 1):
        start = min_y + boundaries[bi] - 1
        stop = min_y + boundaries[bi + 1]
        current: List[Glyph] = []
        for wi, w in enumerate(ordered):
            if assigned[wi]:
                continue
            if w.pos.y > start - 1 and w.pos.end_y < stop + 1:
                assigned[wi] = True
                current.append(w)
        if current:
            lines.append(Line(words=current))

    _combine_lines(lines)
    for line in lines:
        line.words.sort(key=lambda w: w.pos.x)  # B4 in-line order (stable)
    return lines


def _vertical_distance(a: Rect, b: Rect) -> np.float32:
    """Vertical gap between two rects (getVerticalDistanceTo analog)."""
    if b.y >= a.end_y:
        return f32(b.y - a.end_y)
    if a.y >= b.end_y:
        return f32(a.y - b.end_y)
    return F32(0.0)


def _combine_lines(lines: List[Line]) -> None:
    """LineSegmentator.combineLines:137-167 (in place)."""
    i = 1
    while i < len(lines):
        last, cur = lines[i - 1], lines[i]
        if (
            len(cur.words) < 4
            and cur.dominating_style() == last.dominating_style()
            and cur.pos.h <= f32(F32(0.7) * last.pos.h)
            and _vertical_distance(last.pos, cur.pos) <= F32(2.0)
        ):
            last.words.extend(cur.words)
            del lines[i]
        else:
            i += 1
