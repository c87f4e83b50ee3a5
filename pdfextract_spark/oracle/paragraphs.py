"""Region stats (P10) + paragraph segmentation (B5).

Faithful to the reference (SURVEY.md §2.3 P10, §2.4 B5):

- avg font size: char-length-weighted mean of style sizes
  (PhysicalPageRegion.findAndSetFontInformation:327-353)
- modal vertical gap: 3-ray vertical slab scan, integer histogram of
  below.y - current.endY gaps, argmax over i>=2 (ties -> later index),
  clamped to >= int(0.5*avgFontY), then +max(1, 10%)
  (findAndSetMedianOfVerticalDistancesForRegion:361-398)
- paragraph split lattice over (style difference, line gap) —
  ParagraphSegmentator.segmentParagraphsByStyleAndDistance:52-179
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import numpy as np

from .geom import F32, Rect, f32
from .lines import Line
from .style import (
    BIG_DIFFERENCE,
    SAME_STYLE,
    SAME_STYLE_AND_BIG_TEXT,
    SPLIT,
    SUBTLE_DIFFERENCE,
    Style,
    style_compare,
)
from .words import Glyph


def avg_font_sizes(words: List[Glyph]) -> tuple:
    """Char-weighted mean (x, y) font size; Float.MIN_VALUE analog if empty."""
    x_sum = 0.0
    y_sum = 0.0
    n = 0
    for w in words:
        length = len(w.text)
        x_sum += w.style.x_size * length
        y_sum += w.style.y_size * length
        n += length
    if n == 0:
        tiny = float(np.finfo(np.float32).tiny)
        return tiny, tiny
    return f32(x_sum / n), f32(y_sum / n)


def modal_vertical_spacing(words: List[Glyph], region: Rect) -> int:
    """P10 modal gap along 3 vertical rays (int result)."""
    _, avg_y = avg_font_sizes(words)
    limit = int(avg_y) * 3
    if limit <= 0:
        limit = 1
    hist = np.zeros(limit, dtype=np.int64)

    x = float(region.x)
    step = float(region.w) / 3.0
    if step <= 0.0:
        step = 1.0
    while x <= float(region.end_x):
        ix = int(x)
        slab = Rect.make(float(ix), float(region.y), 1.0, float(region.h))
        column = [w for w in words if slab.intersects(w.pos)]
        column.sort(key=lambda w: w.pos.y)
        for i in range(1, len(column)):
            d = int(column[i].pos.y - column[i - 1].pos.end_y)
            if 0 < d < limit:
                hist[d] += 1
        x += step

    highest = -1
    index = -1
    for i in range(2, limit):
        if hist[i] >= highest:
            index = i
            highest = int(hist[i])

    temp = float(max(index, int(float(avg_y) * 0.5)))
    return int(temp + max(1.0, temp * 0.1))


@dataclass
class Paragraph:
    lines: List[Line] = field(default_factory=list)
    region: int = field(default=0, compare=False)  # leaf-region order on page
    role: str = field(default="text", compare=False)  # L4-L6 refinement
    block: int = field(default=0, compare=False)  # B1 block rank within region

    @property
    def pos(self) -> Rect:
        p = self.lines[0].pos
        for l in self.lines[1:]:
            p = p.union(l.pos)
        return p


def segment_paragraphs(lines: List[Line], median_vertical_spacing: int) -> List[Paragraph]:
    """B5 (ParagraphSegmentator.segmentParagraphsByStyleAndDistance)."""
    if not lines:
        return []
    ret: List[Paragraph] = []
    current = Paragraph()
    current_style: Style = None
    last_line: Line = None

    for line in lines:
        line_style = line.dominating_style()
        if current_style is None:
            current_style = line_style
            last_line = line

        distance = f32(line.pos.y - last_line.pos.end_y)
        cmp = style_compare(current_style, line_style)

        if cmp == SPLIT:
            split = True
        elif cmp == SAME_STYLE_AND_BIG_TEXT:
            split = False
        elif cmp == SAME_STYLE:
            split = bool(distance > F32(median_vertical_spacing * 1.5))
        elif cmp == SUBTLE_DIFFERENCE:
            found = any(w.style == current_style for w in line.words)
            if found:
                split = bool(distance > F32(median_vertical_spacing * 1.5))
            else:
                split = bool(distance > F32(median_vertical_spacing * 1.1))
        else:  # BIG_DIFFERENCE
            found = any(w.style == current_style for w in line.words)
            split = not found

        if split:
            if current.lines:
                ret.append(current)
            current = Paragraph()
            current_style = line_style

        current.lines.append(line)
        last_line = line

    if current.lines:
        ret.append(current)
    return ret
