"""Logical document-level operators (L1-L3 in round 1).

Faithful to the reference's logical pipeline (SURVEY.md §2.5; reference
LogicalAnalysis.java:36-54 order: metadata → ExtractTitle → RemovePageNumbers).

- L1 metadata (DocumentMetadata.java:47-162): style → char-count histogram
  over words; bodyText = argmax (first-max in style-dim order); header
  candidates = line styles != body with xSize >= body.xSize, or "line id"
  shaped (short first word starting digit/./abcdABCI, font differs, bigger)
- L2 title (ExtractTitle.java:43-74): first paragraph on page 1 whose style
  is a header candidate; merge the next paragraph when same style unless
  it is the last; removed from flow and emitted as kind='title'
- L3 page numbers (RemovePageNumbers.java:48-138): per page single-line
  all-digit paragraphs in the bottom 15%; need candidates on >= max(1, n/2)
  pages; mode style; singletons removed
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from .lines import Line
from .paragraphs import Paragraph
from .style import Style
from .words import Glyph


def _weighted_style(words: List[Glyph]) -> Style:
    weights: dict = {}
    order: dict = {}
    for i, w in enumerate(words):
        k = w.style
        weights[k] = weights.get(k, 0) + len(w.text)
        if k not in order:
            order[k] = i
    return max(weights, key=lambda k: (weights[k], -order[k]))


def paragraph_style(p: Paragraph) -> Style:
    return _weighted_style([w for l in p.lines for w in l.words])


def find_body_style(pages: List[List[Paragraph]], styles: List[Style]) -> Style:
    counts: Dict[Style, int] = {s: 0 for s in styles}
    for page in pages:
        for p in page:
            for l in p.lines:
                for w in l.words:
                    if w.style in counts:
                        counts[w.style] += len(w.text)
    body = styles[0] if styles else None
    max_count = -1
    for s in styles:  # deterministic dim order (reference iterates a HashMap)
        if counts[s] > max_count:
            max_count = counts[s]
            body = s
    return body


def _can_be_line_id(line: Line, body: Style) -> bool:
    st = line.dominating_style()
    if body.font_name == st.font_name or body.x_size >= st.x_size:
        return False
    first_word = line.text.strip().split()[0] if line.text.strip() else ""
    if len(first_word) > 3 or not first_word:
        return False
    c = first_word[0]
    return c.isdigit() or "." in first_word or c in "abcdABCI"


def find_header_candidates(pages: List[List[Paragraph]], body: Style) -> List[Style]:
    candidates: List[Style] = []
    for page in pages:
        for p in page:
            for line in p.lines:
                st = line.dominating_style()
                if st in candidates or st == body:
                    continue
                if st.x_size >= body.x_size or _can_be_line_id(line, body):
                    candidates.append(st)
    return candidates


def extract_title(
    pages: List[List[Paragraph]], header_candidates: List[Style]
) -> Optional[Paragraph]:
    """L2: mutates pages[0]; returns the title paragraph if found."""
    if not pages or not pages[0]:
        return None
    first = pages[0]
    for i, p in enumerate(first):
        if paragraph_style(p) in header_candidates:
            # merge next same-style paragraph unless it is the last (quirk)
            if i + 1 != len(first) - 1 and i + 1 < len(first):
                nxt = first[i + 1]
                if paragraph_style(nxt) == paragraph_style(p):
                    p.lines.extend(nxt.lines)
                    first.remove(nxt)
            first.remove(p)
            return p
    return None


def remove_page_numbers(pages: List[List[Paragraph]], page_end_y: float) -> List[Paragraph]:
    """L3: mutates pages in place; returns removed paragraphs."""
    pot_per_page: List[Tuple[List[Paragraph], List[Paragraph]]] = []
    all_pot: List[Paragraph] = []
    for page in pages:
        current: List[Paragraph] = []
        for p in page:
            if len(p.lines) != 1:
                continue
            if p.pos.y < page_end_y * 0.85:
                continue
            text = " ".join(l.text for l in p.lines).strip()
            if text and all(ch.isdigit() for ch in text):
                current.append(p)
        if current:
            pot_per_page.append((page, current))
            all_pot.extend(current)

    if len(pot_per_page) < max(1, len(pages) // 2):
        return []

    mode_style = _weighted_style([w for p in all_pot for l in p.lines for w in l.words])
    removed: List[Paragraph] = []
    for page, candidates in pot_per_page:
        matching = [p for p in candidates if paragraph_style(p) == mode_style]
        if len(matching) != 1:
            continue
        page.remove(matching[0])
        removed.append(matching[0])
    return removed
