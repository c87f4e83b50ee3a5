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


def tag_footnotes(pages: List[List[Paragraph]], body: Style) -> None:
    """L4 (ExtractFootnotes.java:33-47): paragraphs styled smaller than the
    body text whose first word starts with a digit or '*' become footnotes."""
    for page in pages:
        for p in page:
            st = paragraph_style(p)
            if st.x_size >= body.x_size:
                continue
            text = p.lines[0].text.strip() if p.lines else ""
            first = text.split()[0] if text else ""
            if first and (first[0].isdigit() or first[0] == "*"):
                p.role = "footnote"


def extract_abstract(pages: List[List[Paragraph]]) -> List[Paragraph]:
    """L5 (ExtractAbstractAndRemovePreceedingText.java:49-103): the page-1
    paragraph titled 'abstract' plus following same-style paragraphs become
    the document abstract; content preceding it on page 1 is dropped.
    Mutates pages; returns the abstract paragraphs ([] if none)."""
    if not pages or not pages[0]:
        return []
    first = pages[0]
    for i, p in enumerate(first):
        text = (p.lines[0].text.strip().lower() if p.lines else "")
        if not text.startswith("abstract"):
            continue
        st = paragraph_style(p)
        absorbed = [p]
        j = i + 1
        while j < len(first) and paragraph_style(first[j]) == st:
            absorbed.append(first[j])
            j += 1
        # delete preceding content + the absorbed paragraphs from the flow
        del first[:j]
        for a in absorbed:
            a.role = "abstract"
        return absorbed
    return []


def recognize_divs(
    pages: List[List[Paragraph]], header_candidates: List[Style], body: Style
) -> None:
    """L6 (RecognizeDivs.java:43-115): the first 3 distinct header-candidate
    styles seen on digit-leading paragraphs define DIV1-3; every digit-leading
    paragraph with one of those styles is tagged heading{1..3}."""
    div_styles: List[Style] = []
    for page in pages:
        for p in page:
            text = p.lines[0].text.strip() if p.lines else ""
            first = text.split()[0] if text else ""
            if not first or not first[0].isdigit():
                continue
            st = paragraph_style(p)
            if st == body or st not in header_candidates:
                continue
            if st not in div_styles:
                if len(div_styles) >= 3:
                    continue
                div_styles.append(st)
            p.role = f"heading{div_styles.index(st) + 1}"


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
