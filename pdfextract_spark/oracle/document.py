"""Single-document extraction pipeline (the oracle).

Sequential reference implementation: interleaved spans → positioned glyphs
(shared tokenizer) → per-page word segmentation (W1-W3) → line segmentation
(B3/B4) → region stats (P10) → paragraph segmentation (B5) → media
interleaving (B7-lite: one media paragraph per media box, ordered by y within
its page) → logical ops (L1-L3) → ordered output spans.

Output: one span per line, kind ∈ {'text','title','media'}; page numbers
removed per L3. ``offset`` is the smallest originating input offset of the
span; ``seq`` is the 0-based reading order.

Pipeline order mirrors the reference lifecycle (SURVEY.md §3;
GeometricAnalysis.analyzeDocument → PageSegmentator.analyzePage →
LogicalAnalysis.analyzeDocument).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..config import CONFIG, EngineConfig
from ..layout import CharTable, MediaBox, layout_document
from .geom import Rect, f32
from .lines import Line, create_lines
from .logical import extract_title, find_body_style, find_header_candidates, remove_page_numbers
from .paragraphs import Paragraph, modal_vertical_spacing, segment_paragraphs
from .style import Style
from .words import Glyph, segment_words


@dataclass(frozen=True)
class OutSpan:
    seq: int
    kind: str
    text: str
    media_ref: str
    offset: int


def _glyphs_for_page(table: CharTable, mask: np.ndarray, styles: List[Style]) -> List[Glyph]:
    idx = np.nonzero(mask)[0]
    return [
        Glyph(
            text=table.char[i],
            style=styles[int(table.style_idx[i])],
            pos=Rect(table.x[i], table.y[i], table.w[i], table.h[i]),
            baseline=table.baseline[i],
            origin=int(table.offset[i]),
        )
        for i in idx
    ]


def _line_offset(line: Line) -> int:
    return min(w.origin for w in line.words)


def _para_offset(p: Paragraph) -> int:
    return min(_line_offset(l) for l in p.lines)


def extract_document(
    doc_id: str,
    kinds: Sequence[str],
    texts: Sequence[str],
    media_refs: Sequence[str],
    offsets: Sequence[int],
    cfg: EngineConfig = CONFIG,
) -> List[OutSpan]:
    # spans must be processed in offset order
    order = np.argsort(np.asarray(offsets, dtype=np.int64), kind="stable")
    kinds = [kinds[i] for i in order]
    texts = [texts[i] for i in order]
    media_refs = [media_refs[i] for i in order]
    offsets = [int(offsets[i]) for i in order]

    table, media, styles = layout_document(doc_id, kinds, texts, media_refs, offsets, cfg)

    n_pages = int(table.page.max()) + 1 if len(table) else 0
    n_pages = max(n_pages, (max((m.page for m in media), default=-1) + 1))

    # geometric analysis per page
    pages: List[List[Paragraph]] = []
    media_by_page: Dict[int, List[MediaBox]] = {}
    for m in media:
        media_by_page.setdefault(m.page, []).append(m)

    for p in range(n_pages):
        page_words = segment_words(_glyphs_for_page(table, table.page == p, styles))
        lines = create_lines(page_words)
        if lines:
            region = lines[0].pos
            for l in lines[1:]:
                region = region.union(l.pos)
            all_words = [w for l in lines for w in l.words]
            mvs = modal_vertical_spacing(all_words, region)
            paragraphs = segment_paragraphs(lines, mvs)
        else:
            paragraphs = []
        pages.append(paragraphs)

    # logical analysis (document level)
    body = find_body_style(pages, styles)
    header_candidates = find_header_candidates(pages, body)
    title = extract_title(pages, header_candidates)
    remove_page_numbers(pages, cfg.page_height)

    # assemble reading order: per page, paragraphs (y-ordered) interleaved
    # with the page's media boxes by top-y; title first
    out: List[OutSpan] = []
    seq = 0
    if title is not None:
        for line in title.lines:
            out.append(OutSpan(seq, "title", line.text, "", _line_offset(line)))
            seq += 1

    for p in range(n_pages):
        items: List[Tuple[float, int, str, object]] = []
        for pi, para in enumerate(pages[p]):
            items.append((float(para.pos.y), pi, "para", para))
        for mi, m in enumerate(media_by_page.get(p, [])):
            items.append((float(m.y), 1_000_000 + mi, "media", m))
        items.sort(key=lambda t: (t[0], t[1]))
        for _, _, kind, obj in items:
            if kind == "para":
                for line in obj.lines:
                    out.append(OutSpan(seq, "text", line.text, "", _line_offset(line)))
                    seq += 1
            else:
                out.append(OutSpan(seq, "media", "", obj.media_ref, obj.offset))
                seq += 1
    return out
