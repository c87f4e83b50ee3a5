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
from .logical import (
    extract_abstract,
    extract_title,
    find_body_style,
    find_header_candidates,
    recognize_divs,
    remove_page_numbers,
    tag_footnotes,
)
from .blocks import find_blocks
from .paragraphs import Paragraph, avg_font_sizes, modal_vertical_spacing, segment_paragraphs
from .regions import MEDIA_HSEP, analyze_page_regions, categorize_media_combined
from .scanfilters import apply_scan_filters
from .style import Style
from .words import Glyph, segment_words


@dataclass(frozen=True)
class OutSpan:
    seq: int
    kind: str
    text: str
    media_ref: str
    offset: int
    # structural fields (round-3): the physical-tree position the engine
    # computed, carried through so sinks can nest <page><paragraph><line>
    # like SimpleXMLOutput.java:77-242 instead of discarding the hierarchy.
    # page=-1 marks front matter (title/abstract, relocated ahead of the
    # page stream by the flat emission contract); para is the page-local
    # paragraph id (media pseudo-paragraphs use 1_000_000+media_index);
    # style_ref is the line's B8 dominating style id ('' for media rows).
    page: int = -1
    para: int = -1
    style_ref: str = ""
    # VERBOSE word boxes (round-4): per-word (value, style_ref, x, y, w, h)
    # for line-kind spans, the writeWord analog (SimpleXMLOutput.java:103-134,
    # 226-242). Geometry is integer-rounded AT EMISSION (in Python, from the
    # bit-identical float32 word table both implementations share) so the
    # XML sinks never format floats — cross-engine float *formatting* is not
    # deterministic, integer attributes are. () unless emit_words was set:
    # the payload costs Arrow width, so the flagship path never carries it.
    words: tuple = ()


def _line_words(line: Line) -> tuple:
    """writeWord payload for one line: (value, style_ref, x, y, w, h) per
    word, geometry rounded to ints (round-half-even on the shared float32
    values — identical in oracle and engine by construction)."""
    return tuple(
        (
            w.text,
            w.style.style_id,
            int(round(float(w.pos.x))),
            int(round(float(w.pos.y))),
            int(round(float(w.pos.w))),
            int(round(float(w.pos.h))),
        )
        for w in line.words
    )


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


def _same_style(a: Style, b: Style) -> bool:
    from .style import SAME_STYLE, style_compare

    return style_compare(a, b) == SAME_STYLE


def _analyze_page(
    page_words: List[Glyph], page_media: List[MediaBox], page_height: float = 800.0
):
    """Geometric page analysis: P2 media roles -> P7 top split -> P8
    separator bands -> P3-P5 column division -> P9 band re-split ->
    per-region B3 lines + B5 paragraphs.
    Returns (paragraphs tagged with region order, leaf-region bounds,
    per-region block (y0, y1) lists, per-media caption Line lists)."""
    captions: Dict[int, List] = {}
    if not page_words:
        return [], [], [], captions

    wx = np.array([w.pos.x for w in page_words], dtype=np.float32)
    wy = np.array([w.pos.y for w in page_words], dtype=np.float32)
    wex = np.array([w.pos.end_x for w in page_words], dtype=np.float32)
    wey = np.array([w.pos.end_y for w in page_words], dtype=np.float32)

    # P2: media roles; P1 graphical-region extraction — text fully inside a
    # CONTAINER graphic leaves the page flow and becomes that graphic's own
    # (caption) lines, re-attached at emission (B7)
    hsep_ys: List[float] = []
    roles: List[str] = []
    synth_hseps: List[tuple] = []
    if page_media:
        roles, synth_hseps = categorize_media_combined(
            np.array([m.x for m in page_media], dtype=np.float32),
            np.array([m.y for m in page_media], dtype=np.float32),
            np.array([m.w for m in page_media], dtype=np.float32),
            np.array([m.h for m in page_media], dtype=np.float32),
            wx, wy, wex, wey, region_w=float(wex.max() - wx.min()),
            w_texts=[w.text for w in page_words],
        )
        from .regions import MEDIA_CONTAINER

        pulled = np.zeros(len(page_words), dtype=bool)
        for mi, (m, role) in enumerate(zip(page_media, roles)):
            if role != MEDIA_CONTAINER:
                continue
            inside = (
                (wx >= m.x) & (wex <= m.x + m.w) & (wy >= m.y) & (wey <= m.y + m.h)
                & ~pulled
            )
            if not bool(inside.any()):
                continue
            pulled |= inside
            captions[mi] = create_lines(
                [page_words[i] for i in np.nonzero(inside)[0]]
            )
        if bool(pulled.any()):
            page_words = [w for w, p in zip(page_words, pulled) if not p]
            if not page_words:
                return [], [], [], captions
            wx = np.array([w.pos.x for w in page_words], dtype=np.float32)
            wy = np.array([w.pos.y for w in page_words], dtype=np.float32)
            wex = np.array([w.pos.end_x for w in page_words], dtype=np.float32)
            wey = np.array([w.pos.end_y for w in page_words], dtype=np.float32)

    x0, y0 = float(wx.min()), float(wy.min())
    x1, y1 = float(wex.max()), float(wey.max())

    # P10 stats drive the whitespace-cover minimum dimensions
    avg_x, _avg_y = avg_font_sizes(page_words)
    min_col = 0.8 * float(avg_x)                      # minColumnSpacing
    page_rect = Rect.make(x0, y0, x1 - x0, y1 - y0)
    mvs_page = modal_vertical_spacing(page_words, page_rect)
    min_row = 1.1 * float(mvs_page)                   # minRowSpacing

    # qualifying HSEPs (cutting no words) split bands (P8); a combined stack
    # that still qualifies contributes ONE synthetic merged separator in
    # place of its members (reference removeAll + re-add)
    if page_media:
        for m, role in zip(page_media, roles):
            if role != MEDIA_HSEP:
                continue
            sep_y = m.y + m.h / 2.0
            if not bool(np.any((wy < sep_y) & (wey > sep_y))):
                hsep_ys.append(sep_y)
        for (_bx, by, _bex, bey) in synth_hseps:
            sep_y = (by + bey) / 2.0
            if not bool(np.any((wy < sep_y) & (wey > sep_y))):
                hsep_ys.append(sep_y)

    wtl = np.array([len(w.text) for w in page_words], dtype=np.int64)
    media_obs = None
    if page_media:
        mx = np.array([m.x for m in page_media], dtype=np.float32)
        my = np.array([m.y for m in page_media], dtype=np.float32)
        mex = np.array([m.x + m.w for m in page_media], dtype=np.float32)
        mey = np.array([m.y + m.h for m in page_media], dtype=np.float32)
        media_obs = (mx, my, mex, mey)
    regions = analyze_page_regions(
        (x0, y0, x1, y1), wx, wy, wex, wey, wtl, hsep_ys, min_col, min_row,
        media_obs=media_obs,
        style_info=(
            [w.style for w in page_words],
            [len(w.text) for w in page_words],
            _same_style,
        ),
        page_dims=(0.0, float(page_height)),
    )

    paragraphs: List[Paragraph] = []
    bounds = []
    block_bounds: List[List[Tuple[float, float]]] = []  # per region: (y0, y1)
    for ri, reg in enumerate(regions):
        reg_words = [page_words[i] for i in reg.word_idx]
        # B1/B2: block grouping; leaf whitespace + media boxes block trails.
        # MATH_BAR-roled boxes additionally join the B2 scan (containedGraphics
        # bonus, Formulas.java:83-103)
        blockers = list(reg.whitespace)
        math_bars = []
        for mi2, m in enumerate(page_media):
            if (
                m.x < reg.bound[2] and m.x + m.w > reg.bound[0]
                and m.y < reg.bound[3] and m.y + m.h > reg.bound[1]
            ):
                blockers.append((m.x, m.y, m.x + m.w, m.y + m.h))
                if roles and roles[mi2] == "math_bar":
                    math_bars.append((m.x, m.y, m.x + m.w, m.y + m.h))
        blocks = find_blocks(
            np.array([w.pos.x for w in reg_words], dtype=np.float32),
            np.array([w.pos.y for w in reg_words], dtype=np.float32),
            np.array([w.pos.end_x for w in reg_words], dtype=np.float32),
            np.array([w.pos.end_y for w in reg_words], dtype=np.float32),
            [w.text for w in reg_words],
            reg.bound,
            blockers,
            math_bars=math_bars,
        )
        block_lines = [create_lines([reg_words[i] for i in blk]) for blk in blocks]
        all_lines = [l for lines in block_lines for l in lines]
        if not all_lines:
            continue
        rpos = all_lines[0].pos
        for l in all_lines[1:]:
            rpos = rpos.union(l.pos)
        all_words = [w for l in all_lines for w in l.words]
        mvs = modal_vertical_spacing(all_words, rpos)
        bb: List[Tuple[float, float]] = []
        for b_rank, lines in enumerate(block_lines):
            if not lines:
                continue
            paras = segment_paragraphs(lines, mvs)
            for para in paras:
                para.region = len(bounds)
                para.block = len(bb)
            by = [w.pos.y for l in lines for w in l.words]
            bey = [w.pos.end_y for l in lines for w in l.words]
            bb.append((min(by), max(bey)))
            paragraphs.extend(paras)
        bounds.append(reg.bound)
        block_bounds.append(bb)
    # logical ops (L2 title-first, L5 abstract delete-preceding) treat the
    # page paragraph LIST as reading order — restore it after block-major
    # construction (stable: block order breaks y ties)
    paragraphs.sort(key=lambda para: (para.region, float(para.pos.y)))
    return paragraphs, bounds, block_bounds, captions


def _media_region(m: MediaBox, bounds) -> int:
    """Region order index for a media box: max overlap AREA with the region
    bound (x-overlap alone mis-binds media to the first of several stacked
    full-width bands); regions rarely overlap the media at all (it sits in
    the gap between bands), so zero-area ties fall back to the smallest
    vertical distance. Ties -> first region."""
    if not bounds:
        return 0
    cx0, cx1 = m.x, m.x + m.w
    cy0, cy1 = m.y, m.y + m.h
    best, best_key = 0, None
    for i, (bx0, by0, bx1, by1) in enumerate(bounds):
        ovx = max(0.0, min(cx1, bx1) - max(cx0, bx0))
        ovy = max(0.0, min(cy1, by1) - max(cy0, by0))
        ydist = max(by0 - cy1, cy0 - by1, 0.0)
        key = (-(ovx * ovy), ydist, -ovx)
        if best_key is None or key < best_key:
            best, best_key = i, key
    return best


def _para_offset(p: Paragraph) -> int:
    return min(_line_offset(l) for l in p.lines)


def extract_document(
    doc_id: str,
    kinds: Sequence[str],
    texts: Sequence[str],
    media_refs: Sequence[str],
    offsets: Sequence[int],
    cfg: EngineConfig = CONFIG,
    emit_words: bool = False,
) -> List[OutSpan]:
    # spans must be processed in offset order
    order = np.argsort(np.asarray(offsets, dtype=np.int64), kind="stable")
    kinds = [kinds[i] for i in order]
    texts = [texts[i] for i in order]
    media_refs = [media_refs[i] for i in order]
    offsets = [int(offsets[i]) for i in order]

    table, media, styles = layout_document(doc_id, kinds, texts, media_refs, offsets, cfg)
    table = apply_scan_filters(table, styles, cfg)

    n_pages = int(table.page.max()) + 1 if len(table) else 0
    n_pages = max(n_pages, (max((m.page for m in media), default=-1) + 1))

    # geometric analysis per page
    pages: List[List[Paragraph]] = []
    media_by_page: Dict[int, List[MediaBox]] = {}
    for m in media:
        media_by_page.setdefault(m.page, []).append(m)

    page_regions: List[List] = []  # leaf-region bounds per page (for media)
    page_blocks: List[List] = []   # per page, per region: block (y0, y1) list
    page_captions: List[Dict[int, List]] = []  # per page: media idx -> lines
    for p in range(n_pages):
        page_words = segment_words(_glyphs_for_page(table, table.page == p, styles))
        paragraphs, regions, blocks, captions = _analyze_page(
            page_words, media_by_page.get(p, []), page_height=cfg.page_height
        )
        pages.append(paragraphs)
        page_regions.append(regions)
        page_blocks.append(blocks)
        page_captions.append(captions)

    # logical analysis (document level) — reference pipeline order
    # (LogicalAnalysis.java:36-54): metadata -> title -> page numbers ->
    # footnotes -> abstract -> divs
    body = find_body_style(pages, styles)
    header_candidates = find_header_candidates(pages, body)
    title = extract_title(pages, header_candidates)
    remove_page_numbers(pages, cfg.page_height)
    tag_footnotes(pages, body)
    abstract = extract_abstract(pages)
    recognize_divs(pages, header_candidates, body)

    # assemble reading order: per page, paragraphs (y-ordered) interleaved
    # with the page's media boxes by top-y; title first
    out: List[OutSpan] = []
    seq = 0
    front_para = 0
    def _words_of(line: Line) -> tuple:
        return _line_words(line) if emit_words else ()

    if title is not None:
        for line in title.lines:
            out.append(OutSpan(seq, "title", line.text, "", _line_offset(line),
                               page=-1, para=front_para,
                               style_ref=line.dominating_style().style_id,
                               words=_words_of(line)))
            seq += 1
        front_para += 1
    for p_abs in abstract:
        for line in p_abs.lines:
            out.append(OutSpan(seq, "abstract", line.text, "", _line_offset(line),
                               page=-1, para=front_para,
                               style_ref=line.dominating_style().style_id,
                               words=_words_of(line)))
            seq += 1
        front_para += 1

    for p in range(n_pages):
        # B6: the output span stream is ordered at LINE granularity within
        # each region — (region, line y, paragraph, line). Paragraph grouping
        # still carries the logical roles; stacked blocks emit identically to
        # block-major order, while a block that vertically SURROUNDS another
        # (body text around a display formula) still interleaves in reading
        # order, which strict block-major would violate.
        items: List[Tuple[int, float, int, int, str, object, object]] = []
        for pi, para in enumerate(pages[p]):
            for li, line in enumerate(para.lines):
                items.append(
                    (para.region, float(line.pos.y), pi, li, "line", line, para)
                )
        for mi, m in enumerate(media_by_page.get(p, [])):
            r = _media_region(m, page_regions[p])
            items.append((r, float(m.y), 1_000_000 + mi, 0, "media", m, None))
            # B7: caption lines re-attach right after their media span
            for li, line in enumerate(page_captions[p].get(mi, [])):
                items.append(
                    (r, float(m.y), 1_000_000 + mi, 1 + li, "line", line,
                     Paragraph(lines=[line]))
                )
        items.sort(key=lambda t: (t[0], t[1], t[2], t[3]))
        for _, _, pi, _, kind, obj, para in items:
            if kind == "line":
                role = para.role
                if role == "text" and obj.dominating_style().sentinel == "FORMULA":
                    role = "formula"
                out.append(OutSpan(seq, role, obj.text, "", _line_offset(obj),
                                   page=p, para=pi,
                                   style_ref=obj.dominating_style().style_id,
                                   words=_words_of(obj)))
                seq += 1
            else:
                out.append(OutSpan(seq, "media", "", obj.media_ref, obj.offset,
                                   page=p, para=pi))
                seq += 1
    return out
