"""Synthetic-geometry tokenizer (S4-analog).

The input table carries no geometry — only ordered interleaved spans
(kind, text, media_ref, offset). This module deterministically lays every
text span out into positioned float32 glyphs (and media spans into positioned
boxes), replicating what the reference's glyph decoder produces from a PDF
content stream (SURVEY.md §2.1 S4; reference PDFBoxIntegration.processEncodedText).

The function is PURE: geometry depends only on (doc_id, spans) and the engine
config. Both the sequential oracle and the distributed Spark pipeline call
this same code, so span-sequence equality tests exercise the *analysis*
stages, not the tokenizer.

Layout model (all float32):
- pages of page_width x page_height with a margin; cursor flows top-down
- every text span starts a new visual line; spans flagged by the seeded
  per-span draw get an extra paragraph gap before them
- per-doc style dim (body/heading/small) derived from a seeded RNG; the first
  text span gets the heading style (title analog); short all-digit spans are
  page-number analogs pinned to the page's bottom zone
- word gaps are 0.28-0.36 x fontsize; intra-word kerning jitter is
  +-0.05 x fontsize, so the two gap clusters are cleanly separated (mirrors
  the .spacing corpus distributions)
- media spans consume a block of vertical space and emit one media box
"""

from __future__ import annotations

import hashlib
import re
import unicodedata
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .config import CONFIG, EngineConfig
from .oracle.style import Style

F32 = np.float32


@dataclass
class CharTable:
    """Columnar per-document glyph table (float32 geometry)."""

    page: np.ndarray        # int32
    x: np.ndarray           # float32
    y: np.ndarray           # float32
    w: np.ndarray           # float32
    h: np.ndarray           # float32
    baseline: np.ndarray    # float32
    style_idx: np.ndarray   # int32 -> styles list
    char: List[str]         # 1-char strings (may include " "; S7 merges
                            # combining marks into base+mark strings)
    offset: np.ndarray      # int32 originating input-span offset
    rot: np.ndarray         # int16 glyph direction in degrees (S10 input)

    def __len__(self) -> int:
        return len(self.char)


@dataclass
class MediaBox:
    page: int
    x: float
    y: float
    w: float
    h: float
    media_ref: str
    offset: int


def doc_seed(doc_id: str) -> int:
    """Stable 64-bit seed from doc_id (independent of PYTHONHASHSEED)."""
    return int.from_bytes(hashlib.blake2b(doc_id.encode("utf-8"), digest_size=8).digest(), "big")


def doc_styles(doc_id: str) -> List[Style]:
    """Per-document style dim: [body, heading/h1, small, h2]."""
    rng = np.random.Generator(np.random.PCG64(doc_seed(doc_id) ^ 0x5717E5))
    body_size = int(10 + rng.integers(0, 3))            # 10..12
    return [
        Style("Times", "", body_size, body_size),
        Style("Times-Bold", "", body_size + 4, body_size + 4, bold=True),
        Style("Times", "", body_size - 2, body_size - 2),
        Style("Times-Bold", "", body_size + 2, body_size + 2, bold=True),
        Style("Garbled", "", body_size, body_size),
    ]


BODY, HEADING, SMALL, H2, GARBLED = 0, 1, 2, 3, 4


def _control_ratio(text: str) -> float:
    if not text:
        return 0.0
    ctrl = sum(1 for c in text if c < " " or "\x7f" <= c <= "\x9f")
    return ctrl / len(text)


def _is_formula_text(words) -> bool:
    from .oracle.blocks import math_score_exceeds

    return math_score_exceeds(words)

_HEADING_RE = re.compile(r"^\d+(\.\d+)* [A-Z]")
_FOOTNOTE_RE = re.compile(r"^\d+ [a-z]")


def _is_pagenum_text(text: str) -> bool:
    return 0 < len(text) <= 4 and text.isdigit()


def is_two_col(doc_id: str) -> bool:
    """Whether layout_document flows this doc in two columns (same first rng
    draw as layout_document — keep in sync)."""
    rng = np.random.Generator(np.random.PCG64(doc_seed(doc_id)))
    return bool(rng.uniform() < 0.25)


def layout_document(
    doc_id: str,
    kinds: Sequence[str],
    texts: Sequence[str],
    media_refs: Sequence[str],
    offsets: Sequence[int],
    cfg: EngineConfig = CONFIG,
) -> Tuple[CharTable, List[MediaBox], List[Style]]:
    """Deterministically position every span's glyphs. Spans must be given in
    offset order (the caller sorts)."""
    styles = doc_styles(doc_id)
    rng = np.random.Generator(np.random.PCG64(doc_seed(doc_id)))

    margin = F32(cfg.page_margin)
    page_w = F32(cfg.page_width)
    page_h = F32(cfg.page_height)
    body_y = styles[BODY].y_size
    leading = F32(cfg.line_leading_factor * body_y)

    # per-word x chunks + scalar per-word metadata; one np.repeat batch at the
    # end materializes the char table (vectorized emission, no per-char loops)
    x_chunks: List[np.ndarray] = []
    run_len: List[int] = []
    run_page: List[int] = []
    run_y: List[np.float32] = []
    run_cw: List[np.float32] = []
    run_h: List[np.float32] = []
    run_bl: List[np.float32] = []
    run_st: List[int] = []
    run_off: List[int] = []
    run_rot: List[int] = []
    chars: List[str] = []
    media: List[MediaBox] = []

    def emit_run(page_, px_arr, py, char_w_, ysize_, bl, st_, text_, offset_, rot_=0):
        x_chunks.append(np.asarray(px_arr, dtype=np.float32))
        run_len.append(len(text_))
        run_page.append(page_)
        run_y.append(py)
        run_cw.append(char_w_)
        run_h.append(ysize_)
        run_bl.append(bl)
        run_st.append(st_)
        run_off.append(offset_)
        run_rot.append(rot_)
        chars.extend(text_)

    # 25% of documents flow in two columns (exercises P3-P5 column detection);
    # the gutter between columns is the whitespace the engine must recover.
    two_col = bool(rng.uniform() < 0.25)
    gutter = F32(cfg.column_gutter)
    if two_col:
        col_w = F32((page_w - 2 * margin - gutter) / F32(2.0))
    else:
        col_w = F32(page_w - 2 * margin)

    page = 0
    col = 0
    cursor_y = margin  # top of the next line box
    seen_text = False

    def col_x0() -> np.float32:
        return F32(margin + col * F32(col_w + gutter))

    def advance_column():
        """Column full: next column on the same page, else next page."""
        nonlocal page, col, cursor_y
        if two_col and col == 0:
            col = 1
        else:
            page += 1
            col = 0
        cursor_y = margin

    n = len(kinds)
    for i in range(n):
        kind = kinds[i]
        offset = int(offsets[i])
        # one draw per span regardless of kind, keeps the stream aligned
        draws = rng.uniform(0.0, 1.0, 3)

        if kind == "media":
            if "/rule" in (media_refs[i] or ""):
                # table rule: deterministic thin full-width bar, stacked
                # tightly under the previous row (repeated-hsep combining
                # fodder — GraphicSegmentatorImpl.combineHorizontalSeparators)
                mw = F32(col_w * F32(0.8))
                mh = F32(3.0)
                if cursor_y + mh > page_h - margin:
                    advance_column()
                media.append(
                    MediaBox(page, float(col_x0()), float(cursor_y),
                             float(mw), float(mh), media_refs[i] or "", offset)
                )
                cursor_y = F32(cursor_y + mh + F32(8.0))
                continue
            if i > 0 and kinds[i - 1] == "text" and _is_formula_text(
                (texts[i - 1] or "").split(" ")
            ):
                # fraction bar under a formula: thin, formula-indented,
                # tight leading so the denominator stays within the P2
                # MATH_BAR lookaround (GraphicSegmentatorImpl:99-146)
                mw = F32(90.0 + draws[0] * 30.0)
                mh = F32(2.0 + draws[1] * 2.0)
                media.append(
                    MediaBox(page, float(F32(col_x0() + F32(30.0))), float(cursor_y),
                             float(mw), float(mh), media_refs[i] or "", offset)
                )
                cursor_y = F32(cursor_y + mh + F32(6.0))
                continue
            if draws[2] < 0.25:
                # separator-shaped media (thin horizontal bar; P2 HSEP role)
                mw = F32(col_w * F32(0.8))
                mh = F32(3.0 + draws[1] * 3.0)
            else:
                mw = F32(min(float(F32(100.0 + draws[0] * 300.0)), float(col_w)))
                mh = F32(60.0 + draws[1] * 140.0)
            if cursor_y + mh > page_h - margin:
                advance_column()
            media.append(
                MediaBox(page, float(col_x0()), float(cursor_y), float(mw), float(mh),
                         media_refs[i] or "", offset)
            )
            cursor_y = F32(cursor_y + mh + leading)
            continue

        text = texts[i] or ""
        if not text:
            continue

        # figure caption: a "fig." span right after a media span renders
        # INSIDE that media box (>=5 words fully contained -> P2 classifies
        # the graphic as CONTAINER; B7 re-attaches the caption to the media)
        if (
            i > 0
            and kinds[i - 1] == "media"
            and text.startswith("fig.")
            and media
            and media[-1].h >= 80.0
            and media[-1].w >= 140.0
        ):
            box = media[-1]
            cap_style = styles[SMALL]
            cap_size = F32(cap_style.x_size)
            cap_h = F32(cap_style.y_size)
            cap_cw = F32(cfg.char_aspect * cap_size)
            cx = F32(box.x + F32(4.0))
            cy = F32(box.y + F32(4.0))
            for word in text.split(" "):
                if not word:
                    continue
                ww = F32(len(word) * cap_cw)
                if cx + ww > box.x + box.w - 4.0 and cx > box.x + 4.0:
                    cx = F32(box.x + F32(4.0))
                    cy = F32(cy + F32(cfg.line_leading_factor * cap_style.y_size))
                if cy + cap_h > box.y + box.h - 2.0:
                    break  # box full; remaining words dropped from render
                pxs = []
                px = cx
                for _c in word:
                    pxs.append(px)
                    px = F32(px + cap_cw)
                emit_run(
                    box.page, pxs, cy, cap_cw, cap_h, F32(cy + cap_h),
                    SMALL, word, offset,
                )
                cx = F32(px + F32(0.3 * float(cap_size)))
            seen_text = True
            continue

        prev_text = texts[i - 1] if i > 0 else ""
        if not seen_text:
            st = HEADING
        elif _control_ratio(text) > 0.2:
            st = GARBLED
        elif _is_pagenum_text(text):
            st = SMALL
        elif _HEADING_RE.match(text):
            st = H2 if "." in text.split(" ", 1)[0] else HEADING
        elif _FOOTNOTE_RE.match(text):
            st = SMALL
        elif text == "Abstract" or prev_text == "Abstract":
            st = SMALL
        else:
            st = BODY

        style = styles[st]
        size = F32(style.x_size)
        ysize = F32(style.y_size)
        char_w = F32(cfg.char_aspect * size)

        if st == SMALL and seen_text and _is_pagenum_text(text):
            # page-number analog: bottom-centre of the CURRENT page, no flow
            py = F32(page_h - F32(30.0))
            px = F32(page_w / F32(2.0))
            pxs = []
            for _ch in text:
                pxs.append(px)
                px = F32(px + char_w + F32(0.02 * size))
            emit_run(page, pxs, py, char_w, ysize, F32(py + ysize), st, text, offset)
            continue

        seen_text = True

        # bold-by-overstrike: ~4% of body spans re-render their first word
        # at the identical position (S6 overprint-dedup fodder)
        overprint = st == BODY and draws[0] < 0.04

        # paragraph gap before ~35% of body spans (and after the title)
        para_break = st == HEADING or draws[2] < 0.35
        if para_break and cursor_y > margin:
            cursor_y = F32(cursor_y + leading)

        # display formulas are indented (B2 only detects indented line-sets,
        # ContentGrouper.java:182 — minX >= region.x + 20)
        words = [wd for wd in text.split(" ") if wd != ""]
        indent = F32(30.0) if _is_formula_text(words) else F32(0.0)

        def sx0() -> np.float32:
            return F32(col_x0() + indent)

        # flow the span's words into lines (within the current column)
        cursor_x = sx0()
        for wi, word in enumerate(words):
            jit = rng.uniform(-0.05, 0.05, max(len(word) - 1, 0)).astype(np.float32) * size
            word_w = F32(len(word) * char_w + (jit.sum() if len(jit) else F32(0.0)))
            if cursor_x + word_w > col_x0() + col_w and cursor_x > sx0():
                cursor_x = sx0()
                cursor_y = F32(cursor_y + leading)
            if cursor_y + ysize > page_h - margin:
                advance_column()
                cursor_x = sx0()
            # per-char advance fold == float32 cumsum (verified bit-exact):
            # adv_i = f32(char_w + jit_i) for all but the last char, then
            # char_w. Combining marks (S7 fodder) advance ZERO — the mark
            # renders on top of its base char, like a PDF putting diacritics
            # in a separate Tj element.
            k = len(word)
            arr = np.empty(k + 1, dtype=np.float32)
            arr[0] = cursor_x
            if k > 1:
                arr[1:k] = char_w + jit
                comb = np.fromiter(
                    (unicodedata.combining(c) != 0 for c in word), dtype=bool, count=k
                )
                arr[1:k][comb[1:]] = F32(0.0)
            arr[k] = char_w
            walk = np.cumsum(arr)
            emit_run(
                page, walk[:k], cursor_y, char_w, ysize,
                F32(cursor_y + ysize), st, word, offset,
            )
            if overprint and wi == 0:
                emit_run(
                    page, walk[:k], cursor_y, char_w, ysize,
                    F32(cursor_y + ysize), st, word, offset,
                )
            gx = walk[k]
            word_gap = F32((0.28 + float(rng.uniform(0.0, 0.08))) * float(size))
            cursor_x = F32(gx + word_gap)
        # span ends -> next span starts a new line
        cursor_y = F32(cursor_y + leading)

    # rotated watermark decoration on ~35% of docs: a word rendered with a
    # 90-degree glyph direction in the bottom margin. NOT part of any input
    # span — the S10 rotation filter must drop it (page rotation is 0), or
    # the conservation tests see hallucinated words.
    if rng.uniform() < 0.35 and seen_text:
        wm = "do not distribute".split(" ")[int(rng.integers(0, 3))]
        wy = F32(page_h - F32(12.0))
        pxs = []
        px = F32(margin)
        cw = F32(cfg.char_aspect * styles[SMALL].x_size)
        for _c in wm:
            pxs.append(px)
            px = F32(px + cw)
        emit_run(
            0, pxs, wy, cw, F32(styles[SMALL].y_size),
            F32(wy + F32(styles[SMALL].y_size)), SMALL, wm, 0, rot_=90,
        )

    if x_chunks:
        lens = np.asarray(run_len, dtype=np.int64)
        table = CharTable(
            page=np.repeat(np.asarray(run_page, dtype=np.int32), lens),
            x=np.concatenate(x_chunks),
            y=np.repeat(np.asarray(run_y, dtype=np.float32), lens),
            w=np.repeat(np.asarray(run_cw, dtype=np.float32), lens),
            h=np.repeat(np.asarray(run_h, dtype=np.float32), lens),
            baseline=np.repeat(np.asarray(run_bl, dtype=np.float32), lens),
            style_idx=np.repeat(np.asarray(run_st, dtype=np.int32), lens),
            offset=np.repeat(np.asarray(run_off, dtype=np.int32), lens),
            char=chars,
            rot=np.repeat(np.asarray(run_rot, dtype=np.int16), lens),
        )
    else:
        table = CharTable(
            page=np.empty(0, dtype=np.int32),
            x=np.empty(0, dtype=np.float32),
            y=np.empty(0, dtype=np.float32),
            w=np.empty(0, dtype=np.float32),
            h=np.empty(0, dtype=np.float32),
            baseline=np.empty(0, dtype=np.float32),
            style_idx=np.empty(0, dtype=np.int32),
            offset=np.empty(0, dtype=np.int32),
            char=chars,
            rot=np.empty(0, dtype=np.int16),
        )
    return table, media, styles
