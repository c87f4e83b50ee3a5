"""Vectorized per-document extraction pipeline.

Computes exactly what ``oracle.document.extract_document`` computes — bit-exact
float32 — but on columnar numpy arrays: no Rect/Glyph object graphs, no
per-glyph method dispatch. Sequential folds the reference semantics genuinely
require (W1 line grouping, W3 word assembly, B5 paragraph fold) remain lean
scalar loops over arrays; everything batchable (pairwise distances, y-histogram,
slab scans, style comparison) is numpy elementwise work.

Float32 parity notes (tests assert equality vs the oracle on every corpus):
- np.float32 scalar/elementwise arithmetic == the oracle's f32(a op b)
- pairwise bbox-union folds are replicated as folds: f32(x1 + f32(x2 - x1))
  is not guaranteed to equal x2, so a global min/max would NOT be equivalent
- int() casts replicate Java's truncation toward zero (positive coords)
- sqrt: float32-rounded sqrt equals double-sqrt-then-round (2p+2 argument)

Reference semantics per operator: see the docstrings in oracle/{words,lines,
paragraphs,logical}.py and SURVEY.md §2 (file:line cites into /root/reference).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import CONFIG, EngineConfig
from ..layout import CharTable, MediaBox, layout_document
from ..oracle.document import OutSpan
from ..oracle.lines import find_line_boundaries
from ..oracle.regions import (
    MEDIA_HSEP,
    analyze_page_regions,
    categorize_media_combined,
)
from ..oracle.scanfilters import apply_scan_filters
from ..oracle.blocks import find_blocks, math_score_exceeds
from ..oracle.style import (
    BIG_DIFFERENCE,
    FORMULA,
    SAME_STYLE,
    SPLIT,
    Style,
    style_compare,
)
from ..oracle.words import FONT_DENOM, estimate_boundary_cut

# sentinel style index for FORMULA-dominated lines (LineNode.findDominating
# Style override); never a valid index into the per-doc style dim
FORMULA_IDX = -2


def _style_of(styles: List["Style"], st: int) -> "Style":
    return FORMULA if st == FORMULA_IDX else styles[st]


def _style_cmp(cmp_lut: np.ndarray, a: int, b: int) -> int:
    if a == FORMULA_IDX or b == FORMULA_IDX:
        return SPLIT if (a == FORMULA_IDX) != (b == FORMULA_IDX) else SAME_STYLE
    return int(cmp_lut[a, b])

F32 = np.float32
_F32_TINY = np.float32(np.finfo(np.float32).tiny)
_F08 = np.float32(0.8)
_F07 = np.float32(0.7)
_F2 = np.float32(2.0)
_F0 = np.float32(0.0)


# --------------------------------------------------------------------- glyphs

@dataclass
class _Glyphs:
    """Columnar glyph (or word) table for one page."""

    x: np.ndarray
    y: np.ndarray
    w: np.ndarray
    h: np.ndarray
    ex: np.ndarray        # f32(x + w)
    ey: np.ndarray        # f32(y + h)
    baseline: np.ndarray
    style: np.ndarray     # int32 index into the style dim
    text: List[str]
    origin: np.ndarray    # int64 input-span offset

    def __len__(self) -> int:
        return len(self.text)


def _page_glyphs(table: CharTable, mask: np.ndarray) -> _Glyphs:
    idx = np.nonzero(mask)[0]
    x = table.x[idx]
    y = table.y[idx]
    w = table.w[idx]
    h = table.h[idx]
    return _Glyphs(
        x=x, y=y, w=w, h=h,
        ex=x + w, ey=y + h,
        baseline=table.baseline[idx],
        style=table.style_idx[idx],
        text=[table.char[i] for i in idx],
        origin=table.offset[idx].astype(np.int64),
    )


def _style_luts(styles: List[Style]) -> Tuple[np.ndarray, np.ndarray]:
    """(full 5-way compare LUT, word-break LUT) indexed [a, b] for
    style_compare(styles[a], styles[b])."""
    n = len(styles)
    cmp_lut = np.zeros((n, n), dtype=np.int8)
    for a in range(n):
        for b in range(n):
            cmp_lut[a, b] = style_compare(styles[a], styles[b])
    break_lut = (cmp_lut == BIG_DIFFERENCE) | (cmp_lut == SPLIT)
    return cmp_lut, break_lut


# ------------------------------------------------------------------- distance

def _dist_scalar(ax, ay, aw, ah, bx, by, bw, bh) -> np.float32:
    """Rectangle.distance(Rectangle) on 8 float32 scalars (oracle geom.py)."""
    aex = ax + aw
    aey = ay + ah
    bex = bx + bw
    bey = by + bh
    if not (aw <= _F0 or ah <= _F0):
        if not (bex < ax or bx > aex or by > aey) and bey > ay:
            return _F0
    d = _F0
    if ax > bex:
        t = ax - bex
        d = d + t * t
    elif bx > aex:
        t = bx - aex
        d = d + t * t
    if ay > bey:
        t = ay - bey
        d = d + t * t
    elif by > aey:
        t = by - aey
        d = d + t * t
    return np.float32(math.sqrt(float(d)))


def _consecutive_distances(g: _Glyphs, idx: List[int]) -> np.ndarray:
    """Vectorized rect distance between consecutive line glyphs (W2 input)."""
    if len(idx) <= 1:
        return np.empty(0, dtype=np.float32)
    ii = np.asarray(idx, dtype=np.int64)
    a, b = ii[:-1], ii[1:]
    ax, ay, aw, ah = g.x[a], g.y[a], g.w[a], g.h[a]
    aex, aey = g.ex[a], g.ey[a]
    bx, by = g.x[b], g.y[b]
    bex, bey = g.ex[b], g.ey[b]
    inter = (
        ~((aw <= _F0) | (ah <= _F0))
        & ~(bex < ax) & ~(bx > aex) & ~(by > aey) & (bey > ay)
    )
    tx = np.where(ax > bex, ax - bex, np.where(bx > aex, bx - aex, _F0))
    ty = np.where(ay > bey, ay - bey, np.where(by > aey, by - aey, _F0))
    d = tx * tx + ty * ty
    out = np.sqrt(d, dtype=np.float32)
    out[inter] = _F0
    return out


# ------------------------------------------------------------ W1-W3 words

def _approximate_char_spacing(distances: np.ndarray) -> np.float32:
    """Legacy W2 average (oracle words.approximate_char_spacing)."""
    if distances.size == 0:
        return _F0
    s = np.sort(distances, kind="stable")
    max_boundary = max(FONT_DENOM, np.float32(s[0] * _F2))
    total = _F0
    counted = 0
    for d in s:
        if d > max_boundary:
            break
        total = total + d
        counted += 1
    return np.float32(total / np.float32(counted))


@dataclass
class _Word:
    x: np.float32
    y: np.float32
    w: np.float32
    h: np.float32
    text: str
    style: int
    baseline: np.float32
    origin: int


def _make_words_fast(
    g: _Glyphs, idx: List[int], texts: List[str], contains_spaces: bool,
    dists: Optional[np.ndarray], char_spacing: np.float32, limit: np.float32,
    x: np.ndarray, y: np.ndarray, w: np.ndarray, h: np.ndarray, ex: np.ndarray,
) -> Optional[List[_Word]]:
    """Vectorized W3 (two-pass). Returns None when the float32 union
    identities don't hold for the tentative grouping — caller must run the
    exact pairwise fold then.

    Preconditions checked here: constant y/h, monotone x/ex, positive w/h.
    Then: tentative word groups from glyph-to-glyph distances (== the fold's
    union-to-next distances IF f32(x_s + f32(ex_j - x_s)) == ex_j for every
    glyph j in the group starting at s); validate exactly that, per glyph,
    against its tentative group start. When it holds the fold provably
    produces w = f32(ex_e - x_s) (multi-glyph) and the same boundaries.
    """
    n = len(idx)
    if not ((y == y[0]).all() and (h == h[0]).all()):
        return None
    if (np.diff(x) < 0).any() or (np.diff(ex) < 0).any():
        return None
    y0 = y[0]
    h0 = h[0]
    ey0 = np.float32(y0 + h0)
    # y-axis union fixpoint: h after first combine is f32(ey - y); it must
    # stay there (and equal h0, so single- and multi-glyph words agree)
    if np.float32(ey0 - y0) != h0:
        return None

    if contains_spaces:
        is_space = np.array([t.strip() == "" for t in texts], dtype=bool)
        boundary_after = is_space[1:] | is_space[:-1]
    else:
        is_space = np.zeros(n, dtype=bool)
        boundary_after = (dists - char_spacing) > limit

    starts_new = np.empty(n, dtype=bool)
    starts_new[0] = True
    starts_new[1:] = boundary_after
    group_starts = np.nonzero(starts_new)[0]
    gid = np.cumsum(starts_new) - 1

    # per-glyph x identity vs own group start
    x1g = x[group_starts][gid]
    if not (x1g + (ex - x1g) == ex).all():
        return None

    ii = np.asarray(idx, dtype=np.int64)
    styles = g.style[ii].tolist()
    baselines = list(g.baseline[ii])
    origins = g.origin[ii].tolist()

    group_ends = np.append(group_starts[1:], n) - 1
    words: List[_Word] = []
    for gi in range(len(group_starts)):
        s = int(group_starts[gi])
        if is_space[s]:
            continue
        e = int(group_ends[gi])
        if e == s:
            ww_ = w[s]
        else:
            ww_ = np.float32(ex[e] - x[s])
        words.append(
            _Word(
                x[s], y0, ww_, h0,
                "".join(texts[s : e + 1]) if e != s else texts[s],
                styles[s], baselines[s], origins[s],
            )
        )
    return words


def _make_words_in_line(
    g: _Glyphs, idx: List[int], mode: str, style_xsize: np.ndarray
) -> List[_Word]:
    texts = [g.text[i] for i in idx]
    contains_spaces = any(tx == " " for tx in texts)

    xs = int(style_xsize[g.style[idx[0]]])
    font_size = F32(10.0) if xs == 0 else F32(float(xs))
    limit = _F08 * font_size / FONT_DENOM

    ii = np.asarray(idx, dtype=np.int64)
    ax = g.x[ii]
    ay = g.y[ii]
    aw = g.w[ii]
    ah = g.h[ii]
    aex = g.ex[ii]

    char_spacing = _F0
    dists = None
    if not contains_spaces:
        dists = _consecutive_distances(g, idx)
        if mode == "legacy":
            char_spacing = _approximate_char_spacing(dists)
        else:
            cut = estimate_boundary_cut(dists, font_size)
            char_spacing = np.float32(cut - limit)

    # vectorized fast path when the pairwise-union fold provably degenerates
    any_blank = any(tx.strip() == "" and tx != " " for tx in texts)
    if not any_blank and (aw > _F0).all() and (ah > _F0).all():
        fast = _make_words_fast(
            g, idx, texts, contains_spaces, dists, char_spacing, limit,
            ax, ay, aw, ah, aex,
        )
        if fast is not None:
            return fast

    # bulk-extract line columns as lists of np.float32 scalars (float32
    # arithmetic preserved; list indexing beats per-access array indexing)
    lx = list(ax)
    ly = list(ay)
    lw = list(aw)
    lh = list(ah)
    lex = list(aex)
    ley = list(g.ey[ii])
    lst = g.style[ii].tolist()
    lbase = list(g.baseline[ii])
    lorig = g.origin[ii].tolist()

    words: List[_Word] = []
    n = len(idx)
    k = 0
    cur: Optional[_Word] = None
    while k < n or cur is not None:
        if cur is None:
            cur = _Word(
                lx[k], ly[k], lw[k], lh[k],
                texts[k], lst[k], lbase[k], lorig[k],
            )
            k += 1
        if cur.text.strip() == "":
            cur = None
            continue
        if k >= n:
            words.append(cur)
            cur = None
            break
        if contains_spaces:
            boundary = texts[k].strip() == ""
        else:
            d = _dist_scalar(
                cur.x, cur.y, cur.w, cur.h, lx[k], ly[k], lw[k], lh[k]
            )
            boundary = bool((d - char_spacing) > limit)
        if boundary:
            words.append(cur)
            cur = None
        else:
            # combine: text concat + pairwise bbox-union fold (keeps style,
            # baseline, origin of the first glyph)
            aex = cur.x + cur.w
            aey = cur.y + cur.h
            bex = lex[k]
            bey = ley[k]
            bx = lx[k]
            by = ly[k]
            x1 = cur.x if cur.x <= bx else bx
            y1 = cur.y if cur.y <= by else by
            x2 = aex if aex >= bex else bex
            y2 = aey if aey >= bey else bey
            cur = _Word(
                x1, y1, x2 - x1, y2 - y1,
                cur.text + texts[k], cur.style, cur.baseline, cur.origin,
            )
            k += 1
    return words


def _segment_words_page(
    g: _Glyphs, break_lut: np.ndarray, style_xsize: np.ndarray, mode: str
) -> List[_Word]:
    """W1 line grouping + W3 per line (oracle words.segment_words)."""
    m = len(g)
    if m == 0:
        return []
    order = np.argsort(g.baseline, kind="stable")
    oidx = order.tolist()
    b = list(g.baseline[order])
    ex = list(g.ex[order])
    ey = list(g.ey[order])
    xx = list(g.x[order])
    ww = list(g.w[order])
    st = g.style[order].tolist()
    blut = break_lut

    out: List[_Word] = []
    line: List[int] = []
    baseline = _F0
    max_y = _F32_TINY
    max_x = _F0
    cur_style = -1

    for oi in range(m):
        gb = b[oi]
        if not line:
            baseline = gb
            max_x = ex[oi]
            cur_style = st[oi]

        stop = False
        if baseline != gb and gb > max_y:
            stop = True
        else:
            gx = xx[oi]
            gw = ww[oi]
            # not is_within_variance(max_x, gx, gw)
            if max_x != gx and not ((max_x - gw) <= gx and (max_x + gw) >= gx):
                stop = True
            elif blut[st[oi], cur_style]:
                stop = True

        if stop:
            if line:
                out.extend(_make_words_in_line(g, line, mode, style_xsize))
                line = []
            baseline = gb
            max_y = ey[oi]
            cur_style = st[oi]

        line.append(oidx[oi])
        exi = ex[oi]
        if exi > max_y:
            max_y = exi  # reference quirk: maxY tracks endX
        max_x = exi

    if line:
        out.extend(_make_words_in_line(g, line, mode, style_xsize))
    return out


# ------------------------------------------------------------------ word table

@dataclass
class _WordTable:
    x: np.ndarray
    y: np.ndarray
    w: np.ndarray
    h: np.ndarray
    ex: np.ndarray
    ey: np.ndarray
    style: np.ndarray     # int32
    text: List[str]
    tlen: np.ndarray      # int64 len(text)
    origin: np.ndarray    # int64

    def __len__(self) -> int:
        return len(self.text)


def _word_table(words: List[_Word]) -> _WordTable:
    x = np.array([wd.x for wd in words], dtype=np.float32)
    y = np.array([wd.y for wd in words], dtype=np.float32)
    w = np.array([wd.w for wd in words], dtype=np.float32)
    h = np.array([wd.h for wd in words], dtype=np.float32)
    return _WordTable(
        x=x, y=y, w=w, h=h, ex=x + w, ey=y + h,
        style=np.array([wd.style for wd in words], dtype=np.int32),
        text=[wd.text for wd in words],
        tlen=np.array([len(wd.text) for wd in words], dtype=np.int64),
        origin=np.array([wd.origin for wd in words], dtype=np.int64),
    )


# Line = mutable list of word indices (order matters: pos/style folds follow it)
Line = List[int]


def _line_pos(t: _WordTable, line: Line) -> Tuple[np.float32, np.float32, np.float32, np.float32]:
    """Pairwise bbox-union fold in list order (== oracle Line.pos)."""
    i0 = line[0]
    x, y, w, h = t.x[i0], t.y[i0], t.w[i0], t.h[i0]
    for i in line[1:]:
        aex = x + w
        aey = y + h
        bex = t.ex[i]
        bey = t.ey[i]
        bx = t.x[i]
        by = t.y[i]
        x1 = x if x <= bx else bx
        y1 = y if y <= by else by
        x2 = aex if aex >= bex else bex
        y2 = aey if aey >= bey else bey
        x, y, w, h = x1, y1, x2 - x1, y2 - y1
    return x, y, w, h


def _dominating_style(t: _WordTable, idxs: Line) -> int:
    """B8 letter-count-weighted mode; ties -> earliest first appearance.
    FORMULA override for mathy lines (mirrors oracle Line.dominating_style)."""
    if math_score_exceeds([t.text[i] for i in idxs]):
        return FORMULA_IDX
    weights: Dict[int, int] = {}
    order: Dict[int, int] = {}
    for pos, i in enumerate(idxs):
        s = int(t.style[i])
        weights[s] = weights.get(s, 0) + len(t.text[i])
        if s not in order:
            order[s] = pos
    return max(weights, key=lambda s: (weights[s], -order[s]))


def _line_text(t: _WordTable, line: Line) -> str:
    return " ".join(t.text[i] for i in line)


def _words_payload(t: _WordTable, line: Line, styles) -> tuple:
    """writeWord payload (== oracle.document._line_words on the same
    bit-identical float32 word table): (value, style_ref, x, y, w, h) per
    word, ints via round-half-even. Per-word styles are the raw table styles
    (the FORMULA override is line-level only, in both implementations)."""
    return tuple(
        (
            t.text[i],
            _style_of(styles, int(t.style[i])).style_id,
            int(round(float(t.x[i]))),
            int(round(float(t.y[i]))),
            int(round(float(t.w[i]))),
            int(round(float(t.h[i]))),
        )
        for i in line
    )


def _caption_raw_words(t: _WordTable, line: Line) -> tuple:
    """Raw float32 caption word payload (value, style_idx, x, y, w, h) —
    captions lose their word-table indices when the container pull rebuilds
    the page table, so the geometry is carried by value. Kept as floats so
    the paged path can ship it through its float32 array columns and both
    paths round identically at emission."""
    return tuple(
        (
            t.text[i],
            int(t.style[i]),
            float(t.x[i]),
            float(t.y[i]),
            float(t.w[i]),
            float(t.h[i]),
        )
        for i in line
    )


# ------------------------------------------------------------------- B3 lines

def _create_lines(
    t: _WordTable, cmp_lut: np.ndarray, subset: Optional[Sequence[int]] = None
) -> List[Line]:
    """Oracle lines.create_lines on the columnar word table (optionally over
    a region's word-index subset; returned lines hold absolute indices)."""
    idx = np.arange(len(t)) if subset is None else np.asarray(subset, dtype=np.int64)
    n = int(idx.size)
    if n == 0:
        return []

    yi = t.y[idx].astype(np.int64)
    eyi = t.ey[idx].astype(np.int64)
    min_y = int(yi.min())
    max_y = int(eyi.max()) + 1
    # y-projection histogram via the difference trick (== per-word slice adds)
    size = max_y - min_y
    delta = np.zeros(size + 1, dtype=np.int64)
    hi = t.h[idx].astype(np.int64)
    wi = t.w[idx].astype(np.int64)
    starts = yi - min_y
    stops = np.minimum(starts + hi, size)
    np.add.at(delta, starts, wi)
    np.add.at(delta, stops, -wi)
    counts = np.cumsum(delta[:-1])

    boundaries = find_line_boundaries(counts.tolist())

    # window assignment, vectorized per boundary window; first window wins,
    # within-window order = stable y sort (== oracle's ordered scan)
    ordered = idx[np.argsort(t.y[idx], kind="stable")]
    yf_ord = t.y[ordered]
    eyf_ord = t.ey[ordered]
    unassigned = np.ones(n, dtype=bool)
    lines: List[Line] = []
    for bi in range(len(boundaries) - 1):
        start = min_y + boundaries[bi] - 1
        stop = min_y + boundaries[bi + 1]
        sel = np.nonzero(unassigned & (yf_ord > start - 1) & (eyf_ord < stop + 1))[0]
        if sel.size:
            unassigned[sel] = False
            lines.append([int(i) for i in ordered[sel]])

    _combine_lines(t, lines)
    for line in lines:
        line.sort(key=lambda i: t.x[i])  # B4 in-line order, stable
    return lines


def _vertical_distance(ay, aey, by, bey) -> np.float32:
    if by >= aey:
        return np.float32(by - aey)
    if ay >= bey:
        return np.float32(ay - bey)
    return _F0


def _combine_lines(t: _WordTable, lines: List[Line]) -> None:
    """Oracle lines._combine_lines, in place."""
    i = 1
    while i < len(lines):
        last, cur = lines[i - 1], lines[i]
        if len(cur) < 4 and _dominating_style(t, cur) == _dominating_style(t, last):
            lx, ly, lw, lh = _line_pos(t, last)
            cx, cy, cw, ch = _line_pos(t, cur)
            if ch <= _F07 * lh and _vertical_distance(
                ly, ly + lh, cy, cy + ch
            ) <= _F2:
                last.extend(cur)
                del lines[i]
                continue
        i += 1


# -------------------------------------------------------- P10 + B5 paragraphs

def _avg_font_y(t: _WordTable, idxs: Sequence[int], style_ysize: np.ndarray) -> np.float32:
    ii = np.asarray(idxs, dtype=np.int64)
    lens = t.tlen[ii]
    n = int(lens.sum())
    if n == 0:
        return _F32_TINY
    y_sum = float((style_ysize[t.style[ii]].astype(np.int64) * lens).sum())
    return np.float32(y_sum / n)


def _modal_vertical_spacing(
    t: _WordTable,
    all_idx: Sequence[int],
    region: Tuple[np.float32, np.float32, np.float32, np.float32],
    style_ysize: np.ndarray,
) -> int:
    """Oracle paragraphs.modal_vertical_spacing, slab masks vectorized."""
    avg_y = _avg_font_y(t, all_idx, style_ysize)
    limit = int(avg_y) * 3
    if limit <= 0:
        limit = 1
    hist = np.zeros(limit, dtype=np.int64)

    rx, ry, rw, rh = region
    ii = np.asarray(all_idx, dtype=np.int64)
    wx, wy, wex, wey = t.x[ii], t.y[ii], t.ex[ii], t.ey[ii]

    x = float(rx)
    step = float(rw) / 3.0
    if step <= 0.0:
        step = 1.0
    end_x = float(rx + rw)
    while x <= end_x:
        ix = int(x)
        sx = np.float32(float(ix))
        sy = np.float32(float(ry))
        sex = sx + np.float32(1.0)
        sey = sy + np.float32(float(rh))
        mask = ~(wex < sx) & ~(wx > sex) & ~(wy > sey) & (wey > sy)
        sel = np.nonzero(mask)[0]
        if sel.size > 1:
            order = sel[np.argsort(wy[sel], kind="stable")]
            d = (wy[order][1:] - wey[order][:-1]).astype(np.int64)
            d = d[(d > 0) & (d < limit)]
            np.add.at(hist, d, 1)
        x += step

    index = -1
    if limit > 2:
        hh = hist[2:]
        index = 2 + (hh.size - 1 - int(np.argmax(hh[::-1])))

    temp = float(max(index, int(float(avg_y) * 0.5)))
    return int(temp + max(1.0, temp * 0.1))


class Paragraph:
    """Mutable paragraph: lines + leaf-region order + L4-L6 role."""

    __slots__ = ("lines", "region", "role", "block")

    def __init__(
        self, lines: List[Line], region: int = 0, role: str = "text", block: int = 0
    ):
        self.lines = lines
        self.region = region
        self.role = role
        self.block = block


def _segment_paragraphs(
    t: _WordTable, lines: List[Line], mvs: int, cmp_lut: np.ndarray
) -> List[Paragraph]:
    """Oracle paragraphs.segment_paragraphs (B5 fold)."""
    if not lines:
        return []
    from ..oracle.style import (  # local import to keep constants in one place
        SAME_STYLE,
        SAME_STYLE_AND_BIG_TEXT,
        SUBTLE_DIFFERENCE,
    )

    gap_15 = np.float32(mvs * 1.5)
    gap_11 = np.float32(mvs * 1.1)

    ret: List[Paragraph] = []
    current: List[Line] = []
    current_style: Optional[int] = None
    last_pos = None

    for line in lines:
        line_style = _dominating_style(t, line)
        if current_style is None:
            current_style = line_style
            last_pos = _line_pos(t, line)

        lp = _line_pos(t, line)
        distance = np.float32(lp[1] - (last_pos[1] + last_pos[3]))
        cmp = _style_cmp(cmp_lut, current_style, line_style)

        if cmp == SPLIT:
            split = True
        elif cmp == SAME_STYLE_AND_BIG_TEXT:
            split = False
        elif cmp == SAME_STYLE:
            split = bool(distance > gap_15)
        elif cmp == SUBTLE_DIFFERENCE:
            found = any(int(t.style[i]) == current_style for i in line)
            split = bool(distance > (gap_15 if found else gap_11))
        else:  # BIG_DIFFERENCE
            found = any(int(t.style[i]) == current_style for i in line)
            split = not found

        if split:
            if current:
                ret.append(Paragraph(current))
            current = []
            current_style = line_style

        current.append(line)
        last_pos = lp

    if current:
        ret.append(Paragraph(current))
    return ret


# ----------------------------------------------------- P2-P8 page regions

def _avg_font_x(t: _WordTable, idxs: Sequence[int], style_xsize: np.ndarray) -> np.float32:
    ii = np.asarray(idxs, dtype=np.int64)
    lens = t.tlen[ii]
    n = int(lens.sum())
    if n == 0:
        return _F32_TINY
    x_sum = float((style_xsize[t.style[ii]].astype(np.int64) * lens).sum())
    return np.float32(x_sum / n)


def _analyze_page_vec(
    t: _WordTable,
    page_media: List[MediaBox],
    cmp_lut: np.ndarray,
    style_xsize: np.ndarray,
    style_ysize: np.ndarray,
    page_height: float = 800.0,
    media_roles: "Optional[Tuple[List[str], List[tuple]]]" = None,
):
    """Mirror of oracle.document._analyze_page on the columnar word table:
    P2 media roles -> P7 top split -> P8 separator bands -> P3-P5 column
    division (shared regions.py kernel) -> P9 band re-split -> per-region
    B3 lines + B5 paragraphs."""
    n = len(t)
    if n == 0:
        return [], [], []
    wx, wy, wex, wey = t.x, t.y, t.ex, t.ey
    x0, y0 = float(wx.min()), float(wy.min())
    x1, y1 = float(wex.max()), float(wey.max())

    all_idx = list(range(n))
    avg_x = _avg_font_x(t, all_idx, style_xsize)
    min_col = 0.8 * float(avg_x)
    page_rect = (
        np.float32(x0), np.float32(y0), np.float32(x1 - x0), np.float32(y1 - y0)
    )
    mvs_page = _modal_vertical_spacing(t, all_idx, page_rect, style_ysize)
    min_row = 1.1 * float(mvs_page)

    hsep_ys: List[float] = []
    media_obs = None
    if page_media:
        mx = np.array([m.x for m in page_media], dtype=np.float32)
        my = np.array([m.y for m in page_media], dtype=np.float32)
        mw = np.array([m.w for m in page_media], dtype=np.float32)
        mh = np.array([m.h for m in page_media], dtype=np.float32)
        roles, synth_hseps = (
            media_roles
            if media_roles is not None
            else categorize_media_combined(
                mx, my, mw, mh, wx, wy, wex, wey, region_w=x1 - x0, w_texts=t.text
            )
        )
        for m, role in zip(page_media, roles):
            if role != MEDIA_HSEP:
                continue
            sep_y = m.y + m.h / 2.0
            if not bool(np.any((wy < sep_y) & (wey > sep_y))):
                hsep_ys.append(sep_y)
        # merged stacks that still qualify: ONE synthetic separator in place
        # of the members (reference removeAll + re-add) — mirror of oracle
        for (_bx, by, _bex, bey) in synth_hseps:
            sep_y = (by + bey) / 2.0
            if not bool(np.any((wy < sep_y) & (wey > sep_y))):
                hsep_ys.append(sep_y)
        media_obs = (mx, my, mx + mw, my + mh)

    from ..oracle.style import SAME_STYLE

    regions = analyze_page_regions(
        (x0, y0, x1, y1), wx, wy, wex, wey, t.tlen, hsep_ys, min_col, min_row,
        media_obs=media_obs,
        style_info=(
            [int(s) for s in t.style],
            [int(n) for n in t.tlen],
            lambda a, b: int(cmp_lut[a, b]) == SAME_STYLE,
        ),
        page_dims=(0.0, float(page_height)),
    )

    paragraphs: List[Paragraph] = []
    bounds = []
    block_bounds: List[List[Tuple[float, float]]] = []
    for reg in regions:
        idx = np.asarray(reg.word_idx, dtype=np.int64)
        # B1/B2: block grouping; leaf whitespace + media boxes block trails.
        # MATH_BAR-roled boxes additionally join the B2 scan (containedGraphics
        # bonus, Formulas.java:83-103) — mirror of the oracle call site
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
            t.x[idx], t.y[idx], t.ex[idx], t.ey[idx],
            [t.text[i] for i in idx],
            reg.bound,
            blockers,
            math_bars=math_bars,
        )
        block_lines = [
            _create_lines(t, cmp_lut, subset=[int(idx[i]) for i in blk])
            for blk in blocks
        ]
        all_lines = [l for lines in block_lines for l in lines]
        if not all_lines:
            continue
        rpos = _line_pos(t, all_lines[0])
        for line in all_lines[1:]:
            bx, by, bw, bh = _line_pos(t, line)
            aex = rpos[0] + rpos[2]
            aey = rpos[1] + rpos[3]
            bex = bx + bw
            bey = by + bh
            nx0 = rpos[0] if rpos[0] <= bx else bx
            ny0 = rpos[1] if rpos[1] <= by else by
            nx1 = aex if aex >= bex else bex
            ny1 = aey if aey >= bey else bey
            rpos = (nx0, ny0, nx1 - nx0, ny1 - ny0)
        sub_all = [i for line in all_lines for i in line]
        mvs = _modal_vertical_spacing(t, sub_all, rpos, style_ysize)
        bb: List[Tuple[float, float]] = []
        for lines in block_lines:
            if not lines:
                continue
            paras = _segment_paragraphs(t, lines, mvs, cmp_lut)
            for para in paras:
                para.region = len(bounds)
                para.block = len(bb)
            ii = [i for l in lines for i in l]
            bb.append((float(t.y[ii].min()), float(t.ey[ii].max())))
            paragraphs.extend(paras)
        bounds.append(reg.bound)
        block_bounds.append(bb)
    # logical ops (L2 title-first, L5 abstract delete-preceding) treat the
    # page paragraph LIST as reading order — restore it after block-major
    # construction (stable: block order breaks y ties)
    paragraphs.sort(key=lambda para: (para.region, float(_para_pos(t, para)[1])))
    return paragraphs, bounds, block_bounds


def _media_region_vec(m: MediaBox, bounds) -> int:
    """Mirror of oracle _media_region (overlap area, then y distance)."""
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


# ------------------------------------------------------------- L1-L3 logical

def _para_pos(t: _WordTable, para: Paragraph):
    x, y, w, h = _line_pos(t, para.lines[0])
    for line in para.lines[1:]:
        bx, by, bw, bh = _line_pos(t, line)
        aex = x + w
        aey = y + h
        bex = bx + bw
        bey = by + bh
        x1 = x if x <= bx else bx
        y1 = y if y <= by else by
        x2 = aex if aex >= bex else bex
        y2 = aey if aey >= bey else bey
        x, y, w, h = x1, y1, x2 - x1, y2 - y1
    return x, y, w, h


def _para_style(t: _WordTable, para: Paragraph) -> int:
    return _dominating_style(t, [i for line in para.lines for i in line])


def _find_body_style(
    tables: List[_WordTable], styles: List[Style]
) -> int:
    counts = np.zeros(len(styles), dtype=np.int64)
    for t in tables:
        if len(t):
            counts += np.bincount(
                t.style, weights=t.tlen, minlength=len(styles)
            ).astype(np.int64)
    body = 0
    max_count = -1
    for s in range(len(styles)):
        if counts[s] > max_count:
            max_count = int(counts[s])
            body = s
    return body


def _can_be_line_id(t: _WordTable, line: Line, st: int, body: int, styles: List[Style]) -> bool:
    s = _style_of(styles, st)
    if styles[body].font_name == s.font_name or styles[body].x_size >= s.x_size:
        return False
    text = _line_text(t, line).strip()
    first_word = text.split()[0] if text else ""
    if len(first_word) > 3 or not first_word:
        return False
    c = first_word[0]
    return c.isdigit() or "." in first_word or c in "abcdABCI"


def _find_header_candidates(
    tables: List[_WordTable], pages: List[List[Paragraph]], body: int, styles: List[Style]
) -> List[int]:
    candidates: List[int] = []
    for p, page in enumerate(pages):
        t = tables[p]
        for para in page:
            for line in para.lines:
                st = _dominating_style(t, line)
                if st in candidates or st == body:
                    continue
                if _style_of(styles, st).x_size >= styles[body].x_size or _can_be_line_id(
                    t, line, st, body, styles
                ):
                    candidates.append(st)
    return candidates


def _extract_title(
    tables: List[_WordTable], pages: List[List[Paragraph]], header_candidates: List[int]
) -> Optional[Paragraph]:
    if not pages or not pages[0]:
        return None
    first = pages[0]
    t = tables[0]
    for i, para in enumerate(first):
        if _para_style(t, para) in header_candidates:
            if i + 1 != len(first) - 1 and i + 1 < len(first):
                nxt = first[i + 1]
                if _para_style(t, nxt) == _para_style(t, para):
                    para.lines.extend(nxt.lines)
                    first.remove(nxt)
            first.remove(para)
            return para
    return None


def _tag_footnotes(
    tables: List[_WordTable], pages: List[List[Paragraph]], body: int,
    styles: List[Style],
) -> None:
    """L4 mirror of oracle.logical.tag_footnotes."""
    for p, page in enumerate(pages):
        t = tables[p]
        for para in page:
            st = _para_style(t, para)
            if _style_of(styles, st).x_size >= styles[body].x_size:
                continue
            text = _line_text(t, para.lines[0]).strip() if para.lines else ""
            first = text.split()[0] if text else ""
            if first and (first[0].isdigit() or first[0] == "*"):
                para.role = "footnote"


def _extract_abstract(
    tables: List[_WordTable], pages: List[List[Paragraph]]
) -> List[Paragraph]:
    """L5 mirror of oracle.logical.extract_abstract."""
    if not pages or not pages[0]:
        return []
    first = pages[0]
    t = tables[0]
    for i, para in enumerate(first):
        text = _line_text(t, para.lines[0]).strip().lower() if para.lines else ""
        if not text.startswith("abstract"):
            continue
        st = _para_style(t, para)
        absorbed = [para]
        j = i + 1
        while j < len(first) and _para_style(t, first[j]) == st:
            absorbed.append(first[j])
            j += 1
        del first[:j]
        for a in absorbed:
            a.role = "abstract"
        return absorbed
    return []


def _recognize_divs(
    tables: List[_WordTable], pages: List[List[Paragraph]],
    header_candidates: List[int], body: int,
) -> None:
    """L6 mirror of oracle.logical.recognize_divs."""
    div_styles: List[int] = []
    for p, page in enumerate(pages):
        t = tables[p]
        for para in page:
            text = _line_text(t, para.lines[0]).strip() if para.lines else ""
            first = text.split()[0] if text else ""
            if not first or not first[0].isdigit():
                continue
            st = _para_style(t, para)
            if st == body or st not in header_candidates:
                continue
            if st not in div_styles:
                if len(div_styles) >= 3:
                    continue
                div_styles.append(st)
            para.role = f"heading{div_styles.index(st) + 1}"


def _remove_page_numbers(
    tables: List[_WordTable], pages: List[List[Paragraph]], page_end_y: float
) -> None:
    pot_per_page: List[Tuple[int, List[Paragraph]]] = []
    all_pot: List[Tuple[int, Paragraph]] = []
    for p, page in enumerate(pages):
        t = tables[p]
        current: List[Paragraph] = []
        for para in page:
            if len(para.lines) != 1:
                continue
            if _para_pos(t, para)[1] < page_end_y * 0.85:
                continue
            text = " ".join(_line_text(t, line) for line in para.lines).strip()
            if text and all(ch.isdigit() for ch in text):
                current.append(para)
        if current:
            pot_per_page.append((p, current))
            all_pot.extend((p, para) for para in current)

    if len(pot_per_page) < max(1, len(pages) // 2):
        return

    # mode style over all candidate words (letter-weighted, tie by appearance)
    weights: Dict[int, int] = {}
    order: Dict[int, int] = {}
    pos = 0
    for p, para in all_pot:
        t = tables[p]
        for line in para.lines:
            for i in line:
                s = int(t.style[i])
                weights[s] = weights.get(s, 0) + len(t.text[i])
                if s not in order:
                    order[s] = pos
                pos += 1
    mode_style = max(weights, key=lambda s: (weights[s], -order[s]))

    for p, candidates in pot_per_page:
        t = tables[p]
        matching = [para for para in candidates if _para_style(t, para) == mode_style]
        if len(matching) != 1:
            continue
        pages[p].remove(matching[0])


# ------------------------------------------------------------------- pipeline

def _analyze_one_page(
    g: _Glyphs,
    page_media: List[MediaBox],
    cmp_lut: np.ndarray,
    break_lut: np.ndarray,
    style_xsize: np.ndarray,
    style_ysize: np.ndarray,
    cfg: EngineConfig,
    mode: str,
):
    """One page's chars -> (word table, paragraphs, region bounds, block
    bounds, captions). Page-local by construction — this is the unit the
    page-parallel path distributes (operators/extract_paged.py)."""
    words = _segment_words_page(g, break_lut, style_xsize, mode)
    t = _word_table(words)
    # P2/P1/B7: text fully inside a CONTAINER graphic leaves the page
    # flow; its lines re-attach to the media at emission (mirror of
    # oracle._analyze_page's extraction)
    captions: Dict[int, List[Tuple[str, int]]] = {}
    page_roles = None
    if page_media and len(t):
        from ..oracle.regions import MEDIA_CONTAINER

        roles, synth_hseps = categorize_media_combined(
            np.array([m.x for m in page_media], dtype=np.float32),
            np.array([m.y for m in page_media], dtype=np.float32),
            np.array([m.w for m in page_media], dtype=np.float32),
            np.array([m.h for m in page_media], dtype=np.float32),
            t.x, t.y, t.ex, t.ey,
            region_w=float(t.ex.max() - t.x.min()),
            w_texts=t.text,
        )
        page_roles = (roles, synth_hseps)
        pulled = np.zeros(len(t), dtype=bool)
        for mi, (m, role) in enumerate(zip(page_media, roles)):
            if role != MEDIA_CONTAINER:
                continue
            inside = (
                (t.x >= m.x) & (t.ex <= m.x + m.w)
                & (t.y >= m.y) & (t.ey <= m.y + m.h) & ~pulled
            )
            if not bool(inside.any()):
                continue
            pulled |= inside
            cap_lines = _create_lines(
                t, cmp_lut, subset=[int(i) for i in np.nonzero(inside)[0]]
            )
            captions[mi] = [
                (_line_text(t, line), int(min(t.origin[i] for i in line)),
                 _dominating_style(t, line), _caption_raw_words(t, line))
                for line in cap_lines
            ]
        if bool(pulled.any()):
            keep = [w for w, pl in zip(words, pulled) if not pl]
            t = _word_table(keep)
    paragraphs, bounds, blocks = _analyze_page_vec(
        t, page_media, cmp_lut, style_xsize, style_ysize,
        page_height=cfg.page_height, media_roles=page_roles,
    )
    return t, paragraphs, bounds, blocks, captions


def extract_document_fast(
    doc_id: str,
    kinds: Sequence[str],
    texts: Sequence[str],
    media_refs: Sequence[str],
    offsets: Sequence[int],
    cfg: EngineConfig = CONFIG,
    mode: str = "tuned",
    emit_words: bool = False,
) -> List[OutSpan]:
    """Drop-in vectorized equivalent of oracle.document.extract_document."""
    order = np.argsort(np.asarray(offsets, dtype=np.int64), kind="stable")
    kinds = [kinds[i] for i in order]
    texts = [texts[i] for i in order]
    media_refs = [media_refs[i] for i in order]
    offsets = [int(offsets[i]) for i in order]

    table, media, styles = layout_document(doc_id, kinds, texts, media_refs, offsets, cfg)
    table = apply_scan_filters(table, styles, cfg)
    cmp_lut, break_lut = _style_luts(styles)
    style_xsize = np.array([s.x_size for s in styles], dtype=np.int64)
    style_ysize = np.array([s.y_size for s in styles], dtype=np.int64)

    n_pages = int(table.page.max()) + 1 if len(table) else 0
    n_pages = max(n_pages, (max((m.page for m in media), default=-1) + 1))

    media_by_page: Dict[int, List[MediaBox]] = {}
    for m in media:
        media_by_page.setdefault(m.page, []).append(m)

    tables: List[_WordTable] = []
    pages: List[List[Paragraph]] = []
    page_regions: List[List] = []
    page_blocks: List[List] = []
    page_captions: List[Dict[int, List[Tuple[str, int]]]] = []
    for p in range(n_pages):
        g = _page_glyphs(table, table.page == p)
        t, paragraphs, bounds, blocks, captions = _analyze_one_page(
            g, media_by_page.get(p, []), cmp_lut, break_lut,
            style_xsize, style_ysize, cfg, mode,
        )
        tables.append(t)
        pages.append(paragraphs)
        page_regions.append(bounds)
        page_blocks.append(blocks)
        page_captions.append(captions)

    return _finalize_document(
        tables, pages, page_regions, page_blocks, page_captions,
        media_by_page, n_pages, styles, cfg, emit_words=emit_words,
    )


def _finalize_document(
    tables: List[_WordTable],
    pages: List[List[Paragraph]],
    page_regions: List[List],
    page_blocks: List[List],
    page_captions: List[Dict[int, List[Tuple[str, int]]]],
    media_by_page: Dict[int, List[MediaBox]],
    n_pages: int,
    styles: List[Style],
    cfg: EngineConfig,
    emit_words: bool = False,
) -> List[OutSpan]:
    """Doc-level tail: logical analysis (L1-L6) + ordered span assembly.
    Pure function of the per-page analysis results — the page-parallel path
    reconstructs its inputs from shuffled rows and calls this unchanged."""
    body = _find_body_style(tables, styles)
    header_candidates = _find_header_candidates(tables, pages, body, styles)
    title = _extract_title(tables, pages, header_candidates)
    _remove_page_numbers(tables, pages, cfg.page_height)
    _tag_footnotes(tables, pages, body, styles)
    abstract = _extract_abstract(tables, pages)
    _recognize_divs(tables, pages, header_candidates, body)

    def _sref(t: _WordTable, line) -> str:
        return _style_of(styles, _dominating_style(t, line)).style_id

    def _words_of(t: _WordTable, line) -> tuple:
        return _words_payload(t, line, styles) if emit_words else ()

    def _cap_words(raw: tuple) -> tuple:
        if not emit_words:
            return ()
        return tuple(
            (v, _style_of(styles, si).style_id,
             int(round(x)), int(round(y)), int(round(w)), int(round(h)))
            for (v, si, x, y, w, h) in raw
        )

    out: List[OutSpan] = []
    seq = 0
    front_para = 0
    if title is not None:
        t = tables[0]
        for line in title.lines:
            out.append(
                OutSpan(seq, "title", _line_text(t, line), "",
                        int(min(t.origin[i] for i in line)),
                        page=-1, para=front_para, style_ref=_sref(t, line),
                        words=_words_of(t, line))
            )
            seq += 1
        front_para += 1
    if abstract:
        t = tables[0]
        for para in abstract:
            for line in para.lines:
                out.append(
                    OutSpan(seq, "abstract", _line_text(t, line), "",
                            int(min(t.origin[i] for i in line)),
                            page=-1, para=front_para, style_ref=_sref(t, line),
                            words=_words_of(t, line))
                )
                seq += 1
            front_para += 1

    for p in range(n_pages):
        t = tables[p]
        items: List[Tuple[int, float, int, int, str, object, object]] = []
        for pi, para in enumerate(pages[p]):
            for li, line in enumerate(para.lines):
                items.append(
                    (para.region, float(_line_pos(t, line)[1]), pi, li,
                     "line", line, para)
                )
        for mi, m in enumerate(media_by_page.get(p, [])):
            r = _media_region_vec(m, page_regions[p])
            items.append((r, float(m.y), 1_000_000 + mi, 0, "media", m, None))
            # B7: caption lines re-attach right after their media span
            for li, cap in enumerate(page_captions[p].get(mi, [])):
                items.append((r, float(m.y), 1_000_000 + mi, 1 + li, "capline", cap, None))
        items.sort(key=lambda it: (it[0], it[1], it[2], it[3]))
        for _, _, pi, _, kind, obj, para in items:
            if kind == "capline":
                out.append(OutSpan(seq, "text", obj[0], "", obj[1],
                                   page=p, para=pi,
                                   style_ref=_style_of(styles, obj[2]).style_id,
                                   words=_cap_words(obj[3])))
                seq += 1
            elif kind == "line":
                role = para.role
                st = _dominating_style(t, obj)
                if role == "text" and st == FORMULA_IDX:
                    role = "formula"
                out.append(
                    OutSpan(seq, role, _line_text(t, obj), "",
                            int(min(t.origin[i] for i in obj)),
                            page=p, para=pi,
                            style_ref=_style_of(styles, st).style_id,
                            words=_words_of(t, obj))
                )
                seq += 1
            else:
                out.append(OutSpan(seq, "media", "", obj.media_ref, obj.offset,
                                   page=p, para=pi))
                seq += 1
    return out
