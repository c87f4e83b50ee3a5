"""B1/B2 block grouping kernel, shared by the oracle and the engine.

B1 connected-component blocks (ContentGrouper.findBlocksOfContent,
/root/reference/analysis/.../physical/ContentGrouper.java:61-148): flood-fill
of "connected" content via 1px row/column slab adjacency, where whitespace
rectangles (the trails the whitespace cover left in the region) and media
boxes block propagation (markEverythingConnectedFrom returns false on
non-assignable/graphic content, breaking markBothWaysFromCurrent's walk,
:109-148,232-250). Re-expressed as union-find over slab adjacencies: two
words join when they are ADJACENT entries of some 1px horizontal or vertical
slab list with no blocker between them. Slab entries are built with one
np.repeat batch per axis, the unions are a linear pass.

B2 formula pre-grouping (ContentGrouper.createBlocksForFormulas:150-230 +
Formulas.textSeemsToBeFormula, model/.../formula/Formulas.java:56-106):
indented (minX >= region.x + 20) line-sets whose math score — 3 per math
symbol (Unicode category Sm), 1 per digit — exceeds their character count are
hungrily combined into one block, merged with the previous block when no
non-formula text intervened.

Block order (PageSegmentator.createParagraphsForRegion:119 sorts with
Sorting.regionComparator, geom/Sorting.java:104-130): y-disjoint -> top
first; x-disjoint -> left first; else y (4% tolerance, MathUtils
.isWithinPercent:85-94) then x.
"""

from __future__ import annotations

import unicodedata
from functools import cmp_to_key
from typing import List, Optional, Sequence, Tuple

import numpy as np

FORMULA_INDENT = 20.0  # ContentGrouper.java:182
FORMULA_MIN_CONTENTS = 4  # Formulas.java:58


from functools import lru_cache


@lru_cache(maxsize=65536)
def _word_math_score(t: str) -> int:
    score = 0
    for c in t:
        if unicodedata.category(c) == "Sm":
            score += 3
        elif c.isdigit():
            score += 1
    return score


@lru_cache(maxsize=65536)
def _word_has_sm(t: str) -> bool:
    return any(unicodedata.category(c) == "Sm" for c in t)


def math_score_exceeds(texts: Sequence[str], contained_graphics: int = 0) -> bool:
    """Formulas.textSeemsToBeFormula over word texts (Formulas.java:56-106;
    no math-font words exist in this corpus, so that term is zero). Word
    scores are LRU-cached — vocabularies repeat heavily.

    contained_graphics = GRAPHIC_MATH_BAR contents in the line-set
    (Formulas.java:77-81): each skips the word count and the total applies
    the :103 bonus `looksLikeMath += containedGraphics * looksLikeMath *
    0.1f` — Java compound assignment truncates the float sum back to int."""
    if len(texts) + contained_graphics < FORMULA_MIN_CONTENTS:
        return False
    looks_like_math = 0
    word_count = 0
    for t in texts:
        word_count += len(t)
        looks_like_math += _word_math_score(t)
    if contained_graphics:
        looks_like_math = int(
            np.float32(looks_like_math)
            + np.float32(contained_graphics)
            * np.float32(looks_like_math)
            * np.float32(0.1)
        )
    return looks_like_math > word_count


def _within_percent(a: float, b: float, pct: float) -> bool:
    if a == b:
        return True
    return (a + a / 100.0 * pct) >= b and (a - a / 100.0 * pct) <= b


def region_comparator(a: Tuple[float, float, float, float],
                      b: Tuple[float, float, float, float]) -> int:
    """Sorting.regionComparator on (x0, y0, x1, y1) bounds."""
    if a[3] < b[1]:
        return -1
    if a[1] > b[3]:
        return 1
    if a[2] < b[0]:
        return -1
    if a[0] > b[2]:
        return 1
    if not _within_percent(a[1], b[1], 4.0):
        return -1 if a[1] < b[1] else 1
    if a[0] < b[0]:
        return -1
    if a[0] > b[2]:
        return 1
    return 0


class _UF:
    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, i: int) -> int:
        p = self.parent
        while p[i] != i:
            p[i] = p[p[i]]
            i = p[i]
        return i

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def _slab_pairs(lo: np.ndarray, hi: np.ndarray, pos: np.ndarray, n_words: int):
    """Adjacent index pairs (i, j) of the 1px slab lists along one axis.
    lo/hi: integer slab range per item; pos: sort position within a slab."""
    counts = (hi - lo + 1).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    idx = np.repeat(np.arange(len(lo), dtype=np.int64), counts)
    # slab id per entry: lo[i], lo[i]+1, ..., hi[i]
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slab = np.arange(total, dtype=np.int64) - np.repeat(offs, counts) + np.repeat(lo, counts)
    p = pos[idx]
    order = np.lexsort((p, slab))
    si, ss = idx[order], slab[order]
    same = ss[1:] == ss[:-1]
    a, b = si[:-1][same], si[1:][same]
    # both endpoints must be words for a join; blockers (idx >= n_words)
    # sit between words in the slab list and thus break adjacency
    m = (a < n_words) & (b < n_words)
    return a[m], b[m]


def find_blocks(
    w_x: np.ndarray,
    w_y: np.ndarray,
    w_ex: np.ndarray,
    w_ey: np.ndarray,
    texts: Sequence[str],
    region_bound: Tuple[float, float, float, float],
    blockers: Optional[Sequence[Tuple[float, float, float, float]]] = None,
    math_bars: Optional[Sequence[Tuple[float, float, float, float]]] = None,
) -> List[List[int]]:
    """Blocks of one region as lists of LOCAL word indices, ordered by
    regionComparator on the block bound. B2 formula pre-grouping runs first;
    B1 union-find groups the rest.

    math_bars: MATH_BAR-roled graphic boxes in the region. They participate
    in the B2 row scan exactly like contents (the reference's region contents
    include assignable GRAPHIC_MATH_BAR graphics, which are StyledText with
    empty text): they join the working set, move minX/endY, and each one in
    the set feeds the Formulas.java:103 containedGraphics score bonus. They
    are never emitted as block members (media spans stay 1:1)."""
    n = len(w_x)
    if n == 0:
        return []

    assigned = np.zeros(n, dtype=bool)
    blocks: List[List[int]] = []

    # ---- B2: formula pre-grouping (faithful row-scan fold) ----------------
    # Short-circuit: digits alone can never beat the char count (1 point per
    # digit char vs 1 char of word length) and no math-font words exist here,
    # so textSeemsToBeFormula requires at least one Sm character. Most
    # regions have none — skip the row scan entirely.
    has_math = any(_word_has_sm(t) for t in texts)
    rx0 = float(region_bound[0])
    ry0, ry1 = float(region_bound[1]), float(region_bound[3])
    wy = w_y.astype(np.float64)
    wey = w_ey.astype(np.float64)
    bars = [tuple(float(v) for v in b) for b in (math_bars or [])]
    bar_y = np.array([b[1] for b in bars], dtype=np.float64)
    bar_ey = np.array([b[3] for b in bars], dtype=np.float64)
    bar_assigned = np.zeros(len(bars), dtype=bool)
    working: List[int] = []
    in_working: set = set()
    bar_working: set = set()
    skip = False
    has_skipped = False
    min_x = np.inf
    end_y = -np.inf
    prev_merged_into: Optional[int] = None
    y = np.floor(ry0)
    if not has_math and not bars:
        # (with bars present the scan must run: the contained-graphics bonus
        # can tip an all-digit line-set, where score == char count, over)
        y = ry1 + 1.0  # skip the scan; B1 handles everything
    while y <= ry1:
        row = np.nonzero((wy <= y) & (wey >= y) & ~assigned)[0]
        bar_row = (
            np.nonzero((bar_y <= y) & (bar_ey >= y) & ~bar_assigned)[0]
            if bars
            else ()
        )
        if row.size == 0 and len(bar_row) == 0:
            working.clear()
            in_working.clear()
            bar_working.clear()
            skip = False
            min_x = np.inf
            y += 1.0
            continue
        if skip:
            y += 1.0
            continue
        for i in row:
            ii = int(i)
            if ii not in in_working:
                in_working.add(ii)
                working.append(ii)
                min_x = min(min_x, float(w_x[ii]))
                end_y = max(end_y, float(w_ey[ii]))
        for i in bar_row:
            ii = int(i)
            if ii not in bar_working:
                bar_working.add(ii)
                min_x = min(min_x, bars[ii][0])
                end_y = max(end_y, bars[ii][3])
        if min_x < rx0 + FORMULA_INDENT:
            skip = True
            has_skipped = True
            y += 1.0
            continue
        if math_score_exceeds([texts[i] for i in working], len(bar_working)):
            # hungry absorb of contiguous rows
            while y <= end_y + 1.0:
                row = np.nonzero((wy <= y) & (wey >= y) & ~assigned)[0]
                for i in row:
                    ii = int(i)
                    if ii not in in_working:
                        in_working.add(ii)
                        working.append(ii)
                        end_y = max(end_y, float(w_ey[ii]))
                if bars:
                    for i in np.nonzero(
                        (bar_y <= y) & (bar_ey >= y) & ~bar_assigned
                    )[0]:
                        ii = int(i)
                        if ii not in bar_working:
                            bar_working.add(ii)
                            end_y = max(end_y, bars[ii][3])
                y += 1.0
            members = [i for i in working if not assigned[i]]
            assigned[np.array(members, dtype=np.int64)] = True
            for ii in bar_working:
                bar_assigned[ii] = True
            if not has_skipped and blocks:
                blocks[-1].extend(members)
            else:
                blocks.append(members)
            has_skipped = False
            working.clear()
            in_working.clear()
            bar_working.clear()
            min_x = np.inf
            continue
        y += 1.0

    # ---- B1: union-find over slab adjacency -------------------------------
    rest = np.nonzero(~assigned)[0]
    if rest.size:
        bx = [float(r[0]) for r in (blockers or [])]
        by = [float(r[1]) for r in (blockers or [])]
        bex = [float(r[2]) for r in (blockers or [])]
        bey = [float(r[3]) for r in (blockers or [])]
        ax = np.concatenate([w_x[rest].astype(np.float64), np.array(bx)])
        ay = np.concatenate([w_y[rest].astype(np.float64), np.array(by)])
        aex = np.concatenate([w_ex[rest].astype(np.float64), np.array(bex)])
        aey = np.concatenate([w_ey[rest].astype(np.float64), np.array(bey)])
        n_w = rest.size

        uf = _UF(n_w)
        ry_lo = np.floor(ay).astype(np.int64)
        ry_hi = np.floor(aey).astype(np.int64)
        a1, b1 = _slab_pairs(ry_lo, ry_hi, ax, n_w)
        rx_lo = np.floor(ax).astype(np.int64)
        rx_hi = np.floor(aex).astype(np.int64)
        a2, b2 = _slab_pairs(rx_lo, rx_hi, ay, n_w)
        # an adjacent pair recurs once per shared pixel row/column — dedup
        # before the union loop (~10x fewer union calls)
        aa = np.concatenate([a1, a2])
        bb = np.concatenate([b1, b2])
        if aa.size:
            key = np.unique(aa * np.int64(n_w) + bb)
            for k in key:
                uf.union(int(k // n_w), int(k % n_w))

        comp: dict = {}
        for k in range(n_w):
            comp.setdefault(uf.find(k), []).append(int(rest[k]))
        # deterministic discovery order: by first member (input order)
        for root in sorted(comp, key=lambda r: comp[r][0]):
            blocks.append(comp[root])

    def bound(members: List[int]) -> Tuple[float, float, float, float]:
        m = np.array(members, dtype=np.int64)
        return (
            float(w_x[m].min()), float(w_y[m].min()),
            float(w_ex[m].max()), float(w_ey[m].max()),
        )

    blocks = [b for b in blocks if b]
    blocks.sort(key=cmp_to_key(lambda p, q: region_comparator(bound(p), bound(q))))
    return blocks
