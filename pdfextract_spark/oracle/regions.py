"""Page segmentation: whitespace cover, column detection, region tree.

Shared array-based kernel used by BOTH the sequential oracle and the
vectorized engine (same code -> bit-identical results by construction, like
layout.py). Semantics follow the reference's page segmentator
(SURVEY.md §2.3; file:line cites below into /root/reference):

- P3 whitespace cover — Breuel-style best-first max-empty-rectangle search
  (analysis/.../column/WhitespaceFinder.java:85-255): priority queue ordered
  by quality = area * (1 + 0.25*height); pop -> if empty enough (fuzzy
  overlap, WHITESPACE_FUZZINESS=0.2, Constants.java:69) accept; else split
  around the obstacle nearest the centre into <=4 subrectangles with
  obstacle partitioning (splitSearchAreaAround:404-501). Hard caps: 50
  rectangles wanted / 100k queue entries (Constants.java:72-73) — the
  worst-case bound that keeps 10^12-doc latency schedulable.
- P4 column-boundary selection (ColumnFinder.java:56-71,428-499,273-363):
  candidates need aspect h/w > 1.5, height >= 15% of region, not in the
  outer 5% margins; boundaries < 50pt apart are combined
  (combineColumnBoundaries:228-271).
- P5 recursive division (PageSegmentator.recursivelyDivide:306-340): split
  the region at the boundary's middle x; right part = everything right of
  middleX; recurse into both sides.
- P2 media categorization (GraphicSegmentatorImpl.java:61-83): HSEP = thin
  full-ish-width bar; CONTAINER = contains >= 5 texts
  (graphicContainsTextFromRegion:161-178); else IMAGE; too-big dropped to
  IMAGE role without splitting.
- P8 separator split (PageRegionSplitBySeparators.java:64-116): a >=60%
  region-width HSEP intersecting no text splits the region at its y.

All geometry float32. Word rectangles are the obstacles (the reference
operates on the region's contents after word segmentation).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

F32 = np.float32

WHITESPACE_FUZZINESS = 0.2
FUZZ_SHRINK_CAP = 2.0  # px; see find_whitespace fuzz note
WHITESPACE_NUMBER_WANTED = 50
WHITESPACE_MAX_QUEUE = 100_000
COLUMN_MIN_ASPECT = 1.5
COLUMN_MIN_HEIGHT_FRAC = 0.15
COLUMN_MARGIN_FRAC = 0.05
COLUMN_COMBINE_DISTANCE = 50.0
SEPARATOR_MIN_WIDTH_FRAC = 0.6
HSEP_MAX_HEIGHT = 8.0
CONTAINER_MIN_TEXTS = 5

MEDIA_IMAGE = "image"
MEDIA_HSEP = "hsep"
MEDIA_CONTAINER = "container"
MEDIA_MATH_BAR = "math_bar"
# member of a combined hsep stack whose MERGED box still qualifies as a
# separator: the reference removes the members and keeps ONE merged separator
# (combineHorizontalSeparators removeAll + re-add), so members become inert
# for band splitting and the merged box is returned as a synthetic separator
MEDIA_HSEP_MEMBER = "hsep_member"

MATH_BAR_MAX_HEIGHT = 5.0    # GraphicSegmentatorImpl.canBeConsideredMathBar:102
MATH_BAR_MIN_ASPECT = 6.0    # :106
MATH_BAR_LOOKAROUND = 10.0   # findSurrounding distance (:110)


@dataclass
class Region:
    """A leaf page region: word indices + float bound (x, y, ex, ey)."""

    word_idx: List[int]
    bound: Tuple[float, float, float, float]
    boundaries: List[float] = field(default_factory=list)  # column xs consumed
    whitespace: List[Tuple[float, float, float, float]] = field(
        default_factory=list
    )  # rects found at the level that made this a leaf (block trails, B1)


def categorize_media(
    m_x: np.ndarray, m_y: np.ndarray, m_w: np.ndarray, m_h: np.ndarray,
    w_x: np.ndarray, w_y: np.ndarray, w_ex: np.ndarray, w_ey: np.ndarray,
    region_w: float,
    w_texts: Optional[Sequence[str]] = None,
) -> List[str]:
    """P2: per media box -> role string (GraphicSegmentatorImpl semantics).
    MATH_BAR checks first: a fraction bar in a narrow column can satisfy the
    HSEP width fraction, and a math bar must never split the region."""
    from .blocks import _word_has_sm

    roles: List[str] = []
    for i in range(len(m_x)):
        ex = m_x[i] + m_w[i]
        ey = m_y[i] + m_h[i]
        if (
            w_texts is not None
            and m_h[i] <= MATH_BAR_MAX_HEIGHT
            and m_h[i] > 0
            and m_w[i] / m_h[i] >= MATH_BAR_MIN_ASPECT
        ):
            # surrounding = words within LOOKAROUND of the bar bbox
            # (canBeConsideredMathBarInRegion:95-146, conditions verbatim:
            # under := y < bar.endY, over := endY > bar.y, math := any Sm)
            L = MATH_BAR_LOOKAROUND
            near = (
                (w_x < ex + L) & (w_ex > m_x[i] - L)
                & (w_y < ey + L) & (w_ey > m_y[i] - L)
            )
            idx = np.nonzero(near)[0]
            over = under = math = False
            for j in idx:
                if w_y[j] < ey:
                    under = True
                if w_ey[j] > m_y[i]:
                    over = True
                if not math and _word_has_sm(w_texts[int(j)]):
                    math = True
                if over and under and math:
                    break
            if over and under and math:
                roles.append(MEDIA_MATH_BAR)
                continue
        if m_h[i] <= HSEP_MAX_HEIGHT and m_w[i] >= SEPARATOR_MIN_WIDTH_FRAC * region_w:
            roles.append(MEDIA_HSEP)
            continue
        inside = (
            (w_x >= m_x[i]) & (w_ex <= ex) & (w_y >= m_y[i]) & (w_ey <= ey)
        )
        if int(inside.sum()) >= CONTAINER_MIN_TEXTS:
            roles.append(MEDIA_CONTAINER)
        else:
            roles.append(MEDIA_IMAGE)
    return roles


HSEP_COMBINE_DIV = 3          # GraphicSegmentatorImpl.combineHorizontalSeparators:187 (x/3, w/3 "as rounding")
HSEP_COMBINE_DISTANCE = 50.0  # :216 — chain break distance


def _rect_distance(ax, ay, aex, aey, bx, by, bex, bey) -> float:
    """Rectangle.distance(Rectangle):220-241 — 0 when intersecting, else the
    euclidean gap between the nearest edges (float32 math)."""
    d = F32(0.0)
    if ax > bex:
        d += (F32(ax) - F32(bex)) * (F32(ax) - F32(bex))
    elif bx > aex:
        d += (F32(bx) - F32(aex)) * (F32(bx) - F32(aex))
    if ay > bey:
        d += (F32(ay) - F32(bey)) * (F32(ay) - F32(bey))
    elif by > aey:
        d += (F32(by) - F32(aey)) * (F32(by) - F32(aey))
    return float(np.sqrt(d))


def combine_hsep_stacks(roles, m_x, m_y, m_w, m_h):
    """GraphicSegmentatorImpl.combineHorizontalSeparators:182-232 — the
    'table drawn with horizontal lines only' hack. HSEPs sharing the combine
    key (int(x)//3, int(w)//3; the reference key also includes stroke color,
    which this input model does not carry) form a stack; each stack sorts by
    lower y (stable, like Collections.sort) and chains: a member within
    distance 50 of the running box unions into it, a farther one flushes the
    chunk. Returns [(member_indices, (x, y, ex, ey))] per flushed chunk."""
    groups: dict = {}
    for i, r in enumerate(roles):
        if r != MEDIA_HSEP:
            continue
        key = (int(m_x[i]) // HSEP_COMBINE_DIV, int(m_w[i]) // HSEP_COMBINE_DIV)
        groups.setdefault(key, []).append(i)

    out: List[Tuple[List[int], Tuple[float, float, float, float]]] = []
    for key in groups:
        idxs = groups[key]
        if len(idxs) < 2:
            continue
        idxs.sort(key=lambda i: float(m_y[i]))
        run = [idxs[0]]
        i0 = idxs[0]
        bx, by = float(m_x[i0]), float(m_y[i0])
        bex, bey = float(m_x[i0] + m_w[i0]), float(m_y[i0] + m_h[i0])
        for j in idxs[1:]:
            jx, jy = float(m_x[j]), float(m_y[j])
            jex, jey = float(m_x[j] + m_w[j]), float(m_y[j] + m_h[j])
            if _rect_distance(bx, by, bex, bey, jx, jy, jex, jey) > HSEP_COMBINE_DISTANCE:
                out.append((run, (bx, by, bex, bey)))
                run, bx, by, bex, bey = [j], jx, jy, jex, jey
            else:
                run.append(j)
                bx, by = min(bx, jx), min(by, jy)
                bex, bey = max(bex, jex), max(bey, jey)
        out.append((run, (bx, by, bex, bey)))
    return out


def categorize_media_combined(
    m_x: np.ndarray, m_y: np.ndarray, m_w: np.ndarray, m_h: np.ndarray,
    w_x: np.ndarray, w_y: np.ndarray, w_ex: np.ndarray, w_ey: np.ndarray,
    region_w: float,
    w_texts: Optional[Sequence[str]] = None,
) -> Tuple[List[str], List[Tuple[float, float, float, float]]]:
    """P2 + repeated-hsep combining: categorize, then re-categorize each
    merged hsep stack's bounding box (the reference's second
    categorizeGraphics pass, GraphicSegmentatorImpl.java:73-75).

    Returns (roles, synthetic_hseps). A stack of table rules merges into a
    tall box that fails the HSEP height bound and stops splitting the region
    into bands (members take the merged role). When the merged box STILL
    qualifies as a separator (members nearly coincide), the reference keeps
    ONE merged separator in place of the members (removeAll + re-add) — so
    members demote to MEDIA_HSEP_MEMBER and the merged box is returned in
    synthetic_hseps for the caller's band splitting. The member media SPANS
    are still emitted 1:1 (span-sequence contract) — combining affects
    layout analysis only. Chunks that flush as a single unchanged box
    re-categorize to the same role (no-op)."""
    roles = categorize_media(
        m_x, m_y, m_w, m_h, w_x, w_y, w_ex, w_ey, region_w, w_texts
    )
    synth: List[Tuple[float, float, float, float]] = []
    for run, (bx, by, bex, bey) in combine_hsep_stacks(roles, m_x, m_y, m_w, m_h):
        if len(run) < 2:
            continue
        merged_role = categorize_media(
            np.array([bx], dtype=np.float32),
            np.array([by], dtype=np.float32),
            np.array([bex - bx], dtype=np.float32),
            np.array([bey - by], dtype=np.float32),
            w_x, w_y, w_ex, w_ey, region_w, w_texts,
        )[0]
        if merged_role == MEDIA_HSEP:
            merged_role = MEDIA_HSEP_MEMBER
            synth.append((bx, by, bex, bey))
        for i in run:
            roles[i] = merged_role
    return roles, synth


def merge_row_obstacles(o_x, o_y, o_ex, o_ey):
    """Merge obstacles on the same int-y row whose horizontal gap is below
    COLUMN_MIN_CLEARANCE into single segments. Equivalence-preserving for
    column detection: a channel narrower than the clearance minimum is
    rejected by _boundary_ok regardless, so fusing sub-clearance gaps cannot
    remove a valid boundary — it only prunes the whitespace search."""
    n = len(o_x)
    if n == 0:
        return o_x, o_y, o_ex, o_ey
    rows = o_y.astype(np.int64)
    order = np.lexsort((o_x, rows))
    rx, rex = o_x[order], o_ex[order]
    ry, rey = o_y[order], o_ey[order]
    rr = rows[order].tolist()
    lx = rx.tolist()
    lex = rex.tolist()
    # segment break when the row changes or the gap to the segment's running
    # right edge is >= clearance (running max resets per segment)
    seg = np.empty(n, dtype=np.int64)
    seg_id = 0
    seg[0] = 0
    run_ex = lex[0]
    for i in range(1, n):
        if rr[i] != rr[i - 1] or (lx[i] - run_ex) >= COLUMN_MIN_CLEARANCE:
            seg_id += 1
            run_ex = lex[i]
        else:
            if lex[i] > run_ex:
                run_ex = lex[i]
        seg[i] = seg_id
    n_seg = int(seg[-1]) + 1
    gx = np.full(n_seg, np.inf, dtype=np.float64)
    gex = np.full(n_seg, -np.inf, dtype=np.float64)
    gy = np.full(n_seg, np.inf, dtype=np.float64)
    gey = np.full(n_seg, -np.inf, dtype=np.float64)
    np.minimum.at(gx, seg, rx)
    np.maximum.at(gex, seg, rex)
    np.minimum.at(gy, seg, ry)
    np.maximum.at(gey, seg, rey)
    return (
        gx.astype(np.float32), gy.astype(np.float32),
        gex.astype(np.float32), gey.astype(np.float32),
    )


def _quality(w: float, h: float) -> float:
    # WhitespaceFinder.java:161-163: area * (1 + height*0.25)
    return w * h * (1.0 + 0.25 * h)


def find_whitespace(
    bound: Tuple[float, float, float, float],
    ob_x: np.ndarray,
    ob_y: np.ndarray,
    ob_ex: np.ndarray,
    ob_ey: np.ndarray,
    min_w: float,
    min_h: float,
    n_wanted: int = WHITESPACE_NUMBER_WANTED,
    max_queue: int = WHITESPACE_MAX_QUEUE,
) -> List[Tuple[float, float, float, float]]:
    """P3 kernel: maximal empty rectangles (x, y, ex, ey), best-first.

    Obstacles are fuzz-shrunk by WHITESPACE_FUZZINESS of their size
    (isEmptyEnough's <=20%-overlap admission, applied geometrically).
    Deterministic: heap ties broken by insertion counter.
    """
    # Fuzz-shrink obstacles (isEmptyEnough's <=20%-overlap admission). The
    # reference's obstacles are WORD-sized, so 10% per side is ~1px; ours may
    # be row-merged segments (merge_row_obstacles) where 10% of a full line
    # would carve out fake margins — cap the shrink at word scale.
    fx = WHITESPACE_FUZZINESS / 2.0
    dx = np.minimum((ob_ex - ob_x) * fx, FUZZ_SHRINK_CAP)
    dy = np.minimum((ob_ey - ob_y) * fx, FUZZ_SHRINK_CAP)
    sx = ob_x + dx
    sy = ob_y + dy
    sex = ob_ex - dx
    sey = ob_ey - dy

    x0, y0, x1, y1 = bound
    all_idx = np.arange(len(ob_x))
    inside = ~((sex <= x0) | (sx >= x1) | (sey <= y0) | (sy >= y1))
    start_obs = all_idx[inside]

    counter = 0
    heap = [(-_quality(x1 - x0, y1 - y0), counter, (x0, y0, x1, y1), start_obs)]
    found: List[Tuple[float, float, float, float]] = []
    pops = 0

    while heap and len(found) < n_wanted and pops < max_queue:
        negq, _, rect, obs = heapq.heappop(heap)
        pops += 1
        rx0, ry0, rx1, ry1 = rect
        if rx1 - rx0 < min_w or ry1 - ry0 < min_h:
            continue
        # refresh: drop obstacles no longer intersecting (stale-entry repair)
        live = obs[
            ~(
                (sex[obs] <= rx0)
                | (sx[obs] >= rx1)
                | (sey[obs] <= ry0)
                | (sy[obs] >= ry1)
            )
        ]
        if live.size == 0:
            # also must not overlap previously accepted whitespace
            clash = False
            for fx0, fy0, fx1, fy1 in found:
                if not (fx1 <= rx0 or fx0 >= rx1 or fy1 <= ry0 or fy0 >= ry1):
                    clash = True
                    break
            if clash:
                continue
            found.append(rect)
            continue
        # pivot = obstacle whose centre is nearest the rect centre
        cx = (rx0 + rx1) / 2.0
        cy = (ry0 + ry1) / 2.0
        ocx = (sx[live] + sex[live]) / 2.0
        ocy = (sy[live] + sey[live]) / 2.0
        d2 = (ocx - cx) ** 2 + (ocy - cy) ** 2
        p = live[int(np.argmin(d2))]
        px0, py0, px1, py1 = float(sx[p]), float(sy[p]), float(sex[p]), float(sey[p])

        for nr in (
            (rx0, ry0, px0, ry1),  # left of pivot
            (px1, ry0, rx1, ry1),  # right of pivot
            (rx0, ry0, rx1, py0),  # above pivot
            (rx0, py1, rx1, ry1),  # below pivot
        ):
            nx0, ny0, nx1, ny1 = nr
            if nx1 - nx0 < min_w or ny1 - ny0 < min_h:
                continue
            sub = live[
                ~(
                    (sex[live] <= nx0)
                    | (sx[live] >= nx1)
                    | (sey[live] <= ny0)
                    | (sy[live] >= ny1)
                )
            ]
            counter += 1
            heapq.heappush(
                heap, (-_quality(nx1 - nx0, ny1 - ny0), counter, nr, sub)
            )
    return found


COLUMN_MIN_CLEARANCE = 6.0   # ColumnFinder.adjustColumn:113-135 — a boundary
                             # may not split words closer than 6pt
COLUMN_MIN_FLANK = 4         # filter:273-363 — >=4 contents with >=5 chars
COLUMN_FLANK_MIN_CHARS = 5


FLANK_LOOKAHEAD = 10.0  # ColumnFinder.selectCandidateColumnBoundaries:431


def _flank_counts(
    ws_x0: float, ws_x1: float, ay0: float, ay1: float,
    w_x, w_y, w_ex, w_ey,
) -> Tuple[int, int]:
    """Texts immediately flanking the whitespace channel (selectCandidate
    ColumnBoundaries:446-483): left = words whose endX is within variance
    LOOKAHEAD of channel.x + LOOKAHEAD/2, right = words whose x is within
    variance of channel.endX + LOOKAHEAD/2; y-overlapping the channel."""
    half = FLANK_LOOKAHEAD / 2.0
    yov = (w_y < ay1) & (w_ey > ay0)
    left = int(
        (
            yov
            & (w_ex >= ws_x0 + half - FLANK_LOOKAHEAD)
            & (w_ex <= ws_x0 + half + FLANK_LOOKAHEAD)
        ).sum()
    )
    right = int(
        (
            yov
            & (w_x >= ws_x1 + half - FLANK_LOOKAHEAD)
            & (w_x <= ws_x1 + half + FLANK_LOOKAHEAD)
        ).sum()
    )
    return left, right


def _boundary_ok(
    mid: float, wy0: float, wy1: float,
    w_x, w_y, w_ex, w_ey, w_tlen,
) -> bool:
    """Reference P4 filters applied over the WHOLE region (the split is
    full-height, PageSegmentator.recursivelyDivide:306-340): every text row
    with words on both sides of the boundary must have >=6pt clearance at it
    (adjustColumn's would-split-words check), and both sides need >=4 words
    of >=5 chars. Words are assigned to sides by centre x, mirroring
    extractSubRegionFromBound's content moves."""
    if len(w_x) == 0:
        return True
    centers = (w_x + w_ex) * 0.5
    left_mask = centers < mid
    right_mask = ~left_mask
    # reference checks the LEFT side only (filter:273-363); the right side
    # may be sparse (short trailing column). Ragged-edge false boundaries
    # are rejected by the clearance set, and an empty right side by the
    # split itself. At least one real word must still sit on the right.
    n_left = int(((w_tlen >= COLUMN_FLANK_MIN_CHARS) & left_mask).sum())
    if n_left < COLUMN_MIN_FLANK or not bool(right_mask.any()):
        return False
    rows = w_y.astype(np.int64)
    for row in np.unique(rows):
        rm = rows == row
        le = w_ex[rm & left_mask]
        re = w_x[rm & right_mask]
        if le.size and re.size:
            if float(re.min()) - float(le.max()) < COLUMN_MIN_CLEARANCE:
                return False
    return True


def _forbidden_intervals(w_x, w_ex, w_y) -> List[Tuple[float, float]]:
    """Merged x-intervals where a full-height boundary would split words
    closer than COLUMN_MIN_CLEARANCE (adjustColumn's would-split check,
    evaluated exactly instead of by probing). Per text row, a boundary
    falling between the centres of adjacent words i, i+1 splits them; the
    split is illegal when x_{i+1} - max(ex_1..i) < clearance. The union over
    rows is the forbidden set; its complement is where boundaries may go."""
    rows = w_y.astype(np.int64)
    centers = (w_x + w_ex) * 0.5
    bad: List[Tuple[float, float]] = []
    for row in np.unique(rows):
        rm = rows == row
        order = np.argsort(centers[rm], kind="stable")
        cx = centers[rm][order]
        rx = w_x[rm][order]
        rex = w_ex[rm][order]
        if cx.size < 2:
            continue
        runmax_ex = np.maximum.accumulate(rex)
        suffmin_x = np.minimum.accumulate(rx[::-1])[::-1]
        clear = suffmin_x[1:] - runmax_ex[:-1]
        viol = np.nonzero(clear < COLUMN_MIN_CLEARANCE)[0]
        for i in viol:
            bad.append((float(cx[i]), float(cx[i + 1])))
    if not bad:
        return []
    bad.sort()
    merged = [list(bad[0])]
    for lo, hi in bad[1:]:
        if lo <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    return [(lo, hi) for lo, hi in merged]


def _best_allowed_x(lo: float, hi: float, forbidden) -> Optional[float]:
    """Midpoint of the widest allowed subinterval of [lo, hi] (ties ->
    leftmost); None if fully forbidden."""
    if hi <= lo:
        return None
    pieces = [(lo, hi)]
    for flo, fhi in forbidden:
        nxt = []
        for plo, phi in pieces:
            if fhi <= plo or flo >= phi:
                nxt.append((plo, phi))
                continue
            if flo > plo:
                nxt.append((plo, flo))
            if fhi < phi:
                nxt.append((fhi, phi))
        pieces = nxt
        if not pieces:
            return None
    best = max(pieces, key=lambda p: (p[1] - p[0], -p[0]))
    if best[1] - best[0] <= 0:
        return None
    return (best[0] + best[1]) / 2.0


def _extend_column(
    probe: float, wy0: float, wy1: float, ry0: float, ry1: float,
    w_x, w_y, w_ex, w_ey,
) -> Tuple[float, float]:
    """P4 adjustColumn (ColumnFinder.adjustColumn:75-168): extend a 2px-wide
    column at `probe` vertically from the seed whitespace's y-range until
    blocked by content intersecting the strip, clamped to the region. The
    whitespace cover returns MAXIMAL rects, so a tall thin gutter overlapped
    by two fat maximal rects never appears as its own rect — the extension
    recovers its full height from any seed fragment."""
    if w_x is None or len(w_x) == 0:
        return ry0, ry1
    strip = (w_x < probe + 1.0) & (w_ex > probe - 1.0)
    if not bool(strip.any()):
        return ry0, ry1
    sy = w_y[strip]
    sey = w_ey[strip]
    above = sey[sey <= wy0 + 1e-6]
    below = sy[sy >= wy1 - 1e-6]
    ay0 = float(above.max()) if above.size else ry0
    ay1 = float(below.min()) if below.size else ry1
    return max(ay0, ry0), min(ay1, ry1)


def column_boundaries(
    bound: Tuple[float, float, float, float],
    whitespace: Sequence[Tuple[float, float, float, float]],
    w_x=None, w_y=None, w_ex=None, w_ey=None, w_tlen=None,
) -> List[float]:
    """P4: select whitespace rects that are column boundaries; return chosen
    boundary x positions, <50pt-apart groups combined (tallest wins).
    Candidate heights are adjustColumn-extended before the aspect/height
    filters (see _extend_column)."""
    x0, y0, x1, y1 = bound
    rh = y1 - y0
    rw = x1 - x0
    forbidden = (
        _forbidden_intervals(w_x, w_ex, w_y) if w_x is not None else []
    )
    cands: List[Tuple[float, float]] = []  # (boundary_x, height)
    for wx0, wy0, wx1, wy1 in whitespace:
        w = wx1 - wx0
        if w <= 0:
            continue
        lo = max(wx0 + 1.0, x0 + COLUMN_MARGIN_FRAC * rw)
        hi = min(wx1 - 1.0, x1 - COLUMN_MARGIN_FRAC * rw)
        probe = _best_allowed_x(lo, hi, forbidden)
        if probe is None:
            continue
        ay0, ay1 = _extend_column(probe, wy0, wy1, y0, y1, w_x, w_y, w_ex, w_ey)
        h = ay1 - ay0
        # a channel clear over (nearly) the whole region height is a column
        # boundary regardless of the seed rect's width — adjustColumn's
        # tallest-wins semantics; otherwise the aspect gate applies
        full_height = h >= 0.8 * rh
        if not full_height and h / max(w, 1e-6) <= COLUMN_MIN_ASPECT:
            continue
        if h < COLUMN_MIN_HEIGHT_FRAC * rh:
            continue
        if w_x is not None:
            lf, rf = _flank_counts(wx0, wx1, ay0, ay1, w_x, w_y, w_ex, w_ey)
            if lf == 0 and rf < 8:
                continue
            if rf == 0 and lf < 8:
                continue
            if lf < 3 and rf < 3:
                continue
        if w_x is not None and not _boundary_ok(
            probe, ay0, ay1, w_x, w_y, w_ex, w_ey, w_tlen
        ):
            continue
        cands.append((probe, h))
    cands.sort()
    combined: List[float] = []
    i = 0
    while i < len(cands):
        group = [cands[i]]
        j = i + 1
        while j < len(cands) and cands[j][0] - group[-1][0] < COLUMN_COMBINE_DISTANCE:
            group.append(cands[j])
            j += 1
        best = max(group, key=lambda t: (t[1], -t[0]))
        combined.append(best[0])
        i = j
    return combined


def split_by_separators(
    bound: Tuple[float, float, float, float],
    word_idx: np.ndarray,
    w_y: np.ndarray,
    w_ey: np.ndarray,
    seps_y: Sequence[float],
) -> List[Tuple[Tuple[float, float, float, float], np.ndarray]]:
    """P8: split a region at separator y positions (top-down)."""
    x0, y0, x1, y1 = bound
    cuts = sorted(float(s) for s in seps_y if y0 < s < y1)
    out = []
    last = y0
    for c in cuts + [y1]:
        sel = word_idx[(w_y[word_idx] >= last) & (w_ey[word_idx] <= c)]
        if sel.size:
            out.append(((x0, last, x1, c), sel))
        last = c
    if not out:
        out.append((bound, word_idx))
    return out


def divide_region(
    bound: Tuple[float, float, float, float],
    word_idx: np.ndarray,
    w_x: np.ndarray,
    w_y: np.ndarray,
    w_ex: np.ndarray,
    w_ey: np.ndarray,
    w_tlen: np.ndarray,
    min_w: float,
    min_h: float,
    obs: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = None,
    depth: int = 0,
) -> List[Region]:
    """P3+P4+P5: recursive column division of one region. Returns leaf
    regions in left-to-right order."""
    if word_idx.size == 0:
        return []
    if depth >= 3:  # reference recursion is bounded by physical page shape
        return [Region(list(map(int, word_idx)), bound)]
    # obstacles = this region's words + ALL media boxes (graphics are region
    # contents in the reference; find_whitespace bound-filters them itself)
    if obs is not None:
        o_x = np.concatenate([w_x[word_idx], obs[0]])
        o_y = np.concatenate([w_y[word_idx], obs[1]])
        o_ex = np.concatenate([w_ex[word_idx], obs[2]])
        o_ey = np.concatenate([w_ey[word_idx], obs[3]])
    else:
        o_x, o_y, o_ex, o_ey = (
            w_x[word_idx], w_y[word_idx], w_ex[word_idx], w_ey[word_idx]
        )
    # column-purposed search: a whitespace shorter than the column height
    # minimum can never produce a boundary (children never outgrow parents),
    # so pruning at COLUMN_MIN_HEIGHT_FRAC * region height is sound and cuts
    # the best-first expansion by orders of magnitude
    col_min_h = max(min_h, COLUMN_MIN_HEIGHT_FRAC * (bound[3] - bound[1]))
    o_x, o_y, o_ex, o_ey = merge_row_obstacles(o_x, o_y, o_ex, o_ey)
    ws = find_whitespace(
        bound, o_x, o_y, o_ex, o_ey,
        min_w=min_w, min_h=col_min_h, n_wanted=12,
    )
    # re-index whitespace obstacles back to absolute rects (they already are)
    bounds_x = column_boundaries(
        bound, ws,
        w_x[word_idx], w_y[word_idx], w_ex[word_idx], w_ey[word_idx],
        w_tlen[word_idx],
    )
    if not bounds_x:
        return [Region(list(map(int, word_idx)), bound, whitespace=list(ws))]
    # split at the leftmost boundary; right part recurses on the rest
    # (PageSegmentator.recursivelyDivide: right part = everything right of
    # boundary middleX)
    mid = bounds_x[0]
    x0, y0, x1, y1 = bound
    centers = (w_x[word_idx] + w_ex[word_idx]) * 0.5
    left_sel = word_idx[centers < mid]
    right_sel = word_idx[centers >= mid]
    if left_sel.size == 0 or right_sel.size == 0:
        return [Region(list(map(int, word_idx)), bound, whitespace=list(ws))]
    left = divide_region(
        (x0, y0, mid, y1), left_sel, w_x, w_y, w_ex, w_ey, w_tlen,
        min_w, min_h, obs, depth + 1
    )
    right = divide_region(
        (mid, y0, x1, y1), right_sel, w_x, w_y, w_ex, w_ey, w_tlen,
        min_w, min_h, obs, depth + 1
    )
    for r in left + right:
        r.boundaries = bounds_x
    return left + right


TOP_SPLIT_FRACTION = 0.4     # PageSegmentator.analyzePage: splitOfTopTextOfPage(0.4)
TOP_SPLIT_MIN_DIST = 10      # PageRegionSplitBySpacing.splitOfTopTextOfPage:52
BAND_SPLIT_MIN_DIST = 20     # PageRegionSplitBySpacing.splitRegionHorizontally:60


def split_ys_by_spacing(
    region_y1: float,
    w_y: np.ndarray,
    w_ey: np.ndarray,
    w_style_keys: Sequence,
    w_weights: Sequence[int],
    same_style,
    start_y: float,
    end_y: float,
    min_dist: float,
    o_y: Optional[np.ndarray] = None,
    o_ey: Optional[np.ndarray] = None,
) -> List[float]:
    """P7/P9 kernel (PageRegionSplitBySpacing.tryHorizontalSplit:83-151).

    Scan integer rows from start_y to end_y; accumulate seen content into a
    working set. At an empty row >= min_dist below the last non-empty row,
    split iff the letter-weighted dominating style above differs from the one
    of the first non-empty row below (styleCompare != SAME_STYLE — big-text
    counts as different, :66-81). After a split the working set clears and
    scanning continues in the lower part (activeRegion advance, :132-140).

    `same_style(a, b)` compares two style keys; keys are whatever the caller
    indexes styles with (Style objects in the oracle, LUT ints in the engine)
    so the kernel is shared and parity is structural.

    o_y/o_ey are non-text obstacles (media boxes): they occupy rows — the
    reference's findContentAtYIndex returns graphics too, so a figure blocks
    a split through its band — but carry no style weight. A below-row with
    obstacles and no text yields no style to compare, so no split there.
    """
    n = len(w_y)
    if n == 0:
        return []
    wy = np.asarray(w_y, dtype=np.float64)
    wey = np.asarray(w_ey, dtype=np.float64)

    # Event-based equivalent of the reference's 1px row scan: the split
    # decision is invariant within one empty gap (working set and under-row
    # don't change between occupied rows), so each gap is checked ONCE at its
    # first qualifying row (last occupied row + min_dist) instead of per row.
    r0 = int(np.floor(start_y))
    stop = min(float(end_y), float(region_y1))
    R1 = int(np.floor(region_y1))
    if R1 < r0:
        return []
    size = R1 - r0 + 2

    # word rows: (wy <= y) & (wey >= y) for integer y -> ceil(wy)..floor(wey)
    w_lo = np.maximum(np.ceil(wy).astype(np.int64), r0)
    w_hi = np.minimum(np.floor(wey).astype(np.int64), R1)
    wv = w_lo <= w_hi
    word_occ = np.zeros(size, dtype=np.int64)
    np.add.at(word_occ, w_lo[wv] - r0, 1)
    np.add.at(word_occ, w_hi[wv] - r0 + 1, -1)
    word_occ = np.cumsum(word_occ)[:-1] > 0

    occ = word_occ.copy()
    if o_y is not None and len(o_y):
        oy = np.asarray(o_y, dtype=np.float64)
        oey = np.asarray(o_ey, dtype=np.float64)
        o_lo = np.maximum(np.ceil(oy).astype(np.int64), r0)
        o_hi = np.minimum(np.floor(oey).astype(np.int64), R1)
        ov = o_lo <= o_hi
        obs_occ = np.zeros(size, dtype=np.int64)
        np.add.at(obs_occ, o_lo[ov] - r0, 1)
        np.add.at(obs_occ, o_hi[ov] - r0 + 1, -1)
        occ |= np.cumsum(obs_occ)[:-1] > 0

    occ_rows = np.nonzero(occ)[0] + r0
    if occ_rows.size == 0:
        return []

    # words in scan-entry order (row, then input index — matches the
    # original per-row np.nonzero accumulation)
    widx = np.nonzero(wv)[0]
    widx = widx[np.argsort(w_lo[widx], kind="stable")]
    entries = w_lo[widx]

    def dominating(idx_iter) -> Optional[object]:
        weights: dict = {}
        order: dict = {}
        rank = 0
        for i in idx_iter:
            k = w_style_keys[i]
            weights[k] = weights.get(k, 0) + int(w_weights[i])
            if k not in order:
                order[k] = rank
            rank += 1
        if not weights:
            return None
        return max(weights, key=lambda k: (weights[k], -order[k]))

    splits: List[float] = []
    weights: dict = {}
    order: dict = {}
    rank = 0
    ptr = 0
    prev_row: Optional[int] = None
    max_scan = int(np.floor(stop))
    for k in range(occ_rows.size):
        row = int(occ_rows[k])
        if prev_row is not None and row - prev_row > 1 and weights:
            ystar = float(prev_row) + float(min_dist)
            if ystar <= stop and ystar < row:
                # under = the next occupied row, IF it has words (an
                # obstacle-only band below yields nothing to compare)
                under_words = widx[(w_lo[widx] <= row) & (w_hi[widx] >= row)]
                if under_words.size:
                    over_dom = max(
                        weights, key=lambda s: (weights[s], -order[s])
                    )
                    under_dom = dominating(int(i) for i in under_words)
                    if under_dom is not None and not same_style(over_dom, under_dom):
                        splits.append(ystar)
                        weights = {}
                        order = {}
                        rank = 0
        if row > max_scan:
            break
        # add words entering at this row to the working set
        while ptr < entries.size and entries[ptr] <= row:
            i = int(widx[ptr])
            kkey = w_style_keys[i]
            weights[kkey] = weights.get(kkey, 0) + int(w_weights[i])
            if kkey not in order:
                order[kkey] = rank
            rank += 1
            ptr += 1
        prev_row = row
    return splits


def region_sort_key(r: Region):
    """B6 regionComparator-lite: regions ordered left-to-right when
    x-disjoint, else top-down (Sorting.java:104-130)."""
    x0, y0, x1, y1 = r.bound
    return (round(x0, 1), round(y0, 1))


def analyze_page_regions(
    page_bound: Tuple[float, float, float, float],
    w_x: np.ndarray,
    w_y: np.ndarray,
    w_ex: np.ndarray,
    w_ey: np.ndarray,
    w_tlen: np.ndarray,
    hsep_ys: Sequence[float],
    min_col_spacing: float,
    min_row_spacing: float,
    media_obs: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = None,
    style_info: Optional[Tuple[Sequence, Sequence[int], object]] = None,
    page_dims: Optional[Tuple[float, float]] = None,
) -> List[Region]:
    """Full page -> ordered leaf regions: P7 top-of-page style split + P8
    separator splits, then P3-P5 column division per horizontal band, then P9
    large-horizontal-band division of the resulting subregions. Bands keep
    top-down order; columns within a band go left-to-right.

    style_info = (style_keys, letter_weights, same_style_callable) enables
    the P7/P9 style-aware splits; page_dims = (page_top, page_height)."""
    n = len(w_x)
    if n == 0:
        return []
    all_idx = np.arange(n)
    # content bound (region shrinks to its contents, PhysicalPageRegion style)
    x0 = float(w_x.min())
    y0 = float(w_y.min())
    x1 = float(w_ex.max())
    y1 = float(w_ey.max())
    cuts = [float(s) for s in hsep_ys]
    m_y = media_obs[1] if media_obs is not None else None
    m_ey = media_obs[3] if media_obs is not None else None
    if style_info is not None and page_dims is not None:
        keys, weights, same = style_info
        top, height = page_dims
        cuts += split_ys_by_spacing(
            y1, w_y, w_ey, keys, weights, same,
            start_y=top, end_y=top + TOP_SPLIT_FRACTION * height,
            min_dist=TOP_SPLIT_MIN_DIST,
            o_y=m_y, o_ey=m_ey,
        )
    bands = split_by_separators((x0, y0, x1, y1), all_idx, w_y, w_ey, cuts)
    per_band: List[List[Region]] = []
    for bband, bidx in bands:
        bx0 = float(w_x[bidx].min())
        by0 = float(w_y[bidx].min())
        bx1 = float(w_ex[bidx].max())
        by1 = float(w_ey[bidx].max())
        regions = divide_region(
            (bx0, by0, bx1, by1), bidx, w_x, w_y, w_ex, w_ey, w_tlen,
            min_w=min_col_spacing, min_h=min_row_spacing, obs=media_obs,
        )
        per_band.append(regions)
    # P9: re-split finished SUBregions on large empty horizontal bands
    # (divideRegionsByLargeHorizontalBands — operates on subregions only, so
    # an unsplit page [single leaf == main region] is exempt)
    total = sum(len(r) for r in per_band)
    if style_info is not None and total > 1:
        keys, weights, same = style_info
        for bi, regions in enumerate(per_band):
            expanded: List[Region] = []
            for r in regions:
                idx = np.asarray(r.word_idx, dtype=np.int64)
                ro_y = ro_ey = None
                if media_obs is not None:
                    # only obstacles x-overlapping this region block its rows
                    mo = (media_obs[2] > r.bound[0]) & (media_obs[0] < r.bound[2])
                    ro_y, ro_ey = m_y[mo], m_ey[mo]
                splits = split_ys_by_spacing(
                    r.bound[3], w_y[idx], w_ey[idx],
                    [keys[i] for i in idx], [weights[i] for i in idx], same,
                    start_y=r.bound[1], end_y=r.bound[3],
                    min_dist=BAND_SPLIT_MIN_DIST,
                    o_y=ro_y, o_ey=ro_ey,
                )
                if not splits:
                    expanded.append(r)
                    continue
                for sb, sidx in split_by_separators(
                    r.bound, idx, w_y, w_ey, splits
                ):
                    sub = Region(list(map(int, sidx)), sb)
                    sub.boundaries = r.boundaries
                    sub.whitespace = [
                        ws for ws in r.whitespace if ws[3] > sb[1] and ws[1] < sb[3]
                    ]
                    expanded.append(sub)
            per_band[bi] = expanded
    out: List[Region] = []
    for regions in per_band:
        regions.sort(key=region_sort_key)
        out.extend(regions)
    return out
