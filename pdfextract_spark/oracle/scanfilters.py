"""Scan-stage character filters (S6/S7/S8/S9/S10), shared by oracle and engine.

Operate on the whole-document CharTable straight after tokenization, before
word segmentation — the reference applies them during/at the end of the
content-stream scan (SURVEY.md §2.1):

- S6 overprint dedup (PDFBoxIntegration.textAlreadyRenderedAtSamePlace:
  696-742): a char re-rendered at (approximately) the same position —
  bold-by-overstrike — is dropped. The reference admits a width/len/3
  tolerance; the relational formulation (dropDuplicates on the quantized
  position bucket) is used here: key = (page, style, char, round(x), round(y)).
- S10 rotation filter (processTextPosition:415-422): glyphs whose direction
  is not within 1% of the page rotation (0 here) are dropped.
- S7 diacritic merge (processTextPosition:424-457): a combining mark whose
  bbox the adjacent (lookback/lookahead 1, scan order) glyph contains is
  merged into that glyph's text; runs AFTER overprint dedup like the
  reference's per-glyph pipeline.
- S8 bad-font filter (filterOutBadFonts:638-679): any font whose glyphs are
  more than 10% ISO-control characters loses ALL its glyphs.
- S9 control-code filter (filterOutControlCodes:681-694): remaining
  ISO-control glyphs are dropped individually.

Pure function of (CharTable, styles); both pipelines call it, so parity is
structural.
"""

from __future__ import annotations

import unicodedata
from typing import List, Tuple

import numpy as np

from ..config import CONFIG, EngineConfig
from ..layout import CharTable
from .style import Style

BAD_FONT_CONTROL_RATIO = 0.10


def _is_control_char(c: str) -> bool:
    return c < " " or "\x7f" <= c <= "\x9f"


def apply_scan_filters(
    table: CharTable, styles: List[Style], cfg: EngineConfig = CONFIG
) -> CharTable:
    n = len(table)
    if n == 0:
        return table

    # S10: wrong-direction glyphs (page rotation is 0; isWithinPercent(,,1))
    keep = table.rot == 0

    # S6: overprint dedup on the quantized position bucket (first wins).
    # Vectorized: stable lexsort groups identical keys while preserving input
    # order within a group, so the non-first members of each run are dropped.
    cand = np.nonzero(keep)[0]
    if cand.size > 1:
        chars = np.asarray([table.char[i] for i in cand])
        qx = np.round(table.x[cand].astype(np.float64), 2)
        qy = np.round(table.y[cand].astype(np.float64), 2)
        page = table.page[cand]
        style = table.style_idx[cand]
        order = np.lexsort((qy, qx, chars, style, page))
        p, s, c, X, Y = page[order], style[order], chars[order], qx[order], qy[order]
        same = (
            (p[1:] == p[:-1])
            & (s[1:] == s[:-1])
            & (c[1:] == c[:-1])
            & (X[1:] == X[:-1])
            & (Y[1:] == Y[:-1])
        )
        dup = np.zeros(cand.size, dtype=bool)
        dup[order[1:]] = same
        keep[cand[dup]] = False

    # S7: merge combining marks into the adjacent surviving base glyph
    # (lookback 1 in scan order, both directions; the reference's `contains`
    # check becomes an x/y bbox-containment test with a 0.01 tolerance)
    out_char = list(table.char)
    comb_idx = [
        i
        for i in np.nonzero(keep)[0]
        if table.char[i] and unicodedata.combining(table.char[i][0]) != 0
    ]
    if comb_idx:
        surv = np.nonzero(keep)[0].tolist()
        pos_of = {g: k for k, g in enumerate(surv)}

        def contains(b, m):
            return (
                table.page[b] == table.page[m]
                and float(table.x[m]) >= float(table.x[b]) - 0.01
                and float(table.x[m] + table.w[m]) <= float(table.x[b] + table.w[b]) + 0.01
                and float(table.y[m]) >= float(table.y[b]) - 0.01
                and float(table.y[m] + table.h[m]) <= float(table.y[b] + table.h[b]) + 0.01
            )

        for i in comb_idx:
            k = pos_of[i]
            prev = surv[k - 1] if k > 0 else None
            nxt = surv[k + 1] if k + 1 < len(surv) else None
            if prev is not None and keep[prev] and contains(prev, i):
                out_char[prev] = out_char[prev] + out_char[i]
                keep[i] = False
            elif nxt is not None and keep[nxt] and contains(nxt, i):
                out_char[nxt] = out_char[i] + out_char[nxt]
                keep[i] = False

    # S8: per-style (font) control ratio over the surviving document glyphs
    is_ctrl = np.fromiter(
        (_is_control_char(c) for c in out_char), dtype=bool, count=n
    ) & keep
    kept_style = table.style_idx[keep]
    style_total = np.bincount(kept_style, minlength=len(styles))
    style_ctrl = np.bincount(
        table.style_idx[is_ctrl & keep], minlength=len(styles)
    )
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = np.where(style_total > 0, style_ctrl / np.maximum(style_total, 1), 0.0)
    bad_style = ratio > BAD_FONT_CONTROL_RATIO
    keep &= ~bad_style[table.style_idx]

    # S9: drop remaining control glyphs
    keep &= ~is_ctrl

    if bool(keep.all()):
        return table
    idx = np.nonzero(keep)[0]
    return CharTable(
        page=table.page[idx],
        x=table.x[idx],
        y=table.y[idx],
        w=table.w[idx],
        h=table.h[idx],
        baseline=table.baseline[idx],
        style_idx=table.style_idx[idx],
        char=[out_char[i] for i in idx],
        offset=table.offset[idx],
        rot=table.rot[idx],
    )
