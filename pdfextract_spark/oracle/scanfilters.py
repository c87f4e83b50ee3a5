"""Scan-stage character filters (S6/S8/S9), shared by oracle and engine.

Operate on the whole-document CharTable straight after tokenization, before
word segmentation — the reference applies them during/at the end of the
content-stream scan (SURVEY.md §2.1):

- S6 overprint dedup (PDFBoxIntegration.textAlreadyRenderedAtSamePlace:
  696-742): a char re-rendered at (approximately) the same position —
  bold-by-overstrike — is dropped. The reference admits a width/len/3
  tolerance; the relational formulation (dropDuplicates on the quantized
  position bucket) is used here: key = (page, style, char, round(x), round(y)).
- S8 bad-font filter (filterOutBadFonts:638-679): any font whose glyphs are
  more than 10% ISO-control characters loses ALL its glyphs.
- S9 control-code filter (filterOutControlCodes:681-694): remaining
  ISO-control glyphs are dropped individually.

Pure function of (CharTable, styles); both pipelines call it, so parity is
structural.
"""

from __future__ import annotations

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

    is_ctrl = np.fromiter(
        (_is_control_char(c) for c in table.char), dtype=bool, count=n
    )

    # S8: per-style (font) control ratio over the whole document
    style_total = np.bincount(table.style_idx, minlength=len(styles))
    style_ctrl = np.bincount(
        table.style_idx, weights=is_ctrl.astype(np.float64), minlength=len(styles)
    )
    with np.errstate(invalid="ignore", divide="ignore"):
        ratio = np.where(style_total > 0, style_ctrl / style_total, 0.0)
    bad_style = ratio > BAD_FONT_CONTROL_RATIO
    keep = ~bad_style[table.style_idx]

    # S9: drop remaining control glyphs
    keep &= ~is_ctrl

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
        char=[table.char[i] for i in idx],
        offset=table.offset[idx],
    )
