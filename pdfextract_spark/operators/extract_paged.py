"""Page-parallel extraction for oversized documents.

The narrow path (operators/extract.py) processes one document per task; a
10k-page document therefore stalls its task no matter how the corpus is
partitioned — the last skew band size-banding alone cannot fix (SURVEY.md §7
known-hard #4). This operator splits the per-document pipeline at its two
natural seams, both already factored in engine/vectorized.py:

  stage A (per doc, cheap):  tokenize + scan filters (S6-S10 are doc-local)
                             -> char/media rows keyed (doc_id, page)
  stage B (per PAGE):        word segmentation + full geometric analysis
                             (_analyze_one_page) -> line/region/block/caption
                             rows keyed doc_id   [the expensive 70-80%]
  stage C (per doc, cheap):  rebuild the per-page structures and run the
                             UNCHANGED doc-level tail (_finalize_document:
                             L1-L6 + ordered assembly)

Pages are independent through stage B (proved in SURVEY.md §3 — the only
doc-level couplings are the scan filters, kept in stage A, and the logical
ops, kept in stage C), so one huge document fans out across the cluster and
re-converges as a single small group of line rows. Costs two shuffles, so
it is the OVERSIZED band's path — pipeline.run_extraction routes normal
documents through the narrow operator.

Output is row-for-row identical to extract_spans (tests/test_extract_paged.py
asserts equality): float32 geometry survives the shuffle because the word
payload is serialized as float32 arrays and the derived fields (ex = x + w)
are recomputed with the same float32 adds the narrow path uses.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import CONFIG, EngineConfig
from ..engine.vectorized import (
    Paragraph,
    _analyze_one_page,
    _finalize_document,
    _Glyphs,
    _style_luts,
    _WordTable,
)
from ..layout import MediaBox, doc_styles, layout_document
from ..operators.extract import OUTPUT_SCHEMA, _spans_to_lists
from ..oracle.scanfilters import apply_scan_filters

CHAR_SCHEMA = (
    "doc_id string, page int, ord long, is_media boolean, x float, y float, "
    "w float, h float, baseline float, style_idx int, char string, off int, "
    "media_ref string"
)

PAGE_SCHEMA = (
    "doc_id string, page int, rkind string, a int, b int, c int, "
    "f0 float, f1 float, f2 float, f3 float, text string, origin long, "
    "wx array<float>, wy array<float>, ww array<float>, wh array<float>, "
    "wstyle array<int>, worigin array<long>, wtext array<string>"
)

_EMPTY = {
    "f0": 0.0, "f1": 0.0, "f2": 0.0, "f3": 0.0, "text": "", "origin": 0,
    "wx": None, "wy": None, "ww": None, "wh": None,
    "wstyle": None, "worigin": None, "wtext": None,
}


def _stage_a(batches: Iterator[pd.DataFrame], cfg: EngineConfig) -> Iterator[pd.DataFrame]:
    """Per doc: tokenize + doc-local scan filters -> char/media rows
    (columnar construction — a 10k-page doc emits ~10^6 char rows)."""
    for pdf in batches:
        frames: List[pd.DataFrame] = []
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            kinds, texts, refs, offs = _spans_to_lists(spans)
            order = np.argsort(np.asarray(offs, dtype=np.int64), kind="stable")
            kinds = [kinds[i] for i in order]
            texts = [texts[i] for i in order]
            refs = [refs[i] for i in order]
            offs = [int(offs[i]) for i in order]
            table, media, styles = layout_document(doc_id, kinds, texts, refs, offs, cfg)
            table = apply_scan_filters(table, styles, cfg)
            n = len(table)
            frames.append(pd.DataFrame({
                "doc_id": pd.Series([doc_id] * n, dtype="object"),
                "page": table.page.astype(np.int32),
                "ord": np.arange(n, dtype=np.int64),
                "is_media": np.zeros(n, dtype=bool),
                "x": table.x, "y": table.y, "w": table.w, "h": table.h,
                "baseline": table.baseline,
                "style_idx": table.style_idx.astype(np.int32),
                "char": pd.Series(table.char, dtype="object"),
                "off": table.offset.astype(np.int32),
                "media_ref": pd.Series([""] * n, dtype="object"),
            }))
            if media:
                m_n = len(media)
                frames.append(pd.DataFrame({
                    "doc_id": pd.Series([doc_id] * m_n, dtype="object"),
                    "page": np.array([m.page for m in media], dtype=np.int32),
                    "ord": np.arange(m_n, dtype=np.int64),
                    "is_media": np.ones(m_n, dtype=bool),
                    "x": np.array([m.x for m in media], dtype=np.float32),
                    "y": np.array([m.y for m in media], dtype=np.float32),
                    "w": np.array([m.w for m in media], dtype=np.float32),
                    "h": np.array([m.h for m in media], dtype=np.float32),
                    "baseline": np.zeros(m_n, dtype=np.float32),
                    "style_idx": np.zeros(m_n, dtype=np.int32),
                    "char": pd.Series([""] * m_n, dtype="object"),
                    "off": np.array([m.offset for m in media], dtype=np.int32),
                    "media_ref": pd.Series([m.media_ref for m in media], dtype="object"),
                }))
        if frames:
            yield pd.concat(frames, ignore_index=True)


def _word_row(doc_id, page, rkind, a, b, c, t: _WordTable, idxs: List[int], **kw):
    row = dict(_EMPTY)
    row.update(doc_id=doc_id, page=page, rkind=rkind, a=a, b=b, c=c)
    row.update(
        wx=t.x[idxs].astype(np.float32),
        wy=t.y[idxs].astype(np.float32),
        ww=t.w[idxs].astype(np.float32),
        wh=t.h[idxs].astype(np.float32),
        wstyle=t.style[idxs].astype(np.int32),
        worigin=t.origin[idxs].astype(np.int64),
        wtext=[t.text[i] for i in idxs],
    )
    row.update(kw)
    return row


def _stage_b(key, pdf: pd.DataFrame, cfg: EngineConfig, mode: str) -> pd.DataFrame:
    """Per (doc, page): geometric analysis -> structure rows."""
    doc_id, page = key[0], int(key[1])
    styles = doc_styles(doc_id)
    cmp_lut, break_lut = _style_luts(styles)
    style_xsize = np.array([s.x_size for s in styles], dtype=np.int64)
    style_ysize = np.array([s.y_size for s in styles], dtype=np.int64)

    ch = pdf[~pdf["is_media"]].sort_values("ord", kind="stable")
    md = pdf[pdf["is_media"]].sort_values("off", kind="stable")
    x = ch["x"].to_numpy(dtype=np.float32)
    y = ch["y"].to_numpy(dtype=np.float32)
    w = ch["w"].to_numpy(dtype=np.float32)
    h = ch["h"].to_numpy(dtype=np.float32)
    g = _Glyphs(
        x=x, y=y, w=w, h=h, ex=x + w, ey=y + h,
        baseline=ch["baseline"].to_numpy(dtype=np.float32),
        style=ch["style_idx"].to_numpy(dtype=np.int32),
        text=list(ch["char"]),
        origin=ch["off"].to_numpy(dtype=np.int64),
    )
    page_media = [
        MediaBox(page, float(r.x), float(r.y), float(r.w), float(r.h),
                 r.media_ref, int(r.off))
        for r in md.itertuples()
    ]

    t, paragraphs, bounds, blocks, captions = _analyze_one_page(
        g, page_media, cmp_lut, break_lut, style_xsize, style_ysize, cfg, mode
    )

    rows: List[dict] = []
    assigned: set = set()
    for pi, para in enumerate(paragraphs):
        for li, line in enumerate(para.lines):
            rows.append(_word_row(
                doc_id, page, "line", pi, li, para.region, t, line,
                f0=float(para.block),
            ))
            assigned.update(line)
    # words in the table but not in any line (assignment quirks) still count
    # toward the doc-level style histograms — ship them as leftovers
    left = [i for i in range(len(t)) if i not in assigned]
    if left:
        rows.append(_word_row(doc_id, page, "leftover", 0, 0, 0, t, left))
    for ri, bnd in enumerate(bounds):
        row = dict(_EMPTY)
        row.update(doc_id=doc_id, page=page, rkind="region", a=ri, b=0, c=0,
                   f0=float(bnd[0]), f1=float(bnd[1]), f2=float(bnd[2]),
                   f3=float(bnd[3]))
        rows.append(row)
    for ri, bb in enumerate(blocks):
        for rank, (y0, y1) in enumerate(bb):
            row = dict(_EMPTY)
            row.update(doc_id=doc_id, page=page, rkind="block", a=ri, b=rank,
                       c=0, f0=float(y0), f1=float(y1))
            rows.append(row)
    for mi, caps in captions.items():
        for li, (text, origin, style_idx) in enumerate(caps):
            # c carries the caption line's dominating-style index (may be
            # FORMULA_IDX) so stage C can emit the same style_ref
            row = dict(_EMPTY)
            row.update(doc_id=doc_id, page=page, rkind="caption", a=int(mi),
                       b=li, c=int(style_idx), text=text, origin=int(origin))
            rows.append(row)
    for mi, m in enumerate(page_media):
        row = dict(_EMPTY)
        row.update(doc_id=doc_id, page=page, rkind="media", a=mi, b=0, c=0,
                   f0=float(m.x), f1=float(m.y), f2=float(m.w), f3=float(m.h),
                   text=m.media_ref, origin=int(m.offset))
        rows.append(row)
    if not rows:
        return pd.DataFrame(columns=[f.split()[0] for f in PAGE_SCHEMA.split(", ")])
    return pd.DataFrame(rows)


def _rebuild_table(word_rows: List[dict]) -> Tuple[_WordTable, List[List[int]]]:
    """Concatenate per-line word arrays back into one page table; returns the
    table and the per-row index lists (same construction as _word_table:
    ex/ey via float32 adds)."""
    xs, ys, ws, hs, sts, ors, txts = [], [], [], [], [], [], []
    spans: List[List[int]] = []
    base = 0
    for r in word_rows:
        n = len(r["wx"])
        spans.append(list(range(base, base + n)))
        base += n
        xs.append(np.asarray(r["wx"], dtype=np.float32))
        ys.append(np.asarray(r["wy"], dtype=np.float32))
        ws.append(np.asarray(r["ww"], dtype=np.float32))
        hs.append(np.asarray(r["wh"], dtype=np.float32))
        sts.append(np.asarray(r["wstyle"], dtype=np.int32))
        ors.append(np.asarray(r["worigin"], dtype=np.int64))
        txts.extend(list(r["wtext"]))
    if base == 0:
        z = np.empty(0, dtype=np.float32)
        return _WordTable(z, z, z, z, z, z, np.empty(0, np.int32), [],
                          np.empty(0, np.int64), np.empty(0, np.int64)), spans
    x = np.concatenate(xs)
    y = np.concatenate(ys)
    w = np.concatenate(ws)
    h = np.concatenate(hs)
    return _WordTable(
        x=x, y=y, w=w, h=h, ex=x + w, ey=y + h,
        style=np.concatenate(sts), text=txts,
        tlen=np.array([len(s) for s in txts], dtype=np.int64),
        origin=np.concatenate(ors),
    ), spans


def _stage_c(key, pdf: pd.DataFrame, cfg: EngineConfig) -> pd.DataFrame:
    """Per doc: rebuild per-page structures, run the doc-level tail."""
    doc_id = key[0]
    styles = doc_styles(doc_id)
    pages_present = sorted(int(p) for p in pdf["page"].unique())
    n_pages = (pages_present[-1] + 1) if pages_present else 0

    tables: List[_WordTable] = []
    pages: List[List[Paragraph]] = []
    page_regions: List[List] = []
    page_blocks: List[List] = []
    page_captions: List[Dict[int, List[Tuple[str, int]]]] = []
    media_by_page: Dict[int, List[MediaBox]] = {}

    recs = pdf.to_dict("records")
    by_page: Dict[int, List[dict]] = {}
    for r in recs:
        by_page.setdefault(int(r["page"]), []).append(r)

    for p in range(n_pages):
        rows = by_page.get(p, [])
        line_rows = sorted(
            (r for r in rows if r["rkind"] == "line"),
            key=lambda r: (int(r["a"]), int(r["b"])),
        )
        leftover = [r for r in rows if r["rkind"] == "leftover"]
        t, spans = _rebuild_table(line_rows + leftover)
        tables.append(t)
        paras: List[Paragraph] = []
        for r, idxs in zip(line_rows, spans[: len(line_rows)]):
            pi = int(r["a"])
            if pi == len(paras):
                paras.append(Paragraph([], region=int(r["c"]), block=int(r["f0"])))
            paras[pi].lines.append(idxs)
        pages.append(paras)
        page_regions.append([
            (float(r["f0"]), float(r["f1"]), float(r["f2"]), float(r["f3"]))
            for r in sorted(
                (r for r in rows if r["rkind"] == "region"), key=lambda r: int(r["a"])
            )
        ])
        blocks_rows = sorted(
            (r for r in rows if r["rkind"] == "block"),
            key=lambda r: (int(r["a"]), int(r["b"])),
        )
        bb: List[List[Tuple[float, float]]] = [[] for _ in page_regions[p]]
        for r in blocks_rows:
            bb[int(r["a"])].append((float(r["f0"]), float(r["f1"])))
        page_blocks.append(bb)
        caps: Dict[int, List[Tuple[str, int, int]]] = {}
        for r in sorted(
            (r for r in rows if r["rkind"] == "caption"),
            key=lambda r: (int(r["a"]), int(r["b"])),
        ):
            caps.setdefault(int(r["a"]), []).append(
                (r["text"], int(r["origin"]), int(r["c"]))
            )
        page_captions.append(caps)
        media_by_page[p] = [
            MediaBox(p, float(r["f0"]), float(r["f1"]), float(r["f2"]),
                     float(r["f3"]), r["text"], int(r["origin"]))
            for r in sorted(
                (r for r in rows if r["rkind"] == "media"), key=lambda r: int(r["a"])
            )
        ]

    out = _finalize_document(
        tables, pages, page_regions, page_blocks, page_captions,
        media_by_page, n_pages, styles, cfg,
    )
    return pd.DataFrame(
        {
            "doc_id": pd.Series([doc_id] * len(out), dtype="object"),
            "seq": pd.Series([s.seq for s in out], dtype="int32"),
            "kind": pd.Series([s.kind for s in out], dtype="object"),
            "text": pd.Series([s.text for s in out], dtype="object"),
            "media_ref": pd.Series([s.media_ref for s in out], dtype="object"),
            "offset": pd.Series([s.offset for s in out], dtype="int32"),
            "page": pd.Series([s.page for s in out], dtype="int32"),
            "para": pd.Series([s.para for s in out], dtype="int32"),
            "style_ref": pd.Series([s.style_ref for s in out], dtype="object"),
        }
    )


def extract_spans_paged(
    documents_df: DataFrame,
    cfg: EngineConfig = CONFIG,
    mode: str = "tuned",
    page_partitions: int = 0,
) -> DataFrame:
    """Page-parallel extraction: identical output to extract_spans, with the
    per-page geometric analysis distributed over (doc_id, page)."""
    chars = documents_df.mapInPandas(
        lambda it: _stage_a(it, cfg), schema=CHAR_SCHEMA
    )
    if page_partitions > 0:
        chars = chars.repartition(page_partitions, "doc_id", "page")
    structure = chars.groupBy("doc_id", "page").applyInPandas(
        lambda key, pdf: _stage_b(key, pdf, cfg, mode), schema=PAGE_SCHEMA
    )
    return structure.groupBy("doc_id").applyInPandas(
        lambda key, pdf: _stage_c(key, pdf, cfg), schema=OUTPUT_SCHEMA
    )
