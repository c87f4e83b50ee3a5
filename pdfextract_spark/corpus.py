"""Deterministic synthetic interleaved-document corpus generator.

Produces the input table shape from BASELINE.json ``input_hint``:
``(doc_id: string, spans: array<struct<kind, text, media_ref, offset>>)``.

Content knobs mirror FIXTURES.md §1: multi-page docs, title-like first span,
digit-only page-number spans, 'Abstract' headers, hyphen-ending fragments,
0-4 interleaved media spans, and a skew band (~0.1% of docs get ~100x span
count) to exercise salting. Seeded and content-addressed per doc — the same
(seed, doc index) always yields the same document, so the corpus can be
regenerated anywhere without shipping data.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterator, List, Tuple

import numpy as np

WORD_BANK = (
    "the quick brown fox jumps over lazy dog data query scan table column "
    "row filter group sort merge join window batch stream value key hash "
    "spark engine layout page line word style font text media span offset "
    "region block paragraph order cluster vector index shuffle partition "
    "document extract analysis physical logical tree node content graphic"
).split()

SENTENCE_LEN = (4, 12)


def _doc_rng(seed: int, doc_index: int) -> np.random.Generator:
    h = hashlib.blake2b(f"{seed}:{doc_index}".encode(), digest_size=8).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(h, "big")))


def make_doc(seed: int, doc_index: int, skew: bool = False) -> Tuple[str, List[Dict]]:
    """One deterministic document: (doc_id, spans)."""
    rng = _doc_rng(seed, doc_index)
    doc_id = f"doc_{seed}_{doc_index:08d}"

    n_body = int(rng.integers(8, 40)) * (100 if skew else 1)
    n_media = int(rng.integers(0, 5)) * (10 if skew else 1)
    n_pagenums = int(rng.integers(0, 4))

    spans: List[Dict] = []
    offset = 0

    def add(kind: str, text: str = "", media_ref: str = ""):
        nonlocal offset
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": offset})
        offset += 1

    def sentence(lo=SENTENCE_LEN[0], hi=SENTENCE_LEN[1]) -> str:
        k = int(rng.integers(lo, hi))
        words = [WORD_BANK[int(j)] for j in rng.integers(0, len(WORD_BANK), k)]
        return " ".join(words)

    # title-like first span
    add("text", sentence(3, 7).title())

    if rng.uniform() < 0.3:
        add("text", "Abstract")
        add("text", sentence(8, 14))

    media_slots = sorted(rng.integers(0, max(n_body, 1), n_media).tolist()) if n_media else []
    pagenum_slots = set(
        rng.integers(0, max(n_body, 1), n_pagenums).tolist()
    ) if n_pagenums else set()

    mi = 0
    page_no = 1
    section = 0
    subsection = 0
    for b in range(n_body):
        while mi < len(media_slots) and media_slots[mi] <= b:
            add("media", "", f"img://{doc_id}/fig{mi}")
            mi += 1
            # ~50% of figures carry a caption rendered INSIDE the box
            # (tokenizer contract: a "fig." span right after a media span;
            # P2 classifies the graphic CONTAINER, B7 re-attaches the text)
            if rng.uniform() < 0.5:
                add("text", f"fig. {sentence(4, 6)}")
        # numbered section/subsection headings (digit-leading Title Case ->
        # tokenizer styles them H1/H2; L6 tags them heading1/heading2)
        if rng.uniform() < 0.12:
            section += 1
            subsection = 0
            add("text", f"{section} {sentence(2, 5).title()}")
        elif section and rng.uniform() < 0.08:
            subsection += 1
            add("text", f"{section}.{subsection} {sentence(2, 5).title()}")
        text = sentence()
        if rng.uniform() < 0.08:
            text += "-"  # hyphen-ending fragment
        add("text", text)
        # bad-font garbled span (~45% control chars -> S8 drops the font;
        # density is deterministic so the span always classifies garbled)
        if rng.uniform() < 0.04:
            base = sentence(4, 8)
            garbled = "".join(c + ("\x07" if c != " " else "") for c in base)
            add("text", garbled)
        # stray control-char word in otherwise clean text (S9 strips it)
        if rng.uniform() < 0.05:
            add("text", sentence(3, 6) + " \x06 " + sentence(2, 4))
        # word with a combining diacritic rendered as a separate zero-advance
        # glyph (tokenizer overlays it on the base char; S7 re-merges)
        if rng.uniform() < 0.05:
            accented = ["café", "naivë", "résumé"][
                int(rng.integers(0, 3))
            ]
            add("text", f"{sentence(2, 4)} {accented} {sentence(2, 4)}")
        # indented display formula (B2 pre-groups; the line classifies
        # FORMULA: 3 per math symbol + 1 per digit > char count)
        if rng.uniform() < 0.05:
            a, b2, c = (int(v) for v in rng.integers(1, 99, 3))
            add("text", f"x{a % 9} = {a} + {b2} < {c} × {a % 7}")
            # ~40% of formulas are fractions: a thin bar media between
            # numerator and denominator (tokenizer renders it thin+indented;
            # P2 classifies MATH_BAR, which must never split the region)
            if rng.uniform() < 0.4:
                add("media", "", f"img://{doc_id}/bar{b}")
                d, e2 = (int(v) for v in rng.integers(1, 99, 2))
                add("text", f"y{d % 9} = {d} × {e2} < {d + e2}")
        # ruled table: a run of thin full-width rule media stacked between
        # short rows (tokenizer renders '/rule' refs as tight hsep-shaped
        # bars; the repeated-hsep combiner must merge the stack so the page
        # is NOT sliced into one band per rule)
        if rng.uniform() < 0.05:
            n_rules = int(rng.integers(2, 5))
            for r in range(n_rules):
                add("media", "", f"img://{doc_id}/rule{b}_{r}")
                add("text", sentence(3, 6))
        # digit-leading lowercase footnote (tokenizer styles SMALL; L4 tags)
        if rng.uniform() < 0.06:
            add("text", f"{int(rng.integers(1, 30))} {sentence(3, 7)}")
        if b in pagenum_slots:
            add("text", str(page_no))
            page_no += 1
    while mi < len(media_slots):
        add("media", "", f"img://{doc_id}/fig{mi}")
        mi += 1

    return doc_id, spans


def generate(n_docs: int, seed: int = 42, skew_frac: float = 0.001) -> Iterator[Tuple[str, List[Dict]]]:
    skew_every = int(1.0 / skew_frac) if skew_frac > 0 else 0
    for i in range(n_docs):
        skew = skew_every > 0 and i > 0 and i % skew_every == 0
        yield make_doc(seed, i, skew=skew)


def as_pandas(n_docs: int, seed: int = 42, skew_frac: float = 0.001):
    import pandas as pd

    rows = [{"doc_id": d, "spans": s} for d, s in generate(n_docs, seed, skew_frac)]
    return pd.DataFrame(rows)


def write_parquet(path: str, n_docs: int, seed: int = 42, skew_frac: float = 0.001) -> str:
    """Write the corpus with an explicit Arrow schema (non-nullable ints)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    span_t = pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
    schema = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(span_t))])
    docs, spans = [], []
    for d, s in generate(n_docs, seed, skew_frac):
        docs.append(d)
        spans.append(s)
    table = pa.Table.from_pydict({"doc_id": docs, "spans": spans}, schema=schema)
    pq.write_table(table, path)
    return path
