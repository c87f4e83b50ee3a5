"""Loader + runner for the reference's `.spacing` word-segmentation corpus.

The corpus (reference test resources, ~5.5k cases over 14 files; harness
semantics at /root/reference/pdfextract-cli/src/test/java/.../TestSpacing2.java:
66-121,147-203) is the strongest correctness asset the reference has. Each
case is: expected segmented line ("answer"), a font size, and the list of
inter-char distances. The harness reconstructs a synthetic char line
(char width = fontSize, x advanced by distance then width), runs word
segmentation, and checks the produced word count equals the answer's.

We read the corpus in place from the read-only reference checkout (no files
are copied into this repo); tests skip if it is absent.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Tuple

import numpy as np

from .geom import Rect, f32
from .style import Style
from .words import create_words_in_line, Glyph

DEFAULT_CORPUS_DIR = (
    "/root/reference/pdfextract-cli/src/test/resources/spacings"
)


@dataclass(frozen=True)
class SpacingCase:
    source: str
    case_id: int
    answer: str
    font_size: int          # int(max(8.0, raw)) per the reference harness
    distances: Tuple[float, ...]

    @property
    def base(self) -> str:
        return self.answer.replace(" ", "")

    @property
    def valid(self) -> bool:
        return len(self.distances) == len(self.base) - 1


def _parse_distances(s: str) -> Tuple[float, ...]:
    s = s.strip()
    if s.startswith("[") and s.endswith("]"):
        s = s[1:-1]
    s = s.strip()
    if not s:
        return ()
    return tuple(float(tok) for tok in s.split(","))


def load_corpus(corpus_dir: str = DEFAULT_CORPUS_DIR) -> List[SpacingCase]:
    cases: List[SpacingCase] = []
    for name in sorted(os.listdir(corpus_dir)):
        if not name.endswith(".spacing"):
            continue
        path = os.path.join(corpus_dir, name)
        with open(path, "r", encoding="utf-8") as fh:
            lines = fh.read().split("\n")
        # records are 4 lines; the answer is the record's 2nd line (the file
        # starts with a blank line — mirror the reference reader's phase)
        if lines and lines[0].strip() == "":
            start = 0
        else:
            # tolerate a missing leading blank: shift phase by prepending one
            lines = [""] + lines
            start = 0
        case_id = 0
        for i in range(start, len(lines) - 3, 4):
            answer = lines[i + 1]
            size_line = lines[i + 2].strip()
            dist_line = lines[i + 3]
            if not size_line:
                continue
            raw_size = float(size_line)
            font_size = int(max(8.0, np.float32(raw_size)))
            cases.append(
                SpacingCase(
                    source=name,
                    case_id=case_id,
                    answer=answer,
                    font_size=font_size,
                    distances=_parse_distances(dist_line),
                )
            )
            case_id += 1
    return cases


def build_line(case: SpacingCase) -> List[Glyph]:
    """Reconstruct the synthetic char line exactly as the harness does."""
    width = f32(case.font_size)
    style = Style("font", "", case.font_size, case.font_size)
    glyphs: List[Glyph] = []
    current_x = f32(0.0)
    base = case.base
    for i, c in enumerate(base):
        d = f32(0.0) if i == 0 else f32(case.distances[i - 1])
        current_x = f32(current_x + d)
        glyphs.append(
            Glyph(
                text=c,
                style=style,
                pos=Rect.make(current_x, 0.0, width, 1.0),
                baseline=f32(0.0),
            )
        )
        current_x = f32(current_x + width)
    glyphs.sort(key=lambda g: g.pos.x)  # Sorting.sortByLowerX (stable)
    return glyphs


def run_case(case: SpacingCase, mode: str = "tuned") -> Tuple[bool, str]:
    """Returns (word-count-correct, produced segmentation)."""
    if not case.valid:
        return True, case.answer  # the harness counts malformed input as pass
    words = create_words_in_line(build_line(case), mode)
    produced = " ".join(w.text for w in words)
    expected_words = len(case.answer) - len(case.base) + 1
    return len(words) == expected_words, produced
