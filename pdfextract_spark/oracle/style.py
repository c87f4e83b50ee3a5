"""Styles and the 5-way style-difference lattice.

Semantics: SURVEY.md §2.2 W4; reference StyleComparator.styleCompare
(/root/reference/model/.../style/StyleComparator.java:34-77) and the interned
Style flyweight (style/Style.java:31-98). A style is identified by its id;
sentinel styles are represented as reserved ids.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# style-difference lattice (StyleDifference.java:25-27)
SAME_STYLE_AND_BIG_TEXT = 0
SAME_STYLE = 1
SUBTLE_DIFFERENCE = 2
BIG_DIFFERENCE = 3
SPLIT = 4

SUBTLE_SIZE_DIFFERENCE = 1
BIG_TEXT_Y_SIZE = 13.0


@dataclass(frozen=True)
class Style:
    font_name: str
    sub_type: str
    x_size: int
    y_size: int
    italic: bool = False
    bold: bool = False
    math_font: bool = False
    sentinel: str = ""  # '', 'FORMULA', 'NO_STYLE', 'GRAPHIC_*'

    @property
    def style_id(self) -> str:
        if self.sentinel:
            return self.sentinel
        flags = ("I" if self.italic else "") + ("B" if self.bold else "") + (
            "M" if self.math_font else ""
        )
        return f"{self.font_name}-{self.sub_type}-{self.x_size}{flags}"


FORMULA = Style("FORMULA", "", 0, 0, sentinel="FORMULA")
NO_STYLE = Style("NO_STYLE", "", 0, 0, sentinel="NO_STYLE")
GRAPHIC_IMAGE = Style("GRAPHIC_IMAGE", "", 0, 0, sentinel="GRAPHIC_IMAGE")
GRAPHIC_CONTAINER = Style("GRAPHIC_CONTAINER", "", 0, 0, sentinel="GRAPHIC_CONTAINER")
GRAPHIC_HSEP = Style("GRAPHIC_HSEP", "", 0, 0, sentinel="GRAPHIC_HSEP")
GRAPHIC_VSEP = Style("GRAPHIC_VSEP", "", 0, 0, sentinel="GRAPHIC_VSEP")
GRAPHIC_MATH_BAR = Style("GRAPHIC_MATH_BAR", "", 0, 0, sentinel="GRAPHIC_MATH_BAR")


def style_compare(one: Style, two: Style) -> int:
    """Faithful 5-way comparison (StyleComparator.java:34-77).

    Note the reference compares only ySize for both 'x' and 'y' diffs
    (a quirk preserved on purpose — both locals read ``ySize``).
    """
    if (one.sentinel == "FORMULA") != (two.sentinel == "FORMULA"):
        return SPLIT
    if one.math_font != two.math_font:
        return BIG_DIFFERENCE
    if one.math_font and two.math_font:
        return SAME_STYLE
    if one.bold != two.bold:
        return BIG_DIFFERENCE
    if one.font_name != two.font_name:
        return BIG_DIFFERENCE
    if one.sub_type != two.sub_type:
        return SUBTLE_DIFFERENCE
    diff = abs(one.y_size - two.y_size)
    if diff == SUBTLE_SIZE_DIFFERENCE:
        return SUBTLE_DIFFERENCE
    if diff > SUBTLE_SIZE_DIFFERENCE:
        return BIG_DIFFERENCE
    if one.y_size > BIG_TEXT_Y_SIZE:
        return SAME_STYLE_AND_BIG_TEXT
    return SAME_STYLE
