"""Float32 rectangle geometry.

Semantics match the reference model's rectangle ops (SURVEY.md §1.1;
/root/reference/model/.../geom/Rectangle.java:29-357) — in particular the
rect-to-rect distance used by word segmentation (zero when intersecting,
axis-gap Euclidean otherwise) and the bbox union. All arithmetic is float32:
threshold comparisons in the reference are float32 and fixtures depend on it.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

F32 = np.float32


def f32(x) -> np.float32:
    return np.float32(x)


@dataclass(frozen=True)
class Rect:
    """Immutable float32 rectangle (x, y, width, height)."""

    x: np.float32
    y: np.float32
    w: np.float32
    h: np.float32

    @staticmethod
    def make(x, y, w, h) -> "Rect":
        return Rect(f32(x), f32(y), f32(w), f32(h))

    @property
    def end_x(self) -> np.float32:
        return f32(self.x + self.w)

    @property
    def end_y(self) -> np.float32:
        return f32(self.y + self.h)

    def is_empty(self) -> bool:
        return bool(self.w <= F32(0.0) or self.h <= F32(0.0))

    def area(self) -> np.float32:
        return f32(self.w * self.h)

    def intersects(self, o: "Rect") -> bool:
        # Rectangle.intersectsWith:303-322 — closed on x, half-open-ish on y
        if self.is_empty():
            return False
        if o.end_x < self.x:
            return False
        if o.x > self.end_x:
            return False
        if o.y > self.end_y:
            return False
        return bool(o.end_y > self.y)

    def intersects_admitting_overlap(self, o: "Rect", overlap) -> bool:
        # Rectangle.intersectsAdmittingOverlap:282-301
        ov = f32(overlap)
        if self.is_empty():
            return False
        if o.end_x < f32(self.x + ov):
            return False
        if o.x > f32(self.end_x - ov):
            return False
        if o.y > f32(self.end_y - ov):
            return False
        return bool(o.end_y > f32(self.y + ov))

    def contains(self, o: "Rect") -> bool:
        return bool(
            self.end_x >= o.end_x
            and self.x <= o.x
            and self.end_y >= o.end_y
            and self.y <= o.y
        )

    def distance(self, o: "Rect") -> np.float32:
        """Rectangle.distance(Rectangle):220-241 — 0 if intersecting, else
        Euclidean over per-axis gaps."""
        if self.intersects(o):
            return F32(0.0)
        d = F32(0.0)
        if self.x > o.end_x:
            t = f32(self.x - o.end_x)
            d = f32(d + t * t)
        elif o.x > self.end_x:
            t = f32(o.x - self.end_x)
            d = f32(d + t * t)
        if self.y > o.end_y:
            t = f32(self.y - o.end_y)
            d = f32(d + t * t)
        elif o.y > self.end_y:
            t = f32(o.y - self.end_y)
            d = f32(d + t * t)
        return f32(math.sqrt(float(d)))

    def union(self, o: "Rect") -> "Rect":
        x1 = f32(min(self.x, o.x))
        y1 = f32(min(self.y, o.y))
        x2 = f32(max(self.end_x, o.end_x))
        y2 = f32(max(self.end_y, o.end_y))
        return Rect(x1, y1, f32(x2 - x1), f32(y2 - y1))


def is_within_variance(num1, num2, variance) -> bool:
    """MathUtils.isWithinVariance:99-107 (float32)."""
    a, b, v = f32(num1), f32(num2), f32(variance)
    if a == b:
        return True
    return bool(f32(a - v) <= b and f32(a + v) >= b)


def union_bounds(xs: np.ndarray, ys: np.ndarray, ex: np.ndarray, ey: np.ndarray) -> Rect:
    """Bounding box of many rects given as float32 coordinate arrays."""
    x1 = f32(xs.min())
    y1 = f32(ys.min())
    return Rect(x1, y1, f32(f32(ex.max()) - x1), f32(f32(ey.max()) - y1))
