"""Debug renderer: SVG overlay of the engine's per-page geometry (S17).

Reference analog: renderer/PageRenderer.java (word boxes orange, line nodes,
page regions red, graphics green; gated by the RENDER_* flags in
Constants.java:42-49 and disabled in normal runs). This port draws the same
box families as SVG — the container has no raster libs, and a vector overlay
diffs cleanly in git, which is the point of a debug artifact. Like the
reference, nothing in the pipeline calls this; it exists for debugging P3/P4
(whitespace cover / column boundary) regressions via tools/render_page.py.

Pure function over already-computed page structures — no Spark, no I/O.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

# PageRenderer color scheme (Color.ORANGE etc.), translated to hex
WORD_STYLE = "fill:none;stroke:#ffc800;stroke-width:0.5"          # words: orange
LINE_STYLE = "fill:none;stroke:#0064ff;stroke-width:0.7"          # lines: blue
REGION_STYLE = "fill:none;stroke:#ff0000;stroke-width:1.2;stroke-dasharray:4 2"
MEDIA_STYLE = "fill:#00aa0022;stroke:#00aa00;stroke-width:1"      # graphics: green
BLOCK_STYLE = "stroke:#aa00aa;stroke-width:0.6;stroke-dasharray:2 2"


def _rect(x: float, y: float, w: float, h: float, style: str, title: str = "") -> str:
    t = f"<title>{title}</title>" if title else ""
    return (
        f'<rect x="{x:.2f}" y="{y:.2f}" width="{w:.2f}" height="{h:.2f}" '
        f'style="{style}">{t}</rect>'
    )


def render_page_svg(
    words: Sequence[Tuple[float, float, float, float, str]],
    lines: Sequence[Tuple[float, float, float, float]],
    regions: Sequence[Tuple[float, float, float, float]],
    media: Sequence[Tuple[float, float, float, float, str]],
    block_bands: Dict[int, List[Tuple[float, float]]],
    margin: float = 10.0,
) -> str:
    """words: (x, y, w, h, text); lines/regions: (x0, y0, x1, y1) bounds;
    media: (x, y, w, h, ref); block_bands: region -> [(y0, y1)] horizontal
    block split bands. Returns a standalone SVG document string."""
    xs = [w[0] for w in words] + [r[0] for r in regions] + [m[0] for m in media]
    ys = [w[1] for w in words] + [r[1] for r in regions] + [m[1] for m in media]
    exs = (
        [w[0] + w[2] for w in words]
        + [r[2] for r in regions]
        + [m[0] + m[2] for m in media]
    )
    eys = (
        [w[1] + w[3] for w in words]
        + [r[3] for r in regions]
        + [m[1] + m[3] for m in media]
    )
    x0 = min(xs, default=0.0) - margin
    y0 = min(ys, default=0.0) - margin
    x1 = max(exs, default=100.0) + margin
    y1 = max(eys, default=100.0) + margin

    parts: List[str] = [
        f'<svg xmlns="http://www.w3.org/2000/svg" '
        f'viewBox="{x0:.2f} {y0:.2f} {x1 - x0:.2f} {y1 - y0:.2f}">',
        f'<rect x="{x0:.2f}" y="{y0:.2f}" width="{x1 - x0:.2f}" '
        f'height="{y1 - y0:.2f}" style="fill:#ffffff"/>',
    ]
    parts.append('<g id="regions">')
    parts.extend(
        _rect(rx0, ry0, rx1 - rx0, ry1 - ry0, REGION_STYLE, f"region {i}")
        for i, (rx0, ry0, rx1, ry1) in enumerate(regions)
    )
    parts.append("</g>")
    parts.append('<g id="blocks">')
    for ri, bands in block_bands.items():
        rx0, _, rx1, _ = regions[ri] if ri < len(regions) else (x0, 0, x1, 0)
        for by0, by1 in bands:
            parts.append(
                f'<line x1="{rx0:.2f}" y1="{by0:.2f}" x2="{rx1:.2f}" '
                f'y2="{by0:.2f}" style="{BLOCK_STYLE}"/>'
            )
            parts.append(
                f'<line x1="{rx0:.2f}" y1="{by1:.2f}" x2="{rx1:.2f}" '
                f'y2="{by1:.2f}" style="{BLOCK_STYLE}"/>'
            )
    parts.append("</g>")
    parts.append('<g id="media">')
    parts.extend(
        _rect(mx, my, mw, mh, MEDIA_STYLE, ref) for mx, my, mw, mh, ref in media
    )
    parts.append("</g>")
    parts.append('<g id="lines">')
    parts.extend(
        _rect(lx0, ly0, lx1 - lx0, ly1 - ly0, LINE_STYLE)
        for lx0, ly0, lx1, ly1 in lines
    )
    parts.append("</g>")
    parts.append('<g id="words">')
    parts.extend(
        _rect(wx, wy, ww, wh, WORD_STYLE, text.replace("&", "&amp;").replace("<", "&lt;"))
        for wx, wy, ww, wh, text in words
    )
    parts.append("</g>")
    parts.append("</svg>")
    return "\n".join(parts)


def page_structures_for_render(table, paragraphs, bounds, blocks, media):
    """Adapt one page's _analyze_one_page outputs to render_page_svg inputs:
    word boxes from the word table, line boxes as bounding boxes of each
    line's words, region bounds and block bands as-is, media boxes from
    MediaBox."""
    words = [
        (float(table.x[i]), float(table.y[i]), float(table.w[i]),
         float(table.h[i]), table.text[i])
        for i in range(len(table.x))
    ]
    lines = []
    for para in paragraphs:
        for line in para.lines:
            if not line:
                continue
            lines.append((
                float(min(table.x[i] for i in line)),
                float(min(table.y[i] for i in line)),
                float(max(table.ex[i] for i in line)),
                float(max(table.ey[i] for i in line)),
            ))
    regions = [tuple(float(v) for v in b) for b in bounds]
    media_boxes = [
        (float(m.x), float(m.y), float(m.w), float(m.h), m.media_ref)
        for m in media
    ]
    bands = {ri: [(float(a), float(b)) for a, b in bb] for ri, bb in enumerate(blocks)}
    return words, lines, regions, media_boxes, bands
