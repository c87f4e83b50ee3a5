"""SVG debug renderer (S17): the overlay must be well-formed XML and carry
one box per word/line/region/media structure the engine computed."""

import xml.etree.ElementTree as ET

from pdfextract_spark.render import render_page_svg


def test_render_fixture_page(spark):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from render_page import structures_for_page

    from pdfextract_spark.config import CONFIG as cfg
    from pdfextract_spark.sources.adapters import documents_to_interleaved
    from pyspark.sql import functions as F

    row = (
        documents_to_interleaved(
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        )
        .filter(F.col("doc_id").cast("string") == "1")
        .head()
    )
    words, lines, regions, media, bands = structures_for_page(
        "1", row["spans"], 0, cfg
    )
    assert words and lines and regions
    svg = render_page_svg(words, lines, regions, media, bands)
    root = ET.fromstring(svg)  # well-formed
    ns = "{http://www.w3.org/2000/svg}"
    groups = {g.get("id"): g for g in root.iter(f"{ns}g")}
    assert len(groups["words"]) == len(words)
    assert len(groups["lines"]) == len(lines)
    assert len(groups["regions"]) == len(regions)


def test_render_empty_page_is_valid():
    svg = render_page_svg([], [], [], [], {})
    ET.fromstring(svg)
