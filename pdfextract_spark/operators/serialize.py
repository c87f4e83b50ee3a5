"""Output sinks: simple-XML (.pxml) and TEI-P5-style serialization (S15/S16).

The reference writes two XML renderings of the logical tree
(xmlout-simple/.../SimpleXMLOutput.java:51-242 and
xmlout-tei-p5/.../TEIOutput.java:54-284). Our span-sequence table IS the
engine's primary sink (span equality is checked on it); these operators are
the equivalent *formatters* over that table, expressed with native Spark
column functions + one ordered aggregation per document — no Python in the
hot path, shuffle keyed by doc_id only (the same key the extraction already
produced, so AQE coalesces it into the narrow plan).

Both are deterministic and SQL-expressible, so the driver's DuckDB oracle
checks them value-for-value (sql_* builders below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# quotes escaped too: doc_id/media_ref land inside XML attribute values
# (reference uses escapeHtml, which covers quotes — SimpleXMLOutput.java)
_XML_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")]


def _esc(col):
    for raw, rep in _XML_ESCAPES:
        col = F.replace(col, F.lit(raw), F.lit(rep))
    return col


def _sql_esc(expr: str) -> str:
    out = expr
    for raw, rep in _XML_ESCAPES:
        raw_sql = raw.replace("'", "''")
        out = f"replace({out}, '{raw_sql}', '{rep}')"
    return out


def _line_elem():
    """One span -> one XML element string (shared shape for both sinks)."""
    k = F.col("kind")
    txt = _esc(F.col("text"))
    return (
        F.when(k == F.lit("media"), F.concat(F.lit('<graphics ref="'), _esc(F.col("media_ref")), F.lit('"/>')))
        .when(k == F.lit("formula"), F.concat(F.lit("<formula>"), txt, F.lit("</formula>")))
        .otherwise(F.concat(F.lit("<line>"), txt, F.lit("</line>")))
    )


def to_pxml(spans: DataFrame) -> DataFrame:
    """(doc_id, pxml) — SimpleXMLOutput-style document rendering: lines,
    formulas and graphics in reading order inside a <document> element."""
    elem = F.struct(F.col("seq").alias("seq"), _line_elem().alias("e"))
    body = F.array_join(
        F.transform(F.array_sort(F.collect_list(elem)), lambda s: s["e"]),
        "\n",
    )
    return (
        spans.groupBy("doc_id")
        .agg(body.alias("body"))
        .select(
            "doc_id",
            F.concat(
                F.lit('<document id="'), _esc(F.col("doc_id")), F.lit('">\n'),
                F.col("body"), F.lit("\n</document>"),
            ).alias("pxml"),
        )
    )


def sql_to_pxml(spans_sql: str) -> str:
    """DuckDB equivalent over a spans relation (doc_id, seq, kind, text,
    media_ref)."""
    elem = (
        "CASE WHEN kind = 'media' THEN '<graphics ref=\"' || "
        + _sql_esc("media_ref")
        + " || '\"/>' WHEN kind = 'formula' THEN '<formula>' || "
        + _sql_esc("text")
        + " || '</formula>' ELSE '<line>' || "
        + _sql_esc("text")
        + " || '</line>' END"
    )
    return f"""
SELECT doc_id,
       '<document id="' || {_sql_esc('doc_id')} || '">' || chr(10) ||
       string_agg({elem}, chr(10) ORDER BY seq) || chr(10) || '</document>' AS pxml
FROM ({spans_sql})
GROUP BY doc_id
"""


def to_tei(spans: DataFrame) -> DataFrame:
    """(doc_id, tei) — TEI-P5-style rendering: title -> <titleStmt>, body
    spans in reading order; headings as <head>, footnotes as <note>,
    abstract inside <front>, media as <figure>."""
    k = F.col("kind")
    txt = _esc(F.col("text"))
    body_elem = (
        F.when(k == F.lit("media"), F.concat(F.lit('<figure><graphic url="'), _esc(F.col("media_ref")), F.lit('"/></figure>')))
        .when(k.startswith("heading"), F.concat(F.lit("<head>"), txt, F.lit("</head>")))
        .when(k == F.lit("footnote"), F.concat(F.lit('<note place="foot">'), txt, F.lit("</note>")))
        .when(k == F.lit("formula"), F.concat(F.lit("<formula>"), txt, F.lit("</formula>")))
        .when(k == F.lit("abstract"), F.concat(F.lit("<ab>"), txt, F.lit("</ab>")))
        .when(k == F.lit("title"), F.lit(""))
        .otherwise(F.concat(F.lit("<p>"), txt, F.lit("</p>")))
    )
    elem = F.struct(F.col("seq").alias("seq"), body_elem.alias("e"))
    title = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(k == F.lit("title"), F.struct(F.col("seq").alias("seq"), txt.alias("t")))
                )
            ),
            lambda s: s["t"],
        ),
        " ",
    )
    body = F.array_join(
        F.filter(
            F.transform(F.array_sort(F.collect_list(elem)), lambda s: s["e"]),
            lambda e: e != F.lit(""),
        ),
        "\n",
    )
    return (
        spans.groupBy("doc_id")
        .agg(title.alias("title"), body.alias("body"))
        .select(
            "doc_id",
            F.concat(
                F.lit("<TEI><teiHeader><titleStmt><title>"), F.col("title"),
                F.lit("</title></titleStmt></teiHeader><text><body>\n"),
                F.col("body"), F.lit("\n</body></text></TEI>"),
            ).alias("tei"),
        )
    )


def sql_to_tei(spans_sql: str) -> str:
    body_elem = (
        "CASE WHEN kind = 'media' THEN '<figure><graphic url=\"' || "
        + _sql_esc("media_ref")
        + " || '\"/></figure>' "
        "WHEN kind LIKE 'heading%' THEN '<head>' || " + _sql_esc("text") + " || '</head>' "
        "WHEN kind = 'footnote' THEN '<note place=\"foot\">' || " + _sql_esc("text") + " || '</note>' "
        "WHEN kind = 'formula' THEN '<formula>' || " + _sql_esc("text") + " || '</formula>' "
        "WHEN kind = 'abstract' THEN '<ab>' || " + _sql_esc("text") + " || '</ab>' "
        "WHEN kind = 'title' THEN '' "
        "ELSE '<p>' || " + _sql_esc("text") + " || '</p>' END"
    )
    return f"""
SELECT doc_id,
       '<TEI><teiHeader><titleStmt><title>' ||
       coalesce(string_agg(CASE WHEN kind = 'title' THEN {_sql_esc('text')} END,
                           ' ' ORDER BY seq), '') ||
       '</title></titleStmt></teiHeader><text><body>' || chr(10) ||
       string_agg(CASE WHEN kind <> 'title' THEN {body_elem} END, chr(10) ORDER BY seq)
       || chr(10) || '</body></text></TEI>' AS tei
FROM ({spans_sql})
GROUP BY doc_id
"""
