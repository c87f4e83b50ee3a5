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


def to_pxml_nested(spans: DataFrame) -> DataFrame:
    """(doc_id, pxml) — STRUCTURAL SimpleXMLOutput rendering: the hierarchy
    the engine computed (<document><styles><page><paragraph><line>), driven
    by the span table's structural columns (page, para, style_ref — round-3
    schema). Reference shape: SimpleXMLOutput.java:77-242 (writeDocument ->
    writeStyles -> writePage -> writeParagraph/writeGraphic -> writeLine).

    Faithfulness notes (documented deviations):
    - style ids are the sorted-rank of the document's distinct dominating
      style ids (the reference numbers styles in interning order);
    - graphics render at their reading-order position inside the page (the
      reference appends them after the page's paragraphs);
    - front matter (title/abstract, relocated ahead of the page stream by
      the span contract) renders inside <front> instead of its page.

    Scale shape: ONE shuffle (groupBy doc_id); all nesting is higher-order
    Column functions over the per-doc sorted span array — no Python."""
    return _nested_pxml(spans, verbose=False)


def to_pxml_words(spans: DataFrame) -> DataFrame:
    """(doc_id, pxml) — VERBOSE structural rendering: like to_pxml_nested,
    plus per-word boxes inside every line (Constants.VERBOSE_OUTPUT mode,
    SimpleXMLOutput.java:103-134 writeLine + :226-242 writeWord +
    :187-193 writeRectangle). Input must carry the `words` column
    (extract_spans(with_words=True)).

    Deviations beyond to_pxml_nested's (documented):
    - box attributes are integers (rounded once, in the engine): the
      geometry itself is deterministic float32 but float *formatting* is
      not engine-portable, and the reference's exact float printing is a
      Java artifact, not a semantic;
    - the line box is the union of its word boxes (the reference's line pos
      is the same union computed earlier in its pipeline);
    - formula lines render as <formula> without word children, exactly like
      the reference's writeLine formula branch;
    - page boxes are not emitted (page pos is the trivial union below).
    The styles block ranks over line AND word style ids, so every word's
    styleRef resolves even in mixed-style lines."""
    return _nested_pxml(spans, verbose=True)


def _nested_pxml(spans: DataFrame, verbose: bool) -> DataFrame:
    fields = [
        F.col("seq"), F.col("page"), F.col("para"), F.col("kind"),
        F.col("text"), F.col("media_ref"), F.col("style_ref"),
    ]
    if verbose:
        fields.append(F.col("words"))
    rec = F.struct(*fields)
    g = spans.groupBy("doc_id").agg(F.array_sort(F.collect_list(rec)).alias("arr"))
    line_refs = F.transform(F.col("arr"), lambda s: s["style_ref"])
    if verbose:
        ref_pool = F.concat(
            line_refs,
            F.flatten(
                F.transform(
                    F.col("arr"),
                    lambda s: F.transform(s["words"], lambda w: w["style_ref"]),
                )
            ),
        )
    else:
        ref_pool = line_refs
    g = g.withColumn(
        "srefs",
        F.array_sort(F.array_distinct(F.filter(ref_pool, lambda r: r != F.lit("")))),
    )
    arr = F.col("arr")
    srefs = F.col("srefs")

    style_elems = F.transform(
        srefs,
        lambda r, i: F.concat(
            F.lit('<style id="'), (i + 1).cast("string"),
            F.lit('" name="'), _esc(r), F.lit('"/>'),
        ),
    )
    styles_block = F.when(
        F.size(srefs) > 0,
        F.concat(
            F.lit("<styles>\n"), F.array_join(style_elems, "\n"),
            F.lit("\n</styles>\n"),
        ),
    ).otherwise(F.lit(""))

    def word_elem(w):
        return F.concat(
            F.lit('<word value="'), _esc(w["value"]),
            F.lit('" styleRef="'),
            F.array_position(srefs, w["style_ref"]).cast("string"),
            F.lit('" x="'), w["x"].cast("string"),
            F.lit('" y="'), w["y"].cast("string"),
            F.lit('" w="'), w["w"].cast("string"),
            F.lit('" h="'), w["h"].cast("string"),
            F.lit('"/>'),
        )

    def line_elem(s):
        sid = F.array_position(srefs, s["style_ref"])
        if verbose:
            ws = s["words"]
            lx = F.array_min(F.transform(ws, lambda w: w["x"]))
            ly = F.array_min(F.transform(ws, lambda w: w["y"]))
            lw = F.array_max(F.transform(ws, lambda w: w["x"] + w["w"])) - lx
            lh = F.array_max(F.transform(ws, lambda w: w["y"] + w["h"])) - ly
            body = F.concat(
                F.lit('<line styleRef="'), sid.cast("string"),
                F.lit('" x="'), lx.cast("string"),
                F.lit('" y="'), ly.cast("string"),
                F.lit('" w="'), lw.cast("string"),
                F.lit('" h="'), lh.cast("string"),
                F.lit('">\n'),
                F.array_join(F.transform(ws, word_elem), "\n"),
                F.lit("\n</line>"),
            )
        else:
            body = F.concat(
                F.lit('<line styleRef="'), sid.cast("string"), F.lit('">'),
                _esc(s["text"]), F.lit("</line>"),
            )
        return F.when(
            s["kind"] == F.lit("formula"),
            F.concat(F.lit("<formula>"), _esc(s["text"]), F.lit("</formula>")),
        ).otherwise(body)

    def para_str(ps):
        media = F.filter(ps, lambda s: s["kind"] == F.lit("media"))
        caps = F.filter(ps, lambda s: s["kind"] != F.lit("media"))
        lines = F.array_join(F.transform(caps, line_elem), "\n")
        return F.when(
            F.size(media) > 0,
            F.when(
                F.size(caps) > 0,
                F.concat(
                    F.lit('<graphics ref="'),
                    _esc(F.element_at(media, 1)["media_ref"]),
                    F.lit('">\n'), lines, F.lit("\n</graphics>"),
                ),
            ).otherwise(
                F.concat(
                    F.lit('<graphics ref="'),
                    _esc(F.element_at(media, 1)["media_ref"]),
                    F.lit('"/>'),
                )
            ),
        ).otherwise(
            F.concat(
                F.lit('<paragraph seqno="'),
                F.element_at(ps, 1)["seq"].cast("string"),
                F.lit('">\n'), lines, F.lit("\n</paragraph>"),
            )
        )

    def page_str(p):
        ps = F.filter(arr, lambda s: s["page"] == p)
        # array_distinct preserves first occurrence over the seq-sorted
        # array, so paragraphs come out in reading order (para ids are NOT
        # monotone in emission: regions re-order them)
        para_ids = F.array_distinct(F.transform(ps, lambda s: s["para"]))
        paras = F.array_join(
            F.transform(
                para_ids,
                lambda q: para_str(F.filter(ps, lambda s: s["para"] == q)),
            ),
            "\n",
        )
        return F.when(
            p == F.lit(-1),
            F.concat(F.lit("<front>\n"), paras, F.lit("\n</front>")),
        ).otherwise(
            F.concat(
                F.lit('<page num="'), p.cast("string"), F.lit('">\n'),
                paras, F.lit("\n</page>"),
            )
        )

    page_ids = F.array_sort(F.array_distinct(F.transform(arr, lambda s: s["page"])))
    body = F.array_join(F.transform(page_ids, page_str), "\n")
    return g.select(
        "doc_id",
        F.concat(
            F.lit('<document id="'), _esc(F.col("doc_id")), F.lit('">\n'),
            styles_block, body, F.lit("\n</document>"),
        ).alias("pxml"),
    )


def sql_to_pxml_nested(spans_sql: str) -> str:
    """DuckDB mirror of to_pxml_nested over a structured spans relation
    (doc_id, seq, kind, text, media_ref, page, para, style_ref)."""
    line_elem = (
        "CASE WHEN kind = 'formula' THEN '<formula>' || "
        + _sql_esc("text")
        + " || '</formula>' ELSE '<line styleRef=\"' || coalesce(sid, 0) || '\">' || "
        + _sql_esc("text")
        + " || '</line>' END"
    )
    media_ref = "max(CASE WHEN kind = 'media' THEN media_ref END)"
    return f"""
WITH spans AS ({spans_sql}),
sd AS (
  SELECT doc_id, style_ref,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY style_ref) AS sid
  FROM (SELECT DISTINCT doc_id, style_ref FROM spans WHERE style_ref <> '')
),
lines AS (
  SELECT s.*, sd.sid FROM spans s
  LEFT JOIN sd ON s.doc_id = sd.doc_id AND s.style_ref = sd.style_ref
),
paras AS (
  SELECT doc_id, page, para, min(seq) AS pseq,
    CASE WHEN count(CASE WHEN kind = 'media' THEN 1 END) > 0 THEN
      CASE WHEN count(CASE WHEN kind <> 'media' THEN 1 END) > 0 THEN
        '<graphics ref="' || {_sql_esc(media_ref)} || '">' || chr(10) ||
        string_agg(CASE WHEN kind <> 'media' THEN {line_elem} END,
                   chr(10) ORDER BY seq) || chr(10) || '</graphics>'
      ELSE '<graphics ref="' || {_sql_esc(media_ref)} || '"/>'
      END
    ELSE
      '<paragraph seqno="' || min(seq) || '">' || chr(10) ||
      string_agg({line_elem}, chr(10) ORDER BY seq) || chr(10) || '</paragraph>'
    END AS pstr
  FROM lines GROUP BY doc_id, page, para
),
pages AS (
  SELECT doc_id, page, min(pseq) AS first_seq,
    CASE WHEN page = -1
         THEN '<front>' || chr(10) ||
              string_agg(pstr, chr(10) ORDER BY pseq) || chr(10) || '</front>'
         ELSE '<page num="' || page || '">' || chr(10) ||
              string_agg(pstr, chr(10) ORDER BY pseq) || chr(10) || '</page>'
    END AS pagestr
  FROM paras GROUP BY doc_id, page
),
styleblocks AS (
  SELECT doc_id,
         '<styles>' || chr(10) ||
         string_agg('<style id="' || sid || '" name="' || {_sql_esc('style_ref')}
                    || '"/>', chr(10) ORDER BY sid) || chr(10) || '</styles>'
         || chr(10) AS sb
  FROM sd GROUP BY doc_id
),
docs AS (
  SELECT doc_id,
         string_agg(pagestr, chr(10) ORDER BY page) AS body
  FROM pages GROUP BY doc_id
)
SELECT d.doc_id,
       '<document id="' || {_sql_esc('d.doc_id')} || '">' || chr(10) ||
       coalesce(s.sb, '') || d.body || chr(10) || '</document>' AS pxml
FROM docs d LEFT JOIN styleblocks s ON d.doc_id = s.doc_id
"""


def sql_to_pxml_words(spans_sql: str) -> str:
    """DuckDB mirror of to_pxml_words over a structured spans relation that
    also carries `words` (list<struct<value, style_ref, x, y, w, h>>) — in
    practice the word-box fixture written by tools/gen_expected_spans.py."""
    word_elem = (
        "'<word value=\"' || " + _sql_esc("(w).value")
        + " || '\" styleRef=\"' || wsd.sid"
        + " || '\" x=\"' || (w).x || '\" y=\"' || (w).y"
        + " || '\" w=\"' || (w).w || '\" h=\"' || (w).h || '\"/>'"
    )
    line_elem = (
        "CASE WHEN kind = 'formula' THEN '<formula>' || "
        + _sql_esc("text")
        + " || '</formula>' ELSE "
        "'<line styleRef=\"' || coalesce(sid, 0) || '\" x=\"' || lx || "
        "'\" y=\"' || ly || '\" w=\"' || (lex - lx) || '\" h=\"' || (ley - ly) "
        "|| '\">' || chr(10) || welems || chr(10) || '</line>' END"
    )
    media_ref = "max(CASE WHEN kind = 'media' THEN media_ref END)"
    return f"""
WITH spans AS ({spans_sql}),
sd AS (
  SELECT doc_id, style_ref,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY style_ref) AS sid
  FROM (
    SELECT DISTINCT doc_id, style_ref FROM (
      SELECT doc_id, style_ref FROM spans WHERE style_ref <> ''
      UNION ALL
      SELECT doc_id, (w).style_ref AS style_ref FROM (
        SELECT doc_id, unnest(words) AS w FROM spans
      ) WHERE (w).style_ref <> ''
    )
  )
),
wordelems AS (
  SELECT u.doc_id, u.seq,
         string_agg({word_elem}, chr(10) ORDER BY wi) AS welems,
         min((w).x) AS lx, min((w).y) AS ly,
         max((w).x + (w).w) AS lex, max((w).y + (w).h) AS ley
  FROM (
    SELECT doc_id, seq, generate_subscripts(words, 1) AS wi, unnest(words) AS w
    FROM spans
  ) u
  LEFT JOIN sd wsd ON u.doc_id = wsd.doc_id AND (w).style_ref = wsd.style_ref
  GROUP BY u.doc_id, u.seq
),
lines AS (
  SELECT s.*, sd.sid, we.welems, we.lx, we.ly, we.lex, we.ley
  FROM spans s
  LEFT JOIN sd ON s.doc_id = sd.doc_id AND s.style_ref = sd.style_ref
  LEFT JOIN wordelems we ON s.doc_id = we.doc_id AND s.seq = we.seq
),
paras AS (
  SELECT doc_id, page, para, min(seq) AS pseq,
    CASE WHEN count(CASE WHEN kind = 'media' THEN 1 END) > 0 THEN
      CASE WHEN count(CASE WHEN kind <> 'media' THEN 1 END) > 0 THEN
        '<graphics ref="' || {_sql_esc(media_ref)} || '">' || chr(10) ||
        string_agg(CASE WHEN kind <> 'media' THEN {line_elem} END,
                   chr(10) ORDER BY seq) || chr(10) || '</graphics>'
      ELSE '<graphics ref="' || {_sql_esc(media_ref)} || '"/>'
      END
    ELSE
      '<paragraph seqno="' || min(seq) || '">' || chr(10) ||
      string_agg({line_elem}, chr(10) ORDER BY seq) || chr(10) || '</paragraph>'
    END AS pstr
  FROM lines GROUP BY doc_id, page, para
),
pages AS (
  SELECT doc_id, page, min(pseq) AS first_seq,
    CASE WHEN page = -1
         THEN '<front>' || chr(10) ||
              string_agg(pstr, chr(10) ORDER BY pseq) || chr(10) || '</front>'
         ELSE '<page num="' || page || '">' || chr(10) ||
              string_agg(pstr, chr(10) ORDER BY pseq) || chr(10) || '</page>'
    END AS pagestr
  FROM paras GROUP BY doc_id, page
),
styleblocks AS (
  SELECT doc_id,
         '<styles>' || chr(10) ||
         string_agg('<style id="' || sid || '" name="' || {_sql_esc('style_ref')}
                    || '"/>', chr(10) ORDER BY sid) || chr(10) || '</styles>'
         || chr(10) AS sb
  FROM sd GROUP BY doc_id
),
docs AS (
  SELECT doc_id,
         string_agg(pagestr, chr(10) ORDER BY page) AS body
  FROM pages GROUP BY doc_id
)
SELECT d.doc_id,
       '<document id="' || {_sql_esc('d.doc_id')} || '">' || chr(10) ||
       coalesce(s.sb, '') || d.body || chr(10) || '</document>' AS pxml
FROM docs d LEFT JOIN styleblocks s ON d.doc_id = s.doc_id
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
