"""Post-extraction span transforms (native DataFrame, no Python).

- dehyphenate: the TEI sink's line-merge (S16; reference TEIOutput.java:
  229-246 `addLineToContent` — a line whose accumulated text ends with '-'
  absorbs the following line, dropping the hyphen, for arbitrarily long
  chains). Expressed run-based in ONE pass: a window running-sum assigns
  every maximal hyphen chain (consecutive text spans, each non-first member
  preceded by a '-'-ending text span) one group id, and a per-group ordered
  aggregation concatenates the chain, stripping the trailing '-' of every
  non-last member (each necessarily ends with '-', or its successor would
  have started a new group). The merged row keeps the first span's
  seq/kind/media_ref/offset, exactly like the reference's list-replace.

  The round-1 formulation iterated a head/absorb window merge 4 times
  (resolving one chain level per pass, capped); this form is both cheaper
  (one window + one aggregation vs four windows) and MORE faithful — the
  reference's loop has no chain cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TEXT_KINDS = ("text", "title", "abstract", "footnote", "formula", "heading1", "heading2", "heading3")


def dehyphenate(spans: DataFrame) -> DataFrame:
    """Merge trailing-hyphen spans with their successors (per doc, in seq
    order); merged rows keep the first span's seq (gaps allowed)."""
    w = Window.partitionBy("doc_id").orderBy("seq")
    is_text = F.col("kind").isin(*TEXT_KINDS)
    prv_hyph = (
        F.lag("kind").over(w).isin(*TEXT_KINDS) & F.lag("text").over(w).endswith("-")
    )
    # a span continues its predecessor's chain iff it is text AND the
    # predecessor is a '-'-ending text span; everything else starts a group
    start = (~is_text) | ~F.coalesce(prv_hyph, F.lit(False))
    grouped = spans.withColumn("_grp", F.sum(start.cast("int")).over(w))

    ms = F.array_sort(
        F.collect_list(
            F.struct("seq", "kind", "text", "media_ref", "offset")
        )
    )
    agg = grouped.groupBy("doc_id", "_grp").agg(ms.alias("ms"))
    ts = F.transform(F.col("ms"), lambda s: s["text"])
    n = F.size(ts)
    merged_text = F.concat(
        F.array_join(
            F.transform(
                F.slice(ts, 1, n - 1),
                lambda t: t.substr(F.lit(1), F.length(t) - 1),
            ),
            "",
        ),
        F.element_at(ts, n),
    )
    head = F.element_at(F.col("ms"), 1)
    return agg.select(
        "doc_id",
        head["seq"].alias("seq"),
        head["kind"].alias("kind"),
        merged_text.alias("text"),
        head["media_ref"].alias("media_ref"),
        head["offset"].alias("offset"),
    )


def sql_dehyphenate(spans_sql: str) -> str:
    """DuckDB mirror of dehyphenate: identical group assignment + ordered
    chain concatenation."""
    kinds = "(" + ", ".join(f"'{k}'" for k in TEXT_KINDS) + ")"
    return f"""
WITH s AS (
  SELECT *,
         CASE WHEN kind NOT IN {kinds}
                OR NOT coalesce((lag(kind) OVER w IN {kinds})
                                AND ends_with(lag(text) OVER w, '-'), false)
              THEN 1 ELSE 0 END AS is_start
  FROM ({spans_sql})
  WINDOW w AS (PARTITION BY doc_id ORDER BY seq)
),
g AS (
  SELECT *, SUM(is_start) OVER (PARTITION BY doc_id ORDER BY seq) AS grp
  FROM s
),
m AS (
  SELECT doc_id, grp,
         list(seq ORDER BY seq) AS seqs,
         list(kind ORDER BY seq) AS kinds,
         list(text ORDER BY seq) AS ts,
         list(media_ref ORDER BY seq) AS refs,
         list("offset" ORDER BY seq) AS offs
  FROM g GROUP BY doc_id, grp
)
SELECT doc_id, seqs[1] AS seq, kinds[1] AS kind,
       -- DuckDB's ts[1:0] slice is NULL (not []), so the single-member case
       -- needs the coalesce
       coalesce(array_to_string(list_transform(ts[1:len(ts)-1],
                                               t -> t[1:len(t)-1]), ''), '')
         || ts[len(ts)] AS text,
       refs[1] AS media_ref, offs[1] AS "offset"
FROM m
"""
